"""`colmap`-compatible command-line surface.

Capability parity with ref: src/exe/colmap.cc:93 (main), :101-147 (command
registry) and the per-domain runners in src/exe/{sfm,feature,model,
database}.cc — same command names, same dot-namespaced flag style
(`--SiftExtraction.max_num_features 4096`), so reference invocations
translate 1:1:

    python -m sba_tpu.cli feature_extractor --database_path db.db --image_path imgs/
    python -m sba_tpu.cli exhaustive_matcher --database_path db.db
    python -m sba_tpu.cli mapper --database_path db.db --image_path imgs/ --output_path sparse/
    python -m sba_tpu.cli semantic_bundle_adjuster --input_path sparse/0 \
        --output_path sba/ --data_path maps/

MVS commands (patch_match_stereo, stereo_fuser) are registered by
sba_tpu.mvs.cli_hooks when available.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

import numpy as np

from sba_tpu.options import apply_flags, parse_flags


def _require(flags, *names):
    missing = [n for n in names if n not in flags]
    if missing:
        raise SystemExit(
            "missing required flags: " + " ".join(f"--{m}" for m in missing))
    return [flags[n] for n in names]


# ---------------------------------------------------------------------------
# database commands (ref: exe/database.cc)
# ---------------------------------------------------------------------------


def run_database_creator(flags):
    from sba_tpu.io.database import Database

    (path,) = _require(flags, "database_path")
    Database(path).close()
    print(f"created database {path}")


def run_database_cleaner(flags):
    """Drop matches/two-view geometries (and optionally features)
    (ref: exe/database.cc RunDatabaseCleaner with --type)."""
    from sba_tpu.io.database import Database

    path, clean_type = _require(flags, "database_path", "type")
    db = Database(path)
    t = clean_type.lower()
    if t in ("all", "matches"):
        db.conn.execute("DELETE FROM matches")
        db.conn.execute("DELETE FROM two_view_geometries")
    if t in ("all", "features"):
        db.conn.execute("DELETE FROM keypoints")
        db.conn.execute("DELETE FROM descriptors")
    if t == "all":
        db.conn.execute("DELETE FROM images")
        db.conn.execute("DELETE FROM cameras")
    db.commit()
    db.close()
    print(f"cleaned ({t}) {path}")


def run_database_merger(flags):
    """Merge two databases into one (ref: exe/database.cc
    RunDatabaseMerger); image/camera ids are remapped, names must be
    disjoint."""
    from sba_tpu.io.database import Database

    p1, p2, out = _require(flags, "database_path1", "database_path2",
                           "merged_database_path")
    dbo = Database(out)
    id_map = {}
    for src_path in (p1, p2):
        src = Database(src_path)
        cam_map = {}
        for cid, cam in src.read_cameras().items():
            cam_map[cid] = dbo.write_camera(
                cam["model_id"], cam["width"], cam["height"],
                cam["params"], cam["prior_focal_length"])
        img_map = {}
        for iid, img in src.read_images().items():
            img_map[iid] = dbo.write_image(
                img["name"], cam_map[img["camera_id"]])
            kp = src.read_keypoints(iid)
            if len(kp):
                dbo.write_keypoints(img_map[iid], kp)
            d = src.read_descriptors(iid)
            if len(d):
                dbo.write_descriptors(img_map[iid], d)
        for (a, b), m in src.read_all_matches().items():
            dbo.write_matches(img_map[a], img_map[b], m)
        for (a, b), g in src.read_all_two_view_geometries().items():
            dbo.write_two_view_geometry(
                img_map[a], img_map[b], g["inlier_matches"],
                config=g["config"], F=g["F"], E=g["E"], H=g["H"],
                qvec=g["qvec"], tvec=g["tvec"])
        src.close()
    dbo.close()
    print(f"merged {p1} + {p2} -> {out}")


# ---------------------------------------------------------------------------
# feature commands (ref: exe/feature.cc)
# ---------------------------------------------------------------------------


_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff")


def _list_images(image_path, image_list_path=None) -> List[str]:
    if image_list_path:
        with open(image_list_path) as f:
            return [l.strip() for l in f if l.strip()]
    names = []
    for root, _dirs, files in os.walk(image_path):
        for fn in sorted(files):
            if fn.lower().endswith(_IMAGE_EXTS):
                names.append(os.path.relpath(os.path.join(root, fn),
                                             image_path))
    return sorted(names)


def run_feature_extractor(flags):
    """Ref: exe/feature.cc:104 RunFeatureExtractor. The reference's
    resizer/extractor/writer thread pipeline (feature/extraction.cc:112)
    becomes: load on host -> batched device extraction -> DB writes."""
    import jax.numpy as jnp

    from sba_tpu.features.sift import (
        SiftExtractionOptions,
        descriptors_to_uint8,
        extract_sift,
        load_image_gray,
    )
    from sba_tpu.geometry import camera_models
    from sba_tpu.io.database import Database

    db_path, image_path = _require(flags, "database_path", "image_path")
    opt = apply_flags(SiftExtractionOptions(), "SiftExtraction", flags)
    camera_model = flags.get("ImageReader.camera_model", "SIMPLE_RADIAL")
    single_camera = flags.get("ImageReader.single_camera", "0") in (
        "1", "true", "True")
    names = _list_images(image_path, flags.get("image_list_path"))
    if not names:
        raise SystemExit(f"no images found under {image_path}")

    from sba_tpu.io.image_reader import ImageReaderOptions, \
        camera_params_for_image

    db = Database(db_path)
    spec = camera_models.model_by_name(camera_model)
    reader_opt = ImageReaderOptions(camera_model=camera_model,
                                    single_camera=single_camera)
    shared_camera_id = None
    for name in names:
        full = os.path.join(image_path, name)
        img = load_image_gray(full, max_size=opt.max_image_size)
        h, w = img.shape
        if shared_camera_id is None or not single_camera:
            # EXIF focal prior with default-factor fallback
            # (ref: image_reader.cc camera creation chain).
            _model, params, has_prior = camera_params_for_image(
                full, w, h, reader_opt)
            cam_id = db.write_camera(spec.model_id, w, h, params,
                                     prior_focal_length=has_prior)
            if single_camera:
                shared_camera_id = cam_id
        else:
            cam_id = shared_camera_id
        image_id = db.write_image(name, cam_id)
        feats = extract_sift(jnp.asarray(img), opt)
        mask = np.asarray(feats.mask)
        kps = np.asarray(feats.keypoints)[mask]
        desc = np.asarray(descriptors_to_uint8(feats.descriptors))[mask]
        db.write_keypoints(image_id, kps)
        db.write_descriptors(image_id, desc)
        print(f"  {name}: {mask.sum()} features")
    db.commit()
    db.close()
    print(f"extracted features for {len(names)} images -> {db_path}")


def _match_and_verify(db, pairs_idx, image_ids, flags):
    """Shared matching + geometric verification core used by all matcher
    commands (ref: feature/matching.cc SiftFeatureMatcher + verifier)."""
    import jax.numpy as jnp

    from sba_tpu.estimators.two_view_geometry import (
        TwoViewGeometryOptions,
        estimate_two_view_geometry,
    )
    from sba_tpu.features.matching import (
        SiftMatchingOptions,
        match_descriptors,
        matches_to_pairs,
    )
    from sba_tpu.geometry import camera_models

    mopt = apply_flags(SiftMatchingOptions(), "SiftMatching", flags)
    vopt = apply_flags(TwoViewGeometryOptions(), "TwoViewGeometry", flags)

    cams = db.read_cameras()
    images = db.read_images()
    desc_cache: Dict[int, np.ndarray] = {}
    kp_cache: Dict[int, np.ndarray] = {}

    def get(iid):
        if iid not in desc_cache:
            d = db.read_descriptors(iid).astype(np.float32)
            n = np.linalg.norm(d, axis=-1, keepdims=True)
            desc_cache[iid] = d / np.maximum(n, 1e-12)
            kp_cache[iid] = db.read_keypoints(iid)
        return desc_cache[iid], kp_cache[iid]

    def fxycxy(iid):
        cam = cams[images[iid]["camera_id"]]
        spec = camera_models.model_by_id(cam["model_id"])
        p = cam["params"]
        fi = spec.focal_idxs
        return (p[fi[0]], p[fi[-1]], p[spec.principal_idxs[0]],
                p[spec.principal_idxs[1]])

    num_verified = 0
    for (a, b) in pairs_idx:
        i1, i2 = image_ids[a], image_ids[b]
        d1, k1 = get(i1)
        d2, k2 = get(i2)
        if len(d1) == 0 or len(d2) == 0:
            continue
        res = match_descriptors(jnp.asarray(d1), jnp.asarray(d2),
                                options=mopt)
        m = matches_to_pairs(res)
        if len(m) == 0:
            continue
        db.write_matches(i1, i2, m.astype(np.uint32))
        cam1 = cams[images[i1]["camera_id"]]
        cam2 = cams[images[i2]["camera_id"]]
        tv = estimate_two_view_geometry(
            k1[m[:, 0], :2], k2[m[:, 1], :2],
            fxycxy(i1), fxycxy(i2),
            image_size1=(cam1["width"], cam1["height"]),
            image_size2=(cam2["width"], cam2["height"]),
            options=vopt)
        inl = m[tv.inlier_mask[: len(m)]] if tv.num_inliers else m[:0]
        db.write_two_view_geometry(
            i1, i2, inl.astype(np.uint32), config=tv.config, F=tv.F,
            E=tv.E, H=tv.H, qvec=tv.qvec, tvec=tv.tvec)
        if tv.num_inliers >= vopt.min_num_inliers:
            num_verified += 1
        print(f"  pair ({images[i1]['name']}, {images[i2]['name']}): "
              f"{len(m)} matches, {tv.num_inliers} inliers")
    db.commit()
    return num_verified


def run_exhaustive_matcher(flags):
    """Ref: exe/feature.cc:221."""
    from sba_tpu.features.pairing import exhaustive_pairs
    from sba_tpu.io.database import Database

    (db_path,) = _require(flags, "database_path")
    db = Database(db_path)
    image_ids = sorted(db.read_images())
    block = int(flags.get("ExhaustiveMatching.block_size", "50"))
    pairs = exhaustive_pairs(len(image_ids), block_size=block)
    n = _match_and_verify(db, pairs, image_ids, flags)
    db.close()
    print(f"verified {n}/{len(pairs)} pairs")


def run_sequential_matcher(flags):
    """Ref: exe/feature.cc:298."""
    from sba_tpu.features.pairing import sequential_pairs
    from sba_tpu.io.database import Database

    (db_path,) = _require(flags, "database_path")
    db = Database(db_path)
    image_ids = sorted(db.read_images())
    overlap = int(flags.get("SequentialMatching.overlap", "10"))
    quad = flags.get("SequentialMatching.quadratic_overlap", "1") in (
        "1", "true", "True")
    pairs = sequential_pairs(len(image_ids), overlap=overlap,
                             quadratic_overlap=quad)
    n = _match_and_verify(db, pairs, image_ids, flags)
    db.close()
    print(f"verified {n}/{len(pairs)} pairs")


def run_spatial_matcher(flags):
    """Ref: exe/feature.cc (RunSpatialMatcher): kNN over prior positions."""
    from sba_tpu.features.pairing import spatial_pairs
    from sba_tpu.io.database import Database

    (db_path,) = _require(flags, "database_path")
    db = Database(db_path)
    images = db.read_images()
    image_ids = sorted(images)
    pos = []
    valid = []
    for iid in image_ids:
        t = images[iid]["prior_tvec"]
        ok = all(v is not None for v in t)
        pos.append([v or 0.0 for v in t])
        valid.append(ok)
    pairs = spatial_pairs(
        np.asarray(pos),
        max_num_neighbors=int(flags.get(
            "SpatialMatching.max_num_neighbors", "50")),
        max_distance=float(flags.get("SpatialMatching.max_distance", "100")),
        valid=np.asarray(valid))
    n = _match_and_verify(db, pairs, image_ids, flags)
    db.close()
    print(f"verified {n}/{len(pairs)} pairs")


def run_vocab_tree_builder(flags):
    """Train a vocabulary tree from database descriptors
    (ref: exe/vocab_tree.cc RunVocabTreeBuilder)."""
    from sba_tpu.io.database import Database
    from sba_tpu.retrieval.vocab_tree import build_vocab_tree, \
        save_vocab_tree

    db_path, out = _require(flags, "database_path", "vocab_tree_path")
    branching = int(flags.get("VocabTree.branching", "16"))
    depth = int(flags.get("VocabTree.depth", "2"))
    max_train = int(flags.get("VocabTree.max_num_descriptors", "100000"))
    db = Database(db_path)
    descs = []
    for iid in sorted(db.read_images()):
        d = db.read_descriptors(iid).astype(np.float32)
        if len(d):
            descs.append(d / np.maximum(
                np.linalg.norm(d, axis=-1, keepdims=True), 1e-9))
    db.close()
    if not descs:
        raise SystemExit("no descriptors in database")
    d = np.concatenate(descs)
    if len(d) > max_train:
        d = d[np.random.default_rng(0).choice(len(d), max_train,
                                              replace=False)]
    tree = build_vocab_tree(d, branching=branching, depth=depth)
    save_vocab_tree(tree, out)
    print(f"trained {tree.num_words}-word tree on {len(d)} descriptors "
          f"-> {out}")


def run_vocab_tree_matcher(flags):
    """Retrieval-based matching (ref: exe/feature.cc:385
    RunVocabTreeMatcher)."""
    from sba_tpu.io.database import Database
    from sba_tpu.retrieval.visual_index import VisualIndex, vocab_tree_pairs
    from sba_tpu.retrieval.vocab_tree import load_any_vocab_tree

    db_path, tree_path = _require(flags, "database_path", "vocab_tree_path")
    num_imgs = int(flags.get("VocabTreeMatching.num_images", "10"))
    tree = load_any_vocab_tree(tree_path)
    db = Database(db_path)
    image_ids = sorted(db.read_images())
    index = VisualIndex(tree)
    queries = {}
    for iid in image_ids:
        d = db.read_descriptors(iid).astype(np.float32)
        d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        index.add_image(iid, d)
        queries[iid] = d
    index.prepare()
    id_pairs = vocab_tree_pairs(index, queries, num_images=num_imgs)
    # vocab_tree_pairs returns IMAGE-ID pairs; _match_and_verify takes
    # positional indices into image_ids.
    pos = {iid: k for k, iid in enumerate(image_ids)}
    pairs = np.asarray([[pos[a], pos[b]] for a, b in id_pairs], np.int64)
    n = _match_and_verify(db, pairs, image_ids, flags)
    db.close()
    print(f"verified {n}/{len(pairs)} retrieved pairs")


def run_matches_importer(flags):
    """Ref: exe/feature.cc RunMatchesImporter (from-file pairs)."""
    from sba_tpu.features.pairing import pairs_from_file
    from sba_tpu.io.database import Database

    db_path, match_list = _require(flags, "database_path", "match_list_path")
    db = Database(db_path)
    images = db.read_images()
    image_ids = sorted(images)
    name_to_idx = {images[iid]["name"]: k
                   for k, iid in enumerate(image_ids)}
    pairs = pairs_from_file(match_list, name_to_idx)
    n = _match_and_verify(db, pairs, image_ids, flags)
    db.close()
    print(f"verified {n}/{len(pairs)} pairs")


# ---------------------------------------------------------------------------
# sfm commands (ref: exe/sfm.cc)
# ---------------------------------------------------------------------------


def run_mapper(flags):
    """Ref: exe/sfm.cc:249 RunMapper."""
    from sba_tpu.io.database import Database
    from sba_tpu.io.database_cache import DatabaseCache
    from sba_tpu.sfm.controllers import (
        MapperControllerOptions,
        reconstruct_incremental,
    )
    from sba_tpu.sfm.incremental_mapper import IncrementalMapperOptions

    db_path, output_path = _require(flags, "database_path", "output_path")
    opt = MapperControllerOptions()
    opt.mapper = apply_flags(opt.mapper, "Mapper", flags)
    opt.min_num_matches = int(flags.get("Mapper.min_num_matches", "15"))

    db = Database(db_path)
    cache = DatabaseCache.create(db, min_num_matches=opt.min_num_matches)
    db.close()
    print(f"loaded {cache.num_images()} images, "
          f"{len(cache.correspondence_graph.image_pairs)} pairs")

    models = reconstruct_incremental(
        cache, opt,
        callback=lambda ev, info: (print(f"  [{ev}] {info}"), True)[1])
    os.makedirs(output_path, exist_ok=True)
    for k, rec in enumerate(models):
        out = os.path.join(output_path, str(k))
        os.makedirs(out, exist_ok=True)
        rec.write(out)
        print(f"model {k}: {rec.num_registered_images()} images, "
              f"{rec.num_points3d()} points -> {out}")
    if not models:
        print("reconstruction failed: no model")
        raise SystemExit(1)


def run_hierarchical_mapper(flags):
    """Cluster -> per-cluster mapping -> merge
    (ref: exe/sfm.cc:326 RunHierarchicalMapper)."""
    from sba_tpu.io.database import Database
    from sba_tpu.io.database_cache import DatabaseCache
    from sba_tpu.sfm.hierarchical_mapper import (
        HierarchicalMapperOptions,
        reconstruct_hierarchical,
    )

    db_path, output_path = _require(flags, "database_path", "output_path")
    opt = HierarchicalMapperOptions()
    opt.clustering = apply_flags(opt.clustering, "SceneClustering", flags)
    opt.mapper.mapper = apply_flags(opt.mapper.mapper, "Mapper", flags)
    db = Database(db_path)
    cache = DatabaseCache.create(db)
    db.close()
    models = reconstruct_hierarchical(cache, opt)
    os.makedirs(output_path, exist_ok=True)
    for k, rec in enumerate(models):
        out = os.path.join(output_path, str(k))
        os.makedirs(out, exist_ok=True)
        rec.write(out)
        print(f"model {k}: {rec.num_registered_images()} images, "
              f"{rec.num_points3d()} points -> {out}")
    if not models:
        raise SystemExit(1)


def run_automatic_reconstructor(flags):
    """One-command end-to-end: features -> matching -> sparse [-> dense]
    (ref: exe/sfm.cc:50 RunAutomaticReconstructor ->
    controllers/automatic_reconstruction.cc:139)."""
    workspace, image_path = _require(flags, "workspace_path", "image_path")
    quality = flags.get("quality", "high")
    dense = flags.get("dense", "0") in ("1", "true", "True")
    db_path = os.path.join(workspace, "database.db")
    sparse = os.path.join(workspace, "sparse")
    os.makedirs(workspace, exist_ok=True)

    base = dict(flags)
    base["database_path"] = db_path
    run_database_creator({"database_path": db_path})
    fe = dict(base)
    fe["image_path"] = image_path
    if quality == "low":
        fe.setdefault("SiftExtraction.max_num_features", "2048")
    run_feature_extractor(fe)
    run_exhaustive_matcher(base)
    mp = dict(base)
    mp["output_path"] = sparse
    run_mapper(mp)
    if dense:
        und = os.path.join(workspace, "dense")
        run_image_undistorter({"image_path": image_path,
                               "input_path": os.path.join(sparse, "0"),
                               "output_path": und})
        run_patch_match_stereo({"workspace_path": und, **{
            k: v for k, v in flags.items()
            if k.startswith("PatchMatchStereo.")}})
        run_stereo_fuser({"workspace_path": und,
                          "output_path": os.path.join(und, "fused.ply")})
    print(f"automatic reconstruction complete -> {workspace}")


def run_point_triangulator(flags):
    """Triangulate points against FIXED known poses
    (ref: exe/sfm.cc:403 RunPointTriangulator)."""
    from sba_tpu.io.database import Database
    from sba_tpu.io.database_cache import DatabaseCache
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.sfm.incremental_mapper import IncrementalMapper, \
        IncrementalMapperOptions
    from sba_tpu.sfm.incremental_triangulator import TriangulatorOptions

    db_path, input_path, output_path = _require(
        flags, "database_path", "input_path", "output_path")
    rec = Reconstruction.read(input_path)
    db = Database(db_path)
    cache = DatabaseCache.create(db)
    db.close()
    # Map DB image ids by name onto the model's images.
    mapper = IncrementalMapper(cache)
    mapper.begin_reconstruction(rec)
    topt = apply_flags(TriangulatorOptions(), "Mapper", flags)
    total = 0
    for iid in list(rec.images):
        if rec.is_registered(iid):
            total += mapper.triangulate_image(iid, topt)
    mapper.triangulator.complete_tracks(list(rec.points3D), topt)
    mapper.triangulator.merge_tracks(list(rec.points3D), topt)
    os.makedirs(output_path, exist_ok=True)
    rec.write(output_path)
    print(f"triangulated {total} observations, "
          f"{rec.num_points3d()} points -> {output_path}")


def run_bundle_adjuster(flags):
    """Ref: exe/sfm.cc:137 RunBundleAdjuster."""
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.optim.ba import BAOptions
    from sba_tpu.sfm.controllers import adjust_bundle

    input_path, output_path = _require(flags, "input_path", "output_path")
    rec = Reconstruction.read(input_path)
    opt = apply_flags(BAOptions(), "BundleAdjustment", flags)
    out = adjust_bundle(rec, opt)
    s = out["summary"]
    os.makedirs(output_path, exist_ok=True)
    rec.write(output_path)
    print(f"BA: cost {float(s.initial_cost):.6g} -> "
          f"{float(s.final_cost):.6g} in {int(s.num_iterations)} iters")


def run_semantic_bundle_adjuster(flags):
    """Ref: exe/sfm.cc:169 RunSemanticBundleAdjuster."""
    from sba_tpu.controllers.semantic_ba import (
        SemanticBAControllerOptions,
        run_semantic_bundle_adjustment,
    )
    from sba_tpu.optim.sba import SBAOptions

    input_path, output_path, data_path = _require(
        flags, "input_path", "output_path", "data_path")
    opt = SemanticBAControllerOptions(
        input_path=input_path, output_path=output_path, data_path=data_path,
        run_path=flags.get("run_path"))
    opt.sba = apply_flags(opt.sba, "SemanticBundleAdjustment", flags)
    rec = run_semantic_bundle_adjustment(opt)
    s = rec._last_sba_summary
    print(f"SBA: cost {float(np.asarray(s.initial_cost)):.6g} -> "
          f"{float(np.asarray(s.final_cost)):.6g} "
          f"in {int(np.asarray(s.num_iterations))} iters")


def run_geometric_semantic_bundle_adjuster(flags):
    """Ref: exe/sfm.cc:200 RunGeometricSemanticBundleAdjuster."""
    from sba_tpu.controllers.geometric_semantic_ba import (
        GeometricSemanticBAControllerOptions,
        run_geometric_semantic_bundle_adjustment,
    )

    input_path, output_path, data_path, input_geometry = _require(
        flags, "input_path", "output_path", "data_path", "input_geometry")
    opt = GeometricSemanticBAControllerOptions(
        input_path=input_path, output_path=output_path, data_path=data_path,
        input_geometry=input_geometry,
        output_geometry=flags.get("output_geometry"),
        run_path=flags.get("run_path"))
    opt.gsba = apply_flags(
        opt.gsba, "GeometricSemanticBundleAdjustment", flags)
    rec, cyls, summary = run_geometric_semantic_bundle_adjustment(opt)
    print(f"GSBA: cost {float(np.asarray(summary.initial_cost)):.6g} -> "
          f"{float(np.asarray(summary.final_cost)):.6g}, "
          f"mean IoU {float(np.asarray(summary.mean_iou)):.4f}")


# ---------------------------------------------------------------------------
# model commands (ref: exe/model.cc)
# ---------------------------------------------------------------------------


def run_image_registrator(flags):
    """Register NEW images into an existing model without modifying it
    (ref: exe/sfm.cc RunImageRegistrator)."""
    from sba_tpu.io.database import Database
    from sba_tpu.io.database_cache import DatabaseCache
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.sfm.incremental_mapper import (
        IncrementalMapper,
        IncrementalMapperOptions,
    )

    db_path, input_path, output_path = _require(
        flags, "database_path", "input_path", "output_path")
    rec = Reconstruction.read(input_path)
    db = Database(db_path)
    cache = DatabaseCache.create(db)
    db.close()
    mapper = IncrementalMapper(cache)
    mapper.begin_reconstruction(rec)
    opt = apply_flags(IncrementalMapperOptions(), "Mapper", flags)
    n = 0
    for iid in mapper.find_next_images(opt):
        if mapper.register_next_image(iid, opt):
            n += 1
    os.makedirs(output_path, exist_ok=True)
    rec.write(output_path)
    print(f"registered {n} additional images -> {output_path}")


def run_model_merger(flags):
    """Merge two models sharing common images
    (ref: exe/model.cc RunModelMerger)."""
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.sfm.hierarchical_mapper import merge_reconstructions

    input_path1, input_path2, output_path = _require(
        flags, "input_path1", "input_path2", "output_path")
    rec1 = Reconstruction.read(input_path1)
    rec2 = Reconstruction.read(input_path2)
    if not merge_reconstructions(rec1, rec2):
        raise SystemExit("merge failed: < 3 common registered images")
    os.makedirs(output_path, exist_ok=True)
    rec1.write(output_path)
    print(f"merged: {rec1.num_registered_images()} images, "
          f"{rec1.num_points3d()} points -> {output_path}")


def run_model_converter(flags):
    from sba_tpu.models.reconstruction import Reconstruction

    input_path, output_path, output_type = _require(
        flags, "input_path", "output_path", "output_type")
    rec = Reconstruction.read(input_path)
    ot = output_type.upper()
    if ot in ("BIN",):
        os.makedirs(output_path, exist_ok=True)
        rec.write(output_path, ext=".bin")
    elif ot in ("TXT",):
        os.makedirs(output_path, exist_ok=True)
        rec.write(output_path, ext=".txt")
    elif ot in ("PLY",):
        rec.export_ply(output_path)
    else:
        raise SystemExit(f"unsupported output_type {output_type}")
    print(f"converted {input_path} -> {output_path} ({ot})")


def run_model_analyzer(flags):
    """Ref: exe/model.cc RunModelAnalyzer output format."""
    from sba_tpu.models.reconstruction import Reconstruction

    (input_path,) = _require(flags, "path" if "path" in flags
                             else "input_path")
    rec = Reconstruction.read(input_path)
    print(f"Cameras: {len(rec.cameras)}")
    print(f"Images: {len(rec.images)}")
    print(f"Registered images: {rec.num_registered_images()}")
    print(f"Points: {rec.num_points3d()}")
    print(f"Observations: {rec.compute_num_observations()}")
    print(f"Mean track length: {rec.compute_mean_track_length():.6f}")
    print("Mean observations per image: "
          f"{rec.compute_mean_observations_per_reg_image():.6f}")
    print("Mean reprojection error: "
          f"{rec.compute_mean_reprojection_error():.6f}px")


def _align_models(rec_src, rec_dst):
    """Similarity from common registered image centers (umeyama)."""
    import jax.numpy as jnp

    from sba_tpu.geometry.similarity import umeyama
    from sba_tpu.sfm.incremental_triangulator import _projection_center

    by_name_src = {rec_src.images[i].name: i for i in rec_src.images
                   if rec_src.is_registered(i)}
    by_name_dst = {rec_dst.images[i].name: i for i in rec_dst.images
                   if rec_dst.is_registered(i)}
    common = sorted(set(by_name_src) & set(by_name_dst))
    if len(common) < 3:
        raise SystemExit("need >= 3 common registered images to align")
    src = np.stack([_projection_center(
        rec_src.images[by_name_src[n]].qvec,
        rec_src.images[by_name_src[n]].tvec) for n in common])
    dst = np.stack([_projection_center(
        rec_dst.images[by_name_dst[n]].qvec,
        rec_dst.images[by_name_dst[n]].tvec) for n in common])
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst))
    return float(s), np.asarray(R), np.asarray(t), common, src, dst


def run_model_aligner(flags):
    """Align a model to a reference model by common images
    (ref: exe/colmap.cc:125 model_aligner)."""
    from sba_tpu.geometry.quaternions import rotmat_to_quat
    from sba_tpu.models.reconstruction import Reconstruction
    import jax.numpy as jnp

    input_path, ref_path, output_path = _require(
        flags, "input_path", "ref_model_path", "output_path")
    rec = Reconstruction.read(input_path)
    ref = Reconstruction.read(ref_path)
    s, R, t, common, _, _ = _align_models(rec, ref)
    # world' = s R world + t. Camera x_cam = Rc x + tc transforms as
    # Rc' = Rc R^T, tc' = s tc - Rc' t (keeps centers c' = s R c + t).
    from sba_tpu.sfm.incremental_triangulator import _rotmat

    for iid in rec.images:
        img = rec.images[iid]
        Rc = _rotmat(img.qvec)
        Rc_new = Rc @ R.T
        img.qvec = np.asarray(rotmat_to_quat(jnp.asarray(Rc_new)))
        img.tvec = s * img.tvec - Rc_new @ t
    for pid in rec.points3D:
        p = rec.points3D[pid]
        p.xyz = s * (R @ p.xyz) + t
    os.makedirs(output_path, exist_ok=True)
    rec.write(output_path)
    print(f"aligned over {len(common)} common images "
          f"(scale {s:.6f}) -> {output_path}")


def run_model_orientation_aligner(flags):
    """Align model orientation to a Manhattan world / gravity frame
    (ref: exe/model.cc:732 RunModelOrientationAligner)."""
    from sba_tpu.estimators.coordinate_frame import (
        ManhattanWorldFrameOptions,
        estimate_gravity_vector_from_image_orientation,
        estimate_manhattan_world_frame,
        rotation_from_unit_vectors,
        transform_reconstruction,
    )
    from sba_tpu.models.reconstruction import Reconstruction

    input_path, output_path = _require(flags, "input_path", "output_path")
    method = flags.get("method", "MANHATTAN-WORLD").lower()
    if method not in ("manhattan-world", "image-orientation"):
        raise SystemExit("ERROR: Invalid `method` - supported values are "
                         "'MANHATTAN-WORLD' or 'IMAGE-ORIENTATION'.")
    rec = Reconstruction.read(input_path)

    if method == "manhattan-world":
        opts = ManhattanWorldFrameOptions(
            max_image_size=int(flags.get("max_image_size", 1024)))
        frame = estimate_manhattan_world_frame(
            opts, rec, flags.get("image_path", ""))
        if np.abs(frame[:, 0]).sum() == 0 and np.abs(frame[:, 1]).sum() == 0:
            raise SystemExit("no coordinate axes could be determined")
        if np.abs(frame[:, 0]).sum() == 0:
            print("Only aligning vertical axis")
            R = rotation_from_unit_vectors(frame[:, 1], [0, 1, 0])
        elif np.abs(frame[:, 1]).sum() == 0:
            print("Only aligning horizontal axis")
            R = rotation_from_unit_vectors(frame[:, 0], [1, 0, 0])
        else:
            print("Aligning horizontal and vertical axes")
            R = frame.T
    else:
        gravity = estimate_gravity_vector_from_image_orientation(rec)
        R = rotation_from_unit_vectors(gravity, [0, 1, 0])

    print("Using the rotation matrix:")
    print(R)
    transform_reconstruction(rec, 1.0, R, np.zeros(3))
    os.makedirs(output_path, exist_ok=True)
    rec.write(output_path)
    print(f"aligned -> {output_path}")


def run_model_comparer(flags):
    """ATE-style comparison of two models (ref: exe/colmap.cc:127
    model_comparer)."""
    from sba_tpu.models.reconstruction import Reconstruction

    input_path1, input_path2 = _require(flags, "input_path1", "input_path2")
    rec1 = Reconstruction.read(input_path1)
    rec2 = Reconstruction.read(input_path2)
    s, R, t, common, src, dst = _align_models(rec1, rec2)
    src_aligned = (s * (src @ R.T)) + t
    err = np.linalg.norm(src_aligned - dst, axis=-1)
    print(f"Common images: {len(common)}")
    print(f"Alignment scale: {s:.6f}")
    print(f"ATE mean: {err.mean():.6f}")
    print(f"ATE median: {np.median(err):.6f}")
    print(f"ATE rmse: {np.sqrt((err ** 2).mean()):.6f}")
    print(f"ATE max: {err.max():.6f}")


def run_image_undistorter(flags):
    """Undistort images + model for MVS (ref: exe/image_undistorter ->
    base/undistortion.cc COLMAPUndistorter::Run: writes
    <out>/images/<name> + <out>/sparse model)."""
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from sba_tpu.features.sift import load_image_gray
    from sba_tpu.geometry.undistortion import (
        UndistortCameraOptions,
        undistort_reconstruction,
        warp_image_between_cameras,
    )
    from sba_tpu.models.reconstruction import Reconstruction

    image_path, input_path, output_path = _require(
        flags, "image_path", "input_path", "output_path")
    opt = apply_flags(UndistortCameraOptions(), "UndistortCamera", flags)
    rec = Reconstruction.read(input_path)
    src_cams = {cid: c for cid, c in rec.cameras.items()}
    import copy

    src_cams = copy.deepcopy(rec.cameras)
    new_cams = undistort_reconstruction(rec, opt)
    img_out = os.path.join(output_path, "images")
    os.makedirs(img_out, exist_ok=True)
    for iid, image in rec.images.items():
        src_file = os.path.join(image_path, image.name)
        if not os.path.exists(src_file):
            continue
        arr = np.asarray(PILImage.open(src_file).convert("RGB"),
                         np.float32) / 255.0
        warped = np.asarray(warp_image_between_cameras(
            src_cams[image.camera_id], new_cams[image.camera_id],
            jnp.asarray(arr)))
        os.makedirs(os.path.dirname(os.path.join(img_out, image.name))
                    or img_out, exist_ok=True)
        PILImage.fromarray(
            np.clip(warped * 255, 0, 255).astype(np.uint8)).save(
            os.path.join(img_out, image.name))
    sparse_out = os.path.join(output_path, "sparse")
    os.makedirs(sparse_out, exist_ok=True)
    rec.write(sparse_out)
    print(f"undistorted {len(rec.images)} images -> {output_path}")


def run_patch_match_stereo(flags):
    """Dense stereo over an undistorted workspace
    (ref: exe/mvs.cc:81 RunPatchMatchStereo; workspace layout =
    images/ + sparse/ + stereo/{depth_maps,normal_maps})."""
    import jax
    import jax.numpy as jnp

    from sba_tpu.features.sift import load_image_gray
    from sba_tpu.geometry import camera_models
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.mvs import PatchMatchOptions, patch_match_stereo, \
        write_colmap_map
    from sba_tpu.mvs.patch_match import relative_pose

    (workspace,) = _require(flags, "workspace_path")
    opt = apply_flags(PatchMatchOptions(), "PatchMatchStereo", flags)
    max_src = int(flags.get("PatchMatchStereo.max_num_src_images", "4"))
    rec = Reconstruction.read(os.path.join(workspace, "sparse"))
    img_dir = os.path.join(workspace, "images")
    stereo = os.path.join(workspace, "stereo")
    os.makedirs(os.path.join(stereo, "depth_maps"), exist_ok=True)
    os.makedirs(os.path.join(stereo, "normal_maps"), exist_ok=True)

    reg = sorted(i for i in rec.images if rec.is_registered(i))
    imgs = {}
    for iid in reg:
        imgs[iid] = load_image_gray(
            os.path.join(img_dir, rec.images[iid].name))

    def K_of(iid):
        cam = rec.cameras[rec.images[iid].camera_id]
        spec = camera_models.model_by_id(cam.model_id)
        p = cam.params
        fi = spec.focal_idxs
        return np.array([[p[fi[0]], 0, p[spec.principal_idxs[0]]],
                         [0, p[fi[-1]], p[spec.principal_idxs[1]]],
                         [0, 0, 1.0]])

    # Source selection: most shared 3D points (ref: Workspace/model
    # source-image ranking).
    shared = {a: {} for a in reg}
    for p in rec.points3D.values():
        track = [int(i) for i in p.image_ids]
        for a in track:
            for b in track:
                if a != b and a in shared:
                    shared[a][b] = shared[a].get(b, 0) + 1

    import dataclasses

    src_of = {iid: sorted(shared[iid], key=lambda b: -shared[iid][b])
              [:max_src] for iid in reg}

    def depth_range(iid):
        image = rec.images[iid]
        pids = [int(p) for p in image.point3D_ids if p != -1]
        if pids:
            from sba_tpu.sfm.incremental_triangulator import _rotmat
            R0 = _rotmat(image.qvec)
            zs = np.array([
                (R0 @ rec.points3D[p].xyz + image.tvec)[2]
                for p in pids if p in rec.points3D])
            zs = zs[zs > 0]
            dmin = float(np.percentile(zs, 2) * 0.5) if len(zs) else 0.1
            dmax = float(np.percentile(zs, 98) * 2.0) if len(zs) else 100.0
        else:
            dmin, dmax = opt.depth_min, opt.depth_max
        return max(dmin, 1e-3), max(dmax, dmin * 2)

    def solve_one(iid, o, src_depths=None, init_depth=None):
        srcs = src_of[iid]
        image = rec.images[iid]
        Rs, ts = [], []
        for s in srcs:
            R, t = relative_pose(image.qvec, image.tvec,
                                 rec.images[s].qvec, rec.images[s].tvec)
            Rs.append(R)
            ts.append(t)
        return patch_match_stereo(
            jnp.asarray(imgs[iid], jnp.float32),
            jnp.asarray(np.stack([imgs[s] for s in srcs]), jnp.float32),
            jnp.asarray(K_of(iid), jnp.float32),
            jnp.asarray(np.stack([K_of(s) for s in srcs]), jnp.float32),
            jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32),
            key=jax.random.PRNGKey(iid), options=o,
            src_depths=src_depths,
            init_depth=None if init_depth is None
            else jnp.asarray(init_depth, jnp.float32))

    def write_maps(iid, res, tag):
        name = rec.images[iid].name
        write_colmap_map(np.asarray(res.depth), os.path.join(
            stereo, "depth_maps", f"{name}.{tag}.bin"))
        write_colmap_map(np.asarray(res.normal), os.path.join(
            stereo, "normal_maps", f"{name}.{tag}.bin"))

    # Pass 1: photometric (ref: PatchMatchController first-phase
    # problems; maps named *.photometric.bin).
    photo_depth = {}
    opts_of = {}
    for iid in reg:
        if not src_of[iid]:
            continue
        dmin, dmax = depth_range(iid)
        o = dataclasses.replace(opt, depth_min=dmin, depth_max=dmax,
                                geom_consistency=False)
        opts_of[iid] = o
        res = solve_one(iid, o)
        photo_depth[iid] = np.asarray(res.depth)
        write_maps(iid, res, "photometric")
        print(f"  {rec.images[iid].name} [photometric]: depth "
              f"[{o.depth_min:.2f}, {o.depth_max:.2f}], "
              f"{len(src_of[iid])} sources, mean cost "
              f"{float(np.asarray(res.cost).mean()):.3f}")

    # Pass 2: geometric consistency against the photometric depths of
    # the source views, warm-started from the photometric result
    # (ref: second-phase problems; *.geometric.bin).
    if opt.geom_consistency:
        for iid in photo_depth:
            srcs = src_of[iid]
            if any(s not in photo_depth for s in srcs):
                continue
            o = dataclasses.replace(opts_of[iid], geom_consistency=True)
            res = solve_one(iid, o, src_depths=jnp.asarray(
                np.stack([photo_depth[s] for s in srcs]), jnp.float32),
                init_depth=photo_depth[iid])
            write_maps(iid, res, "geometric")
            print(f"  {rec.images[iid].name} [geometric]: mean cost "
                  f"{float(np.asarray(res.cost).mean()):.3f}")
    print(f"stereo maps -> {stereo}")


def run_stereo_fuser(flags):
    """Fuse stereo depth maps into a dense cloud
    (ref: exe/mvs.cc:138 RunStereoFuser)."""
    from sba_tpu.features.sift import load_image_gray
    from sba_tpu.geometry import camera_models
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.mvs import StereoFusionOptions, fuse_depth_maps, \
        read_colmap_map
    from sba_tpu.mvs.fusion import write_fused_ply

    workspace, output_path = _require(flags, "workspace_path", "output_path")
    opt = apply_flags(StereoFusionOptions(), "StereoFusion", flags)
    rec = Reconstruction.read(os.path.join(workspace, "sparse"))
    stereo = os.path.join(workspace, "stereo")
    reg = sorted(i for i in rec.images if rec.is_registered(i))

    def K_of(iid):
        cam = rec.cameras[rec.images[iid].camera_id]
        spec = camera_models.model_by_id(cam.model_id)
        p = cam.params
        fi = spec.focal_idxs
        return np.array([[p[fi[0]], 0, p[spec.principal_idxs[0]]],
                         [0, p[fi[-1]], p[spec.principal_idxs[1]]],
                         [0, 0, 1.0]])

    depths, normals, images_g, Ks, qs, tvs = [], [], [], [], [], []
    for iid in reg:
        name = rec.images[iid].name
        dp = os.path.join(stereo, "depth_maps", f"{name}.geometric.bin")
        npth = os.path.join(stereo, "normal_maps", f"{name}.geometric.bin")
        if not os.path.exists(dp):   # fall back to photometric maps
            dp = os.path.join(stereo, "depth_maps",
                              f"{name}.photometric.bin")
            npth = os.path.join(stereo, "normal_maps",
                                f"{name}.photometric.bin")
        if not os.path.exists(dp):
            continue
        depths.append(read_colmap_map(dp))
        normals.append(read_colmap_map(npth))
        images_g.append(load_image_gray(
            os.path.join(workspace, "images", name)))
        Ks.append(K_of(iid))
        qs.append(rec.images[iid].qvec)
        tvs.append(rec.images[iid].tvec)
    if not depths:
        raise SystemExit("no depth maps in workspace; run "
                         "patch_match_stereo first")
    cloud = fuse_depth_maps(
        np.stack(depths), np.stack(normals), np.stack(images_g),
        np.stack(Ks), np.stack(qs), np.stack(tvs), opt)
    write_fused_ply(cloud, output_path)
    print(f"fused {len(cloud.xyz)} points -> {output_path}")


def _run_mesher(flags):
    from sba_tpu.geometry import camera_models
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.mvs import read_colmap_map
    from sba_tpu.mvs.meshing import (
        TSDFOptions,
        mesh_from_depth_maps,
        write_mesh_ply,
    )

    workspace, output_path = _require(flags, "input_path", "output_path")
    opt = apply_flags(TSDFOptions(), "Meshing", flags)
    rec = Reconstruction.read(os.path.join(workspace, "sparse"))
    stereo = os.path.join(workspace, "stereo")
    reg = sorted(i for i in rec.images if rec.is_registered(i))

    def K_of(iid):
        cam = rec.cameras[rec.images[iid].camera_id]
        spec = camera_models.model_by_id(cam.model_id)
        p = cam.params
        fi = spec.focal_idxs
        return np.array([[p[fi[0]], 0, p[spec.principal_idxs[0]]],
                         [0, p[fi[-1]], p[spec.principal_idxs[1]]],
                         [0, 0, 1.0]])

    depths, Ks, qs, ts = [], [], [], []
    for iid in reg:
        name = rec.images[iid].name
        dp = os.path.join(stereo, "depth_maps", f"{name}.geometric.bin")
        if not os.path.exists(dp):   # fall back to photometric maps
            dp = os.path.join(stereo, "depth_maps",
                              f"{name}.photometric.bin")
        if not os.path.exists(dp):
            continue
        depths.append(read_colmap_map(dp))
        Ks.append(K_of(iid))
        qs.append(rec.images[iid].qvec)
        ts.append(rec.images[iid].tvec)
    if not depths:
        raise SystemExit("no depth maps; run patch_match_stereo first")
    mesh = mesh_from_depth_maps(np.stack(depths), Ks, qs, ts, opt)
    write_mesh_ply(mesh, output_path)
    print(f"meshed {len(mesh.vertices)} vertices / {len(mesh.faces)} "
          f"faces -> {output_path}")


def run_poisson_mesher(flags):
    """Surface mesh from the dense workspace (ref: exe/mvs.cc:123
    RunPoissonMesher — realized via TSDF + surface nets, see
    mvs/meshing.py docstring for the algorithmic substitution)."""
    _run_mesher(flags)


def run_delaunay_mesher(flags):
    """Ref: exe/mvs.cc:43 RunDelaunayMesher — same volumetric pipeline
    (CGAL Delaunay has no TPU mapping; capability preserved)."""
    _run_mesher(flags)


def run_model_viewer(flags):
    """Export a self-contained interactive HTML viewer (the GUI-capability
    substitute for ref: src/ui Qt model viewer; see sba_tpu/viewer.py)."""
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.viewer import export_html_viewer

    input_path, output_path = _require(flags, "input_path", "output_path")
    rec = Reconstruction.read(input_path)
    export_html_viewer(rec, output_path)
    print(f"viewer ({rec.num_points3d()} points, "
          f"{rec.num_registered_images()} cameras) -> {output_path}")


def run_project_generator(flags):
    from sba_tpu.features.matching import SiftMatchingOptions
    from sba_tpu.features.sift import SiftExtractionOptions
    from sba_tpu.optim.ba import BAOptions
    from sba_tpu.options import write_project_ini

    (output_path,) = _require(flags, "output_path")
    write_project_ini(output_path, {
        "SiftExtraction": SiftExtractionOptions(),
        "SiftMatching": SiftMatchingOptions(),
        "BundleAdjustment": BAOptions(),
    }, top_level={"database_path": flags.get("database_path", ""),
                  "image_path": flags.get("image_path", "")})
    print(f"wrote {output_path}")


COMMANDS = {
    "database_creator": run_database_creator,
    "database_cleaner": run_database_cleaner,
    "database_merger": run_database_merger,
    "feature_extractor": run_feature_extractor,
    "exhaustive_matcher": run_exhaustive_matcher,
    "sequential_matcher": run_sequential_matcher,
    "spatial_matcher": run_spatial_matcher,
    "matches_importer": run_matches_importer,
    "vocab_tree_builder": run_vocab_tree_builder,
    "vocab_tree_matcher": run_vocab_tree_matcher,
    "mapper": run_mapper,
    "hierarchical_mapper": run_hierarchical_mapper,
    "automatic_reconstructor": run_automatic_reconstructor,
    "point_triangulator": run_point_triangulator,
    "bundle_adjuster": run_bundle_adjuster,
    "semantic_bundle_adjuster": run_semantic_bundle_adjuster,
    "geometric_semantic_bundle_adjuster":
        run_geometric_semantic_bundle_adjuster,
    "image_undistorter": run_image_undistorter,
    "patch_match_stereo": run_patch_match_stereo,
    "stereo_fuser": run_stereo_fuser,
    "poisson_mesher": run_poisson_mesher,
    "delaunay_mesher": run_delaunay_mesher,
    "image_registrator": run_image_registrator,
    "model_merger": run_model_merger,
    "model_converter": run_model_converter,
    "model_analyzer": run_model_analyzer,
    "model_viewer": run_model_viewer,
    "model_aligner": run_model_aligner,
    "model_orientation_aligner": run_model_orientation_aligner,
    "model_comparer": run_model_comparer,
    "project_generator": run_project_generator,
}


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print("sba_tpu — TPU-native COLMAP-compatible SfM\n")
        print("usage: python -m sba_tpu.cli <command> [--flags]\n")
        print("commands:")
        for name in sorted(COMMANDS):
            print(f"  {name}")
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; run with --help for the list")
        return 1
    flags, positional = parse_flags(argv[1:])
    if "project_path" in flags:
        from sba_tpu.options import flags_from_ini, read_project_ini

        ini_flags = flags_from_ini(read_project_ini(flags["project_path"]))
        ini_flags.update(flags)
        flags = ini_flags
    if flags.get("help") or "-h" in positional:
        print(f"{cmd}: see module docstring for flags")
        return 0
    COMMANDS[cmd](flags)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
