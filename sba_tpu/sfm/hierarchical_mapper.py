"""Hierarchical mapper: cluster the scene, map clusters, merge models.

Capability parity with ref: src/controllers/hierarchical_mapper.{h,cc}
(`HierarchicalMapperController` hierarchical_mapper.cc:116: SceneClustering
partition -> per-cluster IncrementalMapper (thread pool) -> model merge via
common-image similarity alignment).

The reference maps clusters on a ThreadPool; cluster reconstructions here
run sequentially on one host (each already saturates the device with
batched kernels) — multi-host cluster parallelism goes over
`jax.distributed` processes, one cluster per process, merged on host 0.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from sba_tpu.models.reconstruction import Reconstruction
from sba_tpu.sfm.controllers import (
    MapperControllerOptions,
    reconstruct_incremental,
)
from sba_tpu.sfm.scene_clustering import (
    SceneClustering,
    SceneClusteringOptions,
)


@dataclass
class HierarchicalMapperOptions:
    """Mirrors ref: hierarchical_mapper.h Options."""

    clustering: SceneClusteringOptions = field(
        default_factory=SceneClusteringOptions)
    mapper: MapperControllerOptions = field(
        default_factory=MapperControllerOptions)
    # Post-merge pose-graph relaxation of cluster-seam error (extension
    # over the reference, which stops at similarity alignment).
    relax_poses: bool = True


def merge_reconstructions(rec1: Reconstruction, rec2: Reconstruction,
                          max_reproj_error: float = 8.0) -> bool:
    """Align rec2 onto rec1 by common registered images and merge
    (ref: reconstruction.cc Merge, used by hierarchical_mapper.cc).
    Returns False if alignment is impossible (< 3 common images)."""
    import jax.numpy as jnp

    from sba_tpu.geometry.quaternions import np_rotmat_to_quat
    from sba_tpu.geometry.similarity import umeyama
    from sba_tpu.sfm.incremental_triangulator import _projection_center, \
        _rotmat

    by_name1 = {rec1.images[i].name: i for i in rec1.images
                if rec1.is_registered(i)}
    by_name2 = {rec2.images[i].name: i for i in rec2.images
                if rec2.is_registered(i)}
    common = sorted(set(by_name1) & set(by_name2))
    if len(common) < 3:
        return False
    src = np.stack([_projection_center(
        rec2.images[by_name2[n]].qvec, rec2.images[by_name2[n]].tvec)
        for n in common])
    dst = np.stack([_projection_center(
        rec1.images[by_name1[n]].qvec, rec1.images[by_name1[n]].tvec)
        for n in common])
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst))
    s = float(s)
    R = np.asarray(R)
    t = np.asarray(t)

    # Bring rec2 into rec1's frame.
    for iid in list(rec2.images):
        img = rec2.images[iid]
        Rc = _rotmat(img.qvec)
        Rc_new = Rc @ R.T
        img.qvec = np_rotmat_to_quat(Rc_new)
        img.tvec = s * img.tvec - Rc_new @ t
    for pid in rec2.points3D:
        p = rec2.points3D[pid]
        p.xyz = s * (R @ p.xyz) + t

    # Merge: new images are added outright; common images keep rec1's
    # pose; tracks of rec2 are re-added with remapped ids.
    for iid, img in rec2.images.items():
        if img.name not in by_name1 and rec2.is_registered(iid):
            new_id = max(rec1.images, default=0) + 1
            from sba_tpu.io.colmap_models import Image as CImage

            rec1.add_image(CImage(
                image_id=new_id, qvec=img.qvec.copy(),
                tvec=img.tvec.copy(), camera_id=img.camera_id,
                name=img.name, xys=img.xys.copy(),
                point3D_ids=np.full(len(img.xys), -1, np.int64)),
                registered=True)
            if img.camera_id not in rec1.cameras:
                rec1.add_camera(rec2.cameras[img.camera_id])
            by_name1[img.name] = new_id
    for pid, p in rec2.points3D.items():
        track = []
        for im2, f2 in zip(p.image_ids, p.point2D_idxs):
            name = rec2.images[int(im2)].name
            if name in by_name1:
                i1 = by_name1[name]
                f2 = int(f2)
                if f2 < len(rec1.images[i1].point3D_ids) and \
                        rec1.images[i1].point3D_ids[f2] == -1:
                    track.append((i1, f2))
        if len(track) >= 2:
            rec1.add_point3d(p.xyz, track)
    rec1.filter_points_large_reprojection_error(max_reproj_error)
    return True


def relax_merged_model(base: Reconstruction,
                       partials: List[Reconstruction],
                       min_common_points: int = 10,
                       pg_options=None) -> bool:
    """Pose-graph relaxation of a merged model.

    The reference's hierarchical merge stops at similarity alignment
    (ref: src/controllers/hierarchical_mapper.cc:116 + reconstruction.cc
    Merge) — seam error between clusters stays in the model until the
    next global BA. This relaxes it first, at pose-graph cost: each
    partial's internal relative poses (already expressed in the base
    frame by `merge_reconstructions`) become SE(3) edge measurements,
    weighted by covisibility; conflicting measurements across cluster
    seams distribute in the least-squares sense. Returns False when the
    graph has no edges (nothing to relax).
    """
    import jax.numpy as jnp
    from collections import Counter

    from sba_tpu.optim.pose_graph import (
        PoseGraphOptions, make_problem, optimize_pose_graph, relative_pose,
    )

    name2base = {base.images[i].name: i
                 for i in base.registered_image_ids}
    img_ids = list(base.registered_image_ids)
    id2row = {iid: k for k, iid in enumerate(img_ids)}

    ei, ej, rq, rt, wts = [], [], [], [], []
    for part in partials:
        cnt: Counter = Counter()
        for pid, pt in part.points3D.items():
            track = [int(im) for im in pt.image_ids
                     if part.is_registered(int(im))]
            for a in range(len(track)):
                for b in range(a + 1, len(track)):
                    if track[a] != track[b]:
                        cnt[(min(track[a], track[b]),
                             max(track[a], track[b]))] += 1
        for (i2, j2), c in cnt.items():
            if c < min_common_points:
                continue
            ni = part.images[i2].name
            nj = part.images[j2].name
            if ni not in name2base or nj not in name2base:
                continue
            ri = id2row[name2base[ni]]
            rj = id2row[name2base[nj]]
            if ri == rj:
                continue
            qi, ti = part.images[i2].qvec, part.images[i2].tvec
            qj, tj = part.images[j2].qvec, part.images[j2].tvec
            q_ij, t_ij = relative_pose(jnp.asarray(qi), jnp.asarray(ti),
                                       jnp.asarray(qj), jnp.asarray(tj))
            ei.append(ri)
            ej.append(rj)
            rq.append(np.asarray(q_ij))
            rt.append(np.asarray(t_ij))
            wts.append(c)
    if not ei:
        return False

    qvecs = np.stack([base.images[i].qvec for i in img_ids])
    tvecs = np.stack([base.images[i].tvec for i in img_ids])
    sqrt_info = np.sqrt(np.asarray(wts, np.float64))[:, None, None] \
        * np.eye(6)[None]
    # Anchor the most-connected image.
    deg = np.bincount(np.array(ei + ej), minlength=len(img_ids))
    fixed = np.zeros(len(img_ids))
    fixed[int(np.argmax(deg))] = 1.0
    problem = make_problem(
        qvecs, tvecs, np.asarray(ei, np.int32), np.asarray(ej, np.int32),
        np.stack(rq), np.stack(rt), sqrt_info=sqrt_info,
        pose_fixed=fixed, dtype=jnp.float64)
    opt = pg_options or PoseGraphOptions(max_iterations=50, loss="huber",
                                         loss_scale=1.0)
    out, _ = optimize_pose_graph(problem, opt)
    q = np.asarray(out.qvecs, np.float64)
    t = np.asarray(out.tvecs, np.float64)
    for k, iid in enumerate(img_ids):
        base.images[iid].qvec = q[k]
        base.images[iid].tvec = t[k]
    return True


def reconstruct_hierarchical(
    database_cache,
    options: Optional[HierarchicalMapperOptions] = None,
) -> List[Reconstruction]:
    """Full hierarchical pipeline (ref: HierarchicalMapperController::Run).
    Falls back to plain incremental mapping when the scene fits one leaf."""
    opt = options or HierarchicalMapperOptions()
    pairs = {k: len(v) for k, v in
             database_cache.correspondence_graph.image_pairs.items()}
    clustering = SceneClustering(opt.clustering)
    if not pairs:
        return []
    clustering.partition(pairs)
    leaves = clustering.leaf_clusters()
    if len(leaves) <= 1:
        return reconstruct_incremental(database_cache, opt.mapper)

    # Reconstruct each leaf on its image subset.
    partials: List[Reconstruction] = []
    for leaf in leaves:
        sub_cache = _subset_cache(database_cache, set(leaf.image_ids))
        models = reconstruct_incremental(sub_cache, opt.mapper)
        partials.extend(models)

    if not partials:
        return []
    # Greedy merge into the largest model.
    partials.sort(key=lambda r: -r.num_registered_images())
    base = partials[0]
    pending = partials[1:]
    merged = [base]
    progress = True
    while pending and progress:
        progress = False
        for k, rec in enumerate(pending):
            if merge_reconstructions(base, rec):
                merged.append(pending.pop(k))
                progress = True
                break
    if opt.relax_poses and len(merged) > 1:
        relax_merged_model(base, merged)
    return [base] + pending


def _subset_cache(cache, image_ids):
    """View of a DatabaseCache restricted to `image_ids`."""
    from sba_tpu.io.database_cache import CorrespondenceGraph, DatabaseCache

    sub = DatabaseCache()
    sub.cameras = cache.cameras
    sub.images = {i: img for i, img in cache.images.items()
                  if i in image_ids}
    g = CorrespondenceGraph()
    for i, img in sub.images.items():
        g.add_image(i, len(img.keypoints))
    for (a, b), m in cache.correspondence_graph.image_pairs.items():
        if a in image_ids and b in image_ids:
            g.add_correspondences(a, b, m)
    g.finalize()
    sub.correspondence_graph = g
    return sub
