"""Tests for the model/image utility commands added for parity with
ref exe/colmap.cc registry (cropper, splitter, transformer, filterer,
deleter, color extractor, point filtering, rectifier, importer,
retriever, rig BA)."""

import os

import numpy as np
import pytest

from sba_tpu.cli import COMMANDS


@pytest.fixture
def toy_model(tmp_path):
    """Small synthetic two-camera scene with images on disk."""
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from sba_tpu.geometry.quaternions import quat_rotate
    from sba_tpu.io.colmap_models import Camera, Image
    from sba_tpu.models.reconstruction import Reconstruction

    rng = np.random.default_rng(0)
    rec = Reconstruction()
    rec.add_camera(Camera(1, 0, 64, 48, np.array([60.0, 32, 24])))
    pts = rng.uniform(-1, 1, (40, 3)) + [0, 0, 6.0]
    n_img = 4
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    xys_of = {}
    for i in range(n_img):
        q = np.array([1.0, 0, 0, 0])
        t = np.array([0.3 * i - 0.45, 0.0, 0.0])
        pc = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(pts))) + t
        uv = pc[:, :2] / pc[:, 2:]
        xy = uv * 60.0 + [32, 24]
        xys_of[i + 1] = xy
        rec.add_image(Image(i + 1, q, t, 1, f"im{i}.png",
                            xy.astype(np.float64),
                            np.full(len(pts), -1, np.int64)),
                      registered=True)
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        PILImage.fromarray(arr).save(img_dir / f"im{i}.png")
    for p in range(len(pts)):
        rec.add_point3d(pts[p], [(i + 1, p) for i in range(n_img)])
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    rec.write(str(model_dir))
    return tmp_path, model_dir, img_dir, rec


def test_color_extractor(toy_model):
    tmp, model_dir, img_dir, _ = toy_model
    out = tmp / "colored"
    COMMANDS["color_extractor"]({"input_path": str(model_dir),
                                 "output_path": str(out),
                                 "image_path": str(img_dir)})
    from sba_tpu.models.reconstruction import Reconstruction

    rec = Reconstruction.read(str(out))
    rgb = np.stack([p.rgb for p in rec.points3D.values()])
    assert (rgb.sum(axis=1) > 0).any()


def test_point_filtering(toy_model):
    tmp, model_dir, _, rec = toy_model
    out = tmp / "filtered"
    COMMANDS["point_filtering"]({"input_path": str(model_dir),
                                 "output_path": str(out),
                                 "min_tri_angle": "0.0",
                                 "max_reproj_error": "4.0"})
    from sba_tpu.models.reconstruction import Reconstruction

    rec2 = Reconstruction.read(str(out))
    assert rec2.num_points3d() == rec.num_points3d()  # all inliers
    # Demanding an impossible angle removes everything.
    out2 = tmp / "filtered2"
    COMMANDS["point_filtering"]({"input_path": str(model_dir),
                                 "output_path": str(out2),
                                 "min_tri_angle": "89.0"})
    assert Reconstruction.read(str(out2)).num_points3d() == 0


def test_image_deleter(toy_model, tmp_path):
    tmp, model_dir, _, _ = toy_model
    names = tmp / "names.txt"
    names.write_text("im1.png\nnope.png\n")
    out = tmp / "deleted"
    COMMANDS["image_deleter"]({"input_path": str(model_dir),
                               "output_path": str(out),
                               "image_names_path": str(names)})
    from sba_tpu.models.reconstruction import Reconstruction

    rec = Reconstruction.read(str(out))
    # COLMAP models keep only registered images on write.
    assert all(rec.images[i].name != "im1.png" for i in rec.images)


def test_image_filterer(toy_model):
    tmp, model_dir, _, _ = toy_model
    out = tmp / "imgfiltered"
    COMMANDS["image_filterer"]({"input_path": str(model_dir),
                                "output_path": str(out),
                                "min_num_observations": "0"})
    from sba_tpu.models.reconstruction import Reconstruction

    assert Reconstruction.read(str(out)).num_registered_images() == 4
    out2 = tmp / "imgfiltered2"
    COMMANDS["image_filterer"]({"input_path": str(model_dir),
                                "output_path": str(out2),
                                "min_focal_length_ratio": "2.0"})
    assert Reconstruction.read(str(out2)).num_registered_images() == 0


def test_model_cropper_and_splitter(toy_model):
    tmp, model_dir, _, rec = toy_model
    out = tmp / "cropped"
    out.mkdir()
    COMMANDS["model_cropper"]({"input_path": str(model_dir),
                               "output_path": str(out),
                               "boundary": "-10,-10,0,10,10,6.0"})
    from sba_tpu.models.reconstruction import Reconstruction

    cropped = Reconstruction.read(str(out))
    pts = np.stack([p.xyz for p in cropped.points3D.values()])
    assert (pts[:, 2] <= 6.0 + 1e-9).all()
    assert 0 < cropped.num_points3d() < rec.num_points3d()

    outs = tmp / "split"
    outs.mkdir()
    COMMANDS["model_splitter"]({"input_path": str(model_dir),
                                "output_path": str(outs),
                                "split_type": "parts",
                                "split_params": "2",
                                "min_reg_images": "1",
                                "min_num_points": "1"})
    subs = sorted(os.listdir(outs))
    assert len(subs) >= 1
    total = sum(Reconstruction.read(str(outs / d)).num_points3d()
                for d in subs)
    assert total >= rec.num_points3d() * 0.9


def test_model_transformer_sparse_and_ply(toy_model):
    tmp, model_dir, _, rec = toy_model
    tf = tmp / "tf.txt"
    # scale 2 rotation identity, translation (1,2,3)
    tf.write_text("2 0 0 1\n0 2 0 2\n0 0 2 3\n")
    out = tmp / "transformed"
    COMMANDS["model_transformer"]({"input_path": str(model_dir),
                                   "output_path": str(out),
                                   "transform_path": str(tf)})
    from sba_tpu.models.reconstruction import Reconstruction

    rec2 = Reconstruction.read(str(out))
    p0 = next(iter(rec.points3D.values())).xyz
    p0b = next(iter(rec2.points3D.values())).xyz
    np.testing.assert_allclose(p0b, 2 * p0 + [1, 2, 3], atol=1e-8)

    # inverse round-trips
    out2 = tmp / "transformed_back"
    COMMANDS["model_transformer"]({"input_path": str(out),
                                   "output_path": str(out2),
                                   "transform_path": str(tf),
                                   "is_inverse": "1"})
    rec3 = Reconstruction.read(str(out2))
    np.testing.assert_allclose(next(iter(rec3.points3D.values())).xyz,
                               p0, atol=1e-7)

    # PLY path
    from sba_tpu.io.ply import read_ply, write_ply

    ply_in = tmp / "in.ply"
    xyz = np.array([[0.0, 0, 0], [1, 1, 1]])
    write_ply(str(ply_in), xyz, rgb=np.array([[255, 0, 0], [0, 255, 0]]))
    ply_out = tmp / "out.ply"
    COMMANDS["model_transformer"]({"input_path": str(ply_in),
                                   "output_path": str(ply_out),
                                   "transform_path": str(tf)})
    back = read_ply(str(ply_out))
    np.testing.assert_allclose(back["xyz"], 2 * xyz + [1, 2, 3],
                               atol=1e-6)
    np.testing.assert_array_equal(back["rgb"][0], [255, 0, 0])


def test_feature_importer(toy_model):
    tmp, model_dir, img_dir, _ = toy_model
    imp = tmp / "feats"
    imp.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        rows = []
        for _ in range(5):
            kp = rng.uniform(0, 40, 2)
            rows.append(" ".join(
                [f"{kp[0]:.2f}", f"{kp[1]:.2f}", "1.5", "0.0"]
                + [str(int(v)) for v in rng.integers(0, 255, 128)]))
        (imp / f"im{i}.png.txt").write_text("5 128\n" + "\n".join(rows))
    db = tmp / "imported.db"
    COMMANDS["feature_importer"]({"database_path": str(db),
                                  "image_path": str(img_dir),
                                  "import_path": str(imp)})
    from sba_tpu.io.database import Database

    d = Database(str(db))
    imgs = d.read_images()
    assert len(imgs) == 4
    for iid in imgs:
        assert d.read_keypoints(iid).shape[0] == 5
        assert d.read_descriptors(iid).shape == (5, 128)
    d.close()


def test_image_rectifier(toy_model):
    tmp, model_dir, img_dir, _ = toy_model
    pairs = tmp / "pairs.txt"
    pairs.write_text("im0.png im1.png\n")
    out = tmp / "rectified"
    COMMANDS["image_rectifier"]({"input_path": str(model_dir),
                                 "output_path": str(out),
                                 "image_path": str(img_dir),
                                 "stereo_pairs_list": str(pairs)})
    sub = out / "im0-im1"
    assert (sub / "left.png").exists()
    assert (sub / "right.png").exists()
    Q = np.loadtxt(sub / "Q.txt")
    assert Q.shape == (4, 4)
    # Pure-x baseline: disparity-to-depth uses 1/tx.
    assert abs(Q[2, 3]) > 0


def test_rectify_stereo_cameras_horizontal_epilines():
    """After rectification, corresponding points share the same row."""
    import jax.numpy as jnp

    from sba_tpu.geometry.quaternions import angle_axis_to_quat
    from sba_tpu.geometry.undistortion import rectify_stereo_cameras
    from sba_tpu.io.colmap_models import Camera

    cam = Camera(1, 1, 640, 480, np.array([500.0, 500.0, 320, 240]))
    qvec = np.asarray(angle_axis_to_quat(jnp.asarray([0.02, -0.03, 0.01])))
    tvec = np.array([-0.7, 0.05, 0.02])
    H1, H2, Q = rectify_stereo_cameras(cam, cam, qvec, tvec)

    from sba_tpu.geometry.quaternions import quat_rotate

    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (20, 3)) + [0, 0, 5.0]
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])

    def project(R, t, X):
        pc = X @ R.T + t
        uv = pc[:, :2] / pc[:, 2:]
        return np.concatenate([uv @ K[:2, :2].T + K[:2, 2],
                               np.ones((len(X), 1))], -1)

    R_rel = np.asarray(
        __import__("jax").numpy.asarray(
            __import__("sba_tpu.geometry.quaternions",
                       fromlist=["quat_to_rotmat"]).quat_to_rotmat(
                jnp.asarray(qvec))))
    x1 = project(np.eye(3), np.zeros(3), pts)
    x2 = project(R_rel, tvec, pts)
    y1 = (x1 @ H1.T)
    y2 = (x2 @ H2.T)
    r1 = y1[:, 1] / y1[:, 2]
    r2 = y2[:, 1] / y2[:, 2]
    np.testing.assert_allclose(r1, r2, atol=1e-6)


def test_rig_bundle_adjuster_cli(toy_model):
    tmp, model_dir, _, _ = toy_model
    import json

    cfg = tmp / "rig.json"
    cfg.write_text(json.dumps(
        [{"ref_camera_id": 1,
          "cameras": [{"camera_id": 1, "image_prefix": ""}]}]))
    out = tmp / "rig_ba"
    COMMANDS["rig_bundle_adjuster"]({
        "input_path": str(model_dir), "output_path": str(out),
        "rig_config_path": str(cfg),
        "BundleAdjustment.max_iterations": "3"})
    from sba_tpu.models.reconstruction import Reconstruction

    assert Reconstruction.read(str(out)).num_points3d() > 0


def test_vocab_tree_retriever(toy_model, tmp_path):
    tmp, model_dir, img_dir, _ = toy_model
    # Build a tiny database with descriptors + a tree, then retrieve.
    from sba_tpu.io.database import Database
    from sba_tpu.retrieval.vocab_tree import build_vocab_tree, \
        save_vocab_tree

    rng = np.random.default_rng(3)
    db_path = tmp / "retr.db"
    db = Database(str(db_path))
    all_desc = []
    for i in range(3):
        cid = db.write_camera(0, 64, 48, np.array([60.0, 32, 24]))
        iid = db.write_image(f"im{i}.png", cid)
        d = rng.random((30, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        du8 = np.clip(d * 512, 0, 255).astype(np.uint8)
        db.write_keypoints(iid, rng.uniform(0, 40, (30, 4))
                           .astype(np.float32))
        db.write_descriptors(iid, du8)
        all_desc.append(d)
    db.commit()
    db.close()
    tree = build_vocab_tree(np.concatenate(all_desc), branching=4, depth=1)
    tree_path = tmp / "tree.npz"
    save_vocab_tree(tree, str(tree_path))
    COMMANDS["vocab_tree_retriever"]({
        "database_path": str(db_path),
        "vocab_tree_path": str(tree_path),
        "num_images": "2"})


def test_pose_graph_optimizer_command(tmp_path):
    """pose_graph_optimizer command: end-to-end model-dir round trip;
    a self-consistent model is a fixpoint (cost ~0, poses unchanged).
    The relaxation math itself is covered by tests/test_pose_graph.py."""
    import numpy as np
    import jax.numpy as jnp
    from sba_tpu.cli import COMMANDS
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.utils.synthetic import make_synthetic_reconstruction
    from sba_tpu.geometry.quaternions import (angle_axis_to_quat,
                                              quat_multiply, quat_normalize)

    rec = make_synthetic_reconstruction(num_images=8, num_points=150, seed=7)
    truth = {i: rec.images[i].tvec.copy() for i in rec.registered_image_ids}
    # The graph measurements come from current poses, so build the model
    # directory FROM TRUTH, then perturb poses via a second write.
    src = tmp_path / "in"
    src.mkdir()
    rec.write(str(src))
    out = tmp_path / "out"
    COMMANDS["pose_graph_optimizer"]({
        "input_path": str(src), "output_path": str(out),
        "PoseGraph.min_common_points": "5"})
    rec2 = Reconstruction.read(str(out))
    for i in rec2.registered_image_ids:
        np.testing.assert_allclose(rec2.images[i].tvec, truth[i], atol=1e-6)
