"""Line segment detection + coordinate frame estimation tests
(capability of ref: src/base/line.cc, src/estimators/coordinate_frame.cc;
the reference ships no tests for these — synthetic-recovery style per
SURVEY.md §4)."""

import numpy as np
import pytest

from sba_tpu.estimators.coordinate_frame import (
    _segments_to_lines,
    align_to_enu_plane,
    align_to_principal_plane,
    estimate_gravity_vector_from_image_orientation,
    estimate_manhattan_world_frame,
    estimate_vanishing_point,
    find_best_consensus_axis,
    ManhattanWorldFrameOptions,
    rotation_from_unit_vectors,
    transform_reconstruction,
)
from sba_tpu.features.lines import (
    HORIZONTAL,
    VERTICAL,
    classify_line_segment_orientations,
    detect_line_segments,
)


def _draw_line(img, x0, y0, x1, y1, value=255.0, thickness=1):
    n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2 + 1)
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    for t in range(-(thickness // 2), thickness - thickness // 2):
        xi = np.clip(np.round(xs).astype(int), 0, img.shape[1] - 1)
        yi = np.clip(np.round(ys + t).astype(int), 0, img.shape[0] - 1)
        img[yi, xi] = value
    return img


def test_detect_line_segments_recovers_synthetic_lines():
    img = np.zeros((128, 128), np.float32)
    _draw_line(img, 10, 30, 110, 30, thickness=2)     # horizontal
    _draw_line(img, 60, 10, 60, 120, thickness=2)     # vertical
    _draw_line(img, 10, 60, 100, 110, thickness=2)    # diagonal
    segs = detect_line_segments(img, min_length=20)
    assert len(segs) >= 3
    # Each synthetic line matched by some detected segment (angle + offset).
    d = segs[:, 1] - segs[:, 0]
    theta = np.mod(np.arctan2(d[:, 1], d[:, 0]), np.pi)
    lengths = np.linalg.norm(d, axis=-1)
    want = [0.0, np.pi / 2, np.arctan2(50, 90)]
    for w in want:
        dd = np.abs(theta - w)
        dd = np.minimum(dd, np.pi - dd)
        ok = (dd < 0.1) & (lengths > 30)
        assert ok.any(), f"no segment at angle {w}"


def test_detect_line_segments_min_length_and_empty():
    img = np.zeros((64, 64), np.float32)
    assert len(detect_line_segments(img, 3)) == 0
    _draw_line(img, 10, 20, 50, 20, thickness=2)
    assert len(detect_line_segments(img, min_length=100)) == 0


def test_classify_orientations():
    segs = np.array([
        [[0, 0], [10, 0.5]],    # horizontal
        [[0, 0], [0.5, 10]],    # vertical
        [[0, 0], [10, 10]],     # diagonal
    ])
    out = classify_line_segment_orientations(segs, tolerance=0.2)
    assert out[0] == HORIZONTAL
    assert out[1] == VERTICAL
    assert out[2] == 0


def test_consensus_axis():
    rng = np.random.default_rng(0)
    true_axis = np.array([0.0, 1.0, 0.0])
    good = true_axis + 0.01 * rng.normal(size=(20, 3))
    good /= np.linalg.norm(good, axis=1, keepdims=True)
    bad = rng.normal(size=(5, 3))
    bad /= np.linalg.norm(bad, axis=1, keepdims=True)
    axis = find_best_consensus_axis(np.concatenate([good, bad]), 0.05)
    assert abs(axis @ true_axis) > 0.99


def test_vanishing_point_recovery():
    # Segments all pointing at a known VP.
    vp = np.array([400.0, 300.0])
    rng = np.random.default_rng(1)
    starts = rng.uniform(0, 200, size=(30, 2))
    dirs = vp[None, :] - starts
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ends = starts + dirs * rng.uniform(30, 60, size=(30, 1))
    segs = np.stack([starts, ends], axis=1)
    lines = _segments_to_lines(segs)
    model, n_inl = estimate_vanishing_point(segs, lines, max_error=0.5)
    assert n_inl >= 25
    vp_est = model[:2] / model[2]
    np.testing.assert_allclose(vp_est, vp, atol=1.0)


def _toy_reconstruction(rotations, with_points=True):
    import jax.numpy as jnp

    from sba_tpu.geometry.quaternions import rotmat_to_quat
    from sba_tpu.io.colmap_models import Camera, Image
    from sba_tpu.models.reconstruction import Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 0, 640, 480, np.array([500.0, 320, 240])))
    for i, R in enumerate(rotations):
        q = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        rec.add_image(Image(i + 1, q, np.array([0.0, 0, float(i)]), 1,
                            f"im{i}.png", np.zeros((0, 2)),
                            np.zeros(0, np.int64)), registered=True)
    if with_points:
        rng = np.random.default_rng(2)
        for k in range(30):
            rec.add_point3d(rng.normal(size=3) * [5, 3, 0.2], [])
    return rec


def test_gravity_from_image_orientation():
    # Cameras share the same downward axis up to yaw.
    def yaw(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    rec = _toy_reconstruction([yaw(a) for a in np.linspace(0, 1.0, 8)],
                              with_points=False)
    g = estimate_gravity_vector_from_image_orientation(rec)
    np.testing.assert_allclose(np.abs(g), [0, 1, 0], atol=1e-6)


def test_rotation_from_unit_vectors():
    rng = np.random.default_rng(3)
    for _ in range(5):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        b = rng.normal(size=3)
        b /= np.linalg.norm(b)
        R = rotation_from_unit_vectors(a, b)
        np.testing.assert_allclose(R @ a, b, atol=1e-10)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)


def test_transform_reconstruction_preserves_projections():
    import jax.numpy as jnp

    from sba_tpu.geometry.quaternions import quat_rotate

    rec = _toy_reconstruction([np.eye(3)] * 3)
    img = rec.images[1]
    pid = next(iter(rec.points3D))
    before = np.asarray(quat_rotate(jnp.asarray(img.qvec),
                                    jnp.asarray(rec.points3D[pid].xyz))) \
        + img.tvec
    R = rotation_from_unit_vectors([0, 0, 1.0], [1.0, 0, 0])
    transform_reconstruction(rec, 2.0, R, np.array([1.0, -2.0, 3.0]))
    img = rec.images[1]
    after = np.asarray(quat_rotate(jnp.asarray(img.qvec),
                                   jnp.asarray(rec.points3D[pid].xyz))) \
        + img.tvec
    np.testing.assert_allclose(after, 2.0 * before, atol=1e-8)


def test_align_to_principal_plane():
    rec = _toy_reconstruction([np.eye(3)] * 3)
    align_to_principal_plane(rec)
    pts = np.stack([p.xyz for p in rec.points3D.values()])
    np.testing.assert_allclose(pts.mean(axis=0), 0, atol=1e-8)
    # Z (normal) spread is the smallest after alignment.
    var = pts.var(axis=0)
    assert var[2] <= var[0] and var[2] <= var[1]


def test_align_to_enu_plane_runs():
    rec = _toy_reconstruction([np.eye(3)] * 3)
    # Put points near an ECEF location (Zurich).
    from sba_tpu.geometry.gps import ell_to_xyz

    base = ell_to_xyz([[47.37, 8.54, 400.0]])[0]
    for p in rec.points3D.values():
        p.xyz = p.xyz + base
    align_to_enu_plane(rec)
    pts = np.stack([p.xyz for p in rec.points3D.values()])
    np.testing.assert_allclose(pts.mean(axis=0), 0, atol=1e-6)


def test_manhattan_world_frame_synthetic(tmp_path):
    """End-to-end: render a synthetic Manhattan scene (axis-aligned grid
    viewed by an identity-pose pinhole camera) and recover the frame."""
    import jax.numpy as jnp

    from sba_tpu.geometry.quaternions import rotmat_to_quat
    from sba_tpu.io.colmap_models import Camera, Image
    from sba_tpu.models.reconstruction import Reconstruction
    from PIL import Image as PILImage

    f, cx, cy = 300.0, 160.0, 120.0
    img = np.zeros((240, 320), np.float32)
    # Vertical world lines (X=const planes) project to vertical image
    # lines for identity rotation; horizontal ones to horizontal.
    for x in range(30, 300, 40):
        _draw_line(img, x, 20, x, 220, thickness=2)
    for y in range(30, 220, 40):
        _draw_line(img, 15, y, 305, y, thickness=2)
    path = tmp_path / "im0.png"
    PILImage.fromarray(img.astype(np.uint8)).save(path)

    rec = Reconstruction()
    rec.add_camera(Camera(1, 0, 320, 240, np.array([f, cx, cy])))
    q = np.asarray(rotmat_to_quat(jnp.asarray(np.eye(3))))
    rec.add_image(Image(1, q, np.zeros(3), 1, "im0.png",
                        np.zeros((0, 2)), np.zeros(0, np.int64)),
                  registered=True)

    frame = estimate_manhattan_world_frame(
        ManhattanWorldFrameOptions(max_image_size=512),
        rec, str(tmp_path), verbose=False)
    # Rightward ~ +-X, downward ~ +-Y in world coordinates.
    assert abs(frame[:, 0] @ [1, 0, 0]) > 0.95
    assert abs(frame[:, 1] @ [0, 1, 0]) > 0.95
