"""Two-view geometry classification tests (ref style:
estimators/two_view_geometry usage in matching verification)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.estimators.two_view_geometry import (
    TwoViewConfig,
    TwoViewGeometryOptions,
    estimate_two_view_geometry,
)
from sba_tpu.geometry.quaternions import angle_axis_to_quat, quat_rotate, \
    quat_to_rotmat


def make_pair(planar=False, n=120, noise=0.0, outlier_frac=0.0, seed=0):
    rng = np.random.default_rng(seed)
    f, cx, cy = 500.0, 320.0, 240.0
    if planar:
        pts = np.concatenate(
            [rng.uniform(-1, 1, (n, 2)), np.zeros((n, 1))], axis=1)
        pts[:, 2] += 4.0  # plane z = 4 (constant depth in cam1 frame-ish)
    else:
        pts = rng.uniform(-1, 1, (n, 3))
        pts[:, 2] = rng.uniform(3, 8, n)
    q = np.asarray(angle_axis_to_quat(jnp.array([0.05, 0.1, 0.02])))
    t = np.array([0.4, 0.05, 0.1])
    p1 = pts
    p2 = np.asarray(quat_rotate(jnp.asarray(q)[None], jnp.asarray(pts))) + t
    xy1 = p1[:, :2] / p1[:, 2:] * f + [cx, cy]
    xy2 = p2[:, :2] / p2[:, 2:] * f + [cx, cy]
    xy1 += rng.normal(0, noise, xy1.shape)
    xy2 += rng.normal(0, noise, xy2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        xy2[:n_out] = rng.uniform(0, 640, (n_out, 2))
    return xy1, xy2, (f, f, cx, cy), q, t


def test_calibrated_pair():
    xy1, xy2, K, q_true, t_true = make_pair(noise=0.2, outlier_frac=0.2)
    res = estimate_two_view_geometry(
        xy1, xy2, K, K, image_size1=(640, 480), image_size2=(640, 480))
    assert res.config == int(TwoViewConfig.CALIBRATED)
    assert res.num_inliers > 80
    # Relative pose recovered (t up to scale): MSAC scoring + Sampson-GN
    # LO refit give near-noise-floor accuracy despite 20% outliers.
    R_est = np.asarray(quat_to_rotmat(jnp.asarray(res.qvec)))
    R_true = np.asarray(quat_to_rotmat(jnp.asarray(q_true)))
    assert np.abs(R_est - R_true).max() < 0.01
    t_dir = t_true / np.linalg.norm(t_true)
    assert np.abs(res.tvec - t_dir).max() < 0.02


def test_planar_pair_detected():
    xy1, xy2, K, q_true, t_true = make_pair(planar=True, noise=0.1)
    res = estimate_two_view_geometry(
        xy1, xy2, K, K, image_size1=(640, 480), image_size2=(640, 480))
    # PLANAR_OR_PANORAMIC now resolves to PLANAR/PANORAMIC via the
    # homography decomposition (ref: two_view_geometry.cc:221-228).
    assert res.config in (int(TwoViewConfig.PLANAR),
                          int(TwoViewConfig.CALIBRATED))
    # H must explain nearly everything on a plane.
    assert res.num_inliers > 90
    # The H-decomposed pose must agree with ground truth: this is the
    # configuration where pose-from-E is ill-conditioned
    # (ref: src/base/homography_matrix.cc:186).
    R_est = np.asarray(quat_to_rotmat(jnp.asarray(res.qvec)))
    R_true = np.asarray(quat_to_rotmat(jnp.asarray(q_true)))
    # Tolerances reflect H-from-noisy-RANSAC accuracy (0.1 px noise), not
    # the decomposition: the noise-free path is exact to 1e-6
    # (test_pose_from_homography_cheirality).
    assert np.abs(R_est - R_true).max() < 0.03
    t_dir = t_true / np.linalg.norm(t_true)
    assert np.abs(res.tvec - t_dir).max() < 0.15


def test_panoramic_pair_pure_rotation():
    """Pure-rotation pair: E is degenerate (t = 0); the H decomposition
    must detect the rotation-only case and report PANORAMIC with the
    correct R (ref: homography_matrix.cc:96-103 rotation branch)."""
    rng = np.random.default_rng(3)
    f, cx, cy = 500.0, 320.0, 240.0
    n = 150
    pts = rng.uniform(-1, 1, (n, 3))
    pts[:, 2] = rng.uniform(3, 8, n)
    q = np.asarray(angle_axis_to_quat(jnp.array([0.03, 0.12, 0.01])))
    p2 = np.asarray(quat_rotate(jnp.asarray(q)[None], jnp.asarray(pts)))
    xy1 = pts[:, :2] / pts[:, 2:] * f + [cx, cy]
    xy2 = p2[:, :2] / p2[:, 2:] * f + [cx, cy]
    keep = ((xy2[:, 0] > 0) & (xy2[:, 0] < 640)
            & (xy2[:, 1] > 0) & (xy2[:, 1] < 480))
    xy1, xy2 = xy1[keep], xy2[keep]
    res = estimate_two_view_geometry(
        xy1, xy2, (f, f, cx, cy), (f, f, cx, cy),
        image_size1=(640, 480), image_size2=(640, 480))
    assert res.config == int(TwoViewConfig.PANORAMIC)
    assert np.linalg.norm(res.tvec) == 0.0
    R_est = np.asarray(quat_to_rotmat(jnp.asarray(res.qvec)))
    R_true = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    assert np.abs(R_est - R_true).max() < 1e-3


def test_decompose_homography_roundtrip():
    """Compose H from (R, t, n, d) with the reference formula
    (ref: homography_matrix.cc:276 HomographyMatrixFromPose) and verify
    the Malis/Vargas decomposition returns a candidate matching it."""
    from sba_tpu.estimators.homography_matrix import decompose_homography

    f, cx, cy = 500.0, 320.0, 240.0
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    q = np.asarray(angle_axis_to_quat(jnp.array([0.05, 0.1, 0.02])))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    t = np.array([0.4, 0.05, 0.1])
    nrm = np.array([0.1, -0.05, -1.0])
    nrm = nrm / np.linalg.norm(nrm)
    d = 4.0
    H = K @ (R - np.outer(t, nrm) / d) @ np.linalg.inv(K)
    Rs, ts, ns = decompose_homography(H, K, K)
    assert len(Rs) == 4
    errs = []
    for Ri, ti, ni in zip(Rs, ts, ns):
        errs.append(np.abs(Ri - R).max() + np.abs(ti - t / d).max()
                    + np.abs(ni - nrm).max())
    assert min(errs) < 1e-6


def test_pose_from_homography_cheirality():
    """Cheirality voting over the 8 sign candidates picks the true
    (R, t) for a planar scene (ref: homography_matrix.cc:186)."""
    from sba_tpu.estimators.homography_matrix import pose_from_homography

    xy1, xy2, Kt, q_true, t_true = make_pair(planar=True, noise=0.0,
                                             seed=5)
    f = Kt[0]
    K = np.array([[f, 0, Kt[2]], [0, f, Kt[3]], [0, 0, 1.0]])
    R_true = np.asarray(quat_to_rotmat(jnp.asarray(q_true)))
    nrm = np.array([0.0, 0.0, 1.0])
    d = 4.0
    # Plane z=4 with x2 = R x1 + t => H = K (R + t n^T / d) K^-1.
    H = K @ (R_true + np.outer(t_true, nrm) / d) @ np.linalg.inv(K)
    R, t, n, pts3 = pose_from_homography(H, K, K, xy1, xy2)
    assert np.abs(R - R_true).max() < 1e-6
    t_dir_est = t / np.linalg.norm(t)
    t_dir = t_true / np.linalg.norm(t_true)
    assert np.abs(t_dir_est - t_dir).max() < 1e-6
    assert len(pts3) > 100


def test_uncalibrated_pair():
    xy1, xy2, K, _, _ = make_pair(noise=0.2)
    res = estimate_two_view_geometry(xy1, xy2)  # no intrinsics
    assert res.config in (int(TwoViewConfig.UNCALIBRATED),
                          int(TwoViewConfig.PLANAR_OR_PANORAMIC))
    assert res.num_inliers > 80


def test_degenerate_too_few():
    xy1 = np.random.default_rng(0).uniform(0, 100, (5, 2))
    res = estimate_two_view_geometry(xy1, xy1)
    assert res.config == int(TwoViewConfig.DEGENERATE)


def test_watermark_detected():
    """Identical border translation -> WATERMARK demotion
    (ref: two_view_geometry.cc:514 DetectWatermark)."""
    rng = np.random.default_rng(1)
    n = 60
    # All matches on the bottom border, pure small translation.
    xy1 = np.stack([rng.uniform(0, 640, n),
                    rng.uniform(465, 478, n)], -1)
    xy2 = xy1 + [1.5, 0.0]
    res = estimate_two_view_geometry(
        xy1, xy2, (500, 500, 320, 240), (500, 500, 320, 240),
        image_size1=(640, 480), image_size2=(640, 480))
    assert res.config == int(TwoViewConfig.WATERMARK)


def test_pure_random_degenerate():
    rng = np.random.default_rng(2)
    xy1 = rng.uniform(0, 640, (100, 2))
    xy2 = rng.uniform(0, 640, (100, 2))
    res = estimate_two_view_geometry(
        xy1, xy2, (500, 500, 320, 240), (500, 500, 320, 240),
        options=TwoViewGeometryOptions(max_error=1.0, detect_watermark=False))
    assert res.config == int(TwoViewConfig.DEGENERATE) \
        or res.num_inliers < 30


def test_estimate_multiple_two_rigid_motions():
    """EstimateMultiple (ref: two_view_geometry.h:158-166): a pair
    whose correspondences mix TWO rigid motions yields two models, each
    marked MULTIPLE, with disjoint inlier sets covering both motions."""
    from sba_tpu.estimators.two_view_geometry import (
        TwoViewConfig, TwoViewGeometryOptions,
        estimate_two_view_geometry_multiple)

    rng = np.random.default_rng(3)
    f, cx, cy = 400.0, 320.0, 240.0
    n_per = 60

    def motion(R, t, seed):
        r2 = np.random.default_rng(seed)
        pts = np.stack([r2.uniform(-2, 2, n_per), r2.uniform(-1.5, 1.5, n_per),
                        r2.uniform(4, 8, n_per)], 1)
        p1 = pts
        p2 = pts @ R.T + t
        a1 = f * p1[:, :2] / p1[:, 2:] + [cx, cy]
        a2 = f * p2[:, :2] / p2[:, 2:] + [cx, cy]
        return a1, a2

    def rotz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    a1, a2 = motion(rotz(0.05), np.array([0.8, 0.0, 0.1]), 1)
    b1, b2 = motion(rotz(-0.25), np.array([-0.3, 0.9, -0.4]), 2)
    xy1 = np.concatenate([a1, b1]) + rng.normal(0, 0.2, (2 * n_per, 2))
    xy2 = np.concatenate([a2, b2]) + rng.normal(0, 0.2, (2 * n_per, 2))

    res = estimate_two_view_geometry_multiple(
        xy1, xy2, (f, f, cx, cy), (f, f, cx, cy), (640, 480), (640, 480),
        options=TwoViewGeometryOptions(detect_watermark=False))
    assert len(res) >= 2, f"found {len(res)} models"
    assert all(r.config == int(TwoViewConfig.MULTIPLE) for r in res)
    m0 = res[0].inlier_mask
    m1 = res[1].inlier_mask
    assert not (m0 & m1).any(), "inlier sets must be disjoint"
    # Each model dominated by one motion's correspondences.
    a_share0 = m0[:n_per].sum() / max(m0.sum(), 1)
    a_share1 = m1[:n_per].sum() / max(m1.sum(), 1)
    assert (a_share0 > 0.8 and a_share1 < 0.2) \
        or (a_share0 < 0.2 and a_share1 > 0.8), (a_share0, a_share1)
