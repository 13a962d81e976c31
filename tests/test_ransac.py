"""RANSAC + robust pose estimation tests (style of ref: optim/ransac_test.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.estimators.pose import (
    AbsolutePoseOptions,
    RelativePoseOptions,
    estimate_absolute_pose,
    estimate_relative_pose,
    refine_absolute_pose,
)
from sba_tpu.optim.ransac import RANSACOptions, num_required_trials, ransac
from sba_tpu.geometry.quaternions import quat_rotate, quat_to_rotmat
from tests.test_estimators import make_two_view


def corrupt(xy, frac, rng, scale=0.5):
    xy = xy.copy()
    n = len(xy)
    k = int(n * frac)
    idx = rng.choice(n, size=k, replace=False)
    xy[idx] += rng.uniform(-scale, scale, size=(k, 2))
    return xy, idx


def test_num_required_trials():
    opt = RANSACOptions(min_inlier_ratio=0.5, confidence=0.99)
    n3 = num_required_trials(3, opt)
    n5 = num_required_trials(5, opt)
    assert n3 >= 32 and n5 > n3  # bigger samples need more trials
    assert num_required_trials(8, RANSACOptions(min_inlier_ratio=0.01)) == 4096


def test_absolute_pose_with_outliers():
    rng = np.random.default_rng(0)
    xy1, xy2, qb, tb, pts = make_two_view(60, seed=1)
    xy2_c, out_idx = corrupt(xy2, 0.3, rng)
    report = estimate_absolute_pose(
        jax.random.key(0), jnp.asarray(pts), jnp.asarray(xy2_c),
        AbsolutePoseOptions(ransac=RANSACOptions(max_error=0.005,
                                                 min_inlier_ratio=0.4)))
    q, t = report.model
    assert int(report.num_inliers) >= 40
    # Outliers excluded from the mask.
    mask = np.asarray(report.inlier_mask)
    assert not mask[out_idx].any() or mask[out_idx].mean() < 0.2
    dq = min(np.abs(np.asarray(q) - qb).max(), np.abs(np.asarray(q) + qb).max())
    assert dq < 1e-2
    np.testing.assert_allclose(np.asarray(t), tb, atol=5e-2)

    # Refinement tightens the pose.
    q2, t2, _ = refine_absolute_pose(q, t, jnp.asarray(pts), jnp.asarray(xy2_c),
                                     jnp.asarray(mask.astype(np.float64)))
    np.testing.assert_allclose(np.asarray(t2), tb, atol=1e-6)


def test_relative_pose_with_outliers():
    rng = np.random.default_rng(2)
    xy1, xy2, qb, tb, pts = make_two_view(80, seed=3)
    xy2_c, out_idx = corrupt(xy2, 0.25, rng)
    R, t, E, report = estimate_relative_pose(
        jax.random.key(1), jnp.asarray(xy1), jnp.asarray(xy2_c),
        RelativePoseOptions(ransac=RANSACOptions(max_error=0.002,
                                                 min_inlier_ratio=0.5)))
    assert int(report.num_inliers) >= 55
    R_gt = np.array(quat_to_rotmat(jnp.asarray(qb)))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=2e-3)
    t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
    t_gt = tb / np.linalg.norm(tb)
    assert min(np.abs(t_dir - t_gt).max(), np.abs(t_dir + t_gt).max()) < 2e-3


def test_ransac_all_inliers_fast_path():
    xy1, xy2, qb, tb, pts = make_two_view(30, seed=4)
    report = estimate_absolute_pose(
        jax.random.key(2), jnp.asarray(pts), jnp.asarray(xy2),
        AbsolutePoseOptions(ransac=RANSACOptions(max_error=0.005,
                                                 min_inlier_ratio=0.8)))
    assert int(report.num_inliers) == 30


def test_ransac_generic_line_fit():
    """Generic engine on a toy 2D line problem (mirrors ransac_test.cc)."""
    rng = np.random.default_rng(5)
    n = 100
    x = rng.uniform(-5, 5, n)
    y = 2.0 * x + 1.0
    y[rng.choice(n, 30, replace=False)] += rng.uniform(2, 10, 30)
    data = (jnp.asarray(np.stack([x, y], -1)),)

    def solve(pts):
        # 2-point line: y = a x + b -> model (a, b), 1 model per sample.
        (x1, y1), (x2, y2) = pts[0], pts[1]
        a = (y2 - y1) / jnp.where(jnp.abs(x2 - x1) > 1e-9, x2 - x1, 1e-9)
        b = y1 - a * x1
        return (a[None], b[None]), jnp.ones(1, bool)

    def residual(model, pts):
        a, b = model
        return (pts[:, 1] - (a * pts[:, 0] + b)) ** 2

    report = ransac(jax.random.key(3), data, solve, residual, sample_size=2,
                    options=RANSACOptions(max_error=0.1, min_inlier_ratio=0.5))
    a, b = report.model
    assert float(a) == pytest.approx(2.0, abs=1e-6)
    assert float(b) == pytest.approx(1.0, abs=1e-6)
    assert int(report.num_inliers) == 70
