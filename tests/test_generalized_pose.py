"""Generalized (rig) absolute pose: the reference's GP3P capability
(ref: src/estimators/generalized_absolute_pose.{h,cc}), rebuilt as a
batched same-camera-P3P RANSAC scored with the generalized reprojection
error across all rig cameras."""

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.estimators.generalized_pose import (
    GeneralizedAbsolutePoseOptions,
    estimate_generalized_absolute_pose,
    refine_generalized_absolute_pose,
)
from sba_tpu.geometry.quaternions import (
    angle_axis_to_quat, quat_normalize, quat_rotate,
)
from sba_tpu.optim.ransac import RANSACOptions


def _make_rig_problem(n_per_cam=40, n_outliers=8, seed=0):
    rng = np.random.default_rng(seed)
    # 3-camera rig: small rotations + baselines (rig->camera).
    rig_q = np.stack([
        np.array([1.0, 0, 0, 0]),
        np.asarray(quat_normalize(angle_axis_to_quat(
            jnp.asarray([0.0, 0.3, 0.0])))),
        np.asarray(quat_normalize(angle_axis_to_quat(
            jnp.asarray([0.0, -0.3, 0.0])))),
    ])
    rig_t = np.array([[0.0, 0, 0], [0.2, 0, 0], [-0.2, 0, 0]])

    # Ground-truth rig pose (world->rig).
    gt_q = np.asarray(quat_normalize(angle_axis_to_quat(
        jnp.asarray([0.1, -0.2, 0.15]))))
    gt_t = np.array([0.3, -0.1, 0.5])

    pts, p2d, cams = [], [], []
    for c in range(3):
        p_world = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n_per_cam, 3))
        p_rig = np.asarray(quat_rotate(jnp.asarray(gt_q), jnp.asarray(p_world))) + gt_t
        p_cam = np.asarray(quat_rotate(jnp.asarray(rig_q[c]), jnp.asarray(p_rig))) + rig_t[c]
        uv = p_cam[:, :2] / p_cam[:, 2:3]
        pts.append(p_world)
        p2d.append(uv)
        cams.append(np.full(n_per_cam, c, np.int32))
    points3d = np.concatenate(pts)
    points2d = np.concatenate(p2d)
    corr_cam = np.concatenate(cams)
    # Outliers: corrupt random rows' 2D observations.
    bad = rng.choice(len(points3d), size=n_outliers, replace=False)
    points2d[bad] += rng.uniform(0.3, 0.8, size=(n_outliers, 2))
    return (jnp.asarray(points3d), jnp.asarray(points2d),
            jnp.asarray(corr_cam), jnp.asarray(rig_q), jnp.asarray(rig_t),
            gt_q, gt_t, bad)


def test_generalized_pose_recovers_rig_pose():
    p3, p2, cc, rq, rt, gt_q, gt_t, bad = _make_rig_problem()
    key = jax.random.PRNGKey(0)
    opt = GeneralizedAbsolutePoseOptions(
        ransac=RANSACOptions(max_error=0.01, confidence=0.999,
                             min_num_trials=500))
    report = estimate_generalized_absolute_pose(key, p3, p2, cc, rq, rt,
                                                options=opt)
    q_est, t_est = report.model
    dq = min(np.abs(np.asarray(q_est) - gt_q).max(),
             np.abs(np.asarray(q_est) + gt_q).max())
    assert dq < 1e-3
    np.testing.assert_allclose(np.asarray(t_est), gt_t, atol=1e-3)
    # Outliers excluded from the support.
    inl = np.asarray(report.inlier_mask)
    assert not inl[bad].any()
    assert inl.sum() >= len(p3) - len(bad) - 2


def test_generalized_refine_polishes_noisy_pose():
    p3, p2, cc, rq, rt, gt_q, gt_t, bad = _make_rig_problem(n_outliers=0)
    rng = np.random.default_rng(3)
    q0 = np.asarray(quat_normalize(jnp.asarray(
        gt_q + rng.normal(scale=0.02, size=4))))
    t0 = gt_t + rng.normal(scale=0.05, size=3)
    q_ref, t_ref = refine_generalized_absolute_pose(
        jnp.asarray(q0), jnp.asarray(t0), p3, p2, cc, rq, rt)
    dq = min(np.abs(np.asarray(q_ref) - gt_q).max(),
             np.abs(np.asarray(q_ref) + gt_q).max())
    assert dq < 1e-5
    np.testing.assert_allclose(np.asarray(t_ref), gt_t, atol=1e-5)
