"""High-level robust pose estimation (the mapper's workhorses).

Capability parity with ref: src/estimators/pose.{h,cc}:
- `EstimateAbsolutePose` (:79): P3P LO-RANSAC (the reference's focal-factor
  ThreadPool sweep becomes one extra vmapped batch axis when enabled).
- `RefineAbsolutePose`: Ceres pose-only refinement -> our BA engine with
  points fixed.
- `EstimateRelativePose`: 5-point RANSAC + cheirality pose recovery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sba_tpu.estimators.absolute_pose import epnp_solve, p3p_solve
from sba_tpu.estimators.essential_matrix import (
    essential_5pt,
    pose_from_essential,
    sampson_error_e,
)
from sba_tpu.geometry.quaternions import quat_rotate
from sba_tpu.optim.ransac import RANSACOptions, RANSACReport, ransac


@dataclass(frozen=True)
class AbsolutePoseOptions:
    ransac: RANSACOptions = RANSACOptions(max_error=0.01)  # normalized coords
    estimate_focal_length: bool = False


def _reproj_sq_error(model, points3d, points2d):
    qvec, tvec = model
    p_cam = quat_rotate(qvec[None, :], points3d) + tvec[None, :]
    z = p_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    uv = p_cam[:, :2] / safe_z[:, None]
    err = jnp.sum((uv - points2d) ** 2, axis=-1)
    return jnp.where(z > 0, err, 1e12)


def estimate_absolute_pose(key, points3d, points2d,
                           options: Optional[AbsolutePoseOptions] = None,
                           mask=None) -> RANSACReport:
    """P3P LO-RANSAC absolute pose from 2D-3D correspondences.

    points2d: NORMALIZED image coordinates [N, 2]; points3d: [N, 3].
    Returns a RANSACReport whose model is (qvec [4], tvec [3]).
    """
    opt = options or AbsolutePoseOptions()
    report = ransac(
        key, (points3d, points2d),
        solve_fn=_p3p_ransac_solve,
        residual_fn=_reproj_sq_error,
        sample_size=3,
        options=opt.ransac,
        mask=mask,
        refit_fn=_epnp_ransac_refit,
    )
    return report


def _p3p_ransac_solve(p3d, p2d):
    q, t, valid = p3p_solve(p3d, p2d)  # [4, ...]
    return (q, t), valid


def _epnp_ransac_refit(weights, p3d, p2d):
    q, t, _ = _weighted_epnp(weights, p3d, p2d)
    return (q, t)


def _weighted_epnp(weights, points3d, points2d):
    """EPnP restricted to inliers with static shapes: outlier rows are
    replaced by a copy of the strongest inlier correspondence (a duplicated
    TRUE correspondence is consistent and only reweights the LS system;
    dropping rows would need dynamic shapes)."""
    anchor = jnp.argmax(weights)
    keep = (weights > 0.5)[:, None]
    p3 = jnp.where(keep, points3d, points3d[anchor])
    p2 = jnp.where(keep, points2d, points2d[anchor])
    return epnp_solve(p3, p2)


def refine_absolute_pose(qvec, tvec, points3d, points2d, weights=None,
                         max_iterations: int = 30):
    """Pose-only LM refinement against fixed 3D points (ref: pose.cc
    RefineAbsolutePose via Ceres). Normalized coords; returns (qvec, tvec)."""
    from sba_tpu.optim.ba import BAOptions, BAProblem, _bundle_adjust_impl, MAXP

    n = points3d.shape[0]
    dtype = points3d.dtype
    if weights is None:
        weights = jnp.ones(n, dtype)
    cam = jnp.zeros((1, MAXP), dtype).at[0, 0].set(1.0)  # identity pinhole
    problem = BAProblem(
        qvecs=qvec[None, :], tvecs=tvec[None, :],
        points=points3d, cam_params=cam,
        obs_image=jnp.zeros(n, jnp.int32),
        obs_point=jnp.arange(n, dtype=jnp.int32),
        obs_cam=jnp.zeros(n, jnp.int32),
        obs_xy=points2d, obs_mask=weights.astype(dtype),
        free_rot=jnp.ones(1, dtype), free_trans=jnp.ones((1, 3), dtype),
        free_points=jnp.zeros(n, dtype),
        free_cam=jnp.zeros((1, MAXP), dtype),
    )
    opt = BAOptions(model_id=0, max_iterations=max_iterations,
                    loss="cauchy", loss_scale=0.01, solver="dense_schur")
    out, summary = _bundle_adjust_impl(problem, opt, True)
    return out.qvecs[0], out.tvecs[0], summary


@dataclass(frozen=True)
class RelativePoseOptions:
    ransac: RANSACOptions = RANSACOptions(max_error=0.004)


def estimate_relative_pose(key, xy1, xy2,
                           options: Optional[RelativePoseOptions] = None,
                           mask=None):
    """5-point LO-RANSAC relative pose (normalized coords).

    Returns (R, t, E, report) with cheirality-consistent (R, t)
    (ref: estimators/pose.cc EstimateRelativePose /
    two_view_geometry.cc EstimateCalibrated path).
    """
    opt = options or RelativePoseOptions()
    report = ransac(
        key, (xy1, xy2),
        solve_fn=essential_5pt,
        residual_fn=sampson_error_e,
        sample_size=5,
        options=opt.ransac,
        mask=mask,
        refit_fn=_weighted_essential,
    )
    E = report.model
    R, t, n_front = pose_from_essential(
        E, xy1, xy2, mask=report.inlier_mask.astype(xy1.dtype))
    return R, t, E, report


def _weighted_essential(weights, xy1, xy2):
    """Weighted 8-point-style refit (rows scaled by sqrt(w))."""
    from sba_tpu.estimators.essential_matrix import _epipolar_rows

    A = _epipolar_rows(xy1, xy2) * jnp.sqrt(jnp.maximum(weights, 0.0))[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1, :].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2.0
    E = U @ jnp.diag(jnp.asarray([s, s, 0.0], E.dtype)) @ Vt2
    return E / jnp.maximum(jnp.linalg.norm(E.reshape(-1)), 1e-12)
