"""Generalized (multi-camera rig) absolute pose estimation.

Capability parity with the reference's GP3P path
(ref: src/estimators/generalized_absolute_pose.{h,cc} `GP3PEstimator`,
used to register rig snapshots from 2D-3D matches gathered across all
rig cameras; ref: src/sfm/incremental_mapper.cc rig registration and
src/base/camera_rig.h extrinsics).

TPU-first substitution for the minimal solver: the reference's GP3P
solves an 8th-degree polynomial per 3-ray sample (Nister/Stewenius) —
branchy scalar root-finding that maps poorly to batched lanes. Here a
hypothesis is a standard P3P solve on 3 correspondences drawn from ONE
rig camera (hypotheses with mixed cameras are flagged invalid and cost
one masked lane), lifted to the rig frame through the known rig
extrinsic; every hypothesis is then scored against ALL correspondences
of ALL rig cameras with the generalized reprojection error — the same
consensus geometry GP3P feeds, in one vmapped RANSAC launch. Final
refinement is a damped Gauss-Newton on the 6-DoF rig pose over inlier
correspondences of every camera (the Ceres `RefineGeneralizedAbsolutePose`
equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sba_tpu.estimators.absolute_pose import p3p_solve
from sba_tpu.geometry.quaternions import (
    pose_inverse,
    pose_product,
    quat_retract,
    quat_rotate,
)
from sba_tpu.optim.ransac import RANSACOptions, RANSACReport, ransac


@dataclass(frozen=True)
class GeneralizedAbsolutePoseOptions:
    ransac: RANSACOptions = RANSACOptions(max_error=0.01)  # normalized coords
    refine_iterations: int = 15


def _rig_reproj_sq_error(model, points3d, points2d, corr_cam,
                         rig_qvecs, rig_tvecs):
    """Generalized reprojection: world -> rig -> correspondence's camera.
    model = (rig qvec, rig tvec); rig_qvecs/tvecs [C, .] rig->camera."""
    rq, rt = model
    p_rig = quat_rotate(rq[None, :], points3d) + rt[None, :]
    cq = rig_qvecs[corr_cam]                       # [N, 4]
    ct = rig_tvecs[corr_cam]                       # [N, 3]
    p_cam = quat_rotate(cq, p_rig) + ct
    z = p_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    uv = p_cam[:, :2] / safe_z[:, None]
    err = jnp.sum((uv - points2d) ** 2, axis=-1)
    return jnp.where(z > 0, err, 1e12)


def estimate_generalized_absolute_pose(
        key, points3d, points2d, corr_cam, rig_qvecs, rig_tvecs,
        options: Optional[GeneralizedAbsolutePoseOptions] = None,
        mask=None) -> RANSACReport:
    """Rig pose from 2D-3D correspondences across rig cameras.

    points3d [N, 3] world; points2d [N, 2] NORMALIZED coords in the
    correspondence's own camera; corr_cam [N] int32 rig-camera index;
    rig_qvecs/rig_tvecs [C, 4]/[C, 3] fixed rig->camera extrinsics.
    Returns a RANSACReport whose model is the rig pose (qvec, tvec),
    world->rig.
    """
    opt = options or GeneralizedAbsolutePoseOptions()
    rig_qvecs = jnp.asarray(rig_qvecs)
    rig_tvecs = jnp.asarray(rig_tvecs)

    def solve(p3d, p2d, cams):
        same = (cams[0] == cams[1]) & (cams[0] == cams[2])
        q_cam, t_cam, valid = p3p_solve(p3d, p2d)          # [M, ...]
        # Lift world->camera_j to world->rig: T_r = T_j_rig^-1 o T_cj.
        iq, it = pose_inverse(rig_qvecs[cams[0]], rig_tvecs[cams[0]])
        rq, rt = pose_product(iq[None, :], it[None, :], q_cam, t_cam)
        return (rq, rt), valid & same

    def refit(weights, p3d, p2d, cams):
        # Weighted refinement happens in LO via the residual-driven
        # weights; the heavy final refine is exposed separately.
        return _refine_generalized_weighted(
            weights, p3d, p2d, cams, rig_qvecs, rig_tvecs,
            iters=opt.refine_iterations)

    return ransac(
        key, (points3d, points2d, corr_cam),
        solve_fn=solve,
        residual_fn=lambda model, p3, p2, cams: _rig_reproj_sq_error(
            model, p3, p2, cams, rig_qvecs, rig_tvecs),
        sample_size=3,
        options=opt.ransac,
        mask=mask,
        refit_fn=refit,
    )


def _refine_generalized_weighted(weights, points3d, points2d, corr_cam,
                                 rig_qvecs, rig_tvecs, iters=15,
                                 model=None):
    """Damped Gauss-Newton on the 6-DoF rig pose (weighted)."""
    # Seed from weighted EPnP in the dominant camera is unnecessary —
    # LO always passes the current best model via closure-free refit:
    # recover a seed by weighted linear alignment instead. In practice
    # the RANSAC driver calls refit with weights derived from the best
    # model's inliers, so a seed from those inliers' strongest camera
    # P3P is adequate; we instead run GN from the weighted EPnP of the
    # dominant camera for robustness.
    dtype = points3d.dtype
    cam_w = jax.ops.segment_sum(weights, corr_cam,
                                num_segments=rig_qvecs.shape[0])
    dom = jnp.argmax(cam_w)
    from sba_tpu.estimators.pose import _weighted_epnp

    in_dom = (corr_cam == dom).astype(dtype) * weights
    q0, t0, _ = _weighted_epnp(in_dom, points3d, points2d)
    iq, it = pose_inverse(rig_qvecs[dom], rig_tvecs[dom])
    rq, rt = pose_product(iq, it, q0, t0)
    if model is not None:
        rq, rt = model

    def residuals(delta, rq, rt):
        q = quat_retract(rq, delta[:3])
        t = rt + delta[3:]
        p_rig = quat_rotate(q[None, :], points3d) + t[None, :]
        cq = rig_qvecs[corr_cam]
        ct = rig_tvecs[corr_cam]
        p_cam = quat_rotate(cq, p_rig) + ct
        z = p_cam[:, 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
        uv = p_cam[:, :2] / safe_z[:, None]
        r = (uv - points2d) * weights[:, None]
        return r.reshape(-1)

    z6 = jnp.zeros(6, dtype)

    def body(_, state):
        rq, rt = state
        r = residuals(z6, rq, rt)
        J = jax.jacfwd(residuals)(z6, rq, rt)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=dtype)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g)
        return quat_retract(rq, delta[:3]), rt + delta[3:]

    rq, rt = jax.lax.fori_loop(0, iters, body, (rq, rt))
    return rq, rt


def refine_generalized_absolute_pose(rq, rt, points3d, points2d, corr_cam,
                                     rig_qvecs, rig_tvecs, weights=None,
                                     iters: int = 20):
    """Public GN refinement of a rig pose against all rig correspondences
    (ref: the Ceres refinement step after GP3P RANSAC)."""
    if weights is None:
        weights = jnp.ones(points3d.shape[0], points3d.dtype)
    return _refine_generalized_weighted(
        weights, points3d, points2d, corr_cam,
        jnp.asarray(rig_qvecs), jnp.asarray(rig_tvecs), iters=iters,
        model=(rq, rt))
