"""Camera rigs: multi-camera platforms with fixed relative poses.

Capability parity with ref: src/base/camera_rig.{h,cc} (`CameraRig`:
per-camera relative poses w.r.t. a reference camera, snapshot grouping,
`ComputeRigFromReconstruction` averaging) and the rig-constrained BA of
src/optim/bundle_adjustment.h:270 (`RigBundleAdjuster`: one free pose per
snapshot; image poses = rig_pose composed with cam_from_rig).

TPU design: rig composition is a pure function on (snapshot poses,
relative poses) — the rig BA reuses the standard BA engine by
reparametrizing through composition inside the residual, with Jacobians
flowing through `quat_multiply` automatically (autodiff replaces the
reference's hand-plumbed parameter blocks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import (
    pose_inverse,
    pose_product,
    quat_multiply,
    quat_normalize,
    quat_slerp,
)


@dataclass
class CameraRig:
    """Host container (ref: camera_rig.h:44)."""

    ref_camera_id: int
    # camera_id -> (qvec, tvec): transform REF-cam frame -> this cam frame.
    cams_from_rig: Dict[int, Tuple[np.ndarray, np.ndarray]] = \
        field(default_factory=dict)
    # snapshots: list of lists of image_ids captured simultaneously.
    snapshots: List[List[int]] = field(default_factory=list)

    def add_camera(self, camera_id: int, qvec=None, tvec=None):
        q = np.array([1.0, 0, 0, 0]) if qvec is None else np.asarray(qvec)
        t = np.zeros(3) if tvec is None else np.asarray(tvec)
        self.cams_from_rig[camera_id] = (q, t)

    def add_snapshot(self, image_ids: Sequence[int]):
        self.snapshots.append(list(image_ids))

    def num_cameras(self) -> int:
        return len(self.cams_from_rig)

    def compute_rig_from_reconstruction(self, reconstruction) -> None:
        """Average each camera's pose relative to the reference camera over
        all snapshots (ref: camera_rig.cc ComputeRigFromReconstruction)."""
        rel_q: Dict[int, List[np.ndarray]] = {c: [] for c in
                                              self.cams_from_rig}
        rel_t: Dict[int, List[np.ndarray]] = {c: [] for c in
                                              self.cams_from_rig}
        for snap in self.snapshots:
            ref_img = None
            for iid in snap:
                img = reconstruction.images.get(iid)
                if img is not None and img.camera_id == self.ref_camera_id \
                        and reconstruction.is_registered(iid):
                    ref_img = img
                    break
            if ref_img is None:
                continue
            # Host-side per-image pose algebra (CPU backend; a device
            # round-trip per image would cost a sync each — utils/host.py).
            from sba_tpu.utils.host import on_host
            with on_host():
                q_ref_inv, t_ref_inv = pose_inverse(
                    jnp.asarray(ref_img.qvec), jnp.asarray(ref_img.tvec))
                for iid in snap:
                    img = reconstruction.images.get(iid)
                    if img is None or not reconstruction.is_registered(iid):
                        continue
                    q, t = pose_product(jnp.asarray(img.qvec),
                                        jnp.asarray(img.tvec),
                                        q_ref_inv, t_ref_inv)
                    rel_q[img.camera_id].append(np.asarray(q))
                    rel_t[img.camera_id].append(np.asarray(t))
        from sba_tpu.utils.host import on_host
        with on_host():
            for cid in self.cams_from_rig:
                if not rel_q[cid]:
                    continue
                # Quaternion average via slerp-chain (small sets) + t mean.
                qs = rel_q[cid]
                q_avg = jnp.asarray(qs[0])
                for k, qk in enumerate(qs[1:], start=2):
                    q_avg = quat_slerp(q_avg, jnp.asarray(qk), 1.0 / k)
                self.cams_from_rig[cid] = (
                    np.asarray(quat_normalize(q_avg)),
                    np.mean(np.stack(rel_t[cid]), axis=0))


def estimate_snapshot_relative_pose(rig: "CameraRig", cameras,
                                    obs1, obs2, options=None, seed=0):
    """Rig-to-rig relative pose between two snapshots via GR6P RANSAC
    (ref: src/estimators/generalized_relative_pose.h:55 — the reference
    leaves GR6PEstimator unwired; here it initializes rig trajectories).

    obs1/obs2: per-correspondence lists of (camera_id, xy_pixels) in
    snapshot 1 and 2 — matched features, each seen by (possibly
    different) rig cameras. `cameras`: camera_id -> (fx, fy, cx, cy)
    for pixel->normalized conversion. Returns the
    GeneralizedRelativePoseReport (rig1 -> rig2 transform + inliers).

    Measured solve time (3-camera rig, 40 correspondences, 30%
    outliers, host CPU): ~10-30 s — the 8-point adaptive bound keeps
    ~100 nonlinear trials alive at 70% inliers; cleaner inputs exit at
    the 85%-support break after a few trials
    (tests/test_generalized_relative_pose.py::
    test_rig_snapshot_wiring_and_timing records the number)."""
    from sba_tpu.estimators.generalized_relative_pose import \
        estimate_generalized_relative_pose
    from sba_tpu.geometry.quaternions import np_quat_to_rotmat

    def unpack(obs):
        cam_R, cam_t, xy = [], [], []
        for camera_id, xy_px in obs:
            q, t = rig.cams_from_rig[camera_id]
            fx, fy, cx, cy = cameras[camera_id]
            cam_R.append(np_quat_to_rotmat(np.asarray(q)))
            cam_t.append(np.asarray(t))
            xy.append([(xy_px[0] - cx) / fx, (xy_px[1] - cy) / fy])
        return np.stack(cam_R), np.stack(cam_t), np.asarray(xy)

    R1, t1, xy1 = unpack(obs1)
    R2, t2, xy2 = unpack(obs2)
    return estimate_generalized_relative_pose(
        R1, t1, xy1, R2, t2, xy2, options=options, seed=seed)


def compose_rig_poses(snap_qvec, snap_tvec, cam_qvec, cam_tvec):
    """Batched composition: image pose = cam_from_rig o rig_pose.

    snap_*: [S, 4/3] rig (reference-camera) poses; cam_*: [S, 4/3]
    per-image relative poses (gathered). Returns image poses [S, 4/3].
    """
    return jax.vmap(pose_product)(cam_qvec, cam_tvec, snap_qvec, snap_tvec)


def rig_bundle_adjust(problem, rig_image_snapshot, rig_image_cam_q,
                      rig_image_cam_t, options=None,
                      refine_relative_poses: bool = False):
    """Rig-constrained BA (ref: bundle_adjustment.h:270 RigBundleAdjuster).

    problem: a standard `BAProblem` whose [N] images are grouped into
    snapshots: rig_image_snapshot [N] -> snapshot row, with per-image
    rig-relative poses (rig_image_cam_q/t [N, 4/3]).

    The free variables become one pose per snapshot (plus points/intrinsics
    as in the base problem); image poses are composed on the fly. Implemented
    as a Gauss-Newton loop with autodiff through the composition —
    correctness-first (rig solves are small: snapshots x 6 dofs).
    """
    import jax.numpy as jnp

    from sba_tpu.optim.ba import BAOptions, _cost, _residuals_only
    from sba_tpu.geometry.quaternions import quat_retract

    opt = options or BAOptions()
    snap_ids = np.asarray(rig_image_snapshot)
    S = int(snap_ids.max()) + 1
    dtype = problem.tvecs.dtype

    # Initial snapshot poses from the first image of each snapshot:
    # x_img = cam(rig(x))  =>  rig = cam_from_rig^-1 o image.
    snap_q0 = np.zeros((S, 4))
    snap_t0 = np.zeros((S, 3))
    seen = set()
    for row in range(problem.qvecs.shape[0]):
        s = int(snap_ids[row])
        if s in seen:
            continue
        seen.add(s)
        from sba_tpu.utils.host import on_host
        with on_host():
            qc_inv, tc_inv = pose_inverse(
                jnp.asarray(rig_image_cam_q[row]),
                jnp.asarray(rig_image_cam_t[row]))
            q, t = pose_product(qc_inv, tc_inv,
                                jnp.asarray(problem.qvecs[row]),
                                jnp.asarray(problem.tvecs[row]))
            snap_q0[s] = np.asarray(quat_normalize(q))
            snap_t0[s] = np.asarray(t)

    snap_q = jnp.asarray(snap_q0, dtype)
    snap_t = jnp.asarray(snap_t0, dtype)
    cam_q = jnp.asarray(rig_image_cam_q, dtype)
    cam_t = jnp.asarray(rig_image_cam_t, dtype)
    sid = jnp.asarray(snap_ids)

    def image_poses(sq, st):
        return compose_rig_poses(sq[sid], st[sid], cam_q, cam_t)

    def cost_of(delta):
        dq = delta[:, :3]
        dt = delta[:, 3:]
        sq = jax.vmap(quat_retract)(snap_q, dq)
        st = snap_t + dt
        iq, it = image_poses(sq, st)
        r = _residuals_only(iq, it, problem.points, problem.cam_params,
                            problem, opt)
        return 0.5 * jnp.sum(problem.obs_mask * jnp.sum(r * r, -1))

    # Damped Newton on the flat [S*6] snapshot-pose delta — the system is
    # tiny (6 dofs per snapshot), so the exact Hessian via autodiff plus
    # one dense solve per iteration is both simplest and fastest.
    flat_cost = lambda d: cost_of(d.reshape(S, 6))
    grad_fn = jax.grad(flat_cost)
    hess_fn = jax.hessian(flat_cost)
    delta = jnp.zeros(S * 6, dtype)
    cost = flat_cost(delta)
    lam = jnp.asarray(1e-6, dtype)
    for _ in range(opt.max_iterations):
        g = grad_fn(delta)
        Hm = hess_fn(delta)
        step = jnp.linalg.solve(
            Hm + lam * jnp.diag(jnp.clip(jnp.diag(Hm), 1e-8, None)), -g)
        new = delta + step
        c_new = flat_cost(new)
        improved = c_new < cost
        delta = jnp.where(improved, new, delta)
        cost = jnp.where(improved, c_new, cost)
        lam = jnp.where(improved, lam * 0.3, lam * 10.0)
    delta = delta.reshape(S, 6)

    sq = jax.vmap(quat_retract)(snap_q, delta[:, :3])
    st = snap_t + delta[:, 3:]
    iq, it = image_poses(sq, st)
    return dict(snapshot_qvecs=sq, snapshot_tvecs=st,
                image_qvecs=iq, image_tvecs=it, final_cost=cost)
