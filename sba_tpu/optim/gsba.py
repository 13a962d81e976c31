"""Geometric Semantic Bundle Adjustment: joint camera poses + 3D cylinders.

TPU-native redesign of the fork's second workload
(ref: src/optim/geometric_semantic_bundle_adjustment.{h,cc},
src/base/geometric_semantic_cost_functions.h, src/util/cylinder.h). What the
reference does:

- One residual per (image x cylinder): ``1 - IoU`` between the projected
  cylinder silhouette (a convex quadrilateral from the two tangent lines)
  and a boolean semantic mask (pixels == trunk_semantic_class, default 250;
  mask built at ref .cc:1283-1338), with a ScaledLoss of 1/num_images
  (ref .cc:714-726).
- Optional landmark term: standard reprojection residuals with weight
  ``landmark_error_weight / total_num_2d_features`` (ref .cc:729-794).
- Two cylinder parametrizations: (qvec, tvec, radius, height) and
  "by 2 points" (tvec1, tvec2, radius) (ref cylinder_by_2_points.h).
- Numeric central differences throughout; radius/height kept positive via
  lower bounds (NOTE: the reference applies the height bound to the radius
  block — a bug at ref .cc:1180. We use log-parametrization instead, which
  keeps both positive by construction and needs no bound machinery).

TPU-first design: all (image, cylinder) silhouettes rasterize in ONE batched
soft half-plane program (models/cylinder.py), the IoU reduces over pixels on
the VPU, and the LM Jacobian is exact forward-mode autodiff through tangent
point construction -> projection -> soft rasterization -> soft IoU. A hard
mode reproduces the reference's discrete counts for parity metrics.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import quat_retract
from sba_tpu.models.cylinder import (
    project_quadrilateral,
    quadrilateral_mask,
    semantic_iou,
)
from sba_tpu.optim.losses import loss_value, loss_weight


class GSBAProblem(NamedTuple):
    qvecs: jnp.ndarray        # [N, 4]
    tvecs: jnp.ndarray        # [N, 3]
    cam_params: jnp.ndarray   # [N, 3] SIMPLE_PINHOLE
    sem_masks: jnp.ndarray    # [N, H, W] float 0/1 (label == trunk class)
    # Cylinder state, default parametrization (by-2-points converts through
    # this form inside the residual).
    cyl_qvec: jnp.ndarray     # [K, 4]
    cyl_tvec: jnp.ndarray     # [K, 3]
    cyl_log_radius: jnp.ndarray  # [K]
    cyl_log_height: jnp.ndarray  # [K]
    free_rot: jnp.ndarray     # [N]
    free_trans: jnp.ndarray   # [N, 3]
    # Optional landmark (reprojection) term; empty arrays disable it.
    points: jnp.ndarray       # [P, 3]
    obs_image: jnp.ndarray    # [O]
    obs_point: jnp.ndarray    # [O]
    obs_xy: jnp.ndarray       # [O, 2]
    obs_mask: jnp.ndarray     # [O]
    free_points: jnp.ndarray  # [P]
    # Per-image geometry-term weight. None -> the reference's uniform
    # ScaledLoss(1/num_images) (ref .cc:714-726). parallel/gsba_spmd.py
    # sets it explicitly (1/N_real for real images, 0 for shard padding).
    img_weight: Optional[jnp.ndarray] = None  # [N]


@dataclass(frozen=True)
class GSBAOptions:
    """Mirrors GeometricSemanticBundleAdjustmentOptions
    (ref: src/optim/geometric_semantic_bundle_adjustment.h:51-152)."""

    trunk_semantic_class: float = 250.0
    refine_geometry: bool = True
    refine_extrinsics: bool = True
    cylinder_parametrization: str = "default"  # default | by_2_points
    landmark_error_weight: float = 0.0
    loss: str = "trivial"
    loss_scale: float = 1.0
    mode: str = "soft"         # soft | hard (hard only for evaluation)
    # Soft silhouette sharpness in pixels. Must stay well below the
    # silhouette width or the blur biases the radius upward (a 1.0 px tau
    # on a ~10 px trunk inflates the recovered radius ~20%).
    soft_tau: float = 0.3
    max_iterations: int = 50
    function_tolerance: float = 1e-10
    gradient_tolerance: float = 1e-14
    parameter_tolerance: float = 1e-12
    initial_trust_radius: float = 1e2
    # SPMD (set by parallel/gsba_spmd.py, not by callers): images —
    # poses, semantic masks, and the image x cylinder rasterization —
    # are sharded over this mesh axis; cylinders are replicated. Per LM
    # iteration the collectives are one psum of the [dim, dim] normal
    # equations (dim = 6N + kdim*K, a few hundred) + scalar costs.
    # spmd_num_images is the STATIC global image count (local shards
    # only know their slice length).
    axis_name: Optional[str] = None
    spmd_num_images: int = 0
    # STATIC global landmark-observation count under SPMD (the weight
    # normalization landmark_error_weight / total_num_2d_features,
    # ref .cc:729-794, must divide by the GLOBAL O while each shard
    # holds only its images' observations).
    spmd_num_obs: int = 0


class GSBASummary(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    cost_trace: jnp.ndarray
    per_image_iou: jnp.ndarray   # [N, K] hard IoU at solution (parity with
                                 # ref .cc:1089-1123 per-image IoU table)
    mean_iou: jnp.ndarray


def _cyl_residuals(qvecs, tvecs, cyl_q, cyl_t, cyl_r, cyl_h, problem, opt, hard):
    """[N, K] silhouette residuals 1 - IoU (and the IoU matrix)."""
    N = qvecs.shape[0]
    K = cyl_q.shape[0]
    Hm, Wm = problem.sem_masks.shape[-2:]

    # Broadcast to [N, K, ...]: camera n against cylinder k.
    cq = jnp.broadcast_to(qvecs[:, None, :], (N, K, 4))
    ct = jnp.broadcast_to(tvecs[:, None, :], (N, K, 3))
    cp = jnp.broadcast_to(problem.cam_params[:, None, :], (N, K, 3))
    kq = jnp.broadcast_to(cyl_q[None, :, :], (N, K, 4))
    kt = jnp.broadcast_to(cyl_t[None, :, :], (N, K, 3))
    kr = jnp.broadcast_to(cyl_r[None, :], (N, K))
    kh = jnp.broadcast_to(cyl_h[None, :], (N, K))

    quad, valid = project_quadrilateral(kq, kt, kr, kh, cq, ct, cp)  # [N,K,4,2]
    mask = quadrilateral_mask(quad, Hm, Wm, soft_tau=opt.soft_tau, hard=hard)
    iou = semantic_iou(mask, problem.sem_masks[:, None, :, :])  # [N, K]
    # Invalid projection -> IoU 0 (ref Cylinder::ComputeSemanticIoU catch ->
    # return 0, ref cylinder.h:506-510).
    iou = jnp.where(valid, iou, 0.0)
    return 1.0 - iou, iou


def _two_points_to_cylinder(t1, t2, log_r):
    """Differentiable CylinderBy2Points -> (qvec, tvec, r, h)
    (ref: cylinder_by_2_points.h:84-108 ToCylinder)."""
    d = t2 - t1
    h2 = jnp.sum(d * d, axis=-1)
    h = jnp.sqrt(jnp.maximum(h2, 1e-24))
    dn = d / h[..., None]
    z = jnp.zeros_like(dn).at[..., 2].set(1.0)
    # Shortest rotation z -> dn via the half-angle quaternion
    # q = normalize([1 + z.dn, z x dn]) — smooth everywhere except
    # dn = -z (unlike the reference's arccos form, whose gradient is
    # singular exactly at the common vertical-trunk case dn = +z;
    # ref cylinder_by_2_points.h:84-108).
    w = 1.0 + dn[..., 2:3]
    xyz = jnp.cross(z, dn)
    from sba_tpu.geometry.quaternions import quat_normalize

    q = quat_normalize(jnp.concatenate([w, xyz], axis=-1))
    # Antipodal guard: dn ~ -z -> 180deg about x.
    flip = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0, 0.0], q.dtype), q.shape)
    q = jnp.where(w < 1e-8, flip, q)
    return q, t1, jnp.exp(log_r), h


def _landmark_residuals(qvecs, tvecs, points, problem):
    """Standard SIMPLE_PINHOLE reprojection residuals [O, 2]
    (reused math of the BA engine; ref .cc:1391-1407 uses the standard
    BundleAdjustmentCostFunction)."""
    from sba_tpu.geometry.quaternions import quat_rotate

    q0 = qvecs[problem.obs_image]
    t0 = tvecs[problem.obs_image]
    x0 = points[problem.obs_point]
    k0 = problem.cam_params[problem.obs_image]
    p_cam = quat_rotate(q0, x0) + t0
    z = p_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    uv = p_cam[..., :2] / safe_z[..., None]
    proj = k0[..., 0:1] * uv + k0[..., 1:3]
    return (proj - problem.obs_xy) * problem.obs_mask[:, None]


def _retract_cyl(problem: GSBAProblem, opt: GSBAOptions, d_cyl):
    """Retract [K, kdim] cylinder deltas onto the stored cylinder state.
    Returns (cyl_state=(q,t,r,h), new_state=(q,t,log_r,log_h))."""
    if opt.cylinder_parametrization == "default":
        cq = quat_retract(problem.cyl_qvec, d_cyl[:, :3])
        ct = problem.cyl_tvec + d_cyl[:, 3:6]
        clr = problem.cyl_log_radius + d_cyl[:, 6]
        clh = problem.cyl_log_height + d_cyl[:, 7]
        return (cq, ct, jnp.exp(clr), jnp.exp(clh)), (cq, ct, clr, clh)
    # State interpreted through the 2-point form: base point = cyl_tvec,
    # top point = tvec + R (0,0,h).
    from sba_tpu.geometry.quaternions import quat_rotate

    h0 = jnp.exp(problem.cyl_log_height)
    top0 = problem.cyl_tvec + quat_rotate(
        problem.cyl_qvec, jnp.stack([jnp.zeros_like(h0), jnp.zeros_like(h0), h0], -1))
    t1 = problem.cyl_tvec + d_cyl[:, 0:3]
    t2 = top0 + d_cyl[:, 3:6]
    log_r = problem.cyl_log_radius + d_cyl[:, 6]
    cq, ct, r, h = _two_points_to_cylinder(t1, t2, log_r)
    return (cq, ct, r, h), (cq, ct, log_r, jnp.log(jnp.maximum(h, 1e-8)))


def _n_global(problem: GSBAProblem, opt: GSBAOptions) -> int:
    """Global image count: the delta/H layout is GLOBAL even when the
    local problem shard holds only a slice of the images."""
    return opt.spmd_num_images if opt.axis_name else problem.qvecs.shape[0]


def _img_gidx(problem: GSBAProblem, opt: GSBAOptions):
    """Global indices of this shard's images (contiguous slices)."""
    Nl = problem.qvecs.shape[0]
    if opt.axis_name is None:
        return jnp.arange(Nl)
    return jax.lax.axis_index(opt.axis_name) * Nl + jnp.arange(Nl)


def _geo_img_weight(problem: GSBAProblem, opt: GSBAOptions):
    """[Nl] per-image geometry weight (uniform 1/N unless overridden)."""
    if problem.img_weight is not None:
        return problem.img_weight
    Nl = problem.qvecs.shape[0]
    return jnp.full((Nl,), 1.0 / _n_global(problem, opt),
                    problem.tvecs.dtype)


def _apply_deltas(problem: GSBAProblem, opt: GSBAOptions, delta):
    """Unflatten + retract the LM step. Layout (GLOBAL under SPMD):
    [N*6 pose | K*8 cylinder (default) or K*7 (by_2_points) | P*3 points]."""
    N = _n_global(problem, opt)
    K = problem.cyl_qvec.shape[0]
    P = problem.points.shape[0]
    i = 0
    d_pose = delta[: N * 6].reshape(N, 6)
    if opt.axis_name is not None:
        d_pose = d_pose[_img_gidx(problem, opt)]
    i += N * 6
    kdim = 8 if opt.cylinder_parametrization == "default" else 7
    d_cyl = delta[i: i + K * kdim].reshape(K, kdim)
    i += K * kdim
    d_pts = delta[i: i + P * 3].reshape(P, 3)

    q = quat_retract(problem.qvecs, d_pose[:, :3])
    t = problem.tvecs + d_pose[:, 3:]
    cyl_state, new_cyl = _retract_cyl(problem, opt, d_cyl)
    pts = problem.points + d_pts
    return q, t, cyl_state, new_cyl, pts


def _free_vector(problem: GSBAProblem, opt: GSBAOptions):
    N = _n_global(problem, opt)
    K = problem.cyl_qvec.shape[0]
    P = problem.points.shape[0]
    dtype = problem.tvecs.dtype
    ext = 1.0 if opt.refine_extrinsics else 0.0
    free_local = jnp.concatenate([
        jnp.repeat(problem.free_rot[:, None] * ext, 3, axis=1),
        problem.free_trans * ext], axis=1)          # [Nl, 6]
    if opt.axis_name is None:
        free_pose = free_local.reshape(-1)
    else:
        scat = jnp.zeros((N, 6), free_local.dtype).at[
            _img_gidx(problem, opt)].set(free_local)
        free_pose = jax.lax.psum(scat, opt.axis_name).reshape(-1)
    kdim = 8 if opt.cylinder_parametrization == "default" else 7
    geo = 1.0 if opt.refine_geometry else 0.0
    free_cyl = jnp.full(K * kdim, geo, dtype)
    free_pts = (jnp.repeat(problem.free_points, 3)
                if opt.landmark_error_weight > 0 else jnp.zeros(P * 3, dtype))
    return jnp.concatenate([free_pose.astype(dtype), free_cyl, free_pts.astype(dtype)])


def _all_residuals(problem: GSBAProblem, opt: GSBAOptions, delta, hard=False):
    """Weighted, stacked residual vector at params (+) delta."""
    N = _n_global(problem, opt)
    q, t, (cq, ct, r, h), _, pts = _apply_deltas(problem, opt, delta)
    geo_r, _ = _cyl_residuals(q, t, cq, ct, r, h, problem, opt, hard)
    # ScaledLoss(1/num_images) on the geometry term (ref .cc:714-726):
    # implement as sqrt-weight on residuals under the robust loss.
    K = problem.cyl_qvec.shape[0]
    geo_w = jnp.repeat(_geo_img_weight(problem, opt), K)
    parts = [(geo_r.reshape(-1), geo_w)]
    if opt.landmark_error_weight > 0 and problem.obs_xy.shape[0] > 0:
        w = opt.landmark_error_weight / max(_n_obs_global(problem, opt), 1)
        rl = _landmark_residuals(q, t, pts, problem).reshape(-1)
        parts.append((rl, jnp.full(rl.shape, w, rl.dtype)))
    res = jnp.concatenate([p[0] for p in parts])
    wts = jnp.concatenate([jnp.broadcast_to(p[1], p[0].shape)
                           .astype(res.dtype) for p in parts])
    return res, wts


def _robust_cost(res, wts, opt):
    s = res * res
    c = 0.5 * jnp.sum(wts * loss_value(opt.loss, s, opt.loss_scale))
    if opt.axis_name is not None:
        c = jax.lax.psum(c, opt.axis_name)
    return c


def _geo_weighted_local(problem: GSBAProblem, opt: GSBAOptions, dlocal):
    """IRLS-weighted geometry residuals [N*K] where EVERY residual's own
    (pose, cylinder) block is perturbed by the SHARED local tangent
    ``dlocal`` [6 + kdim].

    Because residual (n, k) depends only on pose n and cylinder k, the
    jacfwd of this function w.r.t. ``dlocal`` yields each row's exact local
    Jacobian blocks with 6+kdim tangents total — instead of pushing all
    6N + kdim*K (+3P) global tangents through the rasterizer. This is what
    makes GSBA linearization O(1) in N (see BASELINE.md GSBA table)."""
    Nl = problem.qvecs.shape[0]
    K = problem.cyl_qvec.shape[0]
    kdim = 8 if opt.cylinder_parametrization == "default" else 7
    q = quat_retract(problem.qvecs, jnp.broadcast_to(dlocal[:3], (Nl, 3)))
    t = problem.tvecs + dlocal[3:6]
    (cq, ct, r, h), _ = _retract_cyl(
        problem, opt, jnp.broadcast_to(dlocal[6:], (K, kdim)))
    geo_r, _ = _cyl_residuals(q, t, cq, ct, r, h, problem, opt, hard=False)
    res = geo_r.reshape(-1)
    w = jnp.repeat(_geo_img_weight(problem, opt), K) \
        * loss_weight(opt.loss, res * res, opt.loss_scale)
    return res * jnp.sqrt(w)


def _n_obs_global(problem: GSBAProblem, opt: GSBAOptions) -> int:
    """Global landmark-observation count (each SPMD shard holds only
    its images' observations; padding rows carry obs_mask = 0)."""
    return (opt.spmd_num_obs if opt.axis_name
            else problem.obs_xy.shape[0])


def _land_weighted(problem: GSBAProblem, opt: GSBAOptions, delta):
    """IRLS-weighted landmark residuals [2*O] at params (+) delta."""
    q, t, _, _, pts = _apply_deltas(problem, opt, delta)
    res = _landmark_residuals(q, t, pts, problem).reshape(-1)
    w_scale = opt.landmark_error_weight / max(_n_obs_global(problem, opt), 1)
    w = w_scale * loss_weight(opt.loss, res * res, opt.loss_scale)
    return res * jnp.sqrt(w)


def _gsba_solve(problem: GSBAProblem, opt: GSBAOptions):
    free = _free_vector(problem, opt)
    dim = free.shape[0]
    dtype = problem.tvecs.dtype
    z = jnp.zeros(dim, dtype)

    def cost_at(delta):
        res, wts = _all_residuals(problem, opt, delta)
        return _robust_cost(res, wts, opt)

    cost0 = cost_at(z)

    def replace_state(state_delta):
        """Fold an accepted delta into a new problem pytree."""
        q, t, _, (cq, ct, clr, clh), pts = _apply_deltas(problem, opt, state_delta)
        return problem._replace(qvecs=q, tvecs=t, cyl_qvec=cq, cyl_tvec=ct,
                                cyl_log_radius=clr, cyl_log_height=clh, points=pts)

    # LM on the flat delta around the CURRENT state: we re-center each
    # accepted step by folding it into the problem arrays functionally.
    Nl = problem.qvecs.shape[0]
    N = _n_global(problem, opt)
    K = problem.cyl_qvec.shape[0]
    P = problem.points.shape[0]
    kdim = 8 if opt.cylinder_parametrization == "default" else 7
    use_landmarks = opt.landmark_error_weight > 0 and problem.obs_xy.shape[0] > 0

    def body(state):
        it, prob, lam, nu, cost, done, trace = state

        # Geometry rows: 6+kdim shared tangents give the exact per-row local
        # Jacobian blocks (block-sparsity of the (pose, cylinder) problem);
        # scatter them into the flat column layout with one-hot expansions.
        zl = jnp.zeros(6 + kdim, dtype)
        rg, Jl = _geo_weighted_local(prob, opt, zl), jax.jacfwd(
            functools.partial(_geo_weighted_local, prob, opt))(zl)
        Jl = Jl.reshape(Nl, K, 6 + kdim)
        # Row selector into the GLOBAL pose columns: under SPMD each
        # shard's rows scatter into its images' global column offsets.
        eyeN = jnp.eye(N, dtype=dtype)[_img_gidx(prob, opt)]  # [Nl, N]
        eyeK = jnp.eye(K, dtype=dtype)
        J_pose = jnp.einsum("nkp,nm->nkmp", Jl[..., :6],
                            eyeN).reshape(Nl * K, N * 6)
        J_cyl = jnp.einsum("nkc,kl->nklc", Jl[..., 6:],
                           eyeK).reshape(Nl * K, K * kdim)
        J = jnp.concatenate(
            [J_pose, J_cyl, jnp.zeros((Nl * K, P * 3), dtype)], axis=1)
        r = rg
        if use_landmarks:
            rl = _land_weighted(prob, opt, z)
            Jland = jax.jacfwd(functools.partial(_land_weighted, prob, opt))(z)
            r = jnp.concatenate([rg, rl])
            J = jnp.concatenate([J, Jland], axis=0)
        J = J * free[None, :]
        g = J.T @ r
        H = J.T @ J
        if opt.axis_name is not None:
            # ONE psum of the tiny global normal equations per iteration
            # (dim = 6N + kdim*K + 3P); the rasterization work stays local.
            g = jax.lax.psum(g, opt.axis_name)
            H = jax.lax.psum(H, opt.axis_name)
        # RELATIVE diagonal floor: near-unobservable directions (e.g. a
        # trunk's height when it extends past every frame) have ~zero
        # curvature AND ~zero gradient; an absolute floor lets the
        # damped solve take wild steps along them, and LM then rejects
        # every step (observed: 6+ consecutive rejections on the forest
        # scene). Flooring at 1e-6 of the largest curvature pins those
        # directions without touching observable ones.
        diag = jnp.diag(H)
        d = jnp.clip(diag, 1e-6 * jnp.max(diag) + 1e-30, 1e32)
        delta = -jax.scipy.linalg.solve(
            H + jnp.diag(lam * d + (1.0 - free)), g, assume_a="pos")
        delta = delta * free

        def cost_of(prob2):
            res, wts = _all_residuals(prob2, opt, z)
            return _robust_cost(res, wts, opt)

        q, t, _, (cq, ct, clr, clh), pts = _apply_deltas(prob, opt, delta)
        prob_try = prob._replace(qvecs=q, tvecs=t, cyl_qvec=cq, cyl_tvec=ct,
                                 cyl_log_radius=clr, cyl_log_height=clh, points=pts)
        new_cost = cost_of(prob_try)
        actual = cost - new_cost
        predicted = -(g @ delta + 0.5 * delta @ (H @ delta)
                      + 0.5 * jnp.sum(lam * d * delta * delta))
        accept = (actual > 0) & (predicted > 0)
        rho = actual / jnp.maximum(predicted, 1e-30)
        lam = jnp.where(accept,
                        jnp.maximum(lam * jnp.maximum(1.0 / 3.0, 1.0 - (2 * rho - 1.0) ** 3), 1e-14),
                        jnp.minimum(lam * nu, 1e12))
        nu = jnp.where(accept, 2.0, nu * 2.0)
        prob = jax.tree.map(lambda a, b: jnp.where(accept, b, a), prob, prob_try)
        cost_new = jnp.where(accept, new_cost, cost)
        done = ((accept & (jnp.abs(actual) < opt.function_tolerance * jnp.maximum(cost, 1e-30)))
                | (jnp.max(jnp.abs(g)) < opt.gradient_tolerance)
                | (lam >= 1e12))
        trace = trace.at[it + 1].set(cost_new)
        return it + 1, prob, lam, nu, cost_new, done, trace

    def cond(state):
        it, prob, lam, nu, cost, done, trace = state
        return (it < opt.max_iterations) & (~done)

    trace0 = jnp.full((opt.max_iterations + 1,), jnp.nan, dtype).at[0].set(cost0)
    init = (0, problem, jnp.asarray(1.0 / opt.initial_trust_radius, dtype),
            jnp.asarray(2.0, dtype), cost0, jnp.asarray(False), trace0)
    it, prob, lam, nu, cost, done, trace = jax.lax.while_loop(cond, body, init)

    # Hard IoU report at the solution (parity with ref .cc:1089-1123).
    _, iou = _cyl_residuals(prob.qvecs, prob.tvecs, prob.cyl_qvec, prob.cyl_tvec,
                            jnp.exp(prob.cyl_log_radius), jnp.exp(prob.cyl_log_height),
                            prob, opt, hard=True)
    m = (_geo_img_weight(prob, opt) > 0).astype(iou.dtype)
    num = jnp.sum(iou * m[:, None])
    den = jnp.sum(m) * K
    if opt.axis_name is not None:
        num = jax.lax.psum(num, opt.axis_name)
        den = jax.lax.psum(den, opt.axis_name)
    mean_iou = num / jnp.maximum(den, 1.0)
    summary = GSBASummary(
        initial_cost=cost0, final_cost=cost, num_iterations=it,
        cost_trace=trace, per_image_iou=iou, mean_iou=mean_iou)
    return prob, summary


_gsba_impl = functools.partial(jax.jit, static_argnames=("opt",))(_gsba_solve)


def geometric_semantic_bundle_adjust(problem: GSBAProblem,
                                     options: Optional[GSBAOptions] = None):
    return _gsba_impl(problem, options or GSBAOptions())


def evaluate_iou(problem: GSBAProblem, options: Optional[GSBAOptions] = None):
    """Hard per-image x cylinder IoU matrix [N, K] (reference parity)."""
    opt = options or GSBAOptions()
    _, iou = _cyl_residuals(problem.qvecs, problem.tvecs, problem.cyl_qvec,
                            problem.cyl_tvec, jnp.exp(problem.cyl_log_radius),
                            jnp.exp(problem.cyl_log_height), problem, opt, hard=True)
    return iou


def build_gsba_problem(qvecs, tvecs, cam_params, semantic_maps, cylinders,
                       options: Optional[GSBAOptions] = None,
                       points=None, obs=None, dtype=jnp.float64) -> GSBAProblem:
    """Assemble from pose arrays, raw semantic maps (thresholded into boolean
    trunk masks as ref .cc:1328-1333), and host `Cylinder` objects.

    Gauge fixing per the GSBA controller: first pose constant + tvec x of
    the second image constant (ref: controllers/geometric_semantic_bundle_adjustment.cc:109-110).
    """
    opt = options or GSBAOptions()
    qvecs = np.asarray(qvecs)
    N = qvecs.shape[0]
    sem = np.asarray(semantic_maps)
    masks = (sem == opt.trunk_semantic_class).astype(np.float64)

    cq = np.stack([c.qvec for c in cylinders])
    ct = np.stack([c.tvec for c in cylinders])
    cr = np.log([c.radius for c in cylinders])
    ch = np.log([c.height for c in cylinders])

    free_rot = np.ones(N)
    free_trans = np.ones((N, 3))
    free_rot[0] = 0.0
    free_trans[0] = 0.0
    if N > 1:
        free_trans[1, 0] = 0.0

    if points is None:
        points = np.zeros((1, 3))
        obs_image = np.zeros(0, np.int32)
        obs_point = np.zeros(0, np.int32)
        obs_xy = np.zeros((0, 2))
    else:
        obs_image, obs_point, obs_xy = obs

    return GSBAProblem(
        qvecs=jnp.asarray(qvecs, dtype), tvecs=jnp.asarray(tvecs, dtype),
        cam_params=jnp.asarray(cam_params, dtype),
        sem_masks=jnp.asarray(masks, dtype),
        cyl_qvec=jnp.asarray(cq, dtype), cyl_tvec=jnp.asarray(ct, dtype),
        cyl_log_radius=jnp.asarray(cr, dtype), cyl_log_height=jnp.asarray(ch, dtype),
        free_rot=jnp.asarray(free_rot, dtype), free_trans=jnp.asarray(free_trans, dtype),
        points=jnp.asarray(points, dtype),
        obs_image=jnp.asarray(obs_image, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_xy=jnp.asarray(obs_xy, dtype),
        obs_mask=jnp.ones(len(obs_image), dtype),
        free_points=jnp.ones(len(points), dtype),
    )
