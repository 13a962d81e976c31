"""Bundle adjustment: batched Gauss-Newton/LM with an implicit-Schur PCG solver.

This is the TPU-native replacement for the reference's Ceres-based
`BundleAdjuster` (ref: src/optim/bundle_adjustment.{h,cc}:258-596) and the
vendored PBA engine (ref: lib/PBA). Design:

- The problem is a struct-of-arrays pytree: poses ``[N,4]+[N,3]``, points
  ``[P,3]``, padded camera intrinsics ``[C,12]``, observations as a COO
  table. One `bundle_adjust` call jit-compiles the ENTIRE solve: LM outer
  loop (`lax.while_loop`), per-iteration batched linearization, and the
  linear solver.
- Per-observation Jacobian blocks come from `jax.jacfwd` of the local
  (retracted) residual — exact derivatives replacing Ceres autodiff Jets.
  Rotations use a right-multiplicative so(3) retraction (the manifold
  equivalent of Ceres's quaternion manifold,
  ref: src/optim/semantic_bundle_adjustment.cc:670-693).
- The linear solver mirrors Ceres's ITERATIVE_SCHUR + SCHUR_JACOBI
  (auto-selected by the reference at
  src/optim/bundle_adjustment.cc / semantic_bundle_adjustment.cc:489-500):
  point (landmark) blocks are eliminated in closed form (batched 3x3
  inverses) and the reduced camera system is solved by PCG where every
  matvec is a gather + small batched matmul + segment_sum — no sparse
  matrix is ever materialized. A DENSE_SCHUR-equivalent materializes the
  reduced system via vmapped matvecs for small problems.
- Gauge fixing / constant blocks are mask multipliers on the Jacobian
  columns (the `SetConstantPose` / `SetConstantTvec` subset-manifold
  semantics of ref: src/optim/semantic_bundle_adjustment.cc:173-207).
- Robust losses are IRLS re-weightings (optim/losses.py).

The same kernels shard over a device mesh in parallel/distributed_ba.py:
observations are partitioned, and every segment_sum above gains a psum.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry import camera_models
from sba_tpu.geometry.quaternions import quat_retract
from sba_tpu.optim.losses import loss_value, loss_weight

MAXP = camera_models.MAX_NUM_PARAMS  # 12


class BAProblem(NamedTuple):
    """Dense BA state + structure (a pytree; all arrays device-ready).

    Free/fixed parametrization: multiplier masks with 1.0 = free,
    0.0 = constant. `free_trans` is per-component to support the
    reference's SetConstantTvec gauge trick (fix one tvec component of the
    second image; ref: src/controllers/semantic_bundle_adjustment.cc:106-109).
    """

    qvecs: jnp.ndarray        # [N, 4]
    tvecs: jnp.ndarray        # [N, 3]
    points: jnp.ndarray       # [P, 3]
    cam_params: jnp.ndarray   # [C, 12] zero-padded
    obs_image: jnp.ndarray    # [O] int32
    obs_point: jnp.ndarray    # [O] int32
    obs_cam: jnp.ndarray      # [O] int32
    obs_xy: jnp.ndarray       # [O, 2]
    obs_mask: jnp.ndarray     # [O] float (0/1; padding + invalid)
    free_rot: jnp.ndarray     # [N]
    free_trans: jnp.ndarray   # [N, 3]
    free_points: jnp.ndarray  # [P]
    free_cam: jnp.ndarray     # [C, 12]
    # Optional scatter-free reduction layouts (PBA-style dual ordering,
    # ref: lib/PBA camera-major/point-major data). When present, per-point
    # and per-image segment sums become gather + reshape + sum — TPU
    # scatters are the slowest primitive, gathers ride HBM bandwidth.
    # Built by `attach_gather_layouts`; None falls back to segment_sum.
    pt_gather: Optional[jnp.ndarray] = None   # [P, K] obs indices
    pt_mask: Optional[jnp.ndarray] = None     # [P, K] 0/1
    img_gather: Optional[jnp.ndarray] = None  # [N, M] obs indices
    img_mask: Optional[jnp.ndarray] = None    # [N, M] 0/1
    image_cam: Optional[jnp.ndarray] = None   # [N] camera row per image


def attach_gather_layouts(problem: "BAProblem") -> "BAProblem":
    """Precompute the scatter-free reduction layouts (host-side).

    Pads each point's observation list to the max track length K and each
    image's to the max per-image count M. Gather index 0 with mask 0 fills
    the padding (any valid index works — the mask zeroes it).
    """
    op = np.asarray(problem.obs_point)
    oi = np.asarray(problem.obs_image)
    oc = np.asarray(problem.obs_cam)
    P = problem.points.shape[0]
    N = problem.qvecs.shape[0]

    def layout(idx, n):
        order = np.argsort(idx, kind="stable")
        counts = np.bincount(idx, minlength=n) if len(idx) else \
            np.zeros(n, int)
        k = max(int(counts.max()), 1) if len(idx) else 1
        gather = np.zeros((n, k), np.int32)
        mask = np.zeros((n, k), np.float32)
        if len(idx):
            offs = np.concatenate([[0], np.cumsum(counts)])
            sorted_idx = idx[order]
            slot = np.arange(len(order)) - offs[sorted_idx]
            gather[sorted_idx, slot] = order
            mask[sorted_idx, slot] = 1.0
        return gather, mask

    pt_gather, pt_mask = layout(op, P)
    img_gather, img_mask = layout(oi, N)
    image_cam = np.zeros(N, np.int32)
    image_cam[oi] = oc
    dtype = problem.obs_mask.dtype
    # Host (numpy) outputs: layouts are prep-side data; jit transfers
    # them H2D on first use. Keeping them off the chip lets host-leaf
    # problems (utils/host.py) stay free of device round-trips.
    return problem._replace(
        pt_gather=pt_gather,
        pt_mask=pt_mask.astype(dtype),
        img_gather=img_gather,
        img_mask=img_mask.astype(dtype),
        image_cam=image_cam)


def to_point_major(problem: "BAProblem") -> "BAProblem":
    """Reorder + pad the observation table to POINT-MAJOR layout:
    O' = P * K rows (K = max track length), point p owning rows
    [p*K, (p+1)*K), padding rows carrying obs_mask 0.

    TPU rationale (measured): row-gathers with tiny slices (9-36 floats)
    run ~1000x below HBM speed on this hardware — the (8, 128) tile
    granularity turns them into strided scalar traffic. In point-major
    order the per-point reduction is a RESHAPE + sum (free), and the
    per-image reduction becomes a one-hot matmul on the MXU (_red_imgs).
    Padding inflates O by (max/mean track length); acceptable for SfM
    track distributions (bucketing is the escape hatch if not).
    """
    op = np.asarray(problem.obs_point)
    om = np.asarray(problem.obs_mask)
    P = problem.points.shape[0]
    # MASKED observations are dropped before the layout: they carry no
    # residual, and counting them once inflated K catastrophically —
    # pad_problem_pow2 used to stack every padding row on point 0, so a
    # 16k-obs local-BA problem became a 6M-row point-major program
    # (~400x; the observed 13-39 s per mapper local-BA call on CPU).
    keep = np.nonzero(om > 0)[0]
    op = op[keep]
    O = len(op)
    counts = np.bincount(op, minlength=P) if O else np.zeros(P, int)
    kmax = max(int(counts.max()), 1) if O else 1
    # Round K up to a power of two: K is data-dependent (max track
    # length), and the mapper's repeated solves should reuse compiled
    # programs as tracks grow.
    K = 1 << int(np.ceil(np.log2(kmax)))
    order = np.argsort(op, kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(O) - offs[op[order]]
    rows = op[order] * K + slot                    # destination rows

    def place(v, fill=0):
        v = np.asarray(v)[keep]
        out = np.full((P * K,) + v.shape[1:], fill, v.dtype)
        out[rows] = v[order]
        return out

    # Host (numpy) outputs — see attach_gather_layouts.
    new = problem._replace(
        obs_image=place(problem.obs_image),
        obs_point=np.repeat(np.arange(P, dtype=np.int32), K),
        obs_cam=place(problem.obs_cam),
        obs_xy=place(problem.obs_xy),
        obs_mask=place(problem.obs_mask),
        pt_gather=None, pt_mask=None, img_gather=None, img_mask=None,
        image_cam=problem.image_cam if problem.image_cam is not None
        else _image_cam_of(problem))
    return new


def pad_problem_pow2(problem: "BAProblem", min_images: int = 8,
                     min_points: int = 64, min_obs: int = 256
                     ) -> "BAProblem":
    """Pad images/points/observations to power-of-two buckets so the
    incremental mapper's growing problems reuse a handful of compiled
    programs instead of one per registration step (XLA static shapes).
    Padding rows are fully masked (obs_mask 0, free_* 0, identity poses)."""

    def pow2(n, lo):
        return 1 << int(np.ceil(np.log2(max(n, lo))))

    N = problem.qvecs.shape[0]
    P = problem.points.shape[0]
    O = problem.obs_image.shape[0]
    Np, Pp, Op = pow2(N, min_images), pow2(P, min_points), pow2(O, min_obs)
    if (Np, Pp, Op) == (N, P, O):
        return problem
    dtype = problem.tvecs.dtype

    # Host-side padding (numpy): this runs per mapper registration step;
    # device round-trips here would poison every later sync in the
    # process (utils/host.py) and re-upload per call.
    def padv(a, n, fill=0.0):
        a = np.asarray(a)
        if a.shape[0] == n:
            return a
        pad_shape = (n - a.shape[0],) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    qpad = np.tile(np.asarray([1.0, 0, 0, 0], dtype), (Np - N, 1))
    # Padding observations spread round-robin over all padded points
    # (NOT stacked on index 0 — see to_point_major: the point-major
    # layout sizes itself by the max per-point count, and a point-0
    # pile-up inflated it ~400x). All padding rows carry obs_mask 0.
    pad_op = (np.arange(Op - O) % Pp).astype(
        np.asarray(problem.obs_point).dtype) if Op > O else None
    problem = problem._replace(
        qvecs=np.concatenate([np.asarray(problem.qvecs), qpad]),
        tvecs=padv(problem.tvecs, Np),
        points=padv(problem.points, Pp),
        obs_image=padv(problem.obs_image, Op),
        obs_point=(np.concatenate([np.asarray(problem.obs_point), pad_op])
                   if pad_op is not None
                   else np.asarray(problem.obs_point)),
        obs_cam=padv(problem.obs_cam, Op),
        obs_xy=padv(problem.obs_xy, Op),
        obs_mask=padv(problem.obs_mask, Op),
        free_rot=padv(problem.free_rot, Np),
        free_trans=padv(problem.free_trans, Np),
        free_points=padv(problem.free_points, Pp),
        pt_gather=None, pt_mask=None, img_gather=None, img_mask=None,
        image_cam=None)
    return attach_gather_layouts(problem)


def _image_cam_of(problem) -> np.ndarray:
    oi = np.asarray(problem.obs_image)
    oc = np.asarray(problem.obs_cam)
    image_cam = np.zeros(problem.qvecs.shape[0], np.int32)
    image_cam[oi] = oc
    return image_cam


def _expand_mask(mask, v):
    return mask.reshape(mask.shape + (1,) * (v.ndim - mask.ndim))


def _img_onehot(problem: "BAProblem"):
    """[O, N] image indicator (bf16-friendly f32; padding rows carry the
    linearized zeros so no separate mask is needed)."""
    N = problem.qvecs.shape[0]
    return (problem.obs_image[:, None] ==
            jnp.arange(N, dtype=problem.obs_image.dtype)[None, :]
            ).astype(problem.obs_xy.dtype)


def _red_pts(problem: "BAProblem", v, axis_name=None, layout="coo"):
    """Per-observation [O, ...] -> per-point [P, ...] reduction."""
    P = problem.points.shape[0]
    if layout == "point_major" and axis_name is None:
        K = v.shape[0] // P
        return jnp.sum(v.reshape((P, K) + v.shape[1:]), axis=1)
    if problem.pt_gather is not None and axis_name is None:
        g = v[problem.pt_gather]          # [P, K, ...]
        return jnp.sum(g * _expand_mask(problem.pt_mask, g), axis=1)
    return _segsum(v, problem.obs_point, P, axis_name)


def _red_imgs(problem: "BAProblem", v, axis_name=None, layout="coo"):
    """Per-observation [O, ...] -> per-image [N, ...] reduction."""
    if layout == "point_major" and axis_name is None:
        onehot = _img_onehot(problem)     # [O, N]
        flat = v.reshape(v.shape[0], -1)
        out = jnp.einsum("on,od->nd", onehot, flat,
                         preferred_element_type=flat.dtype)
        return out.reshape((out.shape[0],) + v.shape[1:])
    if problem.img_gather is not None and axis_name is None:
        g = v[problem.img_gather]         # [N, M, ...]
        return jnp.sum(g * _expand_mask(problem.img_mask, g), axis=1)
    return _segsum(v, problem.obs_image, problem.qvecs.shape[0], axis_name)


def _red_cams(problem: "BAProblem", v, axis_name=None, layout="coo"):
    """Per-observation [O, ...] -> per-camera [C, ...] reduction. Each
    image maps to one camera, so reduce per image first, then a tiny
    [N]->[C] segment sum."""
    C = problem.cam_params.shape[0]
    if axis_name is None and (layout == "point_major"
                              or problem.img_gather is not None):
        per_img = _red_imgs(problem, v, None, layout)
        return jax.ops.segment_sum(per_img, problem.image_cam,
                                   num_segments=C)
    return _segsum(v, problem.obs_cam, C, axis_name)


@dataclass(frozen=True)
class BAOptions:
    """Static solve configuration (hashable -> usable as jit static arg).

    Mirrors `BundleAdjustmentOptions` (ref: src/optim/bundle_adjustment.h:68-160).
    """

    model_id: int = 0
    loss: str = "trivial"              # trivial | huber | soft_l1 | cauchy
    loss_scale: float = 1.0
    max_iterations: int = 50
    cg_iterations: int = 100
    # Inexact-Newton forcing: the trust region accepts/rejects every LM
    # step against the TRUE cost, so the inner CG only needs a descent-
    # quality step, not a machine-precision solve. 1e-2 relative residual
    # measured +31% LM throughput at 1024 images with identical
    # 20-iteration final cost vs 1e-6 (v5e; parity tests pin 1e-9).
    cg_tolerance: float = 1e-2
    # Warm-start the reduced-system PCG from the previous LM iteration's
    # camera step (optimally rescaled against the new damped system, so
    # it can never regress past a cold start). Costs one extra matvec
    # per LM iteration (r0 = b - S x0). Measured v5e 2026-08-21: a WIN
    # only under tight CG tolerances where the solve runs many rounds
    # (dense 128-img at 1e-6: 419 -> 445 it/s), a LOSS at the default
    # 1e-2 inexact-Newton forcing where CG is already short and the
    # seed matvec is pure overhead (dense 128-img: 506 -> 463; implicit
    # 1024-img: 143 -> 94, each seed matvec being a full HBM stream of
    # the stored couplings). Default off to match the default forcing;
    # turn on for machine-precision solves (parity contexts pin 1e-9).
    cg_warm_start: bool = False
    function_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-12
    parameter_tolerance: float = 1e-10
    initial_trust_radius: float = 1e4   # lambda0 = 1/radius
    solver: str = "auto"               # auto | dense_schur | schur_pcg
    #                                    | explicit_schur
    obs_layout: str = "coo"            # "coo" | "point_major" (see
    #                                    to_point_major; static)
    dense_threshold: int = 512         # max reduced dim for dense schur
    refine_focal_length: bool = True
    refine_principal_point: bool = False
    refine_extra_params: bool = True
    refine_extrinsics: bool = True
    dtype: str = "float64"
    # Fused path: compute the Schur-correction EL EL^T products in
    # bfloat16 with f32 accumulation (the TPU MXU's native contract).
    # S_corr is a damped correction term — bf16 products cost ~3 decimal
    # digits there while the gradient/RHS stay f32, so LM trajectories
    # match to ~1e-3 and converge to the same optimum (guarded by
    # tests/test_ba_fused.py::test_fused_converges_bf16).
    schur_bf16: bool = True
    # Implicit (large-N) path: store the PCG matvec's whitened couplings
    # in bf16 — the matvec is HBM-bound on exactly this read (~60 CG
    # streams per LM iteration), and bf16 EL keeps the operator exactly
    # SPD (same rounded EL on both sides of EL ELᵀ): inexact Newton with
    # an f32 trial-cost gate. Applied only in the ranged regime
    # (Npad >= 2048) where it measures faster; see ops/ba_kernels.py
    # fused_reduce for the v5e numbers.
    matvec_bf16: bool = True
    # SPMD: when set, the solve runs inside shard_map with observations
    # sharded over this mesh axis; every reduction gains a psum over it
    # (parallel/distributed_ba.py). None = single device.
    axis_name: str | None = None
    # Fused reduced-system solve: "dense" materializes S [Dk,Dk] in VMEM
    # (fastest, <=256 images), "implicit" runs PCG with a fused matvec
    # kernel over the stored per-obs blocks (no S; scales to ~1024
    # images single-chip), "auto" switches on image count.
    fused_mode: str = "auto"
    # Ranged kernels: replace the [Npad, B] one-hot image contraction
    # with per-point-block loops over the [lo, hi) image-sub-block
    # range each block touches (ops/ba_kernels.py). "auto" switches on
    # at Npad >= RANGED_MIN_NPAD; "on"/"off" force (tests force "on"
    # at small N for parity coverage).
    fused_ranged: str = "auto"


class BASummary(NamedTuple):
    """Solve report (parity with the reference's custom Ceres summary print,
    ref: src/optim/semantic_bundle_adjustment.cc:546-598)."""

    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    num_residuals: jnp.ndarray
    gradient_norm: jnp.ndarray
    cost_trace: jnp.ndarray  # [max_iterations + 1]


# ---------------------------------------------------------------------------
# Residual + Jacobian blocks
# ---------------------------------------------------------------------------

def _local_residual(dq, dt, dx, dk, q0, t0, x0, k0, xy, model_id):
    """Residual of one observation as a function of local deltas.

    Evaluated at delta = 0 its jacfwd gives the exact Gauss-Newton blocks.
    Math parity with `BundleAdjustmentCostFunction::operator()`
    (ref: src/base/cost_functions.h:57-81).
    """
    q = quat_retract(q0, dq)
    t = t0 + dt
    x = x0 + dx
    k = k0 + dk
    spec = camera_models.model_by_id(model_id)
    from sba_tpu.geometry.quaternions import quat_rotate

    p_cam = quat_rotate(q, x) + t
    z = p_cam[2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    uv = p_cam[:2] / safe_z
    proj = spec.world_to_image(k[: spec.num_params], uv)
    return proj - xy


def _linearize(problem: BAProblem, opt: BAOptions):
    """Batched residuals + per-observation Jacobian blocks.

    Returns r [O,2], (Jq, Jt, Jx, Jk) with shapes [O,2,3/3/3/12], already
    multiplied by the free-parameter masks and sqrt IRLS weights.

    jacfwd of the full local residual (21 tangents). Measured FASTER on
    TPU than the closed-form chain rule below (19 vs 39 ms at bench
    scale): XLA fuses all tangents into one elementwise pass, while the
    chain rule materializes [O,3,3]/[O,2,3] intermediates whose 3-wide
    trailing dims pad to 128 lanes. The layout problem is solved for
    real by the fused Pallas path (ops/ba_kernels.py), not by algebra.
    """
    q0 = problem.qvecs[problem.obs_image]
    t0 = problem.tvecs[problem.obs_image]
    x0 = problem.points[problem.obs_point]
    k0 = problem.cam_params[problem.obs_cam]
    xy = problem.obs_xy

    zeros3 = jnp.zeros_like(t0)
    zerosk = jnp.zeros_like(k0)

    def per_obs(q, t, x, k, z):
        f = functools.partial(_local_residual, model_id=opt.model_id)
        r = f(z[0], z[1], z[2], z[3], q, t, x, k, xy=z[4])
        jq, jt, jx, jk = jax.jacfwd(f, argnums=(0, 1, 2, 3))(
            z[0], z[1], z[2], z[3], q, t, x, k, xy=z[4])
        return r, jq, jt, jx, jk

    r, Jq, Jt, Jx, Jk = jax.vmap(per_obs)(
        q0, t0, x0, k0, (zeros3, zeros3, zeros3, zerosk, xy))
    return _apply_linearize_masks(problem, opt, r, Jq, Jt, Jx, Jk)


def _linearize_chain(problem: BAProblem, opt: BAOptions):
    """Closed-form chain-rule linearization (the math template for the
    Pallas fused kernel): with p_cam = R(q ∘ exp(δ)) x + t and
    A = ∂proj/∂p_cam, Jt = A, Jx = A R, Jq = -Jx [x]ₓ
    (right-multiplicative so(3) retraction); only the camera head
    (distort + focal) goes through jacfwd (2 + num_params tangents).
    Exact parity with `_linearize` (tests/test_ba.py). NOT the default:
    at the XLA level the [O,3,3] intermediates lose to fusion (see
    `_linearize` docstring) — this formulation wins only inside a
    Pallas kernel where the layout is [d, O-lanes]."""
    from sba_tpu.geometry.quaternions import quat_to_rotmat

    spec = camera_models.model_by_id(opt.model_id)
    nparams = spec.num_params
    q0 = problem.qvecs[problem.obs_image]
    t0 = problem.tvecs[problem.obs_image]
    x0 = problem.points[problem.obs_point]
    k0 = problem.cam_params[problem.obs_cam][:, :nparams]
    xy = problem.obs_xy
    dtype = xy.dtype

    R = quat_to_rotmat(q0)                                 # [O, 3, 3]
    p_cam = jnp.einsum("oij,oj->oi", R, x0) + t0
    z = p_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    iz = 1.0 / safe_z
    uv = p_cam[:, :2] * iz[:, None]

    def head(duv, dk, uv_, k_, xy_):
        return spec.world_to_image(k_ + dk, uv_ + duv) - xy_

    def per_obs(uv_, k_, xy_):
        f = functools.partial(head, uv_=uv_, k_=k_, xy_=xy_)
        zero2 = jnp.zeros(2, dtype)
        zerok = jnp.zeros(nparams, dtype)
        r = f(zero2, zerok)
        a2, jk = jax.jacfwd(f, argnums=(0, 1))(zero2, zerok)
        return r, a2, jk

    r, A2, Jkp = jax.vmap(per_obs)(uv, k0, xy)  # [O,2], [O,2,2], [O,2,np]

    # ∂uv/∂p_cam rows: [1/z, 0, -u/z], [0, 1/z, -v/z].
    zero = jnp.zeros_like(iz)
    duv_dp = jnp.stack([
        jnp.stack([iz, zero, -uv[:, 0] * iz], -1),
        jnp.stack([zero, iz, -uv[:, 1] * iz], -1)], -2)    # [O, 2, 3]
    A = jnp.einsum("okl,olj->okj", A2, duv_dp)             # [O, 2, 3]
    Jt = A
    Jx = jnp.einsum("okl,olj->okj", A, R)
    Jq = jnp.cross(x0[:, None, :], Jx)                     # = -Jx [x]ₓ
    Jk = jnp.concatenate(
        [Jkp, jnp.zeros((Jkp.shape[0], 2, MAXP - nparams), dtype)], -1) \
        if nparams < MAXP else Jkp
    return _apply_linearize_masks(problem, opt, r, Jq, Jt, Jx, Jk)


def _apply_linearize_masks(problem, opt, r, Jq, Jt, Jx, Jk):
    # Robust IRLS weights on the squared norm.
    s = jnp.sum(r * r, axis=-1)
    w = problem.obs_mask * loss_weight(opt.loss, s, opt.loss_scale)
    sw = jnp.sqrt(w)[:, None]

    r = r * sw
    sww = sw[..., None]
    # Constant-block masks -> zero Jacobian columns.
    rot_mask = (problem.free_rot[problem.obs_image]
                * (1.0 if opt.refine_extrinsics else 0.0))[:, None, None]
    trans_mask = (problem.free_trans[problem.obs_image]
                  * (1.0 if opt.refine_extrinsics else 0.0))[:, None, :]
    cam_mask = (problem.free_cam * _intrinsic_refine_mask(opt))[problem.obs_cam][:, None, :]
    Jq = Jq * sww * rot_mask
    Jt = Jt * sww * trans_mask
    Jx = Jx * sww * problem.free_points[problem.obs_point][:, None, None]
    Jk = Jk * sww * cam_mask
    return r, Jq, Jt, Jx, Jk


def _intrinsic_refine_mask(opt: BAOptions) -> np.ndarray:
    """[12] multiplier from refine_{focal,principal,extra} flags
    (ref: bundle_adjustment.cc parameterization of camera params)."""
    spec = camera_models.model_by_id(opt.model_id)
    m = np.zeros(MAXP)
    if opt.refine_focal_length:
        for i in spec.focal_idxs:
            m[i] = 1.0
    if opt.refine_principal_point:
        for i in spec.principal_idxs:
            m[i] = 1.0
    if opt.refine_extra_params:
        for i in spec.extra_idxs:
            m[i] = 1.0
    return m


def _segsum(x, idx, n, axis_name=None):
    out = jax.ops.segment_sum(x, idx, num_segments=n)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def _allreduce(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _sym3_inverse(A, eps=1e-12):
    """Batched closed-form inverse of symmetric 3x3 blocks [P,3,3]."""
    a, b, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    d, e, f = A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    inv = jnp.stack([
        jnp.stack([co00, co01, co02], -1),
        jnp.stack([co01, co11, co12], -1),
        jnp.stack([co02, co12, co22], -1),
    ], -2)
    return inv * inv_det[:, None, None]


# ---------------------------------------------------------------------------
# Cost
# ---------------------------------------------------------------------------

def _residuals_only(qvecs, tvecs, points, cam_params, problem: BAProblem, opt: BAOptions):
    from sba_tpu.geometry.quaternions import quat_rotate

    q0 = qvecs[problem.obs_image]
    t0 = tvecs[problem.obs_image]
    x0 = points[problem.obs_point]
    k0 = cam_params[problem.obs_cam]
    spec = camera_models.model_by_id(opt.model_id)
    p_cam = quat_rotate(q0, x0) + t0
    z = p_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    uv = p_cam[..., :2] / safe_z[..., None]
    proj = spec.world_to_image(k0[..., : spec.num_params], uv)
    return proj - problem.obs_xy


def _cost(qvecs, tvecs, points, cam_params, problem: BAProblem, opt: BAOptions):
    r = _residuals_only(qvecs, tvecs, points, cam_params, problem, opt)
    s = jnp.sum(r * r, axis=-1)
    c = 0.5 * jnp.sum(problem.obs_mask * loss_value(opt.loss, s, opt.loss_scale))
    return _allreduce(c, opt.axis_name)


def evaluate_cost(problem: BAProblem, options: BAOptions):
    return _cost(problem.qvecs, problem.tvecs, problem.points,
                 problem.cam_params, problem, options)


# ---------------------------------------------------------------------------
# The LM solve
# ---------------------------------------------------------------------------

def _make_operators(problem, r, Jq, Jt, Jx, Jk, lam, axis_name=None, layout="coo"):
    """Build the implicit Schur operators for one linearization.

    Reduced unknowns u = (pose [N,6], cam [C,12]); eliminated unknowns are
    the points [P,3].
    """
    N = problem.qvecs.shape[0]
    P = problem.points.shape[0]
    C = problem.cam_params.shape[0]
    oi, op, oc = problem.obs_image, problem.obs_point, problem.obs_cam

    Jc = jnp.concatenate([Jq, Jt], axis=-1)  # [O, 2, 6]

    # Gradients g = J^T r.
    g_pose = _red_imgs(problem, jnp.einsum("oki,ok->oi", Jc, r), axis_name, layout)      # [N, 6]
    g_cam = _red_cams(problem, jnp.einsum("oki,ok->oi", Jk, r), axis_name, layout)       # [C, 12]
    g_pts = _red_pts(problem, jnp.einsum("oki,ok->oi", Jx, r), axis_name, layout)       # [P, 3]

    # Diagonals of H (for LM damping, Ceres-style diag clamped).
    d_pose = _red_imgs(problem, jnp.einsum("oki,oki->oi", Jc, Jc), axis_name, layout)
    d_cam = _red_cams(problem, jnp.einsum("oki,oki->oi", Jk, Jk), axis_name, layout)
    d_pts = _red_pts(problem, jnp.einsum("oki,oki->oi", Jx, Jx), axis_name, layout)
    clamp = lambda d: jnp.clip(d, 1e-6, 1e32)
    d_pose_l = lam * clamp(d_pose)
    d_cam_l = lam * clamp(d_cam)
    d_pts_l = lam * clamp(d_pts)

    # Point blocks Hpp + damping, and their inverses.
    Hpp = _red_pts(problem, jnp.einsum("oki,okj->oij", Jx, Jx), axis_name, layout)
    Hpp = Hpp + jax.vmap(jnp.diag)(d_pts_l)
    # Guard empty points (all-zero block) against singular inverse.
    Hpp = Hpp + jnp.eye(3, dtype=Hpp.dtype) * (1e-12)
    Hpp_inv = _sym3_inverse(Hpp)

    def J_apply(u_pose, u_cam, v_pts):
        """(J [u; v]) per observation -> [O, 2]."""
        out = jnp.einsum("oki,oi->ok", Jc, u_pose[oi])
        out = out + jnp.einsum("oki,oi->ok", Jk, u_cam[oc])
        if v_pts is not None:
            out = out + jnp.einsum("oki,oi->ok", Jx, v_pts[op])
        return out

    def JT_apply_cam(t):
        """J_cam^T t for t [O, 2] -> (pose [N,6], cam [C,12])."""
        return (_red_imgs(problem, jnp.einsum("oki,ok->oi", Jc, t), axis_name, layout),
                _red_cams(problem, jnp.einsum("oki,ok->oi", Jk, t), axis_name, layout))

    def JT_apply_pts(t):
        return _red_pts(problem, jnp.einsum("oki,ok->oi", Jx, t), axis_name, layout)

    def hpp_solve(y):
        return jnp.einsum("pij,pj->pi", Hpp_inv, y)

    def schur_matvec(u_pose, u_cam):
        """S u = (Hcc + lam Dc) u - Hcp Hpp^-1 Hpc u, implicit."""
        t1 = J_apply(u_pose, u_cam, None)
        z = hpp_solve(JT_apply_pts(t1))
        t2 = jnp.einsum("oki,oi->ok", Jx, z[op])
        a_pose, a_cam = JT_apply_cam(t1 - t2)
        return a_pose + d_pose_l * u_pose, a_cam + d_cam_l * u_cam

    # SCHUR_JACOBI preconditioner blocks.
    Hcc_pose = _red_imgs(problem, jnp.einsum("oki,okj->oij", Jc, Jc), axis_name, layout)
    Hcc_cam = _red_cams(problem, jnp.einsum("oki,okj->oij", Jk, Jk), axis_name, layout)
    Bp = jnp.einsum("oki,okj->oij", Jc, Jx)          # [O, 6, 3]
    Bc = jnp.einsum("oki,okj->oij", Jk, Jx)          # [O, 12, 3]
    HinvO = Hpp_inv[op]
    S_pose = Hcc_pose - _red_imgs(problem, jnp.einsum("oij,ojk,olk->oil", Bp, HinvO, Bp), axis_name, layout)
    S_cam = Hcc_cam - _red_cams(problem, jnp.einsum("oij,ojk,olk->oil", Bc, HinvO, Bc), axis_name, layout)
    S_pose = S_pose + jax.vmap(jnp.diag)(d_pose_l + 1e-10)
    S_cam = S_cam + jax.vmap(jnp.diag)(d_cam_l + 1e-10)
    # Fixed parameters have all-zero rows; make the blocks invertible.
    free_pose = jnp.concatenate(
        [jnp.repeat(problem.free_rot[:, None], 3, axis=1), problem.free_trans], axis=1)
    S_pose = S_pose + jax.vmap(jnp.diag)(1.0 - free_pose)
    S_cam = S_cam + jax.vmap(jnp.diag)(1.0 - problem.free_cam)
    P_pose = jnp.linalg.inv(S_pose)
    P_cam = jnp.linalg.inv(S_cam)

    def precond(u_pose, u_cam):
        return (jnp.einsum("nij,nj->ni", P_pose, u_pose),
                jnp.einsum("cij,cj->ci", P_cam, u_cam))

    # RHS: b = -g_c + Hcp Hpp^-1 g_p.
    zp = hpp_solve(g_pts)
    t = jnp.einsum("oki,oi->ok", Jx, zp[op])
    hp_pose, hp_cam = JT_apply_cam(t)
    b_pose = -g_pose + hp_pose
    b_cam = -g_cam + hp_cam

    def back_substitute(u_pose, u_cam):
        t1 = J_apply(u_pose, u_cam, None)
        y = JT_apply_pts(t1)
        return hpp_solve(-g_pts - y)

    ops = dict(
        schur_matvec=schur_matvec, precond=precond,
        b_pose=b_pose, b_cam=b_cam,
        back_substitute=back_substitute,
        g_pose=g_pose, g_cam=g_cam, g_pts=g_pts,
        d_pose_l=d_pose_l, d_cam_l=d_cam_l, d_pts_l=d_pts_l,
        J_apply=J_apply, JT_apply_cam=JT_apply_cam, JT_apply_pts=JT_apply_pts,
    )
    return ops


def _pcg(matvec, precond, b_pose, b_cam, iters, tol):
    """Preconditioned CG on the reduced camera system."""

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

    x = (jnp.zeros_like(b_pose), jnp.zeros_like(b_cam))
    r = (b_pose, b_cam)
    z = precond(*r)
    p = z
    rz = dot(r, z)
    b_norm2 = dot((b_pose, b_cam), (b_pose, b_cam))

    def cond(state):
        i, x, r, p, rz = state
        rr = dot(r, r)
        return (i < iters) & (rr > tol * tol * jnp.maximum(b_norm2, 1e-30))

    def body(state):
        i, x, r, p, rz = state
        Ap = matvec(*p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
        z = precond(*r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = (z[0] + beta * p[0], z[1] + beta * p[1])
        return i + 1, x, r, p, rz_new

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x, r, p, rz))
    return x


def _dense_schur_solve(matvec, b_pose, b_cam):
    """Materialize the reduced system by applying the implicit operator to a
    basis and solve by Cholesky — the DENSE_SCHUR path for small problems."""
    N, C = b_pose.shape[0], b_cam.shape[0]
    dim = N * 6 + C * 12

    def col(e):
        ep = e[: N * 6].reshape(N, 6)
        ec = e[N * 6:].reshape(C, 12)
        mp, mc = matvec(ep, ec)
        return jnp.concatenate([mp.reshape(-1), mc.reshape(-1)])

    S = jax.vmap(col)(jnp.eye(dim, dtype=b_pose.dtype)).T
    b = jnp.concatenate([b_pose.reshape(-1), b_cam.reshape(-1)])
    x = jax.scipy.linalg.solve(S, b, assume_a="pos")
    return x[: N * 6].reshape(N, 6), x[N * 6:].reshape(C, 12)


def _solve_step_explicit_pm(problem: BAProblem, opt: BAOptions, lam):
    """Fused point-major explicit-Schur LM step — the fast single-chip path.

    Requires `opt.obs_layout == "point_major"` (see to_point_major).
    Measured design rules on v5e:
    - per-POINT reductions are free (reshape [P, K, d] + sum);
    - per-IMAGE reductions cost one one-hot build, so ALL image-side
      payloads (g, damping diag, Hcc, Hpc, cam-side blocks) are packed
      into ONE [O, ~300] matrix and reduced with a single
      [N, O] x [O, ~300] MXU matmul;
    - everything that would need a second reduction pass (E C^-1 g_p,
      E^T du) is routed through the materialized whitened coupling
      matrix EL as plain matvecs.
    """
    r, Jq, Jt, Jx, Jk = _linearize(problem, opt)
    N = problem.qvecs.shape[0]
    P = problem.points.shape[0]
    C = problem.cam_params.shape[0]
    O = r.shape[0]
    K = O // P
    oi, oc = problem.obs_image, problem.obs_cam
    dtype = r.dtype
    D = 6 * N + MAXP * C
    axis = opt.axis_name  # point-sharded SPMD: points/obs local, psum on
    #                       all image-side reductions (parallel/)

    Jc = jnp.concatenate([Jq, Jt], axis=-1)       # [O, 2, 6]

    def pt_reduce(v):
        return jnp.sum(v.reshape((P, K) + v.shape[1:]), axis=1)

    # ---- point-side payload: one fused reshape-reduction ----
    g_pts_o = jnp.einsum("oki,ok->oi", Jx, r)                  # [O, 3]
    Hpp_o = jnp.einsum("oki,okj->oij", Jx, Jx).reshape(O, 9)   # [O, 9]
    pt_pay = pt_reduce(jnp.concatenate([g_pts_o, Hpp_o], -1))  # [P, 12]
    g_pts = pt_pay[:, :3]
    Hpp = pt_pay[:, 3:].reshape(P, 3, 3)
    d_pts = jnp.einsum("pii->pi", Hpp)
    clamp = lambda d: jnp.clip(d, 1e-6, 1e32)
    d_pts_l = lam * clamp(d_pts)
    Hpp = Hpp + jax.vmap(jnp.diag)(d_pts_l) + 1e-12 * jnp.eye(3, dtype=dtype)
    Hpp_inv = _sym3_inverse(Hpp)
    Lp = jnp.linalg.cholesky(
        Hpp_inv + 1e-14 * jnp.eye(3, dtype=dtype))             # [P, 3, 3]

    # ---- image-side payload: ONE one-hot matmul ----
    g_pose_o = jnp.einsum("oki,ok->oi", Jc, r)                 # [O, 6]
    Hcc_pose_o = jnp.einsum("oki,okj->oij", Jc, Jc).reshape(O, 36)
    Hpc_o = jnp.einsum("oki,okj->oij", Jc, Jk).reshape(O, 6 * MAXP)
    g_cam_o = jnp.einsum("oki,ok->oi", Jk, r)                  # [O, 12]
    Hcc_cam_o = jnp.einsum("oki,okj->oij", Jk, Jk).reshape(O, MAXP * MAXP)
    img_pay = jnp.concatenate(
        [g_pose_o, Hcc_pose_o, Hpc_o, g_cam_o, Hcc_cam_o], -1)
    onehot = (oi[:, None] == jnp.arange(N, dtype=oi.dtype)[None, :]
              ).astype(dtype)                                  # [O, N]
    red = jnp.einsum("on,od->nd", onehot, img_pay,
                     preferred_element_type=dtype)             # [N, DI]
    red = _allreduce(red, axis)
    ofs = np.cumsum([0, 6, 36, 6 * MAXP, MAXP, MAXP * MAXP])
    g_pose = red[:, ofs[0]:ofs[1]]
    Hcc_pose = red[:, ofs[1]:ofs[2]].reshape(N, 6, 6)
    Hpc_img = red[:, ofs[2]:ofs[3]].reshape(N, 6, MAXP)
    g_cam_img = red[:, ofs[3]:ofs[4]]
    Hcc_cam_img = red[:, ofs[4]:ofs[5]].reshape(N, MAXP, MAXP)
    img_cam = problem.image_cam if problem.image_cam is not None else \
        jnp.zeros(N, jnp.int32)
    g_cam = jax.ops.segment_sum(g_cam_img, img_cam, num_segments=C)
    Hcc_cam = jax.ops.segment_sum(Hcc_cam_img, img_cam, num_segments=C)
    d_pose = jnp.einsum("nii->ni", Hcc_pose)
    d_cam = jnp.einsum("cii->ci", Hcc_cam)
    d_pose_l = lam * clamp(d_pose)
    d_cam_l = lam * clamp(d_cam)

    # ---- whitened coupling matrix EL [D, 3P] via one-hot einsum ----
    W_pose = jnp.einsum("oki,okj->oij", Jc, Jx)                # [O, 6, 3]
    W_cam = jnp.einsum("oki,okj->oij", Jk, Jx)                 # [O, 12, 3]
    LpO = jnp.repeat(Lp, K, axis=0)                            # [O, 3, 3]
    WL_pose = jnp.einsum("oij,ojk->oik", W_pose, LpO)
    WL_cam = jnp.einsum("oij,ojk->oik", W_cam, LpO)
    # (Measured: a K-round broadcast multiply-accumulate materializes the
    # [P, N, 18] accumulator K times and loses 2x; the batched einsum
    # below is the best known formulation on v5e.)
    oh_pk = onehot.reshape(P, K, N)
    EL_pose = jnp.einsum("pkn,pkij->nipj", oh_pk,
                         WL_pose.reshape(P, K, 6, 3),
                         preferred_element_type=dtype).reshape(6 * N, 3 * P)
    oh_c = (oc[:, None] == jnp.arange(C, dtype=oc.dtype)[None, :]
            ).astype(dtype).reshape(P, K, C)
    EL_cam = jnp.einsum("pkc,pkij->cipj", oh_c,
                        WL_cam.reshape(P, K, MAXP, 3),
                        preferred_element_type=dtype) \
        .reshape(MAXP * C, 3 * P)
    EL = jnp.concatenate([EL_pose, EL_cam], axis=0)

    # ---- assemble + solve the reduced system ----
    B = jnp.zeros((D, D), dtype)
    bi = (jnp.arange(N)[:, None] * 6 + jnp.arange(6)[None, :])
    B = B.at[bi[:, :, None], bi[:, None, :]].add(Hcc_pose)
    ci = 6 * N + (jnp.arange(C)[:, None] * MAXP + jnp.arange(MAXP)[None, :])
    B = B.at[ci[:, :, None], ci[:, None, :]].add(Hcc_cam)
    cam_cols = ci[img_cam]                                     # [N, 12]
    B = B.at[bi[:, :, None], cam_cols[:, None, :]].add(Hpc_img)
    B = B.at[cam_cols[:, :, None], bi[:, None, :]].add(
        jnp.swapaxes(Hpc_img, 1, 2))

    d_l = jnp.concatenate([d_pose_l.reshape(-1), d_cam_l.reshape(-1)])
    S = B + jnp.diag(d_l) - _allreduce(
        jnp.dot(EL, EL.T, preferred_element_type=dtype), axis)
    free_pose = jnp.concatenate(
        [jnp.repeat(problem.free_rot[:, None], 3, axis=1),
         problem.free_trans], axis=1)
    if not opt.refine_extrinsics:
        free_pose = free_pose * 0.0
    free_cam_m = problem.free_cam * jnp.asarray(
        _intrinsic_refine_mask(opt), dtype)
    free = jnp.concatenate([free_pose.reshape(-1), free_cam_m.reshape(-1)])
    S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)

    # RHS via EL: E C^-1 g_p = EL @ (Lp^T g_p).
    Ltg = jnp.einsum("pji,pj->pi", Lp, g_pts).reshape(-1)      # [3P]
    Ey = _allreduce(EL @ Ltg, axis)                            # [D]
    g_u = jnp.concatenate([g_pose.reshape(-1), g_cam.reshape(-1)])
    b = (-g_u + Ey) * free

    du = jax.scipy.linalg.solve(S, b, assume_a="pos")
    u_pose = du[:6 * N].reshape(N, 6) * free_pose
    u_cam = du[6 * N:].reshape(C, MAXP) * free_cam_m
    du_masked = jnp.concatenate([u_pose.reshape(-1), u_cam.reshape(-1)])

    # Back-substitution via EL: dp = -Hpp^-1 g_p - Lp (EL^T du).
    ELt_du = (EL.T @ du_masked).reshape(P, 3)
    dp = -jnp.einsum("pij,pj->pi", Hpp_inv, g_pts) \
        - jnp.einsum("pij,pj->pi", Lp, ELt_du)
    d_pts_step = dp * problem.free_points[:, None]

    # Predicted reduction.
    up_o = jnp.einsum("on,ni->oi", onehot, u_pose)             # [O, 6]
    uc_o = u_cam[oc]
    dp_o = jnp.repeat(d_pts_step, K, axis=0)
    t = (jnp.einsum("oki,oi->ok", Jc, up_o)
         + jnp.einsum("oki,oi->ok", Jk, uc_o)
         + jnp.einsum("oki,oi->ok", Jx, dp_o))
    gTd = (jnp.sum(g_pose * u_pose) + jnp.sum(g_cam * u_cam)
           + _allreduce(jnp.sum(g_pts * d_pts_step), axis))
    dHd = (_allreduce(jnp.sum(t * t)
                      + jnp.sum(d_pts_l * d_pts_step * d_pts_step), axis)
           + jnp.sum(d_pose_l * u_pose * u_pose)
           + jnp.sum(d_cam_l * u_cam * u_cam))
    predicted = -(gTd + 0.5 * dHd)
    g_inf_pts = jnp.max(jnp.abs(g_pts))
    if axis is not None:
        g_inf_pts = jax.lax.pmax(g_inf_pts, axis)
    g_inf = jnp.maximum(
        jnp.max(jnp.abs(g_pose)),
        jnp.maximum(jnp.max(jnp.abs(g_cam)), g_inf_pts))
    return u_pose, u_cam, d_pts_step, predicted, g_inf


def _solve_step_explicit(problem: BAProblem, opt: BAOptions, lam):
    """One LM step via the EXPLICIT reduced camera system.

    TPU rationale: the implicit-Schur PCG path costs ~3 segment-sum
    scatters over [O] per CG iteration (scatters are the slowest primitive
    on this hardware). Here the Schur complement
    ``S = B - E C^-1 E^T`` is materialized with ONE scatter (building the
    whitened point-coupling matrix ``EL = E @ chol(C^-1)`` as a dense
    [D, 3P] array) and ONE [D, 3P] x [3P, D] matmul that runs on the MXU —
    then a single dense Cholesky solve of the [D, D] system. This is the
    PBA/Ceres DENSE_SCHUR strategy (ref: optim/bundle_adjustment.cc:332
    solver auto-select; lib/PBA) reshaped so the heavy op is a matmul.
    Use when D * 3P fits in HBM (the `bundle_adjust` dispatcher guards).
    """
    r, Jq, Jt, Jx, Jk = _linearize(problem, opt)
    N = problem.qvecs.shape[0]
    P = problem.points.shape[0]
    C = problem.cam_params.shape[0]
    O = r.shape[0]
    oi, op, oc = problem.obs_image, problem.obs_point, problem.obs_cam
    dtype = r.dtype
    D = 6 * N + MAXP * C
    axis = opt.axis_name
    layout = opt.obs_layout

    Jc = jnp.concatenate([Jq, Jt], axis=-1)  # [O, 2, 6]

    # Gradients.
    g_pose = _red_imgs(problem, jnp.einsum("oki,ok->oi", Jc, r), axis, layout)
    g_cam = _red_cams(problem, jnp.einsum("oki,ok->oi", Jk, r), axis, layout)
    g_pts = _red_pts(problem, jnp.einsum("oki,ok->oi", Jx, r), axis, layout)

    # LM damping diagonals (Ceres-style clamped diag).
    d_pose = _red_imgs(problem, jnp.einsum("oki,oki->oi", Jc, Jc), axis, layout)
    d_cam = _red_cams(problem, jnp.einsum("oki,oki->oi", Jk, Jk), axis, layout)
    d_pts = _red_pts(problem, jnp.einsum("oki,oki->oi", Jx, Jx), axis, layout)
    clamp = lambda d: jnp.clip(d, 1e-6, 1e32)
    d_pose_l = lam * clamp(d_pose)
    d_cam_l = lam * clamp(d_cam)
    d_pts_l = lam * clamp(d_pts)

    # Damped point blocks and their inverse Cholesky factors.
    Hpp = _red_pts(problem, jnp.einsum("oki,okj->oij", Jx, Jx), axis, layout)
    Hpp = Hpp + jax.vmap(jnp.diag)(d_pts_l) + 1e-12 * jnp.eye(3, dtype=dtype)
    Hpp_inv = _sym3_inverse(Hpp)
    Lp = jnp.linalg.cholesky(
        Hpp_inv + 1e-14 * jnp.eye(3, dtype=dtype))  # [P, 3, 3]

    # Per-obs point-coupling blocks, whitened: WL = (Ju^T Jx) @ Lp.
    W_pose = jnp.einsum("oki,okj->oij", Jc, Jx)   # [O, 6, 3]
    W_cam = jnp.einsum("oki,okj->oij", Jk, Jx)    # [O, 12, 3]
    LpO = Lp[op]
    WL_pose = jnp.einsum("oij,ojk->oik", W_pose, LpO)
    WL_cam = jnp.einsum("oij,ojk->oik", W_cam, LpO)

    # Dense whitened coupling matrix EL [D, 3P] — built scatter-free when
    # the point-major layout is attached: arrange WL blocks per (point,
    # slot) and contract a one-hot image indicator on the MXU.
    if layout == "point_major" and axis is None:
        K = O // P
        img_slot = oi.reshape(P, K)
        onehot = jax.nn.one_hot(img_slot, N, dtype=dtype)  # [P, K, N]
        WLp_slot = WL_pose.reshape(P, K, 6, 3)   # padded rows already 0
        EL_pose = jnp.einsum("pkn,pkij->nipj", onehot, WLp_slot,
                             preferred_element_type=dtype) \
            .reshape(6 * N, 3 * P)
        onehot_c = jax.nn.one_hot(oc.reshape(P, K), C, dtype=dtype)
        WLc_slot = WL_cam.reshape(P, K, MAXP, 3)
        EL_cam = jnp.einsum("pkc,pkij->cipj", onehot_c, WLc_slot,
                            preferred_element_type=dtype) \
            .reshape(MAXP * C, 3 * P)
        EL = jnp.concatenate([EL_pose, EL_cam], axis=0)
    elif problem.pt_gather is not None and axis is None:
        pg = problem.pt_gather            # [P, K]
        pm = problem.pt_mask              # [P, K]
        K = pg.shape[1]
        img_slot = oi[pg]                 # [P, K]
        onehot = jax.nn.one_hot(img_slot, N, dtype=dtype) \
            * pm[..., None]               # [P, K, N]
        WLp_slot = WL_pose[pg]            # [P, K, 6, 3]
        EL_pose = jnp.einsum("pkn,pkij->nipj", onehot, WLp_slot,
                             preferred_element_type=dtype) \
            .reshape(6 * N, 3 * P)
        cam_slot = oc[pg]                 # [P, K]
        onehot_c = jax.nn.one_hot(cam_slot, C, dtype=dtype) \
            * pm[..., None]
        WLc_slot = WL_cam[pg]             # [P, K, 12, 3]
        EL_cam = jnp.einsum("pkc,pkij->cipj", onehot_c, WLc_slot,
                            preferred_element_type=dtype) \
            .reshape(MAXP * C, 3 * P)
        EL = jnp.concatenate([EL_pose, EL_cam], axis=0)
    else:
        rows_pose = (oi[:, None] * 6 + jnp.arange(6)[None, :])[:, :, None]
        rows_cam = (6 * N + oc[:, None] * MAXP
                    + jnp.arange(MAXP)[None, :])[:, :, None]
        cols = (op[:, None] * 3 + jnp.arange(3)[None, :])[:, None, :]
        EL = jnp.zeros((D, 3 * P), dtype)
        EL = EL.at[jnp.broadcast_to(rows_pose, (O, 6, 3)),
                   jnp.broadcast_to(cols, (O, 6, 3))].add(WL_pose)
        EL = EL.at[jnp.broadcast_to(rows_cam, (O, MAXP, 3)),
                   jnp.broadcast_to(cols, (O, MAXP, 3))].add(WL_cam)
        if axis is not None:
            EL = jax.lax.psum(EL, axis)

    # Top-left block B: diag pose blocks + diag cam blocks + pose-cam
    # coupling, assembled dense.
    Hcc_pose = _red_imgs(problem, jnp.einsum("oki,okj->oij", Jc, Jc), axis, layout)
    Hcc_cam = _red_cams(problem, jnp.einsum("oki,okj->oij", Jk, Jk), axis, layout)
    # obs_cam is a function of obs_image, so the pose-cam coupling block
    # of image i lives at pair (i, image_cam[i]) — a per-image reduction.
    Hpc_img = _red_imgs(problem, jnp.einsum("oki,okj->oij", Jc, Jk),
                        axis)                     # [N, 6, 12]
    if problem.image_cam is not None:
        img_cam = problem.image_cam
    else:
        img_cam = jax.ops.segment_max(oc, oi, num_segments=N)
    Hpc = jnp.zeros((N * C, 6, MAXP), dtype) \
        .at[jnp.arange(N) * C + img_cam].set(Hpc_img)
    B = jnp.zeros((D, D), dtype)
    bi = (jnp.arange(N)[:, None] * 6 + jnp.arange(6)[None, :])
    B = B.at[bi[:, :, None], bi[:, None, :]].add(Hcc_pose)
    ci = 6 * N + (jnp.arange(C)[:, None] * MAXP + jnp.arange(MAXP)[None, :])
    B = B.at[ci[:, :, None], ci[:, None, :]].add(Hcc_cam)
    pc_rows = jnp.repeat(bi, C, axis=0).reshape(N * C, 6)
    pc_cols = jnp.tile(ci, (N, 1)).reshape(N * C, MAXP)
    B = B.at[pc_rows[:, :, None], pc_cols[:, None, :]].add(Hpc)
    B = B.at[pc_cols[:, :, None], pc_rows[:, None, :]].add(
        jnp.swapaxes(Hpc, 1, 2))

    # Reduced system S = B + lam diag - EL EL^T, masked on free params.
    d_l = jnp.concatenate([d_pose_l.reshape(-1), d_cam_l.reshape(-1)])
    S = B + jnp.diag(d_l) - jnp.dot(EL, EL.T,
                                    preferred_element_type=dtype)
    free_pose = jnp.concatenate(
        [jnp.repeat(problem.free_rot[:, None], 3, axis=1),
         problem.free_trans], axis=1)
    if not opt.refine_extrinsics:
        free_pose = free_pose * 0.0
    free_cam_m = problem.free_cam * jnp.asarray(
        _intrinsic_refine_mask(opt), dtype)
    free = jnp.concatenate([free_pose.reshape(-1), free_cam_m.reshape(-1)])
    S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)

    # RHS: b = -g_u + E C^-1 g_p (per-obs segsum, cheap).
    y = jnp.einsum("pij,pj->pi", Hpp_inv, g_pts)   # C^-1 g_p
    Ey_pose = _red_imgs(problem, jnp.einsum("oij,oj->oi", W_pose, y[op]), axis, layout)
    Ey_cam = _red_cams(problem, jnp.einsum("oij,oj->oi", W_cam, y[op]), axis, layout)
    b = jnp.concatenate([(-g_pose + Ey_pose).reshape(-1),
                         (-g_cam + Ey_cam).reshape(-1)]) * free

    du = jax.scipy.linalg.solve(S, b, assume_a="pos")
    u_pose = du[:6 * N].reshape(N, 6) * free_pose
    u_cam = du[6 * N:].reshape(C, MAXP) * free_cam_m

    # Back-substitute points: dp = C^-1 (-g_p - E^T du).
    Etu = _red_pts(
        problem,
        jnp.einsum("oij,oi->oj", W_pose, u_pose[oi])
        + jnp.einsum("oij,oi->oj", W_cam, u_cam[oc]), axis)
    d_pts_step = jnp.einsum("pij,pj->pi", Hpp_inv, -g_pts - Etu)
    d_pts_step = d_pts_step * problem.free_points[:, None]

    # Predicted reduction (same formula as the implicit path).
    t = (jnp.einsum("oki,oi->ok", Jc, u_pose[oi])
         + jnp.einsum("oki,oi->ok", Jk, u_cam[oc])
         + jnp.einsum("oki,oi->ok", Jx, d_pts_step[op]))
    gTd = (jnp.sum(g_pose * u_pose) + jnp.sum(g_cam * u_cam)
           + jnp.sum(g_pts * d_pts_step))
    dHd = (_allreduce(jnp.sum(t * t), axis)
           + jnp.sum(d_pose_l * u_pose * u_pose)
           + jnp.sum(d_cam_l * u_cam * u_cam)
           + jnp.sum(d_pts_l * d_pts_step * d_pts_step))
    predicted = -(gTd + 0.5 * dHd)
    g_inf = jnp.maximum(
        jnp.max(jnp.abs(g_pose)),
        jnp.maximum(jnp.max(jnp.abs(g_cam)), jnp.max(jnp.abs(g_pts))))
    return u_pose, u_cam, d_pts_step, predicted, g_inf


def _solve_step(problem: BAProblem, opt: BAOptions, lam, use_dense: bool):
    """One linearization + linear solve. Returns the masked step and
    diagnostic quantities."""
    if opt.solver == "explicit_schur":
        if opt.obs_layout == "point_major":
            return _solve_step_explicit_pm(problem, opt, lam)
        return _solve_step_explicit(problem, opt, lam)
    r, Jq, Jt, Jx, Jk = _linearize(problem, opt)
    ops = _make_operators(problem, r, Jq, Jt, Jx, Jk, lam, opt.axis_name,
                           opt.obs_layout)

    if use_dense:
        u_pose, u_cam = _dense_schur_solve(ops["schur_matvec"], ops["b_pose"], ops["b_cam"])
    else:
        u_pose, u_cam = _pcg(ops["schur_matvec"], ops["precond"],
                             ops["b_pose"], ops["b_cam"],
                             opt.cg_iterations, opt.cg_tolerance)

    d_pts = ops["back_substitute"](u_pose, u_cam)

    # Re-mask the step (numerical safety; preconditioner identity rows).
    free_pose = jnp.concatenate(
        [jnp.repeat(problem.free_rot[:, None], 3, axis=1), problem.free_trans], axis=1)
    if not opt.refine_extrinsics:
        free_pose = free_pose * 0.0
    u_pose = u_pose * free_pose
    u_cam = u_cam * problem.free_cam * jnp.asarray(_intrinsic_refine_mask(opt), u_cam.dtype)
    d_pts = d_pts * problem.free_points[:, None]

    # Predicted reduction: -(g^T d + 1/2 d^T H d) with H including damping.
    t = ops["J_apply"](u_pose, u_cam, d_pts)
    gTd = (jnp.sum(ops["g_pose"] * u_pose) + jnp.sum(ops["g_cam"] * u_cam)
           + jnp.sum(ops["g_pts"] * d_pts))
    dHd = (_allreduce(jnp.sum(t * t), opt.axis_name)
           + jnp.sum(ops["d_pose_l"] * u_pose * u_pose)
           + jnp.sum(ops["d_cam_l"] * u_cam * u_cam)
           + jnp.sum(ops["d_pts_l"] * d_pts * d_pts))
    predicted = -(gTd + 0.5 * dHd)

    g_inf = jnp.maximum(
        jnp.max(jnp.abs(ops["g_pose"])),
        jnp.maximum(jnp.max(jnp.abs(ops["g_cam"])), jnp.max(jnp.abs(ops["g_pts"]))))
    return u_pose, u_cam, d_pts, predicted, g_inf


@functools.partial(jax.jit, static_argnames=("options", "use_dense"))
def _bundle_adjust_impl(problem: BAProblem, options: BAOptions, use_dense: bool):
    opt = options
    max_it = opt.max_iterations

    cost0 = _cost(problem.qvecs, problem.tvecs, problem.points,
                  problem.cam_params, problem, opt)

    def apply_step(qvecs, tvecs, points, cams, u_pose, u_cam, d_pts):
        q = quat_retract(qvecs, u_pose[:, :3])
        t = tvecs + u_pose[:, 3:]
        x = points + d_pts
        k = cams + u_cam
        return q, t, x, k

    State = lambda *a: a

    def cond(state):
        (it, q, t, x, k, lam, nu, cost, done, g_inf, trace) = state
        return (it < max_it) & (~done)

    def body(state):
        (it, q, t, x, k, lam, nu, cost, done, g_inf, trace) = state
        prob = problem._replace(qvecs=q, tvecs=t, points=x, cam_params=k)
        u_pose, u_cam, d_pts, predicted, g_inf = _solve_step(prob, opt, lam, use_dense)

        q2, t2, x2, k2 = apply_step(q, t, x, k, u_pose, u_cam, d_pts)
        new_cost = _cost(q2, t2, x2, k2, problem, opt)
        actual = cost - new_cost
        rho = actual / jnp.maximum(predicted, 1e-30)
        accept = (actual > 0) & (predicted > 0)

        # Madsen-Nielsen damping update.
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_rej = lam * nu
        lam = jnp.where(accept, jnp.maximum(lam_acc, 1e-14), jnp.minimum(lam_rej, 1e10))
        nu = jnp.where(accept, 2.0, nu * 2.0)

        q = jnp.where(accept, q2, q)
        t = jnp.where(accept, t2, t)
        x = jnp.where(accept, x2, x)
        k = jnp.where(accept, k2, k)
        cost_new = jnp.where(accept, new_cost, cost)

        step_norm = jnp.sqrt(jnp.sum(u_pose ** 2) + jnp.sum(u_cam ** 2) + jnp.sum(d_pts ** 2))
        x_norm = jnp.sqrt(jnp.sum(t ** 2) + jnp.sum(x ** 2) + jnp.sum(k ** 2)) + 1.0

        done = (
            (accept & (jnp.abs(actual) < opt.function_tolerance * jnp.maximum(cost, 1e-30)))
            | (g_inf < opt.gradient_tolerance)
            | (accept & (step_norm < opt.parameter_tolerance * x_norm))
            | (lam >= 1e10)
        )
        trace = trace.at[it + 1].set(cost_new)
        return (it + 1, q, t, x, k, lam, nu, cost_new, done, g_inf, trace)

    trace0 = jnp.full((max_it + 1,), jnp.nan, dtype=cost0.dtype).at[0].set(cost0)
    lam0 = jnp.asarray(1.0 / opt.initial_trust_radius, dtype=cost0.dtype)
    init = (0, problem.qvecs, problem.tvecs, problem.points, problem.cam_params,
            lam0, jnp.asarray(2.0, cost0.dtype), cost0,
            jnp.asarray(False), jnp.asarray(jnp.inf, cost0.dtype), trace0)

    (it, q, t, x, k, lam, nu, cost, done, g_inf, trace) = jax.lax.while_loop(cond, body, init)

    out = problem._replace(qvecs=q, tvecs=t, points=x, cam_params=k)
    summary = BASummary(
        initial_cost=cost0, final_cost=cost, num_iterations=it,
        num_residuals=_allreduce(jnp.sum(problem.obs_mask), opt.axis_name).astype(jnp.int32),
        gradient_norm=g_inf, cost_trace=trace)
    return out, summary


def bundle_adjust(problem: BAProblem, options: Optional[BAOptions] = None):
    """Solve. Chooses DENSE_SCHUR vs ITERATIVE_SCHUR by reduced-system size,
    mirroring the reference's image-count heuristic
    (ref: src/optim/bundle_adjustment.cc:332-350 solver auto-select)."""
    import dataclasses

    options = options or BAOptions()
    n = problem.qvecs.shape[0]
    c = problem.cam_params.shape[0]
    p = problem.points.shape[0]
    reduced = 6 * n + 12 * c

    # Fastest path: fused Pallas kernels (f32, TPU, supported model,
    # <=128 images). ~24x the XLA explicit-Schur step at bench scale.
    if options.solver in ("auto", "fused"):
        from sba_tpu.optim import ba_fused

        if ba_fused.can_use_fused(problem, options):
            return ba_fused.bundle_adjust_fused(problem, options)

    # Single-device solves route to the fused point-major explicit-Schur
    # step (_solve_step_explicit_pm) — measured fastest on v5e (8.5 LM
    # it/s on 128img/30k pts/210k obs vs 4.9 for the implicit PCG).
    if options.axis_name is None and options.obs_layout == "coo" and \
            options.solver in ("auto", "explicit_schur"):
        bytes_needed = reduced * 3 * p * problem.points.dtype.itemsize
        if bytes_needed <= 2 * 1024 ** 3:
            problem = to_point_major(problem)
            options = dataclasses.replace(options,
                                          obs_layout="point_major",
                                          solver="explicit_schur")
            return _bundle_adjust_impl(problem, options, False)

    if options.solver == "dense_schur":
        use_dense = True
    elif options.solver in ("schur_pcg", "explicit_schur"):
        use_dense = False
    else:
        # auto: explicit reduced system whenever the whitened coupling
        # matrix [D, 3P] fits a conservative HBM budget — it turns the
        # per-CG scatter storm into one MXU matmul (see
        # _solve_step_explicit); PCG only for genuinely huge problems.
        bytes_needed = reduced * 3 * p * problem.points.dtype.itemsize
        if bytes_needed <= 2 * 1024 ** 3 and options.axis_name is None:
            options = dataclasses.replace(options, solver="explicit_schur")
            return _bundle_adjust_impl(problem, options, False)
        use_dense = reduced <= options.dense_threshold
    return _bundle_adjust_impl(problem, options, use_dense)


# ---------------------------------------------------------------------------
# Problem construction from a SceneArrays view
# ---------------------------------------------------------------------------

def build_problem(arrays, constant_pose_rows=(), constant_tvec_rows=None,
                  constant_point_rows=(), constant_cam_rows=(),
                  dtype=jnp.float64) -> BAProblem:
    """Assemble a BAProblem from a `SceneArrays` dense view.

    constant_tvec_rows: dict {image_row: [component indices]} mirroring
    `BundleAdjustmentConfig::SetConstantTvec`.
    """
    n = arrays.num_images
    p = max(arrays.num_points, 1)
    c = len(arrays.camera_ids)

    free_rot = np.ones(n)
    free_trans = np.ones((n, 3))
    for row in constant_pose_rows:
        free_rot[row] = 0.0
        free_trans[row] = 0.0
    if constant_tvec_rows:
        for row, comps in constant_tvec_rows.items():
            for comp in comps:
                free_trans[row, comp] = 0.0
    free_points = np.ones(p)
    if arrays.num_points == 0:
        free_points[:] = 0.0
    for row in constant_point_rows:
        free_points[row] = 0.0
    free_cam = np.ones((c, MAXP))
    for row in constant_cam_rows:
        free_cam[row] = 0.0

    points = arrays.points if arrays.num_points else np.zeros((1, 3))

    # HOST-leaf problem (numpy): prep stays off the chip; jit transfers
    # H2D on first use (utils/host.py).
    problem = BAProblem(
        qvecs=np.asarray(arrays.qvecs, dtype),
        tvecs=np.asarray(arrays.tvecs, dtype),
        points=np.asarray(points, dtype),
        cam_params=np.asarray(arrays.camera_params, dtype),
        obs_image=np.asarray(arrays.obs_image, np.int32),
        obs_point=np.asarray(arrays.obs_point, np.int32),
        obs_cam=np.asarray(arrays.obs_camera_idx(), np.int32),
        obs_xy=np.asarray(arrays.obs_xy, dtype),
        obs_mask=np.ones(arrays.num_observations, dtype),
        free_rot=np.asarray(free_rot, dtype),
        free_trans=np.asarray(free_trans, dtype),
        free_points=np.asarray(free_points, dtype),
        free_cam=np.asarray(free_cam, dtype),
    )
    return attach_gather_layouts(problem)
