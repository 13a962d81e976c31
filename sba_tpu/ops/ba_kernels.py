"""Fused Pallas TPU kernels for the bundle-adjustment LM step.

This is the speed-of-light single-chip path replacing the XLA-level
explicit-Schur step in optim/ba.py (`_solve_step_explicit_pm`) — the
TPU-native rebuild of the reference's PBA engine (ref: lib/PBA) and
Ceres DENSE_SCHUR (ref: src/optim/bundle_adjustment.cc solver select).

Why a kernel: profiling the XLA path shows EVERY per-observation block
array ([O,2,3] Jacobians, [O,3,3] rotations, [O,6,3] couplings) pads its
3-wide trailing dims to the 128-lane tile, turning a ~50 MB working set
into GBs of HBM traffic. Here the layout is transposed once —
**observations live in lanes** ([field, O] rows) — and one kernel pass
per LM iteration computes:

  residual + analytic Jacobians (chain rule: Jt = A, Jx = A R,
      Jq = -Jx [x]x, head derivatives hand-written per camera model)
  -> per-point payload (g_p, Hpp, Hpp^-1, Lp = chol(Hpp^-1))
  -> per-image payload (g, Hcc, Hpc, cam blocks) via an in-kernel
     one-hot MXU contraction
  -> the whitened coupling block ELb [D, 3*TP] built in VMEM and the
     Schur correction  S_corr += ELb ELb^T  on the MXU
  -> RHS coupling Ey += ELb (Lp^T g_p)

Observation order is point-major + *slot-major within a block*: block b
owns points [b*TP, (b+1)*TP); lane c = s*TP + p_local holds observation
slot s of point p. Per-point reductions are then sums of K contiguous
[*, TP] slices — no reshapes across lanes. Poses/intrinsics are gathered
in-kernel with the same one-hot matmul (params [F, N] @ onehot [N, B]),
never with row gathers (measured ~1000x below HBM speed for tiny rows).

Two sibling kernels reuse the stored per-obs blocks: `_backsub_kernel`
(point update + predicted-reduction sums) and `_cost_kernel` (robust
cost at trial parameters). f32 only (TPU); f64 solves use optim/ba.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sba_tpu.geometry import camera_models
from sba_tpu.optim.losses import loss_value, loss_weight

MAXP = camera_models.MAX_NUM_PARAMS

SUPPORTED_MODELS = tuple(range(11))  # all 11 COLMAP camera models have
#   analytic heads below (ref: src/base/camera_models.h model registry).


def _round_up(x, m):
    return (x + m - 1) // m * m


class KernelLayout(NamedTuple):
    TP: int        # points per block
    K: int         # slots (max track length)
    nb: int        # number of blocks
    Pp: int        # padded point count (nb * TP)
    N: int         # real images
    Npad: int      # padded images (mult of 128)
    C: int         # cameras
    nparams: int   # camera model parameter count
    Dk: int        # padded reduced dim: 6*Npad + round_up(12*C, 128)
    DI: int        # image payload cols (padded)
    JW: int        # stored per-obs rows (padded)
    ranged: bool = False  # image-sub-block loops instead of [Npad, B]
    #   one-hot (the large-N path; see _gather_rows/_scatter_accum)
    IB: int = 256  # image sub-block rows for the ranged loops
    BJ: bool = True  # implicit payload carries the full 6x6 pose-block
    #   Schur correction (21 tri rows) for block-Jacobi PCG; False when
    #   the DI padding has no room (np=5 models) -> scalar Jacobi
    JCW: int = 48  # correction-coupling rows (WLp+WLc only, padded):
    #   the matvec-PCG streams this slim bf16 array instead of the full
    #   f32 jw — ~3.5x less HBM traffic per CG iteration (the large-N
    #   bottleneck; BASELINE.md "large-N cliff")


class KernelStatic(NamedTuple):
    """Per-solve device arrays in kernel (slot-major) order."""

    obs_sta: jnp.ndarray   # [8, O'] f32: xy(2), mask(1)
    obs_img: jnp.ndarray   # [1, O'] i32
    obs_cam: jnp.ndarray   # [1, O'] i32
    free_sta: jnp.ndarray  # [4+np, Npad] f32: rot(1), trans(3), cam(np)
    free_pts: jnp.ndarray  # [1, Pp] f32
    image_cam: jnp.ndarray  # [Npad] i32 (host-known; for cam segmenting)
    perm_obs: jnp.ndarray  # [O'] point-major obs row per kernel lane (-1 pad)
    blk_rng: jnp.ndarray   # [nb, 2] i32: [lo, hi) image-sub-block range
    #   per point block — host-side diagnostic only (the kernels derive
    #   the same range in-VMEM via _block_range; tight after the
    #   locality sort in optim/ba_fused._bucketize)


RANGED_MIN_NPAD = 2048  # beyond this the [Npad, B] one-hot no longer
#   fits VMEM; the ranged kernels loop over IB-row image sub-blocks.


def plan_layout(problem, opt, TP: int = 128,
                block_multiple: int = 1) -> KernelLayout:
    """`block_multiple`: pad the block count to a multiple of it so the
    point blocks divide evenly over an SPMD mesh axis (parallel/
    ba_fused_spmd.py shards blocks across devices)."""
    P = problem.points.shape[0]
    O = problem.obs_image.shape[0]
    K = O // P
    N = problem.qvecs.shape[0]
    C = problem.cam_params.shape[0]
    nparams = camera_models.model_by_id(opt.model_id).num_params
    Pp = _round_up(P, TP * block_multiple)
    nb = Pp // TP
    Npad = _round_up(N, 128)
    Dk = 6 * Npad + _round_up(12 * C, 128)
    DI = _round_up(6 + 36 + 6 * nparams + nparams + nparams * nparams, 128)
    JW = _round_up(12 + 6 + 2 * nparams + 18 + 3 * nparams, 8)
    mode = getattr(opt, "fused_ranged", "auto")
    ranged = (mode == "on") or (mode == "auto" and Npad >= RANGED_MIN_NPAD)
    IB = min(256, Npad)
    base = 6 + 36 + 6 * nparams + nparams + nparams * nparams
    BJ = base + 27 + 2 * nparams <= DI
    # bf16 sublane tiling is (16, 128): pad the coupling rows to 16.
    JCW = _round_up(18 + 3 * nparams, 16)
    return KernelLayout(TP, K, nb, Pp, N, Npad, C, nparams, Dk, DI, JW,
                        ranged, IB, BJ, JCW)


def build_static(problem, opt, lay: KernelLayout) -> KernelStatic:
    """Host-side reorder of the observation table into kernel order.

    Input problem must be point-major (optim.ba.to_point_major): obs row
    = p * K + s. Kernel lane c (global) = b*TP*K + s*TP + p_local.
    """
    TP, K, Pp = lay.TP, lay.K, lay.Pp
    P = problem.points.shape[0]
    Op = Pp * K

    p_of = np.repeat(np.arange(Pp), K).reshape(Pp, K)      # [Pp, K]
    s_of = np.tile(np.arange(K), (Pp, 1))
    b = p_of // TP
    pl_ = p_of % TP
    lane = b * (TP * K) + s_of * TP + pl_                  # [Pp, K]
    src = p_of * K + s_of                                  # point-major row
    perm = np.full(Op, -1, np.int64)
    valid = (p_of < P).reshape(-1)
    perm[lane.reshape(-1)[valid]] = src.reshape(-1)[valid]

    def take_f(a, fill=0.0):
        a = np.asarray(a, np.float32)
        out = np.full((Op,) + a.shape[1:], fill, np.float32)
        m = perm >= 0
        out[m] = a[perm[m]]
        return out

    def take_i(a):
        a = np.asarray(a, np.int32)
        out = np.zeros((Op,) + a.shape[1:], np.int32)
        m = perm >= 0
        out[m] = a[perm[m]]
        return out

    xy = take_f(problem.obs_xy)                            # [Op, 2]
    mask = take_f(problem.obs_mask)                        # [Op]
    obs_sta = np.zeros((8, Op), np.float32)
    obs_sta[0] = xy[:, 0]
    obs_sta[1] = xy[:, 1]
    obs_sta[2] = mask
    obs_img = take_i(problem.obs_image)[None, :]
    obs_cam = take_i(problem.obs_cam)[None, :]

    # Per-block image-sub-block ranges [lo, hi) for the ranged kernels.
    # Padding lanes get re-imaged to the block's min real image so they
    # never widen a range (their payload contribution is masked to 0).
    nb, IB, BB = lay.nb, lay.IB, TP * K
    blk_rng = np.zeros((nb, 2), np.int32)
    oi_flat = obs_img[0]
    real = (perm >= 0) & (mask > 0)
    for b in range(nb):
        sl = slice(b * BB, (b + 1) * BB)
        imgs = oi_flat[sl][real[sl]]
        if len(imgs):
            lo, hi = int(imgs.min()), int(imgs.max())
            blk_rng[b] = (lo // IB, hi // IB + 1)
            fill = np.where(real[sl], oi_flat[sl], lo)
            obs_img[0, sl] = fill

    nparams = lay.nparams
    free_sta = np.zeros((4 + nparams, lay.Npad), np.float32)
    N = lay.N
    free_sta[0, :N] = np.asarray(problem.free_rot, np.float32)
    free_sta[1:4, :N] = np.asarray(problem.free_trans, np.float32).T
    image_cam = np.zeros(lay.Npad, np.int32)
    image_cam[:N] = np.asarray(problem.image_cam, np.int32)
    refine = _intrinsic_mask(opt)[:nparams]
    fc = np.asarray(problem.free_cam, np.float32)[:, :nparams] * refine
    free_sta[4:, :N] = fc[image_cam[:N]].T
    if not opt.refine_extrinsics:
        free_sta[:4] = 0.0

    free_pts = np.zeros((1, Pp), np.float32)
    free_pts[0, :P] = np.asarray(problem.free_points, np.float32)

    return KernelStatic(
        obs_sta=jnp.asarray(obs_sta), obs_img=jnp.asarray(obs_img),
        obs_cam=jnp.asarray(obs_cam), free_sta=jnp.asarray(free_sta),
        free_pts=jnp.asarray(free_pts), image_cam=jnp.asarray(image_cam),
        perm_obs=jnp.asarray(perm), blk_rng=jnp.asarray(blk_rng))


def _intrinsic_mask(opt) -> np.ndarray:
    spec = camera_models.model_by_id(opt.model_id)
    m = np.zeros(MAXP, np.float32)
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


def pack_params(qvecs, tvecs, cam_params, image_cam, lay: KernelLayout):
    """[7+np, Npad] per-image dynamic parameter rows (q, t, k)."""
    nparams = lay.nparams
    k_img = cam_params[image_cam[:lay.N], :nparams]        # [N, np]
    par = jnp.concatenate([qvecs, tvecs, k_img], axis=1).T  # [7+np, N]
    pad = lay.Npad - lay.N
    if pad:
        par = jnp.pad(par, ((0, 0), (0, pad)))
        # padded images: identity quaternion avoids 0-norm guards
        par = par.at[0, lay.N:].set(1.0)
    return par.astype(jnp.float32)


def pack_points(points, lay: KernelLayout):
    """[3, Pp] transposed, padded."""
    pts = points.T.astype(jnp.float32)
    pad = lay.Pp - points.shape[0]
    if pad:
        pts = jnp.pad(pts, ((0, 0), (0, pad)))
    return pts


# ---------------------------------------------------------------------------
# In-kernel math helpers (operate on [1, B] / [rows, B] f32 arrays)
# ---------------------------------------------------------------------------

def _img_onehot(img_row, base, IB, B):
    """One-hot [IB, B] of img_row over image rows [base, base+IB)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (IB, B), 0) + base
    return (iota == img_row).astype(jnp.float32)


def _block_range(img_row, IB):
    """[lo, hi) image-sub-block range of this block, from its obs_img
    lane row. build_static re-images padding lanes to the block's min
    real image, so min/max are tight; empty blocks cost one sub-block."""
    lo = jnp.min(img_row) // IB
    hi = jnp.max(img_row) // IB + 1
    return lo, hi


def _gather_rows(mat_ref, img_row, lo, hi, IB):
    """Ranged per-image gather: sum_ib mat[:, ib*IB:(ib+1)*IB] @ oh_sub.

    Equivalent to mat [F, Npad] @ onehot [Npad, B] but looping only the
    image sub-blocks [lo, hi) this point block touches — the [Npad, B]
    one-hot (the VMEM term that caps the non-ranged kernels at ~2k
    images) is never materialized."""
    nrows = mat_ref.shape[0]
    B = img_row.shape[-1]

    def body(ib, acc):
        base = pl.multiple_of(ib * IB, IB)
        oh = _img_onehot(img_row, base, IB, B)
        sub = mat_ref[:, pl.ds(base, IB)]
        return acc + jax.lax.dot_general(
            sub, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(lo, hi, body,
                             jnp.zeros((nrows, B), jnp.float32))


def _scatter_accum(out_ref, payload, img_row, lo, hi, IB):
    """Ranged per-image scatter-add: out[ib*IB:(ib+1)*IB, :] +=
    oh_sub @ payload^T for each touched image sub-block."""

    def body(ib, _):
        base = pl.multiple_of(ib * IB, IB)
        oh = _img_onehot(img_row, base, IB, payload.shape[-1])
        out_ref[pl.ds(base, IB), :] += jax.lax.dot_general(
            oh, payload, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)


def _rot_rows(qw, qx, qy, qz):
    """Rotation matrix entries from a (normalized) quaternion row."""
    n = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-30)
    w, x, y, z = qw * n, qx * n, qy * n, qz * n
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def _head(model_id, k, u, v):
    """Projection + derivatives for the supported analytic heads.

    Returns (px, py, A2 rows ((a00,a01),(a10,a11)), dk list of (dx, dy)
    per camera parameter). Math parity with ref camera_models.h
    WorldToImage for each model.
    """
    if model_id == 0:       # SIMPLE_PINHOLE: f, cx, cy
        f, cx, cy = k
        px, py = f * u + cx, f * v + cy
        a = ((f, jnp.zeros_like(f)), (jnp.zeros_like(f), f))
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        dk = [(u, v), (one, zero), (zero, one)]
        return px, py, a, dk
    if model_id == 1:       # PINHOLE: fx, fy, cx, cy
        fx, fy, cx, cy = k
        px, py = fx * u + cx, fy * v + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        a = ((fx, zero), (zero, fy))
        dk = [(u, zero), (zero, v), (one, zero), (zero, one)]
        return px, py, a, dk
    if model_id == 2:       # SIMPLE_RADIAL: f, cx, cy, k1
        f, cx, cy, k1 = k
        r2 = u * u + v * v
        d = 1.0 + k1 * r2
        px, py = f * (u * d) + cx, f * (v * d) + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        # d(ud)/du = d + 2 k1 u^2 ; d(ud)/dv = 2 k1 u v
        a = ((f * (d + 2 * k1 * u * u), f * (2 * k1 * u * v)),
             (f * (2 * k1 * u * v), f * (d + 2 * k1 * v * v)))
        dk = [(u * d, v * d), (one, zero), (zero, one),
              (f * u * r2, f * v * r2)]
        return px, py, a, dk
    if model_id == 3:       # RADIAL: f, cx, cy, k1, k2
        f, cx, cy, k1, k2 = k
        r2 = u * u + v * v
        d = 1.0 + k1 * r2 + k2 * r2 * r2
        dd = 2.0 * (k1 + 2.0 * k2 * r2)   # dd/d(r2) * 2
        px, py = f * (u * d) + cx, f * (v * d) + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        a = ((f * (d + dd * u * u), f * (dd * u * v)),
             (f * (dd * u * v), f * (d + dd * v * v)))
        dk = [(u * d, v * d), (one, zero), (zero, one),
              (f * u * r2, f * v * r2), (f * u * r2 * r2, f * v * r2 * r2)]
        return px, py, a, dk
    if model_id == 4:       # OPENCV: fx, fy, cx, cy, k1, k2, p1, p2
        fx, fy, cx, cy, k1, k2, p1, p2 = k
        u2, v2, uv = u * u, v * v, u * v
        r2 = u2 + v2
        r4 = r2 * r2
        radial = k1 * r2 + k2 * r4
        drad = 2.0 * (k1 + 2.0 * k2 * r2)   # d(radial)/d(u) = drad*u
        xp = u * (1.0 + radial) + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u2)
        yp = v * (1.0 + radial) + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v2)
        px, py = fx * xp + cx, fy * yp + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        dxp_du = 1.0 + radial + u2 * drad + 2.0 * p1 * v + 6.0 * p2 * u
        dxy = uv * drad + 2.0 * p1 * u + 2.0 * p2 * v   # = dxp_dv = dyp_du
        dyp_dv = 1.0 + radial + v2 * drad + 2.0 * p2 * u + 6.0 * p1 * v
        a = ((fx * dxp_du, fx * dxy), (fy * dxy, fy * dyp_dv))
        dk = [(xp, zero), (zero, yp), (one, zero), (zero, one),
              (fx * u * r2, fy * v * r2), (fx * u * r4, fy * v * r4),
              (fx * 2.0 * uv, fy * (r2 + 2.0 * v2)),
              (fx * (r2 + 2.0 * u2), fy * 2.0 * uv)]
        return px, py, a, dk
    if model_id == 5:       # OPENCV_FISHEYE: fx, fy, cx, cy, k1, k2, k3, k4
        fx, fy, cx, cy, k1, k2, k3, k4 = k
        u2, v2, uv = u * u, v * v, u * v
        r2 = u2 + v2
        r = jnp.sqrt(r2)
        safe_r = jnp.maximum(r, 1e-12)
        small = r < 1e-8
        theta = jnp.arctan(r)
        t2 = theta * theta
        t4 = t2 * t2
        poly = 1.0 + k1 * t2 + k2 * t4 + k3 * t4 * t2 + k4 * t4 * t4
        dpoly = 2.0 * k1 + 4.0 * k2 * t2 + 6.0 * k3 * t4 \
            + 8.0 * k4 * t4 * t2                      # d(poly)/d(t2) * 2
        thetad = theta * poly
        s = jnp.where(small, 1.0, thetad / safe_r)
        # g = (ds/dr)/r; limit r->0 is 2*(k1 - 1/3).
        dthetad = poly + t2 * dpoly                   # d(thetad)/d(theta)
        g_main = (dthetad / (1.0 + r2) - s) / jnp.maximum(r2, 1e-24)
        g = jnp.where(small, 2.0 * (k1 - 1.0 / 3.0), g_main)
        xp, yp = u * s, v * s
        px, py = fx * xp + cx, fy * yp + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        a = ((fx * (s + u2 * g), fx * uv * g),
             (fy * uv * g, fy * (s + v2 * g)))
        # d(thetad)/d(ki) = theta^(2i+1); d(px)/d(ki) = fx*u*theta^(2i+1)/r.
        t1r = jnp.where(small, r2, theta * t2 / safe_r)
        dk_rows = [t1r, t1r * t2, t1r * t4, t1r * t4 * t2]
        dk = [(xp, zero), (zero, yp), (one, zero), (zero, one)] + \
            [(fx * u * d, fy * v * d) for d in dk_rows]
        return px, py, a, dk
    if model_id == 6:       # FULL_OPENCV: fx,fy,cx,cy,k1,k2,p1,p2,k3,k4,k5,k6
        fx, fy, cx, cy, k1, k2, p1, p2, k3, k4, k5, k6 = k
        u2, v2, uv = u * u, v * v, u * v
        r2 = u2 + v2
        r4 = r2 * r2
        r6 = r4 * r2
        num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
        den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
        inv_d = 1.0 / den
        radial = num * inv_d
        dnum = k1 + 2.0 * k2 * r2 + 3.0 * k3 * r4   # d(num)/d(r2)
        dden = k4 + 2.0 * k5 * r2 + 3.0 * k6 * r4
        drad = 2.0 * (dnum - radial * dden) * inv_d  # d(radial)/du = drad*u
        xp = u * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u2)
        yp = v * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v2)
        px, py = fx * xp + cx, fy * yp + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        dxp_du = radial + u2 * drad + 2.0 * p1 * v + 6.0 * p2 * u
        dxy = uv * drad + 2.0 * p1 * u + 2.0 * p2 * v
        dyp_dv = radial + v2 * drad + 2.0 * p2 * u + 6.0 * p1 * v
        a = ((fx * dxp_du, fx * dxy), (fy * dxy, fy * dyp_dv))
        nd2 = radial * inv_d                        # num / den^2
        dk = [(xp, zero), (zero, yp), (one, zero), (zero, one),
              (fx * u * r2 * inv_d, fy * v * r2 * inv_d),
              (fx * u * r4 * inv_d, fy * v * r4 * inv_d),
              (fx * 2.0 * uv, fy * (r2 + 2.0 * v2)),
              (fx * (r2 + 2.0 * u2), fy * 2.0 * uv),
              (fx * u * r6 * inv_d, fy * v * r6 * inv_d),
              (-fx * u * r2 * nd2, -fy * v * r2 * nd2),
              (-fx * u * r4 * nd2, -fy * v * r4 * nd2),
              (-fx * u * r6 * nd2, -fy * v * r6 * nd2)]
        return px, py, a, dk
    if model_id == 7:       # FOV: fx, fy, cx, cy, omega
        fx, fy, cx, cy, omega = k
        u2, v2, uv = u * u, v * v, u * v
        r2 = u2 + v2
        r = jnp.sqrt(r2)
        safe_r2 = jnp.maximum(r2, 1e-24)
        small_r = r2 < 1e-4                        # ref camera_models.h guard
        tanh = jnp.tan(omega * 0.5)
        aa = 2.0 * tanh                            # atan argument slope
        safe_om = jnp.where(jnp.abs(omega) > 1e-12, omega, 1.0)
        small_om = omega * omega < 1e-4            # ref guard thresholds
        # factor s = atan(a r) / (omega r); small-r/omega Taylor as the ref.
        s_main = jnp.arctan(aa * r) / (jnp.maximum(r, 1e-12) * safe_om)
        s_small = (-2.0 * tanh * (4.0 * r2 * tanh * tanh - 3.0)) / (3.0 * safe_om)
        s_om = omega * omega * r2 / 3.0 - omega * omega / 12.0 + 1.0
        s = jnp.where(small_om, s_om, jnp.where(small_r, s_small, s_main))
        # g = (ds/dr)/r: main ((a/(om(1+a^2 r^2)) - s)/r2; Taylor limits.
        g_main = (aa / (safe_om * (1.0 + aa * aa * r2)) - s) / safe_r2
        g_small = -2.0 * aa * aa * aa / (3.0 * safe_om)
        g = jnp.where(small_om, 2.0 * omega * omega / 3.0,
                      jnp.where(small_r, g_small, g_main))
        # omega derivative of s: (1+a^2/4)/(om(1+a^2 r^2)) - s/om.
        dsdo_main = (1.0 + 0.25 * aa * aa) / (safe_om * (1.0 + aa * aa * r2)) \
            - s / safe_om
        dsdo = jnp.where(small_om, 2.0 * omega * r2 / 3.0 - omega / 6.0,
                         dsdo_main)
        xp, yp = u * s, v * s
        px, py = fx * xp + cx, fy * yp + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        a = ((fx * (s + u2 * g), fx * uv * g),
             (fy * uv * g, fy * (s + v2 * g)))
        dk = [(xp, zero), (zero, yp), (one, zero), (zero, one),
              (fx * u * dsdo, fy * v * dsdo)]
        return px, py, a, dk
    if model_id in (8, 9):  # SIMPLE_RADIAL_FISHEYE / RADIAL_FISHEYE
        if model_id == 8:
            f, cx, cy, k1 = k
            k2 = jnp.zeros_like(k1)
        else:
            f, cx, cy, k1, k2 = k
        u2, v2, uv = u * u, v * v, u * v
        r2 = u2 + v2
        r = jnp.sqrt(r2)
        safe_r = jnp.maximum(r, 1e-12)
        small = r < 1e-8
        theta = jnp.arctan(r)
        t2 = theta * theta
        t4 = t2 * t2
        poly = 1.0 + k1 * t2 + k2 * t4
        dthetad = 1.0 + 3.0 * k1 * t2 + 5.0 * k2 * t4  # d(theta*poly)/d(theta)
        thetad = theta * poly
        s = jnp.where(small, 1.0, thetad / safe_r)
        g_main = (dthetad / (1.0 + r2) - s) / jnp.maximum(r2, 1e-24)
        g = jnp.where(small, 2.0 * (k1 - 1.0 / 3.0), g_main)
        xp, yp = u * s, v * s
        px, py = f * xp + cx, f * yp + cy
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        a = ((f * (s + u2 * g), f * uv * g),
             (f * uv * g, f * (s + v2 * g)))
        t1r = jnp.where(small, r2, theta * t2 / safe_r)
        dk = [(xp, yp), (one, zero), (zero, one),
              (f * u * t1r, f * v * t1r)]
        if model_id == 9:
            dk.append((f * u * t1r * t2, f * v * t1r * t2))
        return px, py, a, dk
    if model_id == 10:      # THIN_PRISM_FISHEYE:
        #                     fx,fy,cx,cy,k1,k2,p1,p2,k3,k4,sx1,sy1
        fx, fy, cx, cy, k1, k2, p1, p2, k3, k4, sx1, sy1 = k
        r2 = u * u + v * v
        r = jnp.sqrt(r2)
        safe_r = jnp.maximum(r, 1e-12)
        small = r < 1e-8
        theta = jnp.arctan(r)
        s = jnp.where(small, 1.0, theta / safe_r)       # equidistant pre-map
        gs_main = (1.0 / (1.0 + r2) - s) / jnp.maximum(r2, 1e-24)
        gs = jnp.where(small, -2.0 / 3.0, gs_main)      # (ds/dr)/r
        up, vp = u * s, v * s
        # pre-map Jacobian
        j00 = s + u * u * gs
        j01 = u * v * gs
        j11 = s + v * v * gs
        # thin-prism distortion on (up, vp)
        p2_ = up * up + vp * vp
        p4 = p2_ * p2_
        p6 = p4 * p2_
        p8 = p6 * p2_
        uvp = up * vp
        radial = k1 * p2_ + k2 * p4 + k3 * p6 + k4 * p8
        drad = 2.0 * (k1 + 2.0 * k2 * p2_ + 3.0 * k3 * p4 + 4.0 * k4 * p6)
        xp = up * (1.0 + radial) + 2.0 * p1 * uvp + p2 * (p2_ + 2.0 * up * up) \
            + sx1 * p2_
        yp = vp * (1.0 + radial) + 2.0 * p2 * uvp + p1 * (p2_ + 2.0 * vp * vp) \
            + sy1 * p2_
        px, py = fx * xp + cx, fy * yp + cy
        # thin-prism Jacobian wrt (up, vp)
        b00 = 1.0 + radial + up * up * drad + 2.0 * p1 * vp + 6.0 * p2 * up \
            + 2.0 * sx1 * up
        b01 = uvp * drad + 2.0 * p1 * up + 2.0 * p2 * vp + 2.0 * sx1 * vp
        b10 = uvp * drad + 2.0 * p2 * vp + 2.0 * p1 * up + 2.0 * sy1 * up
        b11 = 1.0 + radial + vp * vp * drad + 2.0 * p2 * up + 6.0 * p1 * vp \
            + 2.0 * sy1 * vp
        # chain: A = F * B * J_premap
        a00 = b00 * j00 + b01 * j01
        a01 = b00 * j01 + b01 * j11
        a10 = b10 * j00 + b11 * j01
        a11 = b10 * j01 + b11 * j11
        a = ((fx * a00, fx * a01), (fy * a10, fy * a11))
        zero = jnp.zeros_like(u)
        one = jnp.ones_like(u)
        dk = [(xp, zero), (zero, yp), (one, zero), (zero, one),
              (fx * up * p2_, fy * vp * p2_),
              (fx * up * p4, fy * vp * p4),
              (fx * 2.0 * uvp, fy * (p2_ + 2.0 * vp * vp)),
              (fx * (p2_ + 2.0 * up * up), fy * 2.0 * uvp),
              (fx * up * p6, fy * vp * p6),
              (fx * up * p8, fy * vp * p8),
              (fx * p2_, zero), (zero, fy * p2_)]
        return px, py, a, dk
    raise NotImplementedError(model_id)


def _linearize_block(model_id, nparams, loss, loss_scale,
                     g, fr, x_rows, free_p_row, xy0, xy1, mask,
                     K, TP):
    """Shared linearization for one block. All inputs [*, B] / [*, TP].

    `g` [7+np, B] / `fr` [4+np, B] are the per-observation image params
    and free masks, pre-gathered by the caller (one-hot MXU contraction
    or the ranged `_gather_rows` loop).

    Returns dict of row arrays: r(2), Jc(12), Jx(6), Jk(2*np), plus raw
    weight row w.
    """
    B = mask.shape[-1]
    q = [g[i:i + 1, :] for i in range(4)]
    t = [g[4 + i:5 + i, :] for i in range(3)]
    k = [g[7 + i:8 + i, :] for i in range(nparams)]
    free_rot = fr[0:1, :]
    free_t = [fr[1 + i:2 + i, :] for i in range(3)]
    free_k = [fr[4 + i:5 + i, :] for i in range(nparams)]

    # Tile per-point columns K times (slot-major: concat along lanes).
    def tile_pt(row):
        return jnp.concatenate([row] * K, axis=1)

    x = [tile_pt(x_rows[j]) for j in range(3)]
    free_p = tile_pt(free_p_row)

    R = _rot_rows(q[0], q[1], q[2], q[3])
    pc = [R[i][0] * x[0] + R[i][1] * x[1] + R[i][2] * x[2] + t[i]
          for i in range(3)]
    z = pc[2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    iz = 1.0 / safe_z
    u = jnp.clip(pc[0] * iz, -1e6, 1e6)
    v = jnp.clip(pc[1] * iz, -1e6, 1e6)

    px, py, A2, dk = _head(model_id, k, u, v)
    r0 = px - xy0
    r1 = py - xy1

    s = r0 * r0 + r1 * r1
    w = mask * loss_weight(loss, s, loss_scale)
    sw = jnp.sqrt(w)
    r0, r1 = r0 * sw, r1 * sw

    # A = A2 @ duv/dp_cam ; duv/dp rows: [iz,0,-u iz], [0,iz,-v iz].
    A = [[A2[0][0] * iz, A2[0][1] * iz,
          -(A2[0][0] * u + A2[0][1] * v) * iz],
         [A2[1][0] * iz, A2[1][1] * iz,
          -(A2[1][0] * u + A2[1][1] * v) * iz]]
    # Jx = A @ R (then mask by free_points and sw).
    Jx = [[None] * 3 for _ in range(2)]
    for kk in range(2):
        for j in range(3):
            Jx[kk][j] = (A[kk][0] * R[0][j] + A[kk][1] * R[1][j]
                         + A[kk][2] * R[2][j])
    # Jq = cross(x, Jx_row) rows (= -Jx [x]x).
    Jq = [[Jx[kk][2] * x[1] - Jx[kk][1] * x[2],
           Jx[kk][0] * x[2] - Jx[kk][2] * x[0],
           Jx[kk][1] * x[0] - Jx[kk][0] * x[1]] for kk in range(2)]
    rot_m = free_rot * sw
    tr_m = [free_t[j] * sw for j in range(3)]
    px_m = free_p * sw
    Jc = []   # rows k*6 + i : [Jq | Jt]
    for kk in range(2):
        for i in range(3):
            Jc.append(Jq[kk][i] * rot_m)
        for i in range(3):
            Jc.append(A[kk][i] * tr_m[i])
    Jc = [Jc[kk * 6 + i] for kk in range(2) for i in range(6)]
    Jx_rows = [Jx[kk][j] * px_m for kk in range(2) for j in range(3)]
    Jk_rows = [dk[m][kk] * free_k[m] * sw
               for kk in range(2) for m in range(nparams)]
    return dict(r=[r0, r1], Jc=Jc, Jx=Jx_rows, Jk=Jk_rows, w=w)


def _sym3_inv_rows(h, eps=1e-12):
    """Closed-form inverse of symmetric 3x3 given rows
    (h00,h01,h02,h11,h12,h22) -> same 6-tuple of the inverse."""
    a, b, c, d, e, f = h
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    return (co00 * inv_det, co01 * inv_det, co02 * inv_det,
            co11 * inv_det, co12 * inv_det, co22 * inv_det)


def _chol3_rows(a, eps=1e-20):
    """Closed-form lower Cholesky of symmetric 3x3 rows
    (a00,a01,a02,a11,a12,a22) -> (l00,l10,l20,l11,l21,l22)."""
    a00, a01, a02, a11, a12, a22 = a
    l00 = jnp.sqrt(jnp.maximum(a00, eps))
    l10 = a01 / l00
    l20 = a02 / l00
    l11 = jnp.sqrt(jnp.maximum(a11 - l10 * l10, eps))
    l21 = (a12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l20 * l20 - l21 * l21, eps))
    return (l00, l10, l20, l11, l21, l22)


def _slot_sum(row, K, TP):
    """[1, K*TP] -> [1, TP] sum over the K slot slices."""
    out = row[:, 0:TP]
    for s in range(1, K):
        out = out + row[:, s * TP:(s + 1) * TP]
    return out


def _interleave3(rows, TP):
    """3 rows [1, TP] -> [1, 3*TP] with col j*TP+p = rows[j][p].

    NB: pltpu.repeat has TILE semantics (whole-array copies), so the
    kernel's EL column convention is j-major (col = j*TP + p); any
    consistent column permutation is fine because EL only ever appears
    contracted over its columns (EL EL^T, EL y)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * TP), 1) // TP
    out = None
    for j in range(3):
        rep = pltpu.repeat(rows[j], 3, axis=1)
        term = jnp.where(lane == j, rep, 0.0)
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# Kernel 1: fused linearize + reduce + Schur correction
# ---------------------------------------------------------------------------

def _linearize_and_reduce(model_id, nparams, loss, loss_scale, lay,
                          lam_ref, par_ref, free_ref, pts_ref,
                          freep_ref, obs_sta_ref, obs_img_ref,
                          img_ref, pt_ref, jw_ref, implicit_rows: bool):
    """Shared body of the kernel-1 variants: linearize the block, write
    the per-point and per-obs payloads, accumulate the per-image payload
    into img_ref, and return everything the variant-specific epilogues
    need. With `implicit_rows`, the image payload additionally carries
    the Ey coupling rows and the Jacobi diagonal of EL EL^T (used by the
    matvec-PCG large-N path instead of the materialized Schur
    correction). With lay.ranged, the [Npad, B] one-hot is replaced by
    IB-row sub-block loops over this block's [lo, hi) image range
    (derived in-kernel by _block_range) and `oh` is not returned."""
    TP, K, Npad, C = lay.TP, lay.K, lay.Npad, lay.C
    B = TP * K

    img_row = obs_img_ref[0:1, :]
    if lay.ranged:
        lo, hi = _block_range(img_row, lay.IB)
        oh = None
        g = _gather_rows(par_ref, img_row, lo, hi, lay.IB)
        fr = _gather_rows(free_ref, img_row, lo, hi, lay.IB)
    else:
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (Npad, B), 0)
        oh = (iota_n == img_row).astype(jnp.float32)       # [Npad, B]
        g = jax.lax.dot_general(par_ref[:, :], oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        fr = jax.lax.dot_general(free_ref[:, :], oh,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    xy0 = obs_sta_ref[0:1, :]
    xy1 = obs_sta_ref[1:2, :]
    mask = obs_sta_ref[2:3, :]
    x_rows = [pts_ref[j:j + 1, :] for j in range(3)]
    free_p_row = freep_ref[0:1, :]

    lin = _linearize_block(model_id, nparams, loss, loss_scale,
                           g, fr, x_rows, free_p_row, xy0, xy1, mask,
                           K, TP)
    r, Jc, Jx, Jk = lin["r"], lin["Jc"], lin["Jx"], lin["Jk"]
    lam = lam_ref[0, 0]

    # ---- per-point payload ----
    g_pts = [_slot_sum(Jx[j] * r[0] + Jx[3 + j] * r[1], K, TP)
             for j in range(3)]
    hidx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    Hpp = [_slot_sum(Jx[i] * Jx[j] + Jx[3 + i] * Jx[3 + j], K, TP)
           for (i, j) in hidx]
    hdiag = [Hpp[0], Hpp[3], Hpp[5]]
    d_l = [lam * jnp.clip(h, 1e-6, 1e32) for h in hdiag]
    Hd = (Hpp[0] + d_l[0] + 1e-12, Hpp[1], Hpp[2],
          Hpp[3] + d_l[1] + 1e-12, Hpp[4], Hpp[5] + d_l[2] + 1e-12)
    Hinv = _sym3_inv_rows(Hd)
    Lp = _chol3_rows(Hinv)
    zero_tp = jnp.zeros((1, TP), jnp.float32)
    pt_rows = list(g_pts) + list(hdiag) + list(Hinv) + list(Lp) \
        + [free_p_row]
    while len(pt_rows) < pt_ref.shape[0]:
        pt_rows.append(zero_tp)
    pt_ref[:, :] = jnp.concatenate(pt_rows, axis=0)

    # ---- whitened couplings WL = (Ju^T Jx) @ Lp ----
    LpB = [jnp.concatenate([Lp[i]] * K, axis=1) for i in range(6)]
    lmat = ((LpB[0], None, None), (LpB[1], LpB[3], None),
            (LpB[2], LpB[4], LpB[5]))                       # lower 3x3

    def whiten(Wrow):
        # (W @ Lp)[j] = sum_m W[m] * Lp[m][j] (Lp lower triangular)
        return [Wrow[0] * lmat[0][0] + Wrow[1] * lmat[1][0]
                + Wrow[2] * lmat[2][0],
                Wrow[1] * lmat[1][1] + Wrow[2] * lmat[2][1],
                Wrow[2] * lmat[2][2]]

    WLp = []   # 18 rows: i*3 + j
    for i in range(6):
        Wrow = [Jc[i] * Jx[j] + Jc[6 + i] * Jx[3 + j] for j in range(3)]
        WLp.extend(whiten(Wrow))
    WLc = []   # 3*np rows: m*3 + j
    for m in range(nparams):
        Wrow = [Jk[m] * Jx[j] + Jk[nparams + m] * Jx[3 + j]
                for j in range(3)]
        WLc.extend(whiten(Wrow))

    # ---- per-image payload: one MXU contraction ----
    pay = []
    for i in range(6):
        pay.append(Jc[i] * r[0] + Jc[6 + i] * r[1])        # g_pose
    for i in range(6):
        for j in range(6):
            pay.append(Jc[i] * Jc[j] + Jc[6 + i] * Jc[6 + j])   # Hcc_pose
    for i in range(6):
        for m in range(nparams):
            pay.append(Jc[i] * Jk[m] + Jc[6 + i] * Jk[nparams + m])  # Hpc
    for m in range(nparams):
        pay.append(Jk[m] * r[0] + Jk[nparams + m] * r[1])  # g_cam
    for m in range(nparams):
        for m2 in range(nparams):
            pay.append(Jk[m] * Jk[m2]
                       + Jk[nparams + m] * Jk[nparams + m2])  # Hcc_cam
    # y = Lp^T g_p per point ([1, TP] rows), used by both epilogues.
    y = [lmat[0][0][:, :TP] * g_pts[0] + lmat[1][0][:, :TP] * g_pts[1]
         + lmat[2][0][:, :TP] * g_pts[2],
         lmat[1][1][:, :TP] * g_pts[1] + lmat[2][1][:, :TP] * g_pts[2],
         lmat[2][2][:, :TP] * g_pts[2]]
    if implicit_rows:
        # Ey rows: (EL y)[image rows] = sum_j WL[.,j] * y_tiled[j]; the
        # oh contraction below lands them on the right image. Corr rows:
        # the pose-block of EL EL^T for block-Jacobi PCG — the full 6x6
        # upper triangle when the DI padding has room (lay.BJ), else the
        # diagonal (scalar Jacobi). Cam side stays scalar (cams are few
        # and shared; their coupling is weak after damping).
        yB = [jnp.concatenate([y[j]] * K, axis=1) for j in range(3)]
        for i in range(6):                                  # ey_pose
            pay.append(WLp[i * 3] * yB[0] + WLp[i * 3 + 1] * yB[1]
                       + WLp[i * 3 + 2] * yB[2])
        for m in range(nparams):                            # ey_cam
            pay.append(WLc[m * 3] * yB[0] + WLc[m * 3 + 1] * yB[1]
                       + WLc[m * 3 + 2] * yB[2])
        if lay.BJ:
            for i in range(6):                              # corr_pose tri
                for j in range(i, 6):
                    pay.append(WLp[i * 3] * WLp[j * 3]
                               + WLp[i * 3 + 1] * WLp[j * 3 + 1]
                               + WLp[i * 3 + 2] * WLp[j * 3 + 2])
        else:
            for i in range(6):                              # diag_pose
                pay.append(WLp[i * 3] ** 2 + WLp[i * 3 + 1] ** 2
                           + WLp[i * 3 + 2] ** 2)
        for m in range(nparams):                            # diag_cam
            pay.append(WLc[m * 3] ** 2 + WLc[m * 3 + 1] ** 2
                       + WLc[m * 3 + 2] ** 2)
    zero_b = jnp.zeros((1, B), jnp.float32)
    while len(pay) < lay.DI:
        pay.append(zero_b)
    payload = jnp.concatenate(pay, axis=0)                  # [DI, B]
    if lay.ranged:
        _scatter_accum(img_ref, payload, img_row, lo, hi, lay.IB)
    else:
        img_ref[:, :] += jax.lax.dot_general(
            oh, payload, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [Npad, DI]

    # ---- store per-obs blocks for backsub/matvec/predicted ----
    jw_rows = Jc + Jx + Jk + WLp + WLc
    while len(jw_rows) < lay.JW:
        jw_rows.append(zero_b)
    jw_ref[:, :] = jnp.concatenate(jw_rows, axis=0)

    return dict(oh=oh, WLp=WLp, WLc=WLc, y=y, g_pts=g_pts)


def _fused_schur_kernel(model_id, nparams, loss, loss_scale, lay,
                        schur_bf16,
                        lam_ref, par_ref, free_ref, pts_ref,
                        freep_ref, obs_sta_ref, obs_img_ref, obs_cam_ref,
                        s_ref, img_ref, ey_ref, pt_ref, jw_ref,
                        elb_ref):
    TP, K, Npad, C = lay.TP, lay.K, lay.Npad, lay.C
    B = TP * K
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        s_ref[:, :] = jnp.zeros_like(s_ref)
        img_ref[:, :] = jnp.zeros_like(img_ref)
        ey_ref[:, :] = jnp.zeros_like(ey_ref)

    red = _linearize_and_reduce(
        model_id, nparams, loss, loss_scale, lay,
        lam_ref, par_ref, free_ref, pts_ref, freep_ref,
        obs_sta_ref, obs_img_ref, img_ref, pt_ref, jw_ref,
        implicit_rows=False)
    oh, WLp, WLc, y = red["oh"], red["WLp"], red["WLc"], red["y"]

    # ---- build ELb [Dk, 3*TP] and accumulate the Schur correction ----
    # Row convention (tile semantics of pltpu.repeat): pose row =
    # i*Npad + n, cam row = 6*Npad + m*C + c; column = j*TP + p_local.
    # The epilogue (optim/ba_fused.py) indexes S/Ey/du with the SAME
    # convention. (Two rejected alternatives, both measured SLOWER at
    # bench scale on v5e: a bf16 elb scratch — Mosaic's masked bf16
    # accumulates fall off the fast path — and an MXU "scatter-matmul"
    # construction (oh . WL_ij) @ pmat^T with a 0/1 lane-projection,
    # which does K-fold redundant MXU work: 281 -> 228 it/s.)
    elb_ref[:, :] = jnp.zeros_like(elb_ref)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * TP), 1) // TP
    for s in range(K):
        sl = slice(s * TP, (s + 1) * TP)
        oh_s = oh[:, sl]                                    # [Npad, TP]
        ohrep = pltpu.repeat(pltpu.repeat(oh_s, 6, axis=0), 3, axis=1)
        rows = []
        for i in range(6):
            acc = None
            for j in range(3):
                rep = pltpu.repeat(WLp[i * 3 + j][:, sl], 3, axis=1)
                term = jnp.where(lane3 == j, rep, 0.0)
                acc = term if acc is None else acc + term
            rows.append(acc)
        wlexp = jnp.concatenate(rows, axis=0)               # [6, 3TP]
        wlfull = jnp.broadcast_to(wlexp[:, None], (6, Npad, 3 * TP)) \
            .reshape(6 * Npad, 3 * TP)
        elb_ref[0:6 * Npad, :] += ohrep * wlfull

        cam_row = obs_cam_ref[0:1, sl]
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, TP), 0)
        ohc = (iota_c == cam_row).astype(jnp.float32)       # [C, TP]
        ohcrep = pltpu.repeat(pltpu.repeat(ohc, 12, axis=0), 3, axis=1)
        crows = []
        for m in range(12):
            if m < nparams:
                acc = None
                for j in range(3):
                    rep = pltpu.repeat(WLc[m * 3 + j][:, sl], 3, axis=1)
                    term = jnp.where(lane3 == j, rep, 0.0)
                    acc = term if acc is None else acc + term
                crows.append(acc)
            else:
                crows.append(jnp.zeros((1, 3 * TP), jnp.float32))
        cexp = jnp.concatenate(crows, axis=0)               # [12, 3TP]
        cfull = jnp.broadcast_to(cexp[:, None], (12, C, 3 * TP)) \
            .reshape(12 * C, 3 * TP)
        elb_ref[6 * Npad:6 * Npad + 12 * C, :] += ohcrep * cfull

    elb = elb_ref[:, :]
    elb_mm = elb.astype(jnp.bfloat16) if schur_bf16 else elb
    s_ref[:, :] += jax.lax.dot_general(
        elb_mm, elb_mm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- RHS coupling Ey += ELb @ (Lp^T g_p), y from the shared body ----
    y_int = _interleave3(y, TP)                             # [1, 3TP]
    ey_ref[0:1, :] += jax.lax.dot_general(
        y_int, elb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [1, Dk]


def fused_schur(static: KernelStatic, par, pts, lam, lay: KernelLayout,
                opt, interpret: bool = False):
    """Run kernel 1. Returns (S_corr [Dk,Dk], img_red [Npad,DI],
    ey [1,Dk], pt_pay [24, Pp], jw [JW, O'])."""
    assert not lay.ranged, "dense Schur kernel requires non-ranged layout"
    TP, K, nb = lay.TP, lay.K, lay.nb
    B = TP * K
    nparams = lay.nparams
    kern = functools.partial(
        _fused_schur_kernel, opt.model_id, nparams, opt.loss,
        opt.loss_scale, lay, getattr(opt, "schur_bf16", False))
    PT_ROWS = 24
    grid = (nb,)
    lam_arr = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    out_shapes = (
        jax.ShapeDtypeStruct((lay.Dk, lay.Dk), jnp.float32),
        jax.ShapeDtypeStruct((lay.Npad, lay.DI), jnp.float32),
        jax.ShapeDtypeStruct((8, lay.Dk), jnp.float32),
        jax.ShapeDtypeStruct((PT_ROWS, lay.Pp), jnp.float32),
        jax.ShapeDtypeStruct((lay.JW, lay.Pp * K), jnp.float32),
    )
    const = lambda i: (0, 0)
    blocked = lambda i: (0, i)
    s_corr, img_red, ey, pt_pay, jw = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((par.shape[0], lay.Npad), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((static.free_sta.shape[0], lay.Npad), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((lay.Dk, lay.Dk), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.Npad, lay.DI), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lay.Dk), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_ROWS, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.JW, B), blocked, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((lay.Dk, 3 * TP), jnp.float32)],
        interpret=interpret,
    )(lam_arr, par, static.free_sta, pts, static.free_pts,
      static.obs_sta, static.obs_img, static.obs_cam)
    return s_corr, img_red, ey, pt_pay, jw


# ---------------------------------------------------------------------------
# Kernel 1b (large-N path): linearize + reduce WITHOUT materializing the
# Schur correction. The [Dk, Dk] S of `fused_schur` must stay VMEM-
# resident across grid steps, capping the dense path at 256 images; here
# the image payload instead carries the Ey coupling and the Jacobi
# diagonal of EL EL^T, and the reduced system is solved by PCG whose
# matvec is `schur_matvec` below (re-reading the stored per-obs blocks).
# ---------------------------------------------------------------------------

def _fused_reduce_kernel(model_id, nparams, loss, loss_scale, lay,
                         lam_ref, par_ref, free_ref, pts_ref,
                         freep_ref, obs_sta_ref, obs_img_ref,
                         img_ref, pt_ref, jw_ref, jcorr_ref):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        img_ref[:, :] = jnp.zeros_like(img_ref)

    lin = _linearize_and_reduce(
        model_id, nparams, loss, loss_scale, lay,
        lam_ref, par_ref, free_ref, pts_ref, freep_ref,
        obs_sta_ref, obs_img_ref, img_ref, pt_ref, jw_ref,
        implicit_rows=True)

    # Slim correction-coupling store for the PCG matvec: only the
    # whitened couplings WLp (18) + WLc (3*np), in bf16. The matvec
    # streams this per CG iteration instead of the full f32 jw — the
    # large-N solve is HBM-bound on exactly this read.
    rows = lin["WLp"] + lin["WLc"]
    zero_b = jnp.zeros((1, rows[0].shape[1]), jnp.float32)
    while len(rows) < lay.JCW:
        rows.append(zero_b)
    jcorr_ref[:, :] = jnp.concatenate(rows, axis=0).astype(jcorr_ref.dtype)


def fused_reduce(static: KernelStatic, par, pts, lam, lay: KernelLayout,
                 opt, interpret: bool = False):
    """Run kernel 1b. Returns (img_red [Npad, DI], pt_pay [24, Pp],
    jw [JW, O']). img_red's extra rows (beyond the dense-kernel layout):
    ey_pose(6), ey_cam(np), diag_pose(6), diag_cam(np) — these fit in
    the 128-padded DI for every camera model (max base use is 270/384
    for FULL_OPENCV)."""
    TP, K, nb = lay.TP, lay.K, lay.nb
    B = TP * K
    base = 6 + 36 + 6 * lay.nparams + lay.nparams + lay.nparams ** 2
    extra = 27 if lay.BJ else 12
    assert base + extra + 2 * lay.nparams <= lay.DI, (base, lay.DI)
    kern = functools.partial(
        _fused_reduce_kernel, opt.model_id, lay.nparams, opt.loss,
        opt.loss_scale, lay)
    PT_ROWS = 24
    lam_arr = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    const = lambda i: (0, 0)
    blocked = lambda i: (0, i)
    # bf16 couplings win only in the ranged regime (Npad >= 2048), where
    # the matvec is HBM-bound on this read (4096 img: 24.6 -> 28.1 it/s);
    # below that the one-hot MXU contractions dominate and the cast
    # overhead loses (1024 img: 114 -> 99 it/s). Measured v5e 2026-08-21.
    corr_dtype = jnp.bfloat16 if (
        getattr(opt, "matvec_bf16", True) and lay.ranged) else jnp.float32
    img_red, pt_pay, jw, jcorr = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((par.shape[0], lay.Npad), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((static.free_sta.shape[0], lay.Npad), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((lay.Npad, lay.DI), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_ROWS, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.JW, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.JCW, B), blocked, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((lay.Npad, lay.DI), jnp.float32),
            jax.ShapeDtypeStruct((PT_ROWS, lay.Pp), jnp.float32),
            jax.ShapeDtypeStruct((lay.JW, lay.Pp * K), jnp.float32),
            jax.ShapeDtypeStruct((lay.JCW, lay.Pp * K), corr_dtype),
        ),
        interpret=interpret,
    )(lam_arr, par, static.free_sta, pts, static.free_pts,
      static.obs_sta, static.obs_img)
    return img_red, pt_pay, jw, jcorr


def _schur_matvec_kernel(nparams, lay,
                         dup_ref, duc_ref, jcorr_ref,
                         obs_img_ref, obs_cam_ref,
                         out_ref):
    """Correction matvec: out[image rows] += EL (EL^T p) for this
    block's points. p arrives as (du_pose [6, Npad], du_cam [12, C]);
    out is [Npad, 6+np] (cam part segment-summed by image_cam in the
    epilogue — every image has exactly one camera).

    Reads the slim `jcorr` store (WLp+WLc rows only, usually bf16) —
    NOT the full jw — because at large N this read IS the LM iteration:
    ~60 CG matvecs each stream every observation's couplings from HBM.
    bf16 EL keeps the operator symmetric PSD (same rounded EL on both
    sides of EL ELᵀ), so PCG is solving an exactly-SPD nearby system —
    sound inexact-Newton; the trial cost that accepts/rejects the step
    stays f32."""
    TP, K, Npad, C = lay.TP, lay.K, lay.Npad, lay.C
    B = TP * K
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    img_row = obs_img_ref[0:1, :]
    if lay.ranged:
        lo, hi = _block_range(img_row, lay.IB)
        oh = None
        du_p = _gather_rows(dup_ref, img_row, lo, hi, lay.IB)  # [6, B]
    else:
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (Npad, B), 0)
        oh = (iota_n == img_row).astype(jnp.float32)
        du_p = jax.lax.dot_general(
            dup_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [6, B]
    cam_row = obs_cam_ref[0:1, :]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)
    ohc = (iota_c == cam_row).astype(jnp.float32)
    du_c = jax.lax.dot_general(duc_ref[:, :], ohc, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [12,B]

    jc = jcorr_ref[:, :].astype(jnp.float32)
    WLp = [jc[i:i + 1, :] for i in range(18)]
    WLc = [jc[18 + i:19 + i, :] for i in range(3 * nparams)]
    dup = [du_p[i:i + 1, :] for i in range(6)]
    duc = [du_c[m:m + 1, :] for m in range(12)]

    # etu[j] = (EL^T p)[point col j] (identical to backsub).
    etu = []
    for j in range(3):
        a = None
        for i in range(6):
            t = WLp[i * 3 + j] * dup[i]
            a = t if a is None else a + t
        for m in range(nparams):
            a = a + WLc[m * 3 + j] * duc[m]
        etu.append(_slot_sum(a, K, TP))                     # [1, TP]
    etuB = [jnp.concatenate([etu[j]] * K, axis=1) for j in range(3)]

    pay = []
    for i in range(6):
        pay.append(WLp[i * 3] * etuB[0] + WLp[i * 3 + 1] * etuB[1]
                   + WLp[i * 3 + 2] * etuB[2])
    for m in range(nparams):
        pay.append(WLc[m * 3] * etuB[0] + WLc[m * 3 + 1] * etuB[1]
                   + WLc[m * 3 + 2] * etuB[2])
    zero_b = jnp.zeros((1, B), jnp.float32)
    while len(pay) < out_ref.shape[1]:
        pay.append(zero_b)
    payload = jnp.concatenate(pay, axis=0)                  # [<=128, B]
    if lay.ranged:
        _scatter_accum(out_ref, payload, img_row, lo, hi, lay.IB)
    else:
        out_ref[:, :] += jax.lax.dot_general(
            oh, payload, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def schur_matvec(static: KernelStatic, du_pose_t, du_cam_t, jcorr,
                 lay: KernelLayout, opt, interpret: bool = False):
    """Correction matvec over one bucket. Returns [Npad, DV] with
    DV = round_up(6 + np, 128); rows: corr_pose(6), corr_cam(np).
    `jcorr`: the slim (bf16) coupling store from fused_reduce."""
    TP, K, nb = lay.TP, lay.K, lay.nb
    B = TP * K
    DV = _round_up(6 + lay.nparams, 128)
    kern = functools.partial(_schur_matvec_kernel, lay.nparams, lay)
    const = lambda i: (0, 0)
    blocked = lambda i: (0, i)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, lay.Npad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((12, lay.C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.JCW, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lay.Npad, DV), const,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lay.Npad, DV), jnp.float32),
        interpret=interpret,
    )(du_pose_t, du_cam_t, jcorr, static.obs_img, static.obs_cam)
    return out


# ---------------------------------------------------------------------------
# Kernel 2: back-substitution + predicted-reduction sums
# ---------------------------------------------------------------------------

def _backsub_kernel(nparams, lay,
                    lam_ref, dup_ref, duc_ref, pt_ref, jw_ref,
                    obs_img_ref, obs_cam_ref,
                    dp_ref, acc_ref):
    TP, K, Npad, C = lay.TP, lay.K, lay.Npad, lay.C
    B = TP * K
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    img_row = obs_img_ref[0:1, :]
    if lay.ranged:
        lo, hi = _block_range(img_row, lay.IB)
        du_p = _gather_rows(dup_ref, img_row, lo, hi, lay.IB)  # [6, B]
    else:
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (Npad, B), 0)
        oh = (iota_n == img_row).astype(jnp.float32)
        du_p = jax.lax.dot_general(
            dup_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [6, B]
    cam_row = obs_cam_ref[0:1, :]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)
    ohc = (iota_c == cam_row).astype(jnp.float32)
    du_c = jax.lax.dot_general(duc_ref[:, :], ohc, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [12,B]

    jw = jw_ref
    Jc = [jw[i:i + 1, :] for i in range(12)]
    Jx = [jw[12 + i:13 + i, :] for i in range(6)]
    Jk = [jw[18 + i:19 + i, :] for i in range(2 * nparams)]
    o = 18 + 2 * nparams
    WLp = [jw[o + i:o + i + 1, :] for i in range(18)]
    o += 18
    WLc = [jw[o + i:o + i + 1, :] for i in range(3 * nparams)]

    dup = [du_p[i:i + 1, :] for i in range(6)]
    duc = [du_c[m:m + 1, :] for m in range(12)]

    # etu[j] = sum_i WLp[i,j] du_pose[i] + sum_m WLc[m,j] du_cam[m]
    etu = []
    for j in range(3):
        a = None
        for i in range(6):
            t = WLp[i * 3 + j] * dup[i]
            a = t if a is None else a + t
        for m in range(nparams):
            a = a + WLc[m * 3 + j] * duc[m]
        etu.append(_slot_sum(a, K, TP))                     # [1, TP]

    g = [pt_ref[j:j + 1, :] for j in range(3)]
    hdiag = [pt_ref[3 + j:4 + j, :] for j in range(3)]
    hi = [pt_ref[6 + j:7 + j, :] for j in range(6)]         # sym inv
    lp = [pt_ref[12 + j:13 + j, :] for j in range(6)]       # lower chol
    free_p = pt_ref[18:19, :]
    him = ((hi[0], hi[1], hi[2]), (hi[1], hi[3], hi[4]),
           (hi[2], hi[4], hi[5]))
    lpm = ((lp[0], None, None), (lp[1], lp[3], None),
           (lp[2], lp[4], lp[5]))

    dp = []
    for j in range(3):
        a = -(him[j][0] * g[0] + him[j][1] * g[1] + him[j][2] * g[2])
        for i in range(j + 1):
            a = a - lpm[j][i] * etu[i]
        dp.append(a * free_p)
    dp_rows = list(dp)
    zero_tp = jnp.zeros((1, TP), jnp.float32)
    while len(dp_rows) < dp_ref.shape[0]:
        dp_rows.append(zero_tp)
    dp_ref[:, :] = jnp.concatenate(dp_rows, axis=0)

    dpB = [jnp.concatenate([dp[j]] * K, axis=1) for j in range(3)]
    lam = lam_ref[0, 0]
    t2 = jnp.zeros((1, 1), jnp.float32)
    for kk in range(2):
        t = None
        for i in range(6):
            term = Jc[kk * 6 + i] * dup[i]
            t = term if t is None else t + term
        for m in range(nparams):
            t = t + Jk[kk * nparams + m] * duc[m]
        for j in range(3):
            t = t + Jx[kk * 3 + j] * dpB[j]
        t2 = t2 + jnp.sum(t * t).reshape(1, 1)
    g_dp = sum(jnp.sum(g[j] * dp[j]) for j in range(3)).reshape(1, 1)
    d_dp2 = sum(jnp.sum(lam * jnp.clip(hdiag[j], 1e-6, 1e32)
                        * dp[j] * dp[j]) for j in range(3)).reshape(1, 1)
    acc_ref[0:1, 0:1] += t2
    acc_ref[1:2, 0:1] += g_dp
    acc_ref[2:3, 0:1] += d_dp2


def backsub(static: KernelStatic, du_pose_t, du_cam_t, pt_pay, jw, lam,
            lay: KernelLayout, opt, interpret: bool = False):
    """Run kernel 2. Returns (dp [8, Pp], acc [8, 128])."""
    TP, K, nb = lay.TP, lay.K, lay.nb
    B = TP * K
    kern = functools.partial(_backsub_kernel, lay.nparams, lay)
    lam_arr = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    const = lambda i: (0, 0)
    blocked = lambda i: (0, i)
    dp, acc = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((6, lay.Npad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((12, lay.C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((24, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.JW, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, lay.Pp), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(lam_arr, du_pose_t, du_cam_t, pt_pay, jw,
      static.obs_img, static.obs_cam)
    return dp, acc


# ---------------------------------------------------------------------------
# Kernel 3: robust cost at (trial) parameters
# ---------------------------------------------------------------------------

def _cost_kernel(model_id, nparams, loss, loss_scale, lay,
                 par_ref, pts_ref, obs_sta_ref, obs_img_ref,
                 acc_ref):
    TP, K, Npad = lay.TP, lay.K, lay.Npad
    B = TP * K
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    img_row = obs_img_ref[0:1, :]
    if lay.ranged:
        lo, hi = _block_range(img_row, lay.IB)
        g = _gather_rows(par_ref, img_row, lo, hi, lay.IB)
    else:
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (Npad, B), 0)
        oh = (iota_n == img_row).astype(jnp.float32)
        g = jax.lax.dot_general(par_ref[:, :], oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    q = [g[i:i + 1, :] for i in range(4)]
    t = [g[4 + i:5 + i, :] for i in range(3)]
    k = [g[7 + i:8 + i, :] for i in range(nparams)]

    def tile_pt(row):
        return jnp.concatenate([row] * K, axis=1)

    x = [tile_pt(pts_ref[j:j + 1, :]) for j in range(3)]
    R = _rot_rows(q[0], q[1], q[2], q[3])
    pc = [R[i][0] * x[0] + R[i][1] * x[1] + R[i][2] * x[2] + t[i]
          for i in range(3)]
    z = pc[2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    iz = 1.0 / safe_z
    u = jnp.clip(pc[0] * iz, -1e6, 1e6)
    v = jnp.clip(pc[1] * iz, -1e6, 1e6)
    px, py, _, _ = _head(model_id, k, u, v)
    r0 = px - obs_sta_ref[0:1, :]
    r1 = py - obs_sta_ref[1:2, :]
    s = r0 * r0 + r1 * r1
    c = 0.5 * obs_sta_ref[2:3, :] * loss_value(loss, s, loss_scale)
    acc_ref[0:1, 0:1] += jnp.sum(c).reshape(1, 1)


def fused_cost(static: KernelStatic, par, pts, lay: KernelLayout, opt,
               interpret: bool = False):
    TP, K, nb = lay.TP, lay.K, lay.nb
    B = TP * K
    kern = functools.partial(_cost_kernel, opt.model_id, lay.nparams,
                             opt.loss, opt.loss_scale, lay)
    const = lambda i: (0, 0)
    blocked = lambda i: (0, i)
    acc = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((par.shape[0], lay.Npad), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TP), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), blocked, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), const, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(par, pts, static.obs_sta, static.obs_img)
    return acc[0, 0]
