"""PatchMatch multi-view stereo as dense checkerboard sweeps on device.

Capability parity with ref: src/mvs/patch_match.{h,cc} (`PatchMatch`,
`PatchMatchController` patch_match.h:177,251) and the CUDA kernels in
src/mvs/patch_match_cuda.cu (:765-858 `InitNormalMap`, `ComputeInitialCost`,
`SweepFromTopToBottom`, random init/refinement, bilateral-NCC window cost,
geometric consistency).

TPU redesign. The reference sweeps rows sequentially (row k+1 depends on
row k within one kernel launch) — efficient on CUDA's per-thread model,
hostile to XLA. Here one iteration is a RED-BLACK CHECKERBOARD update
(the classic jump-flood variant of PatchMatch, used by many GPU
implementations): every red pixel simultaneously tests the hypotheses of
its 4 black neighbors + K random perturbations, then black does the same —
all candidates for all pixels evaluated as ONE batched gather+reduce
program. Convergence needs a few more iterations than sequential sweeps
(information travels 1 px/update instead of a full row), but each
iteration is a single fused device program with zero serial dependencies,
which is the right trade for the MXU/VPU. Plane hypotheses propagate via
the full plane-induced homography (ref cost: bilateral-weighted NCC).

All arrays static-shaped; `vmap` over reference images batches the whole
controller's per-GPU task loop (ref: patch_match.cc:213-221).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class PatchMatchOptions:
    """Mirrors ref: mvs/patch_match.h:52 Options (subset meaningful to the
    TPU kernel; GPU indices & cache sizes are obsolete)."""

    depth_min: float = 0.1
    depth_max: float = 100.0
    window_radius: int = 3
    window_step: int = 1
    sigma_color: float = 0.2       # bilateral weight (intensity in [0,1])
    sigma_spatial: float = 3.0
    num_iterations: int = 8
    num_random_samples: int = 2    # random refinements per iteration
    ncc_sigma: float = 0.6
    min_triangulation_angle: float = 1.0   # deg (unused in kernel; fusion)
    incident_angle_sigma: float = 0.9
    geom_consistency: bool = True   # (ref default; needs src_depths)
    geom_consistency_regularizer: float = 0.3
    geom_consistency_max_cost: float = 3.0
    filter: bool = True
    filter_min_ncc: float = 0.1
    filter_min_num_consistent: int = 2
    filter_geom_consistency_max_cost: float = 1.0


class PatchMatchResult(NamedTuple):
    depth: jnp.ndarray    # [H, W]
    normal: jnp.ndarray   # [H, W, 3] (camera frame, unit, z<0 facing cam)
    cost: jnp.ndarray     # [H, W] best matching cost (1 - NCC in [0, 2])


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------


def _plane_homographies(K_ref_inv, K_src, R, t, depth, normal, xy):
    """Warp points: for pixel xy (ref), plane (depth, normal) in ref cam
    frame, compute source-pixel position of ref pixel offsets.

    Returns the 3x3 homography H = K_src (R + t n^T / (n·X)) K_ref^-1
    evaluated lazily — here we return the matrix per pixel. Shapes:
    depth [...], normal [..., 3], xy [..., 2] -> H [..., 3, 3].
    """
    # Point on plane: X = depth * K_ref_inv @ (x, y, 1).
    ones = jnp.ones_like(xy[..., :1])
    xh = jnp.concatenate([xy, ones], -1)
    ray = jnp.einsum("ij,...j->...i", K_ref_inv, xh)
    X = depth[..., None] * ray
    d_plane = jnp.sum(normal * X, -1)  # n·X (plane offset along n)
    # x_src ~ K_src (R X + t) with X = (n·X / n·ray) ray
    # => H = K_src (R + t n^T / (n·X)) K_ref_inv.
    tn = t[..., :, None] * normal[..., None, :]  # [..., 3, 3]
    M = R + tn / jnp.where(jnp.abs(d_plane) > 1e-9, d_plane,
                           1e-9)[..., None, None]
    return jnp.einsum("ij,...jk,kl->...il", K_src, M, K_ref_inv)


def _bilinear(img, xy):
    """Sample [H, W] at xy [..., 2] (pixel-center origin 0.5); out-of-
    bounds -> nan marker handled by caller via mask."""
    H, W = img.shape
    x = xy[..., 0] - 0.5
    y = xy[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(-1)
    rowsel = flat.shape[0] % 128 == 0
    if rowsel:
        t2 = flat.reshape(-1, 128)

    def tap(yi, xi, w):
        # Flat 1-D take: multi-dim advanced indexing lowers to slow (or
        # under vmap catastrophic) gathers on TPU. When the image tiles
        # evenly, use the row-gather + one-hot lane select pattern (6.2
        # vs 11.8 ns/elem; see ops/interpolation._take_u32_rowsel) with
        # an optimization_barrier per tap stream.
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        fi = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        if rowsel:
            fi = jax.lax.optimization_barrier(fi)
            rows = jnp.take(t2, fi // 128, axis=0)
            lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape,
                                            rows.ndim - 1)
            v = jnp.where(lane == (fi % 128)[..., None], rows,
                          jnp.zeros_like(rows)).sum(axis=-1)
        else:
            v = jnp.take(flat, fi)
        return jnp.where(ok, v, 0.0) * w, ok & (w > 0)

    v00, m00 = tap(y0i, x0i, (1 - fy) * (1 - fx))
    v01, m01 = tap(y0i, x0i + 1, (1 - fy) * fx)
    v10, m10 = tap(y0i + 1, x0i, fy * (1 - fx))
    v11, m11 = tap(y0i + 1, x0i + 1, fy * fx)
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return v00 + v01 + v10 + v11, inb


# ---------------------------------------------------------------------------
# cost: bilateral-weighted NCC over the window
# ---------------------------------------------------------------------------


def _pack_intensity_nbhd(img):
    """[H, W] f32 intensities in [0, 1] -> flat [H*W] u32 holding the
    2x2 bilinear patch as 4 x u8 (edge-clamped), SBA-style joint
    packing (ops/interpolation.py): ONE gather then yields the whole
    bilinear sample instead of 4 barrier-separated taps. Source images
    are natively 8-bit, so u8 quantization loses nothing real."""
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint32)
    r = jnp.pad(u8, ((0, 1), (0, 1)), mode="edge")
    return (r[:-1, :-1] | (r[:-1, 1:] << 8) | (r[1:, :-1] << 16)
            | (r[1:, 1:] << 24)).reshape(-1)


def _bilinear_packed(flat_u32, H, W, xy):
    """Packed-patch counterpart of `_bilinear`: one rowsel gather per
    sample. Returns (v in [0, 1], inb)."""
    x = xy[..., 0] - 0.5
    y = xy[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    fi = y0c * W + x0c
    if flat_u32.shape[0] % 128 == 0:
        t2 = flat_u32.reshape(-1, 128)
        rows = jnp.take(t2, fi // 128, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape,
                                        rows.ndim - 1)
        u = jnp.where(lane == (fi % 128)[..., None], rows,
                      jnp.zeros_like(rows)).sum(axis=-1)
    else:
        u = jnp.take(flat_u32, fi)
    v00 = (u & 0xFF).astype(jnp.float32)
    v01 = ((u >> 8) & 0xFF).astype(jnp.float32)
    v10 = ((u >> 16) & 0xFF).astype(jnp.float32)
    v11 = ((u >> 24) & 0xFF).astype(jnp.float32)
    v = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
         + fy * ((1 - fx) * v10 + fx * v11)) * (1.0 / 255.0)
    return jnp.where(inb, v, 0.0), inb


def _window_offsets(radius: int, step: int) -> np.ndarray:
    """Static (trace-time) window offsets — numpy so `int()` works under
    jit tracing."""
    r = np.arange(-radius, radius + 1, step)
    oy, ox = np.meshgrid(r, r, indexing="ij")
    return np.stack([ox.reshape(-1), oy.reshape(-1)], -1)  # [K, 2] (dx, dy)


def _geom_costs(depth, K_ref, K_ref_inv, K_srcs, Rs, ts, src_depths,
                max_cost):
    """Forward-backward reprojection error per source [S, H, W]
    (ref: patch_match_cuda.cu:534-585 ComputeGeomConsistencyCost):
    ref pixel -> world at `depth` -> src pixel -> src depth map ->
    world -> back into ref; cost = pixel distance, capped at max_cost;
    missing src depth = max_cost."""
    H, W = depth.shape
    dtype = depth.dtype
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=dtype) + 0.5,
                          jnp.arange(W, dtype=dtype) + 0.5, indexing="ij")
    ones = jnp.ones_like(xx)
    ray = jnp.einsum("ij,hwj->hwi", K_ref_inv,
                     jnp.stack([xx, yy, ones], -1))       # [H, W, 3]
    p_ref = depth[..., None] * ray

    costs = []
    for s in range(src_depths.shape[0]):
        p_src = jnp.einsum("ij,hwj->hwi", Rs[s], p_ref) + ts[s]
        z = p_src[..., 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        uv = jnp.einsum("ij,hwj->hwi", K_srcs[s], p_src / safe_z[..., None])
        src_xy = uv[..., :2]
        src_d, inb = _bilinear(src_depths[s], src_xy)
        ok = inb & (src_d > 1e-9) & (z > 0)
        # Back-project the sampled source depth into the reference.
        Ks_inv = jnp.linalg.inv(K_srcs[s])
        p_src2 = src_d[..., None] * jnp.einsum(
            "ij,hwj->hwi", Ks_inv,
            jnp.concatenate([src_xy, jnp.ones_like(src_xy[..., :1])], -1))
        p_ref2 = jnp.einsum("ji,hwj->hwi", Rs[s], p_src2 - ts[s])
        z2 = p_ref2[..., 2]
        safe_z2 = jnp.where(jnp.abs(z2) > 1e-9, z2, 1e-9)
        uv2 = jnp.einsum("ij,hwj->hwi", K_ref,
                         p_ref2 / safe_z2[..., None])[..., :2]
        err = jnp.sqrt((uv2[..., 0] - xx) ** 2 + (uv2[..., 1] - yy) ** 2)
        costs.append(jnp.where(ok, jnp.minimum(err, max_cost), max_cost))
    return jnp.stack(costs)


# --- fused bilateral-NCC Pallas kernel (round 5) ---------------------------
# The r4 cost-volume formulation accumulated the 3 source-side moments
# over K=49 rolled copies of [H, W] arrays with the bilateral weights
# CACHED as 2K hypothesis-independent [H, W] planes — ~120 MB of HBM
# streamed per hypothesis per view at 640x480 (BASELINE.md r4 names this
# the remaining bottleneck). The kernel holds the padded reference and
# warped source IN VMEM and computes weights + all moments + NCC in one
# pass: HBM traffic drops to read(ref, v, masks) + write(cost) —
# ~25 MB -> ~5 reads/writes of [H, W]. Ref-side moments are recomputed
# per call (the VPU is idle-dominated; the reads are already resident).


_NCC_BLOCK_ROWS = 32


def _ncc_kernel_call(ref_pad, v_pad, bnd_pad, inb_pad, offs_np, w_sp_np,
                     sigma_color, H, W, r, interpret=False):
    """cost [H, W] = 1 - bilateral NCC, windows >half outside source
    get max cost 2.0. Inputs are edge-padded by `r` (zeros), bnd/inb
    are f32 validity planes (image bounds / source projection).

    Grid over row blocks: the fully-unrolled 49-tap loop keeps ~270
    temporaries live on the Mosaic VMEM stack (83 MB at 240x320 whole-
    frame, >16 MB scoped limit), so inputs are restacked into
    OVERLAPPING [nb, bh+2r, W+2r] row blocks in XLA (~2r/bh duplicated
    rows) and each grid step works on one small block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wsp_sum = float(w_sp_np.sum())
    inv2sc2 = 1.0 / (2.0 * float(sigma_color) ** 2)
    bh = _NCC_BLOCK_ROWS
    nb = -(-H // bh)
    Wp = W + 2 * r

    def overlap(a):
        a = jnp.pad(a, ((0, nb * bh - H), (0, 0)))
        return jnp.stack([jax.lax.dynamic_slice(
            a, (i * bh, 0), (bh + 2 * r, Wp)) for i in range(nb)])

    ins = [overlap(a) for a in (ref_pad, v_pad, bnd_pad, inb_pad)]

    def kernel(ref_ref, v_ref, bnd_ref, inb_ref, cost_ref):
        refc = ref_ref[0, r:r + bh, r:r + W]
        SW = jnp.zeros((bh, W), jnp.float32)
        SR = jnp.zeros((bh, W), jnp.float32)
        SRR = jnp.zeros((bh, W), jnp.float32)
        SV = jnp.zeros((bh, W), jnp.float32)
        SVV = jnp.zeros((bh, W), jnp.float32)
        SRV = jnp.zeros((bh, W), jnp.float32)
        FIN = jnp.zeros((bh, W), jnp.float32)
        for k in range(offs_np.shape[0]):
            dx = int(offs_np[k, 0])
            dy = int(offs_np[k, 1])
            wsp = float(w_sp_np[k])
            y0 = r + dy
            x0 = r + dx
            r_k = ref_ref[0, y0:y0 + bh, x0:x0 + W]
            v_k = v_ref[0, y0:y0 + bh, x0:x0 + W]
            b_k = bnd_ref[0, y0:y0 + bh, x0:x0 + W]
            i_k = inb_ref[0, y0:y0 + bh, x0:x0 + W]
            d = r_k - refc
            w = (wsp * b_k) * jnp.exp(-(d * d) * inv2sc2)
            wv = w * v_k
            wr = w * r_k
            SW += w
            SR += wr
            SRR += wr * r_k
            SV += wv
            SVV += wv * v_k
            SRV += wr * v_k
            FIN += wsp * i_k
        wsum = jnp.maximum(SW, 1e-9)
        mr = SR / wsum
        vr = SRR / wsum - mr * mr
        ms = SV / wsum
        vs = SVV / wsum - ms * ms
        cov = SRV / wsum - mr * ms
        ncc = cov * jax.lax.rsqrt(jnp.maximum(vr * vs, 1e-10))
        cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
        cost_ref[0] = jnp.where(FIN > 0.5 * wsp_sum, cost, 2.0)

    blk = bh + 2 * r
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nb, bh, W), jnp.float32),
        in_specs=[pl.BlockSpec((1, blk, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, bh, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*ins)
    return out.reshape(nb * bh, W)[:H]


def _use_ncc_kernel(H, W, r):
    """Pallas path gate: TPU platform + everything VMEM-resident
    (4 padded inputs + ~8 accumulator planes, f32)."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    if platform not in ("tpu", "axon"):
        return False
    return 12 * (H + 2 * r) * (W + 2 * r) * 4 < 12 * 1024 * 1024


def _cost_for_hypothesis(ref_img, src_imgs, K_ref_inv, K_srcs, Rs, ts,
                         depth, normal, opt: PatchMatchOptions,
                         K_ref=None, src_depths=None, src_packed=None):
    """Matching cost [H, W] of plane hypotheses (depth [H,W],
    normal [H,W,3]) against all sources, averaged over the best views.

    Bilateral-weighted NCC per window (ref: patch_match_cuda.cu
    ComputeNCCCostsOfPixelWindow); cost = 1 - NCC in [0, 2].

    TPU redesign (cost-volume filtering): the reference's CUDA kernel
    re-samples the source at every window tap through the CENTER
    pixel's homography — ~200 texture fetches per pixel per view,
    essentially free on a GPU texture unit but ~400 gather descriptors
    per pixel on TPU (measured 0.012 Mpix/s, ~1000x below target).
    Instead each pixel is warped ONCE through its OWN hypothesis,
    and the window NCC moments are accumulated over STATIC SHIFTS of
    the warped image — plain VPU rolls, no gathers. On coplanar
    neighborhoods (what propagation converges to) the two formulations
    agree exactly; at depth edges the bilateral color weights suppress
    the difference.

    Two further algebraic reductions keep the per-hypothesis work to
    the minimum the formulation admits:

    - The plane-induced homography of a pixel through a plane anchored
      at its OWN backprojection collapses exactly: with X = d K^-1 xh
      on the plane, H xh = (K_s R K^-1) xh + K_s t (n.ray)/(n.X)
      = A xh + b / d — the normal cancels. So the warp is one FMA
      `d * Axh + b` with A xh precomputed per view, not a per-pixel
      3x3 homography build + matvec. (Normals still steer the search:
      propagation evaluates the NEIGHBOR's plane at the pixel, see
      `patch_match_stereo`.)
    - The bilateral weights and the three reference-side moments
      (sum w, sum w*ref, sum w*ref^2) depend only on the reference
      image, not on the hypothesis or view; they are expressed as
      hypothesis-independent subgraphs that XLA CSE evaluates once per
      compiled program, however many candidate evaluations reference
      them. Per hypothesis per view only the three source-side moment
      streams (sum w*v, w*v^2, w*ref*v) accumulate over the window
      shifts, and the in-bounds fraction uses the spatial-only weights,
      which are a separable Gaussian (two 1-D passes).

    Out-of-source window taps contribute v = 0 with full weight (the
    reference drops them): this biases NCC toward 0 — i.e. HIGHER cost
    — for partially-visible windows, and windows more than half
    outside are hard-gated to max cost as before. Validated by the
    slanted-plane recovery test and the depth-RMSE-vs-rendered-GT test
    (tests/test_mvs.py).
    """
    H, W = ref_img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=ref_img.dtype) + 0.5,
                          jnp.arange(W, dtype=ref_img.dtype) + 0.5,
                          indexing="ij")
    xh = jnp.stack([xx, yy, jnp.ones_like(xx)], -1)  # [H, W, 3]

    offs_np = _window_offsets(opt.window_radius, opt.window_step)
    w_sp_np = np.exp(-(offs_np[:, 0] ** 2 + offs_np[:, 1] ** 2)
                     / (2 * opt.sigma_spatial ** 2))
    K = offs_np.shape[0]
    r1d = np.arange(-opt.window_radius, opt.window_radius + 1,
                    opt.window_step)
    w1d = np.exp(-(r1d ** 2) / (2 * opt.sigma_spatial ** 2))

    def roll2(a, dy, dx):
        return jnp.roll(jnp.roll(a, -dy, 0), -dx, 1)

    # Static in-bounds masks per shift (wrap-around rows/cols invalid).
    iy = jnp.arange(H)
    ix = jnp.arange(W)

    def shift_valid(dy, dx):
        vy = (iy + dy >= 0) & (iy + dy < H)
        vx = (ix + dx >= 0) & (ix + dx < W)
        return vy[:, None] & vx[None, :]

    def sep_spatial(a):
        """Separable spatial-Gaussian window sum with zero fill."""
        rows = jnp.zeros_like(a)
        for i, dy in enumerate(r1d):
            sh = jnp.roll(a, -int(dy), 0)
            vy = (iy + int(dy) >= 0) & (iy + int(dy) < H)
            rows = rows + w1d[i] * jnp.where(vy[:, None], sh, 0.0)
        out = jnp.zeros_like(a)
        for i, dx in enumerate(r1d):
            sh = jnp.roll(rows, -int(dx), 1)
            vx = (ix + int(dx) >= 0) & (ix + int(dx) < W)
            out = out + w1d[i] * jnp.where(vx[None, :], sh, 0.0)
        return out

    use_kernel = _use_ncc_kernel(H, W, opt.window_radius)
    rpad = opt.window_radius
    if use_kernel:
        ref_pad = jnp.pad(ref_img.astype(jnp.float32),
                          ((rpad, rpad), (rpad, rpad)))
        bnd_pad = jnp.pad(jnp.ones((H, W), jnp.float32),
                          ((rpad, rpad), (rpad, rpad)))
    else:
        # XLA fallback (CPU tests / large frames): reference-side
        # bilateral weights + moments are hypothesis- and
        # view-independent (XLA CSE shares them across candidate evals).
        w_pre = []
        SW = jnp.zeros_like(ref_img)
        SR = jnp.zeros_like(ref_img)
        SRR = jnp.zeros_like(ref_img)
        for k in range(K):
            dx = int(offs_np[k, 0])
            dy = int(offs_np[k, 1])
            r_k = roll2(ref_img, dy, dx)
            w = w_sp_np[k] * jnp.exp(
                -((r_k - ref_img) ** 2) / (2 * opt.sigma_color ** 2))
            w = jnp.where(shift_valid(dy, dx), w, 0.0)
            w_pre.append((w, w * r_k))
            SW = SW + w
            SR = SR + w * r_k
            SRR = SRR + (w * r_k) * r_k
        wsum = jnp.maximum(SW, 1e-9)
        mr = SR / wsum
        vr = SRR / wsum - mr * mr

    costs = []
    for s in range(len(src_imgs)):
        A = K_srcs[s] @ Rs[s] @ K_ref_inv
        Axh = jnp.einsum("ij,hwj->hwi", A, xh)   # hyp-independent
        b = K_srcs[s] @ ts[s]
        wh = depth[..., None] * Axh + b
        src_xy = wh[..., :2] / jnp.where(
            jnp.abs(wh[..., 2:]) > 1e-9, wh[..., 2:], 1e-9)
        if src_packed is not None:
            Hs, Ws = src_imgs[s].shape
            v, inb = _bilinear_packed(src_packed[s], Hs, Ws, src_xy)
            v = v.astype(ref_img.dtype)
        else:
            v, inb = _bilinear(src_imgs[s], src_xy)  # [H, W] each
            v = jnp.where(inb, v, 0.0)

        if use_kernel:
            v_pad = jnp.pad(v.astype(jnp.float32),
                            ((rpad, rpad), (rpad, rpad)))
            inb_pad = jnp.pad(inb.astype(jnp.float32),
                              ((rpad, rpad), (rpad, rpad)))
            cost = _ncc_kernel_call(
                ref_pad, v_pad, bnd_pad, inb_pad, offs_np, w_sp_np,
                opt.sigma_color, H, W, rpad).astype(ref_img.dtype)
            costs.append(cost)
            continue

        # Source-side moments: 3 running sums over the window shifts.
        SV = jnp.zeros_like(ref_img)
        SVV = jnp.zeros_like(ref_img)
        SRV = jnp.zeros_like(ref_img)
        for k in range(K):
            dx = int(offs_np[k, 0])
            dy = int(offs_np[k, 1])
            v_k = roll2(v, dy, dx)
            w, wr = w_pre[k]
            SV = SV + w * v_k
            SVV = SVV + (w * v_k) * v_k
            SRV = SRV + wr * v_k
        ms = SV / wsum
        vs = SVV / wsum - ms * ms
        cov = SRV / wsum - mr * ms
        ncc = cov / jnp.sqrt(jnp.maximum(vr * vs, 1e-10))
        cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
        # Pixels whose window left the source entirely get max cost.
        frac_in = sep_spatial(inb.astype(ref_img.dtype)) / w_sp_np.sum()
        cost = jnp.where(frac_in > 0.5, cost, 2.0)
        costs.append(cost)
    costs = jnp.stack(costs)  # [S, H, W]
    if src_depths is not None and opt.geom_consistency:
        # Geometric consistency regularizer on the per-view cost
        # (ref: patch_match_cuda.cu:1038-1052).
        costs = costs + opt.geom_consistency_regularizer * _geom_costs(
            depth, K_ref, K_ref_inv, K_srcs, Rs, ts, src_depths,
            opt.geom_consistency_max_cost)
    # View aggregation: average of per-pixel best half of the views
    # (robust mean approximating the reference's per-pixel view sampling).
    S = costs.shape[0]
    k_best = max(1, S // 2 + (S % 2))
    neg_sorted = jnp.sort(costs, axis=0)  # ascending
    return jnp.mean(neg_sorted[:k_best], axis=0)


# ---------------------------------------------------------------------------
# main solver
# ---------------------------------------------------------------------------


def _random_normals(key, shape, dtype):
    """Random unit normals facing the camera (z < 0)
    (ref: patch_match_cuda.cu GenerateRandomNormal)."""
    k1, k2 = jax.random.split(key)
    q1 = jax.random.uniform(k1, shape, dtype)
    q2 = jax.random.uniform(k2, shape, dtype)
    # Cosine-weighted hemisphere.
    theta = jnp.arccos(jnp.sqrt(jnp.clip(q1, 1e-6, 1.0)))
    phi = 2 * jnp.pi * q2
    n = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                   jnp.sin(theta) * jnp.sin(phi),
                   -jnp.cos(theta)], -1)
    return n


def _checkerboard_mask(H, W, parity):
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    return ((yy + xx) % 2) == parity


@partial(jax.jit, static_argnames=("options",))
def patch_match_stereo(
    ref_img,            # [H, W] grayscale f32 in [0, 1]
    src_imgs,           # [S, H', W'] source images
    K_ref,              # [3, 3] ref intrinsics
    K_srcs,             # [S, 3, 3]
    Rs,                 # [S, 3, 3] ref-cam -> src-cam rotation
    ts,                 # [S, 3]    x_src = R x_ref + t
    key=None,
    options: PatchMatchOptions = PatchMatchOptions(),
    src_depths=None,    # [S, H', W'] source depth maps -> enables the
    #                     geometric-consistency second pass
    init_depth=None,    # [H, W] warm start (the photometric result in
    init_normal=None,   # the reference's second pass)
) -> PatchMatchResult:
    """Estimate a depth/normal map for the reference view.

    One jitted program: random init -> num_iterations x (red update, black
    update, random refinement). Every update evaluates all candidate
    hypotheses for all pixels in parallel. With `src_depths` given and
    `options.geom_consistency`, every hypothesis cost carries the
    forward-backward reprojection regularizer (the reference's
    geometric-consistency pass, ref: mvs/patch_match.cc second-phase
    problems) and the final filter additionally requires
    `filter_min_num_consistent` geometrically-consistent views.
    """
    opt = options
    if key is None:
        key = jax.random.PRNGKey(0)
    H, W = ref_img.shape
    dtype = ref_img.dtype
    K_ref_inv = jnp.linalg.inv(K_ref)

    # Packed-patch source sampling on TPU: built once per program,
    # loop-invariant across all hypothesis evaluations (the warp
    # gathers were 83% of one cost eval; 4 taps -> 1).
    src_packed = None
    if _use_ncc_kernel(H, W, opt.window_radius):
        src_packed = [_pack_intensity_nbhd(src_imgs[s])
                      for s in range(src_imgs.shape[0])]

    cost_of = lambda d, n: _cost_for_hypothesis(
        ref_img, src_imgs, K_ref_inv, K_srcs, Rs, ts, d, n, opt,
        K_ref=K_ref, src_depths=src_depths, src_packed=src_packed)

    key, k_init_d, k_init_n = jax.random.split(key, 3)
    if init_depth is not None:
        depth = jnp.clip(jnp.where(init_depth > 0, init_depth,
                                   0.5 * (opt.depth_min + opt.depth_max)),
                         opt.depth_min, opt.depth_max)
        normal = init_normal if init_normal is not None else \
            _random_normals(k_init_n, (H, W), dtype)
    else:
        # Random init in 1/depth (uniform inverse depth, ref random init).
        inv_d = jax.random.uniform(k_init_d, (H, W), dtype,
                                   1.0 / opt.depth_max, 1.0 / opt.depth_min)
        depth = 1.0 / inv_d
        normal = _random_normals(k_init_n, (H, W), dtype)
    cost = cost_of(depth, normal)

    def consider(state, d_new, n_new, update_mask):
        depth, normal, cost = state
        c_new = cost_of(d_new, n_new)
        better = (c_new < cost) & update_mask
        return (jnp.where(better, d_new, depth),
                jnp.where(better[..., None], n_new, normal),
                jnp.where(better, c_new, cost))

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=dtype) + 0.5,
                          jnp.arange(W, dtype=dtype) + 0.5, indexing="ij")
    ray = jnp.einsum("ij,hwj->hwi", K_ref_inv,
                     jnp.stack([xx, yy, jnp.ones_like(xx)], -1)
                     ).astype(dtype)

    def iteration(it, carry):
        depth, normal, cost, key = carry
        for parity in (0, 1):
            mask = _checkerboard_mask(H, W, parity)
            # Propagation: evaluate each neighbor's PLANE at this pixel
            # (ref semantics: the CUDA sweep tests the neighbor plane's
            # induced depth, not its raw depth value — this is what
            # makes normals meaningful and slanted surfaces converge):
            # plane through X_q = d_q ray_q with normal n_q induces
            # d_p = (n_q . X_q) / (n_q . ray_p). Jump-flood style: also
            # distance-3 jumps to speed up information travel.
            for (dy, dx) in ((0, 1), (0, -1), (1, 0), (-1, 0),
                             (0, 3), (0, -3), (3, 0), (-3, 0)):
                roll = lambda a: jnp.roll(jnp.roll(a, dy, 0), dx, 1)
                ndX = roll(depth * jnp.sum(normal * ray, -1))
                n_n = roll(normal)
                den = jnp.sum(n_n * ray, -1)
                den = jnp.where(jnp.abs(den) > 1e-6, den,
                                jnp.where(den < 0, -1e-6, 1e-6))
                d_n = jnp.clip(ndX / den, opt.depth_min, opt.depth_max)
                depth, normal, cost = consider(
                    (depth, normal, cost), d_n, n_n, mask)
            # Random refinement: perturb depth multiplicatively + jitter
            # normal, with shrinking radius (ref: random refinement loop).
            for r in range(opt.num_random_samples):
                key, kd, kn = jax.random.split(key, 3)
                scale = 0.5 ** (it.astype(dtype) / 2.0 + r)
                pert = jnp.exp(jax.random.normal(kd, (H, W), dtype)
                               * 0.3 * scale)
                d_new = jnp.clip(depth * pert, opt.depth_min, opt.depth_max)
                n_jit = normal + scale * 0.5 * \
                    jax.random.normal(kn, (H, W, 3), dtype)
                n_jit = n_jit / jnp.linalg.norm(
                    n_jit, axis=-1, keepdims=True).clip(1e-9)
                n_new = jnp.where(n_jit[..., 2:] < -0.05, n_jit,
                                  normal)
                depth, normal, cost = consider(
                    (depth, normal, cost), d_new, n_new, mask)
        return depth, normal, cost, key

    depth, normal, cost, key = lax.fori_loop(
        0, opt.num_iterations, iteration, (depth, normal, cost, key))

    if opt.filter:
        max_photo = 2.0 - 2.0 * opt.filter_min_ncc
        if src_depths is not None and opt.geom_consistency:
            max_photo += (opt.geom_consistency_regularizer
                          * opt.geom_consistency_max_cost)
            # Require enough geometrically consistent views
            # (ref: patch_match_cuda.cu:1114-1124 filter).
            g = _geom_costs(depth, K_ref, K_ref_inv, K_srcs, Rs, ts,
                            src_depths, opt.geom_consistency_max_cost)
            n_consistent = jnp.sum(
                g <= opt.filter_geom_consistency_max_cost, axis=0)
            depth = jnp.where(
                n_consistent >= opt.filter_min_num_consistent, depth, 0.0)
        bad = cost > max_photo
        depth = jnp.where(bad, 0.0, depth)
    return PatchMatchResult(depth=depth, normal=normal, cost=cost)


def relative_pose(q_ref, t_ref, q_src, t_src):
    """World poses (x_cam = R x_world + t) -> relative (R, t) with
    x_src = R x_ref + t. Host helper for building PatchMatch inputs."""
    from sba_tpu.geometry.quaternions import np_quat_to_rotmat

    R_ref = np_quat_to_rotmat(q_ref)
    R_src = np_quat_to_rotmat(q_src)
    R = R_src @ R_ref.T
    t = np.asarray(t_src) - R @ np.asarray(t_ref)
    return R, t
