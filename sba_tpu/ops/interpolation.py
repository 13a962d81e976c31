"""Batched map sampling: nearest (reference parity) and bilinear (soft).

The reference rounds reprojected pixels to nearest-neighbor lookups
(ref: src/base/semantic_cost_functions.h:152-160 'Round the pixels values
[IMPROVEMENT? don't round and interpolate]'). The TPU-native soft path takes
that bracketed suggestion: bilinear weights make the lookup differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather2d(map2d, yi, xi):
    """map2d [H, W]; yi/xi integer arrays (clipped by caller)."""
    H, W = map2d.shape
    return jnp.take(map2d.reshape(-1), yi * W + xi)


def nearest_sample2d(map2d, xy, fill=0.0):
    """Single-map variant: map2d [H, W], xy [..., 2] -> [...]."""
    H, W = map2d.shape
    xi = jnp.round(xy[..., 0]).astype(jnp.int32)
    yi = jnp.round(xy[..., 1]).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    v = _gather2d(map2d, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
    return jnp.where(inb, v, fill)


def bilinear_flat(flat_map, H, W, base, x, y, fill=0.0):
    """Bilinear sampling from a FLAT [N*H*W] map stack at offset `base`
    (exact unpacked values — the f64 parity path; per-map gathers under
    vmap materialize [Q, H, W] arrays, so all SBA sampling indexes the
    flat stack globally)."""
    x0c, y0c, fxe, fye, inb = _bilinear_setup_xy(H, W, x, y)
    x1c = jnp.clip(x0c + 1, 0, W - 1)
    y1c = jnp.clip(y0c + 1, 0, H - 1)
    v00 = jnp.take(flat_map, base + y0c * W + x0c)
    v01 = jnp.take(flat_map, base + y0c * W + x1c)
    v10 = jnp.take(flat_map, base + y1c * W + x0c)
    v11 = jnp.take(flat_map, base + y1c * W + x1c)
    v = ((1 - fye) * ((1 - fxe) * v00 + fxe * v01)
         + fye * ((1 - fxe) * v10 + fxe * v11))
    return jnp.where(inb, v, fill)


def bilinear_label_agreement_flat_raw(flat_map, H, W, base, x, y, label,
                                      fill=0.0):
    """Unpacked-flat counterpart of `bilinear_label_agreement`."""
    x0c, y0c, fxe, fye, inb = _bilinear_setup_xy(H, W, x, y)
    x1c = jnp.clip(x0c + 1, 0, W - 1)
    y1c = jnp.clip(y0c + 1, 0, H - 1)
    a00 = (jnp.take(flat_map, base + y0c * W + x0c) == label)
    a01 = (jnp.take(flat_map, base + y0c * W + x1c) == label)
    a10 = (jnp.take(flat_map, base + y1c * W + x0c) == label)
    a11 = (jnp.take(flat_map, base + y1c * W + x1c) == label)
    p = ((1 - fye) * ((1 - fxe) * a00.astype(x.dtype)
                      + fxe * a01.astype(x.dtype))
         + fye * ((1 - fxe) * a10.astype(x.dtype)
                  + fxe * a11.astype(x.dtype)))
    return jnp.where(inb, p, fill)


def bilinear_sample2d(map2d, xy, fill=0.0):
    """Differentiable bilinear sampling. map2d [H, W], xy [..., 2] -> [...].
    Out-of-bounds (outside the valid interpolation square) -> fill."""
    H, W = map2d.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    x0c = jnp.clip(x0, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)
    v00 = _gather2d(map2d, y0c, x0c)
    v01 = _gather2d(map2d, y0c, x1c)
    v10 = _gather2d(map2d, y1c, x0c)
    v11 = _gather2d(map2d, y1c, x1c)
    v = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
         + fy * ((1 - fx) * v10 + fx * v11))
    return jnp.where(inb, v, fill)


def bilinear_label_agreement(map2d, xy, label, fill=0.0):
    """Differentiable probability that the (integer-valued) label map equals
    `label` at continuous position xy: bilinear blend of the 0/1 agreement
    indicator at the four neighbors. map2d [H, W], xy [..., 2], label [...]."""
    H, W = map2d.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    x0c = jnp.clip(x0, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)
    a00 = (_gather2d(map2d, y0c, x0c) == label).astype(x.dtype)
    a01 = (_gather2d(map2d, y0c, x1c) == label).astype(x.dtype)
    a10 = (_gather2d(map2d, y1c, x0c) == label).astype(x.dtype)
    a11 = (_gather2d(map2d, y1c, x1c) == label).astype(x.dtype)
    p = ((1 - fy) * ((1 - fx) * a00 + fx * a01)
         + fy * ((1 - fx) * a10 + fx * a11))
    return jnp.where(inb, p, fill)


# ---------------------------------------------------------------------------
# Packed-neighborhood sampling. TPU gathers cost per DESCRIPTOR, not per
# byte (measured ~11 ns/element — ~2000x below HBM bandwidth), so the
# bilinear inner loop packs each pixel's 2x2 neighborhood into u32 maps
# host-side: one gather yields all four neighbor labels (4 x u8), two
# gathers yield four depths (2 x f16 pairs) — 3 descriptors per sample
# instead of 8. Used by the semantic BA hot path (optim/sba.py).
# ---------------------------------------------------------------------------


def pack_label_neighborhood(label_map) -> "np.ndarray":
    """[H, W] integer labels (0..255) -> u32 map where bits
    [0:8]=l(y,x), [8:16]=l(y,x+1), [16:24]=l(y+1,x), [24:32]=l(y+1,x+1)
    (edge-clamped). Host-side numpy; done once per solve."""
    import numpy as np

    m = np.asarray(label_map)
    if m.min() < 0 or m.max() > 255:
        raise ValueError("packed labels require values in [0, 255]")
    m = m.astype(np.uint32)
    r = np.pad(m, ((0, 1), (0, 1)), mode="edge")
    return (r[:-1, :-1] | (r[:-1, 1:] << 8)
            | (r[1:, :-1] << 16) | (r[1:, 1:] << 24))


def pack_depth_nbhd_u8(depth_map, lo=None, hi=None):
    """[H, W] f32 depths -> (u32 map, lo, hi): the full 2x2 patch
    d(y,x), d(y,x+1), d(y+1,x), d(y+1,x+1) quantized to u8 against the
    per-map [lo, hi] range (edge-clamped), one byte per neighbor.

    ONE gather then yields the whole bilinear depth patch. Quantization
    step = range/255 (e.g. 8 cm over a 20 m scene) — far below the
    reference's depth_error_threshold gate (default 2.0,
    ref: src/optim/semantic_bundle_adjustment.h:76)."""
    import numpy as np

    m = np.asarray(depth_map, np.float32)
    if lo is None:
        lo = float(m.min())
    if hi is None:
        hi = float(m.max())
    scale = 255.0 / max(hi - lo, 1e-12)
    q = np.clip(np.round((m - lo) * scale), 0, 255).astype(np.uint32)
    r = np.pad(q, ((0, 1), (0, 1)), mode="edge")
    packed = (r[:-1, :-1] | (r[:-1, 1:] << 8)
              | (r[1:, :-1] << 16) | (r[1:, 1:] << 24))
    return packed, np.float32(lo), np.float32(hi)


def _bilinear_setup(H, W, xy):
    return _bilinear_setup_xy(H, W, xy[..., 0], xy[..., 1])


def _bilinear_setup_xy(H, W, x, y):
    """Component-wise variant: [*,2] point arrays pad their 2-wide
    trailing dim to the 128-lane tile on TPU; hot paths pass x/y as
    separate full-lane arrays instead (see optim/sba.py warp)."""
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    x0c = jnp.clip(x0, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    fxe = jnp.where(x0c >= W - 1, 0.0, fx)
    fye = jnp.where(y0c >= H - 1, 0.0, fy)
    return x0c, y0c, fxe, fye, inb


def bilinear_depth_u8_flat(flat_u32, H, W, base, x, y, lo, hi, fill=0.0):
    """Bilinear depth from a flattened stack of `pack_depth_nbhd_u8`
    maps: ONE flat-index gather per sample (flat-index gathers measured
    ~30% faster than batched per-map gathers on v5e). `base` is the
    sample's map offset (pd * H * W); lo/hi its dequant range. Takes
    x/y as separate component arrays (full-lane layout)."""
    x0c, y0c, fxe, fye, inb = _bilinear_setup_xy(H, W, x, y)
    u = _take_u32_rowsel(flat_u32, base + y0c * W + x0c)
    dq = (hi - lo) / 255.0
    v00 = (u & 0xFF).astype(x.dtype)
    v01 = ((u >> 8) & 0xFF).astype(x.dtype)
    v10 = ((u >> 16) & 0xFF).astype(x.dtype)
    v11 = ((u >> 24) & 0xFF).astype(x.dtype)
    v = ((1 - fye) * ((1 - fxe) * v00 + fxe * v01)
         + fye * ((1 - fxe) * v10 + fxe * v11)) * dq + lo
    return jnp.where(inb, v, fill)


def _take_u32_rowsel(flat_u32, fi):
    """u32 gather via row-gather + one-hot lane select.

    XLA's flat 1-D `jnp.take` costs ~11.8 ns/element on v5e; gathering
    the (8,128)-tiled ROW containing the element and reducing a one-hot
    lane mask measures 6.2 ns/element (benchmarks/gather_micro3.py v3 —
    XLA fuses the select into the gather). Requires len(flat_u32) to be
    a multiple of 128 (hot-path maps are 640x480; callers fall back to
    jnp.take otherwise)."""
    if flat_u32.shape[0] % 128 != 0:
        return jnp.take(flat_u32, fi)
    t2 = flat_u32.reshape(-1, 128)
    rows = jnp.take(t2, fi // 128, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.where(lane == (fi % 128)[:, None], rows,
                     jnp.zeros_like(rows)).sum(axis=1)


def bilinear_depth_u8_grad(flat_u32, H, W, base, x, y, lo, hi, fill=0.0):
    """`bilinear_depth_u8_flat` + analytic screen-space derivatives.

    Returns (value, d/dx, d/dy) with the derivatives matching EXACTLY
    what jacfwd of the flat sampler computes (zero outside `inb`, zero
    across the edge clamp) — the analytic SBA linearization consumes
    them so the map gathers happen once, not once per pose tangent."""
    x0c, y0c, fxe, fye, inb = _bilinear_setup_xy(H, W, x, y)
    u = _take_u32_rowsel(flat_u32, base + y0c * W + x0c)
    dq = (hi - lo) / 255.0
    v00 = (u & 0xFF).astype(x.dtype)
    v01 = ((u >> 8) & 0xFF).astype(x.dtype)
    v10 = ((u >> 16) & 0xFF).astype(x.dtype)
    v11 = ((u >> 24) & 0xFF).astype(x.dtype)
    v = ((1 - fye) * ((1 - fxe) * v00 + fxe * v01)
         + fye * ((1 - fxe) * v10 + fxe * v11)) * dq + lo
    zero = jnp.zeros_like(x)
    dfx = jnp.where(inb & (x0c < W - 1), dq, 0.0)
    dfy = jnp.where(inb & (y0c < H - 1), dq, 0.0)
    ddx = ((1 - fye) * (v01 - v00) + fye * (v11 - v10)) * dfx
    ddy = ((1 - fxe) * (v10 - v00) + fxe * (v11 - v01)) * dfy
    return jnp.where(inb, v, fill), ddx, ddy


def bilinear_label_agreement_grad(flat_u32, H, W, base, x, y, label,
                                  fill=0.0):
    """`bilinear_label_agreement_flat` + analytic screen derivatives
    (see bilinear_depth_u8_grad)."""
    x0c, y0c, fxe, fye, inb = _bilinear_setup_xy(H, W, x, y)
    u = _take_u32_rowsel(flat_u32, base + y0c * W + x0c)
    lab = label.astype(jnp.uint32)
    a00 = ((u & 0xFF) == lab).astype(x.dtype)
    a01 = (((u >> 8) & 0xFF) == lab).astype(x.dtype)
    a10 = (((u >> 16) & 0xFF) == lab).astype(x.dtype)
    a11 = (((u >> 24) & 0xFF) == lab).astype(x.dtype)
    p = ((1 - fye) * ((1 - fxe) * a00 + fxe * a01)
         + fye * ((1 - fxe) * a10 + fxe * a11))
    dfx = jnp.where(inb & (x0c < W - 1), 1.0, 0.0)
    dfy = jnp.where(inb & (y0c < H - 1), 1.0, 0.0)
    ddx = ((1 - fye) * (a01 - a00) + fye * (a11 - a10)) * dfx
    ddy = ((1 - fxe) * (a10 - a00) + fxe * (a11 - a01)) * dfy
    return jnp.where(inb, p, fill), ddx, ddy


# ---------------------------------------------------------------------------
# Joint depth+label packing (round 5). The r4 SBA hot path is
# gather-issue-bound with TWO rowsel gathers per sample (u8 depth patch,
# u8 label patch; BASELINE.md r4 roofline). Packing BOTH maps' 2x2
# patches into ONE u32 word halves the gather issues: per corner k in
# (00, 01, 10, 11), bits [k*5:(k+1)*5] hold the 5-bit quantized depth
# and bits [20+k*3 : 20+(k+1)*3] a 3-bit label PALETTE code (labels
# remapped to the <=8 distinct values present in the solve; problems
# with more classes fall back to the two-gather path). Measured
# single-gather variants that DON'T pack (element-interleaved tables
# with two lane selects) are slower — the gather-select fusion only
# survives with one select per gather (benchmarks/gather_micro5.py).
# ---------------------------------------------------------------------------

JOINT_DEPTH_BITS = 5
JOINT_LABEL_BITS = 3
JOINT_MAX_LABELS = 1 << JOINT_LABEL_BITS


def pack_joint_nbhd(depth_map, label_code_map, lo=None, hi=None):
    """[H, W] f32 depth + [H, W] palette codes (0..7) -> (u32 map, lo, hi)
    holding the full 2x2 bilinear patch of BOTH maps (edge-clamped).
    Depth quantization step = range/31 per map — e.g. 6.5 cm over a 2 m
    depth range, well under the reference's depth_error_threshold gate
    (default 2.0, ref: src/optim/semantic_bundle_adjustment.h:76).
    Host-side numpy; done once per solve."""
    import numpy as np

    D, L = JOINT_DEPTH_BITS, JOINT_LABEL_BITS
    m = np.asarray(depth_map, np.float32)
    if lo is None:
        lo = float(m.min())
    if hi is None:
        hi = float(m.max())
    qmax = (1 << D) - 1
    scale = qmax / max(hi - lo, 1e-12)
    q = np.clip(np.round((m - lo) * scale), 0, qmax).astype(np.uint32)
    c = np.asarray(label_code_map).astype(np.uint32)
    if c.max(initial=0) >= JOINT_MAX_LABELS:
        raise ValueError("joint packing requires palette codes < 8")
    rq = np.pad(q, ((0, 1), (0, 1)), mode="edge")
    rc = np.pad(c, ((0, 1), (0, 1)), mode="edge")
    cq = [rq[:-1, :-1], rq[:-1, 1:], rq[1:, :-1], rq[1:, 1:]]
    cc = [rc[:-1, :-1], rc[:-1, 1:], rc[1:, :-1], rc[1:, 1:]]
    out = np.zeros_like(q)
    for k in range(4):
        out |= cq[k] << np.uint32(k * D)
        out |= cc[k] << np.uint32(4 * D + k * L)
    return out, np.float32(lo), np.float32(hi)


def bilinear_joint_grad(flat_u32, H, W, base, x, y, src_code, lo, hi,
                        depth_fill=0.0):
    """ONE rowsel gather -> (depth2, dD/dx, dD/dy, agree, dA/dx, dA/dy).

    Joint-packed equivalent of bilinear_depth_u8_grad +
    bilinear_label_agreement_grad; derivative semantics identical
    (zero outside bounds, zero across the edge clamp)."""
    D, L = JOINT_DEPTH_BITS, JOINT_LABEL_BITS
    x0c, y0c, fxe, fye, inb = _bilinear_setup_xy(H, W, x, y)
    u = _take_u32_rowsel(flat_u32, base + y0c * W + x0c)
    qmax = (1 << D) - 1
    dm = jnp.uint32(qmax)
    lm = jnp.uint32((1 << L) - 1)
    dq = (hi - lo) / qmax
    v00 = (u & dm).astype(x.dtype)
    v01 = ((u >> D) & dm).astype(x.dtype)
    v10 = ((u >> (2 * D)) & dm).astype(x.dtype)
    v11 = ((u >> (3 * D)) & dm).astype(x.dtype)
    code = src_code.astype(jnp.uint32)
    a00 = (((u >> (4 * D)) & lm) == code).astype(x.dtype)
    a01 = (((u >> (4 * D + L)) & lm) == code).astype(x.dtype)
    a10 = (((u >> (4 * D + 2 * L)) & lm) == code).astype(x.dtype)
    a11 = (((u >> (4 * D + 3 * L)) & lm) == code).astype(x.dtype)

    v = ((1 - fye) * ((1 - fxe) * v00 + fxe * v01)
         + fye * ((1 - fxe) * v10 + fxe * v11)) * dq + lo
    p = ((1 - fye) * ((1 - fxe) * a00 + fxe * a01)
         + fye * ((1 - fxe) * a10 + fxe * a11))
    dfx = jnp.where(inb & (x0c < W - 1), 1.0, 0.0)
    dfy = jnp.where(inb & (y0c < H - 1), 1.0, 0.0)
    dDx = ((1 - fye) * (v01 - v00) + fye * (v11 - v10)) * dfx * dq
    dDy = ((1 - fxe) * (v10 - v00) + fxe * (v11 - v01)) * dfy * dq
    dAx = ((1 - fye) * (a01 - a00) + fye * (a11 - a10)) * dfx
    dAy = ((1 - fxe) * (a10 - a00) + fxe * (a11 - a01)) * dfy
    depth2 = jnp.where(inb, v, depth_fill)
    agree = jnp.where(inb, p, 0.0)
    return depth2, dDx, dDy, agree, dAx, dAy


def bilinear_joint_flat(flat_u32, H, W, base, x, y, src_code, lo, hi,
                        depth_fill=0.0):
    """Primal-only joint sampler: (depth2, agree) from one gather.
    The derivative outputs of bilinear_joint_grad are dead-code under
    jit when unused; this thin wrapper exists for readability."""
    depth2, _, _, agree, _, _ = bilinear_joint_grad(
        flat_u32, H, W, base, x, y, src_code, lo, hi, depth_fill)
    return depth2, agree


def bilinear_label_agreement_flat(flat_u32, H, W, base, x, y, label, fill=0.0):
    """`bilinear_label_agreement_packed` against a flattened map stack
    (one flat-index gather; see bilinear_depth_u8_flat)."""
    x0c, y0c, fxe, fye, inb = _bilinear_setup_xy(H, W, x, y)
    u = _take_u32_rowsel(flat_u32, base + y0c * W + x0c)
    lab = label.astype(jnp.uint32)
    a00 = ((u & 0xFF) == lab).astype(x.dtype)
    a01 = (((u >> 8) & 0xFF) == lab).astype(x.dtype)
    a10 = (((u >> 16) & 0xFF) == lab).astype(x.dtype)
    a11 = (((u >> 24) & 0xFF) == lab).astype(x.dtype)
    p = ((1 - fye) * ((1 - fxe) * a00 + fxe * a01)
         + fye * ((1 - fxe) * a10 + fxe * a11))
    return jnp.where(inb, p, fill)
