"""Batched map sampling: nearest (reference parity) and bilinear (soft).

The reference rounds reprojected pixels to nearest-neighbor lookups
(ref: src/base/semantic_cost_functions.h:152-160 'Round the pixels values
[IMPROVEMENT? don't round and interpolate]'). The TPU-native soft path takes
that bracketed suggestion: bilinear weights make the lookup differentiable.
"""

from __future__ import annotations

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
