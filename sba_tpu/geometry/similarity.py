"""Similarity / rigid transform estimation (Umeyama) + alignment utilities.

Capability parity with ref: src/base/similarity_transform.{h,cc}
(`SimilarityTransform3`, model alignment) and the 3-point rigid alignment
needed by P3P. Batched closed form.
"""

from __future__ import annotations

import jax.numpy as jnp

from sba_tpu.geometry.quaternions import rotmat_to_quat


def umeyama(src, dst, weights=None, with_scale=True, eps=1e-12):
    """Least-squares similarity transform dst ~ s R src + t.

    src, dst: [..., M, 3]; weights: [..., M] optional.
    Returns (s [...], R [..., 3, 3], t [..., 3]).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights, -1, keepdims=True), eps)
    mu_s = jnp.einsum("...m,...mi->...i", w, src)
    mu_d = jnp.einsum("...m,...mi->...i", w, dst)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    cov = jnp.einsum("...m,...mi,...mj->...ij", w, dc, sc)  # dst x src
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.ones(cov.shape[:-2] + (3,), src.dtype).at[..., 2].set(d)
    R = jnp.einsum("...ik,...k,...kj->...ij", U, D, Vt)
    if with_scale:
        var_s = jnp.einsum("...m,...mi,...mi->...", w, sc, sc)
        s = jnp.sum(S * D, axis=-1) / jnp.maximum(var_s, eps)
    else:
        s = jnp.ones(cov.shape[:-2], src.dtype)
    t = mu_d - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return s, R, t


def rigid_from_points(src, dst, weights=None):
    """Rigid (scale=1) alignment: returns (qvec, R, t) with dst = R src + t."""
    s, R, t = umeyama(src, dst, weights, with_scale=False)
    return rotmat_to_quat(R), R, t


def apply_similarity(s, R, t, points):
    return s[..., None, None] * jnp.einsum("...ij,...mj->...mi", R, points) + t[..., None, :]
