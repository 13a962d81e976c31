"""Polynomial root finding as fixed-trip-count iteration (TPU-jittable).

The reference finds polynomial roots via companion-matrix eigenvalues
(ref: src/base/polynomial.{h,cc} FindPolynomialRootsCompanionMatrix), which
needs a general eigensolver — unavailable on TPU. Durand-Kerner iteration is
the TPU-native equivalent: all roots simultaneously, static iteration count,
batched over leading dims.

Complex arithmetic is hand-written over (re, im) float pairs because the
TPU backend does not implement complex primitives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi, eps=1e-30):
    d = br * br + bi * bi
    d = jnp.where(d > eps, d, eps)
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def roots(coeffs, iters: int = 60):
    """All roots of real-coefficient polynomials, as (re, im) arrays.

    coeffs: [..., n+1] real, highest degree first (c0 x^n + ... + cn).
    Returns (re [..., n], im [..., n]). Leading coefficient must be nonzero
    (caller normalizes/filters degenerate polynomials).
    """
    coeffs = jnp.asarray(coeffs)
    n = coeffs.shape[-1] - 1
    lead = coeffs[..., :1]
    safe_lead = jnp.where(jnp.abs(lead) > 1e-30, lead, 1.0)
    monic = coeffs / safe_lead  # [..., n+1]

    # Cauchy-style radius bound for initialization.
    radius = 1.0 + jnp.max(jnp.abs(monic[..., 1:]), axis=-1)

    # Distinct initial guesses on a spiral (static numpy constants).
    init = np.power(0.4 + 0.9j, np.arange(1, n + 1))
    zr = radius[..., None] * jnp.asarray(init.real, coeffs.dtype)
    zi = radius[..., None] * jnp.asarray(init.imag, coeffs.dtype)

    def horner(zr_, zi_):
        pr = jnp.broadcast_to(monic[..., 0][..., None], zr_.shape)
        pi = jnp.zeros_like(zr_)
        for i in range(1, n + 1):
            pr, pi = _cmul(pr, pi, zr_, zi_)
            pr = pr + monic[..., i][..., None]
        return pr, pi

    def step(_, zs):
        zr_, zi_ = zs
        pr, pi = horner(zr_, zi_)
        # Denominator: prod_{j != i} (z_i - z_j), with 1 on the diagonal.
        dr = zr_[..., :, None] - zr_[..., None, :] + jnp.eye(n, dtype=zr_.dtype)
        di = zi_[..., :, None] - zi_[..., None, :]
        prod_r = dr[..., 0]
        prod_i = di[..., 0]
        for j in range(1, n):
            prod_r, prod_i = _cmul(prod_r, prod_i, dr[..., j], di[..., j])
        qr, qi = _cdiv(pr, pi, prod_r, prod_i)
        return zr_ - qr, zi_ - qi

    zr, zi = jax.lax.fori_loop(0, iters, step, (zr, zi))
    return zr, zi


def real_roots(coeffs, iters: int = 60, imag_tol: float = 1e-6):
    """(roots_real [..., n], is_real [..., n]) — real parts + validity mask."""
    zr, zi = roots(coeffs, iters)
    scale = 1.0 + jnp.sqrt(zr * zr + zi * zi)
    ok = jnp.abs(zi) <= imag_tol * scale
    return zr, ok


def polyval(coeffs, x):
    """Horner evaluation, coeffs [..., n+1] highest first, x broadcastable."""
    p = coeffs[..., 0]
    for i in range(1, coeffs.shape[-1]):
        p = p * x + coeffs[..., i]
    return p
