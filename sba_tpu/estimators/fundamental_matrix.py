"""Fundamental matrix solvers: 7-point and normalized 8-point.

Capability parity with ref: src/estimators/fundamental_matrix.{h,cc}
(`FundamentalMatrixSevenPointEstimator` :53, `...EightPointEstimator` :93),
batched for vmapped RANSAC. The 7-point cubic uses Durand-Kerner roots
instead of the reference's companion-matrix eigensolver.
"""

from __future__ import annotations

import jax.numpy as jnp

from sba_tpu.ops.polynomial import real_roots


def _normalize_points(xy, eps=1e-12):
    """Hartley normalization: centroid 0, mean distance sqrt(2).
    Returns (xy_norm [..., M, 2], T [..., 3, 3]) with x_n = T x."""
    c = jnp.mean(xy, axis=-2, keepdims=True)
    d = jnp.sqrt(jnp.sum((xy - c) ** 2, -1))
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d, -1), eps)
    xy_n = (xy - c) * scale[..., None, None]
    z = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    T = jnp.stack([
        jnp.stack([scale, z, -scale * c[..., 0, 0]], -1),
        jnp.stack([z, scale, -scale * c[..., 0, 1]], -1),
        jnp.stack([z, z, one], -1),
    ], -2)
    return xy_n, T


def _epipolar_rows(xy1, xy2):
    """Rows of the DLT system x2^T F x1 = 0: [..., M, 9]."""
    x1, y1 = xy1[..., 0], xy1[..., 1]
    x2, y2 = xy2[..., 0], xy2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], -1)


def fundamental_8pt(xy1, xy2):
    """Normalized 8-point algorithm; rank-2 enforcement.
    xy*: [..., M >= 8, 2] pixel or normalized coords. Returns F [..., 3, 3]."""
    n1, T1 = _normalize_points(xy1)
    n2, T2 = _normalize_points(xy2)
    A = _epipolar_rows(n1, n2)
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    w, V = jnp.linalg.eigh(AtA)
    f = V[..., :, 0]
    F = f.reshape(f.shape[:-1] + (3, 3))
    U, S, Vt = jnp.linalg.svd(F)
    S2 = S.at[..., 2].set(0.0)
    F = jnp.einsum("...ik,...k,...kj->...ij", U, S2, Vt)
    F = jnp.einsum("...ji,...jk,...kl->...il", T2, F, T1)  # T2^T F T1
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1, keepdims=True)
    return F / jnp.maximum(norm, 1e-12)[..., None]


def fundamental_7pt(xy1, xy2):
    """7-point algorithm: up to 3 solutions.
    xy*: [..., 7, 2]. Returns (F [..., 3, 3, 3], valid [..., 3])."""
    A = _epipolar_rows(xy1, xy2)  # [..., 7, 9]
    # 2-dim nullspace from eigh of A^T A.
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    w, V = jnp.linalg.eigh(AtA)
    f1 = V[..., :, 0].reshape(V.shape[:-2] + (3, 3))
    f2 = V[..., :, 1].reshape(V.shape[:-2] + (3, 3))

    # det(lam * f1 + (1 - lam) * f2) = cubic in lam.
    # Expand via trilinearity: det is cubic; sample-free closed form using
    # determinant polynomial coefficients.
    def det3(M):
        return jnp.linalg.det(M)

    # p(lam) = det(f2 + lam*(f1 - f2)); coefficients by evaluation at 4
    # points + interpolation (exact for a cubic).
    D = f1 - f2
    lams = jnp.asarray([0.0, 1.0, -1.0, 2.0], xy1.dtype)
    vals = jnp.stack([det3(f2 + l * D) for l in [0.0, 1.0, -1.0, 2.0]], -1)
    # Vandermonde solve for [c3, c2, c1, c0].
    Vm = jnp.stack([lams ** 3, lams ** 2, lams, jnp.ones_like(lams)], -1)
    coeffs = jnp.linalg.solve(jnp.broadcast_to(Vm, vals.shape[:-1] + (4, 4)), vals[..., None])[..., 0]
    lam, ok = real_roots(coeffs)  # [..., 3]
    F = f2[..., None, :, :] + lam[..., :, None, None] * D[..., None, :, :]
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    F = F / jnp.maximum(norm, 1e-12)[..., None, None]
    # Degenerate cubic (leading coeff ~ 0 gives spurious huge roots).
    ok = ok & jnp.isfinite(lam)
    return F, ok


def sampson_error_f(F, xy1, xy2, eps=1e-12):
    """Squared Sampson distance for F (ref: src/estimators/utils.cc
    ComputeSquaredSampsonError). F: [..., 3, 3]; xy*: [..., M, 2]."""
    x1 = jnp.concatenate([xy1, jnp.ones_like(xy1[..., :1])], -1)
    x2 = jnp.concatenate([xy2, jnp.ones_like(xy2[..., :1])], -1)
    Fx1 = jnp.einsum("...ij,...mj->...mi", F, x1)
    Ftx2 = jnp.einsum("...ji,...mj->...mi", F, x2)
    num = jnp.einsum("...mi,...mi->...m", x2, Fx1) ** 2
    den = (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2
           + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2)
    return num / jnp.maximum(den, eps)
