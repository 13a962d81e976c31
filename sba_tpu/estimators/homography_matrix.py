"""Homography estimation: normalized 4-point DLT + transfer error + pose
decomposition.

Capability parity with ref: src/estimators/homography_matrix.{h,cc}
(`HomographyMatrixEstimator` :47) and src/base/homography_matrix.cc
(`PoseFromHomographyMatrix` — used by two-view geometry for planar scenes).
"""

from __future__ import annotations

import jax.numpy as jnp

from sba_tpu.estimators.fundamental_matrix import _normalize_points


def homography_dlt(xy1, xy2):
    """DLT homography from >= 4 correspondences, Hartley-normalized.
    xy*: [..., M, 2]. Returns H [..., 3, 3] with x2 ~ H x1."""
    n1, T1 = _normalize_points(xy1)
    n2, T2 = _normalize_points(xy2)
    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    one = jnp.ones_like(x1)
    zero = jnp.zeros_like(x1)
    r1 = jnp.stack([-x1, -y1, -one, zero, zero, zero, x2 * x1, x2 * y1, x2], -1)
    r2 = jnp.stack([zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], -1)
    A = jnp.concatenate([r1, r2], -2)
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    w, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    H = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.einsum("...ij,...jk,...kl->...il", jnp.linalg.inv(T2), H, T1)
    # Scale-normalize on the largest entry for stability.
    scale = H[..., 2:3, 2:3]
    safe = jnp.where(jnp.abs(scale) > 1e-12, scale, 1.0)
    return H / safe


def homography_transfer_error(H, xy1, xy2, eps=1e-12):
    """Squared symmetric-free transfer error |x2 - H x1|^2
    (ref: homography_matrix.cc Residuals uses one-sided transfer)."""
    x1 = jnp.concatenate([xy1, jnp.ones_like(xy1[..., :1])], -1)
    Hx = jnp.einsum("...ij,...mj->...mi", H, x1)
    z = Hx[..., 2]
    safe_z = jnp.where(jnp.abs(z) > eps, z, eps)
    proj = Hx[..., :2] / safe_z[..., None]
    err = jnp.sum((proj - xy2) ** 2, -1)
    # Behind-plane points get a large error.
    return jnp.where(jnp.abs(z) > eps, err, 1e12)
