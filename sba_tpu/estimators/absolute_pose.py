"""Absolute pose minimal solvers: P3P (Grunert) and EPnP.

Capability parity with ref: src/estimators/absolute_pose.{h,cc}
(`P3PEstimator` :52, `EPNPEstimator` :97), as batched closed-form kernels
for vmapped RANSAC hypothesis generation.

The P3P quartic coefficients below were derived symbolically (sympy
resultant of the Grunert distance-ratio system), not transcribed; roots via
the TPU-jittable Durand-Kerner iteration (ops/polynomial.py) instead of the
reference's companion-matrix eigensolver.
"""

from __future__ import annotations

import jax.numpy as jnp

from sba_tpu.geometry.similarity import rigid_from_points
from sba_tpu.ops.polynomial import real_roots


def _bearings(xy):
    """Normalized image points [..., M, 2] -> unit bearing vectors [..., M, 3]."""
    f = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def p3p_solve(points3d, points2d):
    """Grunert P3P: up to 4 poses from 3 correspondences.

    points3d: [..., 3, 3] world; points2d: [..., 3, 2] NORMALIZED image
    coords. Returns (qvec [..., 4, 4], tvec [..., 4, 3], valid [..., 4])
    with x_cam = R x_world + t.
    """
    f = _bearings(points2d)  # [..., 3, 3]
    A, B, C = points3d[..., 0, :], points3d[..., 1, :], points3d[..., 2, :]
    fa, fb, fc = f[..., 0, :], f[..., 1, :], f[..., 2, :]

    a2 = jnp.sum((B - C) ** 2, -1)
    b2 = jnp.sum((A - C) ** 2, -1)
    c2 = jnp.sum((A - B) ** 2, -1)
    ca = jnp.sum(fb * fc, -1)  # cos(alpha): rays to B, C
    cb = jnp.sum(fa * fc, -1)  # cos(beta):  rays to A, C
    cg = jnp.sum(fa * fb, -1)  # cos(gamma): rays to A, B

    # Quartic in v = |PC|/|PA| (sympy-derived; common b2^2 factor dropped).
    A4 = (a2 ** 2 - 2 * a2 * b2 - 2 * a2 * c2 + b2 ** 2
          - 4 * b2 * c2 * ca ** 2 + 2 * b2 * c2 + c2 ** 2)
    A3 = 4 * (-a2 ** 2 * cb + a2 * b2 * ca * cg + a2 * b2 * cb
              + 2 * a2 * c2 * cb - b2 ** 2 * ca * cg
              + 2 * b2 * c2 * ca ** 2 * cb + b2 * c2 * ca * cg
              - b2 * c2 * cb - c2 ** 2 * cb)
    A2 = 2 * (2 * a2 ** 2 * cb ** 2 + a2 ** 2 - 4 * a2 * b2 * ca * cb * cg
              - 2 * a2 * b2 * cg ** 2 - 4 * a2 * c2 * cb ** 2 - 2 * a2 * c2
              + 2 * b2 ** 2 * ca ** 2 + 2 * b2 ** 2 * cg ** 2 - b2 ** 2
              - 2 * b2 * c2 * ca ** 2 - 4 * b2 * c2 * ca * cb * cg
              + 2 * c2 ** 2 * cb ** 2 + c2 ** 2)
    A1 = 4 * (-a2 ** 2 * cb + a2 * b2 * ca * cg + 2 * a2 * b2 * cb * cg ** 2
              - a2 * b2 * cb + 2 * a2 * c2 * cb - b2 ** 2 * ca * cg
              + b2 * c2 * ca * cg + b2 * c2 * cb - c2 ** 2 * cb)
    A0 = (a2 ** 2 - 4 * a2 * b2 * cg ** 2 + 2 * a2 * b2 - 2 * a2 * c2
          + b2 ** 2 - 2 * b2 * c2 + c2 ** 2)

    coeffs = jnp.stack([A4, A3, A2, A1, A0], axis=-1)
    v, v_ok = real_roots(coeffs)  # [..., 4]

    # Back-substitute: u linear in v (from e1 + e2).
    one = jnp.ones_like(v)
    f2v = one + v * v - 2.0 * v * cb[..., None]
    num_u = (b2[..., None] * (one - v * v)
             + (a2 - c2)[..., None] * f2v)
    den_u = 2.0 * b2[..., None] * (cg[..., None] - v * ca[..., None])
    u = num_u / jnp.where(jnp.abs(den_u) > 1e-12, den_u, 1e-12)

    s1 = jnp.sqrt(jnp.maximum(b2[..., None] / jnp.maximum(f2v, 1e-12), 0.0))
    s2 = u * s1
    s3 = v * s1
    valid = v_ok & (s1 > 0) & (s2 > 0) & (s3 > 0) & (f2v > 1e-12)

    # Camera-frame points, then 3-point rigid alignment world -> camera.
    pc = jnp.stack([
        s1[..., None] * fa[..., None, :],
        s2[..., None] * fb[..., None, :],
        s3[..., None] * fc[..., None, :],
    ], axis=-2)  # [..., 4(solutions), 3(points), 3]
    src = jnp.broadcast_to(points3d[..., None, :, :], pc.shape)
    qvec, R, t = rigid_from_points(src, pc)
    return qvec, t, valid


def epnp_solve(points3d, points2d, eps=1e-12):
    """EPnP (N=1 kernel case): pose from >= 4 correspondences.

    points3d: [..., M, 3]; points2d: [..., M, 2] normalized coords.
    Returns (qvec [..., 4], tvec [..., 3], valid [...]).
    Used as the LO-RANSAC non-minimal refitter (ref: absolute_pose.h:97).
    """
    M = points3d.shape[-2]
    # Control points: centroid + principal axes.
    centroid = jnp.mean(points3d, axis=-2, keepdims=True)
    centered = points3d - centroid
    cov = jnp.einsum("...mi,...mj->...ij", centered, centered) / M
    w, V = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(w, eps))
    ctrl = jnp.concatenate([
        centroid,
        centroid + scale[..., 2, None, None] * V[..., :, 2][..., None, :],
        centroid + scale[..., 1, None, None] * V[..., :, 1][..., None, :],
        centroid + scale[..., 0, None, None] * V[..., :, 0][..., None, :],
    ], axis=-2)  # [..., 4, 3]

    # Barycentric coordinates of each point wrt control points.
    Cmat = jnp.concatenate([ctrl.mT, jnp.ones_like(ctrl[..., :1]).mT], axis=-2)  # [..., 4, 4]
    Ph = jnp.concatenate([points3d, jnp.ones_like(points3d[..., :1])], axis=-1)  # [..., M, 4]
    alphas = jnp.einsum("...ij,...mj->...mi", jnp.linalg.inv(Cmat), Ph)  # [..., M, 4]

    # Build M matrix [..., 2M, 12].
    u = points2d[..., 0]
    v = points2d[..., 1]
    zeros = jnp.zeros_like(alphas)
    row_u = jnp.concatenate([alphas, zeros, -u[..., None] * alphas], axis=-1)
    row_v = jnp.concatenate([zeros, alphas, -v[..., None] * alphas], axis=-1)
    # Interleave into [..., 2M, 12] with (x-coef | y-coef | z-coef) per ctrl:
    # here layout: [a1..a4 (x), a1..a4 (y), a1..a4 (z)] reordered to the
    # standard [ctrl1(x,y,z), ...] is unnecessary — consistent layout is all
    # that matters for the nullspace.
    Mm = jnp.concatenate([row_u, row_v], axis=-2)  # [..., 2M, 12]
    MtM = jnp.einsum("...mi,...mj->...ij", Mm, Mm)
    w2, V2 = jnp.linalg.eigh(MtM)
    null = V2[..., :, 0]  # [..., 12] ~ [cx(4), cy(4), cz(4)]
    cc = jnp.stack([null[..., 0:4], null[..., 4:8], null[..., 8:12]], axis=-1)  # [..., 4, 3]

    # Fix scale: distances between camera control points should match world.
    def pdists(p):
        d = p[..., :, None, :] - p[..., None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), eps))

    dw = pdists(ctrl)
    dc = pdists(cc)
    beta = jnp.sum(dw * dc, axis=(-2, -1)) / jnp.maximum(jnp.sum(dc * dc, axis=(-2, -1)), eps)
    cc = cc * beta[..., None, None]
    # Fix sign: points must be in front of the camera.
    pts_cam = jnp.einsum("...mi,...ij->...mj", alphas, cc)
    neg = jnp.sum(pts_cam[..., 2] < 0, axis=-1) > (M // 2)
    cc = jnp.where(neg[..., None, None], -cc, cc)
    pts_cam = jnp.einsum("...mi,...ij->...mj", alphas, cc)

    qvec, R, t = rigid_from_points(points3d, pts_cam)
    valid = jnp.all(jnp.isfinite(t), axis=-1)
    return qvec, t, valid
