"""Triangulation: DLT multi-view, midpoint two-view, angle checks.

Capability parity with ref: src/base/triangulation.{h,cc}, batched:
one call triangulates whole arrays of tracks (padded + masked) so the
incremental mapper's per-track loops become a single device launch.
"""

from __future__ import annotations

import jax.numpy as jnp

from sba_tpu.geometry.projection import pose_matrix
from sba_tpu.geometry.quaternions import pose_inverse, quat_rotate


def triangulate_point(proj1, proj2, xy1, xy2):
    """Two-view DLT triangulation (ref: src/base/triangulation.cc
    TriangulatePoint). proj*: [..., 3, 4] matrices, xy*: [..., 2] normalized
    or pixel coords consistent with the matrices. Returns [..., 3]."""
    rows = jnp.stack(
        [
            xy1[..., 0, None] * proj1[..., 2, :] - proj1[..., 0, :],
            xy1[..., 1, None] * proj1[..., 2, :] - proj1[..., 1, :],
            xy2[..., 0, None] * proj2[..., 2, :] - proj2[..., 0, :],
            xy2[..., 1, None] * proj2[..., 2, :] - proj2[..., 1, :],
        ],
        axis=-2,
    )  # [..., 4, 4]
    # Smallest right singular vector.
    _, _, vt = jnp.linalg.svd(rows)
    h = vt[..., -1, :]
    return h[..., :3] / jnp.where(jnp.abs(h[..., 3:]) > 1e-12, h[..., 3:], 1e-12)


def triangulate_multiview(proj, xy, mask):
    """N-view DLT via normal equations of the homogeneous system.

    proj: [..., M, 3, 4], xy: [..., M, 2], mask: [..., M] bool — padded
    views contribute zero rows. Solves min ||A h|| via the smallest
    eigenvector of A^T A (4x4 symmetric, eigh is TPU-safe).
    (ref: src/base/triangulation.cc TriangulateMultiViewPoint.)
    """
    r0 = xy[..., 0, None] * proj[..., 2, :] - proj[..., 0, :]
    r1 = xy[..., 1, None] * proj[..., 2, :] - proj[..., 1, :]
    rows = jnp.concatenate([r0, r1], axis=-2) if r0.ndim == 2 else jnp.stack([r0, r1], axis=-2)
    # rows: [..., M, 2, 4] -> [..., 2M, 4]
    rows = jnp.stack([r0, r1], axis=-2).reshape(xy.shape[:-2] + (-1, 4))
    m2 = jnp.repeat(mask, 2, axis=-1)[..., None]
    rows = rows * m2
    ata = jnp.einsum("...ma,...mb->...ab", rows, rows)
    w, v = jnp.linalg.eigh(ata)
    h = v[..., :, 0]  # eigenvector of smallest eigenvalue
    return h[..., :3] / jnp.where(jnp.abs(h[..., 3:]) > 1e-12, h[..., 3:], 1e-12)


def triangulate_points_batch(qvec1, tvec1, qvec2, tvec2, xy1, xy2):
    """Batched two-view triangulation from poses + normalized image coords.

    Uses [R|t] matrices directly; xy are *normalized* camera coords
    (undistorted, focal-normalized) as in the reference's usage.
    """
    p1 = pose_matrix(qvec1, tvec1)
    p2 = pose_matrix(qvec2, tvec2)
    return triangulate_point(p1, p2, xy1, xy2)


def triangulate_midpoint(qvec1, tvec1, qvec2, tvec2, xy1, xy2):
    """Midpoint triangulation of bearing rays (two-view).

    xy: normalized coords. Returns the 3D midpoint of the closest points on
    the two rays (used by the reference's optimal-triangulation fallbacks).
    """
    q1i, c1 = pose_inverse(qvec1, tvec1)
    q2i, c2 = pose_inverse(qvec2, tvec2)
    d1 = quat_rotate(q1i, jnp.concatenate([xy1, jnp.ones_like(xy1[..., :1])], axis=-1))
    d2 = quat_rotate(q2i, jnp.concatenate([xy2, jnp.ones_like(xy2[..., :1])], axis=-1))
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    # Solve for s, t minimizing ||c1 + s d1 - (c2 + t d2)||^2.
    b = c2 - c1
    d1d2 = jnp.sum(d1 * d2, axis=-1)
    denom = 1.0 - d1d2 * d1d2
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    bd1 = jnp.sum(b * d1, axis=-1)
    bd2 = jnp.sum(b * d2, axis=-1)
    s = (bd1 - d1d2 * bd2) / safe
    t = (d1d2 * bd1 - bd2) / safe
    pa = c1 + s[..., None] * d1
    pb = c2 + t[..., None] * d2
    return 0.5 * (pa + pb)


def triangulation_angle(center1, center2, points3d):
    """Angle at the 3D point between the two camera centers, radians
    (ref: src/base/triangulation.cc CalculateTriangulationAngle)."""
    base2 = jnp.sum((center1 - center2) ** 2, axis=-1)
    r1 = jnp.sum((points3d - center1) ** 2, axis=-1)
    r2 = jnp.sum((points3d - center2) ** 2, axis=-1)
    denom = 2.0 * jnp.sqrt(jnp.maximum(r1 * r2, 1e-20))
    cos_a = (r1 + r2 - base2) / denom
    angle = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
    # As in the reference: the triangulation angle is min(angle, pi - angle).
    return jnp.minimum(angle, jnp.pi - angle)
