"""Cylinder primitives (tree trunks) for geometric-semantic BA.

Capability parity with ref: src/util/cylinder.h (class `Cylinder`, tangent
`GetEdgePoints`, `ProjectToQuadrilateral`, `ComputeSemanticIoU`) and
src/util/cylinder_by_2_points.h (`CylinderBy2Points`), re-designed as pure
batched JAX functions over cylinder parameter arrays:

- default parametrization: ``qvec [.,4], tvec [.,3], radius [.], height [.]``
  (cylinder frame: base circle center at tvec, axis = +z of the frame);
- 2-point parametrization: ``tvec1 [.,3], tvec2 [.,3], radius [.]``.

The reference rasterizes a hard boolean quadrilateral mask and counts
TP/FP/FN for a non-differentiable IoU evaluated under numeric differences.
The TPU-native design computes the same quadrilateral analytically, then
uses a *soft* half-plane rasterization (sigmoid of signed distances) for a
fully differentiable IoU; a hard mode reproduces the discrete counts for
parity metrics. Both run as one batched VPU evaluation over all
(image x cylinder x pixel) — no per-pixel host loops.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import (
    angle_axis_to_quat,
    pose_inverse,
    pose_transform,
    quat_rotate,
)


# ---------------------------------------------------------------------------
# Host container + text IO (parity with Cylinder::to_string / from-string,
# ref: src/util/cylinder.h:287-330).
# ---------------------------------------------------------------------------

class Cylinder:
    """Host-side cylinder record. qvec w-first; radius/height clamped to
    1e-4 minimum as the reference's Check() does (ref: cylinder.h:246-280)."""

    MIN_SIZE = 1e-4

    def __init__(self, qvec=(1.0, 0.0, 0.0, 0.0), tvec=(0.0, 0.0, 0.0),
                 radius=1.0, height=1.0):
        self.qvec = np.asarray(qvec, dtype=np.float64)
        self.tvec = np.asarray(tvec, dtype=np.float64)
        self.radius = max(float(radius), self.MIN_SIZE)
        self.height = max(float(height), self.MIN_SIZE)

    def upper_tvec(self) -> np.ndarray:
        """Center of the upper circle = tvec + R(q) @ (0, 0, h)."""
        z = np.array([0.0, 0.0, self.height])
        from sba_tpu.geometry.quaternions import np_quat_rotate
        return self.tvec + np_quat_rotate(self.qvec, z)

    def __repr__(self):
        return f"Cylinder(q={self.qvec}, t={self.tvec}, r={self.radius}, h={self.height})"


def cylinder_to_string(c: Cylinder) -> str:
    """Serialize: `q w x y z t x y z r R h H` (ref: cylinder.h:287-297)."""
    q = " ".join(repr(float(v)) for v in c.qvec)
    t = " ".join(repr(float(v)) for v in c.tvec)
    return f"q {q} t {t} r {repr(c.radius)} h {repr(c.height)}"


def cylinder_from_string(s: str) -> Cylinder:
    tok = s.split()
    if tok[0] != "q" or tok[5] != "t" or tok[9] != "r" or tok[11] != "h":
        raise ValueError(f"bad cylinder string: {s!r}")
    return Cylinder(
        qvec=[float(x) for x in tok[1:5]],
        tvec=[float(x) for x in tok[6:9]],
        radius=float(tok[10]),
        height=float(tok[12]),
    )


def read_cylinders_text(path) -> List[Cylinder]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(cylinder_from_string(line))
    return out


def write_cylinders_text(cylinders, path) -> None:
    with open(path, "w") as f:
        for c in cylinders:
            f.write(cylinder_to_string(c) + "\n")


def cylinder_from_two_points(tvec1, tvec2, radius) -> Cylinder:
    """CylinderBy2Points -> Cylinder (ref: cylinder_by_2_points.h:84-108):
    axis from +z to (t2 - t1) via cross-product angle-axis."""
    t1 = np.asarray(tvec1, dtype=np.float64)
    t2 = np.asarray(tvec2, dtype=np.float64)
    d = t2 - t1
    h = float(np.linalg.norm(d))
    d = d / max(h, 1e-12)
    z = np.array([0.0, 0.0, 1.0])
    axis = np.cross(z, d)
    n = np.linalg.norm(axis)
    axis = np.array([1.0, 0.0, 0.0]) if n < 1e-10 else axis / n
    angle = float(np.arccos(np.clip(np.dot(z, d), -1.0, 1.0)))
    from sba_tpu.geometry.quaternions import np_angle_axis_to_quat
    q = np_angle_axis_to_quat(angle * axis)
    return Cylinder(qvec=q, tvec=t1, radius=radius, height=h)


def two_points_from_cylinder(c: Cylinder):
    return c.tvec.copy(), c.upper_tvec(), c.radius


# ---------------------------------------------------------------------------
# Batched device math.
# ---------------------------------------------------------------------------

def stack_cylinders(cylinders: List[Cylinder]):
    """-> dict of arrays {qvec [K,4], tvec [K,3], radius [K], height [K]}."""
    return {
        "qvec": jnp.asarray(np.stack([c.qvec for c in cylinders])),
        "tvec": jnp.asarray(np.stack([c.tvec for c in cylinders])),
        "radius": jnp.asarray(np.array([c.radius for c in cylinders])),
        "height": jnp.asarray(np.array([c.height for c in cylinders])),
    }


def cylinder_edge_points(cyl_qvec, cyl_tvec, radius, height, cam_qvec, cam_tvec):
    """Tangent ('edge') points of the cylinder silhouette seen from a camera.

    Batched port of the reference's construction
    (ref: src/util/cylinder.h:352-425 GetEdgePoints): transform the camera
    center into the cylinder frame, drop z, rotate the radial direction by
    +/- beta = acos(r / dist) about the cylinder axis, lift by the height,
    transform back to world. Returns p1, p2, p3, p4 ``[..., 3]`` (p1/p2 on
    the base circle, p3 above p2, p4 above p1) and ``valid`` (camera outside
    the infinite cylinder). Instead of throwing (reference behavior) the
    invalid case is masked.
    """
    cam_q_inv, cam_center = pose_inverse(cam_qvec, cam_tvec)
    cyl_q_inv, cyl_t_inv = pose_inverse(cyl_qvec, cyl_tvec)
    c_in_cyl = pose_transform(cyl_q_inv, cyl_t_inv, cam_center)
    cxy = c_in_cyl[..., :2]
    dist = jnp.linalg.norm(cxy, axis=-1)
    valid = dist > radius

    safe_dist = jnp.maximum(dist, 1e-12)
    # Direction from cylinder axis toward projected camera center, length r.
    dir_xy = cxy / safe_dist[..., None] * radius[..., None]
    beta = jnp.arccos(jnp.clip(radius / safe_dist, -1.0, 1.0))

    cos_b = jnp.cos(beta)
    sin_b = jnp.sin(beta)

    def rot_z(v, c, s):
        x, y = v[..., 0], v[..., 1]
        return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)

    p1_xy = rot_z(dir_xy, cos_b, sin_b)    # +beta
    p2_xy = rot_z(dir_xy, cos_b, -sin_b)   # -beta
    zeros = jnp.zeros_like(p1_xy[..., :1])
    h = height[..., None]
    p1 = jnp.concatenate([p1_xy, zeros], axis=-1)
    p2 = jnp.concatenate([p2_xy, zeros], axis=-1)
    p3 = jnp.concatenate([p2_xy, zeros + h], axis=-1)
    p4 = jnp.concatenate([p1_xy, zeros + h], axis=-1)

    to_world = lambda p: pose_transform(cyl_qvec, cyl_tvec, p)
    return to_world(p1), to_world(p2), to_world(p3), to_world(p4), valid


def project_quadrilateral(cyl_qvec, cyl_tvec, radius, height,
                          cam_qvec, cam_tvec, cam_params):
    """Project the 4 silhouette edge points with a SIMPLE_PINHOLE camera and
    orient them counter-clockwise in image coords
    (ref: src/util/cylinder.h:429-474 ProjectToQuadrilateral).

    Returns (p [..., 4, 2], valid [...]) where valid also requires all four
    points in front of the camera.
    """
    p1, p2, p3, p4, valid = cylinder_edge_points(
        cyl_qvec, cyl_tvec, radius, height, cam_qvec, cam_tvec)
    pts = jnp.stack([p1, p2, p3, p4], axis=-2)  # [..., 4, 3]
    p_cam = pose_transform(cam_qvec[..., None, :], cam_tvec[..., None, :], pts)
    z = p_cam[..., 2]
    valid = valid & jnp.all(z > 0, axis=-1)
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    uv = p_cam[..., :2] / safe_z[..., None]
    f = cam_params[..., None, 0:1]
    c = cam_params[..., None, 1:3]
    xy = f * uv + c  # [..., 4, 2]

    # Orientation fix: if (p2-p1) x (p3-p1) < 0 swap p2 <-> p4.
    v0 = xy[..., 1, :] - xy[..., 0, :]
    v1 = xy[..., 2, :] - xy[..., 0, :]
    cross = v0[..., 0] * v1[..., 1] - v0[..., 1] * v1[..., 0]
    swap = cross < 0
    p2n = jnp.where(swap[..., None], xy[..., 3, :], xy[..., 1, :])
    p4n = jnp.where(swap[..., None], xy[..., 1, :], xy[..., 3, :])
    xy = jnp.stack([xy[..., 0, :], p2n, xy[..., 2, :], p4n], axis=-2)
    return xy, valid


def quadrilateral_mask(quad_xy, height: int, width: int, soft_tau=1.0, hard=False):
    """Rasterize a convex CCW quadrilateral into an [H, W] mask.

    TPU-native replacement for the reference's bbox + 4-half-plane-clears
    rasterizer (ref: src/util/cylinder.h:29-121 drawQuadrilateral): a pixel
    is inside iff it lies on the non-positive side of every directed edge
    (the reference zeroes pixels with cross > 0 for each edge — identical
    semantics for convex CCW quads). ``soft_tau`` controls the sigmoid
    sharpness of the soft (differentiable) mask; ``hard=True`` gives the
    reference's 0/1 mask.

    quad_xy: [..., 4, 2]; returns [..., H, W] float mask in [0, 1].
    """
    ys = jnp.arange(height, dtype=quad_xy.dtype)
    xs = jnp.arange(width, dtype=quad_xy.dtype)
    px = xs[None, :]  # [1, W]
    py = ys[:, None]  # [H, 1]

    mask = None
    for e in range(4):
        a = quad_xy[..., e, :]
        b = quad_xy[..., (e + 1) % 4, :]
        ax, ay = a[..., 0], a[..., 1]
        bx, by = b[..., 0], b[..., 1]
        # cross = (px - ax) * (by - ay) - (py - ay) * (bx - ax), per pixel.
        cross = ((px - ax[..., None, None]) * (by - ay)[..., None, None]
                 - (py - ay[..., None, None]) * (bx - ax)[..., None, None])
        if hard:
            inside = (cross <= 0).astype(quad_xy.dtype)
        else:
            # Normalize by edge length so tau is in pixels.
            el = jnp.sqrt((bx - ax) ** 2 + (by - ay) ** 2)
            d = cross / jnp.maximum(el, 1e-12)[..., None, None]
            inside = jax.nn.sigmoid(-d / soft_tau)
        mask = inside if mask is None else mask * inside
    return mask


def semantic_iou(mask, semantic_bool, eps=1e-9):
    """IoU between a (soft or hard) mask and a boolean semantic map.

    tp / (tp + fp + fn) over the full image, batched over leading dims
    (ref: src/util/cylinder.h:497-540 ComputeSemanticIoU — the reference
    restricts counting to the bbox purely as a CPU optimization; totals are
    identical).
    """
    sem = semantic_bool.astype(mask.dtype)
    tp = jnp.sum(mask * sem, axis=(-2, -1))
    fp = jnp.sum(mask * (1.0 - sem), axis=(-2, -1))
    fn = jnp.sum((1.0 - mask) * sem, axis=(-2, -1))
    return tp / jnp.maximum(tp + fp + fn, eps)
