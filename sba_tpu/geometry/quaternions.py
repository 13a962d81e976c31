"""Quaternion and rigid-pose algebra, batched and jit-friendly.

Conventions (matching the reference COLMAP fork so models interchange):

- Quaternions are Hamilton, stored ``[w, x, y, z]`` (w first), as in
  `ceres::QuaternionRotatePoint` used throughout the reference
  (ref: src/util/rotation_extension.h:15-98).
- A pose ``(qvec, tvec)`` maps WORLD -> CAMERA: ``x_cam = R(q) @ x_world + t``
  (ref: src/base/pose.h / src/base/projection.cc semantics).
- ``pose_inverse``: ``q^-1 = conj(q)/|q|``, ``t^-1 = -R(q^-1) t``
  (ref: src/util/rotation_extension.h:44-58).
- ``pose_product``: ``(qA,tA) o (qB,tB) = (qA qB, R(qA) tB + tA)``
  (ref: src/util/rotation_extension.h:90-100).

All functions broadcast over leading batch dimensions: every input may carry
arbitrary leading axes as long as they broadcast together. This is the
TPU-first replacement for the reference's per-scalar Eigen/ceres loops — one
call evaluates whole pose arrays ``[N, 4]`` / ``[N, 3]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q, eps=1e-12):
    """Return the unit quaternion. q: [..., 4] (w, x, y, z)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_conjugate(q):
    """Conjugate [w, -x, -y, -z]."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse_rotation(q):
    """Inverse rotation quaternion = normalized conjugate.

    Mirrors `ceres::QuaternionInverseRotation` (normalizes first;
    ref: src/util/rotation_extension.h:60-78).
    """
    return quat_conjugate(quat_normalize(q))


def quat_multiply(qa, qb):
    """Hamilton product qa * qb, [..., 4] each, broadcasting."""
    aw, ax, ay, az = qa[..., 0], qa[..., 1], qa[..., 2], qa[..., 3]
    bw, bx, by, bz = qb[..., 0], qb[..., 1], qb[..., 2], qb[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, p):
    """Rotate points p [..., 3] by unit-normalized q [..., 4].

    Uses the expanded (matrix-free) form: p' = p + 2 w (v x p) + 2 v x (v x p)
    after normalization — no 3x3 materialization, pure VPU ops.
    """
    q = quat_normalize(q)
    w = q[..., :1]
    v = q[..., 1:]
    vxp = jnp.cross(v, p)
    return p + 2.0 * (w * vxp + jnp.cross(v, vxp))


def quat_to_rotmat(q):
    """Unit-normalized quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rotmat_to_quat(R):
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w >= 0).

    Branch-free (selects among the four Shepperd candidates by the largest
    denominator) so it vmaps/jits cleanly on TPU.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q*q_k vectors (unnormalized), one per pivot.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pivot scores: the diagonal-based discriminants.
    s = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(s, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(pivot), 4(coeff)]
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def angle_axis_to_quat(aa):
    """Angle-axis [..., 3] (axis * angle) -> quaternion [..., 4].

    Differentiable at aa = 0: the norm is never differentiated at zero
    (the small-angle branch uses the polynomial Taylor series in |aa|^2,
    and sqrt only sees values bounded away from 0). This matters because
    the BA Jacobians are evaluated exactly at the zero retraction point.
    """
    n2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    small = n2 < 1e-14
    safe_n2 = jnp.where(small, 1.0, n2)  # sqrt grad safe
    angle = jnp.sqrt(safe_n2)
    half = 0.5 * angle
    # sin(a/2)/a = 1/2 - a^2/48 + O(a^4);  cos(a/2) = 1 - a^2/8 + O(a^4)
    k = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - n2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * aa], axis=-1)


def quat_to_angle_axis(q):
    """Quaternion [..., 4] -> angle-axis [..., 3]."""
    q = quat_normalize(q)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    s2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = s2 < 1e-14
    sin_half = jnp.sqrt(jnp.where(small, 1.0, s2))
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # angle/sin_half -> 2/w - (2/(3 w^3)) s2 + ... ; near identity w ~ 1.
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-6) - 2.0 * s2 / 3.0,
                  angle / sin_half)
    return k * v


def angle_axis_rotate(aa, p):
    """Rotate p [..., 3] by angle-axis aa [..., 3] (Rodrigues)."""
    return quat_rotate(angle_axis_to_quat(aa), p)


def quat_retract(q, delta):
    """Manifold retraction: apply a local so(3) update delta [..., 3] to q.

    q_new = q * exp(delta/2) — right-multiplicative local parametrization,
    equivalent to Ceres's quaternion manifold Plus used by the reference's BA
    (ref: src/optim/semantic_bundle_adjustment.cc:670-693 quaternion
    manifolds). This is how the LM engine applies 3-DoF rotation steps.
    """
    return quat_normalize(quat_multiply(q, angle_axis_to_quat(delta)))


def pose_inverse(qvec, tvec):
    """Invert a world->camera pose. Returns (q_inv, t_inv).

    t_inv = -R(q_inv) t (ref: src/util/rotation_extension.h:44-58).
    """
    q_inv = quat_inverse_rotation(qvec)
    return q_inv, -quat_rotate(q_inv, tvec)


def pose_product(qa, ta, qb, tb):
    """Compose poses: result maps x -> R_A (R_B x + t_B) + t_A.

    (ref: src/util/rotation_extension.h:90-100).
    """
    return quat_multiply(qa, qb), quat_rotate(qa, tb) + ta


def pose_transform(qvec, tvec, points):
    """Apply pose to points [..., 3]: R(q) p + t."""
    return quat_rotate(qvec, points) + tvec


def quat_slerp(q0, q1, t):
    """Spherical interpolation between unit quaternions (for pose interp,
    ref capability: src/base/pose.cc InterpolatePose)."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(jnp.clip(d, -1.0, 1.0))
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-20))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-20))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# Numpy (host) variants — for host-side loops (mapper, reconstruction
# maintenance, exporters). Dispatching one-quaternion jnp calls to the
# accelerator costs a host sync each (see utils/host.py); these run in
# microseconds on the CPU with identical math.
# ---------------------------------------------------------------------------

def np_quat_rotate(q, v):
    """Numpy quaternion rotation. q [..., 4] w-first (broadcastable
    against v's batch dims), v [..., 3]. Normalizes q first — same
    semantics as `quat_rotate`."""
    import numpy as np

    q = np.asarray(q, np.float64)
    v = np.asarray(v, np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    q = np.broadcast_to(q, v.shape[:-1] + (4,))
    w = q[..., :1]
    u = q[..., 1:]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def np_quat_to_rotmat(q):
    """Numpy quaternion -> rotation matrix. q [4] w-first (normalized or
    not — normalizes internally like `quat_to_rotmat`)."""
    import numpy as np

    q = np.asarray(q, np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])


def np_quat_conjugate(q):
    import numpy as np

    q = np.asarray(q, np.float64)
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def np_quat_normalize(q, eps=1e-12):
    import numpy as np

    q = np.asarray(q, np.float64)
    n = np.linalg.norm(q, axis=-1, keepdims=True)
    return q / np.maximum(n, eps)


def np_rotmat_to_quat(R):
    """Numpy rotation matrix -> w-first quaternion (Shepperd; same
    branch selection as `rotmat_to_quat`)."""
    import numpy as np

    R = np.asarray(R, np.float64)
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = 2.0 * np.sqrt(tr + 1.0)
        q = np.array([0.25 * s, (m21 - m12) / s, (m02 - m20) / s,
                      (m10 - m01) / s])
    elif m00 >= m11 and m00 >= m22:
        s = 2.0 * np.sqrt(1.0 + m00 - m11 - m22)
        q = np.array([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s,
                      (m02 + m20) / s])
    elif m11 >= m22:
        s = 2.0 * np.sqrt(1.0 + m11 - m00 - m22)
        q = np.array([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s,
                      (m12 + m21) / s])
    else:
        s = 2.0 * np.sqrt(1.0 + m22 - m00 - m11)
        q = np.array([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s,
                      0.25 * s])
    return np_quat_normalize(q)


def np_quat_to_angle_axis(q):
    import numpy as np

    q = np_quat_normalize(q)
    w = np.clip(q[0], -1.0, 1.0)
    angle = 2.0 * np.arccos(np.abs(w))
    sin_half = np.sqrt(max(1.0 - w * w, 0.0))
    axis = q[1:] * (np.sign(w) if w != 0 else 1.0)
    if sin_half < 1e-12:
        return 2.0 * axis  # small-angle: aa ~ 2 * (x,y,z) * sign(w)
    return axis / sin_half * angle


def np_angle_axis_to_quat(aa):
    import numpy as np

    aa = np.asarray(aa, np.float64)
    angle = np.linalg.norm(aa)
    if angle < 1e-12:
        return np_quat_normalize(np.concatenate([[1.0], 0.5 * aa]))
    axis = aa / angle
    return np.concatenate([[np.cos(angle / 2.0)],
                           np.sin(angle / 2.0) * axis])
