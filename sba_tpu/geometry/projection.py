"""Projection math: world -> image, reprojection errors, cheirality.

Capability parity with ref: src/base/projection.{h,cc} and the fork's
`simplePinholeProject` (ref: src/util/utils.h:22), redesigned as batched
array ops over pose arrays ``[..., 4]/[..., 3]`` and point arrays ``[..., 3]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from sba_tpu.geometry import camera_models
from sba_tpu.geometry.quaternions import pose_transform, quat_to_rotmat


def pose_matrix(qvec, tvec):
    """[..., 3, 4] world->camera matrix [R | t]
    (ref: src/base/projection.cc ComposeProjectionMatrix)."""
    R = quat_to_rotmat(qvec)
    return jnp.concatenate([R, tvec[..., :, None]], axis=-1)


def project_simple_pinhole(qvec, tvec, cam_params, points3d, eps=1e-12):
    """SIMPLE_PINHOLE projection of world points.

    The fork's workhorse (ref: src/util/utils.h:22-86 simplePinholeProject):
    x = f * X_cam.x / X_cam.z + cx. Returns (xy [..., 2], depth [...]).
    Unlike the reference (which throws on points behind the camera) the
    caller masks on ``depth > 0`` — no data-dependent control flow under jit.
    """
    p_cam = pose_transform(qvec, tvec, points3d)
    z = p_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > eps, z, eps)
    uv = p_cam[..., :2] / safe_z[..., None]
    f = cam_params[..., 0:1]
    c = cam_params[..., 1:3]
    return f * uv + c, z


def project_points(qvec, tvec, points3d, model_id: int, cam_params, eps=1e-12):
    """Project world points through an arbitrary camera model (static id).

    Returns (xy [..., 2], depth [...]).
    """
    p_cam = pose_transform(qvec, tvec, points3d)
    z = p_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > eps, z, eps)
    uv = p_cam[..., :2] / safe_z[..., None]
    xy = camera_models.world_to_image(model_id, cam_params, uv)
    return xy, z


def reprojection_error(qvec, tvec, points3d, observed_xy, model_id: int, cam_params):
    """Squared reprojection error per observation.

    Mirrors `CalculateSquaredReprojectionError` semantics: points behind the
    camera get a 'max error' surrogate (here: +inf) so filters can threshold
    (ref: src/base/projection.cc).
    """
    xy, z = project_points(qvec, tvec, points3d, model_id, cam_params)
    err = jnp.sum((xy - observed_xy) ** 2, axis=-1)
    return jnp.where(z > 0, err, jnp.inf)


def calculate_depth(qvec, tvec, points3d):
    """Depth of world points in the camera frame
    (ref: src/base/projection.cc CalculateDepth)."""
    return pose_transform(qvec, tvec, points3d)[..., 2]


def has_point_positive_depth(qvec, tvec, points3d):
    return calculate_depth(qvec, tvec, points3d) > 0
