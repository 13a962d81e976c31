"""Synthetic scene generation for tests and benchmarks.

Mirrors the style of the reference's BA unit tests, which build tiny exact
reconstructions and assert parameter recovery
(ref: src/optim/bundle_adjustment_test.cc GenerateReconstruction).
"""

from __future__ import annotations

import numpy as np

from sba_tpu.geometry.quaternions import quat_normalize, quat_rotate
from sba_tpu.optim.ba import BAProblem, MAXP

import jax.numpy as jnp


def make_ba_problem(
    num_images: int = 6,
    num_points: int = 100,
    model_id: int = 0,
    pixel_noise: float = 0.0,
    pose_noise: float = 0.0,
    point_noise: float = 0.0,
    seed: int = 0,
    image_size=(640, 480),
    focal: float = 500.0,
    dtype=np.float64,
    observations_per_point: int | None = None,
):
    """Build a synthetic BA problem with known ground truth.

    Cameras on an arc looking at a point cloud in front of them; every point
    observed by all (or a subset of) images. Returns (problem, truth dict).
    Gauge is fixed as the reference's SBA controller does: pose 0 fully
    constant, tvec[0] of image 1 constant
    (ref: src/controllers/semantic_bundle_adjustment.cc:106-109).
    """
    rng = np.random.default_rng(seed)
    w, h = image_size

    # Ground-truth points in a box in front of the rig.
    pts = rng.uniform([-3, -2, 6], [3, 2, 12], size=(num_points, 3))

    # Cameras along x with small rotations.
    qvecs = np.zeros((num_images, 4))
    tvecs = np.zeros((num_images, 3))
    for i in range(num_images):
        aa = rng.normal(scale=0.03, size=3)
        angle = np.linalg.norm(aa)
        axis = aa / max(angle, 1e-12)
        qvecs[i] = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
        centers = np.array([-2.0 + 4.0 * i / max(num_images - 1, 1),
                            0.2 * rng.normal(), 0.1 * rng.normal()])
        # tvec = -R c
        tvecs[i] = -np.asarray(quat_rotate(jnp.asarray(qvecs[i]), jnp.asarray(centers)))

    from sba_tpu.geometry import camera_models
    spec = camera_models.model_by_id(model_id)
    params = np.array(spec.init_params(focal, w, h))
    cam_params = np.zeros((1, MAXP))
    cam_params[0, : len(params)] = params

    # Observations.
    obs_image, obs_point, obs_xy = [], [], []
    for i in range(num_images):
        p_cam = np.asarray(quat_rotate(jnp.asarray(qvecs[i]), jnp.asarray(pts))) + tvecs[i]
        uv = p_cam[:, :2] / p_cam[:, 2:3]
        xy = np.asarray(spec.world_to_image(jnp.asarray(params), jnp.asarray(uv)))
        vis = (p_cam[:, 2] > 0.1) & (xy[:, 0] >= 0) & (xy[:, 0] < w) & (xy[:, 1] >= 0) & (xy[:, 1] < h)
        idx = np.nonzero(vis)[0]
        if observations_per_point is not None:
            idx = idx[rng.random(len(idx)) < observations_per_point / num_images]
        obs_image.append(np.full(len(idx), i))
        obs_point.append(idx)
        noisy = xy[idx] + rng.normal(scale=pixel_noise, size=(len(idx), 2)) if pixel_noise else xy[idx]
        obs_xy.append(noisy)
    obs_image = np.concatenate(obs_image).astype(np.int32)
    obs_point = np.concatenate(obs_point).astype(np.int32)
    obs_xy = np.concatenate(obs_xy)

    truth = dict(qvecs=qvecs.copy(), tvecs=tvecs.copy(), points=pts.copy(),
                 cam_params=cam_params.copy())

    # Perturb initial values.
    q0 = qvecs + rng.normal(scale=pose_noise, size=qvecs.shape)
    q0 = np.array(quat_normalize(jnp.asarray(q0)))
    t0 = tvecs + rng.normal(scale=pose_noise, size=tvecs.shape)
    x0 = pts + rng.normal(scale=point_noise, size=pts.shape)
    # Gauge-fixed images keep their ground-truth values.
    q0[0], t0[0] = qvecs[0], tvecs[0]
    if num_images > 1:
        t0[1, 0] = tvecs[1, 0]

    free_rot = np.ones(num_images)
    free_trans = np.ones((num_images, 3))
    free_rot[0] = 0.0
    free_trans[0] = 0.0
    if num_images > 1:
        free_trans[1, 0] = 0.0

    problem = BAProblem(
        qvecs=jnp.asarray(q0, dtype), tvecs=jnp.asarray(t0, dtype),
        points=jnp.asarray(x0, dtype), cam_params=jnp.asarray(cam_params, dtype),
        obs_image=jnp.asarray(obs_image), obs_point=jnp.asarray(obs_point),
        obs_cam=jnp.zeros_like(jnp.asarray(obs_image)),
        obs_xy=jnp.asarray(obs_xy, dtype),
        obs_mask=jnp.ones(len(obs_image), dtype),
        free_rot=jnp.asarray(free_rot, dtype),
        free_trans=jnp.asarray(free_trans, dtype),
        free_points=jnp.ones(num_points, dtype),
        free_cam=jnp.zeros((1, MAXP), dtype),  # intrinsics constant by default
    )
    return problem, truth
