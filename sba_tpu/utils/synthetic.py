"""Synthetic scene generation for tests and benchmarks.

Mirrors the style of the reference's BA unit tests, which build tiny exact
reconstructions and assert parameter recovery
(ref: src/optim/bundle_adjustment_test.cc GenerateReconstruction).
"""

from __future__ import annotations

import numpy as np

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
        tvecs[i] = -_np_quat_rotate(qvecs[i][None], centers[None])[0]

    from sba_tpu.geometry import camera_models
    from sba_tpu.utils.host import on_host

    spec = camera_models.model_by_id(model_id)
    with on_host():
        params = np.array(spec.init_params(focal, w, h))
    cam_params = np.zeros((1, MAXP))
    cam_params[0, : len(params)] = params

    # Observations. Camera-model projection is jnp code — run it on the
    # host CPU backend (utils/host.py: a TPU round-trip here would slow
    # every later sync in the process).
    obs_image, obs_point, obs_xy = [], [], []
    for i in range(num_images):
        p_cam = _np_quat_rotate(
            np.broadcast_to(qvecs[i], (len(pts), 4)), pts) + tvecs[i]
        uv = p_cam[:, :2] / p_cam[:, 2:3]
        with on_host():
            xy = np.asarray(spec.world_to_image(jnp.asarray(params),
                                                jnp.asarray(uv)))
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
    q0 = q0 / np.maximum(np.linalg.norm(q0, axis=-1, keepdims=True), 1e-12)
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

    # HOST-leaf problem (numpy): layout prep (`attach_gather_layouts`,
    # `ba_fused.prepare`) reads these arrays on the host; keeping them
    # off the chip until solve time avoids device->host reads during
    # prep (utils/host.py). jit transfers them H2D on first use.
    problem = BAProblem(
        qvecs=np.asarray(q0, dtype), tvecs=np.asarray(t0, dtype),
        points=np.asarray(x0, dtype), cam_params=np.asarray(cam_params, dtype),
        obs_image=obs_image, obs_point=obs_point,
        obs_cam=np.zeros_like(obs_image),
        obs_xy=np.asarray(obs_xy, dtype),
        obs_mask=np.ones(len(obs_image), dtype),
        free_rot=np.asarray(free_rot, dtype),
        free_trans=np.asarray(free_trans, dtype),
        free_points=np.ones(num_points, dtype),
        free_cam=np.zeros((1, MAXP), dtype),  # intrinsics constant by default
    )
    from sba_tpu.optim.ba import attach_gather_layouts

    return attach_gather_layouts(problem), truth


def _np_quat_rotate(q, v):
    """Vectorized numpy quaternion rotation: q [N,4] w-first, v [N,3]."""
    w, x, y, z = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    u = q[:, 1:]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def make_sequential_ba_problem(
    num_images: int = 1024,
    num_points: int = 100_000,
    track_len: int = 6,
    pose_noise: float = 0.003,
    point_noise: float = 0.02,
    pixel_noise: float = 0.5,
    seed: int = 0,
    image_size=(640, 480),
    focal: float = 500.0,
    dtype=np.float32,
):
    """Large sequential-capture scene, fully numpy-vectorized.

    Cameras travel along a corridor; each point is observed by a
    contiguous window of `track_len` nearby images — the track locality
    of real video / ordered-capture SfM (and the access pattern the
    ranged fused BA kernels exploit). Unlike `make_ba_problem` (arc rig,
    every point visible everywhere, per-image Python loop) this scales
    to thousands of images / millions of observations in seconds.

    Returns (problem, truth) like `make_ba_problem`; every track is
    exactly `track_len` so the fused path needs a single bucket.
    """
    rng = np.random.default_rng(seed)
    w, h = image_size
    spacing = 0.5

    # Camera centers along x, jittered; small random rotations.
    centers = np.stack([
        np.arange(num_images) * spacing,
        0.2 * rng.normal(size=num_images),
        0.1 * rng.normal(size=num_images)], axis=1)
    aa = rng.normal(scale=0.02, size=(num_images, 3))
    angle = np.linalg.norm(aa, axis=1, keepdims=True)
    axis = aa / np.maximum(angle, 1e-12)
    qvecs = np.concatenate(
        [np.cos(angle / 2), np.sin(angle / 2) * axis], axis=1)
    tvecs = -_np_quat_rotate(qvecs, centers)

    # Each point anchored to a window start s in [0, num_images -
    # track_len]; placed inside the shared viewing frustum of its
    # window: depth z' in front of the mid camera, lateral spread
    # bounded so all window cameras keep it in view.
    s0 = rng.integers(0, num_images - track_len + 1, size=num_points)
    mid = centers[np.minimum(s0 + track_len // 2, num_images - 1)]
    depth = rng.uniform(6.0, 12.0, size=num_points)
    lat = rng.uniform(-2.0, 2.0, size=num_points)
    vert = rng.uniform(-1.5, 1.5, size=num_points)
    pts = mid + np.stack([lat, vert, depth], axis=1)

    obs_point = np.repeat(np.arange(num_points, dtype=np.int64), track_len)
    obs_image = (s0[:, None] + np.arange(track_len)[None, :]) \
        .reshape(-1).astype(np.int64)
    p_cam = _np_quat_rotate(qvecs[obs_image], pts[obs_point]) \
        + tvecs[obs_image]
    z = np.maximum(p_cam[:, 2], 1e-6)
    uv = p_cam[:, :2] / z[:, None]
    xy = focal * uv + np.array([w / 2.0, h / 2.0])
    if pixel_noise:
        xy = xy + rng.normal(scale=pixel_noise, size=xy.shape)
    # Keep static shapes: out-of-view observations are masked, not
    # dropped (every track stays exactly track_len slots).
    mask = ((p_cam[:, 2] > 0.1) & (xy[:, 0] >= -50) & (xy[:, 0] < w + 50)
            & (xy[:, 1] >= -50) & (xy[:, 1] < h + 50)).astype(np.float64)

    cam_params = np.zeros((1, MAXP))
    cam_params[0, :3] = [focal, w / 2.0, h / 2.0]

    truth = dict(qvecs=qvecs.copy(), tvecs=tvecs.copy(), points=pts.copy(),
                 cam_params=cam_params.copy())

    # Perturb rotation and camera CENTER (not tvec): tvec noise with a
    # fixed rotation would be fine, but rotation noise at fixed tvec
    # swings the center by |dtheta| * |center| — which grows with the
    # corridor length and blows up residuals at thousands of images.
    q0 = qvecs + rng.normal(scale=pose_noise, size=qvecs.shape)
    q0 = q0 / np.linalg.norm(q0, axis=1, keepdims=True)
    c0 = centers + rng.normal(scale=pose_noise, size=centers.shape)
    t0 = -_np_quat_rotate(q0, c0)
    x0 = pts + rng.normal(scale=point_noise, size=pts.shape)
    q0[0], t0[0] = qvecs[0], tvecs[0]
    t0[1, 0] = tvecs[1, 0]

    free_rot = np.ones(num_images)
    free_trans = np.ones((num_images, 3))
    free_rot[0] = 0.0
    free_trans[0] = 0.0
    free_trans[1, 0] = 0.0

    # HOST-leaf problem (numpy): see make_ba_problem / utils/host.py.
    problem = BAProblem(
        qvecs=np.asarray(q0, dtype), tvecs=np.asarray(t0, dtype),
        points=np.asarray(x0, dtype),
        cam_params=np.asarray(cam_params, dtype),
        obs_image=np.asarray(obs_image, np.int32),
        obs_point=np.asarray(obs_point, np.int32),
        obs_cam=np.zeros(len(obs_image), np.int32),
        obs_xy=np.asarray(xy, dtype),
        obs_mask=np.asarray(mask, dtype),
        free_rot=np.asarray(free_rot, dtype),
        free_trans=np.asarray(free_trans, dtype),
        free_points=np.ones(num_points, dtype),
        free_cam=np.zeros((1, MAXP), dtype),
    )
    from sba_tpu.optim.ba import attach_gather_layouts

    return attach_gather_layouts(problem), truth


def make_sba_scene(
    num_images: int = 4,
    image_size=(64, 48),
    focal: float = 60.0,
    plane_z: float = 5.0,
    cell: float = 1.0,
    num_labels: int = 5,
    pose_noise: float = 0.0,
    seed: int = 0,
    relief: float = 0.6,
):
    """Synthetic scene for semantic BA: cameras above a labeled relief
    surface z = plane_z + relief * sin(1.3 x) sin(1.7 y), with ray-marched
    depth + aperiodic semantic maps.

    A flat plane would be DEGENERATE for the pairwise dense cost: the
    plane-induced homography ambiguity (delta_R = -delta_t n^T / d) leaves
    the pixel warp invariant and the loose depth gate cannot pin it down —
    so the surface must be non-planar for pose observability. Returns
    (qvecs_gt [N,4], tvecs_gt [N,3], cam_params [N,3], depth [N,H,W],
    semantic [N,H,W], qvecs_init, tvecs_init).
    """

    rng = np.random.default_rng(seed)
    w, h = image_size
    cam = np.array([focal, w / 2.0, h / 2.0])

    qvecs = np.zeros((num_images, 4))
    tvecs = np.zeros((num_images, 3))
    centers = np.zeros((num_images, 3))
    for i in range(num_images):
        aa = rng.normal(scale=0.05, size=3)
        angle = np.linalg.norm(aa)
        axis = aa / max(angle, 1e-12)
        qvecs[i] = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
        centers[i] = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-0.3, 0.3)])
        tvecs[i] = -_np_quat_rotate(qvecs[i][None], centers[i][None])[0]

    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    dir_cam = np.stack([(xs - cam[1]) / cam[0], (ys - cam[2]) / cam[0],
                        np.ones_like(xs)], axis=-1)  # [H, W, 3]

    def surface_z(x, y):
        return plane_z + relief * np.sin(1.3 * x) * np.sin(1.7 * y)

    depth = np.zeros((num_images, h, w))
    semantic = np.zeros((num_images, h, w))
    for i in range(num_images):
        # R^T d: conjugate-quaternion rotation, host-side (numpy).
        qc = qvecs[i] * np.array([1.0, -1.0, -1.0, -1.0])
        dirs = dir_cam.reshape(-1, 3)
        d_world = _np_quat_rotate(
            np.broadcast_to(qc, (len(dirs), 4)), dirs).reshape(h, w, 3)
        # Ray-march the gentle relief: fixed-point iteration on the ray
        # parameter (converges fast for |relief| << plane_z and near-nadir
        # views; exact for relief = 0).
        s = (plane_z - centers[i, 2]) / d_world[..., 2]
        for _ in range(25):
            hit = centers[i][None, None, :] + s[..., None] * d_world
            s = (surface_z(hit[..., 0], hit[..., 1]) - centers[i, 2]) / d_world[..., 2]
        hit = centers[i][None, None, :] + s[..., None] * d_world
        depth[i] = s
        # Aperiodic label field: random label per cell from a large lookup
        # tile. (A periodic pattern like (ix + 2*iy) mod K has alias minima —
        # shifting by whole periods realigns labels at wrong poses.)
        lut = np.random.default_rng(seed + 1000).integers(0, num_labels, size=(97, 89))
        ix = np.floor(hit[..., 0] / cell).astype(np.int64) % 97
        iy = np.floor(hit[..., 1] / cell).astype(np.int64) % 89
        semantic[i] = lut[ix, iy].astype(np.float64)

    q0 = qvecs.copy()
    t0 = tvecs.copy()
    if pose_noise > 0:
        q0 = q0 + rng.normal(scale=pose_noise, size=q0.shape)
        q0 = q0 / np.maximum(np.linalg.norm(q0, axis=-1, keepdims=True),
                             1e-12)
        t0 = t0 + rng.normal(scale=pose_noise, size=t0.shape)
        q0[0], t0[0] = qvecs[0], tvecs[0]
        if num_images > 1:
            t0[1, 0] = tvecs[1, 0]

    cam_params = np.tile(cam, (num_images, 1))
    return qvecs, tvecs, cam_params, depth, semantic, q0, t0


def _lookat_pose(center, target, up=(0.0, 0.0, 1.0)):
    """World->camera pose (qvec, tvec) for a camera at `center` looking at
    `target` (camera z forward, y down-ish)."""
    from sba_tpu.geometry.quaternions import rotmat_to_quat

    c = np.asarray(center, np.float64)
    z = np.asarray(target, np.float64) - c
    z /= np.linalg.norm(z)
    upv = np.asarray(up, np.float64)
    x = np.cross(z, upv)
    if np.linalg.norm(x) < 1e-8:
        x = np.cross(z, np.array([0.0, 1.0, 0.0]))
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])  # rows = camera axes in world
    from sba_tpu.utils.host import on_host
    with on_host():
        q = np.array(rotmat_to_quat(jnp.asarray(R)))
    t = -R @ c
    return q, t


def make_gsba_scene(
    num_images: int = 4,
    image_size=(64, 48),
    focal: float = 55.0,
    radius: float = 0.4,
    height: float = 3.0,
    cam_dist: float = 8.0,
    trunk_class: float = 250.0,
    pose_noise: float = 0.0,
    cylinder_noise: float = 0.0,
    seed: int = 0,
):
    """Synthetic scene for geometric-semantic BA: one vertical cylinder at
    the origin, cameras on a circle looking at it; semantic masks are the
    hard-rendered ground-truth silhouettes (trunk_class where inside).

    Returns (qvecs_gt, tvecs_gt, cam_params [N,3], semantic_maps [N,H,W],
    cylinder_gt, qvecs_init, tvecs_init, cylinder_init).
    """
    from sba_tpu.models.cylinder import (
        Cylinder, project_quadrilateral, quadrilateral_mask)

    rng = np.random.default_rng(seed)
    w, h = image_size
    cam = np.array([focal, w / 2.0, h / 2.0])
    cyl = Cylinder(qvec=[1.0, 0, 0, 0], tvec=[0.0, 0.0, -height / 2], radius=radius,
                   height=height)

    qvecs = np.zeros((num_images, 4))
    tvecs = np.zeros((num_images, 3))
    for i in range(num_images):
        ang = 2 * np.pi * i / num_images + rng.uniform(-0.1, 0.1)
        center = np.array([cam_dist * np.cos(ang), cam_dist * np.sin(ang),
                           rng.uniform(-0.5, 0.5)])
        qvecs[i], tvecs[i] = _lookat_pose(center, [0.0, 0.0, 0.0])

    # Render hard GT silhouettes with the same projective model —
    # host-side (utils/host.py: TPU round-trips in scene prep slow every
    # later sync in the process).
    from sba_tpu.utils.host import on_host
    with on_host():
        quad, valid = project_quadrilateral(
            jnp.asarray(np.tile(cyl.qvec, (num_images, 1))),
            jnp.asarray(np.tile(cyl.tvec, (num_images, 1))),
            jnp.asarray(np.full(num_images, cyl.radius)),
            jnp.asarray(np.full(num_images, cyl.height)),
            jnp.asarray(qvecs), jnp.asarray(tvecs),
            jnp.asarray(np.tile(cam, (num_images, 1))))
        assert bool(np.all(np.asarray(valid))), "cameras must see the cylinder"
        masks = np.array(quadrilateral_mask(quad, h, w, hard=True))
    semantic = np.where(masks > 0.5, trunk_class, 0.0)

    q0 = qvecs.copy()
    t0 = tvecs.copy()
    if pose_noise > 0:
        q0 = q0 + rng.normal(scale=pose_noise, size=q0.shape)
        q0 = q0 / np.maximum(np.linalg.norm(q0, axis=-1, keepdims=True),
                             1e-12)
        t0 = t0 + rng.normal(scale=pose_noise, size=t0.shape)
        q0[0], t0[0] = qvecs[0], tvecs[0]
        if num_images > 1:
            t0[1, 0] = tvecs[1, 0]

    cyl0 = Cylinder(
        qvec=cyl.qvec + rng.normal(scale=cylinder_noise, size=4) if cylinder_noise else cyl.qvec,
        tvec=cyl.tvec + rng.normal(scale=cylinder_noise, size=3) if cylinder_noise else cyl.tvec,
        radius=cyl.radius * float(np.exp(rng.normal(scale=cylinder_noise))) if cylinder_noise else cyl.radius,
        height=cyl.height * float(np.exp(rng.normal(scale=cylinder_noise))) if cylinder_noise else cyl.height,
    )
    cam_params = np.tile(cam, (num_images, 1))
    return qvecs, tvecs, cam_params, semantic, cyl, q0, t0, cyl0


def make_gsba_forest_scene(
    num_cylinders: int = 16,
    cameras_per_cylinder: int = 2,
    image_size=(96, 72),
    focal: float = 100.0,
    radius: float = 0.35,
    height: float = 4.0,
    spacing: float = 4.0,
    cam_dist_factor: float = 0.6,
    trunk_class: float = 250.0,
    pose_noise: float = 0.0,
    cylinder_noise: float = 0.0,
    seed: int = 0,
):
    """Forest-of-trunks scene for K-cylinder GSBA: vertical cylinders on
    a jittered grid, `cameras_per_cylinder` close-up cameras per trunk
    (each mask dominated by its own trunk), masks = UNION of all
    silhouettes — matching the reference workload, which reads one
    boolean trunk mask per image and a cylinder LIST
    (ref: src/optim/geometric_semantic_bundle_adjustment.cc:805,
    :1283-1338). Close-up framing matters: the 1-IoU-vs-union cost is
    DEGENERATE for whole-forest views (a quad covering every trunk
    scores TP against the whole union, so the global optimum is one fat
    cylinder over the forest) — the formulation, inherited from the
    reference, presumes per-trunk imagery. Returns (qvecs_gt, tvecs_gt,
    cam_params, semantic, cylinders_gt, q0, t0, cylinders_init)."""
    from sba_tpu.models.cylinder import (
        Cylinder, project_quadrilateral, quadrilateral_mask)
    from sba_tpu.utils.host import on_host

    rng = np.random.default_rng(seed)
    w, h = image_size
    cam = np.array([focal, w / 2.0, h / 2.0])

    # Trunks on a LINE, cameras on one side at +-35 deg around the
    # perpendicular. Scene-design constraint learned the hard way: the
    # cost reads ONE union mask per image (as the reference does,
    # ref .cc:1283-1338), so any OTHER trunk inside a camera's frustum
    # biases that image's IoU optimum — laterally visible neighbors
    # drag positions, and trunks directly BEHIND the viewed trunk are
    # worse (the occluder's wider silhouette rewards radius growth: TP
    # gained with no FP until the quad fills the occluder). With a line
    # layout and near-perpendicular viewing, every other trunk is
    # behind the camera or far outside a ~22 deg half-FOV for any K;
    # the two views are 70 deg apart, which triangulates both lateral
    # axes (diametrically opposite views would leave the view-axis
    # position silhouette-unobservable).
    cyls = []
    for k in range(num_cylinders):
        cx = (k - (num_cylinders - 1) / 2.0) * spacing
        cy = rng.uniform(-0.1, 0.1) * spacing
        cyls.append(Cylinder(
            qvec=[1.0, 0, 0, 0], tvec=[cx, cy, -height / 2],
            radius=radius * float(np.exp(rng.uniform(-0.2, 0.2))),
            height=height))

    num_images = num_cylinders * cameras_per_cylinder
    cam_dist = cam_dist_factor * spacing
    qvecs = np.zeros((num_images, 4))
    tvecs = np.zeros((num_images, 3))
    i = 0
    for k, c in enumerate(cyls):
        for j in range(cameras_per_cylinder):
            # Camera azimuths from a fixed palette inside the clean-view
            # cones (+-35 deg around each perpendicular; wider and a
            # view looks along the line into the other trunks). The
            # first two are 70 deg apart on the SAME side — never
            # diametric (opposite silhouette views constrain the same
            # lateral axis, leaving the view-axis position
            # unobservable). More views per trunk also matters for
            # rank: the residual is ONE scalar (1 - IoU) per image —
            # inherited from the reference's cost — so the GN Hessian
            # rank per cylinder is at most its image count.
            palette = [55.0, 125.0, 235.0, 305.0, 90.0, 270.0]
            ang = palette[j % len(palette)] / 180.0 * np.pi \
                + rng.uniform(-0.03, 0.03)
            center = np.array([
                c.tvec[0] + cam_dist * np.cos(ang),
                c.tvec[1] + cam_dist * np.sin(ang),
                rng.uniform(-0.2, 0.2)])
            qvecs[i], tvecs[i] = _lookat_pose(
                center, [c.tvec[0], c.tvec[1], 0.0])
            i += 1

    K = num_cylinders
    with on_host():
        union = np.zeros((num_images, h, w))
        for c in cyls:
            quad, valid = project_quadrilateral(
                jnp.asarray(np.tile(c.qvec, (num_images, 1))),
                jnp.asarray(np.tile(c.tvec, (num_images, 1))),
                jnp.asarray(np.full(num_images, c.radius)),
                jnp.asarray(np.full(num_images, c.height)),
                jnp.asarray(qvecs), jnp.asarray(tvecs),
                jnp.asarray(np.tile(cam, (num_images, 1))))
            m = np.array(quadrilateral_mask(quad, h, w, hard=True))
            m = m * np.asarray(valid, np.float64)[:, None, None]
            union = np.maximum(union, m)
    semantic = np.where(union > 0.5, trunk_class, 0.0)

    q0 = qvecs.copy()
    t0 = tvecs.copy()
    if pose_noise > 0:
        q0 = q0 + rng.normal(scale=pose_noise, size=q0.shape)
        q0 = q0 / np.maximum(np.linalg.norm(q0, axis=-1, keepdims=True),
                             1e-12)
        t0 = t0 + rng.normal(scale=pose_noise, size=t0.shape)
        q0[0], t0[0] = qvecs[0], tvecs[0]
        if num_images > 1:
            t0[1, 0] = tvecs[1, 0]

    cyls0 = []
    for c in cyls:
        if cylinder_noise > 0:
            q = np.asarray(c.qvec) + rng.normal(scale=cylinder_noise,
                                                size=4)
            cyls0.append(Cylinder(
                qvec=q / np.linalg.norm(q),
                tvec=np.asarray(c.tvec) + rng.normal(
                    scale=cylinder_noise, size=3),
                radius=c.radius * float(np.exp(rng.normal(
                    scale=cylinder_noise))),
                height=c.height * float(np.exp(rng.normal(
                    scale=cylinder_noise)))))
        else:
            cyls0.append(c)
    cam_params = np.tile(cam, (num_images, 1))
    return qvecs, tvecs, cam_params, semantic, cyls, q0, t0, cyls0


def make_synthetic_reconstruction(num_images: int = 8, num_points: int = 120,
                                  seed: int = 0, image_size=(640, 480),
                                  focal: float = 500.0):
    """Exact synthetic `Reconstruction` (host container), built from the
    same arc-of-cameras geometry as `make_ba_problem` — used to exercise
    host-side tools (pose graph construction, analyzers, exporters)."""
    from sba_tpu.io.colmap_models import Camera, Image, Point3D  # noqa: F401
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.geometry import camera_models

    problem, truth = make_ba_problem(
        num_images=num_images, num_points=num_points, seed=seed,
        image_size=image_size, focal=focal)
    qvecs, tvecs, pts = truth["qvecs"], truth["tvecs"], truth["points"]
    spec = camera_models.model_by_id(0)
    w, h = image_size

    rec = Reconstruction()
    rec.add_camera(Camera(camera_id=1, model_id=0, width=w, height=h,
                          params=np.asarray(truth["cam_params"][0, :spec.num_params],
                                            np.float64)))

    obs_image = np.asarray(problem.obs_image)
    obs_point = np.asarray(problem.obs_point)
    obs_xy = np.asarray(problem.obs_xy)

    # Per-image keypoint tables in observation order.
    kp_rows = {i: np.nonzero(obs_image == i)[0] for i in range(num_images)}
    for i in range(num_images):
        rows = kp_rows[i]
        rec.add_image(Image(
            image_id=i + 1, qvec=qvecs[i].copy(), tvec=tvecs[i].copy(),
            camera_id=1, name=f"image{i:04d}.png",
            xys=obs_xy[rows].astype(np.float64),
            point3D_ids=np.full(len(rows), -1, np.int64)), registered=True)

    # Tracks: for each point, (image_id, kp_idx within that image).
    for p in range(num_points):
        rows = np.nonzero(obs_point == p)[0]
        if len(rows) < 2:
            continue
        track = []
        for r in rows:
            img = int(obs_image[r])
            kp_idx = int(np.searchsorted(kp_rows[img], r))
            track.append((img + 1, kp_idx))
        rec.add_point3d(pts[p], track)
    return rec
