"""End-to-end incremental SfM on a synthetic scene.

The reference has no integration tests (SURVEY §4); this is the
synthetic-recovery equivalent at pipeline scope: known cameras on an arc
looking at a point cloud -> keypoints + pairwise matches into a real
`Database` -> DatabaseCache -> incremental mapper -> compare registered
poses/points against ground truth (up to the gauge similarity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.geometry.quaternions import quat_rotate, quat_to_rotmat, \
    rotmat_to_quat
from sba_tpu.io.database import Database
from sba_tpu.io.database_cache import DatabaseCache
from sba_tpu.sfm.controllers import (
    MapperControllerOptions,
    reconstruct_incremental,
)
from sba_tpu.sfm.incremental_mapper import IncrementalMapperOptions


def look_at_rotation(center, target, up=np.array([0.0, 0.0, 1.0])):
    z = target - center
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0, 0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])  # rows = camera axes: x_cam = R (X - C)


@pytest.fixture(scope="module")
def synthetic_scene():
    rng = np.random.default_rng(42)
    n_images, n_points = 8, 300
    f, w, h = 500.0, 640, 480
    pts = rng.uniform(-2, 2, (n_points, 3))
    pts[:, 2] *= 0.5

    qvecs, tvecs = [], []
    for k in range(n_images):
        ang = 2 * np.pi * k / n_images
        center = np.array([4 * np.cos(ang), 4 * np.sin(ang), 2.0])
        R = look_at_rotation(center, np.zeros(3))
        t = -R @ center
        qvecs.append(np.asarray(rotmat_to_quat(jnp.asarray(R))))
        tvecs.append(t)

    db = Database()
    cid = db.write_camera(model_id=0, width=w, height=h,
                          params=[f, w / 2, h / 2])  # SIMPLE_PINHOLE
    image_ids = []
    all_xys, vis = [], []
    for k in range(n_images):
        R = np.asarray(quat_to_rotmat(jnp.asarray(qvecs[k])))
        pc = pts @ R.T + tvecs[k]
        z = pc[:, 2]
        xy = pc[:, :2] / pc[:, 2:] * f + [w / 2, h / 2]
        xy += rng.normal(0, 0.3, xy.shape)
        visible = (z > 0.5) & (xy[:, 0] > 0) & (xy[:, 0] < w) \
            & (xy[:, 1] > 0) & (xy[:, 1] < h)
        iid = db.write_image(f"img{k}.png", cid)
        image_ids.append(iid)
        db.write_keypoints(iid, np.concatenate(
            [xy, np.ones_like(xy)], -1).astype(np.float32))
        all_xys.append(xy)
        vis.append(visible)

    for a in range(n_images):
        for b in range(a + 1, n_images):
            common = np.nonzero(vis[a] & vis[b])[0]
            if len(common) < 20:
                continue
            m = np.stack([common, common], -1).astype(np.uint32)
            db.write_two_view_geometry(image_ids[a], image_ids[b], m,
                                       config=2)
    return dict(db=db, image_ids=image_ids, qvecs=np.stack(qvecs),
                tvecs=np.stack(tvecs), points=pts, f=f)


@pytest.fixture(scope="module")
def mapper_opts():
    opts = MapperControllerOptions()
    opts.mapper.init_min_num_inliers = 50
    opts.mapper.abs_pose_min_num_inliers = 15
    return opts


@pytest.fixture(scope="module")
def reconstructed(synthetic_scene, mapper_opts):
    """One shared full reconstruction (reconstruction is the slow part;
    tests must not mutate it — take a deepcopy)."""
    cache = DatabaseCache.create(synthetic_scene["db"], min_num_matches=15)
    models = reconstruct_incremental(cache, mapper_opts)
    assert len(models) >= 1
    return cache, models


def test_incremental_mapping_recovers_scene(synthetic_scene, reconstructed):
    s = synthetic_scene
    _, models = reconstructed
    rec = models[0]
    assert rec.num_registered_images() == 8
    assert rec.num_points3d() > 150
    mean_err = rec.compute_mean_reprojection_error()
    assert mean_err < 1.0, f"mean reprojection error {mean_err}"

    # Pose accuracy up to a similarity: compare pairwise relative poses.
    reg = sorted([i for i in rec.images if rec.is_registered(i)])
    id_to_gt = {iid: k for k, iid in enumerate(s["image_ids"])}
    rels_est, rels_gt = [], []
    for a, b in zip(reg[:-1], reg[1:]):
        Ra = np.asarray(quat_to_rotmat(jnp.asarray(rec.images[a].qvec)))
        Rb = np.asarray(quat_to_rotmat(jnp.asarray(rec.images[b].qvec)))
        rels_est.append(Rb @ Ra.T)
        ka, kb = id_to_gt[a], id_to_gt[b]
        Ga = np.asarray(quat_to_rotmat(jnp.asarray(s["qvecs"][ka])))
        Gb = np.asarray(quat_to_rotmat(jnp.asarray(s["qvecs"][kb])))
        rels_gt.append(Gb @ Ga.T)
    for Re, Rg in zip(rels_est, rels_gt):
        err = np.degrees(np.arccos(np.clip(
            (np.trace(Re @ Rg.T) - 1) / 2, -1, 1)))
        assert err < 0.5, f"relative rotation error {err} deg"


def test_mapper_handles_empty_database():
    db = Database()
    cache = DatabaseCache.create(db)
    models = reconstruct_incremental(cache)
    assert models == []


def test_mapper_resumes_from_partial_model(reconstructed, mapper_opts):
    """Continued reconstruction (ref: controllers/incremental_mapper.cc
    :394-399 / exe mapper --input_path): seed the mapper with a partial
    model and verify the remaining images register into it."""
    import copy

    cache, models = reconstructed
    full = copy.deepcopy(models[0])
    reg = sorted(i for i in full.images if full.is_registered(i))
    assert len(reg) == 8

    # Partial = the full model with the last 3 images deregistered.
    partial = full
    for iid in reg[-3:]:
        partial.deregister_image(iid)
    assert partial.num_registered_images() == 5

    resumed = reconstruct_incremental(
        cache, mapper_opts, initial_reconstruction=partial)[0]
    assert resumed.num_registered_images() == 8
    assert resumed.compute_mean_reprojection_error() < 1.0
