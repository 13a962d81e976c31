"""SPMD semantic BA parity: 8-device CPU mesh vs single-device solve.

conftest forces JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8 (SURVEY.md §4 multi-host test
strategy); the same shard_map program runs unchanged on a TPU slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.optim.sba import (SBAOptions, build_sba_problem,
                               semantic_bundle_adjust)
from sba_tpu.parallel.sba_spmd import semantic_bundle_adjust_spmd
from sba_tpu.utils.synthetic import make_sba_scene


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a device mesh")
def test_sba_spmd_matches_single_device():
    qg, tg, cam, depth, sem, qn, tn = make_sba_scene(
        num_images=6, image_size=(64, 48), pose_noise=0.01, seed=5)
    opt = SBAOptions(pixel_step=4, max_iterations=10)
    prob = build_sba_problem(qn, tn, cam, depth, sem, opt,
                             dtype=jnp.float32)

    out1, sum1 = semantic_bundle_adjust(prob, opt)
    out8, sum8 = semantic_bundle_adjust_spmd(prob, opt)

    # Identical math up to f32 reduction-order noise: same costs, same
    # converged poses.
    np.testing.assert_allclose(float(sum8.initial_cost),
                               float(sum1.initial_cost), rtol=1e-5)
    np.testing.assert_allclose(float(sum8.final_cost),
                               float(sum1.final_cost), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out8.qvecs),
                               np.asarray(out1.qvecs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out8.tvecs),
                               np.asarray(out1.tvecs), atol=1e-3)
    assert int(sum8.num_residuals) == int(sum1.num_residuals)
    assert int(sum8.num_valid) == int(sum1.num_valid)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a device mesh")
def test_sba_spmd_pads_nondivisible_pairs():
    # 4 images -> Q = 12 ordered pairs, not divisible by 8 devices.
    qg, tg, cam, depth, sem, qn, tn = make_sba_scene(
        num_images=4, image_size=(64, 48), pose_noise=0.005, seed=2)
    opt = SBAOptions(pixel_step=4, max_iterations=5)
    prob = build_sba_problem(qn, tn, cam, depth, sem, opt,
                             dtype=jnp.float32)
    out1, sum1 = semantic_bundle_adjust(prob, opt)
    out8, sum8 = semantic_bundle_adjust_spmd(prob, opt)
    np.testing.assert_allclose(float(sum8.final_cost),
                               float(sum1.final_cost), rtol=1e-3)
    assert int(sum8.num_residuals) == int(sum1.num_residuals)
