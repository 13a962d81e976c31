"""Distributed BA: SPMD solve on a virtual 8-device CPU mesh must agree with
the single-device solver (the multi-host test the reference lacks —
SURVEY.md section 4 implication (c))."""

import jax
import numpy as np
import pytest

from sba_tpu.optim import BAOptions, bundle_adjust
from sba_tpu.parallel import distributed_bundle_adjust, make_mesh, shard_problem
from sba_tpu.utils.synthetic import make_ba_problem


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_distributed_matches_single_device(mesh):
    problem, truth = make_ba_problem(
        num_images=6, num_points=80, pose_noise=0.02, point_noise=0.05, seed=11)
    opt = BAOptions(solver="schur_pcg", max_iterations=30)

    out_s, sum_s = bundle_adjust(problem, opt)
    out_d, sum_d = distributed_bundle_adjust(problem, opt, mesh)

    assert float(sum_d.final_cost) < 1e-10
    np.testing.assert_allclose(np.asarray(out_d.qvecs), np.asarray(out_s.qvecs),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_d.tvecs), np.asarray(out_s.tvecs),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d.points), np.asarray(out_s.points),
                               atol=1e-4)


def test_distributed_recovers_truth(mesh):
    problem, truth = make_ba_problem(
        num_images=8, num_points=120, pose_noise=0.03, point_noise=0.08, seed=12)
    out, summary = distributed_bundle_adjust(
        problem, BAOptions(max_iterations=40), mesh)
    assert float(summary.final_cost) < 1e-10
    dt = np.abs(np.asarray(out.tvecs) - truth["tvecs"]).max()
    assert dt < 1e-4


def test_padding_neutral(mesh):
    """Observation count not divisible by mesh size: padded entries must not
    change the solution."""
    problem, _ = make_ba_problem(num_images=5, num_points=61, seed=13,
                                 pose_noise=0.02, point_noise=0.02)
    # make obs count odd-ish by dropping one
    import jax.numpy as jnp
    problem = problem._replace(
        obs_image=problem.obs_image[:-3], obs_point=problem.obs_point[:-3],
        obs_cam=problem.obs_cam[:-3], obs_xy=problem.obs_xy[:-3],
        obs_mask=problem.obs_mask[:-3])
    assert problem.obs_image.shape[0] % 8 != 0
    out, summary = distributed_bundle_adjust(problem, BAOptions(max_iterations=30), mesh)
    assert float(summary.final_cost) < 1e-10


def test_shard_problem_placement(mesh):
    problem, _ = make_ba_problem(num_images=4, num_points=40, seed=14)
    sharded = shard_problem(problem, mesh)
    assert sharded.obs_image.shape[0] % 8 == 0
    shard_set = {d.device for d in sharded.obs_xy.addressable_shards}
    assert len(shard_set) == 8


def test_point_sharded_pm_matches_single_device(mesh):
    """Track-aware point sharding + point-major explicit Schur under
    shard_map agrees with the single-device solve."""
    from sba_tpu.parallel import distributed_bundle_adjust_pm

    problem, truth = make_ba_problem(
        num_images=6, num_points=83, pose_noise=0.02, point_noise=0.05,
        seed=21)
    opt = BAOptions(solver="explicit_schur", max_iterations=30)
    out_s, sum_s = bundle_adjust(problem, opt)
    out_d, sum_d = distributed_bundle_adjust_pm(problem, opt, mesh)
    assert float(sum_d.final_cost) < 1e-10
    np.testing.assert_allclose(np.asarray(out_d.qvecs),
                               np.asarray(out_s.qvecs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_d.tvecs),
                               np.asarray(out_s.tvecs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d.points),
                               np.asarray(out_s.points), atol=1e-4)


def test_point_sharded_pm_uneven_and_masked(mesh):
    """Point count not divisible by the mesh + masked observations."""
    import jax.numpy as jnp

    from sba_tpu.parallel import distributed_bundle_adjust_pm

    problem, _ = make_ba_problem(num_images=5, num_points=61, seed=22,
                                 pose_noise=0.02, point_noise=0.03)
    mask = np.asarray(problem.obs_mask).copy()
    mask[::17] = 0.0
    problem = problem._replace(obs_mask=jnp.asarray(mask))
    out, summary = distributed_bundle_adjust_pm(
        problem, BAOptions(max_iterations=30), mesh)
    assert float(summary.final_cost) < 1e-8


def test_fused_spmd_matches_single_chip(mesh):
    """The SPMD fused-Pallas path (point blocks sharded, 3 psums on the
    reduced system) agrees with the single-chip fused solve and reaches
    the optimum. Interpret mode: the CPU mesh runs the same kernel
    programs the TPU executes."""
    import jax.numpy as jnp

    from sba_tpu.parallel import distributed_bundle_adjust_fused

    problem, truth = make_ba_problem(
        num_images=6, num_points=150, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=23,
        dtype=jnp.float32)
    opt = BAOptions(model_id=0, max_iterations=20, dtype="float32",
                    schur_bf16=False)

    from sba_tpu.optim import ba_fused as bf

    out_s, sum_s = bf.bundle_adjust_fused(problem, opt, interpret=True)
    out_d, sum_d = distributed_bundle_adjust_fused(
        problem, opt, mesh, interpret=True)

    assert float(sum_d.final_cost) < 1e-4 * float(sum_d.initial_cost)
    np.testing.assert_allclose(np.asarray(out_d.tvecs),
                               np.asarray(out_s.tvecs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d.points),
                               np.asarray(out_s.points), atol=1e-3)


def test_fused_spmd_gauge_and_masked(mesh):
    """Gauge masks + masked observations survive the sharded layout."""
    import jax.numpy as jnp

    from sba_tpu.parallel import distributed_bundle_adjust_fused

    problem, _ = make_ba_problem(
        num_images=5, num_points=90, observations_per_point=4,
        pose_noise=0.02, point_noise=0.03, pixel_noise=0.0, seed=24,
        dtype=jnp.float32)
    mask = np.asarray(problem.obs_mask).copy()
    mask[::13] = 0.0
    problem = problem._replace(obs_mask=jnp.asarray(mask))
    opt = BAOptions(model_id=0, max_iterations=15, dtype="float32",
                    schur_bf16=False)
    out, summary = distributed_bundle_adjust_fused(
        problem, opt, mesh, interpret=True)
    assert float(summary.final_cost) < 1e-3 * float(summary.initial_cost)
    if float(problem.free_rot[0]) == 0.0:
        np.testing.assert_allclose(np.asarray(out.qvecs[0]),
                                   np.asarray(problem.qvecs[0]), atol=0)
