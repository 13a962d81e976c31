"""Bundle adjustment recovery tests (style of ref: src/optim/bundle_adjustment_test.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.optim import BAOptions, bundle_adjust, evaluate_cost
from sba_tpu.utils.synthetic import make_ba_problem


def pose_errors(problem, truth):
    dq = np.abs(np.asarray(problem.qvecs) - truth["qvecs"]).max()
    dq_flip = np.abs(np.asarray(problem.qvecs) + truth["qvecs"]).max()
    dt = np.abs(np.asarray(problem.tvecs) - truth["tvecs"]).max()
    return min(dq, dq_flip), dt


def test_exact_problem_zero_cost():
    problem, truth = make_ba_problem(pose_noise=0.0, point_noise=0.0)
    cost = float(evaluate_cost(problem, BAOptions()))
    assert cost < 1e-16


@pytest.mark.parametrize("solver", ["dense_schur", "schur_pcg"])
def test_recovery_noisefree_observations(solver):
    problem, truth = make_ba_problem(
        num_images=5, num_points=60, pose_noise=0.02, point_noise=0.05, seed=1)
    opt = BAOptions(solver=solver, max_iterations=50)
    cost0 = float(evaluate_cost(problem, opt))
    out, summary = bundle_adjust(problem, opt)
    assert float(summary.final_cost) < 1e-12 * max(cost0, 1.0)
    dq, dt = pose_errors(out, truth)
    assert dq < 1e-5
    assert dt < 1e-4
    dx = np.abs(np.asarray(out.points) - truth["points"]).max()
    assert dx < 1e-3
    assert int(summary.num_iterations) < 50


def test_gauge_fixed_blocks_unchanged():
    problem, truth = make_ba_problem(pose_noise=0.05, point_noise=0.1, seed=2)
    out, _ = bundle_adjust(problem, BAOptions(max_iterations=20))
    np.testing.assert_allclose(np.asarray(out.qvecs[0]), np.asarray(problem.qvecs[0]))
    np.testing.assert_allclose(np.asarray(out.tvecs[0]), np.asarray(problem.tvecs[0]))
    assert float(out.tvecs[1, 0]) == pytest.approx(float(problem.tvecs[1, 0]))


def test_noisy_observations_reasonable():
    problem, truth = make_ba_problem(
        num_images=6, num_points=80, pixel_noise=0.5, pose_noise=0.01,
        point_noise=0.02, seed=3)
    opt = BAOptions(max_iterations=40)
    out, summary = bundle_adjust(problem, opt)
    assert float(summary.final_cost) < float(summary.initial_cost)
    # ~0.5px noise: mean squared residual should be around noise level.
    n_res = int(summary.num_residuals)
    rms = np.sqrt(2 * float(summary.final_cost) / (2 * n_res))
    assert rms < 1.0
    dq, dt = pose_errors(out, truth)
    assert dt < 0.05


@pytest.mark.parametrize("loss", ["huber", "soft_l1", "cauchy"])
def test_robust_losses_downweight_outliers(loss):
    problem, truth = make_ba_problem(
        num_images=5, num_points=60, pose_noise=0.01, point_noise=0.02, seed=4)
    # Corrupt 10% of observations with large outliers.
    rng = np.random.default_rng(0)
    xy = np.array(problem.obs_xy)
    n = xy.shape[0]
    out_idx = rng.choice(n, size=n // 10, replace=False)
    xy[out_idx] += rng.uniform(50, 200, size=(len(out_idx), 2))
    corrupted = problem._replace(obs_xy=jnp.asarray(xy))

    opt_robust = BAOptions(loss=loss, loss_scale=2.0, max_iterations=50)
    out_r, _ = bundle_adjust(corrupted, opt_robust)
    dq_r, dt_r = pose_errors(out_r, truth)

    opt_triv = BAOptions(loss="trivial", max_iterations=50)
    out_t, _ = bundle_adjust(corrupted, opt_triv)
    dq_t, dt_t = pose_errors(out_t, truth)

    assert dt_r < dt_t  # robust better than trivial under outliers
    # Huber/soft-L1 keep linear influence on gross outliers; only the
    # redescending cauchy recovers tight poses.
    assert dt_r < (0.05 if loss == "cauchy" else 0.2)


def test_intrinsics_refinement():
    problem, truth = make_ba_problem(
        num_images=6, num_points=120, pose_noise=0.0, point_noise=0.0, seed=5)
    # Perturb focal length, free the camera block.
    cam = np.array(problem.cam_params)
    cam[0, 0] *= 1.05
    free_cam = np.zeros_like(cam)
    free_cam[0, :3] = 1.0
    p2 = problem._replace(cam_params=jnp.asarray(cam), free_cam=jnp.asarray(free_cam))
    opt = BAOptions(model_id=0, refine_focal_length=True,
                    refine_principal_point=True, max_iterations=60)
    out, summary = bundle_adjust(p2, opt)
    assert float(summary.final_cost) < 1e-10
    assert float(out.cam_params[0, 0]) == pytest.approx(truth["cam_params"][0, 0], rel=1e-4)


def test_pose_only_mode():
    """refine_extrinsics with fixed points = absolute pose refinement."""
    problem, truth = make_ba_problem(pose_noise=0.03, point_noise=0.0, seed=6)
    p2 = problem._replace(points=jnp.asarray(truth["points"]),
                          free_points=jnp.zeros_like(problem.free_points))
    out, summary = bundle_adjust(p2, BAOptions(max_iterations=40))
    np.testing.assert_allclose(np.asarray(out.points), truth["points"])
    dq, dt = pose_errors(out, truth)
    assert dt < 1e-5


def test_simple_radial_model():
    problem, truth = make_ba_problem(
        model_id=2, pose_noise=0.01, point_noise=0.02, seed=7)
    opt = BAOptions(model_id=2, max_iterations=40)
    out, summary = bundle_adjust(problem, opt)
    assert float(summary.final_cost) < 1e-10


def test_summary_fields():
    problem, _ = make_ba_problem(pose_noise=0.01, seed=8)
    opt = BAOptions(max_iterations=15)
    out, s = bundle_adjust(problem, opt)
    assert float(s.initial_cost) > float(s.final_cost)
    assert int(s.num_residuals) == problem.obs_xy.shape[0]
    trace = np.asarray(s.cost_trace)
    valid = trace[~np.isnan(trace)]
    assert valid[0] == pytest.approx(float(s.initial_cost))
    # Monotone non-increasing accepted cost trace.
    assert np.all(np.diff(valid) <= 1e-9)


@pytest.mark.parametrize("model_id", [0, 1, 2, 4])
def test_linearize_chain_rule_matches_jacfwd(model_id):
    """The production chain-rule linearization must match the full-jacfwd
    oracle to float rounding (Jq/Jt/Jx/Jk + residual)."""
    from sba_tpu.optim.ba import _linearize, _linearize_chain

    problem, _ = make_ba_problem(
        num_images=6, num_points=40, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=1.0, seed=3,
        model_id=model_id)
    opt = BAOptions(model_id=model_id, loss="cauchy", loss_scale=2.0)
    ref = _linearize(problem, opt)
    got = _linearize_chain(problem, opt)
    for name, a, b in zip(("r", "Jq", "Jt", "Jx", "Jk"), ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9,
            err_msg=f"mismatch in {name} (model {model_id})")
