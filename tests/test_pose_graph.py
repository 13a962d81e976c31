"""Pose-graph optimization: SE3/Sim3 LM over relative-pose constraints.

The reference has no pose-graph module (COLMAP relies on global BA /
similarity merging only); this is the large-scale trajectory relaxation
capability from the BASELINE.json north star (pose-graph + global BA for
the 1k-10k image configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.geometry.quaternions import (
    quat_normalize, quat_multiply, angle_axis_to_quat, quat_rotate,
    quat_conjugate,
)
from sba_tpu.optim.pose_graph import (
    PoseGraphOptions, make_problem, relative_pose, optimize_pose_graph,
    pad_edges_pow2, distributed_optimize_pose_graph,
    pose_graph_from_reconstruction, apply_pose_graph_result,
)


def _random_poses(n, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    aa = rng.normal(size=(n, 3)) * 0.5
    q = np.asarray(quat_normalize(angle_axis_to_quat(jnp.asarray(aa))))
    t = rng.normal(size=(n, 3)) * spread
    return q, t


def _make_ring(n=12, noise=0.05, loop=True, seed=0, sim3=False,
               dtype=jnp.float64):
    """Ground-truth poses on a noisy odometry chain + loop closure:
    measurements are exact relative poses; the initial guess integrates
    noise-corrupted odometry (classic pose-graph benchmark setup)."""
    rng = np.random.default_rng(seed)
    q_true, t_true = _random_poses(n, seed=seed + 1)
    s_true = np.exp(rng.normal(size=n) * (0.1 if sim3 else 0.0))

    edges = [(i, i + 1) for i in range(n - 1)]
    if loop:
        edges += [(0, n - 1), (0, n // 2)]
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)

    if sim3:
        rq, rt, rs = relative_pose(
            jnp.asarray(q_true[ei]), jnp.asarray(t_true[ei]),
            jnp.asarray(q_true[ej]), jnp.asarray(t_true[ej]),
            jnp.asarray(s_true[ei]), jnp.asarray(s_true[ej]))
        rls = jnp.log(rs)
    else:
        rq, rt = relative_pose(
            jnp.asarray(q_true[ei]), jnp.asarray(t_true[ei]),
            jnp.asarray(q_true[ej]), jnp.asarray(t_true[ej]))
        rls = None

    # Perturbed initial guess (first pose exact = gauge anchor).
    q0 = np.array(q_true)
    t0 = np.array(t_true)
    ls0 = np.log(s_true)
    daa = rng.normal(size=(n, 3)) * noise
    q0 = np.array(quat_normalize(quat_multiply(
        angle_axis_to_quat(jnp.asarray(daa)), jnp.asarray(q0))))
    t0 = t0 + rng.normal(size=(n, 3)) * noise
    ls0 = ls0 + rng.normal(size=n) * (noise if sim3 else 0.0)
    q0[0], t0[0], ls0[0] = q_true[0], t_true[0], np.log(s_true[0])

    problem = make_problem(q0, t0, ei, ej, np.asarray(rq), np.asarray(rt),
                           rel_log_s=rls, sim3=sim3,
                           log_scales=ls0, dtype=dtype)
    return problem, (q_true, t_true, s_true)


def _pose_errors(problem, truth):
    q_true, t_true, _ = truth
    q = np.asarray(quat_normalize(problem.qvecs))
    dq = np.asarray(quat_multiply(jnp.asarray(q),
                                  quat_conjugate(quat_normalize(
                                      jnp.asarray(q_true)))))
    ang = 2 * np.arccos(np.clip(np.abs(dq[:, 0]), 0, 1))
    dt = np.linalg.norm(np.asarray(problem.tvecs) - t_true, axis=-1)
    return ang, dt


def test_se3_ring_converges_to_truth():
    problem, truth = _make_ring(n=12, noise=0.08, seed=3)
    out, summary = optimize_pose_graph(
        problem, PoseGraphOptions(max_iterations=100, function_tolerance=1e-15,
                                  gradient_tolerance=1e-14,
                                  parameter_tolerance=1e-14,
                                  cg_tolerance=1e-10))
    assert float(summary.final_cost) < 1e-12 * max(1.0, float(summary.initial_cost))
    ang, dt = _pose_errors(out, truth)
    assert ang.max() < 1e-5
    assert dt.max() < 1e-5


def test_sim3_ring_recovers_scales():
    problem, truth = _make_ring(n=10, noise=0.05, seed=7, sim3=True)
    out, summary = optimize_pose_graph(
        problem, PoseGraphOptions(max_iterations=120, sim3=True,
                                  function_tolerance=1e-15,
                                  cg_tolerance=1e-10))
    assert float(summary.final_cost) < 1e-10
    _, _, s_true = truth
    # Scales are recovered up to the anchored first pose.
    np.testing.assert_allclose(np.exp(np.asarray(out.log_scales)),
                               s_true, rtol=1e-4)


def test_gauge_pose_stays_fixed():
    problem, _ = _make_ring(n=8, noise=0.1, seed=1)
    out, _ = optimize_pose_graph(problem, PoseGraphOptions(max_iterations=20))
    np.testing.assert_allclose(np.asarray(out.qvecs[0]),
                               np.asarray(problem.qvecs[0]), atol=0)
    np.testing.assert_allclose(np.asarray(out.tvecs[0]),
                               np.asarray(problem.tvecs[0]), atol=0)


def test_padded_edges_same_solution():
    problem, truth = _make_ring(n=9, noise=0.06, seed=5)
    padded = pad_edges_pow2(problem)
    assert padded.edge_i.shape[0] > problem.edge_i.shape[0]
    out_a, _ = optimize_pose_graph(problem, PoseGraphOptions(max_iterations=40))
    out_b, _ = optimize_pose_graph(padded, PoseGraphOptions(max_iterations=40))
    np.testing.assert_allclose(np.asarray(out_a.tvecs),
                               np.asarray(out_b.tvecs), atol=1e-8)


def test_robust_loss_downweights_outlier_edge():
    problem, truth = _make_ring(n=12, noise=0.05, seed=9)
    # Corrupt one loop-closure measurement badly.
    rt = np.array(problem.rel_t)
    rt[-1] += np.array([5.0, -4.0, 3.0])
    problem_bad = problem._replace(rel_t=jnp.asarray(rt))
    out, _ = optimize_pose_graph(
        problem_bad, PoseGraphOptions(max_iterations=80, loss="cauchy",
                                      loss_scale=0.1))
    ang, dt = _pose_errors(out, truth)
    # Cauchy suppresses the bad loop closure: poses stay near truth.
    assert dt.max() < 0.25
    out_triv, _ = optimize_pose_graph(
        problem_bad, PoseGraphOptions(max_iterations=60, loss="trivial"))
    _, dt_triv = _pose_errors(out_triv, truth)
    assert dt.max() < dt_triv.max()


def test_distributed_matches_single_device():
    problem, truth = _make_ring(n=16, noise=0.07, seed=13)
    from sba_tpu.parallel import make_mesh
    mesh = make_mesh(8, axis_name="edges")
    opt = PoseGraphOptions(max_iterations=40)
    out_s, sum_s = optimize_pose_graph(problem, opt)
    out_d, sum_d = distributed_optimize_pose_graph(problem, opt, mesh)
    assert float(sum_d.final_cost) < 1e-10
    np.testing.assert_allclose(np.asarray(out_d.tvecs),
                               np.asarray(out_s.tvecs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_d.qvecs),
                               np.asarray(out_s.qvecs), atol=1e-6)


def test_from_reconstruction_roundtrip():
    """Build a covisibility graph from a synthetic reconstruction, perturb
    poses, relax, and check recovery."""
    from sba_tpu.utils.synthetic import make_synthetic_reconstruction

    rec = make_synthetic_reconstruction(num_images=8, num_points=120, seed=2)
    problem, img_ids = pose_graph_from_reconstruction(rec, min_common_points=5)
    assert problem.edge_i.shape[0] > 0

    # Perturb all but the first pose; measurements hold the truth.
    rng = np.random.default_rng(0)
    q0 = np.array(problem.qvecs)
    t0 = np.array(problem.tvecs)
    daa = rng.normal(size=(len(img_ids), 3)) * 0.05
    daa[0] = 0
    q_p = np.asarray(quat_normalize(quat_multiply(
        angle_axis_to_quat(jnp.asarray(daa)), jnp.asarray(q0))))
    t_p = t0 + np.concatenate([np.zeros((1, 3)),
                               rng.normal(size=(len(img_ids) - 1, 3)) * 0.05])
    perturbed = problem._replace(qvecs=jnp.asarray(q_p), tvecs=jnp.asarray(t_p))

    out, summary = optimize_pose_graph(
        perturbed, PoseGraphOptions(max_iterations=60))
    assert float(summary.final_cost) < 1e-9 * max(1.0, float(summary.initial_cost))
    np.testing.assert_allclose(np.asarray(out.tvecs), t0, atol=1e-4)

    apply_pose_graph_result(rec, out, img_ids)
    np.testing.assert_allclose(rec.images[img_ids[3]].tvec, t0[3], atol=1e-4)
