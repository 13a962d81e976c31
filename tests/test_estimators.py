"""Minimal-solver tests with exact synthetic correspondences
(style of ref: src/estimators/*_test.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.estimators import (
    epnp_solve,
    essential_5pt,
    essential_8pt,
    fundamental_7pt,
    fundamental_8pt,
    homography_dlt,
    homography_transfer_error,
    p3p_solve,
    pose_from_essential,
    sampson_error_e,
    sampson_error_f,
)
from sba_tpu.geometry.quaternions import quat_rotate, quat_to_rotmat
from sba_tpu.ops.polynomial import real_roots


def make_two_view(n=20, seed=0, qb=None, tb=None):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    qa = np.array([1.0, 0, 0, 0])
    ta = np.zeros(3)
    if qb is None:
        aa = np.array([0.05, -0.1, 0.03])
        ang = np.linalg.norm(aa)
        qb = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * aa / ang])
    if tb is None:
        tb = np.array([-0.8, 0.2, 0.1])
    p1 = pts  # camera a at identity
    p2 = np.array(quat_rotate(jnp.asarray(qb), jnp.asarray(pts))) + tb
    xy1 = p1[:, :2] / p1[:, 2:3]
    xy2 = p2[:, :2] / p2[:, 2:3]
    return xy1, xy2, qb, tb, pts


def essential_from_pose(qb, tb):
    R = np.array(quat_to_rotmat(jnp.asarray(qb)))
    t = np.asarray(tb) / np.linalg.norm(tb)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return E / np.linalg.norm(E)


def test_polynomial_roots():
    # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
    r, ok = real_roots(jnp.asarray([1.0, -6.0, 11.0, -6.0]))
    got = np.sort(np.asarray(r)[np.asarray(ok)])
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-6)
    # x^2 + 1: no real roots
    r2, ok2 = real_roots(jnp.asarray([1.0, 0.0, 1.0]))
    assert not np.any(np.asarray(ok2))


def test_fundamental_8pt_exact():
    xy1, xy2, qb, tb, _ = make_two_view(30)
    F = fundamental_8pt(jnp.asarray(xy1), jnp.asarray(xy2))
    err = np.asarray(sampson_error_f(F, jnp.asarray(xy1), jnp.asarray(xy2)))
    assert err.max() < 1e-10
    E = essential_from_pose(qb, tb)
    Fn = np.asarray(F)
    # F should match E up to sign (calibrated coords).
    assert min(np.abs(Fn - E).max(), np.abs(Fn + E).max()) < 1e-6


def test_fundamental_7pt_exact():
    xy1, xy2, qb, tb, _ = make_two_view(7, seed=1)
    F, ok = fundamental_7pt(jnp.asarray(xy1), jnp.asarray(xy2))
    errs = []
    for i in range(3):
        if bool(ok[i]):
            e = np.asarray(sampson_error_f(F[i], jnp.asarray(xy1), jnp.asarray(xy2)))
            errs.append(e.max())
    assert len(errs) >= 1
    assert min(errs) < 1e-8


def test_essential_8pt_and_pose():
    xy1, xy2, qb, tb, pts = make_two_view(40, seed=2)
    E = essential_8pt(jnp.asarray(xy1), jnp.asarray(xy2))
    err = np.asarray(sampson_error_e(E, jnp.asarray(xy1), jnp.asarray(xy2)))
    assert err.max() < 1e-8
    R, t, nfront = pose_from_essential(E, jnp.asarray(xy1), jnp.asarray(xy2))
    assert int(nfront) == 40
    R_gt = np.array(quat_to_rotmat(jnp.asarray(qb)))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-5)
    t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
    t_gt = tb / np.linalg.norm(tb)
    assert min(np.abs(t_dir - t_gt).max(), np.abs(t_dir + t_gt).max()) < 1e-5


def test_essential_5pt_exact():
    xy1, xy2, qb, tb, _ = make_two_view(5, seed=3)
    Es, ok = essential_5pt(jnp.asarray(xy1), jnp.asarray(xy2))
    E_gt = essential_from_pose(qb, tb)
    best = np.inf
    for i in range(10):
        if bool(ok[i]):
            En = np.asarray(Es[i])
            best = min(best, np.abs(En - E_gt).max(), np.abs(En + E_gt).max())
    assert best < 1e-5


def test_essential_5pt_batched():
    """vmap over RANSAC-style sample batches."""
    import jax

    rng = np.random.default_rng(4)
    xy1s, xy2s, Egts = [], [], []
    for s in range(8):
        xy1, xy2, qb, tb, _ = make_two_view(5, seed=10 + s)
        xy1s.append(xy1)
        xy2s.append(xy2)
        Egts.append(essential_from_pose(qb, tb))
    Es, ok = jax.vmap(essential_5pt)(jnp.asarray(np.stack(xy1s)), jnp.asarray(np.stack(xy2s)))
    for s in range(8):
        best = np.inf
        for i in range(10):
            if bool(ok[s, i]):
                En = np.asarray(Es[s, i])
                best = min(best, np.abs(En - Egts[s]).max(), np.abs(En + Egts[s]).max())
        assert best < 1e-4, f"sample {s}: {best}"


def test_p3p_exact():
    rng = np.random.default_rng(5)
    for seed in range(5):
        xy1, xy2, qb, tb, pts = make_two_view(3, seed=20 + seed)
        q, t, valid = p3p_solve(jnp.asarray(pts), jnp.asarray(xy2))
        # One of the (up to 4) solutions must match the true pose.
        best_q, best_t = np.inf, np.inf
        for i in range(4):
            if bool(valid[i]):
                qn = np.asarray(q[i])
                dq = min(np.abs(qn - qb).max(), np.abs(qn + qb).max())
                dt = np.abs(np.asarray(t[i]) - tb).max()
                if dq + dt < best_q + best_t:
                    best_q, best_t = dq, dt
        assert best_q < 1e-6, f"seed {seed}"
        assert best_t < 1e-5, f"seed {seed}"


def test_epnp_exact():
    xy1, xy2, qb, tb, pts = make_two_view(12, seed=6)
    q, t, valid = epnp_solve(jnp.asarray(pts), jnp.asarray(xy2))
    assert bool(valid)
    qn = np.asarray(q)
    dq = min(np.abs(qn - qb).max(), np.abs(qn + qb).max())
    assert dq < 1e-4
    np.testing.assert_allclose(np.asarray(t), tb, atol=1e-4)


def test_homography_exact():
    # Planar scene -> exact homography.
    rng = np.random.default_rng(7)
    pts = np.concatenate([rng.uniform(-2, 2, size=(20, 2)),
                          np.full((20, 1), 5.0)], axis=1)
    qb = np.array([0.99875026, 0.0, 0.04997917, 0.0])
    tb = np.array([-0.5, 0.1, 0.3])
    p2 = np.array(quat_rotate(jnp.asarray(qb), jnp.asarray(pts))) + tb
    xy1 = pts[:, :2] / pts[:, 2:3]
    xy2 = p2[:, :2] / p2[:, 2:3]
    H = homography_dlt(jnp.asarray(xy1), jnp.asarray(xy2))
    err = np.asarray(homography_transfer_error(H, jnp.asarray(xy1), jnp.asarray(xy2)))
    assert err.max() < 1e-10
