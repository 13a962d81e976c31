"""Pose algebra unit tests (mirrors the synthetic-recovery style of
ref: src/base/pose_test.cc, util tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.geometry import (
    angle_axis_to_quat,
    pose_inverse,
    pose_product,
    pose_transform,
    quat_multiply,
    quat_normalize,
    quat_retract,
    quat_rotate,
    quat_to_angle_axis,
    quat_to_rotmat,
    quat_slerp,
    rotmat_to_quat,
)


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return np.asarray(quat_normalize(jnp.asarray(q)))


def test_identity_rotation():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    p = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat_rotate(q, p), p, atol=1e-12)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, (100,))
    p = rng.normal(size=(100, 3))
    via_quat = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(p)))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    via_mat = np.einsum("nij,nj->ni", R, p)
    np.testing.assert_allclose(via_quat, via_mat, atol=1e-12)


def test_quat_multiply_composes_rotation():
    rng = np.random.default_rng(1)
    qa = rand_quat(rng, (50,))
    qb = rand_quat(rng, (50,))
    p = rng.normal(size=(50, 3))
    ab = quat_multiply(jnp.asarray(qa), jnp.asarray(qb))
    lhs = quat_rotate(ab, jnp.asarray(p))
    rhs = quat_rotate(jnp.asarray(qa), quat_rotate(jnp.asarray(qb), jnp.asarray(p)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_rotmat_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = rand_quat(rng, (200,))
    # Canonical sign w >= 0.
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(rotmat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_angle_axis_roundtrip():
    # Roundtrip is identity only for |angle| < pi (beyond that the rotation
    # wraps to the equivalent shorter angle-axis).
    rng = np.random.default_rng(3)
    axis = rng.normal(size=(100, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-np.pi * 0.99, np.pi * 0.99, size=(100, 1))
    aa = axis * angle
    q = angle_axis_to_quat(jnp.asarray(aa))
    aa2 = np.asarray(quat_to_angle_axis(q))
    np.testing.assert_allclose(aa2, aa, atol=1e-9)


def test_angle_axis_small_angle():
    aa = jnp.array([1e-12, 0.0, 0.0])
    q = angle_axis_to_quat(aa)
    np.testing.assert_allclose(np.asarray(q), [1.0, 5e-13, 0.0, 0.0], atol=1e-15)


def test_pose_inverse_roundtrip():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rand_quat(rng, (30,)))
    t = jnp.asarray(rng.normal(size=(30, 3)))
    p = jnp.asarray(rng.normal(size=(30, 3)))
    qi, ti = pose_inverse(q, t)
    back = pose_transform(qi, ti, pose_transform(q, t, p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-10)


def test_pose_product_matches_sequential():
    rng = np.random.default_rng(5)
    qa = jnp.asarray(rand_quat(rng, (30,)))
    ta = jnp.asarray(rng.normal(size=(30, 3)))
    qb = jnp.asarray(rand_quat(rng, (30,)))
    tb = jnp.asarray(rng.normal(size=(30, 3)))
    p = jnp.asarray(rng.normal(size=(30, 3)))
    qab, tab = pose_product(qa, ta, qb, tb)
    lhs = pose_transform(qab, tab, p)
    rhs = pose_transform(qa, ta, pose_transform(qb, tb, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_retract_identity():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rand_quat(rng, (10,)))
    q2 = quat_retract(q, jnp.zeros((10, 3)))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-12)


def test_retract_small_step_rotates():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    delta = jnp.array([0.0, 0.0, np.pi / 2])
    q2 = quat_retract(q, delta)
    p = quat_rotate(q2, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [0.0, 1.0, 0.0], atol=1e-12)


def test_slerp_endpoints():
    rng = np.random.default_rng(7)
    q0 = jnp.asarray(rand_quat(rng))
    q1 = jnp.asarray(rand_quat(rng))
    s0 = np.asarray(quat_slerp(q0, q1, 0.0))
    s1 = np.asarray(quat_slerp(q0, q1, 1.0))
    assert (np.allclose(s0, np.asarray(q0), atol=1e-9)
            or np.allclose(s0, -np.asarray(q0), atol=1e-9))
    assert (np.allclose(s1, np.asarray(q1), atol=1e-9)
            or np.allclose(s1, -np.asarray(q1), atol=1e-9))


def test_jit_and_grad():
    """Everything must be traceable and differentiable."""
    def f(aa, p):
        q = angle_axis_to_quat(aa)
        return jnp.sum(quat_rotate(q, p) ** 2)

    g = jax.grad(f)(jnp.array([0.1, 0.2, 0.3]), jnp.array([1.0, 0.0, 1.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    jf = jax.jit(f)
    assert np.isfinite(float(jf(jnp.array([0.1, 0.2, 0.3]), jnp.array([1.0, 0.0, 1.0]))))


def test_numpy_variants_match_jnp():
    """Host (numpy) pose-algebra variants used by the mapper /
    reconstruction host loops must agree with the jnp versions — incl.
    quat_rotate's normalize-first semantics on unnormalized input."""
    from sba_tpu.geometry.quaternions import (
        np_angle_axis_to_quat,
        np_quat_conjugate,
        np_quat_normalize,
        np_quat_rotate,
        np_quat_to_angle_axis,
        np_quat_to_rotmat,
        np_rotmat_to_quat,
        quat_conjugate,
        quat_to_angle_axis,
        quat_to_rotmat,
        rotmat_to_quat,
    )

    rng = np.random.default_rng(3)
    for i in range(25):
        q = rng.normal(size=4)
        if i % 3:
            q = q / np.linalg.norm(q)  # mix unit and non-unit inputs
        v = rng.normal(size=(5, 3))

        np.testing.assert_allclose(
            np_quat_rotate(q, v),
            np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(v))),
            atol=1e-9)
        np.testing.assert_allclose(
            np_quat_to_rotmat(q),
            np.asarray(quat_to_rotmat(jnp.asarray(q))), atol=1e-9)
        np.testing.assert_allclose(
            np_quat_conjugate(q),
            np.asarray(quat_conjugate(jnp.asarray(q))), atol=1e-9)

        qn = np_quat_normalize(q)
        R = np_quat_to_rotmat(qn)
        q2 = np_rotmat_to_quat(R)
        qr = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        assert min(np.abs(q2 - qr).max(), np.abs(q2 + qr).max()) < 1e-7
        assert min(np.abs(q2 - qn).max(), np.abs(q2 + qn).max()) < 1e-9

        aa = np_quat_to_angle_axis(qn)
        np.testing.assert_allclose(
            aa, np.asarray(quat_to_angle_axis(jnp.asarray(qn))), atol=1e-7)
        qb = np_angle_axis_to_quat(aa)
        assert min(np.abs(qb - qn).max(), np.abs(qb + qn).max()) < 1e-9
