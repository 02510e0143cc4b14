"""Unit tests for core quaternion/rotation math vs analytic cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.core import maths


def test_quat_identity_rotate():
    q = maths.quat_identity()
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(maths.quat_rotate(q, v), v, atol=1e-6)


def test_quat_rotate_90deg_z():
    q = maths.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
    v = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(maths.quat_rotate(q, v), [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(maths.quat_rotate_inverse(q, v), [0.0, -1.0, 0.0], atol=1e-6)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = maths.quat_normalize(jax.random.normal(key, (32, 4)))
    v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    R = maths.quat_to_matrix(q)
    np.testing.assert_allclose(
        maths.quat_rotate(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-5)


def test_quat_mul_compose():
    qa = maths.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(0.3))
    qb = maths.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(0.5))
    qc = maths.quat_mul(qa, qb)
    expect = maths.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(0.8))
    np.testing.assert_allclose(qc, expect, atol=1e-6)


def test_euler_roundtrip():
    rpy = jnp.array([[0.3, -0.4, 1.2], [0.0, 0.0, 0.0], [-1.0, 0.5, -2.0]])
    q = maths.quat_from_euler_xyz(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    back = maths.quat_to_euler_xyz(q)
    np.testing.assert_allclose(back, rpy, atol=1e-5)


def test_quat_apply_yaw():
    # pure-yaw quats: identical to full rotation
    q = maths.quat_from_euler_xyz(jnp.array([0.0]), jnp.array([0.0]), jnp.array([np.pi / 2]))
    v = jnp.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(maths.quat_apply_yaw(q, v), [[0.0, 1.0, 0.0]], atol=1e-5)
    # mixed rotation: matches the reference's zero-xy-components semantics
    # (legged_gym/utils/math.py:8-14)
    qm = maths.quat_from_euler_xyz(jnp.array([0.7]), jnp.array([0.4]), jnp.array([1.1]))
    qyaw = jnp.concatenate([jnp.zeros((1, 2)), qm[:, 2:]], axis=-1)
    qyaw = maths.quat_normalize(qyaw)
    np.testing.assert_allclose(
        maths.quat_apply_yaw(qm, v), maths.quat_rotate(qyaw, v), atol=1e-5)


def test_wrap_to_pi():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 2 * np.pi, 3.0])
    w = maths.wrap_to_pi(a)
    assert bool(jnp.all(w <= np.pi + 1e-6)) and bool(jnp.all(w > -np.pi - 1e-6))
    np.testing.assert_allclose(np.cos(w), np.cos(a), atol=1e-5)
    np.testing.assert_allclose(np.sin(w), np.sin(a), atol=1e-5)


def test_quat_integrate_constant_omega():
    q = maths.quat_identity()
    omega = jnp.array([0.0, 0.0, 1.0])
    for _ in range(100):
        q = maths.quat_integrate(q, omega, 0.01)
    # after 1 s at 1 rad/s about z -> yaw = 1 rad
    rpy = maths.quat_to_euler_xyz(q)
    np.testing.assert_allclose(rpy, [0.0, 0.0, 1.0], atol=1e-4)


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    u = jnp.array([-0.5, 0.4, 2.0])
    np.testing.assert_allclose(maths.skew(v) @ u, jnp.cross(v, u), atol=1e-6)


def test_sample_disjoint_intervals():
    key = jax.random.PRNGKey(0)
    lb = jnp.full((2000,), 0.4)
    lo = jnp.full((2000,), -1.0)
    hi = jnp.full((2000,), 1.0)
    s = maths.sample_disjoint_intervals(key, lb, lo, hi)
    assert bool(jnp.all((s <= -0.4 + 1e-5) | (s >= 0.4 - 1e-5)))
    assert bool(jnp.all((s >= -1.0 - 1e-5) & (s <= 1.0 + 1e-5)))
    # roughly symmetric
    assert abs(float(jnp.mean(s))) < 0.05


def test_sample_disjoint_intervals_degenerate():
    # limit bound beyond range -> still returns values inside [lo, hi]
    key = jax.random.PRNGKey(1)
    lb = jnp.full((100,), 2.0)
    s = maths.sample_disjoint_intervals(key, lb, jnp.full((100,), -1.0), jnp.full((100,), 1.0))
    assert bool(jnp.all(jnp.isfinite(s)))


def test_rpy_to_matrix_matches_quat():
    rpy = jnp.array([0.3, -0.2, 0.9])
    R1 = maths.rpy_to_matrix(rpy)
    q = maths.quat_from_euler_xyz(rpy[0], rpy[1], rpy[2])
    R2 = maths.quat_to_matrix(q)
    np.testing.assert_allclose(R1, R2, atol=1e-5)
