import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.geometry import lie


def random_pose(key):
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, (6,)) * jnp.array([1.0, 1.0, 1.0, 0.8, 0.8, 0.8])
    return lie.se3_exp(xi)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = lie.quat_normalize(jax.random.normal(key, (11, 4)))
    v = jax.random.normal(jax.random.PRNGKey(1), (11, 3))
    out1 = lie.quat_rotate(q, v)
    out2 = jnp.einsum("bij,bj->bi", lie.quat_to_matrix(q), v)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_matrix_quat_roundtrip():
    key = jax.random.PRNGKey(2)
    q = lie.quat_normalize(jax.random.normal(key, (64, 4)))
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    m = lie.quat_to_matrix(q)
    q2 = lie.matrix_to_quat(m)
    q2 = jnp.where(q2[..., 3:4] < 0, -q2, q2)
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (64, 3))
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = w * jnp.linspace(1e-8, 3.0, 64)[:, None]
    q = lie.so3_exp_quat(w)
    w2 = lie.so3_log(q)
    np.testing.assert_allclose(w, w2, atol=2e-5)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(4)
    xi = jax.random.normal(key, (64, 6))
    # keep |omega| < pi (injectivity radius of SO(3) log)
    w = xi[:, 3:6]
    wn = jnp.linalg.norm(w, axis=-1, keepdims=True)
    xi = jnp.concatenate([xi[:, :3], w / wn * jnp.minimum(wn, 2.8)], axis=-1)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(xi, xi2, atol=2e-3)


def test_se3_mul_inv():
    T1 = random_pose(jax.random.PRNGKey(5))
    T2 = random_pose(jax.random.PRNGKey(6))
    T = lie.se3_mul(T1, T2)
    I1 = lie.se3_mul(T, lie.se3_inv(T))
    np.testing.assert_allclose(I1[:3], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(I1[6]), 1.0, atol=1e-5)

    # matrix consistency
    M = lie.se3_matrix(T1) @ lie.se3_matrix(T2)
    np.testing.assert_allclose(lie.se3_matrix(T), M, atol=1e-5)


def test_se3_apply():
    T = random_pose(jax.random.PRNGKey(7))
    p = jax.random.normal(jax.random.PRNGKey(8), (5, 3))
    out = lie.se3_apply(T, p)
    M = lie.se3_matrix(T)
    out2 = p @ np.asarray(M[:3, :3]).T + np.asarray(M[:3, 3])
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_retract_small_step():
    T = random_pose(jax.random.PRNGKey(9))
    delta = jnp.full((6,), 1e-4)
    T2 = lie.se3_retract(T, delta)
    d = lie.se3_log(lie.se3_mul(lie.se3_inv(T), T2))
    np.testing.assert_allclose(d, delta, atol=1e-6)


def test_hat():
    w = jnp.array([1.0, 2.0, 3.0])
    v = jnp.array([0.5, -0.3, 0.9])
    np.testing.assert_allclose(lie.hat(w) @ v, jnp.cross(w, v), atol=1e-6)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lie.se3_log))
    xi = jax.random.normal(jax.random.PRNGKey(10), (16, 6))
    # keep |omega| < pi (log injectivity radius)
    w = xi[:, 3:6]
    wn = jnp.linalg.norm(w, axis=-1, keepdims=True)
    xi = jnp.concatenate([xi[:, :3], w / wn * jnp.minimum(wn, 2.5)], axis=-1)
    T = jax.vmap(lie.se3_exp)(xi)
    np.testing.assert_allclose(f(T), xi, atol=2e-3)
