import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.geometry import lie
from vslam_tpu.geometry.triangulate import triangulate_midpoint
from vslam_tpu.solvers import pnp


def make_scene(key, n=100, outlier_frac=0.3, noise=0.0):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    points = jax.random.uniform(k1, (n, 3), minval=-3.0, maxval=3.0) + jnp.array(
        [0.0, 0.0, 8.0]
    )
    # ground-truth camera pose T_w_c
    xi = jax.random.normal(k2, (6,)) * jnp.array([0.5, 0.5, 0.5, 0.15, 0.15, 0.15])
    T_w_c = lie.se3_exp(xi)
    T_c_w = lie.se3_inv(T_w_c)
    pc = lie.se3_apply(T_c_w, points)
    bearings = pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)
    if noise > 0:
        bearings = bearings + noise * jax.random.normal(k3, bearings.shape)
        bearings = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)
    n_out = int(n * outlier_frac)
    if n_out:
        bad = jax.random.normal(k4, (n_out, 3))
        bad = bad / jnp.linalg.norm(bad, axis=-1, keepdims=True)
        bearings = bearings.at[:n_out].set(bad)
    return points, bearings, T_w_c, n_out


def test_ransac_pnp_exact():
    points, bearings, T_w_c, n_out = make_scene(jax.random.PRNGKey(0))
    valid = jnp.ones(points.shape[0], bool)
    T_est, inliers, num, ok = pnp.ransac_pnp(
        jax.random.PRNGKey(1), points, bearings, valid,
        threshold=pnp.ransac_threshold(3.0))
    assert bool(ok)
    assert int(num) >= points.shape[0] - n_out - 2
    err = lie.se3_log(lie.se3_mul(lie.se3_inv(T_w_c), T_est))
    assert float(jnp.abs(err).max()) < 1e-2
    # outliers detected
    assert int(jnp.sum(inliers[:n_out])) <= 2


def test_ransac_pnp_noisy():
    points, bearings, T_w_c, n_out = make_scene(
        jax.random.PRNGKey(2), n=150, outlier_frac=0.4, noise=1e-3)
    valid = jnp.ones(points.shape[0], bool)
    T_est, inliers, num, ok = pnp.ransac_pnp(
        jax.random.PRNGKey(3), points, bearings, valid,
        threshold=pnp.ransac_threshold(3.0))
    assert bool(ok)
    err = lie.se3_log(lie.se3_mul(lie.se3_inv(T_w_c), T_est))
    # depth-direction translation is weakly constrained under bearing noise
    assert float(jnp.linalg.norm(err[:3])) < 0.2
    assert float(jnp.linalg.norm(err[3:])) < 0.02


def test_ransac_pnp_respects_valid_mask():
    points, bearings, T_w_c, _ = make_scene(
        jax.random.PRNGKey(4), n=80, outlier_frac=0.0)
    # corrupt the last 30 and mark them invalid
    bearings = bearings.at[50:].set(
        jax.random.normal(jax.random.PRNGKey(5), (30, 3)))
    valid = jnp.arange(80) < 50
    T_est, inliers, num, ok = pnp.ransac_pnp(
        jax.random.PRNGKey(6), points, bearings, valid,
        threshold=pnp.ransac_threshold(3.0))
    assert not bool(jnp.any(inliers[50:]))
    err = lie.se3_log(lie.se3_mul(lie.se3_inv(T_w_c), T_est))
    assert float(jnp.abs(err).max()) < 1e-2


def test_triangulate_midpoint():
    key = jax.random.PRNGKey(7)
    points1 = jax.random.uniform(key, (64, 3), minval=-2, maxval=2) + jnp.array(
        [0.0, 0.0, 6.0]
    )  # points in frame 1
    T_1_2 = lie.se3_exp(jnp.array([0.11, 0.0, 0.0, 0.0, 0.02, 0.0]))  # stereo-ish
    points2 = lie.se3_apply(lie.se3_inv(T_1_2), points1)
    f1 = points1 / jnp.linalg.norm(points1, axis=-1, keepdims=True)
    f2 = points2 / jnp.linalg.norm(points2, axis=-1, keepdims=True)
    est, valid = triangulate_midpoint(f1, f2, T_1_2)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(est), np.asarray(points1), atol=8e-3)
