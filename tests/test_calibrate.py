import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.geometry import cameras, lie
from vslam_tpu.tools import calibrate as cal


@pytest.mark.slow
def test_calibration_recovers_intrinsics():
    rng = np.random.RandomState(0)
    grid = jnp.asarray(cal.aprilgrid_points(rows=4, cols=4), jnp.float32)
    G = grid.shape[0]
    F = 14

    intr_gt = jnp.asarray([
        [350.0, 352.0, 376.0, 240.0, -0.2, 0.55, 0, 0],
        [360.0, 358.0, 380.0, 250.0, -0.21, 0.57, 0, 0],
    ], jnp.float32)
    T_i_c_gt = jnp.asarray([
        [0, 0, 0, 0, 0, 0, 1.0],
        [0.11, 0.002, -0.001, 0.003, 0.001, -0.002, 1.0],
    ], jnp.float32)
    T_i_c_gt = jax.vmap(lie.se3_normalize)(T_i_c_gt)

    # body poses orbiting the grid with rich viewpoint + distance diversity
    # (focal length / distortion / depth are correlated; calibration needs
    # strong excitation, like a real calibration sweep)
    poses = []
    center = np.array([0.3, 0.3, 0.0])
    for f in range(F):
        s = f / max(F - 1, 1)
        ang = 1.6 * (s - 0.5)
        elev = 0.9 * np.sin(3.1 * s)
        dist = 0.45 + 0.5 * s
        pos = center + dist * np.array(
            [np.sin(ang) * np.cos(elev), np.sin(elev), -np.cos(ang) * np.cos(elev)])
        look = center - pos
        look = look / np.linalg.norm(look)
        # simple look-at with x-axis alignment
        x = np.cross([0, 1, 0], look)
        x /= np.linalg.norm(x)
        y = np.cross(look, x)
        R = np.stack([x, y, look], axis=1)
        poses.append(np.concatenate([pos, np.asarray(
            lie.matrix_to_quat(jnp.asarray(R, jnp.float32)))]))
    T_w_i_gt = jnp.asarray(np.stack(poses), jnp.float32)

    obs_frame, obs_cam, obs_corner, obs_uv = [], [], [], []
    for f in range(F):
        for c in range(2):
            T_w_c = lie.se3_mul(T_w_i_gt[f], T_i_c_gt[c])
            pc = lie.se3_apply(lie.se3_inv(T_w_c), grid)
            uv = cameras.project("ds", intr_gt[c], pc)
            obs_frame += [f] * G
            obs_cam += [c] * G
            obs_corner += list(range(G))
            obs_uv.append(np.asarray(uv))
    # noise-free: tests that the solver finds the exact optimum (with pixel
    # noise the ML optimum legitimately differs from GT by several px of
    # focal due to focal-depth correlation on a planar target)
    obs_uv = np.concatenate(obs_uv)

    # perturbed initial guesses
    key = jax.random.PRNGKey(1)
    T_w_i0 = jax.vmap(lie.se3_retract)(
        T_w_i_gt, 0.02 * jax.random.normal(key, (F, 6)))
    T_w_i0 = T_w_i0.at[0].set(T_w_i_gt[0])  # gauge frame exact
    intr0 = intr_gt + jnp.asarray(
        [[5.0, -4, 3, -3, 0.05, -0.04, 0, 0], [-6, 5, -2, 4, 0.04, -0.05, 0, 0]])
    T_i_c0 = jax.vmap(lie.se3_retract)(
        T_i_c_gt, 0.01 * jax.random.normal(jax.random.PRNGKey(2), (2, 6)))

    prob = cal.CalibProblem(
        grid=grid,
        obs_frame=jnp.asarray(obs_frame, jnp.int32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_corner=jnp.asarray(obs_corner, jnp.int32),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_valid=jnp.ones(len(obs_frame), bool),
        T_w_i0=T_w_i0, T_i_c0=T_i_c0, intr0=intr0,
    )
    T_w_i, T_i_c, intr, stats = cal.calibrate(prob, cam_name="ds",
                                              max_iters=40)
    assert float(stats["final_cost"]) < float(stats["initial_cost"]) * 1e-4
    err = np.abs(np.asarray(intr) - np.asarray(intr_gt))
    assert err[:, :4].max() < 1.0, err   # focal/center within 1 px
    assert err[:, 4:6].max() < 0.01, err  # xi/alpha
    # extrinsics recovered too (baseline within a millimeter)
    t_err = np.abs(np.asarray(T_i_c)[:, :3] - np.asarray(T_i_c_gt)[:, :3])
    assert t_err.max() < 1e-3, t_err
