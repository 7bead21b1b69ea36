"""Stretch-scale global BA: the 4K-keyframe configuration (SURVEY §7 step 9).

The dense Schur solver forms a (6K)^2 reduced system and stops scaling near
~1k keyframes; the matrix-free LM-CG solver (solvers/ba_cg.py) is O(K+L+O)
memory, so a 4096-keyframe-pair problem (8192 cameras, 64k landmarks, 1M
observations) must build and take productive LM steps. This is the hermetic
stand-in for the reference's global BA over a full EuRoC run
(loop_closure_utils.h:672-748) at ~20x its scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.geometry import cameras, lie
from vslam_tpu.solvers import ba, ba_cg

PINHOLE = jnp.array([400.0, 400.0, 376.0, 240.0, 0, 0, 0, 0])


def make_big_problem(n_pairs=4096, pts_per_kf=16, obs_per_pt=16, noise=0.3,
                     perturb=0.02, seed=0):
    """Camera pairs around a large circle, landmarks on the outer wall."""
    rng = np.random.RandomState(seed)
    K = 2 * n_pairs
    R_orbit, R_wall = 50.0, 65.0

    th = 2 * np.pi * np.arange(n_pairs) / n_pairs
    # left cams look outward; right cams offset along the local tangent
    pos = np.stack([R_orbit * np.sin(th), np.zeros(n_pairs),
                    -R_orbit * np.cos(th)], -1)
    # yaw so +z looks outward
    q = np.stack([np.zeros(n_pairs), np.sin(th / 2), np.zeros(n_pairs),
                  np.cos(th / 2)], -1)
    poses_l = np.concatenate([pos, q], -1).astype(np.float32)
    tang = np.stack([np.cos(th), np.zeros(n_pairs), np.sin(th)], -1)
    poses_r = poses_l.copy()
    poses_r[:, :3] += 0.2 * tang
    poses_gt = np.stack([poses_l, poses_r], 1).reshape(K, 7)

    # landmarks: pts_per_kf per pair on the wall ahead of it
    L = n_pairs * pts_per_kf
    lth = np.repeat(th, pts_per_kf) + rng.uniform(-0.02, 0.02, L)
    ly = rng.uniform(-6, 6, L)
    points_gt = np.stack([R_wall * np.sin(lth), ly,
                          -R_wall * np.cos(lth)], -1).astype(np.float32)

    # observations: each landmark seen by obs_per_pt consecutive pairs
    # (both cams), so O = L * obs_per_pt
    base_pair = np.repeat(np.arange(n_pairs), pts_per_kf)
    offs = np.arange(obs_per_pt // 2) - obs_per_pt // 4
    obs_pair = (base_pair[:, None] + offs[None, :]) % n_pairs   # [L, o/2]
    obs_cam = np.stack([2 * obs_pair, 2 * obs_pair + 1], -1).reshape(L, -1)
    obs_point = np.broadcast_to(np.arange(L)[:, None], obs_cam.shape)
    obs_cam = obs_cam.reshape(-1).astype(np.int32)
    obs_point = obs_point.reshape(-1).astype(np.int32)

    # project ground truth (numpy pinhole, chunked to bound memory)
    T = jnp.asarray(poses_gt)
    P = jnp.asarray(points_gt)
    def proj(chunk_cam, chunk_pt):
        pc = jax.vmap(lambda c, p: lie.se3_apply(lie.se3_inv(T[c]), P[p]))(
            chunk_cam, chunk_pt)
        return cameras.project("pinhole", PINHOLE, pc)
    O = obs_cam.shape[0]
    uv = np.concatenate([
        np.asarray(proj(jnp.asarray(obs_cam[i:i + 65536]),
                        jnp.asarray(obs_point[i:i + 65536])))
        for i in range(0, O, 65536)])
    in_img = ((uv[:, 0] > -200) & (uv[:, 0] < 952)
              & (uv[:, 1] > -200) & (uv[:, 1] < 680))
    uv = uv + rng.normal(0, noise, uv.shape).astype(np.float32)

    dpose = rng.normal(0, perturb, (K, 6)).astype(np.float32)
    dpose[:2] = 0.0
    poses0 = jax.vmap(lie.se3_retract)(jnp.asarray(poses_gt),
                                       jnp.asarray(dpose))
    points0 = points_gt + rng.normal(0, 2 * perturb, points_gt.shape)

    prob = ba.BAProblem(
        poses=poses0,
        pose_fixed=jnp.arange(K) < 2,
        intr=jnp.tile(PINHOLE, (K, 1)),
        points=jnp.asarray(points0.astype(np.float32)),
        point_valid=jnp.ones(L, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_valid=jnp.asarray(in_img),
    )
    return prob, poses_gt, points_gt


@pytest.mark.slow
def test_global_ba_4k_keyframes():
    prob, poses_gt, points_gt = make_big_problem()
    assert prob.poses.shape[0] == 8192
    assert prob.obs_cam.shape[0] == 1024 * 1024  # 1M observations

    poses, points, stats = ba_cg.solve_ba_cg(
        prob, cam_name="pinhole", huber=2.0, max_iters=3, cg_iters=8)
    init, final = float(stats["initial_cost"]), float(stats["final_cost"])
    assert final < init * 0.5, (init, final)
    # poses move toward truth, not away
    err0 = float(jnp.mean(jnp.linalg.norm(
        prob.poses[:, :3] - poses_gt[:, :3], axis=-1)))
    err1 = float(jnp.mean(jnp.linalg.norm(
        poses[:, :3] - poses_gt[:, :3], axis=-1)))
    assert err1 < err0, (err0, err1)
