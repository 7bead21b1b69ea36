"""Golden solver test: LM-Schur BA vs scipy.optimize.least_squares.

The SURVEY test plan calls for fixed-seed golden tests of the LM solver
against a scipy reference — Ceres-quality convergence is load-bearing for
ATE parity. Both solvers get the same Huber-robustified reprojection
problem; our solver must reach the same cost basin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import least_squares

from vslam_tpu.geometry import cameras, lie
from vslam_tpu.solvers import ba, ba_blocked

PINHOLE = np.array([300.0, 300.0, 320.0, 240.0, 0, 0, 0, 0])


def build_problem(seed=0, n_cams=5, n_pts=60, noise=0.4):
    rng = np.random.RandomState(seed)
    t = np.stack([np.linspace(0, 1.5, n_cams), np.zeros(n_cams),
                  np.zeros(n_cams)], -1)
    poses_gt = np.concatenate([t, np.tile([0, 0, 0, 1.0], (n_cams, 1))], -1)
    pts_gt = rng.uniform([-2, -1.5, 4], [3.5, 1.5, 8], (n_pts, 3))

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        pc = np.asarray(lie.se3_apply(
            lie.se3_inv(jnp.asarray(poses_gt[c], jnp.float32)),
            jnp.asarray(pts_gt, jnp.float32)))
        uv = np.asarray(cameras.project("pinhole", PINHOLE, pc))
        obs_cam += [c] * n_pts
        obs_pt += list(range(n_pts))
        obs_uv.append(uv)
    obs_uv = np.concatenate(obs_uv) + rng.normal(0, noise, (n_cams * n_pts, 2))

    d = rng.normal(0, 0.03, (n_cams, 6))
    d[:2] = 0
    poses0 = np.asarray(jax.vmap(lie.se3_retract)(
        jnp.asarray(poses_gt, jnp.float32), jnp.asarray(d, jnp.float32)))
    pts0 = pts_gt + rng.normal(0, 0.05, pts_gt.shape)
    return (poses_gt, pts_gt, poses0, pts0,
            np.asarray(obs_cam), np.asarray(obs_pt), obs_uv)


def test_schur_ba_matches_scipy_reference():
    (poses_gt, pts_gt, poses0, pts0, obs_cam, obs_pt, obs_uv) = build_problem()
    n_cams, n_pts = len(poses0), len(pts0)
    huber = 1.0

    # ---- ours ----
    prob = ba.BAProblem(
        poses=jnp.asarray(poses0, jnp.float32),
        pose_fixed=jnp.arange(n_cams) < 2,
        intr=jnp.tile(jnp.asarray(PINHOLE, jnp.float32), (n_cams, 1)),
        points=jnp.asarray(pts0, jnp.float32),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_valid=jnp.ones(len(obs_cam), bool),
    )
    poses_ours, pts_ours, stats = ba.solve_ba_schur(
        prob, cam_name="pinhole", huber=huber, max_iters=30)

    # ---- scipy reference (huber loss; pose deltas on the same manifold),
    # pure numpy so the numerical-Jacobian sweeps stay fast ----
    from scipy.spatial.transform import Rotation

    R0 = Rotation.from_quat(poses0[:, 3:7])  # xyzw
    t0 = poses0[:, :3]

    def residuals(theta):
        dpose = theta[: 6 * n_cams].reshape(n_cams, 6).copy()
        dpose[:2] = 0.0
        dpts = theta[6 * n_cams:].reshape(n_pts, 3)
        X = pts0 + dpts
        # right-multiplicative retraction T0 * exp([ups, omega])
        dR = Rotation.from_rotvec(dpose[:, 3:6])
        # V(omega) ~ I for the small steps scipy takes; use exact exp via
        # quaternion for rotation and first-order V for translation
        R = (R0 * dR)
        t = t0 + R0.apply(dpose[:, :3])
        uv_all = np.empty((len(obs_cam), 2))
        Rm = R.as_matrix()
        for c in range(n_cams):
            m = obs_cam == c
            pc = (X[obs_pt[m]] - t[c]) @ Rm[c]  # R^T (X - t)
            z = np.maximum(pc[:, 2], 1e-9)
            uv_all[m, 0] = PINHOLE[0] * pc[:, 0] / z + PINHOLE[2]
            uv_all[m, 1] = PINHOLE[1] * pc[:, 1] / z + PINHOLE[3]
        return (obs_uv - uv_all).reshape(-1)

    theta0 = np.zeros(6 * n_cams + 3 * n_pts)
    ref = least_squares(residuals, theta0, loss="huber", f_scale=huber,
                        max_nfev=60, method="trf")

    # scipy's huber cost: 2*sum(rho(r^2/2)) with f_scale... compare via the
    # same robust-cost formula on final residuals instead
    def robust_cost(r):
        r = r.reshape(-1, 2)
        s = (r ** 2).sum(1)
        n = np.sqrt(s)
        rho = np.where(n <= huber, s, 2 * huber * n - huber * huber)
        return rho.sum()

    cost_scipy = robust_cost(residuals(ref.x))
    cost_ours = float(stats["final_cost"])
    assert cost_ours <= cost_scipy * 1.05, (cost_ours, cost_scipy)

    # and the recovered geometry agrees with scipy's
    err_t = np.abs(np.asarray(poses_ours)[:, :3] - poses_gt[:, :3]).max()
    assert err_t < 0.02, err_t


def test_blocked_ba_matches_schur():
    """The blocked MXU solver (solvers/ba_blocked.py) must reach the same
    solution as the flat Schur solver on the same problem — same LM control
    law, different data layout and aggregation (one-hot contractions vs
    segment-sum scatters)."""
    (poses_gt, pts_gt, poses0, pts0, obs_cam, obs_pt, obs_uv) = (
        build_problem())
    n_cams, n_pts = len(poses0), len(pts0)

    flat = ba.BAProblem(
        poses=jnp.asarray(poses0, jnp.float32),
        pose_fixed=jnp.arange(n_cams) < 2,
        intr=jnp.tile(jnp.asarray(PINHOLE, jnp.float32), (n_cams, 1)),
        points=jnp.asarray(pts0, jnp.float32),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_valid=jnp.ones(len(obs_cam), bool),
    )
    # same observations as per-landmark tables: row p sees every camera
    # (build_problem observes every point from every camera, cam-major)
    uv_blk = obs_uv.reshape(n_cams, n_pts, 2).transpose(1, 0, 2)
    blk = ba_blocked.BlockProblem(
        poses=flat.poses, pose_fixed=flat.pose_fixed, intr=flat.intr,
        points=flat.points, point_valid=flat.point_valid,
        obs_cam=jnp.tile(jnp.arange(n_cams, dtype=jnp.int32), (n_pts, 1)),
        obs_uv=jnp.asarray(uv_blk, jnp.float32),
        obs_valid=jnp.ones((n_pts, n_cams), bool),
    )
    pf, xf, sf = ba.solve_ba_schur(flat, cam_name="pinhole", huber=1.0,
                                   max_iters=30)
    pb, xb, sb = ba_blocked.solve_ba_blocked(blk, cam_name="pinhole",
                                             huber=1.0, max_iters=30)
    assert abs(float(sf["initial_cost"]) - float(sb["initial_cost"])) \
        <= 1e-2 * (1 + float(sf["initial_cost"]))
    assert float(sb["final_cost"]) <= float(sf["final_cost"]) * 1.02
    assert np.abs(np.asarray(pf) - np.asarray(pb)).max() < 1e-3
    assert np.abs(np.asarray(xf) - np.asarray(xb)).max() < 1e-2
