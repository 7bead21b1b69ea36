import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.geometry import lie
from vslam_tpu.solvers import pose_graph as pg


def make_chain(n=8, drift=0.05):
    """Ground-truth circle; odometry measurements with drift; loop edge."""
    key = jax.random.PRNGKey(0)
    gt = []
    for i in range(n):
        th = 2 * np.pi * i / n
        t = jnp.array([np.cos(th) * 2, np.sin(th) * 2, 0.0])
        q = lie.so3_exp_quat(jnp.array([0.0, 0.0, th]))
        gt.append(lie.se3_make(t, q))
    gt = jnp.stack(gt)

    # odometry with accumulated drift
    poses = [gt[0]]
    edges_i, edges_j, meas = [], [], []
    for i in range(1, n):
        rel = lie.se3_mul(lie.se3_inv(gt[i - 1]), gt[i])
        noise = lie.se3_exp(jnp.full((6,), drift / n) * jnp.array(
            [1.0, 1, 0, 0, 0, 1]))
        poses.append(lie.se3_mul(poses[-1], lie.se3_mul(rel, noise)))
        edges_i.append(i - 1)
        edges_j.append(i)
        meas.append(lie.se3_log(lie.se3_mul(rel, noise)))
    # loop edge: exact relative pose between last and first (closing)
    edges_i.append(n - 1)
    edges_j.append(0)
    meas.append(lie.se3_log(lie.se3_mul(lie.se3_inv(gt[n - 1]), gt[0])))
    return gt, jnp.stack(poses), (jnp.asarray(edges_i), jnp.asarray(edges_j),
                                  jnp.stack(meas))


def test_pose_graph_closes_loop():
    gt, poses0, (ei, ej, meas) = make_chain(n=8, drift=0.4)
    E = len(ei)
    prob = pg.PoseGraphProblem(
        poses=poses0,
        fixed=jnp.arange(8) == 0,
        edge_i=ei.astype(jnp.int32), edge_j=ej.astype(jnp.int32),
        edge_meas=meas, edge_valid=jnp.ones(E, bool))
    opt, stats = pg.solve_pose_graph(prob, max_iters=25)
    # drift error at the last pose should shrink a lot
    err0 = float(jnp.linalg.norm(poses0[-1, :3] - gt[-1, :3]))
    err1 = float(jnp.linalg.norm(opt[-1, :3] - gt[-1, :3]))
    assert err1 < err0 * 0.5, (err0, err1)
    assert float(stats["final_cost"]) < float(stats["initial_cost"])


def test_pose_graph_cg_matches_dense():
    from vslam_tpu.solvers.pose_graph_cg import solve_pose_graph_cg

    gt, poses0, (ei, ej, meas) = make_chain(n=8, drift=0.4)
    E = len(ei)
    prob = pg.PoseGraphProblem(
        poses=poses0,
        fixed=jnp.arange(8) == 0,
        edge_i=ei.astype(jnp.int32), edge_j=ej.astype(jnp.int32),
        edge_meas=meas, edge_valid=jnp.ones(E, bool))
    dense, s1 = pg.solve_pose_graph(prob, max_iters=25)
    cg, s2 = solve_pose_graph_cg(prob, max_iters=25, cg_iters=40)
    # both reach the same cost basin
    assert float(s2["final_cost"]) < float(s2["initial_cost"]) * 0.2
    assert float(s2["final_cost"]) < float(s1["final_cost"]) * 1.5 + 1e-3
    np.testing.assert_allclose(np.asarray(cg[:, :3]),
                               np.asarray(dense[:, :3]), atol=0.05)


def test_pose_graph_respects_fixed_and_padding():
    gt, poses0, (ei, ej, meas) = make_chain(n=6, drift=0.2)
    # pad edges
    E = len(ei)
    Ep = E + 5
    prob = pg.PoseGraphProblem(
        poses=poses0,
        fixed=jnp.arange(6) == 0,
        edge_i=jnp.concatenate([ei, jnp.zeros(5, jnp.int32)]).astype(jnp.int32),
        edge_j=jnp.concatenate([ej, jnp.zeros(5, jnp.int32)]).astype(jnp.int32),
        edge_meas=jnp.concatenate([meas, jnp.zeros((5, 6))]),
        edge_valid=jnp.arange(Ep) < E)
    opt, _ = pg.solve_pose_graph(prob, max_iters=15)
    np.testing.assert_array_equal(np.asarray(opt[0]), np.asarray(poses0[0]))
