"""Pose graph optimization: LM on SE3 relative-pose residuals.

Replaces the reference's Ceres essential-graph solve after loop closure
(/root/reference/include/visnav/loop_closure_utils.h:446-587): residual
``log(T_i^-1 T_j) - log(T_ij_meas)`` per edge
(reprojection.h:107-126), Huber(1.0), 20 iterations, current keyframe
fixed. Edges = spanning tree (last-keyframe chain) + covisibility edges
with weight > essential_threshold + the Sim(3)-corrected loop edge.

Fixed-shape design: edges live in padded arrays [E, ...]; per-edge 6x6
Hessian blocks come from vmapped jacfwd and are scatter-summed into a dense
(6K, 6K) system (K = keyframes; ~1k keyframes -> ~40 MB, fine on HBM).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import lie


class PoseGraphProblem(NamedTuple):
    poses: jnp.ndarray       # [K, 7] T_w_c
    fixed: jnp.ndarray       # [K] bool
    edge_i: jnp.ndarray      # [E] int32
    edge_j: jnp.ndarray      # [E] int32
    edge_meas: jnp.ndarray   # [E, 6] log(T_i^-1 T_j) measurement
    edge_valid: jnp.ndarray  # [E] bool


def _edge_residual(Ti, Tj, meas):
    return lie.se3_log(lie.se3_mul(lie.se3_inv(Ti), Tj)) - meas


def _edge_blocks(poses, prob: PoseGraphProblem, huber: float):
    """Residuals + Jacobians per edge, with Huber IRLS sqrt-weights."""

    def one(i, j, meas):
        Ti, Tj = poses[i], poses[j]

        def r_of(di, dj):
            return _edge_residual(lie.se3_retract(Ti, di),
                                  lie.se3_retract(Tj, dj), meas)

        z = jnp.zeros(6, dtype=poses.dtype)
        r = r_of(z, z)
        Ji = jax.jacfwd(r_of, 0)(z, z)
        Jj = jax.jacfwd(r_of, 1)(z, z)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(one)(prob.edge_i, prob.edge_j, prob.edge_meas)
    nrm = jnp.linalg.norm(r, axis=-1)
    w = jnp.minimum(1.0, huber / jnp.maximum(nrm, 1e-12))
    sw = jnp.sqrt(w) * prob.edge_valid.astype(r.dtype)
    return r * sw[:, None], Ji * sw[:, None, None], Jj * sw[:, None, None]


def _robust_cost(poses, prob: PoseGraphProblem, huber: float):
    def one(i, j, meas):
        return _edge_residual(poses[i], poses[j], meas)

    r = jax.vmap(one)(prob.edge_i, prob.edge_j, prob.edge_meas)
    s = jnp.sum(r * r, axis=-1)
    nrm = jnp.sqrt(jnp.maximum(s, 0.0))
    rho = jnp.where(nrm <= huber, s, 2.0 * huber * nrm - huber * huber)
    return jnp.sum(jnp.where(prob.edge_valid, rho, 0.0))


@functools.partial(jax.jit, static_argnames=("max_iters",))
def solve_pose_graph(prob: PoseGraphProblem, huber: float = 1.0,
                     max_iters: int = 20, lam0: float = 1e-6):
    """Returns (poses [K, 7], stats)."""
    K = prob.poses.shape[0]
    dtype = prob.poses.dtype

    def build_system(poses):
        r, Ji, Jj = _edge_blocks(poses, prob, huber)
        Hii = jnp.einsum("eri,erj->eij", Ji, Ji)
        Hjj = jnp.einsum("eri,erj->eij", Jj, Jj)
        Hij = jnp.einsum("eri,erj->eij", Ji, Jj)
        gi = jnp.einsum("eri,er->ei", Ji, r)
        gj = jnp.einsum("eri,er->ei", Jj, r)

        pair_ii = prob.edge_i * K + prob.edge_i
        pair_jj = prob.edge_j * K + prob.edge_j
        pair_ij = prob.edge_i * K + prob.edge_j
        pair_ji = prob.edge_j * K + prob.edge_i
        blocks = jnp.concatenate([Hii, Hjj, Hij,
                                  jnp.swapaxes(Hij, -1, -2)])
        pairs = jnp.concatenate([pair_ii, pair_jj, pair_ij, pair_ji])
        H = jax.ops.segment_sum(blocks, pairs, num_segments=K * K)
        H = H.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        g = (jax.ops.segment_sum(gi, prob.edge_i, num_segments=K)
             + jax.ops.segment_sum(gj, prob.edge_j, num_segments=K))
        return H, g.reshape(6 * K)

    free = jnp.repeat(~prob.fixed, 6)
    ftol = 1e-8
    gtol = 1e-4  # pose-graph residuals are rad/m scale (not pixels)

    def cond(carry):
        return (carry[-2] < max_iters) & ~carry[-1]

    def step(carry):
        poses, lam, nu, cost, it, done = carry
        H, g = build_system(poses)
        g_inf = jnp.max(jnp.abs(jnp.where(free, g, 0.0)))
        done_grad = g_inf <= gtol * (1.0 + cost)
        H = H + lam * jnp.eye(6 * K, dtype=dtype)
        H = jnp.where(free[:, None] & free[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(free, 0.0, 1.0))
        rhs = jnp.where(free, -g, 0.0)
        delta_f = jnp.nan_to_num(jnp.linalg.solve(H, rhs))
        delta = delta_f.reshape(K, 6)
        new_poses = jax.vmap(lie.se3_retract)(poses, delta)
        new_poses = jnp.where(prob.fixed[:, None], poses, new_poses)
        new_cost = _robust_cost(new_poses, prob, huber)
        # gain-ratio damping control (see solvers/ba.py _lm_gain_update)
        from .ba import _lm_gain_update

        pred = 0.5 * (lam * jnp.sum(delta_f * delta_f)
                      - jnp.sum(jnp.where(free, g, 0.0) * delta_f))
        step_inf = jnp.max(jnp.abs(delta_f))
        accept, converged, lam, nu = _lm_gain_update(
            cost, new_cost, lam, nu, pred, step_inf,
            step_cap=50.0, ftol=ftol)
        poses = jnp.where(accept, new_poses, poses)
        cost = jnp.where(accept, new_cost, cost)
        stuck = ~accept & (lam >= 1e8)
        return poses, lam, nu, cost, it + 1, converged | stuck | done_grad

    init_cost = _robust_cost(prob.poses, prob, huber)
    poses, lam, nu, cost, iters, _ = lax.while_loop(
        cond, step, (prob.poses, jnp.asarray(lam0, dtype),
                     jnp.asarray(2.0, dtype), init_cost,
                     jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    return poses, {"initial_cost": init_cost, "final_cost": cost,
                   "iterations": iters}
