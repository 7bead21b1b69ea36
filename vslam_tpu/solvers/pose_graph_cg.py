"""Matrix-free LM-CG pose graph optimization for large graphs.

The dense assembly in solvers/pose_graph.py builds a (6K, 6K) system —
fine to ~1k keyframes, O(K^2) memory beyond. This variant never forms the
Hessian: CG runs on H v = J^T (J v) + lam v with jvp/vjp products through
the edge residuals (same pattern as solvers/ba_cg.py), so memory is O(K+E)
and the edge axis shards over a mesh like the BA observations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import lie
from .pose_graph import PoseGraphProblem, _edge_residual, _robust_cost


@functools.partial(jax.jit, static_argnames=("max_iters", "cg_iters"))
def solve_pose_graph_cg(prob: PoseGraphProblem, huber: float = 1.0,
                        max_iters: int = 20, cg_iters: int = 30,
                        lam0: float = 1e-6):
    """Returns (poses [K, 7], stats). Same semantics as solve_pose_graph."""
    K = prob.poses.shape[0]
    dtype = prob.poses.dtype
    free = (~prob.fixed)[:, None].astype(dtype)

    def step(carry, _):
        poses, lam, nu, cost = carry

        def edge_r(i, j, meas):
            return _edge_residual(poses[i], poses[j], meas)

        r0 = jax.vmap(edge_r)(prob.edge_i, prob.edge_j, prob.edge_meas)
        nrm = jnp.linalg.norm(r0, axis=-1)
        w = jnp.minimum(1.0, huber / jnp.maximum(nrm, 1e-12))
        sw = (jnp.sqrt(w) * prob.edge_valid.astype(dtype))[:, None]

        def wres(delta):
            d = delta * free
            new_poses = jax.vmap(lie.se3_retract)(poses, d)

            def one(i, j, meas):
                return _edge_residual(new_poses[i], new_poses[j], meas)

            r = jax.vmap(one)(prob.edge_i, prob.edge_j, prob.edge_meas)
            return jnp.nan_to_num(r, nan=0.0, posinf=0.0, neginf=0.0) * sw

        zero = jnp.zeros((K, 6), dtype)
        r0w = wres(zero)
        _, vjp = jax.vjp(wres, zero)

        def Hv(v):
            Jv = jax.jvp(wres, (zero,), (v,))[1]
            return vjp(Jv)[0] + lam * v * free

        g = vjp(r0w)[0]
        b = -g * free

        def cg_body(carry2, _):
            x, r, p, rs = carry2
            Ap = Hv(p)
            alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            return (x, r, r + beta * p, rs_new), None

        (delta, _, _, _), _ = lax.scan(
            cg_body, (zero, b, b, jnp.vdot(b, b)), None, length=cg_iters)
        delta = delta * free

        new_poses = jax.vmap(lie.se3_retract)(poses, delta)
        new_poses = jnp.where(prob.fixed[:, None], poses, new_poses)
        new_cost = _robust_cost(new_poses, prob, huber)
        # gain-ratio damping control (see solvers/ba.py _lm_gain_update)
        from .ba import _lm_gain_update

        pred = 0.5 * (lam * jnp.vdot(delta, delta) - jnp.vdot(g * free,
                                                              delta))
        accept, _, lam, nu = _lm_gain_update(
            cost, new_cost, lam, nu, pred, jnp.max(jnp.abs(delta)),
            step_cap=50.0, ftol=1e-8)
        poses = jnp.where(accept, new_poses, poses)
        cost = jnp.where(accept, new_cost, cost)
        return (poses, lam, nu, cost), new_cost

    init_cost = _robust_cost(prob.poses, prob, huber)
    (poses, lam, nu, cost), hist = lax.scan(
        step, (prob.poses, jnp.asarray(lam0, dtype),
               jnp.asarray(2.0, dtype), init_cost), None,
        length=max_iters)
    return poses, {"initial_cost": init_cost, "final_cost": cost,
                   "history": hist}
