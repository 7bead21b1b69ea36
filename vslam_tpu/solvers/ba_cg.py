"""Matrix-free LM-CG bundle adjustment for large / sharded problems.

The reference's global BA hands Ceres every camera + every lifetime
observation (loop_closure_utils.h:672-748). At thousands of keyframes an
explicit reduced camera system stops fitting; this solver never forms the
Hessian: each LM iteration runs conjugate gradients on
``H v = J^T (J v) + lambda v`` where ``J v`` / ``J^T u`` are jvp/vjp calls
through the residual function. Everything is pure map/reduce over the
observation axis, so sharding the observation and landmark arrays across a
device mesh (parallel/sharded_ba.py) turns the reductions into psums that
XLA inserts automatically.

Gauge fixing masks the fixed cameras' tangent deltas inside the operator.
Huber IRLS weights are frozen per outer iteration, matching the solve in
solvers/ba.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import lie
from .ba import (BAProblem, _huber_weights, _project_obs, _robust_cost,
                 _sanitize)


def _residual_fn(cam_name, prob: BAProblem):
    def residuals(dc, dp):
        poses = jax.vmap(lie.se3_retract)(prob.poses, dc)
        points = prob.points + dp

        def one(cam_i, pt_i, uv):
            return _project_obs(cam_name, prob.intr[cam_i], poses[cam_i],
                                points[pt_i], uv)

        return jax.vmap(one)(prob.obs_cam, prob.obs_point, prob.obs_uv)

    return residuals


def _pow2(n: int, lo: int = 16) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _seg_sum_planned(ids, valid, n_seg: int, cap: int):
    """Scatter-free segment sum over the observation axis.

    XLA lowers a large scatter-add on TPU to a SEQUENTIAL device while
    loop — profiled at ~2.8 s per J^T u pass at 262k observations (the
    same pathology solvers/ba_blocked.py works around for the direct
    solver). Plan: sort the ids once (loop-invariant, hoisted out of the
    LM while_loop), then each segment GATHERS its ≤cap contiguous rows
    from the sorted order and sums — pure gathers + reductions, no
    scatter. Invalid rows route to a sentinel segment that is never
    read. If any segment exceeds the static ``cap`` (shape-derived, 4x
    the mean plus headroom — a BA camera sees at most its feature budget)
    a lax.cond falls back to the exact scatter path, so results are
    always correct, just slow in the pathological case.
    """
    O = ids.shape[0]
    ids_eff = jnp.where(valid, ids, n_seg)
    order = jnp.argsort(ids_eff)
    sorted_ids = ids_eff[order]
    seg = jnp.arange(n_seg)
    starts = jnp.searchsorted(sorted_ids, seg)
    ends = jnp.searchsorted(sorted_ids, seg, side="right")
    overflow = jnp.max(ends - starts) > cap
    idx = starts[:, None] + jnp.arange(cap)[None, :]
    take = order[jnp.clip(idx, 0, O - 1)]
    tvalid = idx < ends[:, None]

    def seg_sum(rows):  # [O, D] -> [n_seg, D]
        def gather_path(r):
            g = r[take]                          # [n_seg, cap, D]
            return jnp.sum(jnp.where(tvalid[..., None], g, 0), axis=1)

        def scatter_path(r):
            z = jnp.zeros((n_seg + 1, r.shape[1]), r.dtype)
            return z.at[ids_eff].add(r)[:n_seg]

        return lax.cond(overflow, scatter_path, gather_path, rows)

    return seg_sum


def _make_lm_step(prob: BAProblem, cam_name: str, huber, cg_iters: int):
    """One gain-ratio LM iteration (CG inner solve) as a carry->carry fn.

    Shared by the monolithic while_loop solver and the host-chained
    stepped solver; carry = (poses, points, lam, nu, cost, it, done).
    """
    K = prob.poses.shape[0]
    L = prob.points.shape[0]
    O = prob.obs_cam.shape[0]
    dtype = prob.poses.dtype

    free_c = (~prob.pose_fixed)[:, None].astype(dtype)       # [K, 1]
    free_p = prob.point_valid[:, None].astype(dtype)         # [L, 1]

    def mask(dc, dp):
        return dc * free_c, dp * free_p

    # loop-invariant segment-sum plans (sorted once, reused every LM/CG
    # iteration); caps are shape-derived statics with a correct fallback
    cam_cap = min(_pow2(max(8, 4 * O // max(K, 1))), _pow2(O))
    pt_cap = min(_pow2(max(8, 4 * O // max(L, 1))), _pow2(O))
    cam_sum = _seg_sum_planned(prob.obs_cam, prob.obs_valid, K, cam_cap)
    pt_sum = _seg_sum_planned(prob.obs_point, prob.obs_valid, L, pt_cap)

    zero = (jnp.zeros((K, 6), dtype), jnp.zeros((L, 3), dtype))
    zero6 = jnp.zeros((6,), dtype)
    zero3 = jnp.zeros((3,), dtype)
    ftol = 1e-6
    gtol = 0.05  # relative gradient tolerance (same scale as solvers/ba.py)
    step_cap = 10.0

    def step(carry):
        poses, points, lam, nu, cost, it, done = carry
        p0 = BAProblem(poses=poses, points=points, **{
            f: getattr(prob, f) for f in prob._fields
            if f not in ("poses", "points")})
        res_fn = _residual_fn(cam_name, p0)
        r0 = res_fn(*zero)
        sw = (_huber_weights(r0, huber)
              * p0.obs_valid.astype(dtype))[:, None]          # [O, 1]

        def wres(dc, dp):
            return _sanitize(res_fn(dc, dp)) * sw

        r0w = wres(*zero)

        def Jv(v):
            return jax.jvp(lambda d: wres(*mask(*d)), (zero,), (v,))[1]

        def JTu(u):
            """J^T u via per-observation adjoints + planned segment sums.

            jax.vjp of the BATCHED residual would differentiate the
            poses[cam_i]/points[pt_i] gathers into scatter-adds (the
            sequential-loop pathology above); per-observation vjps have
            no cross-observation ops, and the reduction to camera/point
            blocks is the scatter-free plan."""
            def one(cam_i, pt_i, uv, w, u_o):
                def f(dc6, dp3):
                    pose = lie.se3_retract(poses[cam_i], dc6)
                    r = _project_obs(cam_name, prob.intr[cam_i], pose,
                                     points[pt_i] + dp3, uv)
                    return _sanitize(r) * w
                _, vjp1 = jax.vjp(f, zero6, zero3)
                return vjp1(u_o)

            gc_rows, gp_rows = jax.vmap(one)(
                prob.obs_cam, prob.obs_point, prob.obs_uv, sw[:, 0], u)
            return cam_sum(gc_rows) * free_c, pt_sum(gp_rows) * free_p

        def Hv(v):
            hc, hp = JTu(Jv(v))
            return (hc + lam * v[0] * free_c, hp + lam * v[1] * free_p)

        g = JTu(r0w)
        b = (-g[0] * free_c, -g[1] * free_p)
        g_inf = jnp.maximum(jnp.max(jnp.abs(b[0])), jnp.max(jnp.abs(b[1])))
        done_grad = g_inf <= gtol * (1.0 + cost)

        def dot(a, bb):
            return jnp.vdot(a[0], bb[0]) + jnp.vdot(a[1], bb[1])

        # plain CG from zero
        def cg_body(carry, _):
            x, r, p, rs = carry
            Ap = Hv(p)
            alpha = rs / jnp.maximum(dot(p, Ap), 1e-30)
            x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
            r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
            rs_new = dot(r, r)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            p = (r[0] + beta * p[0], r[1] + beta * p[1])
            return (x, r, p, rs_new), None

        (x, _, _, _), _ = lax.scan(
            cg_body, (zero, b, b, dot(b, b)), None, length=cg_iters)
        dc, dp = mask(*x)

        new_poses = jax.vmap(lie.se3_retract)(poses, dc)
        new_poses = jnp.where(prob.pose_fixed[:, None], poses, new_poses)
        new_points = points + dp
        new_cost = _robust_cost(
            _residual_fn(cam_name, p0._replace(poses=new_poses,
                                               points=new_points))(*zero),
            prob.obs_valid, huber)
        # gain-ratio LM control (see solvers/ba.py _lm_gain_update: the
        # naive accept rule let Huber-saturated steps exile weak cameras)
        from .ba import _lm_gain_update

        d_sq = dot((dc, dp), (dc, dp))
        b_dot = dot(g, (dc, dp))
        pred = 0.5 * (lam * d_sq - b_dot)
        step_inf = jnp.max(jnp.abs(dc))
        accept, converged, lam, nu = _lm_gain_update(
            cost, new_cost, lam, nu, pred, step_inf, step_cap, ftol)
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        cost = jnp.where(accept, new_cost, cost)
        stuck = ~accept & (lam >= 1e8)
        return (poses, points, lam, nu, cost, it + 1,
                converged | stuck | done_grad)

    return step


@functools.partial(jax.jit, static_argnames=("cam_name",))
def _init_carry(prob: BAProblem, cam_name: str, huber, lam0):
    dtype = prob.poses.dtype
    K = prob.poses.shape[0]
    L = prob.points.shape[0]
    zero = (jnp.zeros((K, 6), dtype), jnp.zeros((L, 3), dtype))
    init_cost = _robust_cost(_residual_fn(cam_name, prob)(*zero),
                             prob.obs_valid, huber)
    return (prob.poses, prob.points, jnp.asarray(lam0, dtype),
            jnp.asarray(2.0, dtype), init_cost,
            jnp.asarray(0, jnp.int32), jnp.asarray(False))


@functools.partial(jax.jit,
                   static_argnames=("cam_name", "max_iters", "cg_iters"))
def solve_ba_cg(
    prob: BAProblem,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 15,
    cg_iters: int = 25,
    lam0: float = 1e-3,
):
    """LM with inner CG, one fused device program. Returns
    (poses, points, stats)."""
    step = _make_lm_step(prob, cam_name, huber, cg_iters)

    def cond(carry):
        it, done = carry[-2], carry[-1]
        return (it < max_iters) & ~done

    carry0 = _init_carry(prob, cam_name, huber, lam0)
    poses, points, lam, nu, cost, iters, _ = lax.while_loop(
        cond, step, carry0)
    return poses, points, {"initial_cost": carry0[4], "final_cost": cost,
                           "iterations": iters}


@functools.partial(jax.jit, static_argnames=("cam_name", "cg_iters"))
def _lm_iter_program(carry, prob: BAProblem, cam_name, huber,
                     cg_iters: int):
    """One LM iteration as its own device program; converged carries pass
    through a near-free cond branch."""
    step = _make_lm_step(prob, cam_name, huber, cg_iters)
    return lax.cond(carry[-1], lambda c: c, step, carry)


def solve_ba_cg_stepped(
    prob: BAProblem,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 15,
    cg_iters: int = 25,
    lam0: float = 1e-3,
):
    """Same LM-CG math as solve_ba_cg, but each LM iteration is a
    SEPARATE device program chained asynchronously from the host.

    Why this exists: a monolithic 15x25 LM-CG over a global-BA-sized
    problem is a single tens-of-seconds device program, and the tunneled TPU
    runtime was observed to hard-fault executions that long when the
    early-termination path doesn't trigger (data-dependent). Chaining one
    bounded program per iteration keeps every execution a few seconds,
    costs no host syncs (the loop only enqueues), and converged
    iterations reduce to a cheap cond pass-through — so results are
    IDENTICAL to the monolithic solver.
    """
    carry = _init_carry(prob, cam_name, huber, lam0)
    init_cost = carry[4]
    for _ in range(max_iters):
        carry = _lm_iter_program(carry, prob, cam_name, huber,
                                 cg_iters=cg_iters)
    poses, points, _lam, _nu, cost, iters, _done = carry
    return poses, points, {"initial_cost": init_cost, "final_cost": cost,
                           "iterations": iters}
