"""Blocked Schur bundle adjustment: the MXU-native LM solver.

Same problem as solvers/ba.py (the reference's Ceres SPARSE_SCHUR solves,
/root/reference/include/visnav/map_utils.h:337-421 and
loop_closure_utils.h:672-748) but built for the TPU's memory system instead
of translated from the sparse-CPU playbook:

- Observations stay in the map's NATURAL [L, M] per-landmark tables
  (core/state.py obs_*/all_* — at most M cameras see a landmark, exactly
  one slot per (landmark, camera-row), the reference's map-emplace dedupe).
  The flat obs compaction + segment_sum scatters of the general solver are
  gone entirely.
- Per-camera aggregation (Hcc, b_c, and the camera-point coupling U) is a
  ONE-HOT CONTRACTION on the MXU: E[l, m, k] = 1[obs_cam[l, m] == k] in
  bfloat16, so "scatter blocks by camera id" becomes a matmul. TPUs have
  no fast scatter — the 131k-update scatter-adds behind jax.vjp were
  measured at 630 ms each on the global problem; the equivalent one-hot
  contraction is ~1 ms.
- The coupling block U lives as [K, 6, 3, L] — the LANDMARK axis is the
  (128-wide) lane dimension. The general solver's [K, 6, L, 3] puts 3 in
  the lanes and pays a 42x physical-memory blowup on every op that touches
  it; this layout is the single biggest win.
- The reduced camera system S = Hcc - U Hpp^-1 U^T flattens to one
  [6K, 3L] @ [3L, 6K] MXU matmul; the dense 6K x 6K solve is tiny.
- Pose/point Jacobians are the analytic SE3 chain of solvers/ba.py
  (autodiff only through the camera projection).

LM control (gain ratio, step cap, ftol/gtol termination) is shared with
solvers/ba.py via _lm_gain_update, so the two solvers accept/reject the
same steps on the same problems.

This solver owns GLOBAL BA up to a few hundred keyframe pairs
(pipeline/ba_global.py picks it below BLOCKED_MAX_PAIRS and falls back to
matrix-free LM-CG above). The windowed BA keeps the flat solver: at
K<=24 cameras the padded [Lw, M] table carries more dead slots than the
compacted flat obs array and the segment_sum scatters are small, so flat
measured faster there.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import cameras as cam_models
from ..geometry import lie
from .ba import (RESIDUAL_CLIP, _cam_inverse, _inv3x3_auto, _lm_gain_update,
                 _sanitize)


class BlockProblem(NamedTuple):
    """BA problem over per-landmark observation tables. K camera rows,
    L landmarks, M observation slots per landmark."""

    poses: jnp.ndarray        # [K, 7] T_w_c
    pose_fixed: jnp.ndarray   # [K] bool (gauge / inactive)
    intr: jnp.ndarray         # [K, 8]
    points: jnp.ndarray       # [L, 3]
    point_valid: jnp.ndarray  # [L] bool
    obs_cam: jnp.ndarray      # [L, M] int32 camera row, any value if invalid
    obs_uv: jnp.ndarray       # [L, M, 2]
    obs_valid: jnp.ndarray    # [L, M] bool


def _residuals_blocked(cam_name, prob: BlockProblem, poses, points):
    """r [L, M, 2] at (poses, points); invalid slots give garbage the
    caller masks."""
    L, M = prob.obs_cam.shape
    R_cw, t_cw = _cam_inverse(poses)
    cam = jnp.clip(prob.obs_cam, 0, poses.shape[0] - 1)
    Rg = R_cw[cam]                                     # [L, M, 3, 3]
    p_c = (jnp.einsum("lmij,lj->lmi", Rg, points) + t_cw[cam])
    intr = prob.intr[cam]

    def proj1(intr_i, pc_i):
        return cam_models.project(cam_name, intr_i, pc_i)

    pred = jax.vmap(jax.vmap(proj1))(intr, p_c)
    return jnp.clip(prob.obs_uv - pred, -RESIDUAL_CLIP, RESIDUAL_CLIP)


def _robust_cost_blocked(r, valid, huber):
    s = jnp.sum(r * r, axis=-1)
    nrm = jnp.sqrt(jnp.maximum(s, 0.0))
    rho = jnp.where(nrm <= huber, s, 2.0 * huber * nrm - huber * huber)
    return jnp.sum(jnp.where(valid, rho, 0.0))


@functools.partial(jax.jit, static_argnames=("cam_name", "max_iters"))
def solve_ba_blocked(
    prob: BlockProblem,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 20,
    lam0: float = 1e-4,
    step_cap: float = 10.0,
):
    """LM bundle adjustment, blocked Schur elimination. Returns
    (poses [K,7], points [L,3], stats)."""
    K = prob.poses.shape[0]
    L, M = prob.obs_cam.shape
    dtype = prob.poses.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    ftol = 1e-6
    gtol = 0.05
    cam = jnp.clip(prob.obs_cam, 0, K - 1)
    # one-hot placement [L, M, K]: bf16 rides the MXU; exactness is moot
    # (values are 0/1 and the contracted blocks are f32-accumulated)
    E = (cam[..., None] == jnp.arange(K, dtype=jnp.int32)).astype(
        jnp.bfloat16)
    E = E * prob.obs_valid[..., None].astype(jnp.bfloat16)
    valid_f = prob.obs_valid.astype(dtype)
    free_c = (~prob.pose_fixed)[:, None].astype(dtype)
    free_p = prob.point_valid[:, None].astype(dtype)

    def cost_of(poses, points):
        r = _residuals_blocked(cam_name, prob, poses, points)
        return _robust_cost_blocked(r, prob.obs_valid, huber)

    def body(carry):
        poses, points, lam, nu, cost, it, done = carry
        # ---- residuals + analytic Jacobians (see solvers/ba.py) ----
        R_cw, t_cw = _cam_inverse(poses)
        Rg = R_cw[cam]
        p_c = jnp.einsum("lmij,lj->lmi", Rg, points) + t_cw[cam]
        intr = prob.intr[cam]

        def proj1(intr_i, pc_i):
            return cam_models.project(cam_name, intr_i, pc_i)

        pred = jax.vmap(jax.vmap(proj1))(intr, p_c)
        Jproj = jax.vmap(jax.vmap(jax.jacfwd(proj1, argnums=1)))(intr, p_c)
        raw = prob.obs_uv - pred
        r = jnp.clip(raw, -RESIDUAL_CLIP, RESIDUAL_CLIP)
        inside = (jnp.abs(raw) < RESIDUAL_CLIP).astype(dtype)[..., None]
        Jproj = _sanitize(Jproj) * inside
        r = _sanitize(r)
        # robust IRLS sqrt-weights, folded into r and Jproj (Jc/Jp inherit)
        nrm = jnp.linalg.norm(r, axis=-1)
        sw = jnp.sqrt(jnp.minimum(1.0, huber / jnp.maximum(nrm, 1e-12)))
        sw = (sw * valid_f)[..., None]
        r = r * sw
        Jproj = Jproj * sw[..., None]
        Jc = jnp.concatenate(
            [Jproj, -jnp.einsum("lmij,lmjk->lmik", Jproj, lie.hat(p_c))],
            axis=-1)                                    # [L, M, 2, 6]
        Jp = -jnp.einsum("lmij,lmjk->lmik", Jproj, Rg)  # [L, M, 2, 3]

        # ---- normal-equation blocks: one-hot contractions, no scatters --
        Hcc_o = jnp.einsum("lmia,lmib->lmab", Jc, Jc).reshape(L, M, 36)
        bc_o = jnp.einsum("lmia,lmi->lma", Jc, r)       # [L, M, 6]
        pack = jnp.concatenate([Hcc_o, bc_o], axis=-1)  # [L, M, 42]
        cam_pack = jnp.einsum("lmk,lmz->kz", E, pack.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        Hcc = cam_pack[:, :36].reshape(K, 6, 6).astype(dtype)
        bc = cam_pack[:, 36:].astype(dtype)
        Hpp = jnp.einsum("lmia,lmib->lab", Jp, Jp)      # [L, 3, 3]
        bp = jnp.einsum("lmia,lmi->la", Jp, r)          # [L, 3]
        # U in lane-friendly [K, 6, 3, L]: placement contraction over M
        U = jnp.einsum("lmk,lmab->kabl",
                       E, jnp.einsum("lmia,lmib->lmab", Jc, Jp),
                       preferred_element_type=jnp.float32).astype(dtype)

        # ---- gradient termination (matches solvers/ba.py) ----
        g_inf = jnp.maximum(jnp.max(jnp.abs(bc) * free_c),
                            jnp.max(jnp.abs(bp) * free_p))
        done_grad = g_inf <= gtol * (1.0 + cost)

        # ---- Schur elimination ----
        Hpp_d = Hpp + (lam + 1e-8) * eye3
        Hpp_d = jnp.where(prob.point_valid[:, None, None], Hpp_d, eye3)
        Hpp_inv = _inv3x3_auto(Hpp_d)
        Hpp_inv = jnp.where(prob.point_valid[:, None, None], Hpp_inv, 0.0)
        T1 = jnp.einsum("kabl,lbc->kacl", U, Hpp_inv)   # [K, 6, 3, L]
        S = -(T1.reshape(6 * K, 3 * L) @ U.reshape(6 * K, 3 * L).T
              ).reshape(K, 6, K, 6)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc + lam * eye6)
        S = S.reshape(6 * K, 6 * K)
        rhs = -(bc - jnp.einsum("kabl,lb->ka", T1, bp)).reshape(6 * K)

        free = jnp.repeat(~prob.pose_fixed, 6)
        S = jnp.where(free[:, None] & free[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(free, 0.0, 1.0))
        rhs = jnp.where(free, rhs, 0.0)
        dc = jnp.nan_to_num(jnp.linalg.solve(S, rhs)).reshape(K, 6)
        rhs_p = -bp - jnp.einsum("kabl,ka->lb", U, dc)
        dp = jnp.einsum("lab,lb->la", Hpp_inv, rhs_p)
        dp = jnp.where(prob.point_valid[:, None], dp, 0.0)

        # ---- gain-ratio LM accept/reject (shared control law) ----
        new_poses = jax.vmap(lie.se3_retract)(poses, dc)
        new_poses = jnp.where(prob.pose_fixed[:, None], poses, new_poses)
        new_points = points + dp
        new_cost = cost_of(new_poses, new_points)
        dcf = dc * free_c
        dpf = dp * free_p
        d_sq = jnp.sum(dcf * dcf) + jnp.sum(dpf * dpf)
        b_dot = jnp.sum(bc * dcf) + jnp.sum(bp * dpf)
        pred_red = 0.5 * (lam * d_sq - b_dot)
        step_inf = jnp.max(jnp.abs(dcf))
        accept, converged, lam, nu = _lm_gain_update(
            cost, new_cost, lam, nu, pred_red, step_inf, step_cap, ftol)
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        cost = jnp.where(accept, new_cost, cost)
        stuck = ~accept & (lam >= 1e8)
        return (poses, points, lam, nu, cost, it + 1,
                converged | stuck | done_grad)

    def cond(carry):
        it, done = carry[-2], carry[-1]
        return (it < max_iters) & ~done

    init_cost = cost_of(prob.poses, prob.points)
    poses, points, lam, nu, cost, iters, _ = lax.while_loop(
        cond, body,
        (prob.poses, prob.points, jnp.asarray(lam0, dtype),
         jnp.asarray(2.0, dtype), init_cost, jnp.asarray(0, jnp.int32),
         jnp.asarray(False)))
    stats = {"initial_cost": init_cost, "final_cost": cost, "lambda": lam,
             "iterations": iters}
    return poses, points, stats
