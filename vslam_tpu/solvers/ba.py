"""Bundle adjustment: Levenberg-Marquardt with an explicit Schur complement.

TPU-native replacement for the reference's Ceres SPARSE_SCHUR solves
(/root/reference/include/visnav/map_utils.h:337-421 ``bundle_adjustment`` and
loop_closure_utils.h:672-748 ``global_bundle_adjustment``): residual
``r = p2d - project(T_w_c^-1 * X)`` per observation
(reprojection.h:87-101), Huber loss (huber_parameter=1.0 px,
map_utils.h:330), SE3 right-multiplicative local parameterization
(local_parameterization_se3.hpp:43-50), gauge fixed by freezing chosen
cameras, 20 LM iterations (map_utils.h:333).

Design (all fixed-shape, one XLA program per problem size):
- observations live in flat padded arrays (obs_cam, obs_point, obs_uv,
  obs_valid); pose/point Jacobians are ANALYTIC through the SE3 chain
  (dp_c/d[ups, omega] = [-I | hat(p_c)] for the right-multiplicative
  retraction, dp_c/dX = R_cw), with autodiff only through the camera
  projection itself (vmapped jacfwd of a R^3 -> R^2 function) — the same
  autodiff role Ceres Jets play in the reference, but the per-observation
  quaternion inverse/retract chain is hoisted to a per-CAMERA precompute
  (K rotation matrices instead of O jacfwd chains).
- robust IRLS weights implement the Huber loss.
- the landmark block of the normal equations is eliminated explicitly:
  H_pp is [L, 3, 3] block-diagonal (batched 3x3 solves), the coupling
  W is densified to U [K, 6, L, 3] (small: the windowed problem has
  K <= ~24 cameras), and the reduced camera system
  S = H_cc - U H_pp^-1 U^T is a dense (6K, 6K) solve. For global BA at
  large K use solve_ba_cg (matrix-free LM-CG, ba_cg.py) instead.
- LM accept/reject with multiplicative damping runs as a lax.scan with the
  full state in carry, so the 20 iterations compile to one program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import cameras as cam_models
from ..geometry import lie


class BAProblem(NamedTuple):
    """Padded dense BA problem. K cameras, L points, O observations."""

    poses: jnp.ndarray        # [K, 7] T_w_c
    pose_fixed: jnp.ndarray   # [K] bool (gauge / inactive)
    intr: jnp.ndarray         # [K, 8] per-camera intrinsics
    points: jnp.ndarray       # [L, 3]
    point_valid: jnp.ndarray  # [L] bool
    obs_cam: jnp.ndarray      # [O] int32 -> K axis
    obs_point: jnp.ndarray    # [O] int32 -> L axis
    obs_uv: jnp.ndarray       # [O, 2]
    obs_valid: jnp.ndarray    # [O] bool


RESIDUAL_CLIP = 1e5  # px; observations behind a camera can otherwise
# produce ~1/z^2 residuals whose f32 square overflows to inf, and
# inf * 0-weight = NaN poisons the normal equations.


def _project_obs(cam_name, intr, T_w_c, X, uv):
    """Single-observation residual r = uv - project(T_w_c^-1 X). [2]."""
    p_c = lie.se3_apply(lie.se3_inv(T_w_c), X)
    pred = cam_models.project(cam_name, intr, p_c)
    return jnp.clip(uv - pred, -RESIDUAL_CLIP, RESIDUAL_CLIP)


def _sanitize(x):
    """Zero out NaN/inf entries (degenerate Jacobians of outliers)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def _cam_inverse(poses):
    """Per-camera world->cam transform: R_cw [K,3,3], t_cw [K,3]."""
    R_wc = lie.quat_to_matrix(poses[..., 3:7])
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -jnp.einsum("...ij,...j->...i", R_cw, poses[..., :3])
    return R_cw, t_cw


def _obs_p_c(prob: BAProblem, poses, points):
    """Camera-frame points p_c [O,3] + gathered R_cw [O,3,3], intr [O,8]."""
    R_cw, t_cw = _cam_inverse(poses)
    Rg = R_cw[prob.obs_cam]
    p_c = (jnp.einsum("oij,oj->oi", Rg, points[prob.obs_point])
           + t_cw[prob.obs_cam])
    return p_c, Rg, prob.intr[prob.obs_cam]


def _residuals(cam_name, prob: BAProblem, poses, points):
    """r = uv - project(p_c) [O,2] with per-camera precomputed inverses."""
    p_c, _, intr = _obs_p_c(prob, poses, points)
    pred = jax.vmap(lambda i, p: cam_models.project(cam_name, i, p))(intr,
                                                                     p_c)
    return jnp.clip(prob.obs_uv - pred, -RESIDUAL_CLIP, RESIDUAL_CLIP)


def _obs_residual_jac(cam_name, prob: BAProblem, poses, points):
    """Residuals [O, 2] and Jacobians wrt camera delta [O, 2, 6] and point
    [O, 2, 3], at the current (poses, points).

    Analytic SE3 chain (golden-tested against the jacfwd-through-retract
    version): with the right-multiplicative retraction T*exp(delta),
    p_c(delta) = exp(-delta) p_c, so dp_c/d[ups, omega] = [-I | hat(p_c)]
    and dp_c/dX = R_cw; only the camera-model projection Jacobian
    dproj/dp_c comes from autodiff. r = uv - proj flips the signs.
    """
    p_c, Rg, intr = _obs_p_c(prob, poses, points)

    def proj1(intr_i, pc_i):
        return cam_models.project(cam_name, intr_i, pc_i)

    pred = jax.vmap(proj1)(intr, p_c)
    Jproj = jax.vmap(jax.jacfwd(proj1, argnums=1))(intr, p_c)  # [O, 2, 3]
    raw = prob.obs_uv - pred
    r = jnp.clip(raw, -RESIDUAL_CLIP, RESIDUAL_CLIP)
    # a clipped residual component has zero derivative (the jacfwd-through-
    # clip semantics this replaces): without this, an outlier's ~1/z^2
    # Jacobian squared can outweigh its tiny Huber weight
    inside = (jnp.abs(raw) < RESIDUAL_CLIP).astype(r.dtype)[..., None]
    Jproj = Jproj * inside
    Jc = jnp.concatenate(
        [Jproj, -jnp.einsum("oij,ojk->oik", Jproj, lie.hat(p_c))], axis=-1)
    Jp = -jnp.einsum("oij,ojk->oik", Jproj, Rg)
    return r, Jc, Jp


def inv3x3(A):
    """Batched closed-form 3x3 inverse (adjugate / det).

    jnp.linalg.inv on a [N, 3, 3] batch lowers to a sequential LU on TPU —
    measured 5.2 ms for N=4096 where this elementwise form is ~0.05 ms.
    Singular inputs give inf/nan exactly like linalg.inv; callers mask.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack([jnp.stack([A11, A12, A13], -1),
                     jnp.stack([A21, A22, A23], -1),
                     jnp.stack([A31, A32, A33], -1)], -2)
    return adj / det[..., None, None]


def chol3x3(A):
    """Batched closed-form lower Cholesky of SPD 3x3 matrices.

    Same motivation as inv3x3 (jnp.linalg.cholesky is a sequential
    factorization, ~3 ms for a [4096, 3, 3] batch). Non-SPD inputs
    produce nan, matching linalg.cholesky; callers guard.
    """
    a11, a21, a31 = A[..., 0, 0], A[..., 1, 0], A[..., 2, 0]
    a22, a32, a33 = A[..., 1, 1], A[..., 2, 1], A[..., 2, 2]
    l11 = jnp.sqrt(a11)
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(a22 - l21 * l21)
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(a33 - l31 * l31 - l32 * l32)
    z = jnp.zeros_like(l11)
    return jnp.stack([jnp.stack([l11, z, z], -1),
                      jnp.stack([l21, l22, z], -1),
                      jnp.stack([l31, l32, l33], -1)], -2)


def _inv3x3_auto(A):
    """inv3x3 on TPU (where batched linalg.inv lowers to a ~100x slower
    sequential LU), jnp.linalg.inv elsewhere (bit-identical to the
    historical CPU arithmetic, which several chaotic-world regression
    tests pin)."""
    if jax.default_backend() == "tpu":
        return inv3x3(A)
    return jnp.linalg.inv(A)


def _huber_weights(r, huber: float):
    """Per-observation IRLS sqrt-weights for blockwise Huber on ||r||.

    Ceres applies rho(s), s = ||r||^2 with rho' = min(1, delta/||r||); IRLS
    scales J and r by sqrt(rho').
    """
    nrm = jnp.linalg.norm(r, axis=-1)
    w = jnp.minimum(1.0, huber / jnp.maximum(nrm, 1e-12))
    return jnp.sqrt(w)


def _robust_cost(r, valid, huber: float):
    """Total Huber cost (matches Ceres' 0.5 * sum rho up to the 0.5)."""
    s = jnp.sum(r * r, axis=-1)
    nrm = jnp.sqrt(jnp.maximum(s, 0.0))
    rho = jnp.where(nrm <= huber, s, 2.0 * huber * nrm - huber * huber)
    return jnp.sum(jnp.where(valid, rho, 0.0))


def _normal_equations(cam_name, prob: BAProblem, poses, points, huber):
    """Build H_cc [K,6,6], H_pp [L,3,3], U [K,6,L,3], b_c [K,6], b_p [L,3]."""
    K = poses.shape[0]
    L = points.shape[0]
    r, Jc, Jp = _obs_residual_jac(cam_name, prob, poses, points)
    r, Jc, Jp = _sanitize(r), _sanitize(Jc), _sanitize(Jp)
    sw = _huber_weights(r, huber) * prob.obs_valid.astype(r.dtype)
    r = r * sw[:, None]
    Jc = Jc * sw[:, None, None]
    Jp = Jp * sw[:, None, None]

    # per-observation blocks
    Hcc_o = jnp.einsum("oia,oib->oab", Jc, Jc)       # [O, 6, 6]
    Hpp_o = jnp.einsum("oia,oib->oab", Jp, Jp)       # [O, 3, 3]
    W_o = jnp.einsum("oia,oib->oab", Jc, Jp)         # [O, 6, 3]
    # gradient g = J^T r ; we solve H delta = -g
    bc_o = jnp.einsum("oia,oi->oa", Jc, r)           # [O, 6]
    bp_o = jnp.einsum("oia,oi->oa", Jp, r)           # [O, 3]

    # one packed segment-sum per target axis (each segment_sum is a
    # scatter pass over O; packing halves the pass count)
    O_ = r.shape[0]
    cam_pack = jax.ops.segment_sum(
        jnp.concatenate([Hcc_o.reshape(O_, 36), bc_o], axis=1),
        prob.obs_cam, num_segments=K)
    Hcc, bc = cam_pack[:, :36].reshape(K, 6, 6), cam_pack[:, 36:]
    pt_pack = jax.ops.segment_sum(
        jnp.concatenate([Hpp_o.reshape(O_, 9), bp_o], axis=1),
        prob.obs_point, num_segments=L)
    Hpp, bp = pt_pack[:, :9].reshape(L, 3, 3), pt_pack[:, 9:]

    # densify W into U [K*L, 6, 3] via segment over (cam, point) pair ids
    pair_id = prob.obs_cam * L + prob.obs_point
    U = jax.ops.segment_sum(W_o, pair_id, num_segments=K * L)
    U = U.reshape(K, L, 6, 3).transpose(0, 2, 1, 3)  # [K, 6, L, 3]
    return Hcc, Hpp, U, bc, bp, r


def _normal_equations_obs(cam_name, prob: BAProblem, poses, points, huber):
    """Like _normal_equations but WITHOUT densifying the camera-point
    coupling: returns the per-observation W_o [O, 6, 3] blocks instead of
    U. The U densification is poison on TPU twice over — the [K*L]
    segment_sum is a large-segment scatter, and the [K, 6, L, 3] layout
    puts 3 in the (128-wide) lane dimension, a 42x physical blowup that
    every downstream op re-reads. _schur_solve_obs consumes W_o directly.
    """
    K = poses.shape[0]
    L = points.shape[0]
    r, Jc, Jp = _obs_residual_jac(cam_name, prob, poses, points)
    r, Jc, Jp = _sanitize(r), _sanitize(Jc), _sanitize(Jp)
    sw = _huber_weights(r, huber) * prob.obs_valid.astype(r.dtype)
    r = r * sw[:, None]
    Jc = Jc * sw[:, None, None]
    Jp = Jp * sw[:, None, None]

    Hcc_o = jnp.einsum("oia,oib->oab", Jc, Jc)       # [O, 6, 6]
    Hpp_o = jnp.einsum("oia,oib->oab", Jp, Jp)       # [O, 3, 3]
    W_o = jnp.einsum("oia,oib->oab", Jc, Jp)         # [O, 6, 3]
    bc_o = jnp.einsum("oia,oi->oa", Jc, r)           # [O, 6]
    bp_o = jnp.einsum("oia,oi->oa", Jp, r)           # [O, 3]

    O_ = r.shape[0]
    cam_pack = jax.ops.segment_sum(
        jnp.concatenate([Hcc_o.reshape(O_, 36), bc_o], axis=1),
        prob.obs_cam, num_segments=K)
    Hcc, bc = cam_pack[:, :36].reshape(K, 6, 6), cam_pack[:, 36:]
    pt_pack = jax.ops.segment_sum(
        jnp.concatenate([Hpp_o.reshape(O_, 9), bp_o], axis=1),
        prob.obs_point, num_segments=L)
    Hpp, bp = pt_pack[:, :9].reshape(L, 3, 3), pt_pack[:, 9:]
    return Hcc, Hpp, W_o, bc, bp


def _split_dot_f32(a, b_onehot):
    """a [O, M] f32 contracted over O with an EXACTLY-bf16-representable
    b [O, N] (here: a one-hot) -> [M, N] f32 on the MXU.

    One bf16 pass truncates a to 8 mantissa bits; splitting a into
    hi + lo bf16 parts recovers ~16 bits (error ~2^-16 relative) at two
    1-pass matmuls — cheaper than Precision.HIGHEST's full cross terms,
    and exact enough for an LM step direction (the accept test evaluates
    the true f32 cost, so step-direction error only costs iterations).
    """
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(a.dtype)).astype(jnp.bfloat16)
    dims = (((0,), (0,)), ((), ()))
    return (jax.lax.dot_general(a_hi, b_onehot, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(a_lo, b_onehot, dims,
                                  preferred_element_type=jnp.float32))


def _schur_solve_obs(Hcc, Hpp, W_o, obs_cam, obs_point, bc, bp,
                     pose_fixed, point_valid, lam):
    """Schur-eliminated solve WITHOUT materializing U.

    With at-most-one observation per (camera, landmark) pair (and exactly
    correct even with duplicates, which simply sum), the reduced camera
    system is

        S = Hcc + lam*I - U C U^T,   C = (Hpp + lam*I)^-1 = G G^T

    and P := U G satisfies  U C U^T = P P^T.  P [K, 6, 3, L] is built as
    ONE one-hot MXU matmul over observations:

        P[(k,a,c), l] = sum_o 1[cam_o = k] * (W_o G_l(o))[a,c] * 1[pt_o = l]

    i.e. (V-by-camera placement, [O, K*18]) contracted with the landmark
    one-hot [O, L]. No [K*L] scatter, no lane-padded [.., L, 3] tensor;
    the landmark axis lands in the lane dimension throughout.
    """
    K = Hcc.shape[0]
    L = Hpp.shape[0]
    O_ = W_o.shape[0]
    dtype = Hcc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    Hpp_d = Hpp + (lam + 1e-8) * eye3
    Hpp_d = jnp.where(point_valid[:, None, None], Hpp_d, eye3)
    C = inv3x3(Hpp_d)
    C = jnp.where(point_valid[:, None, None], C, 0.0)
    # G: Cholesky of C (C is SPD where valid; zero rows elsewhere would NaN
    # the factorization, so factor the guarded eye and mask through W_o=0)
    G = chol3x3(jnp.where(point_valid[:, None, None], C, eye3))

    V = jnp.einsum("oab,obc->oac", W_o, G[obs_point])       # [O, 6, 3]
    ks = jnp.arange(K, dtype=jnp.int32)
    VK = jnp.where((obs_cam[:, None] == ks)[:, :, None, None],
                   V[:, None, :, :], 0.0)                    # [O, K, 6, 3]
    El = (obs_point[:, None]
          == jnp.arange(L, dtype=jnp.int32)).astype(jnp.bfloat16)
    P = _split_dot_f32(VK.reshape(O_, K * 18), El)           # [K*18, L]
    Pm = P.reshape(K * 6, 3 * L)

    S = -jax.lax.dot_general(Pm, Pm, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32
                             ).reshape(K, 6, K, 6).astype(dtype)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc + lam * eye6)
    S = S.reshape(6 * K, 6 * K)

    # rhs = -(bc - U C bp): per-observation, no densified U
    t = jnp.einsum("lab,lb->la", C, bp)                      # [L, 3]
    y = jnp.einsum("oab,ob->oa", W_o, t[obs_point])          # [O, 6]
    u = jax.ops.segment_sum(y, obs_cam, num_segments=K)
    rhs = -(bc - u).reshape(6 * K)

    free = jnp.repeat(~pose_fixed, 6)
    S = jnp.where(free[:, None] & free[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free, 0.0, 1.0))
    rhs = jnp.where(free, rhs, 0.0)
    delta_c = jnp.nan_to_num(jnp.linalg.solve(S, rhs)).reshape(K, 6)

    # back-substitute: delta_p = C (-bp - U^T delta_c), again per-obs
    w = jnp.einsum("oab,oa->ob", W_o, delta_c[obs_cam])      # [O, 3]
    s_l = jax.ops.segment_sum(w, obs_point, num_segments=L)
    delta_p = jnp.einsum("lab,lb->la", C, -bp - s_l)
    delta_p = jnp.where(point_valid[:, None], delta_p, 0.0)
    return delta_c, delta_p


def _obs_residual_jac_intr(cam_name, prob: BAProblem, poses, points, intr2):
    """Like _obs_residual_jac but with intrinsics as variables.

    intr2 [2, 8] holds the physical left/right intrinsics; camera row k uses
    block k % 2 (build_window_problem interleaves left/right rows). Returns
    (r [O,2], Jc [O,2,6], Jp [O,2,3], Ji [O,2,8]). Same analytic SE3 chain
    as _obs_residual_jac; the intrinsics Jacobian is autodiff through the
    projection alongside dproj/dp_c.
    """
    R_cw, t_cw = _cam_inverse(poses)
    Rg = R_cw[prob.obs_cam]
    p_c = (jnp.einsum("oij,oj->oi", Rg, points[prob.obs_point])
           + t_cw[prob.obs_cam])
    intr = intr2[prob.obs_cam % 2]

    def proj1(intr_i, pc_i):
        return cam_models.project(cam_name, intr_i, pc_i)

    pred = jax.vmap(proj1)(intr, p_c)
    Ji_p, Jproj = jax.vmap(jax.jacfwd(proj1, argnums=(0, 1)))(intr, p_c)
    raw = prob.obs_uv - pred
    r = jnp.clip(raw, -RESIDUAL_CLIP, RESIDUAL_CLIP)
    inside = (jnp.abs(raw) < RESIDUAL_CLIP).astype(r.dtype)[..., None]
    Jproj = Jproj * inside
    Jc = jnp.concatenate(
        [Jproj, -jnp.einsum("oij,ojk->oik", Jproj, lie.hat(p_c))], axis=-1)
    Jp = -jnp.einsum("oij,ojk->oik", Jproj, Rg)
    Ji = -Ji_p * inside
    return r, Jc, Jp, Ji


def _normal_equations_intr(cam_name, prob: BAProblem, poses, points, intr2,
                           huber):
    """Normal equations with two shared intrinsics blocks (8 params each).

    Returns the _normal_equations outputs plus
    (Hii [2,8,8], bi [2,8], Hci [K,6,8], Upi [L,2,3,8]).
    """
    K = poses.shape[0]
    L = points.shape[0]
    r, Jc, Jp, Ji = _obs_residual_jac_intr(cam_name, prob, poses, points,
                                           intr2)
    r, Jc, Jp, Ji = _sanitize(r), _sanitize(Jc), _sanitize(Jp), _sanitize(Ji)
    sw = _huber_weights(r, huber) * prob.obs_valid.astype(r.dtype)
    r = r * sw[:, None]
    Jc = Jc * sw[:, None, None]
    Jp = Jp * sw[:, None, None]
    Ji = Ji * sw[:, None, None]

    Hcc_o = jnp.einsum("oia,oib->oab", Jc, Jc)
    Hpp_o = jnp.einsum("oia,oib->oab", Jp, Jp)
    W_o = jnp.einsum("oia,oib->oab", Jc, Jp)
    bc_o = jnp.einsum("oia,oi->oa", Jc, r)
    bp_o = jnp.einsum("oia,oi->oa", Jp, r)

    O_ = r.shape[0]
    cam_pack = jax.ops.segment_sum(
        jnp.concatenate([Hcc_o.reshape(O_, 36), bc_o], axis=1),
        prob.obs_cam, num_segments=K)
    Hcc, bc = cam_pack[:, :36].reshape(K, 6, 6), cam_pack[:, 36:]
    pt_pack = jax.ops.segment_sum(
        jnp.concatenate([Hpp_o.reshape(O_, 9), bp_o], axis=1),
        prob.obs_point, num_segments=L)
    Hpp, bp = pt_pack[:, :9].reshape(L, 3, 3), pt_pack[:, 9:]
    pair_id = prob.obs_cam * L + prob.obs_point
    U = jax.ops.segment_sum(W_o, pair_id, num_segments=K * L)
    U = U.reshape(K, L, 6, 3).transpose(0, 2, 1, 3)

    iid = prob.obs_cam % 2
    Hii = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Ji, Ji), iid, num_segments=2)
    bi = jax.ops.segment_sum(
        jnp.einsum("oia,oi->oa", Ji, r), iid, num_segments=2)
    # camera row k couples only with intrinsics block k % 2
    Hci = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Jc, Ji), prob.obs_cam, num_segments=K)
    Upi = jax.ops.segment_sum(
        jnp.einsum("oia,oib->oab", Jp, Ji), prob.obs_point * 2 + iid,
        num_segments=2 * L).reshape(L, 2, 3, 8)
    return Hcc, Hpp, U, bc, bp, r, Hii, bi, Hci, Upi


def _schur_solve_intr(Hcc, Hpp, U, bc, bp, Hii, bi, Hci, Upi,
                      pose_fixed, point_valid, lam):
    """Point-eliminated solve of the camera+intrinsics reduced system."""
    K = Hcc.shape[0]
    L = Hpp.shape[0]
    dtype = Hcc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    Hpp_d = Hpp + (lam + 1e-8) * eye3
    Hpp_d = jnp.where(point_valid[:, None, None], Hpp_d, eye3)
    Hpp_inv = _inv3x3_auto(Hpp_d)
    Hpp_inv = jnp.where(point_valid[:, None, None], Hpp_inv, 0.0)

    T1 = jnp.einsum("kalb,lbc->kalc", U, Hpp_inv)           # [K,6,L,3]
    S_off = (T1.reshape(6 * K, 3 * L)
             @ U.reshape(6 * K, 3 * L).T).reshape(K, 6, K, 6)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc + lam * eye6)

    # camera-intrinsics coupling: direct term on block k%2, point-mediated
    # term on both blocks
    S_ci = -jnp.einsum("kalb,lmbe->kame", T1, Upi)          # [K,6,2,8]
    k_iid = jnp.arange(K) % 2
    S_ci = S_ci.at[jnp.arange(K), :, k_iid, :].add(Hci)

    # intrinsics-intrinsics reduced block
    Y = jnp.einsum("lbc,lnce->lbne", Hpp_inv, Upi)          # [L,3,2,8]
    S_ii = -jnp.einsum("lmbe,lbnf->menf", Upi, Y)           # [2,8,2,8]
    S_ii = S_ii.at[jnp.arange(2), :, jnp.arange(2), :].add(
        Hii + lam * jnp.eye(8, dtype=dtype))

    y = jnp.einsum("lbc,lc->lb", Hpp_inv, bp)               # [L,3]
    rhs_c = -(bc - jnp.einsum("kalb,lb->ka", T1, bp))       # [K,6]
    rhs_i = -(bi - jnp.einsum("lmbe,lb->me", Upi, y))       # [2,8]

    # gauge fixing on camera rows, then assemble the dense system
    free = jnp.repeat(~pose_fixed, 6)
    Sf = S.reshape(6 * K, 6 * K)
    Sf = jnp.where(free[:, None] & free[None, :], Sf, 0.0)
    Sf = Sf + jnp.diag(jnp.where(free, 0.0, 1.0))
    Cf = S_ci.reshape(6 * K, 16) * free[:, None]
    A = jnp.block([[Sf, Cf], [Cf.T, S_ii.reshape(16, 16)]])
    rhs = jnp.concatenate([rhs_c.reshape(-1) * free, rhs_i.reshape(-1)])

    delta = jnp.nan_to_num(jnp.linalg.solve(A, rhs))
    delta_c = delta[:6 * K].reshape(K, 6)
    delta_i = delta[6 * K:].reshape(2, 8)

    rhs_p = (-bp - jnp.einsum("kalb,ka->lb", U, delta_c)
             - jnp.einsum("lmbe,me->lb", Upi, delta_i))
    delta_p = jnp.einsum("lab,lb->la", Hpp_inv, rhs_p)
    delta_p = jnp.where(point_valid[:, None], delta_p, 0.0)
    return delta_c, delta_p, delta_i


def _schur_solve(Hcc, Hpp, U, bc, bp, pose_fixed, point_valid, lam):
    """Solve the damped normal equations by eliminating points."""
    K = Hcc.shape[0]
    L = Hpp.shape[0]
    dtype = Hcc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    # LM damping (Levenberg: lam * I, plus floor for empty blocks)
    Hpp_d = Hpp + (lam + 1e-8) * eye3
    # guard invalid points so the 3x3 inverses stay finite
    Hpp_d = jnp.where(point_valid[:, None, None], Hpp_d, eye3)
    Hpp_inv = _inv3x3_auto(Hpp_d)
    Hpp_inv = jnp.where(point_valid[:, None, None], Hpp_inv, 0.0)

    # T1 = U * Hpp^-1  -> [K, 6, L, 3]
    T1 = jnp.einsum("kalb,lbc->kalc", U, Hpp_inv)
    # S = Hcc - T1 U^T: the (K,6)x(K,6) contraction over (L,3) flattens to
    # ONE [6K, 3L] @ [3L, 6K] matmul (the [.., L, 3] axes are contiguous),
    # which the MXU handles far better than the 4D einsum
    S_off = (T1.reshape(6 * K, 3 * L)
             @ U.reshape(6 * K, 3 * L).T).reshape(K, 6, K, 6)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc + lam * eye6)
    S = S.reshape(6 * K, 6 * K)

    rhs = -(bc - jnp.einsum("kalb,lb->ka", T1, bp))  # [K, 6]
    rhs = rhs.reshape(6 * K)

    # gauge fixing: zero rows/cols of fixed cameras, identity diagonal
    free = jnp.repeat(~pose_fixed, 6)
    S = jnp.where(free[:, None] & free[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free, 0.0, 1.0))
    rhs = jnp.where(free, rhs, 0.0)

    # dense solve (6K <= ~150 for the windowed problem); nan_to_num guards
    # singular systems (the LM accept test then simply rejects the step)
    delta_c = jnp.nan_to_num(jnp.linalg.solve(S, rhs)).reshape(K, 6)

    # back-substitute points: delta_p = Hpp^-1 (-bp - U^T delta_c)
    rhs_p = -bp - jnp.einsum("kalb,ka->lb", U, delta_c)
    delta_p = jnp.einsum("lab,lb->la", Hpp_inv, rhs_p)
    delta_p = jnp.where(point_valid[:, None], delta_p, 0.0)
    return delta_c, delta_p


def _lm_gain_update(cost, new_cost, lam, nu, pred, step_inf,
                    step_cap: float, ftol: float):
    """Gain-ratio LM damping control (Madsen et al. / Ceres flavor).

    A step is accepted only when the actual reduction is positive, the
    gain ratio rho = actual / predicted (predicted from the damped
    quadratic model, 0.5*(lam*||d||^2 - b.d)) is positive, and the step is
    finite and bounded. The old naive `new_cost < cost` rule let the
    robustified cost pay for exiling weakly-constrained cameras kilometers
    away — a saturated Huber residual is cheap, so a step that helps many
    near-threshold residuals while destroying one camera "reduces" cost;
    compounding over per-keyframe window solves, map poses exploded while
    live tracking stayed healthy. Gain-ratio control + the step-norm guard
    rejects such steps (their rho is tiny: huge ||d||^2 inflates pred).

    Returns (accept, converged, lam_new, nu_new).
    """
    actual = cost - new_cost
    rho = actual / jnp.maximum(pred, 1e-20)
    sane = jnp.isfinite(new_cost) & (step_inf < step_cap)
    accept = (actual > 0) & (rho > 1e-3) & sane
    converged = accept & (actual <= ftol * jnp.abs(cost))
    fac = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    lam_new = jnp.where(accept, lam * fac, lam * nu)
    nu_new = jnp.where(accept, jnp.asarray(2.0, lam.dtype), nu * 2.0)
    return (accept, converged, jnp.clip(lam_new, 1e-9, 1e8),
            jnp.minimum(nu_new, 64.0))


@functools.partial(jax.jit, static_argnames=("cam_name", "max_iters"))
def solve_ba_schur(
    prob: BAProblem,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 20,
    lam0: float = 1e-4,
    step_cap: float = 10.0,
):
    """LM bundle adjustment with explicit Schur elimination.

    Returns (poses [K,7], points [L,3], stats dict).
    """

    def cost_of(poses, points):
        r = _residuals(cam_name, prob, poses, points)
        return _robust_cost(r, prob.obs_valid, huber)

    # LM loop as lax.while_loop with Ceres-style function tolerance: runs
    # only as many iterations as needed (typ. 4-8) instead of always
    # max_iters — the window BA is on the keyframe hot path.
    ftol = 1e-6

    def cond(carry):
        it, done = carry[-2], carry[-1]
        return (it < max_iters) & ~done

    gtol = 0.05  # relative gradient tolerance (see done_grad below)

    # On TPU, densifying the camera-point coupling U is poison (large-
    # segment scatter + a lane-padded [K, 6, L, 3] tensor); the U-free
    # per-observation path rides the MXU instead, at ~1e-3 relative step-
    # direction error from its split-bf16 contraction. On CPU there is no
    # MXU to win and the densified path is both exact and faster — keep it
    # (it is also the golden reference the obs path is tested against).
    use_obs_path = jax.default_backend() == "tpu"

    def body(carry):
        poses, points, lam, nu, cost, it, done = carry
        if use_obs_path:
            Hcc, Hpp, W_o, bc, bp = _normal_equations_obs(
                cam_name, prob, poses, points, huber
            )
        else:
            Hcc, Hpp, U, bc, bp, _ = _normal_equations(
                cam_name, prob, poses, points, huber
            )
        # gradient termination: at a (local) optimum every step is rejected
        # and the loop would otherwise spin through max_iters full Schur
        # solves ratcheting lambda up to the stuck limit. g_inf is ~0.3 at
        # convergence vs ~1e4 one millimetre away on a window-sized problem,
        # so a relative threshold exits after a single iteration.
        free_c = (~prob.pose_fixed)[:, None].astype(bc.dtype)
        free_p = prob.point_valid[:, None].astype(bp.dtype)
        g_inf = jnp.maximum(
            jnp.max(jnp.abs(bc) * free_c),
            jnp.max(jnp.abs(bp) * free_p))
        done_grad = g_inf <= gtol * (1.0 + cost)
        if use_obs_path:
            dc, dp = _schur_solve_obs(
                Hcc, Hpp, W_o, prob.obs_cam, prob.obs_point, bc, bp,
                prob.pose_fixed, prob.point_valid, lam
            )
        else:
            dc, dp = _schur_solve(
                Hcc, Hpp, U, bc, bp, prob.pose_fixed, prob.point_valid, lam
            )
        new_poses = jax.vmap(lie.se3_retract)(poses, dc)
        new_poses = jnp.where(prob.pose_fixed[:, None], poses, new_poses)
        new_points = points + dp
        new_cost = cost_of(new_poses, new_points)
        # gain ratio vs the damped model: pred = 0.5*(lam*||d||^2 - b.d)
        dcf = dc * free_c
        dpf = dp * free_p
        d_sq = jnp.sum(dcf * dcf) + jnp.sum(dpf * dpf)
        b_dot = jnp.sum(bc * dcf) + jnp.sum(bp * dpf)
        pred = 0.5 * (lam * d_sq - b_dot)
        step_inf = jnp.max(jnp.abs(dcf))
        accept, converged, lam, nu = _lm_gain_update(
            cost, new_cost, lam, nu, pred, step_inf, step_cap, ftol)
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        cost = jnp.where(accept, new_cost, cost)
        # a rejected step with huge lambda means we are stuck
        stuck = ~accept & (lam >= 1e8)
        return (poses, points, lam, nu, cost, it + 1,
                converged | stuck | done_grad)

    init_cost = cost_of(prob.poses, prob.points)
    dtype = prob.poses.dtype
    poses, points, lam, nu, cost, iters, _ = lax.while_loop(
        cond, body,
        (prob.poses, prob.points, jnp.asarray(lam0, dtype),
         jnp.asarray(2.0, dtype), init_cost, jnp.asarray(0, jnp.int32),
         jnp.asarray(False)),
    )
    stats = {"initial_cost": init_cost, "final_cost": cost, "lambda": lam,
             "iterations": iters}
    return poses, points, stats


@functools.partial(jax.jit, static_argnames=("cam_name", "max_iters"))
def solve_ba_schur_intrinsics(
    prob: BAProblem,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 20,
    lam0: float = 1e-4,
):
    """LM bundle adjustment jointly optimizing the shared intrinsics.

    The reference's BundleAdjustmentOptions.optimize_intrinsics leaves the
    two intrinsics parameter blocks free in the Ceres problem
    (map_utils.h:397-403, wired from ui hidden.ba_opt_intrinsics at
    slam.cpp:1545). Here the two 8-vectors join the reduced camera system
    after point elimination (camera rows interleave left/right, so row k
    shares block k % 2). Returns (poses [K,7], points [L,3], intr2 [2,8],
    stats).
    """
    intr2_0 = jnp.stack([prob.intr[0], prob.intr[1]])

    def cost_of(poses, points, intr2):
        p_c, _, _ = _obs_p_c(prob, poses, points)
        intr = intr2[prob.obs_cam % 2]
        pred = jax.vmap(lambda i, p: cam_models.project(cam_name, i, p))(
            intr, p_c)
        r = jnp.clip(prob.obs_uv - pred, -RESIDUAL_CLIP, RESIDUAL_CLIP)
        return _robust_cost(r, prob.obs_valid, huber)

    ftol = 1e-6
    gtol = 0.05
    step_cap = 10.0

    def cond(carry):
        return (carry[-2] < max_iters) & ~carry[-1]

    def body(carry):
        poses, points, intr2, lam, nu, cost, it, done = carry
        (Hcc, Hpp, U, bc, bp, _, Hii, bi, Hci, Upi) = _normal_equations_intr(
            cam_name, prob, poses, points, intr2, huber)
        free_c = (~prob.pose_fixed)[:, None].astype(bc.dtype)
        free_p = prob.point_valid[:, None].astype(bp.dtype)
        g_inf = jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(bc) * free_c),
                jnp.max(jnp.abs(bp) * free_p)),
            jnp.max(jnp.abs(bi)))
        done_grad = g_inf <= gtol * (1.0 + cost)
        dc, dp, di = _schur_solve_intr(
            Hcc, Hpp, U, bc, bp, Hii, bi, Hci, Upi,
            prob.pose_fixed, prob.point_valid, lam)
        new_poses = jax.vmap(lie.se3_retract)(poses, dc)
        new_poses = jnp.where(prob.pose_fixed[:, None], poses, new_poses)
        new_points = points + dp
        new_intr = intr2 + di
        new_cost = cost_of(new_poses, new_points, new_intr)
        dcf = dc * free_c
        dpf = dp * free_p
        d_sq = jnp.sum(dcf * dcf) + jnp.sum(dpf * dpf) + jnp.sum(di * di)
        b_dot = jnp.sum(bc * dcf) + jnp.sum(bp * dpf) + jnp.sum(bi * di)
        pred = 0.5 * (lam * d_sq - b_dot)
        step_inf = jnp.max(jnp.abs(dcf))
        accept, converged, lam, nu = _lm_gain_update(
            cost, new_cost, lam, nu, pred, step_inf, step_cap, ftol)
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        intr2 = jnp.where(accept, new_intr, intr2)
        cost = jnp.where(accept, new_cost, cost)
        stuck = ~accept & (lam >= 1e8)
        return (poses, points, intr2, lam, nu, cost, it + 1,
                converged | stuck | done_grad)

    init_cost = cost_of(prob.poses, prob.points, intr2_0)
    dtype = prob.poses.dtype
    poses, points, intr2, lam, nu, cost, iters, _ = lax.while_loop(
        cond, body,
        (prob.poses, prob.points, intr2_0,
         jnp.asarray(lam0, dtype), jnp.asarray(2.0, dtype), init_cost,
         jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    stats = {"initial_cost": init_cost, "final_cost": cost, "lambda": lam,
             "iterations": iters}
    return poses, points, intr2, stats
