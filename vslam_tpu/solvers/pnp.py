"""Batched RANSAC PnP (absolute pose from 3D-2D correspondences).

TPU-native replacement for opengv's KNEIP P3P + sequential RANSAC +
optimize_nonlinear used throughout the reference
(/root/reference/include/visnav/vo_utils.h:189-229 ``localize_camera``,
tracking.h:98-128, sim3.h:313-344, tracking.h:347-380). Instead of a
sequential hypothesize-verify loop, we:

  1. draw a fixed number H of 6-point minimal samples in parallel (masked
     Gumbel top-k sampling, so invalid/padded correspondences are never
     picked),
  2. solve each with a DLT on the bearing-vector cross-product constraint
     (batched SVD; both DLT sign branches are evaluated and the one with
     better cheirality wins),
  3. score all H hypotheses against all N correspondences with one batched
     matmul-shaped reduction using opengv's angular threshold
     1 - cos(atan(px / 500)) (vo_utils.h:211-212),
  4. Gauss-Newton-refine the best hypothesis on its inliers (replacing
     optimize_nonlinear) and re-select inliers with the refined pose
     (selectWithinDistance semantics).

Everything is fixed-shape: one jit-compiled program per (N, H) size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import lie


def ransac_threshold(px: float = 3.0, focal: float = 500.0) -> float:
    """opengv-style angular threshold (vo_utils.h:211-212)."""
    import math

    return 1.0 - math.cos(math.atan(px / focal))


def _sample_minimal(key, valid, num_hyp: int, sample_size: int):
    """[H, S] indices of distinct valid correspondences per hypothesis.

    Gumbel-top-k over the validity mask: invalid entries get -inf scores so
    they are only selected if fewer than S valid entries exist (callers gate
    on match counts before invoking RANSAC, mirroring the reference's
    ``md.matches.size() < 10`` early-outs).
    """
    n = valid.shape[0]
    g = jax.random.gumbel(key, (num_hyp, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = lax.top_k(g, sample_size)
    return idx


def _orthogonalize(m, iters: int = 12):
    """Nearest rotation + mean scale for a 3x3 matrix.

    Newton-Schulz polar iteration instead of SVD: TPU compiles tiny matmul
    loops orders of magnitude faster than batched SVD, and the DLT matrices
    here are well-conditioned after normalization. Converges to the
    orthogonal polar factor (det sign follows det(m); callers evaluate both
    DLT sign branches and pick by cheirality).
    """
    # normalize so singular values are <= ~1 (required for convergence)
    norm = jnp.sqrt(jnp.sum(m * m, axis=(-2, -1), keepdims=True)) + 1e-12
    x = m / norm
    eye = jnp.eye(3, dtype=m.dtype)
    for _ in range(iters):
        xtx = jnp.swapaxes(x, -1, -2) @ x
        x = x @ (1.5 * eye - 0.5 * xtx)
    r = x
    # scale = mean singular value = trace(R^T M) / 3
    scale = jnp.trace(jnp.swapaxes(r, -1, -2) @ m, axis1=-2, axis2=-1) / 3.0
    return r, scale


def _smallest_eigvec(M, iters: int = 12):
    """Eigenvector of the smallest eigenvalue of a PSD matrix [n, n].

    Inverse iteration with a tiny shift and a fixed deterministic start;
    replaces the SVD null-space extraction (batched SVD is prohibitively
    slow to compile on TPU).
    """
    n = M.shape[-1]
    tr = jnp.trace(M) / n
    A = M + (1e-9 * tr + 1e-20) * jnp.eye(n, dtype=M.dtype)
    cho = jax.scipy.linalg.cho_factor(A)
    v = jnp.ones((n,), dtype=M.dtype) / jnp.sqrt(jnp.asarray(n, M.dtype))
    for _ in range(iters):
        v = jax.scipy.linalg.cho_solve(cho, v)
        v = v / (jnp.linalg.norm(v) + 1e-30)
    return v


def _dlt_pose(points, bearings):
    """DLT for T_c_w from S >= 6 correspondences.

    points [S, 3] world, bearings [S, 3] unit camera-frame rays.
    Constraint: [f]_x (R X + t) = 0. Points are Hartley-normalized
    (centroid + RMS scale) for f32 conditioning. Returns two sign
    candidates (R [2, 3, 3], t [2, 3]).
    """
    s = points.shape[0]
    f = bearings
    zeros = jnp.zeros((s,), dtype=points.dtype)
    ones = jnp.ones((s,), dtype=points.dtype)

    # Hartley normalization: X' = (X - c) / sc
    c = jnp.mean(points, axis=0)
    sc = jnp.sqrt(jnp.mean(jnp.sum((points - c) ** 2, axis=-1))) + 1e-12
    points = (points - c) / sc

    # rows of [f]_x kron [X^T, 1]
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    X = jnp.concatenate([points, ones[:, None]], axis=1)  # [S, 4]

    def row(a, b, c):
        # a*(row0 of P) + b*(row1) + c*(row2) applied to X
        return jnp.concatenate(
            [a[:, None] * X, b[:, None] * X, c[:, None] * X], axis=1
        )

    # [f]_x M X = 0 -> three rows per point (rank 2)
    r1 = row(zeros, -fz, fy)
    r2 = row(fz, zeros, -fx)
    r3 = row(-fy, fx, zeros)
    A = jnp.concatenate([r1, r2, r3], axis=0)  # [3S, 12]

    # null vector of A via the smallest eigenvector of A^T A (SVD-free)
    p = _smallest_eigvec(A.T @ A)  # [12]
    M = p.reshape(3, 4)
    # M[:, :3] = lam * R / sc (normalized points) => undo normalization:
    # x_c ~ R X + t with t = M[:, 3] / lam - R c, lam = scale_from_orth
    Rt, lam = _orthogonalize(M[:, :3])
    lam = jnp.where(jnp.abs(lam) < 1e-12, 1e-12, lam)
    t = M[:, 3] / lam - (Rt @ c) / sc
    t = t * sc

    # DLT sign ambiguity: (-M) is an equally valid solution.
    Rt2, lam2 = _orthogonalize(-M[:, :3])
    lam2 = jnp.where(jnp.abs(lam2) < 1e-12, 1e-12, lam2)
    t2 = (-M[:, 3] / lam2 - (Rt2 @ c) / sc) * sc
    return jnp.stack([Rt, Rt2]), jnp.stack([t, t2])


def _angular_error(R_cw, t_cw, points, bearings):
    """1 - cos(angle between bearing and predicted ray). [N]."""
    pc = points @ R_cw.T + t_cw
    norm = jnp.linalg.norm(pc, axis=-1)
    cos = jnp.sum(pc * bearings, axis=-1) / jnp.where(norm < 1e-12, 1e-12, norm)
    return 1.0 - cos


def _gn_refine(R_cw, t_cw, points, bearings, weights, iters: int = 8):
    """Gauss-Newton on T_c_w minimizing the bearing residual f - normalize(RX+t).

    Replaces opengv::absolute_pose::optimize_nonlinear. Right-multiplicative
    updates on SE(3); weights mask out outliers.
    """
    T = lie.se3_from_Rt(R_cw, t_cw)

    def residual(T_cw):
        pc = lie.se3_apply(T_cw, points)
        n = jnp.linalg.norm(pc, axis=-1, keepdims=True)
        pred = pc / jnp.where(n < 1e-12, 1e-12, n)
        return (bearings - pred).reshape(-1)

    def step(T_cw, _):
        def r_of_delta(delta):
            return residual(lie.se3_retract(T_cw, delta))

        delta0 = jnp.zeros(6, dtype=points.dtype)
        J = jax.jacfwd(r_of_delta)(delta0)  # [3N, 6]
        r = residual(T_cw)
        wfull = jnp.repeat(weights, 3)
        Jw = J * wfull[:, None]
        H = Jw.T @ J + 1e-9 * jnp.eye(6, dtype=points.dtype)
        g = Jw.T @ r
        delta = -jnp.linalg.solve(H, g)
        return lie.se3_retract(T_cw, delta), None

    T, _ = lax.scan(step, T, None, length=iters)
    return T


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "min_inliers", "refine_iters")
)
def ransac_pnp(
    key,
    points_w,
    bearings,
    valid,
    threshold: float,
    num_hypotheses: int = 256,
    min_inliers: int = 1,
    refine_iters: int = 8,
):
    """Full RANSAC-PnP. Returns (T_w_c [7], inlier_mask [N], num_inliers).

    points_w [N, 3], bearings [N, 3] (unit, camera frame), valid [N] bool.
    """
    n = points_w.shape[0]
    idx = _sample_minimal(key, valid, num_hypotheses, 6)  # [H, 6]
    pts = points_w[idx]  # [H, 6, 3]
    brs = bearings[idx]

    Rs, ts = jax.vmap(_dlt_pose)(pts, brs)  # [H, 2, 3, 3], [H, 2, 3]
    # degenerate samples (duplicate points) can yield NaN hypotheses;
    # make them finite garbage so they simply score zero inliers
    Rs = jnp.nan_to_num(Rs, nan=0.0, posinf=0.0, neginf=0.0)
    ts = jnp.nan_to_num(ts, nan=0.0, posinf=0.0, neginf=0.0)

    # score both sign branches of every hypothesis
    def score(R, t):
        err = _angular_error(R, t, points_w, bearings)  # [N]
        inl = (err < threshold) & valid
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(
        lambda R2, t2: jax.vmap(score)(R2, t2)
    )(Rs, ts)  # counts [H, 2], inls [H, 2, N]

    flat_counts = counts.reshape(-1)
    best = jnp.argmax(flat_counts)
    R_best = Rs.reshape(-1, 3, 3)[best]
    t_best = ts.reshape(-1, 3)[best]
    inl_best = inls.reshape(-1, n)[best]

    # GN refinement on inliers (optimize_nonlinear), then re-select
    w = inl_best.astype(points_w.dtype)
    T_cw = _gn_refine(R_best, t_best, points_w, bearings, w, refine_iters)
    err = _angular_error(
        lie.quat_to_matrix(lie.se3_q(T_cw)), lie.se3_t(T_cw), points_w, bearings
    )
    inliers = (err < threshold) & valid

    # second refine/re-select round with IRLS (Cauchy) weights over ALL
    # valid matches: near-threshold correspondences contribute with reduced
    # weight instead of being hard-gated on the first pose estimate. On
    # marginal frames (few, noisy inliers) the single-round result is
    # arithmetic-sensitive — one f32 reduction-order flip changes the
    # re-selected set — while the weighted second round converges both
    # device-count variants to the same basin.
    e_rel = err / threshold
    w2 = jnp.where(valid, 1.0 / (1.0 + e_rel * e_rel), 0.0).astype(
        points_w.dtype)
    T_cw = _gn_refine(
        lie.quat_to_matrix(lie.se3_q(T_cw)), lie.se3_t(T_cw),
        points_w, bearings, w2, refine_iters)
    err = _angular_error(
        lie.quat_to_matrix(lie.se3_q(T_cw)), lie.se3_t(T_cw), points_w, bearings
    )
    inliers = (err < threshold) & valid
    num = jnp.sum(inliers)

    T_wc = lie.se3_inv(T_cw)
    finite = jnp.all(jnp.isfinite(T_wc))
    ok = (num >= min_inliers) & finite
    inliers = inliers & finite
    num = jnp.where(finite, num, 0)
    T_wc = jnp.nan_to_num(T_wc, nan=0.0, posinf=0.0, neginf=0.0)
    T_wc = jnp.where(finite, T_wc, lie.identity_pose(T_wc.dtype))
    return T_wc, inliers, num, ok
