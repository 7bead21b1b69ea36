"""Batched RANSAC relative pose (essential matrix) from bearing vectors.

Replaces opengv's NISTER 5-point + sequential RANSAC used by the
reference's ``findInliersRansac``
(/root/reference/include/visnav/matching_utils.h:90-195). TPU-native
design: fixed H hypotheses of 8-point samples (the 8-point algorithm is a
pure batched linear solve — no polynomial root finding — and vectorizes
where Nister's quartic does not), rank-2 projection, cheirality-resolved
decomposition into (R, t), epipolar-distance scoring of all hypotheses at
once, Gauss-Newton refinement on inliers, and a final re-selection —
matching the reference's refine-then-reselect flow (matching_utils.h:
143-190). Translation is returned normalized, as there (line 141).

Planar degeneracy: the 8-point algorithm (unlike Nister's 5-point) is
degenerate when the scene is a single plane — the DLT system drops rank
and E is not unique. ``ransac_relative_pose_hybrid`` therefore races a
4-point homography model against the essential model (ORB-SLAM's
initializer strategy) and recovers the pose from the Faugeras/Lustman
H-decomposition when the homography wins — planar scenes (EuRoC's indoor
walls) then select H and stay well-posed.

STATUS: legacy/auxiliary, mirroring the reference. ``findInliersRansac``
has no caller in the reference's main ``slam`` path either (it serves the
course's SfM exercises); the stereo pipeline bootstraps scale from stereo
triangulation and never needs a monocular relative pose. The module is
kept API-complete (tests/test_relative_pose_planar.py pins both models)
for users of the reference's SfM-helper surface (map_utils.h:120-317).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import lie
from .pnp import _sample_minimal, _smallest_eigvec


def _essential_from_sample(f1, f2):
    """8-point algorithm. f1, f2 [S, 3] unit bearings with f1^T E f2 = 0."""
    A = jnp.einsum("si,sj->sij", f1, f2).reshape(f1.shape[0], 9)
    e = _smallest_eigvec(A.T @ A)
    E = e.reshape(3, 3)
    # project to the essential manifold: two equal singular values. Use the
    # SVD-free route: E E^T has eigvals (s1^2, s2^2, 0); scaling suffices
    # for scoring, and the decomposition below re-orthogonalizes.
    return E / (jnp.linalg.norm(E) + 1e-12)


def _epipolar_error(E, f1, f2):
    """|f1^T E f2| per correspondence (reference scores this way,
    matching_utils.h:81)."""
    return jnp.abs(jnp.einsum("ni,ij,nj->n", f1, E, f2))


def _decompose(E, f1, f2, mask):
    """E -> (R [7-pose]) with cheirality voting over the 4 candidates.

    Returns T_1_2 (pose of frame 2 in frame 1, translation normalized).
    """
    # E = [t]_x R ; recover t as the null vector of E^T (SVD-free)
    t = _smallest_eigvec(E @ E.T)          # left null vector
    t = t / (jnp.linalg.norm(t) + 1e-12)

    # closed-form rotation extraction (Horn): for a consistent pair
    # (E, t) with E = [t]_x R and |t| = 1,  R = -[t]_x E + adj(E)^T
    # (since [t]_x^T E = (I - t t^T) R and adj(E)^T = t t^T R).
    # Enumerate the 4 sign combinations; inconsistent pairs produce
    # non-rotations that the polar projection + cheirality vote reject.
    def rot_for(E_c, tv):
        # adj(E)^T: adj(M)[i, j] = cofactor(M)[j, i]
        cof = jnp.stack([jnp.cross(E_c[(i + 1) % 3], E_c[(i + 2) % 3])
                         for i in range(3)])  # cofactor rows from E rows
        M = -lie.hat(tv) @ E_c + cof  # cof == adj(E)^T for this layout
        # polar projection (numerical cleanup; E is only approx rank-2).
        # Frobenius normalization keeps the spectral norm <= 1, inside the
        # Newton-Schulz convergence region.
        nrm = jnp.sqrt(jnp.sum(M * M)) + 1e-12
        x = M / nrm
        eye = jnp.eye(3, dtype=E.dtype)
        for _ in range(14):
            x = x @ (1.5 * eye - 0.5 * x.T @ x)
        return x * jnp.sign(jnp.linalg.det(x))

    cands = []
    for se in (1.0, -1.0):
        for st in (1.0, -1.0):
            tv = st * t
            cands.append((rot_for(se * E, tv), tv))

    # cheirality: count correspondences with positive depths in both frames
    def score(R, tv):
        # triangulate by midpoint in frame 1; f2 rotated: R f2
        r2 = f2 @ R.T
        f1f1 = jnp.sum(f1 * f1, -1)
        r2r2 = jnp.sum(r2 * r2, -1)
        f1r2 = jnp.sum(f1 * r2, -1)
        f1t = f1 @ tv
        r2t = r2 @ tv
        det = f1f1 * r2r2 - f1r2 * f1r2
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        a = (r2r2 * f1t - f1r2 * r2t) / det
        b = (f1r2 * f1t - f1f1 * r2t) / det
        return jnp.sum(((a > 0) & (b > 0)) & mask)

    scores = jnp.stack([score(R, tv) for R, tv in cands])
    best = jnp.argmax(scores)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return lie.se3_from_Rt(Rs[best], ts[best])


def _gn_refine_rel(T_1_2, f1, f2, weights, iters: int = 8):
    """GN on the epipolar residual f1^T E(T) f2 over se3 (t renormalized)."""

    def resid(T):
        t = lie.se3_t(T)
        tn = t / (jnp.linalg.norm(t) + 1e-12)
        R = lie.quat_to_matrix(lie.se3_q(T))
        E = lie.hat(tn) @ R
        return jnp.einsum("ni,ij,nj->n", f1, E, f2) * weights

    def step(T, _):
        def r_of(delta):
            return resid(lie.se3_retract(T, delta))

        z = jnp.zeros(6, dtype=f1.dtype)
        J = jax.jacfwd(r_of)(z)
        r = resid(T)
        H = J.T @ J + 1e-9 * jnp.eye(6, dtype=f1.dtype)
        delta = -jnp.nan_to_num(jnp.linalg.solve(H, J.T @ r))
        return lie.se3_retract(T, delta), None

    T, _ = lax.scan(step, T_1_2, None, length=iters)
    t = lie.se3_t(T)
    return lie.se3_make(t / (jnp.linalg.norm(t) + 1e-12), lie.se3_q(T))


# ---------------------------------------------------------------------------
# Homography path (planar scenes)
# ---------------------------------------------------------------------------

def _homography_from_sample(f1, f2):
    """4-point DLT: H with f1 ~ H f2 (bearings, homogeneous). [S, 3] each."""
    s = f1.shape[0]
    zeros = jnp.zeros((s, 3), f1.dtype)
    # rows from f1 x (H f2) = 0 (two independent equations per point)
    r1 = jnp.concatenate([zeros, -f1[:, 2:3] * f2, f1[:, 1:2] * f2], axis=1)
    r2 = jnp.concatenate([f1[:, 2:3] * f2, zeros, -f1[:, 0:1] * f2], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)           # [2S, 9]
    h = _smallest_eigvec(A.T @ A)
    H = h.reshape(3, 3)
    return H / (jnp.linalg.norm(H) + 1e-12)


def _homography_error(H, f1, f2):
    """Sine of the angle between f1 and H f2 (sphere transfer error)."""
    Hf2 = f2 @ H.T
    Hf2 = Hf2 / (jnp.linalg.norm(Hf2, axis=-1, keepdims=True) + 1e-12)
    return jnp.linalg.norm(jnp.cross(f1, Hf2), axis=-1)


def _decompose_homography(H, f1, f2, mask):
    """Faugeras/Lustman SVD decomposition of a calibrated homography.

    H ~ R + t n^T / d. Enumerates the 8 (R, t, n) solutions and picks the
    one with the best cheirality + plane-visibility vote. Returns T_1_2
    (translation normalized).
    """
    U, D, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[0] / D[1], 1.0, D[2] / D[1]

    eps = 1e-9
    denom = jnp.maximum(d1 * d1 - d3 * d3, eps)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - 1.0) / denom, 0.0))
    x3 = jnp.sqrt(jnp.clip((1.0 - d3 * d3) / denom, 0.0))

    cands = []
    # case d' = +d2: R' is a y-rotation
    sin_t = (d1 - d3) * x1 * x3
    cos_t = d1 * x3 * x3 + d3 * x1 * x1
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = jnp.array([[cos_t, 0.0, -st],
                            [0.0, 1.0, 0.0],
                            [st, 0.0, cos_t]], H.dtype)
            tp = (d1 - d3) * jnp.array([e1 * x1, 0.0, -e3 * x3], H.dtype)
            np_ = jnp.array([e1 * x1, 0.0, e3 * x3], H.dtype)
            cands.append((Rp, tp, np_))
    # case d' = -d2: R' is a y-rotation composed with diag(1,-1,-1)
    sin_p = (d1 + d3) * x1 * x3
    cos_p = d3 * x1 * x1 - d1 * x3 * x3
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            sp = e1 * e3 * sin_p
            Rp = jnp.array([[cos_p, 0.0, sp],
                            [0.0, -1.0, 0.0],
                            [sp, 0.0, -cos_p]], H.dtype)
            tp = (d1 + d3) * jnp.array([e1 * x1, 0.0, e3 * x3], H.dtype)
            np_ = jnp.array([e1 * x1, 0.0, e3 * x3], H.dtype)
            cands.append((Rp, tp, np_))

    def world(Rp, tp, np_):
        R = s * U @ Rp @ Vt
        t = U @ tp
        n = (Vt.T @ np_)
        return R, t / (jnp.linalg.norm(t) + 1e-12), n

    def score(Rp, tp, np_):
        R, t, n = world(Rp, tp, np_)
        # cheirality via midpoint triangulation (same as the E path)
        r2 = f2 @ R.T
        f1f1 = jnp.sum(f1 * f1, -1)
        r2r2 = jnp.sum(r2 * r2, -1)
        f1r2 = jnp.sum(f1 * r2, -1)
        f1t = f1 @ t
        r2t = r2 @ t
        det = f1f1 * r2r2 - f1r2 * f1r2
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        a = (r2r2 * f1t - f1r2 * r2t) / det
        b = (f1r2 * f1t - f1f1 * r2t) / det
        # plane must be in front of camera 2: n^T f2 > 0 for inliers
        front = (f2 @ n) > 0
        return jnp.sum(((a > 0) & (b > 0) & front) & mask)

    scores = jnp.stack([score(*c) for c in cands])
    best = jnp.argmax(scores)
    Rs = jnp.stack([world(*c)[0] for c in cands])
    ts = jnp.stack([world(*c)[1] for c in cands])
    return lie.se3_from_Rt(Rs[best], ts[best])


@functools.partial(jax.jit,
                   static_argnames=("num_hypotheses", "min_inliers"))
def ransac_homography(
    key,
    f1,
    f2,
    valid,
    threshold: float = 1e-3,
    num_hypotheses: int = 256,
    min_inliers: int = 16,
):
    """Robust calibrated homography + pose. Returns (T_1_2, H, inliers,
    num, ok)."""
    idx = _sample_minimal(key, valid, num_hypotheses, 4)
    Hs = jax.vmap(lambda s: _homography_from_sample(f1[s], f2[s]))(idx)
    errs = jax.vmap(lambda H: _homography_error(H, f1, f2))(Hs)
    inl = (errs < threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    H_best = Hs[best]
    inl_best = inl[best]
    T = _decompose_homography(H_best, f1, f2, inl_best)
    num = jnp.sum(inl_best)
    ok = (num >= min_inliers) & jnp.all(jnp.isfinite(T))
    return T, H_best, inl_best & ok, jnp.where(ok, num, 0), ok


@functools.partial(jax.jit,
                   static_argnames=("num_hypotheses", "min_inliers",
                                    "refine_iters"))
def ransac_relative_pose_hybrid(
    key,
    f1,
    f2,
    valid,
    threshold: float = 1e-3,
    num_hypotheses: int = 256,
    min_inliers: int = 16,
    refine_iters: int = 8,
    h_margin: float = 1.15,
):
    """Race essential vs homography models (ORB-SLAM initializer flow).

    Planar scenes break the 8-point essential solve (rank-deficient DLT);
    there the homography wins the inlier vote by a wide margin and its
    Faugeras decomposition supplies the pose. Returns
    (T_1_2, inliers, num, ok, used_homography).
    """
    del h_margin  # selection is by pose support, not raw inlier margin
    k_e, k_h = jax.random.split(key)
    T_e, inl_e, n_e, ok_e = ransac_relative_pose(
        k_e, f1, f2, valid, threshold=threshold,
        num_hypotheses=num_hypotheses, min_inliers=min_inliers,
        refine_iters=refine_iters)
    T_h, _, inl_h, n_h, ok_h = ransac_homography(
        k_h, f1, f2, valid, threshold=threshold,
        num_hypotheses=num_hypotheses, min_inliers=min_inliers)
    # refine the H pose on its inliers with the epipolar GN (the pose is
    # epipolar-consistent regardless of which model found it)
    T_h = _gn_refine_rel(T_h, f1, f2, inl_h.astype(f1.dtype), refine_iters)

    # A degenerate-plane E still has ~zero epipolar error on every plane
    # point (the plane-induced E family), so inlier COUNTS cannot
    # discriminate — but the pose decomposed from a degenerate E is wrong.
    # Select by pose support: cheirality-positive epipolar inliers.
    def pose_support(T):
        R = lie.quat_to_matrix(lie.se3_q(T))
        t = lie.se3_t(T)
        t = t / (jnp.linalg.norm(t) + 1e-12)
        E = lie.hat(t) @ R
        epi = _epipolar_error(E, f1, f2) < threshold
        r2 = f2 @ R.T
        f1f1 = jnp.sum(f1 * f1, -1)
        r2r2 = jnp.sum(r2 * r2, -1)
        f1r2 = jnp.sum(f1 * r2, -1)
        f1t = f1 @ t
        r2t = r2 @ t
        det = f1f1 * r2r2 - f1r2 * f1r2
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        a = (r2r2 * f1t - f1r2 * r2t) / det
        b = (f1r2 * f1t - f1f1 * r2t) / det
        good = epi & (a > 0) & (b > 0) & valid
        return jnp.sum(good), good

    s_e, good_e = pose_support(T_e)
    s_h, good_h = pose_support(T_h)
    use_h = ok_h & ((s_h > s_e) | ~ok_e)
    T = jnp.where(use_h, T_h, T_e)
    inliers = jnp.where(use_h, good_h, good_e)
    num = jnp.where(use_h, s_h, s_e)
    ok = jnp.where(use_h, ok_h, ok_e) & (num >= min_inliers)
    return T, inliers, num, ok, use_h


@functools.partial(jax.jit,
                   static_argnames=("num_hypotheses", "min_inliers",
                                    "refine_iters"))
def ransac_relative_pose(
    key,
    f1,
    f2,
    valid,
    threshold: float = 1e-3,
    num_hypotheses: int = 256,
    min_inliers: int = 16,
    refine_iters: int = 8,
):
    """f1, f2 [N, 3] unit bearings. Returns (T_1_2 [7], inliers [N], num,
    ok). Translation normalized."""
    n = f1.shape[0]
    idx = _sample_minimal(key, valid, num_hypotheses, 8)
    Es = jax.vmap(lambda s: _essential_from_sample(f1[s], f2[s]))(idx)

    errs = jax.vmap(lambda E: _epipolar_error(E, f1, f2))(Es)   # [H, N]
    inl = (errs < threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    E_best = Es[best]
    inl_best = inl[best]

    T = _decompose(E_best, f1, f2, inl_best)
    T = _gn_refine_rel(T, f1, f2, inl_best.astype(f1.dtype), refine_iters)

    # re-select with the refined model (selectWithinDistance semantics)
    tn = lie.se3_t(T)
    R = lie.quat_to_matrix(lie.se3_q(T))
    E_ref = lie.hat(tn) @ R
    err = _epipolar_error(E_ref, f1, f2)
    inliers = (err < threshold) & valid
    num = jnp.sum(inliers)
    finite = jnp.all(jnp.isfinite(T))
    ok = (num >= min_inliers) & finite
    # reference clears inliers when below the minimum (matching_utils.h:192)
    inliers = inliers & ok
    return T, inliers, jnp.where(ok, num, 0), ok
