"""Sim(3) similarity alignment: closed-form Horn/Umeyama + batched RANSAC.

The reference carries a closed-form Horn-style SVD alignment of matched 3D
point sets (/root/reference/include/visnav/sim3.h:48-141, compute_sim3_1)
alongside its production SE3 PnP path (sim3.h:228-359) — stereo makes scale
observable, so production loop corrections are SE3, but the with-scale
solver is a first-class component (monocular use, map merging, evaluation
alignment). This is its TPU-native equivalent:

- ``horn_align``: weighted closed-form Umeyama solve for (s, R, t)
  minimizing sum w_i ||dst_i - (s R src_i + t)||^2 — one SVD, jit-safe,
  fully masked;
- ``ransac_sim3``: vmapped 3-point hypotheses + inlier counting + refit on
  the consensus set, the batched-RANSAC pattern shared with solvers/pnp.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Sim3(NamedTuple):
    s: jnp.ndarray   # [] scale
    R: jnp.ndarray   # [3, 3]
    t: jnp.ndarray   # [3]


def sim3_apply(T: Sim3, p):
    """p [..., 3] -> s R p + t."""
    return T.s * (p @ T.R.T) + T.t


def sim3_inv(T: Sim3) -> Sim3:
    Rinv = T.R.T
    s = 1.0 / T.s
    return Sim3(s=s, R=Rinv, t=-s * (Rinv @ T.t))


def horn_align(src, dst, weights=None, with_scale: bool = True) -> Sim3:
    """Closed-form similarity alignment (Horn 1987 / Umeyama 1991).

    src, dst [N, 3]; weights [N] (>= 0, zeros mask points out). Returns the
    Sim3 with dst ~= s R src + t. With ``with_scale=False`` returns the SE3
    special case (s = 1) — the same math as the reference's alignSVD ATE
    alignment (src/slam.cpp:1618-1710).
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    n = src.shape[0]
    w = (jnp.ones(n, src.dtype) if weights is None
         else jnp.asarray(weights, src.dtype))
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    wn = w / wsum
    mu_s = jnp.sum(wn[:, None] * src, axis=0)
    mu_d = jnp.sum(wn[:, None] * dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    # covariance sum_i w_i xd_i xs_i^T  (3x3)
    cov = jnp.einsum("n,ni,nj->ij", wn, xd, xs)
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], src.dtype)).at[2, 2].set(sgn)
    R = U @ S @ Vt
    if with_scale:
        var_s = jnp.maximum(jnp.sum(wn * jnp.sum(xs * xs, -1)), 1e-12)
        s = jnp.sum(D * jnp.diag(S)) / var_s
    else:
        s = jnp.asarray(1.0, src.dtype)
    t = mu_d - s * (R @ mu_s)
    return Sim3(s=s, R=R, t=t)


@functools.partial(jax.jit,
                   static_argnames=("num_hypotheses", "with_scale"))
def ransac_sim3(
    key,
    src,            # [N, 3]
    dst,            # [N, 3]
    valid,          # [N] bool
    threshold: float = 0.1,    # inlier 3D distance (meters)
    num_hypotheses: int = 128,
    min_inliers: int = 4,
    with_scale: bool = True,
):
    """Robust Sim(3) from 3D-3D correspondences.

    Batched hypotheses: sample 3 valid pairs per hypothesis (vmapped Horn),
    count inliers by aligned 3D distance, refit on the best consensus set.
    Returns (Sim3, inlier_mask [N], num_inliers, ok).
    """
    n = src.shape[0]
    validf = valid.astype(jnp.float32)

    def sample(k):
        # weighted choice without replacement over valid entries
        g = jax.random.gumbel(k, (n,)) + jnp.log(validf + 1e-30)
        return jax.lax.top_k(g, 3)[1]

    keys = jax.random.split(key, num_hypotheses)
    idx = jax.vmap(sample)(keys)                      # [H, 3]

    def one(ix):
        T = horn_align(src[ix], dst[ix], with_scale=with_scale)
        d = jnp.linalg.norm(sim3_apply(T, src) - dst, axis=-1)
        inl = valid & (d < threshold)
        # guard degenerate triples (collinear -> wild scale)
        bad = (~jnp.isfinite(T.s)) | (T.s <= 1e-3) | (T.s >= 1e3)
        return jnp.where(bad, -1, jnp.sum(inl))

    scores = jax.vmap(one)(idx)                       # [H]
    best = jnp.argmax(scores)
    T0 = horn_align(src[idx[best]], dst[idx[best]], with_scale=with_scale)
    d = jnp.linalg.norm(sim3_apply(T0, src) - dst, axis=-1)
    inl = valid & (d < threshold)
    # refit on the consensus set, then re-select (opengv-style refine)
    T1 = horn_align(src, dst, weights=inl.astype(src.dtype),
                    with_scale=with_scale)
    d1 = jnp.linalg.norm(sim3_apply(T1, src) - dst, axis=-1)
    inl1 = valid & (d1 < threshold)
    n_inl = jnp.sum(inl1)
    ok = (n_inl >= min_inliers) & jnp.isfinite(T1.s) & (T1.s > 1e-3)
    return T1, inl1, n_inl, ok
