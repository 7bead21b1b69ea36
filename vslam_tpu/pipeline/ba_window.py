"""Windowed bundle adjustment over the active keyframe set.

The analogue of the reference's ``optimize()``
(/root/reference/src/slam.cpp:1510-1569): snapshot active cameras +
landmarks, run BA with the oldest keyframe pair fixed for gauge
(slam.cpp:1540,1558), merge results back (slam.cpp:1379-1408, including the
``p_c`` re-anchoring). Here snapshot/merge are fixed-shape gathers/scatters
between the SLAM state and a BAProblem, and the LM solve is
solvers.ba.solve_ba_schur.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.state import KeyframeState, LandmarkState
from ..geometry import lie
from ..solvers import ba


class WindowProblem(NamedTuple):
    prob: ba.BAProblem
    sel_kf: jnp.ndarray       # [W2] KF slots (W2 = W // 2 pairs)
    sel_kf_valid: jnp.ndarray  # [W2]
    sel_lm: jnp.ndarray       # [Lw] landmark slots
    sel_lm_valid: jnp.ndarray  # [Lw]
    # in-window observations that did NOT fit the O cap (compaction drops
    # them silently otherwise; the reference never drops in-window obs,
    # map_utils.h:369-395, so truncation must be visible evidence)
    obs_dropped: jnp.ndarray = None  # [] int32


@functools.partial(jax.jit, static_argnames=("W2", "Lw", "O", "obs_per_lm"))
def build_window_problem(
    kf: KeyframeState,
    lm: LandmarkState,
    intr0,
    intr1,
    W2: int = 12,
    Lw: int = 8192,
    O: int = 24576,
    obs_per_lm: int = 0,
) -> WindowProblem:
    K = kf.frame_id.shape[0]
    dtype = kf.pose_l.dtype
    W2 = min(W2, K)          # tiny-capacity configs
    Lw = min(Lw, lm.pos.shape[0])

    # ---- select active KF pairs (newest-first; window is small) ----
    act = kf.valid & kf.active
    prio = jnp.where(act, jnp.arange(K, dtype=jnp.int32), -1)
    _, sel_kf = lax.top_k(prio, W2)
    sel_kf_valid = act[sel_kf]

    # oldest active frame pair is the gauge (slam.cpp:1540)
    big = jnp.iinfo(jnp.int32).max
    oldest = jnp.min(jnp.where(act, kf.frame_id, big))
    is_gauge = kf.frame_id[sel_kf] == oldest

    # cameras: w = 2*i (left) / 2*i+1 (right)
    poses = jnp.stack([kf.pose_l[sel_kf], kf.pose_r[sel_kf]], axis=1)
    poses = poses.reshape(2 * W2, 7)
    fixed = jnp.repeat(is_gauge | ~sel_kf_valid, 2)
    intr = jnp.stack([jnp.broadcast_to(intr0, (W2, 8)),
                      jnp.broadcast_to(intr1, (W2, 8))], axis=1)
    intr = intr.reshape(2 * W2, 8).astype(dtype)

    # kf slot -> window pair index (K+1 sentinel row for misses)
    kf_to_i = jnp.full((K + 1,), -1, jnp.int32)
    kf_to_i = kf_to_i.at[jnp.where(sel_kf_valid, sel_kf, K)].set(
        jnp.arange(W2, dtype=jnp.int32), mode="drop")

    # ---- select active landmarks (O(n) scatter compaction) ----
    from ..ops.compact import compact_indices

    L = lm.pos.shape[0]
    sel_lm, sel_lm_valid = compact_indices(lm.active & lm.valid, Lw)
    sel_lm = jnp.clip(sel_lm, 0, L - 1)

    # ---- flatten + compact their windowed observations ----
    M = lm.obs_kf.shape[1]
    okf = lm.obs_kf[sel_lm]                    # [Lw, M]
    ocam = lm.obs_cam[sel_lm]
    ofeat = lm.obs_feat[sel_lm]
    pair_i = kf_to_i[jnp.clip(okf, 0, K)]      # [Lw, M]
    ovalid = (okf >= 0) & (pair_i >= 0) & sel_lm_valid[:, None]

    if 0 < obs_per_lm < M:
        # obs subsampling: keep only the obs_per_lm NEWEST in-window
        # observations per landmark (by observing keyframe's frame id).
        # A well-tracked landmark accrues up to M=obs-table-width entries
        # inside the window; the newest k pin the same cameras at ~k/M of
        # the Jacobian/Schur cost. Oldest-first dropping biases residuals
        # toward the live end of the window, where the pose being
        # estimated lives; the gauge pair is fixed anyway so its dropped
        # observations only lose point constraints that newer views
        # re-measure. (The reference solves the full observation set,
        # slam.cpp:1510-1569 — this is a TPU throughput lever, off by
        # default, enabled via SlamConfig.ba_obs_per_lm.)
        recency = jnp.where(ovalid, kf.frame_id[jnp.clip(okf, 0, K - 1)],
                            -1)
        _, cols = lax.top_k(recency, obs_per_lm)          # [Lw, k]
        okf = jnp.take_along_axis(okf, cols, axis=1)
        ocam = jnp.take_along_axis(ocam, cols, axis=1)
        ofeat = jnp.take_along_axis(ofeat, cols, axis=1)
        ovalid = jnp.take_along_axis(ovalid, cols, axis=1)
        M = obs_per_lm

    opoint = jnp.broadcast_to(
        jnp.arange(Lw, dtype=jnp.int32)[:, None], (Lw, M))

    flat_valid = ovalid.reshape(-1)
    oidx, o_sel_ok = compact_indices(flat_valid, O)
    oidx = jnp.clip(oidx, 0, flat_valid.shape[0] - 1)
    o_valid = flat_valid[oidx] & o_sel_ok
    o_kf = okf.reshape(-1)[oidx]
    o_cam = ocam.reshape(-1)[oidx]
    o_feat = ofeat.reshape(-1)[oidx]
    o_point = opoint.reshape(-1)[oidx]
    o_w = 2 * kf_to_i[jnp.clip(o_kf, 0, K)] + o_cam
    o_w = jnp.where(o_valid, o_w, 0)
    o_uv = kf.corners[jnp.clip(o_kf, 0), o_cam, o_feat]

    prob = ba.BAProblem(
        poses=poses,
        pose_fixed=fixed,
        intr=intr,
        points=lm.pos[sel_lm],
        point_valid=sel_lm_valid,
        obs_cam=o_w.astype(jnp.int32),
        obs_point=o_point.astype(jnp.int32),
        obs_uv=o_uv.astype(dtype),
        obs_valid=o_valid,
    )
    obs_dropped = (jnp.sum(flat_valid) - jnp.sum(o_valid)).astype(jnp.int32)
    return WindowProblem(prob, sel_kf, sel_kf_valid, sel_lm, sel_lm_valid,
                         obs_dropped)


@jax.jit
def merge_window_result(
    kf: KeyframeState,
    lm: LandmarkState,
    wp: WindowProblem,
    poses,    # [2*W2, 7] optimized
    points,   # [Lw, 3]
):
    """Write optimized poses/points back; re-anchor p_c (slam.cpp:1381-1392)."""
    K = kf.frame_id.shape[0]
    W2 = wp.sel_kf.shape[0]
    tgt = jnp.where(wp.sel_kf_valid, wp.sel_kf, K)
    pl = poses.reshape(W2, 2, 7)
    kf = kf._replace(
        pose_l=kf.pose_l.at[tgt].set(pl[:, 0], mode="drop"),
        pose_r=kf.pose_r.at[tgt].set(pl[:, 1], mode="drop"),
    )
    L = lm.pos.shape[0]
    ltgt = jnp.where(wp.sel_lm_valid, wp.sel_lm, L)
    lm = lm._replace(pos=lm.pos.at[ltgt].set(points, mode="drop"))

    # recompute p_c of updated landmarks from their (possibly updated) anchor
    anchor = lm.from_kf[jnp.clip(wp.sel_lm, 0)]
    T_anchor = kf.pose_l[jnp.clip(anchor, 0)]
    p_c = lie.se3_apply(jax.vmap(lie.se3_inv)(T_anchor), points)
    lm = lm._replace(pos_c=lm.pos_c.at[ltgt].set(p_c, mode="drop"))
    return kf, lm


def run_window_ba(
    kf: KeyframeState,
    lm: LandmarkState,
    intr0,
    intr1,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 20,
    W2: int = 12,
    Lw: int = 8192,
    O: int = 24576,
    obs_per_lm: int = 0,
):
    """Build, solve, merge. Returns (kf, lm, stats).

    Uses the flat Schur solver — at window size it beats the blocked MXU
    solver (which owns global BA, pipeline/ba_global.py): fewer padded
    obs slots and the [K*L] coupling densification is cheap at K<=24.
    """
    wp = build_window_problem(kf, lm, intr0, intr1, W2=W2, Lw=Lw, O=O,
                              obs_per_lm=obs_per_lm)
    poses, points, stats = ba.solve_ba_schur(
        wp.prob, cam_name=cam_name, huber=huber, max_iters=max_iters)
    kf, lm = merge_window_result(kf, lm, wp, poses, points)
    stats = dict(stats, obs_dropped=wp.obs_dropped)
    return kf, lm, stats
