"""Per-frame tracking: one fused, jitted device step.

Implements the non-keyframe path of the reference's ``next_step``
(/root/reference/src/slam.cpp:1303-1372): project landmarks
(vo_utils.h:48-81), detect + describe the left image, guided 2D-gated
landmark matching (vo_utils.h:83-167), RANSAC PnP localization
(vo_utils.h:171-230), and the constant-velocity motion gate of
``track_camera`` (tracking.h:131-158). The whole thing compiles to a single
XLA program; the host only sees scalars (tracking_ok, inlier count) and the
new pose.

Landmark set handling: the reference iterates the full hash map per frame;
here the L-capacity landmark arrays are projected in one shot and the
in-view subset is compacted to a fixed P slots (newest-first) so the
Hamming matmul stays a fixed [N, P*B] shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..frontend.features import Features, extract_features
from ..geometry import cameras as cam_models
from ..geometry import lie
from ..ops import hamming
from ..solvers import pnp
from ..core.state import LandmarkState


class TrackResult(NamedTuple):
    feats: Features
    match_lm: jnp.ndarray      # [N] int32 global landmark slot or -1
    inlier: jnp.ndarray        # [N] bool (subset of matches)
    had_candidate: jnp.ndarray  # [N] bool: a gated landmark candidate
    #                             existed (even if the ratio test failed) —
    #                             used for duplicate-landmark suppression
    T_w_c: jnp.ndarray         # [7] estimated pose (RANSAC+GN result)
    num_matches: jnp.ndarray   # [] int32
    num_inliers: jnp.ndarray   # [] int32
    motion_err: jnp.ndarray    # [] float32 (gate statistic)
    pnp_ok: jnp.ndarray        # [] bool (enough matches & inliers)


def project_landmarks(lm: LandmarkState, T_w_c, cam_name, intr, width, height,
                      z_threshold):
    """vo_utils.h:48-81 — project all landmarks, mask behind/out-of-image."""
    p_c = lie.se3_apply(lie.se3_inv(T_w_c), lm.pos)
    proj = cam_models.project(cam_name, intr, p_c)
    ok = (
        lm.valid
        & (p_c[:, 2] >= z_threshold)
        & (proj[:, 0] >= 0) & (proj[:, 0] <= width)
        & (proj[:, 1] >= 0) & (proj[:, 1] <= height)
    )
    return proj, ok


@functools.partial(
    jax.jit,
    static_argnames=("cam_name", "num_features", "inview_cap", "width",
                     "height", "num_hypotheses", "min_distance",
                     "rotate_features", "num_octaves"),
)
def track_frame(
    key,
    img_l,
    lm: LandmarkState,
    predicted_pose,   # [7] pose used for projection (current or current*vel)
    gate_pose,        # [7] last frame pose (motion-gate origin)
    vel,              # [7] constant-velocity model
    intr0,            # [8]
    cam_name: str = "ds",
    num_features: int = 1500,
    inview_cap: int = 2048,
    width: int = 752,
    height: int = 480,
    z_threshold: float = 0.1,
    match_max_dist_2d: float = 20.0,
    match_threshold: int = 70,
    match_ratio: float = 1.2,
    pnp_threshold: float = 0.000018,  # 1-cos(atan(3/500))
    num_hypotheses: int = 256,
    min_matches: int = 10,
    quality_level: float = 0.01,
    min_distance: int = 8,
    rotate_features: bool = True,
    num_octaves: int = 1,
    feats: Features = None,
) -> TrackResult:
    """``feats`` overrides the built-in rBRIEF extraction with
    pre-computed Features of the left image — the hook that swaps a
    learned frontend (models/learned_frontend.py) into the matcher while
    the rest of the fused step (projection, gated Hamming matching,
    RANSAC PnP, motion gate) is unchanged (BASELINE configs[4])."""
    if feats is None:
        feats = extract_features(img_l, num_features=num_features,
                                 quality_level=quality_level,
                                 min_distance=min_distance,
                                 rotate_features=rotate_features,
                                 num_octaves=num_octaves)

    # ---- project + compact in-view landmarks (newest-first) ----
    proj, in_view = project_landmarks(
        lm, predicted_pose, cam_name, intr0, width, height, z_threshold
    )
    from ..ops.compact import compact_indices

    sel, sel_valid = compact_indices(in_view, inview_cap, newest_first=True)
    sel = jnp.clip(sel, 0, lm.pos.shape[0] - 1)
    sel_valid = sel_valid & in_view[sel]
    cand_proj = proj[sel]
    cand_pos = lm.pos[sel]

    # ---- guided landmark matching ----
    match_local, m_ok, had_cand = hamming.match_landmarks(
        feats.bits, feats.valid,
        lm.bank_bits[sel], lm.bank_valid[sel],
        feats.corners, cand_proj, sel_valid,
        max_dist_2d=match_max_dist_2d, threshold=match_threshold,
        ratio=match_ratio,
    )
    match_lm = jnp.where(m_ok, sel[jnp.clip(match_local, 0)], -1)
    num_matches = jnp.sum(m_ok)

    # ---- PnP localization ----
    bearings = cam_models.unproject(cam_name, intr0, feats.corners)
    points = cand_pos[jnp.clip(match_local, 0)]
    T_ransac, inlier, num_inl, pnp_valid = pnp.ransac_pnp(
        key, points, bearings, m_ok, pnp_threshold,
        num_hypotheses=num_hypotheses,
    )
    enough = (num_matches >= min_matches) & pnp_valid
    T_w_c = jnp.where(enough, T_ransac, predicted_pose)
    inlier = inlier & enough & m_ok

    # ---- motion-model gate (tracking.h:131-133) ----
    se3_vel = lie.se3_log(lie.se3_mul(lie.se3_inv(gate_pose), T_w_c))
    err = jnp.sum(jnp.abs(se3_vel[:3] - lie.se3_log(vel)[:3]))
    # a non-finite pose/err must read as a FAILED gate (NaN > thr is false)
    err = jnp.where(jnp.isfinite(err), err, jnp.inf)

    return TrackResult(
        feats=feats,
        match_lm=match_lm,
        inlier=inlier,
        had_candidate=had_cand,
        T_w_c=T_w_c,
        num_matches=num_matches,
        num_inliers=jnp.where(enough, num_inl, 0),
        motion_err=err,
        pnp_ok=enough,
    )


@functools.partial(
    jax.jit, static_argnames=("cam_name", "num_hypotheses", "min_matches"))
def retry_localize(
    key,
    res: TrackResult,
    lm: LandmarkState,
    predicted_pose,
    gate_pose,
    vel,
    intr0,
    cam_name: str = "ds",
    pnp_threshold: float = 0.000018,
    num_hypotheses: int = 256,
    min_matches: int = 10,
) -> TrackResult:
    """Redraw the RANSAC localization on an existing match set.

    The reference's track_camera retry loop (tracking.h:90-160) re-runs only
    the randomized RANSAC on the same landmark matches, up to 5 times, when
    the motion gate rejects the pose. Detection/matching are deterministic,
    so re-running the full track_frame would recompute identical features
    just to redraw hypotheses — this redoes only the PnP + gate.
    """
    feats = res.feats
    bearings = cam_models.unproject(cam_name, intr0, feats.corners)
    m_ok = res.match_lm >= 0
    points = lm.pos[jnp.clip(res.match_lm, 0)]
    T_ransac, inlier, num_inl, pnp_valid = pnp.ransac_pnp(
        key, points, bearings, m_ok, pnp_threshold,
        num_hypotheses=num_hypotheses,
    )
    enough = (res.num_matches >= min_matches) & pnp_valid
    T_w_c = jnp.where(enough, T_ransac, predicted_pose)
    inlier = inlier & enough & m_ok

    se3_vel = lie.se3_log(lie.se3_mul(lie.se3_inv(gate_pose), T_w_c))
    err = jnp.sum(jnp.abs(se3_vel[:3] - lie.se3_log(vel)[:3]))
    err = jnp.where(jnp.isfinite(err), err, jnp.inf)
    return res._replace(
        T_w_c=T_w_c,
        inlier=inlier,
        num_inliers=jnp.where(enough, num_inl, 0),
        motion_err=err,
        pnp_ok=enough,
    )
