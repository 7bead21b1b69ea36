"""Loop closure execution: Sim(3)-style correction, essential-graph
optimization, map update.

Host orchestration of the reference's loop-closure path with device calls
for the heavy work:

- ``compute_sim3`` (sim3.h:228-359): harvest 2D-3D correspondences between
  the current keyframe's features and the map points of the loop candidate
  + its covisible neighbors (dedup by landmark and feature), then RANSAC
  PnP; the correction is the SE3 ``sim3 = T_w_cand^-1 * T_w_cur_measured``
  with the ||log||_1 <= 5 sanity gate and bounded retries (stereo fixes
  scale, hence SE3 rather than full Sim3 — same as the reference).
- ``loop_align`` (loop_closure_utils.h:398-415): re-pose the current KF's
  covisible neighbors from the measured relative poses and the corrected
  current pose; stereo pairs follow.
- essential-graph pose optimization (loop_closure_utils.h:446-587) via
  solvers.pose_graph: spanning-tree edges (post-align measurements),
  covisibility edges with weight > essential_threshold (pre-align
  measurements — the reference uses its cached covisible_rel_poses, which
  are refreshed at every BA merge, i.e. pre-align values), and the loop
  edge log(sim3^-1); current KF fixed.
- ``update_stereo_pair`` / ``update_landmark_position``
  (loop_closure_utils.h:594-622): right cams re-derived from left * T_0_1,
  landmarks re-anchored via p_c and from_kf.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import KeyframeState, LandmarkState
from ..geometry import cameras as cam_models
from ..geometry import lie
from ..ops import describe as describe_ops
from ..ops import hamming
from ..ops.compact import compact_indices
from ..solvers import pnp, pose_graph
from . import matching


def _pow2(n: int, lo: int = 16) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


@jax.jit
def _rigid_align_device(pose_l, pose_r, gsel, gvalid, T_cand, sim3,
                        T_cur_pre, T_0_1):
    """Rigid live-group correction as ONE device program.

    Eager-mode se3 math here costs ~10 primitive dispatches per lie op
    through the tunnel — r4 measured the un-jitted align block at ~0.6 s
    per closure vs ~0.05 s for the actual pose-graph solve."""
    T_corr = lie.se3_normalize(lie.se3_mul(
        lie.se3_mul(T_cand, sim3), lie.se3_inv(T_cur_pre)))
    K = pose_l.shape[0]
    moved = jax.vmap(lambda T: lie.se3_mul(T_corr, T))(
        pose_l[jnp.clip(gsel, 0, K - 1)])
    tgt = jnp.where(gvalid, gsel, K)
    pose_l2 = pose_l.at[tgt].set(moved, mode="drop")
    pose_r2 = pose_r.at[tgt].set(
        jax.vmap(lambda T: lie.se3_mul(T, T_0_1))(moved), mode="drop")
    return pose_l2, pose_r2, T_corr


@jax.jit
def corr_apply(T_cand, sim3, T_cur_kf, cur_pose, last_pose):
    """Tracker-side gauge correction (one jitted call for the drivers):
    T_corr = (T_w_cand * sim3) * T_w_cur^-1 applied to the live tracker
    poses. Returns (T_corr @ cur_pose, T_corr @ last_pose)."""
    T_corr = lie.se3_normalize(lie.se3_mul(
        lie.se3_mul(T_cand, sim3), lie.se3_inv(T_cur_kf)))
    return lie.se3_mul(T_corr, cur_pose), lie.se3_mul(T_corr, last_pose)


@functools.partial(jax.jit, donate_argnums=())
def _edge_measurements(poses_pre, ei, ej, sim3, e_loop):
    """Batched log-relative-pose measurements (padded rows are masked by
    edge_valid downstream); row ``e_loop`` carries the loop edge
    log(sim3^-1)."""
    meas = jax.vmap(lambda Ti, Tj: lie.se3_log(
        lie.se3_mul(lie.se3_inv(Ti), Tj)))(poses_pre[ei], poses_pre[ej])
    return meas.at[e_loop].set(lie.se3_log(lie.se3_inv(sim3)))


def _batched_matches(
    kf: KeyframeState,
    cur_bits,
    cur_valid,
    source_slots: Sequence[int],
    cur_slot: int,
    extra=None,
):
    """Match the current descriptors against every source keyframe in ONE
    device dispatch + ONE fetch.

    Returns (slots, m_all [S, N], mp_all [S, N], extra_fetched): per-slot
    match tables and map_points rows as host numpy. ``extra`` is an
    optional pytree of device values to ride along in the same fetch.
    The slot vector is padded to a power of two so only a handful of
    program shapes ever compile.
    """
    slots = [int(s) for s in source_slots if int(s) != int(cur_slot)]
    if not slots:
        return [], None, None, (jax.device_get(extra)
                                if extra is not None else None)
    cap = _pow2(len(slots), lo=4)
    padded = np.asarray(slots + [slots[0]] * (cap - len(slots)), np.int32)
    sl = jnp.asarray(padded)
    m_dev = matching.match_vs_keyframes(cur_bits, cur_valid, kf, sl, 0)
    m_all, mp_all, extra_f = jax.device_get(
        (m_dev, kf.map_points[sl], extra))
    return slots, m_all, mp_all, extra_f


def harvest_correspondences(
    kf: KeyframeState,
    lm: LandmarkState,
    cur_bits,
    cur_valid,
    source_slots: Sequence[int],
    cur_slot: int = -1,
) -> Tuple[np.ndarray, np.ndarray]:
    """(landmark ids, current-feature ids) harvested over source keyframes.

    Mirrors sim3.h:244-301 / tracking.h:283-338: match current descriptors
    against each source KF, then map matched source features to landmarks
    via that KF's map_points; dedupe by landmark and by current feature.
    ``cur_bits/cur_valid`` are the current image's descriptors — a stored
    keyframe's (loop closure) or a live frame's (relocalization).
    """
    slots, m_all, mp_all, _ = _batched_matches(
        kf, cur_bits, cur_valid, source_slots, cur_slot)
    used_landmarks: Set[int] = set()
    used_features: Set[int] = set()
    lms: List[int] = []
    feats: List[int] = []
    for si in range(len(slots)):
        m, mp = m_all[si], mp_all[si]
        for f in np.nonzero((m >= 0) & (mp >= 0))[0]:
            tid, cf = int(mp[f]), int(m[f])
            if tid in used_landmarks or cf in used_features:
                continue
            used_landmarks.add(tid)
            used_features.add(cf)
            lms.append(tid)
            feats.append(cf)
    return np.asarray(lms, np.int64), np.asarray(feats, np.int64)


def compute_sim3(
    kf: KeyframeState,
    lm: LandmarkState,
    cur_slot: int,
    cand_slot: int,
    cand_neighbors: Sequence[int],
    intr0,
    cam_name: str,
    pnp_threshold: float,
    key,
    num_hypotheses: int = 256,
    max_retries: int = 10,
):
    """Returns (ok, sim3 [7]) — sim3 = T_w_cand^-1 * T_w_cur_measured."""
    cur_bits = describe_ops.unpack_bits(kf.desc[cur_slot, 0])
    cur_valid = kf.kp_valid[cur_slot, 0]
    lms, feats = harvest_correspondences(
        kf, lm, cur_bits, cur_valid, [cand_slot, *cand_neighbors],
        cur_slot=cur_slot)
    if len(lms) < 5:
        return False, None

    cap = _pow2(len(lms))
    points = np.zeros((cap, 3), np.float32)
    bearings = np.zeros((cap, 3), np.float32)
    # gather + unproject on device, ONE fetch for both tables
    lms_j = jnp.asarray(np.asarray(lms, np.int32))
    feats_j = jnp.asarray(np.asarray(feats, np.int32))
    pts_h, bear_h = jax.device_get((
        lm.pos[lms_j],
        cam_models.unproject(cam_name, intr0,
                             kf.corners[cur_slot, 0][feats_j])))
    points[:len(lms)] = pts_h
    bearings[:len(lms)] = bear_h
    valid = np.arange(cap) < len(lms)

    T_cand_inv = lie.se3_inv(kf.pose_l[cand_slot])
    kmask = np.zeros(kf.frame_id.shape[0], bool)
    for s in (cand_slot, *cand_neighbors):
        if s != cur_slot:
            kmask[s] = True
    kmask_j = jnp.asarray(kmask)
    for _ in range(max_retries + 1):
        key, k = jax.random.split(key)
        T_wc, inl, n, ok = pnp.ransac_pnp(
            k, jnp.asarray(points), jnp.asarray(bearings), jnp.asarray(valid),
            pnp_threshold, num_hypotheses=num_hypotheses)
        # Guided re-matching + IRLS refinement (ORB-SLAM ComputeSim3's
        # SearchByProjection/optimize rounds): the RANSAC estimate comes
        # from the few harvested pairs and on depth-uniform structure
        # carries a near-exact lateral-translation/yaw ambiguity
        # (delta_t ~= depth * delta_theta reprojects identically);
        # re-matching the WHOLE candidate-side map through the estimate
        # and refining on the larger set collapses the ambiguity.
        T_pre = T_wc
        for _ in range(2):
            T_wc, _n_guided = _guided_refine_device(
                kf, lm, jnp.asarray(cur_slot, jnp.int32), kmask_j,
                T_wc, intr0, cam_name=cam_name)
        # arbiter: the refine itself can be dragged by aliased guided
        # matches. Count gated matches of the candidate-side map through
        # BOTH poses (gn_iters=0 = match-count only, no update) and keep
        # the better explainer — the same statistic verify_loop gates on.
        _, n_ref = _guided_refine_device(
            kf, lm, jnp.asarray(cur_slot, jnp.int32), kmask_j,
            T_wc, intr0, cam_name=cam_name, gn_iters=0)
        _, n_pre = _guided_refine_device(
            kf, lm, jnp.asarray(cur_slot, jnp.int32), kmask_j,
            T_pre, intr0, cam_name=cam_name, gn_iters=0)
        # the whole attempt (RANSAC + refines + arbiter + sanity gate)
        # stays on device; ONE fetch decides accept/retry
        T_wc = jnp.where(n_pre > n_ref, T_pre, T_wc)
        sim3 = lie.se3_mul(T_cand_inv, T_wc)
        trans_l1 = jnp.sum(jnp.abs(lie.se3_log(sim3)[:3]))
        tl = jax.device_get(trans_l1)
        if float(tl) <= 5.0:
            return True, sim3
    return False, None


def compute_sim3_horn(
    kf: KeyframeState,
    lm: LandmarkState,
    cur_slot: int,
    cand_slot: int,
    cand_neighbors: Sequence[int],
    key,
    threshold_3d: float = 0.3,
    num_hypotheses: int = 128,
    max_scale_log: float = 0.1,
):
    """Closed-form Sim(3) loop correction from 3D-3D correspondences.

    The reference's compute_sim3_1 (sim3.h:48-141): matched features give
    pairs (current-side landmark, candidate-side landmark) — the same
    physical point in the drifted and old map frames — and a Horn/RANSAC
    alignment recovers the similarity mapping drifted world to old world.
    Stereo observes scale, so a recovered scale far from 1 marks a bad
    closure (an extra gate the SE3 PnP path cannot express); the accepted
    correction is returned as the SE3 loop edge
    ``sim3 = T_w_cand^-1 * (S o T_w_cur_drift)``.

    Returns (ok, sim3 [7], scale).
    """
    from ..geometry import sim3 as sim3_mod

    cur_bits = describe_ops.unpack_bits(kf.desc[cur_slot, 0])
    cur_valid = kf.kp_valid[cur_slot, 0]

    # 3D-3D pairs: current feature f -> its own landmark (drifted world)
    # and the candidate-side landmark it matched (old world)
    slots, m_all, mp_all, mp_cur = _batched_matches(
        kf, cur_bits, cur_valid, (cand_slot, *cand_neighbors), cur_slot,
        extra=kf.map_points[cur_slot])
    src_ids: List[int] = []
    dst_ids: List[int] = []
    used_dst: Set[int] = set()
    for si in range(len(slots)):
        # m[f] = current-feature index matched by candidate feature f
        m, mp_s = m_all[si], mp_all[si]
        for f in np.nonzero((m >= 0) & (mp_s >= 0))[0]:
            cf = int(m[f])
            sid = int(mp_cur[cf])   # current-side landmark (drifted world)
            tid = int(mp_s[f])      # candidate-side landmark (old world)
            if sid < 0 or tid == sid or tid in used_dst:
                continue
            used_dst.add(tid)
            src_ids.append(sid)
            dst_ids.append(tid)
    if len(src_ids) < 5:
        return False, None, 0.0

    cap = _pow2(len(src_ids))
    src = np.zeros((cap, 3), np.float32)
    dst = np.zeros((cap, 3), np.float32)
    src_h, dst_h = jax.device_get((
        lm.pos[jnp.asarray(np.asarray(src_ids, np.int32))],
        lm.pos[jnp.asarray(np.asarray(dst_ids, np.int32))]))
    src[:len(src_ids)] = src_h
    dst[:len(dst_ids)] = dst_h
    valid = np.arange(cap) < len(src_ids)

    S, inl, n_inl, ok = sim3_mod.ransac_sim3(
        key, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid),
        threshold=threshold_3d, num_hypotheses=num_hypotheses)

    # corrected current pose: S o T_w_cur (rigid action of the similarity);
    # the whole tail (compose + sanity gate) stays on device, ONE fetch
    T_cur = kf.pose_l[cur_slot]
    R_cur = lie.quat_to_matrix(T_cur[3:7])
    R_new = S.R @ R_cur
    t_new = S.s * (S.R @ T_cur[:3]) + S.t
    q_new = lie.matrix_to_quat(R_new)
    T_cur_corr = jnp.concatenate([t_new, q_new]).astype(jnp.float32)
    sim3 = lie.se3_mul(lie.se3_inv(kf.pose_l[cand_slot]), T_cur_corr)
    trans_l1 = jnp.sum(jnp.abs(lie.se3_log(sim3)[:3]))
    ok_h, scale, tl, sim3_h = jax.device_get((ok, S.s, trans_l1, sim3))
    scale = float(scale)
    if not bool(ok_h):
        return False, None, 0.0
    if abs(np.log(scale)) > max_scale_log:
        return False, None, scale  # scale drift in stereo = bad closure
    if float(tl) > 5.0:  # same sanity gate as the PnP path (sim3.h:340)
        return False, None, scale
    return True, jnp.asarray(sim3_h), scale


@functools.partial(
    jax.jit, static_argnames=("cam_name", "cap", "gn_iters"))
def _guided_refine_device(
    kf: KeyframeState,
    lm: LandmarkState,
    cur_slot,           # [] int32
    kf_src_mask,        # [K] bool: candidate + its covisible neighbors
    T_cur,              # [7] current estimate of the corrected pose
    intr0,
    cam_name: str,
    z_threshold: float = 0.1,
    px_gate: float = 15.0,
    threshold: int = 70,
    ratio: float = 1.2,
    cap: int = 1024,
    gn_iters: int = 8,
):
    """One guided-matching + IRLS-refine round for the loop correction.

    The RANSAC sim3 is estimated from the few harvested correspondences
    and carries the depth-uniform lateral/yaw ambiguity (see
    compute_sim3); ORB-SLAM's ComputeSim3 closes that gap by projecting
    the candidate side's map points through the current estimate,
    re-matching by descriptor in a 2D radius, and re-optimizing — this is
    that round, fused on device. Returns (T_cur_refined [7], n_matches).
    """
    from ..solvers.pnp import _gn_refine

    L = lm.pos.shape[0]
    mp = kf.map_points
    src = kf_src_mask[:, None] & (mp >= 0)
    lm_mask = jnp.zeros((L + 1,), bool).at[
        jnp.where(src, mp, L)].set(True, mode="drop")[:L]
    lm_mask = lm_mask & lm.valid

    p_c = lie.se3_apply(lie.se3_inv(T_cur), lm.pos)
    proj = cam_models.project(cam_name, intr0, p_c)
    ok = lm_mask & (p_c[:, 2] >= z_threshold)
    sel, sel_valid = compact_indices(ok, cap)
    sel = jnp.clip(sel, 0, L - 1)
    sel_valid = sel_valid & ok[sel]

    cur_bits = describe_ops.unpack_bits(kf.desc[cur_slot, 0])
    cur_valid = kf.kp_valid[cur_slot, 0]
    corners = kf.corners[cur_slot, 0]
    m_lm, m_ok, _ = hamming.match_landmarks(
        cur_bits, cur_valid,
        lm.bank_bits[sel], lm.bank_valid[sel],
        corners, proj[sel], sel_valid,
        max_dist_2d=px_gate, threshold=threshold, ratio=ratio,
    )
    points = lm.pos[sel[jnp.clip(m_lm, 0)]]              # [N, 3]
    bearings = cam_models.unproject(cam_name, intr0, corners)
    w = m_ok.astype(points.dtype)
    R0 = lie.quat_to_matrix(lie.se3_q(lie.se3_inv(T_cur)))
    t0 = lie.se3_t(lie.se3_inv(T_cur))
    T_cw = _gn_refine(R0, t0, points, bearings, w, gn_iters)
    T_ref = lie.se3_inv(T_cw)
    n = jnp.sum(m_ok)
    # keep the prior estimate if matching found (almost) nothing
    good = (n >= 10) & jnp.all(jnp.isfinite(T_ref))
    return jnp.where(good, T_ref, T_cur), n


@functools.partial(
    jax.jit,
    static_argnames=("cam_name", "width", "height", "cap"))
def _verify_loop_device(
    kf: KeyframeState,
    lm: LandmarkState,
    cur_slot,           # [] int32
    kf_src_mask,        # [K] bool: candidate + its covisible neighbors
    T_cur_aligned,      # [7] proposed corrected pose of the current KF
    intr0,
    cam_name: str,
    width: int,
    height: int,
    z_threshold: float = 0.1,
    px_gate: float = 15.0,
    threshold: int = 70,
    ratio: float = 1.2,
    cap: int = 1024,
):
    """Count gated descriptor matches of candidate-side map points
    projected through the proposed loop correction.

    Returns (num_inliers, num_visible): how many of the candidate side's
    landmarks, projected into the current keyframe via ``T_cur_aligned``,
    find a descriptor-consistent feature within ``px_gate`` pixels — and how
    many were in view at all. A true closure re-observes the old structure,
    so a large fraction matches; a perceptually-aliased false closure only
    explains the few correspondences RANSAC was fed, and the rest of the old
    map projects onto unrelated texture.
    """
    L = lm.pos.shape[0]
    mp = kf.map_points                                   # [K, N]
    src = kf_src_mask[:, None] & (mp >= 0)
    lm_mask = jnp.zeros((L + 1,), bool).at[
        jnp.where(src, mp, L)].set(True, mode="drop")[:L]
    lm_mask = lm_mask & lm.valid

    p_c = lie.se3_apply(lie.se3_inv(T_cur_aligned), lm.pos)
    proj = cam_models.project(cam_name, intr0, p_c)
    ok = (
        lm_mask
        & (p_c[:, 2] >= z_threshold)
        & (proj[:, 0] >= 0) & (proj[:, 0] <= width)
        & (proj[:, 1] >= 0) & (proj[:, 1] <= height)
    )
    sel, sel_valid = compact_indices(ok, cap)
    sel = jnp.clip(sel, 0, L - 1)
    sel_valid = sel_valid & ok[sel]

    cur_bits = describe_ops.unpack_bits(kf.desc[cur_slot, 0])
    cur_valid = kf.kp_valid[cur_slot, 0]
    corners = kf.corners[cur_slot, 0]
    _, m_ok, _ = hamming.match_landmarks(
        cur_bits, cur_valid,
        lm.bank_bits[sel], lm.bank_valid[sel],
        corners, proj[sel], sel_valid,
        max_dist_2d=px_gate, threshold=threshold, ratio=ratio,
    )
    # num_visible is the DENOMINATOR of the caller's matched/visible ratio
    # gate; when the source group's visible landmarks outnumber the current
    # keyframe's features (a panorama-like frustum seen by several source
    # KFs), the achievable maximum is the feature budget, not the landmark
    # count — normalize by the binding constraint so the ratio stays a
    # fraction of what a perfect closure COULD explain.
    n_vis = jnp.minimum(jnp.sum(sel_valid), jnp.sum(cur_valid))
    return jnp.sum(m_ok), n_vis


def verify_loop(
    kf: KeyframeState,
    lm: LandmarkState,
    cur_slot: int,
    cand_slot: int,
    cand_neighbors: Sequence[int],
    sim3,
    intr0,
    cam_name: str,
    width: int,
    height: int,
    px_gate: float = 15.0,
    threshold: int = 70,
    ratio: float = 1.2,
) -> Tuple[int, int]:
    """Geometric consistency check on a proposed loop closure.

    The reference accepts any compute_sim3 solution — its landmark-fusion
    verification hook is an empty stub (loop_closure_utils.h:424-428) and
    perceptually-aliased candidates wreck the map. This projects the
    candidate side's map points through the proposed correction
    ``T_w_cand * sim3`` and counts independent reprojection-consistent
    descriptor matches (ORB-SLAM-style fused-point consistency).
    Returns (num_inliers, num_visible); the caller applies the acceptance
    thresholds.
    """
    kmask = np.zeros(kf.frame_id.shape[0], bool)
    for s in (cand_slot, *cand_neighbors):
        if s != cur_slot:
            kmask[s] = True
    T_aligned = lie.se3_mul(kf.pose_l[cand_slot], sim3)
    n_inl, n_vis = _verify_loop_device(
        kf, lm, jnp.asarray(cur_slot, jnp.int32), jnp.asarray(kmask),
        T_aligned, intr0, cam_name=cam_name, width=width, height=height,
        px_gate=px_gate, threshold=threshold, ratio=ratio)
    return int(n_inl), int(n_vis)


@jax.jit
def _apply_poses(kf: KeyframeState, lm: LandmarkState, new_left, T_0_1):
    """Write optimized left poses; rederive right cams and landmarks."""
    kf = kf._replace(
        pose_l=jnp.where(kf.valid[:, None], new_left, kf.pose_l))
    kf = kf._replace(
        pose_r=jnp.where(kf.valid[:, None],
                         jax.vmap(lambda T: lie.se3_mul(T, T_0_1))(kf.pose_l),
                         kf.pose_r))
    anchor = jnp.clip(lm.from_kf, 0)
    p = jax.vmap(lie.se3_apply)(kf.pose_l[anchor], lm.pos_c)
    lm = lm._replace(pos=jnp.where(lm.valid[:, None], p, lm.pos))
    return kf, lm


def loop_closure(
    kf: KeyframeState,
    lm: LandmarkState,
    cur_slot: int,
    cand_slot: int,
    sim3,
    covis: Dict[int, Dict[int, int]],
    T_0_1,
    essential_threshold: int = 30,
    fixed_current: bool = True,
    huber: float = 1.0,
    max_iters: int = 20,
    live_slots=None,
):
    """Rigid live-side correction + pose graph + landmark update.
    Returns (kf, lm, stats).

    The reference's loop flow (loop_closure_utils.h:398-415 loop_align +
    :430-530 pose-graph) corrects the CURRENT keyframe onto the old map:
    the old map is the datum, the live drift is the error. Here:

    1. The live group — ``cur_slot``, its covisible neighbors, plus any
       ``live_slots`` the caller knows about (the streaming driver passes
       every keyframe newer than ``cur_slot``; tracking has moved past the
       closure by up to a poll quantum) — is RIGIDLY moved by
       ``T_corr = (T_w_cand * sim3) * T_w_cur^-1``, landing ``cur_slot``
       exactly on its sim3-corrected pose. The caller is responsible for
       applying the same ``T_corr`` to any tracker state that lives in
       the same gauge (see StreamingSLAM._handle_keyframe).
    2. The essential pose graph then distributes the gauge disagreement
       over the middle of the chain: ALL odometry/covisibility edges are
       measured from the PRE-correction poses (relative measurements are
       gauge-invariant, so intra-live and intra-old edges keep zero
       residual while mixed edges carry the full disagreement), the live
       group and the candidate are the two fixed anchors, and the solver
       bends the keyframes between them.

    This direction matters: dragging the OLD map onto the live gauge (the
    previous behaviour here) bends the datum — on a map with organic
    drift it makes ATE WORSE because the accumulated error is pulled into
    the historically-correct ring instead of out of the drifted tail.
    """
    import time as _time

    t_stats = {}
    t0 = _time.perf_counter()
    n_kf = int(kf.next_slot)
    # pre-align snapshot for the measurements: the functional state makes
    # this free — keep the device array handle, no d2h sync at all
    poses_pre = kf.pose_l
    t_stats["t_snapshot_s"] = _time.perf_counter() - t0

    # ---- rigid live-side alignment (one jitted program) ----
    t0 = _time.perf_counter()
    group = {int(cur_slot)}
    group.update(int(s) for s in covis.get(cur_slot, {}))
    if live_slots is not None:
        group.update(int(s) for s in live_slots)
    group.discard(int(cand_slot))
    group.difference_update(int(s) for s in covis.get(cand_slot, {}))
    group = sorted(s for s in group if 0 <= s < n_kf)

    gcap = _pow2(len(group), lo=32)
    gsel = jnp.asarray(np.pad(group, (0, gcap - len(group))).astype(
        np.int32))
    gvalid = jnp.asarray(np.arange(gcap) < len(group))
    pose_l, pose_r, _T_corr = _rigid_align_device(
        kf.pose_l, kf.pose_r, gsel, gvalid, kf.pose_l[cand_slot],
        jnp.asarray(sim3), jnp.asarray(poses_pre[cur_slot]), T_0_1)
    kf = kf._replace(pose_l=pose_l, pose_r=pose_r)
    t_stats["t_align_s"] = _time.perf_counter() - t0

    # ---- assemble the essential graph (all measurements pre-align) ----
    t0 = _time.perf_counter()
    parent = np.asarray(kf.parent)
    edges_i, edges_j = [], []

    for i in range(n_kf):
        p = int(parent[i])
        if p < 0:
            continue
        if covis.get(i, {}).get(p, 0) > essential_threshold:
            continue  # covered by the essential edge below
        edges_i.append(i)
        edges_j.append(p)
    for i in range(n_kf):
        for j, w in covis.get(i, {}).items():
            if w > essential_threshold and i < j < n_kf:
                edges_i.append(i)
                edges_j.append(j)
    # loop edge: log(sim3^-1) between current and candidate (last row)
    edges_i.append(int(cur_slot))
    edges_j.append(int(cand_slot))

    E = len(edges_i)
    K = _pow2(n_kf)
    # coarse padding bucket: successive closures land a few edges apart,
    # and a fresh E_pad shape recompiles the whole pose-graph solver
    # (~0.5 s) — lo=256 makes most realistic graphs share one program
    E_pad = _pow2(E, lo=256)
    ei = np.pad(np.asarray(edges_i, np.int32), (0, E_pad - E))
    ej = np.pad(np.asarray(edges_j, np.int32), (0, E_pad - E))
    # all edge measurements in ONE jitted device call, result stays on
    # device (a per-edge log_rel loop costs 2 tunnel round-trips per edge;
    # even the batched-but-eager form paid ~30 primitive dispatches)
    meas = _edge_measurements(jnp.asarray(poses_pre), jnp.asarray(ei),
                              jnp.asarray(ej), jnp.asarray(sim3),
                              jnp.asarray(E - 1, jnp.int32))
    # anchors: the (corrected) live group and the candidate; the chain
    # between them absorbs the disagreement
    fixed = np.arange(K) >= n_kf
    fixed[cand_slot] = True
    for s in group:
        fixed[s] = True
    if not fixed_current:
        fixed[cur_slot] = False
    cap = kf.pose_l.shape[0]
    take = min(K, cap)
    pose_pad = kf.pose_l[:take]
    if K > take:
        pose_pad = jnp.concatenate([
            pose_pad, jnp.tile(lie.identity_pose(pose_pad.dtype),
                               (K - take, 1))])
    prob = pose_graph.PoseGraphProblem(
        poses=pose_pad,
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_meas=meas,
        edge_valid=jnp.asarray(np.arange(E_pad) < E),
    )
    t_stats["t_graph_s"] = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    if K <= 1024:
        opt_poses, stats = pose_graph.solve_pose_graph(
            prob, huber=huber, max_iters=max_iters)
    else:
        # dense (6K)^2 assembly stops scaling; matrix-free CG is O(K+E)
        from ..solvers.pose_graph_cg import solve_pose_graph_cg

        opt_poses, stats = solve_pose_graph_cg(
            prob, huber=huber, max_iters=max_iters)
    t_stats["t_solve_s"] = _time.perf_counter() - t0

    # scatter back + stereo + landmark updates (device-side; rows >= n_kf
    # keep their existing values)
    t0 = _time.perf_counter()
    ids = jnp.arange(opt_poses.shape[0])
    new_left = kf.pose_l.at[jnp.where(ids < n_kf, ids, cap)].set(
        opt_poses, mode="drop")
    kf, lm = _apply_poses(kf, lm, new_left, T_0_1)
    jax.block_until_ready(kf.pose_l)
    t_stats["t_apply_s"] = _time.perf_counter() - t0
    stats = dict(stats, **{k: round(v, 3) for k, v in t_stats.items()})
    return kf, lm, stats
