"""Keyframe insertion: stereo matching, triangulation, map growth.

Implements the keyframe path of the reference's ``next_step``
(/root/reference/src/slam.cpp:1091-1302) as pure functional updates on the
fixed-capacity state:

- stereo matching + essential-matrix epipolar inlier filter
  (matching_utils.h:56-88, threshold 1e-3, slam.cpp:1147-1148);
- ``add_new_landmarks`` (vo_utils.h:232-317): attach observations of
  tracked inliers (both cams when the left feature also stereo-matched),
  triangulate remaining stereo inliers into new landmarks with anchor
  ``p_c``/``from_kf``;
- covisibility counting for ``construct_visibility_graph``
  (loop_closure_utils.h:52-96);
- ``remove_old_keyframes`` (vo_utils.h:319-365): deactivate evicted
  keyframes, strip their windowed observations, deactivate orphaned
  landmarks.

All updates are scatters with masks — duplicate-landmark matches collapse to
one observation per (landmark, camera), mirroring the reference's map
``emplace`` semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..frontend.features import Features
from ..geometry import cameras as cam_models
from ..geometry import lie
from ..geometry.triangulate import triangulate_midpoint
from ..ops import compact
from ..ops import describe as describe_ops
from ..ops import hamming
from ..core.state import KeyframeState, LandmarkState


def essential_from_pose(T_0_1):
    """E = skew(normalize(t)) @ R (matching_utils.h:56-62)."""
    t = lie.se3_t(T_0_1)
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    R = lie.quat_to_matrix(lie.se3_q(T_0_1))
    return lie.hat(t) @ R


@functools.partial(jax.jit, static_argnames=("cam_name",))
def stereo_match(
    feats_l: Features,
    feats_r: Features,
    T_0_1,
    intr0,
    intr1,
    cam_name: str = "ds",
    threshold=70,
    ratio: float = 1.2,
    epipolar_threshold: float = 1e-3,
):
    """Mutual descriptor matches + epipolar filter.

    Returns (match_r [N] int32 right index or -1, inlier [N] bool).
    """
    mj, acc = hamming.match_descriptors(
        feats_l.bits, feats_r.bits, feats_l.valid, feats_r.valid,
        threshold=threshold, ratio=ratio,
    )
    E = essential_from_pose(T_0_1)
    f0 = cam_models.unproject(cam_name, intr0, feats_l.corners)      # [N, 3]
    f1 = cam_models.unproject(cam_name, intr1, feats_r.corners)      # [N, 3]
    f1m = f1[jnp.clip(mj, 0)]
    err = jnp.abs(jnp.einsum("ni,ij,nj->n", f0, E, f1m))
    inlier = acc & (err <= epipolar_threshold)
    return jnp.where(inlier, mj, -1), inlier


def _first_free(obs_kf_rows):
    """First slot with obs_kf < 0 per row. [R, M] -> [R]."""
    return jnp.argmax(obs_kf_rows < 0, axis=-1).astype(jnp.int32)


def _scatter_obs(kf_tab, cam_tab, feat_tab, rows, kf_val, cam_val, feat_val,
                 mask):
    """Append one observation per row (at its first free slot) where mask.

    Masked-out entries get an out-of-bounds row and are dropped by the
    scatter (mode='drop'), so they can never clobber real updates.
    Duplicate rows collapse to a single write, mirroring the reference's
    map-emplace dedupe. Rows whose observation table is already full are
    dropped too (argmax over an all-False mask would otherwise alias
    column 0 and clobber the oldest observation).
    """
    L = kf_tab.shape[0]
    row_tab = kf_tab[jnp.clip(rows, 0)]
    free = _first_free(row_tab)
    has_free = jnp.any(row_tab < 0, axis=-1)
    tgt = jnp.where(mask & has_free, rows, L)  # OOB -> dropped
    kf_tab = kf_tab.at[tgt, free].set(kf_val, mode="drop")
    cam_tab = cam_tab.at[tgt, free].set(cam_val, mode="drop")
    feat_tab = feat_tab.at[tgt, free].set(feat_val, mode="drop")
    return kf_tab, cam_tab, feat_tab


def _bank_add(lm: LandmarkState, rows, bits, mask):
    """Round-robin insert descriptors into landmark banks where mask."""
    L, B = lm.bank_bits.shape[:2]
    tgt = jnp.where(mask, rows, L)  # OOB -> dropped
    cursor = lm.bank_next[jnp.clip(rows, 0)] % B
    bank_bits = lm.bank_bits.at[tgt, cursor].set(bits, mode="drop")
    bank_valid = lm.bank_valid.at[tgt, cursor].set(True, mode="drop")
    bank_next = lm.bank_next.at[tgt].add(1, mode="drop")
    return lm._replace(bank_bits=bank_bits, bank_valid=bank_valid,
                       bank_next=bank_next)


class KeyframeResult(NamedTuple):
    kf: KeyframeState
    lm: LandmarkState
    slot: jnp.ndarray          # [] int32 new KF slot
    covis_weight: jnp.ndarray  # [K] int32 shared-landmark counts vs left cams
    num_new: jnp.ndarray       # [] int32 triangulated landmarks


@functools.partial(jax.jit, static_argnames=("cam_name",))
def insert_keyframe(
    kf: KeyframeState,
    lm: LandmarkState,
    frame_id,
    parent_slot,
    T_w_c,                 # [7] left pose
    T_0_1,                 # [7] stereo extrinsic
    feats_l: Features,
    feats_r: Features,
    stereo_j,              # [N] right idx per left feature (-1)
    stereo_inlier,         # [N] bool
    match_lm,              # [N] landmark slot per left feature (-1)
    lm_inlier,             # [N] bool localization inliers
    intr0,
    intr1,
    cam_name: str = "ds",
    enabled=True,          # scalar bool: False = no-op (for vmapped
                           # multi-sequence batches where only some
                           # sequences take a keyframe this step)
    suppress_new=None,     # [N] bool: don't triangulate these features
                           # (duplicate-landmark suppression; the reference
                           # triangulates every unmatched stereo inlier,
                           # creating near-duplicate landmarks that erode
                           # the ratio test)
) -> KeyframeResult:
    N = feats_l.corners.shape[0]
    Lmax = lm.pos.shape[0]
    enabled = jnp.asarray(enabled)
    Kcap = kf.frame_id.shape[0]
    slot = jnp.where(enabled, kf.next_slot, Kcap)  # OOB -> writes dropped

    # ---------------- write keyframe record ----------------
    T_w_c_r = lie.se3_mul(T_w_c, T_0_1)
    corners = jnp.stack([feats_l.corners, feats_r.corners])     # [2, N, 2]
    desc = jnp.stack([describe_ops.pack_bits(feats_l.bits),
                      describe_ops.pack_bits(feats_r.bits)])    # [2, N, 32]
    kp_valid = jnp.stack([feats_l.valid, feats_r.valid])
    kf = kf._replace(
        frame_id=kf.frame_id.at[slot].set(frame_id.astype(jnp.int32),
                                          mode="drop"),
        pose_l=kf.pose_l.at[slot].set(T_w_c, mode="drop"),
        pose_r=kf.pose_r.at[slot].set(T_w_c_r, mode="drop"),
        valid=kf.valid.at[slot].set(True, mode="drop"),
        active=kf.active.at[slot].set(True, mode="drop"),
        parent=kf.parent.at[slot].set(parent_slot, mode="drop"),
        corners=kf.corners.at[slot].set(corners, mode="drop"),
        desc=kf.desc.at[slot].set(desc, mode="drop"),
        kp_valid=kf.kp_valid.at[slot].set(kp_valid, mode="drop"),
        next_slot=kf.next_slot + enabled.astype(jnp.int32),
    )

    # ------------- attach observations of tracked inliers -------------
    # dedupe: keep ONE canonical feature per landmark (the lowest-index
    # match). Every consumer — obs/all_obs tables, descriptor bank,
    # map_points, covisibility — uses the same canonical feature, so
    # cull_landmarks can clear map_points cells by walking all_obs.
    feat_ids = jnp.arange(N, dtype=jnp.int32)
    matched = lm_inlier & (match_lm >= 0) & enabled
    first_feat = jnp.full((Lmax + 1,), N, jnp.int32).at[
        jnp.where(matched, match_lm, Lmax)].min(feat_ids, mode="drop")
    tracked = matched & (feat_ids == first_feat[jnp.clip(match_lm, 0)])
    rows = jnp.where(tracked, match_lm, 0)

    lm_obs = _scatter_obs(lm.obs_kf, lm.obs_cam, lm.obs_feat,
                          rows, slot, 0, feat_ids, tracked)
    lm_all = _scatter_obs(lm.all_kf, lm.all_cam, lm.all_feat,
                          rows, slot, 0, feat_ids, tracked)
    lm = lm._replace(obs_kf=lm_obs[0], obs_cam=lm_obs[1], obs_feat=lm_obs[2],
                     all_kf=lm_all[0], all_cam=lm_all[1], all_feat=lm_all[2])
    lm = _bank_add(lm, rows, feats_l.bits, tracked)

    # right-cam observation when the left feature also stereo-matched
    tracked_r = tracked & stereo_inlier & (stereo_j >= 0)
    feat_r = jnp.where(tracked_r, stereo_j, 0)
    lm_obs = _scatter_obs(lm.obs_kf, lm.obs_cam, lm.obs_feat,
                          rows, slot, 1, feat_r, tracked_r)
    lm_all = _scatter_obs(lm.all_kf, lm.all_cam, lm.all_feat,
                          rows, slot, 1, feat_r, tracked_r)
    lm = lm._replace(obs_kf=lm_obs[0], obs_cam=lm_obs[1], obs_feat=lm_obs[2],
                     all_kf=lm_all[0], all_cam=lm_all[1], all_feat=lm_all[2])
    lm = _bank_add(lm, rows, feats_r.bits[jnp.clip(stereo_j, 0)], tracked_r)
    Lcap = lm.active.shape[0]
    lm = lm._replace(active=lm.active.at[
        jnp.where(tracked, rows, Lcap)].set(True, mode="drop"))

    # ------------------- triangulate new landmarks -------------------
    is_new = (stereo_inlier & (stereo_j >= 0) & ~tracked & feats_l.valid
              & enabled)
    if suppress_new is not None:
        is_new = is_new & ~suppress_new
    f0 = cam_models.unproject(cam_name, intr0, feats_l.corners)
    f1 = cam_models.unproject(cam_name, intr1,
                              feats_r.corners[jnp.clip(stereo_j, 0)])
    p_c, tri_ok = triangulate_midpoint(f0, f1, T_0_1)
    # fold triangulation validity in BEFORE slot assignment so degenerate
    # stereo pairs never consume landmark capacity
    is_new = is_new & tri_ok
    # free-list allocation: new landmarks take the lowest ~valid slots, so
    # slots released by cull_landmarks are reused instead of the map hitting
    # a hard cliff at Lmax (the reference's hash map is unbounded,
    # common_types.h:256-262; fixed-capacity state needs recycling instead)
    free_idx, free_ok = compact.compact_indices(~lm.valid, N)
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    rank_c = jnp.clip(rank, 0, N - 1)
    can_store = is_new & free_ok[rank_c]
    new_slots = jnp.where(can_store, free_idx[rank_c], Lmax)
    nrows = jnp.where(can_store, new_slots, 0)
    p_w = lie.se3_apply(T_w_c, p_c)

    m = can_store
    tgt = jnp.where(m, nrows, Lmax)  # OOB -> dropped
    lm = lm._replace(
        pos=lm.pos.at[tgt].set(p_w, mode="drop"),
        pos_c=lm.pos_c.at[tgt].set(p_c, mode="drop"),
        from_kf=lm.from_kf.at[tgt].set(slot, mode="drop"),
        valid=lm.valid.at[tgt].set(True, mode="drop"),
        active=lm.active.at[tgt].set(True, mode="drop"),
    )
    lm_obs = _scatter_obs(lm.obs_kf, lm.obs_cam, lm.obs_feat,
                          nrows, slot, 0, feat_ids, m)
    lm_all = _scatter_obs(lm.all_kf, lm.all_cam, lm.all_feat,
                          nrows, slot, 0, feat_ids, m)
    lm = lm._replace(obs_kf=lm_obs[0], obs_cam=lm_obs[1], obs_feat=lm_obs[2],
                     all_kf=lm_all[0], all_cam=lm_all[1], all_feat=lm_all[2])
    lm_obs = _scatter_obs(lm.obs_kf, lm.obs_cam, lm.obs_feat,
                          nrows, slot, 1, jnp.where(m, stereo_j, 0), m)
    lm_all = _scatter_obs(lm.all_kf, lm.all_cam, lm.all_feat,
                          nrows, slot, 1, jnp.where(m, stereo_j, 0), m)
    lm = lm._replace(obs_kf=lm_obs[0], obs_cam=lm_obs[1], obs_feat=lm_obs[2],
                     all_kf=lm_all[0], all_cam=lm_all[1], all_feat=lm_all[2])
    lm = _bank_add(lm, nrows, feats_l.bits, m)
    lm = _bank_add(lm, nrows, feats_r.bits[jnp.clip(stereo_j, 0)], m)
    num_new = jnp.sum(m)
    # next_slot is the allocation high-water mark (slots below it may have
    # been culled and re-used; validity is always lm.valid, next_slot only
    # bounds the id range for consumers that scan prefixes)
    hw = jnp.max(jnp.where(m, new_slots, -1)) + 1
    lm = lm._replace(
        next_slot=jnp.maximum(lm.next_slot, hw).astype(jnp.int32))

    # ------------------- per-feature landmark ids -------------------
    # canonical (see dedupe above): ONE map_points cell per landmark,
    # always backed by an all_obs entry, so cull_landmarks' scatter-based
    # clearing reaches every cell.
    mp = jnp.full((N,), -1, jnp.int32)
    mp = jnp.where(tracked, match_lm, mp)
    mp = jnp.where(m, new_slots, mp)
    kf = kf._replace(map_points=kf.map_points.at[slot].set(mp, mode="drop"))

    # ------------------- covisibility counting -------------------
    # landmarks of this KF: their all_obs entries at left cams of other KFs
    lm_ids = jnp.where(mp >= 0, mp, 0)
    lm_mask = mp >= 0
    akf = lm.all_kf[lm_ids]        # [N, M2]
    acam = lm.all_cam[lm_ids]
    contrib = (akf >= 0) & (acam == 0) & (akf != slot) & lm_mask[:, None]
    Kmax = kf.frame_id.shape[0]
    covis = jax.ops.segment_sum(
        contrib.reshape(-1).astype(jnp.int32),
        jnp.clip(akf.reshape(-1), 0),
        num_segments=Kmax,
    )
    return KeyframeResult(kf=kf, lm=lm, slot=slot, covis_weight=covis,
                          num_new=num_new)


@functools.partial(jax.jit, static_argnames=("max_evict",))
def deactivate_keyframes(kf: KeyframeState, lm: LandmarkState, deact_mask,
                         max_evict: int = 16):
    """remove_old_keyframes (vo_utils.h:319-365) device part.

    deact_mask [K] bool: keyframes leaving the window. Their windowed
    observations are stripped; landmarks without remaining windowed obs are
    deactivated, others activated.

    ``max_evict`` bounds how many keyframes can leave per call: the obs
    strip compares obs_kf against the (up to max_evict) evicted slot ids
    instead of gathering deact_mask at every obs cell — a [L*M]-index
    gather from a small table costs ~14 ms on TPU vs ~1.5 ms for the
    compare (see tools/profile_kf_branch.py). Window eviction slides by at
    most one keyframe per insert, so 16 is generous; callers with
    arbitrary-size masks pass max_evict >= K to get the exact gather.
    """
    K = deact_mask.shape[0]
    kf = kf._replace(active=kf.active & ~deact_mask)
    if max_evict >= K:
        obs_gone = (lm.obs_kf >= 0) & deact_mask[jnp.clip(lm.obs_kf, 0)]
    else:
        ids = lax.top_k(
            jnp.where(deact_mask, jnp.arange(K, dtype=jnp.int32), -1),
            max_evict)[0]                       # [-1 padded]
        obs_gone = (lm.obs_kf >= 0) & jnp.any(
            lm.obs_kf[..., None] == ids, axis=-1)
    obs_kf = jnp.where(obs_gone, -1, lm.obs_kf)
    has_obs = jnp.any(obs_kf >= 0, axis=-1)
    lm = lm._replace(obs_kf=obs_kf, active=lm.valid & has_obs)
    return kf, lm


@functools.partial(jax.jit,
                   static_argnames=("min_lifetime_obs", "max_cull"))
def cull_landmarks(kf: KeyframeState, lm: LandmarkState,
                   min_lifetime_obs: int = 3, max_cull: int = 4096):
    """Free landmark slots of weakly-observed dead landmarks.

    The reference's map is an unbounded hash map: landmarks that lose all
    windowed observations stay in it forever, active=false
    (vo_utils.h:348-365 — the erase is commented out), because loop closure
    and relocalization project old keyframes' map points. Fixed-capacity
    state cannot afford that: without recycling, a long sequence exhausts
    max_landmarks and mapping silently stops.

    Policy (ORB-SLAM-style landmark culling): a landmark is culled when it
    is valid, OUT of the BA window (not active), and was seen in fewer than
    ``min_lifetime_obs`` lifetime left-camera observations — i.e. it was
    never corroborated beyond (roughly) its founding keyframe. Such points
    are noise-dominated and contribute nothing to loop closure; strongly
    observed landmarks are kept forever, exactly like the reference.
    Every keyframe map_points reference to a culled slot is cleared so a
    recycled slot can never alias stale references.

    ``max_cull`` bounds the landmarks freed per call (overflow waits for
    the next cull — pressure-triggered, so it fires again immediately):
    the keyframe map_points references are cleared by SCATTERING through
    the dead landmarks' own lifetime-obs tables — which record exactly the
    (kf, feat) cells pointing at them (insert_keyframe keeps map_points
    canonical: one cell per landmark, always backed by an all_obs entry,
    and a cullable landmark has < min_lifetime_obs <= M2 entries so none
    were dropped) — instead of gathering `dead` at all K*N map_points
    cells (~14 ms on TPU; the scatter is ~2 ms, tools/profile_kf_branch).

    Returns (kf, lm, num_culled).
    """
    nobs = jnp.sum((lm.all_kf >= 0) & (lm.all_cam == 0), axis=-1)
    want_dead = lm.valid & ~lm.active & (nobs < min_lifetime_obs)
    dead_ids, dead_ok = compact.compact_indices(want_dead, max_cull)
    L = lm.pos.shape[0]
    rows = jnp.clip(dead_ids, 0, L - 1)
    # the exact dead set this call acts on (capped at max_cull)
    dead = jnp.zeros((L,), bool).at[
        jnp.where(dead_ok, dead_ids, L)].set(True, mode="drop")
    K = kf.frame_id.shape[0]
    akf = lm.all_kf[rows]                       # [C, M2]
    acam = lm.all_cam[rows]
    afeat = lm.all_feat[rows]
    wr = dead_ok[:, None] & (akf >= 0) & (acam == 0)
    mp = kf.map_points.at[
        jnp.where(wr, akf, K), jnp.where(wr, afeat, 0)].set(-1, mode="drop")
    kf = kf._replace(map_points=mp)
    lm = lm._replace(
        valid=lm.valid & ~dead,
        active=lm.active & ~dead,
        from_kf=jnp.where(dead, -1, lm.from_kf),
        obs_kf=jnp.where(dead[:, None], -1, lm.obs_kf),
        all_kf=jnp.where(dead[:, None], -1, lm.all_kf),
        bank_valid=lm.bank_valid & ~dead[:, None],
        bank_next=jnp.where(dead, 0, lm.bank_next),
    )
    return kf, lm, jnp.sum(dead)
