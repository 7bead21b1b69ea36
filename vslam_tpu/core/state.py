"""Fixed-capacity functional SLAM state.

The reference keeps its map in mutable hash maps guarded by TBB containers
and copy-on-write snapshots (/root/reference/src/slam.cpp:111-214,
common_types.h:204-262). On TPU everything dynamic becomes padded dense
arrays + masks inside immutable pytrees, so every per-frame update is a
pure function that XLA compiles once:

- ``LandmarkState``: world/anchor positions, anchor keyframe, windowed and
  lifetime observation tables (padded per-landmark rows), a small
  descriptor bank per landmark (stands in for "min distance over all
  observation descriptors", vo_utils.h:112-128), active/valid masks.
- ``KeyframeState``: per-slot stereo poses, keypoints + descriptors for
  both cams, per-feature landmark ids (the reference's Camera::map_points),
  spanning-tree parent, active/valid masks.
- ``TrackState``: current pose, constant-velocity model, tracking flag.

Keyframe *slots* are dense indices 0..K-1 in insertion order; the original
frame ids live in ``kf_frame_id`` (the analogue of FrameCamId.frame_id).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry import lie


class LandmarkState(NamedTuple):
    pos: jnp.ndarray         # [L, 3] world position (lm.p)
    pos_c: jnp.ndarray       # [L, 3] anchor-frame position (lm.p_c)
    from_kf: jnp.ndarray     # [L] int32 anchor KF slot (lm.from_fcid)
    valid: jnp.ndarray       # [L] bool allocated
    active: jnp.ndarray      # [L] bool has windowed obs (lm.active)
    # windowed observations (lm.obs): row-padded tables
    obs_kf: jnp.ndarray      # [L, M] int32 KF slot, -1 empty
    obs_cam: jnp.ndarray     # [L, M] int32 0/1
    obs_feat: jnp.ndarray    # [L, M] int32 feature index
    # lifetime observations (lm.all_obs)
    all_kf: jnp.ndarray      # [L, M2] int32
    all_cam: jnp.ndarray     # [L, M2] int32
    all_feat: jnp.ndarray    # [L, M2] int32
    # descriptor bank (stand-in for min over all_obs descriptors)
    bank_bits: jnp.ndarray   # [L, B, 256] uint8
    bank_valid: jnp.ndarray  # [L, B] bool
    bank_next: jnp.ndarray   # [L] int32 round-robin cursor
    next_slot: jnp.ndarray   # [] int32 allocation cursor


class KeyframeState(NamedTuple):
    frame_id: jnp.ndarray    # [K] int32, -1 empty
    pose_l: jnp.ndarray      # [K, 7] T_w_c cam0
    pose_r: jnp.ndarray      # [K, 7] T_w_c cam1
    valid: jnp.ndarray       # [K] bool
    active: jnp.ndarray      # [K] bool (in BA window)
    parent: jnp.ndarray      # [K] int32 spanning-tree parent slot (last_fcid)
    corners: jnp.ndarray     # [K, 2, N, 2] float32
    desc: jnp.ndarray        # [K, 2, N, 32] uint8 (packed bits; 1.5k KFs fit
                             # in ~200 MB HBM vs 1.6 GB unpacked)
    kp_valid: jnp.ndarray    # [K, 2, N] bool
    map_points: jnp.ndarray  # [K, N] int32 landmark id per left feature, -1
    next_slot: jnp.ndarray   # [] int32


class TrackState(NamedTuple):
    current_pose: jnp.ndarray  # [7] T_w_c (left cam)
    last_pose: jnp.ndarray     # [7]
    vel: jnp.ndarray           # [7] constant-velocity model
    tracking_ok: jnp.ndarray   # [] bool


def init_landmarks(L: int, M: int = 24, M2: int = 48, B: int = 4,
                   dtype=jnp.float32) -> LandmarkState:
    return LandmarkState(
        pos=jnp.zeros((L, 3), dtype),
        pos_c=jnp.zeros((L, 3), dtype),
        from_kf=jnp.full((L,), -1, jnp.int32),
        valid=jnp.zeros((L,), bool),
        active=jnp.zeros((L,), bool),
        obs_kf=jnp.full((L, M), -1, jnp.int32),
        obs_cam=jnp.zeros((L, M), jnp.int32),
        obs_feat=jnp.zeros((L, M), jnp.int32),
        all_kf=jnp.full((L, M2), -1, jnp.int32),
        all_cam=jnp.zeros((L, M2), jnp.int32),
        all_feat=jnp.zeros((L, M2), jnp.int32),
        bank_bits=jnp.zeros((L, B, 256), jnp.uint8),
        bank_valid=jnp.zeros((L, B), bool),
        bank_next=jnp.zeros((L,), jnp.int32),
        next_slot=jnp.asarray(0, jnp.int32),
    )


def init_keyframes(K: int, N: int, dtype=jnp.float32) -> KeyframeState:
    return KeyframeState(
        frame_id=jnp.full((K,), -1, jnp.int32),
        pose_l=jnp.tile(lie.identity_pose(dtype), (K, 1)),
        pose_r=jnp.tile(lie.identity_pose(dtype), (K, 1)),
        valid=jnp.zeros((K,), bool),
        active=jnp.zeros((K,), bool),
        parent=jnp.full((K,), -1, jnp.int32),
        corners=jnp.full((K, 2, N, 2), -1.0, dtype),
        desc=jnp.zeros((K, 2, N, 32), jnp.uint8),
        kp_valid=jnp.zeros((K, 2, N), bool),
        map_points=jnp.full((K, N), -1, jnp.int32),
        next_slot=jnp.asarray(0, jnp.int32),
    )


def init_track(dtype=jnp.float32) -> TrackState:
    return TrackState(
        current_pose=lie.identity_pose(dtype),
        last_pose=lie.identity_pose(dtype),
        vel=lie.identity_pose(dtype),
        tracking_ok=jnp.asarray(False),
    )
