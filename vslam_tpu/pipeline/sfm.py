"""Track-based SfM helpers (the reference's course/legacy path).

Equivalents of /root/reference/include/visnav/map_utils.h:120-317:
- ``initialize_scene_from_stereo_pair``: map init from a known-extrinsic
  image pair by triangulating shared tracks;
- ``add_new_landmarks_between_cams``: triangulate tracks shared between two
  posed cameras into new landmarks;
- ``localize_camera_tracks``: PnP of a new camera against landmarks matched
  via tracks.

These operate on the track dictionaries from utils/tracks.py plus dense
corner arrays, and reuse the batched device solvers (triangulation, PnP).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry import cameras as cam_models
from ..geometry import lie
from ..geometry.triangulate import triangulate_midpoint
from ..solvers import pnp


def _pow2(n: int, lo: int = 16) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def triangulate_tracks(
    tracks: Dict[int, Dict[int, int]],
    img_i: int,
    img_j: int,
    corners_i,
    corners_j,
    T_w_i,
    T_w_j,
    intr,
    cam_name: str,
    existing: Dict[int, np.ndarray],
) -> Dict[int, np.ndarray]:
    """add_new_landmarks_between_cams: triangulate tracks seen in both
    images that are not yet landmarks. Returns {track_id: p_w}."""
    tids = [t for t, obs in tracks.items()
            if img_i in obs and img_j in obs and t not in existing]
    if not tids:
        return {}
    uv_i = np.asarray([np.asarray(corners_i)[tracks[t][img_i]] for t in tids])
    uv_j = np.asarray([np.asarray(corners_j)[tracks[t][img_j]] for t in tids])
    f_i = cam_models.unproject(cam_name, intr, jnp.asarray(uv_i))
    f_j = cam_models.unproject(cam_name, intr, jnp.asarray(uv_j))
    T_i_j = lie.se3_mul(lie.se3_inv(T_w_i), T_w_j)
    p_i, ok = triangulate_midpoint(f_i, f_j, T_i_j)
    p_w = lie.se3_apply(T_w_i, p_i)
    out = {}
    okn = np.asarray(ok)
    pwn = np.asarray(p_w)
    for k, t in enumerate(tids):
        if okn[k]:
            out[t] = pwn[k]
    return out


def initialize_scene_from_stereo_pair(
    tracks: Dict[int, Dict[int, int]],
    img_i: int,
    img_j: int,
    corners_i,
    corners_j,
    T_i_j,
    intr,
    cam_name: str,
) -> Tuple[Dict[int, np.ndarray], jnp.ndarray, jnp.ndarray]:
    """Map init: camera i at identity, camera j at the calibrated extrinsic
    (map_utils.h initialize_scene_from_stereo_pair semantics)."""
    T_w_i = lie.identity_pose()
    T_w_j = T_i_j
    landmarks = triangulate_tracks(
        tracks, img_i, img_j, corners_i, corners_j, T_w_i, T_w_j, intr,
        cam_name, existing={})
    return landmarks, T_w_i, T_w_j


def localize_camera_tracks(
    key,
    img_id: int,
    tracks: Dict[int, Dict[int, int]],
    corners,
    landmarks: Dict[int, np.ndarray],
    intr,
    cam_name: str,
    threshold: float,
    num_hypotheses: int = 256,
):
    """Track-based PnP (map_utils.h localize_camera over shared tracks).

    Returns (T_w_c [7], inlier_track_ids)."""
    shared = [t for t, obs in tracks.items()
              if img_id in obs and t in landmarks]
    if len(shared) < 4:
        return None, []
    cap = _pow2(len(shared))
    pts = np.zeros((cap, 3), np.float32)
    brs = np.zeros((cap, 3), np.float32)
    pts[:len(shared)] = np.stack([landmarks[t] for t in shared])
    uv = np.asarray([np.asarray(corners)[tracks[t][img_id]] for t in shared])
    brs[:len(shared)] = np.asarray(
        cam_models.unproject(cam_name, intr, jnp.asarray(uv)))
    valid = np.arange(cap) < len(shared)
    T_wc, inl, num, ok = pnp.ransac_pnp(
        key, jnp.asarray(pts), jnp.asarray(brs), jnp.asarray(valid),
        threshold, num_hypotheses=num_hypotheses)
    if not bool(ok):
        return None, []
    inl = np.asarray(inl)[:len(shared)]
    return T_wc, [shared[i] for i in np.nonzero(inl)[0]]
