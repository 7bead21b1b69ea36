"""Landmark slot recycling: a fixed-capacity map must survive long runs.

The reference's map is an unbounded hash map (common_types.h:256-262);
landmarks orphaned by keyframe eviction stay in it forever
(vo_utils.h:348-365). The TPU-native fixed-capacity state instead recycles
slots of weakly-observed dead landmarks (ORB-SLAM-style culling,
pipeline/keyframe.py cull_landmarks) so mapping never silently stops at
max_landmarks. These tests push >= 3x capacity worth of allocations through
keyframing + eviction + culling and assert map integrity throughout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.core import state as state_mod
from vslam_tpu.frontend.features import Features
from vslam_tpu.geometry import cameras, lie
from vslam_tpu.pipeline import keyframe as kf_mod

L_CAP = 256   # landmark capacity
N = 64        # features per keyframe
K_CAP = 64
INTR = jnp.asarray([100.0, 100.0, 64.0, 48.0, 0, 0, 0, 0], jnp.float32)
T_0_1 = jnp.asarray([0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], jnp.float32)


def _fake_features(key, pose, T_0_1, n=N):
    """Project n fresh random 3D points through both cams -> stereo pair."""
    k1, k2 = jax.random.split(key)
    p_w = jax.random.uniform(k1, (n, 3), minval=-2.0, maxval=2.0)
    p_w = p_w + lie.se3_t(pose) + quatz(pose)
    p_c0 = lie.se3_apply(lie.se3_inv(pose), p_w)
    p_c1 = lie.se3_apply(lie.se3_inv(lie.se3_mul(pose, T_0_1)), p_w)
    uv0 = cameras.project("pinhole", INTR, p_c0)
    uv1 = cameras.project("pinhole", INTR, p_c1)
    bits = jax.random.randint(k2, (n, 256), 0, 2).astype(jnp.uint8)
    f_l = Features(corners=uv0, angles=jnp.zeros((n,)), bits=bits,
                   valid=jnp.ones((n,), bool))
    f_r = Features(corners=uv1, angles=jnp.zeros((n,)), bits=bits,
                   valid=jnp.ones((n,), bool))
    return f_l, f_r


def quatz(pose):
    """Point cluster center: 5m in front of the camera."""
    return lie.quat_rotate(lie.se3_q(pose), jnp.asarray([0.0, 0.0, 5.0]))


def _insert(kf, lm, frame, pose, f_l, f_r, match_lm=None, lm_inlier=None):
    stereo_j = jnp.arange(N, dtype=jnp.int32)
    stereo_inl = jnp.ones((N,), bool)
    if match_lm is None:
        match_lm = jnp.full((N,), -1, jnp.int32)
    if lm_inlier is None:
        lm_inlier = jnp.zeros((N,), bool)
    return kf_mod.insert_keyframe(
        kf, lm, jnp.asarray(frame, jnp.int32), jnp.asarray(-1, jnp.int32),
        pose, T_0_1, f_l, f_r, stereo_j, stereo_inl, match_lm, lm_inlier,
        INTR, INTR, cam_name="pinhole")


def _integrity(kf, lm):
    """Every keyframe map_points reference targets a valid landmark."""
    mp = np.asarray(kf.map_points)
    valid = np.asarray(lm.valid)
    refs = mp[mp >= 0]
    assert refs.size == 0 or valid[refs].all(), \
        "map_points references a culled/invalid landmark slot"
    # windowed obs of valid landmarks point at valid keyframes
    okf = np.asarray(lm.obs_kf)[valid]
    kf_valid = np.asarray(kf.valid)
    assert (okf < 0).all() or kf_valid[okf[okf >= 0]].all()


def test_recycling_sustains_3x_capacity_allocations():
    kf = state_mod.init_keyframes(K_CAP, N)
    lm = state_mod.init_landmarks(L_CAP, M=8, M2=8, B=2)
    key = jax.random.PRNGKey(0)

    total_alloc = 0
    window = []
    for step in range(16):  # 16 * 64 = 1024 = 4x capacity
        key, k = jax.random.split(key)
        pose = lie.identity_pose().at[0].set(0.3 * step)
        f_l, f_r = _fake_features(k, pose, T_0_1)
        out = _insert(kf, lm, step, pose, f_l, f_r)
        kf, lm = out.kf, out.lm
        n_new = int(out.num_new)
        total_alloc += n_new

        window.append(int(out.slot))
        if len(window) > 2:
            old = window.pop(0)
            mask = np.zeros(K_CAP, bool)
            mask[old] = True
            kf, lm = kf_mod.deactivate_keyframes(kf, lm, jnp.asarray(mask))

        # capacity pressure -> cull (same policy the SlamSystem applies)
        if int(jnp.sum(lm.valid)) >= 0.7 * L_CAP:
            kf, lm, _ = kf_mod.cull_landmarks(kf, lm, min_lifetime_obs=3)

        _integrity(kf, lm)
        # no dropped writes: every step allocates its full feature budget
        assert n_new == N, f"step {step}: only {n_new}/{N} stored " \
            f"(valid={int(jnp.sum(lm.valid))})"

    assert total_alloc >= 3 * L_CAP
    assert int(jnp.sum(lm.valid)) <= L_CAP


def test_strongly_observed_landmarks_survive_cull():
    kf = state_mod.init_keyframes(K_CAP, N)
    lm = state_mod.init_landmarks(L_CAP, M=8, M2=8, B=2)
    key = jax.random.PRNGKey(1)
    pose0 = lie.identity_pose()
    f_l, f_r = _fake_features(key, pose0, T_0_1)
    out = _insert(kf, lm, 0, pose0, f_l, f_r)
    kf, lm = out.kf, out.lm
    first_slots = np.asarray(
        out.kf.map_points[int(out.slot)])[:N]
    first_slots = first_slots[first_slots >= 0]
    assert len(first_slots) == N

    # re-observe the SAME landmarks from two more keyframes -> 3 lifetime
    # left-cam obs each
    for frame in (1, 2):
        key, k = jax.random.split(key)
        pose = lie.identity_pose().at[0].set(0.05 * frame)
        fl2, fr2 = _fake_features(k, pose, T_0_1)
        match_lm = jnp.asarray(first_slots, jnp.int32)
        out = _insert(kf, lm, frame, pose, fl2, fr2,
                      match_lm=match_lm, lm_inlier=jnp.ones((N,), bool))
        kf, lm = out.kf, out.lm

    # evict everything -> all landmarks dead (no windowed obs)
    mask = np.ones(K_CAP, bool)
    kf, lm = kf_mod.deactivate_keyframes(kf, lm, jnp.asarray(mask),
                                         max_evict=K_CAP)
    assert not bool(jnp.any(lm.active))

    kf, lm, n_culled = kf_mod.cull_landmarks(kf, lm, min_lifetime_obs=3)
    valid = np.asarray(lm.valid)
    # the first batch was corroborated 3x -> survives; later duplicates
    # (the re-observations tracked, so no new allocations) leave nothing
    # weakly observed except none
    assert valid[first_slots].all(), "strongly-observed landmarks culled"

    # a weak batch inserted then orphaned IS culled and its slots reused
    key, k = jax.random.split(key)
    pose = lie.identity_pose().at[0].set(1.0)
    fl3, fr3 = _fake_features(k, pose, T_0_1)
    out = _insert(kf, lm, 3, pose, fl3, fr3)
    kf, lm = out.kf, out.lm
    weak_slots = np.asarray(out.kf.map_points[int(out.slot)])
    weak_slots = weak_slots[weak_slots >= 0]
    kf, lm = kf_mod.deactivate_keyframes(kf, lm, jnp.asarray(mask),
                                         max_evict=K_CAP)
    kf, lm, n_culled = kf_mod.cull_landmarks(kf, lm, min_lifetime_obs=3)
    assert int(n_culled) == len(weak_slots)
    assert not np.asarray(lm.valid)[weak_slots].any()
    # references cleared everywhere
    mp = np.asarray(kf.map_points)
    assert not np.isin(mp[mp >= 0], weak_slots).any()

    # reuse: next insert takes the freed low slots first
    key, k = jax.random.split(key)
    fl4, fr4 = _fake_features(k, pose, T_0_1)
    out = _insert(kf, lm, 4, pose, fl4, fr4)
    new_mp = np.asarray(out.kf.map_points[int(out.slot)])
    new_mp = new_mp[new_mp >= 0]
    assert np.isin(new_mp, weak_slots).all(), "freed slots not reused"


def test_full_table_observation_drops_not_clobbers():
    """An (M+1)-th observation is dropped, not written over slot 0."""
    kf = state_mod.init_keyframes(K_CAP, N)
    lm = state_mod.init_landmarks(L_CAP, M=2, M2=2, B=2)
    key = jax.random.PRNGKey(2)
    pose = lie.identity_pose()
    f_l, f_r = _fake_features(key, pose, T_0_1)
    out = _insert(kf, lm, 0, pose, f_l, f_r)
    kf, lm = out.kf, out.lm
    slots = np.asarray(out.kf.map_points[int(out.slot)])
    row0 = int(slots[0])
    before = np.asarray(lm.obs_kf[row0]).copy()
    assert (before >= 0).all(), "M=2 table should be full after stereo pair"

    # third observation attempt on a full table
    match_lm = jnp.full((N,), -1, jnp.int32).at[0].set(row0)
    out = _insert(kf, lm, 1, pose, f_l, f_r,
                  match_lm=match_lm,
                  lm_inlier=jnp.zeros((N,), bool).at[0].set(True))
    after = np.asarray(out.lm.obs_kf[row0])
    np.testing.assert_array_equal(before, after)
