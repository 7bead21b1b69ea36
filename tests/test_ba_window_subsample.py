"""Obs-subsampled window BA (SlamConfig.ba_obs_per_lm).

The builder must keep exactly the k NEWEST in-window observations of each
landmark (by observing keyframe's frame id) and drop the rest; with k=0
the full observation set survives (reference semantics,
/root/reference/src/slam.cpp:1510-1569 solves every observation).
"""

import jax.numpy as jnp
import numpy as np

from vslam_tpu.core import state as st
from vslam_tpu.pipeline import ba_window


def _toy_map(K=6, L=16, N=8, M=8):
    kf = st.init_keyframes(K, N)
    lm = st.init_landmarks(L, M=M)
    rng = np.random.default_rng(0)

    n_kf = 4
    frame_ids = np.array([3, 11, 7, 19], np.int32)  # insertion != recency
    ident = np.tile(np.array([0, 0, 0, 1, 0, 0, 0], np.float32), (n_kf, 1))
    ident[:, 4] = np.arange(n_kf) * 0.1  # slight baseline
    kf = kf._replace(
        frame_id=kf.frame_id.at[:n_kf].set(jnp.asarray(frame_ids)),
        pose_l=kf.pose_l.at[:n_kf].set(jnp.asarray(ident)),
        pose_r=kf.pose_r.at[:n_kf].set(jnp.asarray(ident)),
        valid=kf.valid.at[:n_kf].set(True),
        active=kf.active.at[:n_kf].set(True),
        corners=kf.corners.at[:n_kf].set(
            jnp.asarray(rng.uniform(0, 400, (n_kf, 2, N, 2)),
                        jnp.float32)),
        next_slot=jnp.int32(n_kf),
    )

    n_lm = 5
    obs_kf = np.full((L, M), -1, np.int32)
    # landmark i observed by the first (i % 4) + 2 keyframe slots
    # (capped at n_kf), left cam, feature i
    for i in range(n_lm):
        n_obs = min(n_kf, (i % 4) + 2)
        obs_kf[i, :n_obs] = np.arange(n_obs)
    lm = lm._replace(
        pos=lm.pos.at[:n_lm].set(
            jnp.asarray(rng.normal(0, 1, (n_lm, 3)), jnp.float32)),
        valid=lm.valid.at[:n_lm].set(True),
        active=lm.active.at[:n_lm].set(True),
        obs_kf=jnp.asarray(obs_kf),
        obs_feat=lm.obs_feat.at[:n_lm].set(
            jnp.tile(jnp.arange(M, dtype=jnp.int32) % N, (n_lm, 1))),
        next_slot=jnp.int32(n_lm),
    )
    return kf, lm, frame_ids, n_lm


def test_subsample_keeps_newest_k():
    kf, lm, frame_ids, n_lm = _toy_map()
    intr = jnp.asarray(np.array([300, 300, 376, 240, 0.5, 0, 0, 0],
                                np.float32))

    def pairs(obs_per_lm):
        wp = ba_window.build_window_problem(
            kf, lm, intr, intr, W2=4, Lw=8, O=64, obs_per_lm=obs_per_lm)
        valid = np.asarray(wp.prob.obs_valid)
        pt = np.asarray(wp.prob.obs_point)[valid]
        w = np.asarray(wp.prob.obs_cam)[valid]
        sel_lm = np.asarray(wp.sel_lm)
        sel_kf = np.asarray(wp.sel_kf)
        out = set()
        for p, wi in zip(pt, w):
            slot = sel_kf[wi // 2]
            out.add((int(sel_lm[p]), int(frame_ids[slot])))
        return out

    full = pairs(0)
    # full problem: every (lm, observing frame) pair present
    expect_full = set()
    for i in range(n_lm):
        n_obs = min(4, (i % 4) + 2)
        for s in range(n_obs):
            expect_full.add((i, int(frame_ids[s])))
    assert full == expect_full

    k = 2
    sub = pairs(k)
    expect_sub = set()
    for i in range(n_lm):
        n_obs = min(4, (i % 4) + 2)
        newest = sorted(frame_ids[:n_obs])[-k:]
        for f in newest:
            expect_sub.add((i, int(f)))
    assert sub == expect_sub
    assert sub <= full


def test_subsample_kplus_is_full():
    """k >= M leaves the problem identical to the unsubsampled build."""
    kf, lm, _, _ = _toy_map()
    intr = jnp.asarray(np.array([300, 300, 376, 240, 0.5, 0, 0, 0],
                                np.float32))
    wp0 = ba_window.build_window_problem(
        kf, lm, intr, intr, W2=4, Lw=8, O=64, obs_per_lm=0)
    wp8 = ba_window.build_window_problem(
        kf, lm, intr, intr, W2=4, Lw=8, O=64, obs_per_lm=8)
    assert int(wp0.prob.obs_valid.sum()) == int(wp8.prob.obs_valid.sum())
