"""Integration test of compute_sim3 + loop_closure on a constructed map.

Builds a keyframe chain around a circle with injected drift: the last
keyframe re-observes the first keyframe's landmarks (same descriptors,
corners rendered from its TRUE pose) while its STORED pose is drifted.
compute_sim3 must recover the correction and loop_closure must pull the
chain back (reference semantics: sim3.h:228-359, loop_closure_utils.h:
398-649).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.core import state as st
from vslam_tpu.geometry import cameras, lie
from vslam_tpu.loop import closure
from vslam_tpu.ops import describe as describe_ops

INTR = jnp.asarray([220.0, 220.0, 160.0, 120.0, 0, 0, 0, 0], jnp.float32)
N_FEAT = 64
N_KF = 10


@pytest.fixture(scope="module")
def drifted_map():
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    # true poses around a circle, looking outward at a landmark ring
    true_poses = []
    for i in range(N_KF):
        th = 2 * np.pi * i / N_KF
        pos = np.array([2 * np.sin(th), 0.0, -2 * np.cos(th)])
        tgt = np.array([8 * np.sin(th), 0.0, -8 * np.cos(th)])
        from vslam_tpu.synthetic import _look_at

        true_poses.append(_look_at(pos, tgt))
    true_poses = np.stack(true_poses).astype(np.float32)

    # drift: each stored pose accumulates a small twist; pose 0 exact
    drift_step = np.array([0.02, 0.004, -0.01, 0.002, 0.004, 0.002],
                          np.float32)
    stored = [true_poses[0]]
    for i in range(1, N_KF):
        rel = lie.se3_mul(lie.se3_inv(jnp.asarray(true_poses[i - 1])),
                          jnp.asarray(true_poses[i]))
        noisy_rel = lie.se3_mul(rel, lie.se3_exp(jnp.asarray(drift_step * i)))
        stored.append(np.asarray(lie.se3_mul(jnp.asarray(stored[-1]),
                                             noisy_rel)))
    stored = np.stack(stored).astype(np.float32)

    # landmarks: per keyframe, N_FEAT points in front of its TRUE pose
    kf = st.init_keyframes(16, N_FEAT)
    lm = st.init_landmarks(2048, M=8, M2=8, B=2)
    T_0_1 = lie.identity_pose()

    lm_pos_all = []
    lm_count = 0
    descs = rng.randint(0, 2, (N_KF, N_FEAT, 256)).astype(np.uint8)
    # the LAST keyframe re-observes keyframe 0's landmarks: same descriptors
    descs[N_KF - 1] = descs[0]

    for i in range(N_KF):
        T_true = jnp.asarray(true_poses[i])
        if i < N_KF - 1:
            # landmarks 2-8 m in front of the true camera
            pc = np.stack([
                rng.uniform(-1.5, 1.5, N_FEAT),
                rng.uniform(-1.0, 1.0, N_FEAT),
                rng.uniform(2.5, 7.0, N_FEAT),
            ], -1).astype(np.float32)
            p_w = np.asarray(lie.se3_apply(T_true, jnp.asarray(pc)))
            tids = np.arange(lm_count, lm_count + N_FEAT)
            lm_count += N_FEAT
        else:
            # re-observation of keyframe 0's landmarks
            p_w = lm_pos_all[0]
            tids = np.arange(0, N_FEAT)
            pc = np.asarray(lie.se3_apply(lie.se3_inv(T_true),
                                          jnp.asarray(p_w)))
        lm_pos_all.append(p_w)
        uv = np.asarray(cameras.project("pinhole", INTR, jnp.asarray(pc)))

        # store keyframe record: corners from the TRUE pose, stored pose
        # drifted; map_points -> landmark ids
        corners = jnp.zeros((2, N_FEAT, 2), jnp.float32).at[0].set(
            jnp.asarray(uv))
        desc = jnp.zeros((2, N_FEAT, 32), jnp.uint8).at[0].set(
            describe_ops.pack_bits(jnp.asarray(descs[i])))
        kp_valid = jnp.zeros((2, N_FEAT), bool).at[0].set(True)
        mp = jnp.full((N_FEAT,), -1, jnp.int32).at[:].set(
            jnp.asarray(tids, jnp.int32))
        kf = kf._replace(
            frame_id=kf.frame_id.at[i].set(i * 30),
            pose_l=kf.pose_l.at[i].set(jnp.asarray(stored[i])),
            pose_r=kf.pose_r.at[i].set(jnp.asarray(stored[i])),
            valid=kf.valid.at[i].set(True),
            active=kf.active.at[i].set(True),
            parent=kf.parent.at[i].set(i - 1),
            corners=kf.corners.at[i].set(corners),
            desc=kf.desc.at[i].set(desc),
            kp_valid=kf.kp_valid.at[i].set(kp_valid),
            map_points=kf.map_points.at[i].set(mp),
            next_slot=jnp.asarray(i + 1, jnp.int32),
        )
        if i < N_KF - 1:
            sl = jnp.asarray(tids, jnp.int32)
            # anchor landmarks at their creating KF (stored pose => p_c from
            # stored pose so update_landmark_position is consistent)
            pc_stored = np.asarray(lie.se3_apply(
                lie.se3_inv(jnp.asarray(stored[i])), jnp.asarray(p_w)))
            lm = lm._replace(
                pos=lm.pos.at[sl].set(jnp.asarray(p_w)),
                pos_c=lm.pos_c.at[sl].set(jnp.asarray(pc_stored)),
                from_kf=lm.from_kf.at[sl].set(i),
                valid=lm.valid.at[sl].set(True),
                active=lm.active.at[sl].set(True),
            )
    covis = {i: ({i - 1: 40} if i > 0 else {}) for i in range(N_KF)}
    for i in range(1, N_KF):
        covis[i - 1][i] = 40
    return kf, lm, true_poses, stored, covis


@pytest.mark.slow
def test_compute_sim3_recovers_drift(drifted_map):
    kf, lm, true_poses, stored, covis = drifted_map
    cur, cand = N_KF - 1, 0
    ok, sim3 = closure.compute_sim3(
        kf, lm, cur, cand, [], INTR, "pinhole",
        pnp_threshold=1.8e-5, key=jax.random.PRNGKey(1))
    assert ok
    # sim3 = T_w_cand^-1 * T_w_cur_measured; measured should equal TRUE pose
    T_meas = lie.se3_mul(kf.pose_l[cand], sim3)
    err = lie.se3_log(lie.se3_mul(lie.se3_inv(jnp.asarray(true_poses[cur])),
                                  T_meas))
    assert float(jnp.abs(err).max()) < 5e-2, np.asarray(err)


def test_loop_closure_reduces_drift(drifted_map):
    kf, lm, true_poses, stored, covis = drifted_map
    cur, cand = N_KF - 1, 0
    ok, sim3 = closure.compute_sim3(
        kf, lm, cur, cand, [], INTR, "pinhole",
        pnp_threshold=1.8e-5, key=jax.random.PRNGKey(2))
    assert ok
    kf2, lm2, stats = closure.loop_closure(
        kf, lm, cur, cand, sim3, covis, lie.identity_pose(),
        essential_threshold=30, fixed_current=True)

    # the pose graph's job is closing the loop: the relative pose between
    # current and candidate must now agree with the measured sim3 correction
    def loop_gap(poses):
        rel = lie.se3_log(lie.se3_mul(
            lie.se3_inv(poses[cur]), poses[cand]))
        meas = lie.se3_log(lie.se3_inv(sim3))
        return float(jnp.linalg.norm(rel - meas))

    gap_before = loop_gap(jnp.asarray(stored))
    gap_after = loop_gap(kf2.pose_l)
    assert gap_after < gap_before * 0.2, (gap_before, gap_after)

    # and the gauge-invariant trajectory error must not regress
    from vslam_tpu.eval.ate import align_svd

    def aligned_err(poses):
        est = np.asarray(poses)[:N_KF, :3]
        return align_svd(est, true_poses[:N_KF, :3])[2]

    before = aligned_err(stored)
    after = aligned_err(np.asarray(kf2.pose_l))
    assert after < before * 1.05, (before, after)
    # landmarks re-anchored: finite positions
    assert bool(jnp.all(jnp.isfinite(lm2.pos[lm2.valid])))
