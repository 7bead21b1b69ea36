"""Sim(3) Horn/Umeyama alignment + RANSAC (geometry/sim3.py).

The reference's closed-form alignment component (sim3.h:48-141,
compute_sim3_1); here with-scale, masked, and with a batched-RANSAC
wrapper for outlier-contaminated 3D-3D matches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.geometry import lie
from vslam_tpu.geometry import sim3 as sim3_mod


def _random_sim3(rng, scale=None):
    axis = rng.randn(3)
    axis = axis / np.linalg.norm(axis) * rng.uniform(0.2, 2.5)
    R = np.asarray(lie.quat_to_matrix(
        lie.se3_exp(jnp.asarray(np.concatenate([np.zeros(3), axis]),
                                jnp.float32))[3:7]))
    s = scale if scale is not None else rng.uniform(0.3, 3.0)
    t = rng.randn(3) * 2.0
    return sim3_mod.Sim3(s=jnp.asarray(s, jnp.float32),
                         R=jnp.asarray(R, jnp.float32),
                         t=jnp.asarray(t, jnp.float32))


def test_horn_exact_recovery():
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(40, 3), jnp.float32)
    T = _random_sim3(rng)
    dst = sim3_mod.sim3_apply(T, src)
    E = sim3_mod.horn_align(src, dst)
    assert abs(float(E.s) - float(T.s)) < 1e-3 * float(T.s)
    assert np.allclose(np.asarray(E.R), np.asarray(T.R), atol=1e-4)
    assert np.allclose(np.asarray(E.t), np.asarray(T.t), atol=1e-3)


def test_horn_se3_mode_forces_unit_scale():
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(30, 3), jnp.float32)
    T = _random_sim3(rng, scale=1.0)
    dst = sim3_mod.sim3_apply(T, src)
    E = sim3_mod.horn_align(src, dst, with_scale=False)
    assert float(E.s) == 1.0
    assert np.allclose(np.asarray(E.R), np.asarray(T.R), atol=1e-4)


def test_horn_weights_mask_points():
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(30, 3), jnp.float32)
    T = _random_sim3(rng)
    dst = np.array(sim3_mod.sim3_apply(T, src))
    dst[25:] += 50.0  # corrupt masked-out points
    w = jnp.asarray(np.arange(30) < 25, jnp.float32)
    E = sim3_mod.horn_align(src, jnp.asarray(dst), weights=w)
    assert abs(float(E.s) - float(T.s)) < 1e-3 * float(T.s)
    assert np.allclose(np.asarray(E.t), np.asarray(T.t), atol=1e-2)


def test_horn_reflection_guard():
    """Mirror correspondences must yield a proper rotation (det +1)."""
    rng = np.random.RandomState(3)
    src = rng.randn(20, 3).astype(np.float32)
    dst = src.copy()
    dst[:, 0] *= -1.0  # reflection, not achievable by a rotation
    E = sim3_mod.horn_align(jnp.asarray(src), jnp.asarray(dst))
    assert float(jnp.linalg.det(E.R)) > 0.99


def test_ransac_sim3_with_outliers():
    rng = np.random.RandomState(4)
    n = 96
    src = rng.randn(n, 3).astype(np.float32) * 3.0
    T = _random_sim3(rng, scale=1.7)
    dst = np.array(sim3_mod.sim3_apply(T, jnp.asarray(src)))
    n_out = 28  # ~30% outliers
    dst[:n_out] = rng.randn(n_out, 3) * 8.0
    valid = np.ones(n, bool)

    Tr, inl, n_inl, ok = sim3_mod.ransac_sim3(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(valid), threshold=0.15, num_hypotheses=128)
    assert bool(ok)
    assert int(n_inl) >= n - n_out - 3
    assert not bool(jnp.any(inl[:n_out]))
    assert abs(float(Tr.s) - 1.7) < 0.02
    err = np.asarray(sim3_mod.sim3_apply(Tr, jnp.asarray(src[n_out:]))) \
        - dst[n_out:]
    assert np.linalg.norm(err, axis=-1).max() < 0.15


def test_ransac_sim3_rejects_garbage():
    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randn(32, 3), jnp.float32)
    dst = jnp.asarray(rng.randn(32, 3), jnp.float32) * 5.0
    _, _, n_inl, ok = sim3_mod.ransac_sim3(
        jax.random.PRNGKey(1), src, dst, jnp.ones(32, bool),
        threshold=0.05, num_hypotheses=64, min_inliers=8)
    assert not bool(ok) or int(n_inl) < 8


def test_sim3_inv_roundtrip():
    rng = np.random.RandomState(6)
    T = _random_sim3(rng)
    p = jnp.asarray(rng.randn(10, 3), jnp.float32)
    q = sim3_mod.sim3_apply(sim3_mod.sim3_inv(T), sim3_mod.sim3_apply(T, p))
    assert np.allclose(np.asarray(q), np.asarray(p), atol=1e-4)


def test_horn_loop_correction_end_to_end():
    """compute_sim3_horn on a drifted-map scenario: two copies of the same
    structure (old map vs drifted current map) must align, and a wrong
    scale must be rejected by the stereo scale gate."""
    from vslam_tpu.loop.closure import compute_sim3_horn
    from vslam_tpu.core import state as st
    from vslam_tpu.ops import describe as describe_ops

    rng = np.random.RandomState(7)
    n_pts = 64
    pts_old = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32) \
        + np.array([0, 0, 6], np.float32)
    drift = np.array([0.8, -0.3, 0.4], np.float32)
    pts_drift = pts_old + drift

    N = 128
    kf = st.init_keyframes(4, N)
    lm = st.init_landmarks(256, M=8, M2=8, B=2)
    bits = rng.randint(0, 2, (n_pts, 256)).astype(np.uint8)

    # candidate KF (slot 0) sees the OLD copies; current KF (slot 1) sees
    # the DRIFTED copies of the same physical points (same descriptors)
    desc = np.zeros((2, N, 32), np.uint8)
    desc[0, :n_pts] = np.asarray(describe_ops.pack_bits(jnp.asarray(bits)))
    desc[1] = desc[0]
    kpv = np.zeros((2, N), bool)
    kpv[:, :n_pts] = True
    mp0 = np.full(N, -1, np.int32)
    mp0[:n_pts] = np.arange(n_pts)            # old landmarks: slots 0..63
    mp1 = np.full(N, -1, np.int32)
    mp1[:n_pts] = np.arange(n_pts) + n_pts    # drifted: slots 64..127

    kf = kf._replace(
        valid=kf.valid.at[0].set(True).at[1].set(True),
        frame_id=kf.frame_id.at[0].set(0).at[1].set(600),
        desc=kf.desc.at[0].set(jnp.asarray(desc))
                    .at[1].set(jnp.asarray(desc)),
        kp_valid=kf.kp_valid.at[0].set(jnp.asarray(kpv))
                            .at[1].set(jnp.asarray(kpv)),
        map_points=kf.map_points.at[0].set(jnp.asarray(mp0))
                                .at[1].set(jnp.asarray(mp1)),
        next_slot=jnp.asarray(2, jnp.int32),
    )
    pos = np.zeros((256, 3), np.float32)
    pos[:n_pts] = pts_old
    pos[n_pts:2 * n_pts] = pts_drift
    lm = lm._replace(pos=jnp.asarray(pos),
                     valid=jnp.asarray(np.arange(256) < 2 * n_pts))

    ok, sim3, scale = compute_sim3_horn(
        kf, lm, cur_slot=1, cand_slot=0, cand_neighbors=[],
        key=jax.random.PRNGKey(2))
    assert ok, "alignment should succeed"
    assert abs(scale - 1.0) < 0.01
    # the correction must undo the drift: candidate pose is identity, so
    # sim3's translation equals the corrected current pose's translation
    # (current pose = identity, corrected by -drift)
    t = np.asarray(sim3)[:3]
    assert np.allclose(t, -drift, atol=0.05), (t, -drift)

    # scale gate: shrink the drifted copy by 25% -> stereo gate must reject
    pos2 = pos.copy()
    pos2[n_pts:2 * n_pts] = pts_old * 0.75
    lm2 = lm._replace(pos=jnp.asarray(pos2))
    ok2, _, scale2 = compute_sim3_horn(
        kf, lm2, cur_slot=1, cand_slot=0, cand_neighbors=[],
        key=jax.random.PRNGKey(3))
    assert not ok2
    assert abs(scale2 - 1.0 / 0.75) < 0.1
