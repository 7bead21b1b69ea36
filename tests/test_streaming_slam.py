"""StreamingSLAM: organic loop closure through the sync-free stream.

Two scenarios on the cylindrical-pano world:

1. **Drifted gauge** (injected): mid-run, the live gauge — active
   keyframes, active landmarks, tracker — is moved by an SE3 offset while
   the old map stays put, simulating accumulated drift between the live
   window and the old map. On the revisit, detection must find the old
   keyframes from appearance, compute_sim3 must recover the offset, the
   identity-gain verification must PASS (the current poses explain the
   old structure badly), and the late-application closure must stitch the
   gauges back together.

2. **Consistent map** (no injection): with the gain-ratio LM fix this
   world tracks to ~3 m without loop closure, so every proposed
   correction is PnP noise. The identity-gain gate must REJECT the
   closures (applying them measurably degraded the map: +6 m), and the
   map must stay good.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.frontend.features import extract_features
from vslam_tpu.geometry import lie
from vslam_tpu.loop import vocabulary as vocab_mod
from vslam_tpu.pipeline.streaming import StreamingSLAM, StreamingVO
from vslam_tpu.synthetic_pano import generate_pano_loop

CREEP_FROM, CREEP_TO = 110, 150  # drift accumulates over these frames,
# finishing by ~1.03 revolutions so the revisit sees the full offset


def pano_config():
    return SlamConfig(
        num_features=600, ransac_hypotheses=128, max_landmarks=32768,
        max_keyframes=128, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=10,
        enable_relocalization=False, enable_loop_closure=True,
        enable_gba_after_loop=False,
        new_kf_min_inliers=60, loop_closing_time_threshold=20,
        quality_level=0.001, match_max_dist_2d=30.0,
    )


@pytest.fixture(scope="module")
def pano():
    seq = generate_pano_loop(num_frames=256, revolutions=1.75, seed=2)
    pool = []
    for f in range(0, 256, 8):
        ft = extract_features(jnp.asarray(seq.images[f][0]),
                              num_features=600, quality_level=0.001)
        pool.append(np.asarray(ft.bits)[np.asarray(ft.valid)])
    voc = vocab_mod.train(np.concatenate(pool), k=10, depth=4, seed=0)
    vocab_mod.set_idf_weights(voc, pool)
    return seq, voc


T_OFF = np.array([2.4, -0.6, 1.6, 0.0, 0.04997917, 0.0, 0.99875026],
                 np.float32)  # 3 m translation + 0.1 rad yaw


BOUNDARY_FRAME = 100  # everything anchored after this frame is "live"


def _inject_gauge_offset(vo, T_off):
    """Move the LIVE gauge by T_off; the OLD map (keyframes before
    BOUNDARY_FRAME and landmarks anchored to them) stays — simulated
    accumulated drift. Landmarks created later only receive the creep
    steps applied after their creation, exactly like real drift."""
    st = vo.state
    T = jnp.asarray(T_off, jnp.float32)
    live_kf = st.kf.valid & (st.kf.frame_id >= BOUNDARY_FRAME)
    mul = jax.vmap(lambda p: lie.se3_mul(T, p))
    pose_l = jnp.where(live_kf[:, None], mul(st.kf.pose_l), st.kf.pose_l)
    pose_r = jnp.where(live_kf[:, None], mul(st.kf.pose_r), st.kf.pose_r)
    anchor = jnp.clip(st.lm.from_kf, 0)
    live_lm = st.lm.valid & (st.lm.from_kf >= 0) & live_kf[anchor]
    pos = jnp.where(live_lm[:, None], lie.se3_apply(T, st.lm.pos),
                    st.lm.pos)
    vo.state = st._replace(
        kf=st.kf._replace(pose_l=pose_l, pose_r=pose_r),
        lm=st.lm._replace(pos=pos),
        cur_pose=lie.se3_mul(T, st.cur_pose),
        last_pose=lie.se3_mul(T, st.last_pose),
    )


def _run_with_injection(driver, seq):
    """Drift creeps in over CREEP_FROM..CREEP_TO (each frame nudges the
    live gauge by T_OFF^(1/N)), like real accumulated drift — every
    spanning-tree edge in the window is slightly off, rather than one
    edge carrying the whole break."""
    n_creep = CREEP_TO - CREEP_FROM
    T_step = np.asarray(lie.se3_exp(
        lie.se3_log(jnp.asarray(T_OFF)) / n_creep))
    driver.run(seq.images[:CREEP_FROM])
    for f in range(CREEP_FROM, CREEP_TO):
        driver.process_frame(*seq.images[f])
        _inject_gauge_offset(driver, T_step)
    driver.run(seq.images[CREEP_TO:])
    jax.block_until_ready(driver.state.frame)


def _keyframe_ate(driver, seq):
    fids, pos, _ = driver.keyframe_trajectory()
    return ate.align_svd(pos, seq.poses[fids, :3])[2]


@pytest.fixture(scope="module")
def clean_vo_rmse(pano):
    """The world's intrinsic tracking floor: no injection, no loop
    machinery. Shared baseline for the break-energy metric below."""
    seq, _ = pano
    cfg_vo = pano_config()
    cfg_vo.enable_loop_closure = False
    vo = StreamingVO(seq.calib, cfg_vo, max_frames=288)
    vo.run(seq.images)
    jax.block_until_ready(vo.state.frame)
    return _keyframe_ate(vo, seq)


@pytest.mark.slow
def test_streaming_slam_stitches_injected_drift(pano, clean_vo_rmse):
    """The injected 3 m gauge break rides on the world's intrinsic ~3 m
    tracking floor (platform-dependent: CPU and TPU arithmetic give
    different trajectories at this noise level), so the assertion is on
    the BREAK ENERGY — the quadrature excess of the injected run over the
    same-platform clean floor — not on the raw ATE ratio. The closure +
    pose graph + async GBA must remove a meaningful fraction of the break
    (measured: ~37% on CPU-8, ~90% on the TPU; bar 20%)."""
    seq, voc = pano
    # the reference's default closure runs GBA afterwards
    # (slam.cpp:1778-1788); the blocked solver makes it affordable here
    cfg = pano_config()
    cfg.enable_gba_after_loop = True
    slam = StreamingSLAM(seq.calib, cfg, voc, max_frames=288,
                         poll_every=16)
    _run_with_injection(slam, seq)

    assert slam.loop_edges, "no loop closure fired across the gauge break"
    cur, cand = slam.loop_edges[0]
    gap = slam.frame_of_slot[cur] - slam.frame_of_slot[cand]
    assert gap > pano_config().loop_closing_time_threshold

    # control: same injection, no loop machinery -> two-gauge map
    cfg_vo = pano_config()
    cfg_vo.enable_loop_closure = False
    vo = StreamingVO(seq.calib, cfg_vo, max_frames=288)
    _run_with_injection(vo, seq)

    rmse_slam = _keyframe_ate(slam, seq)
    rmse_vo = _keyframe_ate(vo, seq)
    assert np.isfinite(rmse_slam)
    floor_sq = clean_vo_rmse ** 2
    break_vo = max(rmse_vo ** 2 - floor_sq, 0.0)
    break_slam = max(rmse_slam ** 2 - floor_sq, 0.0)
    assert break_vo > 0, (
        f"injection did not separate the gauges: vo {rmse_vo:.2f} vs "
        f"floor {clean_vo_rmse:.2f}")
    removed = 1.0 - break_slam / break_vo
    assert removed > 0.20, (
        f"closure removed only {removed:.0%} of the injected break "
        f"(slam {rmse_slam:.2f}, vo {rmse_vo:.2f}, "
        f"floor {clean_vo_rmse:.2f})")
    assert rmse_slam < rmse_vo, (rmse_slam, rmse_vo)
    assert rmse_slam < 5.0, f"absolute post-closure ATE {rmse_slam:.2f}"
    res = slam.results()
    assert res["tracked_ok"][3:].mean() > 0.9


@pytest.mark.slow
def test_closure_cooldown_keeps_consistent_map_good(pano, clean_vo_rmse):
    """On the consistent (non-injected) run a single closure is neutral
    but consecutive keyframes re-detect the same revisit and repeated
    drags compounded 4.6 -> 10.5 m ATE. The cooldown must limit closures
    to ~one per revisit, and the closed map must stay as good as plain
    VO."""
    seq, voc = pano
    slam = StreamingSLAM(seq.calib, pano_config(), voc, max_frames=288,
                         poll_every=16)
    slam.run(seq.images)
    jax.block_until_ready(slam.state.frame)
    assert len(slam.loop_edges) <= 2, (
        f"cooldown failed: {slam.loop_edges}")

    rmse_slam = _keyframe_ate(slam, seq)
    # full SLAM must stay at VO quality on a consistent map (an organic
    # ~2 m gauge separation exists at the revisit even without injection,
    # so a closure MAY fire; applied in the right direction it must not
    # degrade the map; 15% headroom covers platform arithmetic drift)
    assert rmse_slam < 1.15 * clean_vo_rmse, (rmse_slam, clean_vo_rmse)


def test_streaming_slam_requires_vocabulary(pano):
    seq, _ = pano
    with pytest.raises(ValueError):
        StreamingSLAM(seq.calib, pano_config(), None)


def test_streaming_vo_ignores_bow_state(pano):
    """VO mode must keep working with the extended state (None BoW fields).
    """
    seq, _ = pano
    cfg = pano_config()
    cfg.enable_loop_closure = False
    vo = StreamingVO(seq.calib, cfg, max_frames=32)
    vo.run(seq.images[:20])
    res = vo.results()
    assert res["frames"] == 20
    assert res["tracked_ok"][3:].all()
