"""StreamingVO (sync-free fused step) parity with the faithful driver.

The streaming driver must compute the same VO as
``SlamSystem(enable_relocalization=False, enable_loop_closure=False)`` —
same tracking math, same keyframe policy, same windowed BA — with all
control flow on device (see pipeline/streaming.py). Differences allowed:
keyframe poses are post-BA (synchronous solve) instead of the reference's
one-frame-lagged background merge.
"""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.pipeline.slam import SlamSystem
from vslam_tpu.pipeline.streaming import StreamingVO


def small_config():
    return SlamConfig(
        num_features=400,
        ransac_hypotheses=128,
        max_landmarks=8192,
        max_keyframes=64,
        max_inview_landmarks=512,
        window_cams=24,
        window_points=2048,
        window_obs=6144,
        ba_max_iters=10,
        enable_relocalization=False,
        enable_loop_closure=False,
        new_kf_min_inliers=60,
    )


@pytest.fixture(scope="module")
def seq():
    return synthetic.generate(num_frames=24, num_points=500, seed=3)


@pytest.fixture(scope="module")
def stream_run(seq):
    vo = StreamingVO(seq.calib, small_config(), max_frames=64)
    vo.run(seq.images, chunk=8, sync_every=16)
    return vo


def test_streaming_tracks_and_maps(stream_run, seq):
    res = stream_run.results()
    assert res["frames"] == len(seq.images)
    # first frame is a keyframe; at least a few keyframes over the run
    assert res["is_keyframe"][0]
    assert res["is_keyframe"].sum() >= 3
    # tracking held on every non-bootstrap frame
    assert res["tracked_ok"][2:].all()
    assert np.median(res["inliers"][2:]) > 30


def test_streaming_ate_matches_reference_driver(stream_run, seq):
    cfg = small_config()
    slam = SlamSystem(seq.calib, cfg)
    for img_l, img_r in seq.images:
        slam.process_frame(img_l, img_r)

    fids_a, pos_a, _ = slam.keyframe_trajectory()
    fids_b, pos_b, _ = stream_run.keyframe_trajectory()

    gt_a = seq.poses[fids_a, :3]
    gt_b = seq.poses[fids_b, :3]
    _, _, rmse_a = ate.align_svd(pos_a, gt_a)
    _, _, rmse_b = ate.align_svd(pos_b, gt_b)
    # both drivers deliver centimeter VO; streaming must not be worse than
    # the faithful driver by more than noise (post-BA poses usually help)
    assert rmse_b < 0.08, f"streaming ATE {rmse_b:.3f} m"
    assert rmse_b < max(2.0 * rmse_a, 0.05), (rmse_b, rmse_a)


def test_streaming_full_trajectory(stream_run, seq):
    res = stream_run.results()
    est = res["trajectory"][:, :3]
    gt = seq.poses[: len(est), :3]
    _, _, rmse = ate.align_svd(est, gt)
    assert rmse < 0.10, f"full-trajectory ATE {rmse:.3f} m"


def test_streaming_reset_reproducible(seq):
    cfg = small_config()
    vo = StreamingVO(seq.calib, cfg, max_frames=32)
    vo.run(seq.images[:10], chunk=8, sync_every=0)
    t1 = vo.results()["trajectory"]
    vo.reset()
    vo.run(seq.images[:10], chunk=8, sync_every=0)
    t2 = vo.results()["trajectory"]
    assert np.array_equal(t1, t2)


@pytest.mark.slow
def test_streaming_checkpoint_resume(seq, tmp_path):
    """Stop a stream mid-run, checkpoint, restore into a fresh driver,
    continue — bit-identical to the uninterrupted run."""
    from vslam_tpu.utils import checkpoint

    cfg = small_config()
    full = StreamingVO(seq.calib, cfg, max_frames=64)
    full.run(seq.images, sync_every=0)
    ref = full.results()["trajectory"]

    a = StreamingVO(seq.calib, cfg, max_frames=64)
    a.run(seq.images[:10], sync_every=0)
    import jax

    jax.block_until_ready(a.state.frame)
    checkpoint.save_stream(a, str(tmp_path / "ck"))

    b = StreamingVO(seq.calib, cfg, max_frames=64)
    checkpoint.load_stream(b, str(tmp_path / "ck"))
    b.run(seq.images[10:], sync_every=0)
    got = b.results()["trajectory"]
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("pseed", [1, 4])
@pytest.mark.slow
def test_streaming_parity_at_scale(pseed):
    """Parity at the scale the headline numbers are measured at: a
    96-frame pano-world run (perspective warps, organic keyframe cadence,
    window churn) per seed, streaming vs faithful driver. The two drivers
    may differ by the BA merge lag (streaming keyframe poses are post-BA,
    the faithful driver merges one frame later), so the bar is
    keyframe-trajectory agreement within noise, not bit-equality."""
    from vslam_tpu.synthetic_pano import generate_pano_loop

    pano = generate_pano_loop(num_frames=96, revolutions=0.8, seed=pseed)
    cfg = small_config()
    cfg.quality_level = 0.001
    cfg.match_max_dist_2d = 30.0

    vo = StreamingVO(pano.calib, cfg, max_frames=128)
    vo.run(pano.images, sync_every=0)
    slam = SlamSystem(pano.calib, cfg)
    for img_l, img_r in pano.images:
        slam.process_frame(img_l, img_r)

    fids_a, pos_a, _ = slam.keyframe_trajectory()
    fids_b, pos_b, _ = vo.keyframe_trajectory()
    # keyframe cadence is IDENTICAL over the early run (the decision math
    # is the same program; once trajectories separate — see below — the
    # inlier counts and thus the cadence follow their own paths)
    # (±1 frame: the faithful driver's pending-BA gate can defer a
    # keyframe by one frame, slam.cpp:1374-1377 !opt_running)
    ka = fids_a[fids_a < 48]
    kb = fids_b[fids_b < 48]
    m = min(len(ka), len(kb))
    assert m >= 4 and np.abs(ka[:m] - kb[:m]).max() <= 1, (
        f"early keyframe cadences diverged: {fids_a} vs {fids_b}")
    # per-FRAME trajectories agree closely over the early run (same
    # gauge — no alignment). Beyond that the BA-merge-lag difference
    # (streaming keyframe poses are post-BA, the faithful driver merges a
    # frame later) compounds chaotically through VO drift, so late-run
    # parity is asserted at the OUTCOME level (ATE) below.
    traj_b = vo.results()["trajectory"][:, :3]
    traj_a = np.asarray(slam.trajectory)[:, :3]
    d = np.linalg.norm(traj_a - traj_b, axis=1)
    # identical tracking math: bit-near-equal until the first real
    # keyframe (frame fids_b[1]), where the lag first applies (streaming
    # reports the post-BA pose, the faithful driver the pre-BA one)
    first_kf = int(fids_b[1])
    assert d[:first_kf].max() < 1e-3, (
        f"pre-keyframe disagreement {d[:first_kf].max():.5f} m")
    # Late-run outcomes: the one-frame BA-merge lag compounds chaotically
    # through VO drift on this world (per-seed ATEs span 0.5-2.8 m for
    # BOTH drivers and their ratio is not stable across platforms), so
    # the outcome-level bar is a blow-up guard, not a mutual ratio —
    # true parity is pinned above (bit-near-equal trajectories until the
    # first keyframe + identical early cadence) and by
    # test_streaming_matches_faithful_driver's 24-frame run.
    _, _, rmse_a = ate.align_svd(pos_a, pano.poses[fids_a, :3])
    _, _, rmse_b = ate.align_svd(pos_b, pano.poses[fids_b, :3])
    assert np.isfinite(rmse_a) and rmse_a < 4.5, rmse_a
    assert np.isfinite(rmse_b) and rmse_b < 4.5, rmse_b


def test_streaming_culling_under_pressure(seq):
    """Tiny landmark capacity: the in-step cull cond must recycle slots
    instead of silently dropping writes (streaming analogue of
    tests/test_lm_recycling.py)."""
    cfg = small_config()
    cfg.max_landmarks = 512          # ~1 keyframe's worth
    cfg.lm_cull_pressure = 0.5
    cfg.lm_cull_min_obs = 3
    vo = StreamingVO(seq.calib, cfg, max_frames=64)
    vo.run(seq.images, sync_every=0)
    res = vo.results()
    assert res["is_keyframe"].sum() >= 4
    # tracking survived capacity churn
    assert res["tracked_ok"][2:].mean() > 0.8
    import jax

    n_valid = int(jax.device_get(vo.state.lm.valid.sum()))
    assert n_valid <= cfg.max_landmarks
    assert n_valid > 50, "map collapsed instead of recycling"


@pytest.mark.slow
def test_chunked_dispatch_parity(stream_run, seq):
    """chunk=4 (one dispatch/h2d per 4 frames via lax.scan) must be
    bit-identical to the per-frame path — same scan body, same state; only
    the dispatch granularity changes. A 22-frame run also exercises the
    non-divisible tail (2 frames through the per-frame program)."""
    vo4 = StreamingVO(seq.calib, small_config(), max_frames=64, chunk=4)
    vo4.run(seq.images[:22])
    res4 = vo4.results()
    res1 = stream_run.results()
    np.testing.assert_array_equal(res4["trajectory"],
                                  res1["trajectory"][:22])
    np.testing.assert_array_equal(res4["is_keyframe"],
                                  res1["is_keyframe"][:22])


def test_packed_ndarray_input_parity(stream_run, seq):
    """A pre-packed contiguous [N, 2, H, W] array (StreamingVO.pack_frames,
    the zero-copy upload path) must produce the same results as the
    per-pair list input."""
    packed = StreamingVO.pack_frames(seq.images)
    vo = StreamingVO(seq.calib, small_config(), max_frames=64)
    vo.run(packed)
    res = vo.results()
    ref = stream_run.results()
    np.testing.assert_array_equal(res["trajectory"], ref["trajectory"])
    np.testing.assert_array_equal(res["is_keyframe"], ref["is_keyframe"])
