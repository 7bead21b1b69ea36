"""Streaming relocalization: the reference's full default configuration
(loop closure + relocalization + GBA, slam.cpp:244-247) through the
sync-free driver.

The reference runs relocalize_camera inside its hot loop the moment the
motion gate declares loss (tracking.h:241-419, wired slam.cpp:1348-1367).
The streaming driver cannot take a per-frame host decision, so the loss
event rides the ``log_ok`` device ring and the poll recovers with one sync
(pipeline/streaming.py StreamingSLAM._try_relocalize_stream). This test is
the fault-recovery scenario (tests/test_fault_recovery.py) on the streaming
driver: mid-run sensor blackout + tracker teleport, then a replayed mapped
view; the stream must recover within a poll quantum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.frontend.features import extract_features
from vslam_tpu.geometry import lie
from vslam_tpu.loop import vocabulary as vocab_mod
from vslam_tpu.pipeline.streaming import StreamingSLAM


def _reloc_config():
    return SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=True, enable_loop_closure=False,
        new_kf_min_inliers=40, quality_level=0.001,
        # the constant-velocity gate would (correctly) reject recovery from
        # a teleport this large — same as the reference's motion_threshold;
        # widen it so the test exercises the BoW+PnP recovery itself
        motion_threshold=1000.0,
        reloc_lost_frames=2,
    )


def _train_vocab(seq, frames=(0, 3, 6, 9)):
    pool = []
    for f in frames:
        ft = extract_features(jnp.asarray(seq.images[f][0]),
                              num_features=400, quality_level=0.001)
        pool.append(np.asarray(ft.bits)[np.asarray(ft.valid)])
    voc = vocab_mod.train(np.concatenate(pool), k=10, depth=3, seed=0)
    vocab_mod.set_idf_weights(voc, pool)
    return voc


@pytest.mark.slow
def test_streaming_blackout_teleport_recovery():
    seq = synthetic.generate(num_frames=16, num_points=500, seed=3)
    voc = _train_vocab(seq)
    slam = StreamingSLAM(seq.calib, _reloc_config(), voc, max_frames=64,
                         poll_every=2)

    # ---- build the map (polls populate the recognition database) ----
    for f in range(12):
        slam.process_frame(*seq.images[f])
        slam.poll()
    assert len(slam.detector.db.bow_of) >= 3, "BoW database populated"

    # ---- fault: sensor blackout while the tracker is teleported ----
    bad_pose = jnp.asarray([50.0, 20.0, -30.0, 0, 0, 0, 1.0])
    slam.state = slam.state._replace(
        cur_pose=bad_pose, last_pose=bad_pose + 0, vel=lie.identity_pose())
    blank = np.full_like(seq.images[0][0], 100)
    for _ in range(3):
        slam.process_frame(blank, blank)
        slam.poll()
    # blackout frames carry no features: the reloc guard must not fire a
    # PnP attempt on them (every event recorded so far must be from real
    # frames — there are none yet)
    assert not slam.reloc_events, "reloc attempted on featureless frames"

    # ---- the camera re-sees a mapped view: recovery must come from the
    # BoW+PnP path (guided matching is hopeless from 60 m away) ----
    recovered_at = None
    for i in range(6):
        slam.process_frame(*seq.images[6])
        slam.poll()
        if any(ok for _, ok in slam.reloc_events):
            recovered_at = i
            break
    assert recovered_at is not None, (
        f"stream did not relocalize: events={slam.reloc_events}")
    assert recovered_at <= 3, "recovery took more than one poll quantum"

    cur = np.asarray(jax.device_get(slam.state.cur_pose))
    err = np.linalg.norm(cur[:3] - seq.poses[6][:3])
    assert err < 0.3, f"recovered pose {err:.2f} m from truth"

    # ---- tracking resumes through the normal stream path ----
    for f in range(7, 12):
        slam.process_frame(*seq.images[f])
    jax.block_until_ready(slam.state.frame)
    res = slam.results()
    assert res["tracked_ok"][-4:].all(), "tracking did not resume"
    assert np.all(np.isfinite(res["trajectory"]))


@pytest.mark.slow
def test_chunked_stream_lost_mode_recovery():
    """The same fault scenario through the CHUNKED dispatch path (r5):
    lagged polls give throughput but would react a poll period late; the
    lost-mode switch must drop the stream to synchronous per-chunk
    polling on loss so the recovery still lands promptly, then hand back
    to the deep pipeline."""
    seq = synthetic.generate(num_frames=16, num_points=500, seed=3)
    voc = _train_vocab(seq)
    cfg = _reloc_config()
    slam = StreamingSLAM(seq.calib, cfg, voc, max_frames=64,
                         poll_every=8, chunk=4)

    blank = np.full_like(seq.images[0][0], 100)
    # one continuous chunked stream: 12 mapped frames, a 4-frame blackout
    # with the tracker teleported mid-run is impossible to inject inside
    # run(), so split: map -> teleport -> (blackout + replay) stream
    packed_map = StreamingSLAM.pack_frames(
        [seq.images[f] for f in range(12)])
    slam.run(packed_map)
    assert len(slam.detector.db.bow_of) >= 3

    bad_pose = jnp.asarray([50.0, 20.0, -30.0, 0, 0, 0, 1.0])
    slam.state = slam.state._replace(
        cur_pose=bad_pose, last_pose=bad_pose + 0, vel=lie.identity_pose())
    tail = [(blank, blank)] * 4 + [seq.images[6]] * 12
    slam.run(StreamingSLAM.pack_frames(tail))
    jax.block_until_ready(slam.state.frame)

    assert any(ok for _, ok in slam.reloc_events), (
        f"chunked stream did not relocalize: events={slam.reloc_events}, "
        f"diags={slam.reloc_diags}")
    cur = np.asarray(jax.device_get(slam.state.cur_pose))
    err = np.linalg.norm(cur[:3] - seq.poses[6][:3])
    assert err < 0.5, f"recovered pose {err:.2f} m from truth"
    # the recovery must come from a mid-stream poll, not only the final
    # synchronous poll at end of run
    ok_frames = [f for f, ok in slam.reloc_events if ok]
    assert min(ok_frames) < 28, (
        f"recovery only landed at end-of-run: {slam.reloc_events}")
