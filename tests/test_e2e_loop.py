"""End-to-end full-SLAM run on a closed-loop orbit (relocalization + loop
closure machinery enabled, online vocabulary training).

Asserts bounded drift over a full 360-degree orbit and that the loop/reloc
code paths execute without corrupting the state. (Organic BoW loop
detection on the sprite-rendered synthetic world is exercised but not
asserted — tests/test_loop_closure.py covers the closure machinery
deterministically.)
"""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.pipeline.slam import SlamSystem


def loop_config():
    return SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=16384,
        max_keyframes=128, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=10,
        enable_relocalization=True, enable_loop_closure=True,
        new_kf_min_inliers=40, loop_closing_time_threshold=20,
        vocab_depth=3, quality_level=0.001,
        num_cov_threshold=5, num_ess_threshold=10,
    )


@pytest.mark.slow
def test_full_slam_orbit():
    seq = synthetic.generate(num_frames=96, num_points=400, seed=5,
                             motion="loop")
    slam = SlamSystem(seq.calib, loop_config())
    for img_l, img_r in seq.images:
        slam.process_frame(img_l, img_r)

    fids, est_pos, _ = slam.keyframe_trajectory()
    assert np.all(np.isfinite(est_pos)), "state corrupted (non-finite poses)"
    _, _, rmse = ate.align_svd(est_pos, seq.poses[fids, :3])
    # full 360-degree orbit of radius 3 (~19 m path): demand bounded drift.
    # f32 accumulation makes the exact number environment-sensitive
    # (0.35-0.85 m observed between single- and multi-device CPU runs), so
    # bound loosely — the deterministic loop-closure machinery checks live
    # in test_loop_closure.py.
    assert rmse < 1.2, f"ATE {rmse:.3f} m too high"

    # tracking was alive for most of the run
    ok_frames = sum(1 for s in slam.stats if s.get("ok"))
    assert ok_frames > len(slam.stats) * 0.6

    # the BoW pipeline ran: vocabulary trained, database populated
    assert slam.voc is not None
    assert len(slam.detector.db.bow_of) > 10
