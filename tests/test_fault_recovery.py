"""Fault injection: tracking loss mid-run and in-place recovery.

The reference's failure-detection analogue (SURVEY.md section 5): the
motion-model gate declares loss, the pipeline keeps running on pose
prediction, and tracking re-acquires once the view returns (guided
matching against the full map projects from the held pose)."""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.pipeline.slam import SlamSystem


@pytest.mark.slow
def test_blackout_recovery():
    seq = synthetic.generate(num_frames=16, num_points=500, seed=3)
    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=True, enable_loop_closure=False,
        new_kf_min_inliers=40, vocab_depth=3, quality_level=0.001,
    )
    slam = SlamSystem(seq.calib, cfg)
    blank = np.full_like(seq.images[0][0], 100)

    lost_frames, recovered = 0, False
    for f in range(16):
        if 8 <= f <= 10:
            info = slam.process_frame(blank, blank)  # sensor blackout
            assert not info["ok"]
            lost_frames += 1
        else:
            # camera holds position during the blackout: replay frame 8's
            # true view for the recovery frames
            idx = min(f, 8) if f <= 11 else 8
            info = slam.process_frame(*seq.images[idx])
            if f == 11:
                recovered = info["ok"]
    assert lost_frames == 3
    assert recovered, "tracking did not re-acquire after blackout"
    # state never went non-finite
    assert np.all(np.isfinite(np.asarray(slam.track.current_pose)))
    fids, est_pos, _ = slam.keyframe_trajectory()
    assert np.all(np.isfinite(est_pos))
