"""suppress_duplicate_landmarks: fewer landmarks, tracking quality kept."""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.pipeline.slam import SlamSystem


def run(suppress):
    seq = synthetic.generate(num_frames=12, num_points=500, seed=3)
    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=False, enable_loop_closure=False,
        new_kf_min_inliers=60, suppress_duplicate_landmarks=suppress,
    )
    slam = SlamSystem(seq.calib, cfg)
    for img_l, img_r in seq.images:
        slam.process_frame(img_l, img_r)
    fids, est_pos, _ = slam.keyframe_trajectory()
    _, _, rmse = ate.align_svd(est_pos, seq.poses[fids, :3])
    n_lm = int(np.asarray(slam.lm.valid).sum())
    return rmse, n_lm


@pytest.mark.slow
def test_duplicate_suppression():
    rmse_off, n_off = run(False)
    rmse_on, n_on = run(True)
    assert n_on < n_off, (n_on, n_off)        # fewer duplicate landmarks
    assert rmse_on < max(rmse_off * 1.5, 0.12)  # accuracy not degraded
