"""End-to-end VO through the double-sphere camera model (the EuRoC
configuration: both matching bearings and BA Jacobians flow through the ds
projection/unprojection — previously only pinhole was exercised e2e)."""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.pipeline.slam import SlamSystem


import pytest


@pytest.mark.parametrize("cam_type", ["ds", "kb4", "eucm"])
@pytest.mark.slow
def test_vo_camera_models(cam_type):
    seq = synthetic.generate(num_frames=14, num_points=500, seed=7,
                             cam_type=cam_type)
    assert seq.calib.cam_types == [cam_type, cam_type]
    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=False, enable_loop_closure=False,
        new_kf_min_inliers=60,
    )
    slam = SlamSystem(seq.calib, cfg)
    assert slam.cam_name == cam_type
    for img_l, img_r in seq.images:
        slam.process_frame(img_l, img_r)
    fids, est_pos, _ = slam.keyframe_trajectory()
    assert len(fids) >= 3
    _, _, rmse = ate.align_svd(est_pos, seq.poses[fids, :3])
    assert rmse < 0.12, f"{cam_type}-model ATE {rmse:.3f} m"
