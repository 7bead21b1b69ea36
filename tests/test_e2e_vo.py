"""End-to-end stereo VO on a synthetic sequence with exact ground truth.

The hermetic analogue of the reference's de-facto verification (running
./slam on EuRoC and checking ATE, README.md:36-48): build a synthetic world,
run the full pipeline (detect/describe/stereo-match/triangulate/track/BA),
and assert the keyframe-trajectory ATE.
"""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.pipeline.slam import SlamSystem


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


def test_vo_synthetic_ate(seq):
    slam = SlamSystem(seq.calib, small_config())
    for f, (img_l, img_r) in enumerate(seq.images):
        info = slam.process_frame(img_l, img_r)

    fids, est_pos, est_poses = slam.keyframe_trajectory()
    assert len(fids) >= 3, "too few keyframes"

    gt_pos = seq.poses[fids, :3]
    _, _, rmse = ate.align_svd(est_pos, gt_pos)
    # scene spans ~4.7 m; demand centimeter-level VO on clean synthetic data
    assert rmse < 0.08, f"ATE {rmse:.3f} m too high"

    # sanity: the map grew and tracking held
    kinds = [s["kind"] for s in slam.stats]
    assert kinds[0] == "keyframe"
    n_inliers = [s["inliers"] for s in slam.stats if s["kind"] == "track"]
    assert np.median(n_inliers) > 30


def test_vo_full_trajectory_error(seq):
    slam = SlamSystem(seq.calib, small_config())
    for img_l, img_r in seq.images:
        slam.process_frame(img_l, img_r)
    est = np.stack(slam.trajectory)[:, :3]
    gt = seq.poses[:, :3]
    _, _, rmse = ate.align_svd(est, gt)
    assert rmse < 0.12, f"per-frame ATE {rmse:.3f} m too high"
