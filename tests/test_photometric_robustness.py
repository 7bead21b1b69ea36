"""VO robustness under EuRoC-like photometric degradation.

The reference is only ever validated on real MAV footage — sensor noise,
auto-exposure drift, motion blur, vignetting (README.md:36-48). Clean
synthetic renders don't stress the frontend the same way, so this applies
``synthetic.degrade`` (noise + exposure random walk + blur + vignette) and
requires the full pipeline to keep tracking and centimeter-level ATE
(VERDICT round 1, item 8: extend synthetic worlds toward EuRoC-like
photometrics).
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
def degraded_seq():
    seq = synthetic.generate(num_frames=24, num_points=500, seed=3)
    images = synthetic.degrade(seq.images, seed=3)
    return seq, images


def test_degradation_actually_degrades(degraded_seq):
    seq, images = degraded_seq
    clean = seq.images[5][0].astype(np.int32)
    dirty = images[5][0].astype(np.int32)
    # visible change, but not a destroyed image
    diff = np.abs(clean - dirty).mean()
    assert 2.0 < diff < 60.0, f"mean abs diff {diff}"
    # exposure gain varies over the run
    means = [im[0].astype(np.float64).mean() for im in images]
    assert np.ptp(means) > 2.0


@pytest.mark.slow
def test_vo_survives_photometric_degradation(degraded_seq):
    seq, images = degraded_seq
    slam = SlamSystem(seq.calib, small_config())
    for img_l, img_r in images:
        slam.process_frame(img_l, img_r)

    fids, est_pos, _ = slam.keyframe_trajectory()
    assert len(fids) >= 3
    gt_pos = seq.poses[fids, :3]
    _, _, rmse = ate.align_svd(est_pos, gt_pos)
    # clean-render bound is 0.08 m (test_e2e_vo); allow a modest hit
    assert rmse < 0.15, f"ATE {rmse:.3f} m under degradation"
    n_inl = [s["inliers"] for s in slam.stats if s["kind"] == "track"]
    assert np.median(n_inl) > 20
    ok = [s["ok"] for s in slam.stats[1:]]
    assert np.mean(ok) > 0.9, "tracking lost under degradation"
