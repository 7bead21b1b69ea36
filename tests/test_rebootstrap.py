"""Sustained-loss re-bootstrap (r4, cfg.lost_rebootstrap_frames).

The reference keyframes lost frames unconditionally (slam.cpp:1374-1377),
so its map keeps extending through a tracking loss in a drifted gauge.
The streaming driver blocks lost-frame keyframes while relocalization has
a shot at a clean recovery; after ``lost_rebootstrap_frames`` consecutive
losses a frame with enough features re-bootstraps mapping anyway —
without it, a permanent reloc failure froze the map forever (the r3
bench's 0.469 m "SLAM" ATE covered only 40% of its trajectory).
"""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.pipeline.streaming import StreamingVO


def _cfg(reboot):
    return SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=False, enable_loop_closure=False,
        kf_require_tracked=True, new_kf_min_inliers=40,
        quality_level=0.001, lost_rebootstrap_frames=reboot)


@pytest.fixture(scope="module")
def worlds():
    # world B's texture is unrelated to A's: tracking cannot survive the
    # cut, but B's frames carry plenty of features (unlike a blackout)
    a = synthetic.generate(num_frames=10, num_points=500, seed=3)
    b = synthetic.generate(num_frames=14, num_points=500, seed=11)
    return a, b


def _run(worlds, reboot):
    a, b = worlds
    vo = StreamingVO(a.calib, _cfg(reboot), max_frames=40)
    vo.run(a.images[:8])
    vo.run(b.images)
    res = vo.results()
    return res


def test_rebootstrap_resumes_mapping(worlds):
    res = _run(worlds, reboot=4)
    ok = np.asarray(res["tracked_ok"])
    kf = np.asarray(res["is_keyframe"])
    assert ok[:8].sum() >= 6, "world-A segment should track"
    cut = 8
    assert not ok[cut:cut + 3].any(), "the cut must lose tracking"
    # a re-bootstrap keyframe lands once the loss exceeds the threshold
    reboot_kfs = np.nonzero(kf[cut:])[0]
    assert len(reboot_kfs) >= 1, "no re-bootstrap keyframe inserted"
    assert reboot_kfs[0] >= 4, "re-bootstrap fired before the threshold"
    # and tracking RESUMES against the re-bootstrapped map
    assert ok[cut + int(reboot_kfs[0]) + 1:].sum() >= 3, (
        "tracking did not resume after the re-bootstrap")


def test_rebootstrap_disabled_freezes_map(worlds):
    res = _run(worlds, reboot=0)
    ok = np.asarray(res["tracked_ok"])
    kf = np.asarray(res["is_keyframe"])
    assert not kf[8:].any(), "0 must disable the re-bootstrap"
    assert not ok[9:].any(), "without re-bootstrap the loss is permanent"
