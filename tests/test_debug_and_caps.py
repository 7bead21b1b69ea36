import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.pipeline.slam import SlamSystem
from vslam_tpu.utils.debug import assert_finite_state, find_nonfinite


def small_cfg(**kw):
    base = dict(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=6,
        enable_relocalization=False, enable_loop_closure=False,
        new_kf_min_inliers=60,
    )
    base.update(kw)
    return SlamConfig(**base)


@pytest.mark.slow
def test_debug_checks_pass_on_healthy_run():
    seq = synthetic.generate(num_frames=6, num_points=400, seed=1)
    slam = SlamSystem(seq.calib, small_cfg(debug_checks=True))
    for img_l, img_r in seq.images:
        slam.process_frame(img_l, img_r)  # raises on non-finite state


def test_debug_checks_catch_corruption():
    seq = synthetic.generate(num_frames=4, num_points=400, seed=1)
    slam = SlamSystem(seq.calib, small_cfg(debug_checks=True))
    slam.process_frame(*seq.images[0])
    # corrupt a keypoint record (never rewritten by BA merges, unlike
    # landmark positions which the pending window BA would repair)
    slam.kf = slam.kf._replace(
        corners=slam.kf.corners.at[0, 0, 0, 0].set(jnp.nan))
    with pytest.raises(FloatingPointError):
        slam.process_frame(*seq.images[1])
    bad = find_nonfinite(slam.kf)
    assert "corners" in bad


@pytest.mark.slow
def test_capacity_overflow_is_graceful():
    seq = synthetic.generate(num_frames=10, num_points=400, seed=1)
    # tiny caps: landmark and keyframe arrays overflow quickly
    slam = SlamSystem(seq.calib, small_cfg(max_landmarks=128,
                                           max_keyframes=4,
                                           new_kf_min_inliers=100))
    for img_l, img_r in seq.images:
        info = slam.process_frame(img_l, img_r)  # must not crash
    assert int(jnp.sum(slam.lm.valid)) <= 128
    assert np.all(np.isfinite(np.asarray(slam.track.current_pose)))
    assert getattr(slam, "_warned_lm_cap", False) or \
        getattr(slam, "_warned_kf_cap", False)
