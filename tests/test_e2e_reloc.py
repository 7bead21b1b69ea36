"""End-to-end relocalization: corrupt the tracker's pose (teleport), replay
a previously-seen view, and require recovery through the BoW candidate +
PnP path (tracking.h:241-419 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.geometry import lie
from vslam_tpu.pipeline.slam import SlamSystem


@pytest.mark.slow
def test_relocalization_recovers_from_teleport():
    seq = synthetic.generate(num_frames=16, num_points=500, seed=3)
    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=True, enable_loop_closure=False,
        new_kf_min_inliers=40, vocab_depth=3, quality_level=0.001,
        # the constant-velocity gate would (correctly) reject recovery from
        # a teleport this large — same as the reference's motion_threshold;
        # widen it so the test exercises the BoW+PnP recovery itself
        motion_threshold=1000.0,
    )
    slam = SlamSystem(seq.calib, cfg)
    for f in range(12):
        slam.process_frame(*seq.images[f])
    assert slam.device_voc is not None, "vocabulary should be trained"
    assert len(slam.detector.db.bow_of) >= 3, "BoW database populated"

    # teleport: corrupt the pose estimate far away and kill the velocity
    bad_pose = jnp.asarray([50.0, 20.0, -30.0, 0, 0, 0, 1.0])
    slam.track = slam.track._replace(current_pose=bad_pose,
                                     last_pose=bad_pose,
                                     vel=lie.identity_pose())
    slam.tracking_ok = False

    # replay an already-seen view: guided matching can't work from the
    # corrupted pose, so recovery must come from relocalization
    info = slam.process_frame(*seq.images[6])
    assert info["ok"], f"relocalization failed: {info}"
    recovered = np.asarray(slam.track.current_pose)
    err = np.linalg.norm(recovered[:3] - seq.poses[6][:3])
    assert err < 0.3, f"recovered pose {err:.2f} m from truth"
