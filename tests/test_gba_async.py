"""Async global BA with modified-flag skip-merge.

The reference runs global BA on a background thread after a loop closure
(slam.cpp:1778-1788) and, when merging the finished solve, skips every
camera/landmark modified since the snapshot (slam.cpp:1410-1447) so work
that landed during the multi-second solve survives. This test reproduces
that overlap: dispatch a GBA on a live map, land new keyframes + window-BA
merges while it is "in flight", then skip-merge and check who moved.
"""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.pipeline import ba_global
from vslam_tpu.pipeline.slam import SlamSystem


def _cfg():
    return SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=False, enable_loop_closure=False,
        new_kf_min_inliers=65, quality_level=0.001,
        max_num_kfs=2,  # small window so old keyframes deactivate
    )


@pytest.mark.slow
def test_gba_skip_merge_preserves_interim_work():
    seq = synthetic.generate(num_frames=16, num_points=500, seed=3)
    slam = SlamSystem(seq.calib, _cfg())
    for f in range(12):
        slam.process_frame(*seq.images[f])
    slam._merge_pending_ba(force=True)

    # snapshot + dispatch (the background global_ba thread starts)
    pending = ba_global.dispatch_global_ba(
        slam.kf, slam.lm, slam.intr0, slam.intr1, cam_name=slam.cam_name)
    n_kf_snap = int(pending.n_kf)

    # work lands while the solve is in flight: more frames, new keyframes,
    # window-BA merges
    for f in range(12, 16):
        slam.process_frame(*seq.images[f])
    slam._merge_pending_ba(force=True)

    new_slots = [s for s in slam.slot_of_frame.values() if s >= n_kf_snap]
    assert new_slots, "no keyframe landed during the solve — test is vacuous"

    poses_before = np.asarray(slam.kf.pose_l).copy()
    points_before = np.asarray(slam.lm.pos).copy()
    active_now = np.asarray(slam.kf.active).copy()
    snap_active = np.asarray(pending.snap_active_kf)
    valid = np.asarray(slam.kf.valid)

    kf2, lm2 = ba_global.merge_global_ba(slam.kf, slam.lm, pending)
    pl2 = np.asarray(kf2.pose_l)

    # 1) keyframes created during the solve keep their poses bit-for-bit
    for s in new_slots:
        np.testing.assert_array_equal(pl2[s], poses_before[s])
    # 2) keyframes touched by interim window BA (active at snapshot or at
    #    merge) keep their newer poses
    modified = snap_active | active_now
    for s in np.nonzero(modified & valid)[0]:
        np.testing.assert_array_equal(pl2[s], poses_before[s])
    # 3) the merge is not vacuous: unmodified snapshot keyframes exist and
    #    took the (finite) GBA result
    eligible = valid & ~modified & (np.arange(len(valid)) < n_kf_snap)
    assert eligible.any(), "window too large: every keyframe was modified"
    assert np.all(np.isfinite(pl2[eligible]))
    # 4) landmark skip rule mirrors it
    lvalid = np.asarray(lm2.valid)
    lmod = np.asarray(pending.snap_active_lm) | np.asarray(slam.lm.active)
    lpos2 = np.asarray(lm2.pos)
    keep = lvalid & lmod
    np.testing.assert_array_equal(lpos2[keep], points_before[keep])
    assert np.all(np.isfinite(lpos2[lvalid]))


def test_driver_merges_async_gba():
    """SlamSystem path: pose_graph_done -> async dispatch on the next
    keyframe step -> skip-merge on a later frame, tracking alive
    throughout."""
    seq = synthetic.generate(num_frames=16, num_points=500, seed=3)
    slam = SlamSystem(seq.calib, _cfg())
    for f in range(8):
        slam.process_frame(*seq.images[f])
    # pretend a loop closure just corrected the pose graph
    slam.pose_graph_done = True
    slam.take_keyframe = True
    for f in range(8, 16):
        slam.process_frame(*seq.images[f])
    assert slam._pending_gba is not None or slam.gba_merges >= 1
    fids, est_pos, _ = slam.keyframe_trajectory()  # force-merges
    assert slam._pending_gba is None
    assert slam.gba_merges >= 1
    assert np.all(np.isfinite(est_pos))
    ok_frames = [s for s in slam.stats if s.get("ok")]
    assert len(ok_frames) >= 12, "tracking died during the async GBA"
