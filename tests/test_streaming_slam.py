"""StreamingSLAM: organic loop closure through the sync-free stream.

The streaming full-SLAM driver must reproduce what SlamSystem's loop
machinery does (detection from appearance, compute_sim3, verification,
essential-graph correction) with the host only polling keyframe events in
batches. Uses the cylindrical-pano world like tests/test_pano_world.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.frontend.features import extract_features
from vslam_tpu.loop import vocabulary as vocab_mod
from vslam_tpu.pipeline.streaming import StreamingSLAM, StreamingVO
from vslam_tpu.synthetic_pano import generate_pano_loop


def pano_config():
    return SlamConfig(
        num_features=600, ransac_hypotheses=128, max_landmarks=32768,
        max_keyframes=128, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=10,
        enable_relocalization=False, enable_loop_closure=True,
        enable_gba_after_loop=False,
        new_kf_min_inliers=60, loop_closing_time_threshold=20,
        quality_level=0.001, match_max_dist_2d=30.0,
    )


@pytest.fixture(scope="module")
def pano():
    seq = generate_pano_loop(num_frames=256, revolutions=1.75, seed=2)
    pool = []
    for f in range(0, 256, 8):
        ft = extract_features(jnp.asarray(seq.images[f][0]),
                              num_features=600, quality_level=0.001)
        pool.append(np.asarray(ft.bits)[np.asarray(ft.valid)])
    voc = vocab_mod.train(np.concatenate(pool), k=10, depth=4, seed=0)
    vocab_mod.set_idf_weights(voc, pool)
    return seq, voc


def test_streaming_slam_closes_loop_organically(pano):
    seq, voc = pano
    slam = StreamingSLAM(seq.calib, pano_config(), voc, max_frames=288,
                         poll_every=16)
    slam.run(seq.images)

    assert slam.loop_edges, "no loop closure fired through the stream"
    cur, cand = slam.loop_edges[0]
    # the closure must span the revisit, not adjacent keyframes
    gap = slam.frame_of_slot[cur] - slam.frame_of_slot[cand]
    assert gap > pano_config().loop_closing_time_threshold

    # the closure must not degrade the map. (Historical failure mode: a
    # late-applied closure in the old gauge wrecked the map to 19-130 m;
    # and before the gain-ratio LM fix the window BA itself exploded
    # keyframe poses to km. The drift-CUTTING value of the pose graph is
    # pinned by tests/test_e2e_loop.py on injected drift — after the LM
    # fix this well-tracked orbit has only a few meters of drift left.)
    fids, pos, _ = slam.keyframe_trajectory()
    gt = seq.poses[fids, :3]
    _, _, rmse = ate.align_svd(pos, gt)
    assert np.isfinite(rmse)
    assert rmse < 12.0, f"post-closure keyframe ATE {rmse:.2f} m"

    cfg_vo = pano_config()
    cfg_vo.enable_loop_closure = False
    vo = StreamingVO(seq.calib, cfg_vo, max_frames=288)
    vo.run(seq.images)
    fids_v, pos_v, _ = vo.keyframe_trajectory()
    _, _, rmse_vo = ate.align_svd(pos_v, seq.poses[fids_v, :3])
    assert rmse < max(2.0 * rmse_vo, 8.0), (
        f"closure degraded the map: {rmse:.2f} vs VO {rmse_vo:.2f}")

    res = slam.results()
    assert res["tracked_ok"][3:].mean() > 0.9


def test_streaming_slam_requires_vocabulary(pano):
    seq, _ = pano
    with pytest.raises(ValueError):
        StreamingSLAM(seq.calib, pano_config(), None)


def test_streaming_vo_ignores_bow_state(pano):
    """VO mode must keep working with the extended state (None BoW fields).
    """
    seq, _ = pano
    cfg = pano_config()
    cfg.enable_loop_closure = False
    vo = StreamingVO(seq.calib, cfg, max_frames=32)
    vo.run(seq.images[:20])
    res = vo.results()
    assert res["frames"] == 20
    assert res["tracked_ok"][3:].all()
