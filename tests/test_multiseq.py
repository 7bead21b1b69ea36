import jax
import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.eval import ate
from vslam_tpu.parallel.mesh import make_mesh
from vslam_tpu.parallel.multiseq_runner import MultiSeqVO


@pytest.mark.slow
def test_multiseq_vo_two_sequences():
    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=False, enable_loop_closure=False,
        new_kf_min_inliers=60,
    )
    seq_a = synthetic.generate(num_frames=12, num_points=500, seed=3)
    seq_b = synthetic.generate(num_frames=12, num_points=500, seed=11)

    ms = MultiSeqVO(seq_a.calib, num_sequences=2, config=cfg)
    for f in range(12):
        imgs_l = np.stack([seq_a.images[f][0], seq_b.images[f][0]])
        imgs_r = np.stack([seq_a.images[f][1], seq_b.images[f][1]])
        ms.process_frames(imgs_l, imgs_r)

    for s, seq in enumerate([seq_a, seq_b]):
        est = np.stack(ms.trajectories[s])[:, :3]
        _, _, rmse = ate.align_svd(est, seq.poses[:, :3])
        assert rmse < 0.15, f"seq {s}: ATE {rmse:.3f}"
        # maps grew independently
        assert int(np.asarray(ms.lm.valid[s]).sum()) > 50


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
@pytest.mark.slow
def test_multiseq_vo_sharded_over_mesh():
    """One sequence per device over the 'data' mesh axis (configs[3])."""
    cfg = SlamConfig(
        num_features=256, ransac_hypotheses=64, max_landmarks=4096,
        max_keyframes=32, max_inview_landmarks=256, window_cams=24,
        window_points=1024, window_obs=3072, ba_max_iters=5,
        enable_relocalization=False, enable_loop_closure=False,
        new_kf_min_inliers=60,
    )
    seq_a = synthetic.generate(num_frames=6, num_points=400, seed=3)
    seq_b = synthetic.generate(num_frames=6, num_points=400, seed=11)
    mesh = make_mesh(2, axes=("data",))
    ms = MultiSeqVO(seq_a.calib, num_sequences=2, config=cfg, mesh=mesh)
    for f in range(6):
        imgs_l = np.stack([seq_a.images[f][0], seq_b.images[f][0]])
        imgs_r = np.stack([seq_a.images[f][1], seq_b.images[f][1]])
        ms.process_frames(imgs_l, imgs_r)
    for s in range(2):
        assert int(np.asarray(ms.lm.valid[s]).sum()) > 30
        assert np.all(np.isfinite(np.stack(ms.trajectories[s])))
