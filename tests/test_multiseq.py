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


@pytest.mark.slow
def test_multiseq_chunked_dispatch_parity():
    """chunk=4 (lax.scan over lockstep frames, packed [N,2,S,H,W] input)
    must match the per-frame path bit-for-bit; a 10-frame run also
    exercises the 2-frame tail through the per-frame program. (On the
    tunneled chip chunking is throughput-neutral for multiseq — the
    dispatch overhead is already amortized over S sequences — but the
    path exists for faster links and must stay correct.)"""
    S, N = 2, 10
    seqs = [synthetic.generate(num_frames=N, num_points=400, seed=10 + s)
            for s in range(S)]
    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=4096,
        max_keyframes=32, max_inview_landmarks=512, window_cams=24,
        window_points=1024, window_obs=3072, ba_max_iters=6,
        enable_relocalization=False, enable_loop_closure=False)
    frames = [(np.stack([s.images[f][0] for s in seqs]),
               np.stack([s.images[f][1] for s in seqs]))
              for f in range(N)]
    outs = {}
    for chunk in (1, 4):
        vo = MultiSeqVO(seqs[0].calib, S, cfg, chunk=chunk)
        vo.run(frames if chunk == 1 else MultiSeqVO.pack_frames(frames))
        outs[chunk] = vo.results()
    np.testing.assert_array_equal(outs[1]["trajectories"],
                                  outs[4]["trajectories"])
    np.testing.assert_array_equal(outs[1]["is_keyframe"],
                                  outs[4]["is_keyframe"])
