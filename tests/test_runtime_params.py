"""Live-tunable runtime parameters (the reference's ~40 pangolin::Var
values are mutable during a run, slam.cpp:223-310).

DEVICE_TUNABLE gate scalars ride in the streaming state as a float32
vector (config.DEVICE_TUNABLE), so ``set_param`` changes them mid-run with
ZERO recompilation of the fused step; HOST_TUNABLE fields mutate the
config object the host orchestration re-reads per call; shape-determining
fields raise. The faithful SlamSystem passes its thresholds as traced
per-call arguments, so ``set_params`` is live there by construction.
"""

import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import DEVICE_TUNABLE, SlamConfig, TUNE_INDEX
from vslam_tpu.pipeline.slam import SlamSystem
from vslam_tpu.pipeline.streaming import StreamingVO
from tests.test_streaming import small_config


@pytest.fixture(scope="module")
def seq():
    return synthetic.generate(num_frames=16, num_points=500, seed=3)


def test_tune_vector_matches_registry():
    cfg = SlamConfig()
    vec = cfg.tune_vector()
    assert len(vec) == len(DEVICE_TUNABLE)
    assert vec[TUNE_INDEX["match_max_dist"]] == 70.0
    assert vec[TUNE_INDEX["new_kf_min_inliers"]] == 80.0


@pytest.mark.slow
def test_stream_set_param_applies_without_recompile(seq):
    import jax

    vo = StreamingVO(seq.calib, small_config(), max_frames=32)
    for left, right in seq.images[:8]:
        vo.process_frame(left, right)
    jax.block_until_ready(vo.state.frame)
    cache_before = vo._step._cache_size()

    # force the maximum keyframe cadence: with an impossible inlier bar
    # every other frame keyframes (a KF consumes the armed bit for one
    # frame, mirroring the reference's !opt_running gate)
    vo.set_param("new_kf_min_inliers", 10 ** 6)
    for left, right in seq.images[8:]:
        vo.process_frame(left, right)
    jax.block_until_ready(vo.state.frame)

    assert vo._step._cache_size() == cache_before  # no recompilation
    res = vo.results()
    tail = res["is_keyframe"][8:]
    assert tail.sum() >= len(tail) // 2  # max cadence after the change
    assert res["is_keyframe"][2:8].sum() <= 2  # normal cadence before


def test_stream_set_param_can_kill_the_match_gate(seq):
    vo = StreamingVO(seq.calib, small_config(), max_frames=32)
    vo.set_param("match_max_dist_2d", 0.0)  # no guided match can pass
    for left, right in seq.images[:6]:
        vo.process_frame(left, right)
    assert not vo.results()["tracked_ok"].any()


def test_stream_static_param_raises(seq):
    vo = StreamingVO(seq.calib, small_config(), max_frames=32)
    with pytest.raises(ValueError, match="not live-tunable"):
        vo.set_param("num_features", 2000)
    with pytest.raises(ValueError, match="not live-tunable"):
        vo.set_param("max_keyframes", 4096)


def test_stream_host_tunable_mutates_config(seq):
    vo = StreamingVO(seq.calib, small_config(), max_frames=32)
    vo.set_param("loop_verify_px", 22.0)
    assert vo.cfg.loop_verify_px == 22.0


def test_faithful_set_param_rederives_pnp_threshold(seq):
    slam = SlamSystem(seq.calib, small_config())
    before = slam.pnp_threshold
    slam.set_param("pnp_inlier_thresh_px", 6.0)
    assert slam.cfg.pnp_inlier_thresh_px == 6.0
    assert slam.pnp_threshold > before
    with pytest.raises(AttributeError):
        slam.set_param("not_a_field", 1)
