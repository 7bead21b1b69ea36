"""Loss-scaled relocalization motion gate (r4).

The reference relocalizes on EVERY lost frame (slam.cpp:1355-1359), so
its motion gate compares against a one-frame-old motion model. A
poll-granularity recovery arrives ``frames_lost`` frames late with the
coasted pose frozen near the loss point; the fresh-loss gate must widen
linearly with the loss length or every correct late recovery is rejected
(the r3 bench measured 0-for-12 exactly because of this).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.config import SlamConfig
from vslam_tpu.geometry import lie
from vslam_tpu.loop import relocalize as reloc_mod
from vslam_tpu.pipeline.slam import SlamSystem


@pytest.fixture(scope="module")
def mapped():
    seq = synthetic.generate(num_frames=16, num_points=500, seed=3)
    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=8,
        enable_relocalization=True, enable_loop_closure=False,
        new_kf_min_inliers=40, vocab_depth=3, quality_level=0.001)
    slam = SlamSystem(seq.calib, cfg)
    for f in range(12):
        slam.process_frame(*seq.images[f])
    assert slam.device_voc is not None
    return slam, seq


def _attempt(slam, seq, frames_lost, coast_offset_m, gate_cap_mult=12):
    """One relocalize() call from a coasted pose ``coast_offset_m`` from
    the true pose of the replayed (already-mapped) view."""
    res, _ = slam._run_tracking(seq.images[6][0])
    bow = slam._bow_of(res.feats)
    assert bow
    true_pose = jnp.asarray(seq.poses[6], jnp.float32)
    coast = true_pose.at[0].add(coast_offset_m)
    ok, T_wc, _pairs, diag = reloc_mod.relocalize(
        slam.kf, slam.lm, slam.detector,
        res.feats.bits, res.feats.valid, res.feats.corners, bow,
        slam._graph_sets(), coast, lie.identity_pose(),
        slam.intr0, slam.cam_name, slam.cfg.motion_threshold,
        slam.pnp_threshold, jax.random.PRNGKey(7),
        num_hypotheses=slam.cfg.ransac_hypotheses,
        max_retries=slam.cfg.track_max_retries,
        max_candidates=slam.cfg.reloc_max_candidates,
        frames_lost=frames_lost, gate_cap_mult=gate_cap_mult)
    return ok, T_wc, diag


def test_fresh_loss_keeps_reference_gate(mapped):
    """frames_lost=1: the default 0.5 m gate must reject a recovery 3 m
    from the motion model (reference tracking.h:388-405 semantics)."""
    slam, seq = mapped
    ok, _, diag = _attempt(slam, seq, frames_lost=1, coast_offset_m=3.0)
    assert diag["gate"] == pytest.approx(slam.cfg.motion_threshold)
    assert not ok, f"fresh-loss gate should reject a 3 m jump: {diag}"
    # PnP itself found the pose — the gate is what rejected it
    assert diag["best_n"] >= 10, diag
    assert diag["best_gate_err"] is not None and diag["best_gate_err"] > \
        slam.cfg.motion_threshold


def test_late_recovery_passes_scaled_gate(mapped):
    """The same 3 m-displaced recovery is ACCEPTED when the loss is 20
    frames old (gate 0.5 * min(20, cap=12) = 6 m), and lands on the true
    pose."""
    slam, seq = mapped
    ok, T_wc, diag = _attempt(slam, seq, frames_lost=20,
                              coast_offset_m=3.0)
    assert diag["gate"] == pytest.approx(6.0)
    assert ok, f"scaled gate should accept: {diag}"
    err = float(np.linalg.norm(np.asarray(T_wc)[:3] - seq.poses[6][:3]))
    assert err < 0.3, f"recovered pose {err:.2f} m from truth"


def test_gate_cap_bounds_very_long_losses(mapped):
    """r4 advisor: the scaled gate must not grow unboundedly. A 1000-frame
    loss with a tight cap keeps the gate at motion_threshold * cap, and a
    recovery farther than that is rejected (falls through to the
    sustained-loss re-bootstrap instead of unbounded-gate acceptance)."""
    slam, seq = mapped
    ok, _, diag = _attempt(slam, seq, frames_lost=1000, coast_offset_m=3.0,
                           gate_cap_mult=4)
    assert diag["gate"] == pytest.approx(
        4 * slam.cfg.motion_threshold)
    assert not ok, f"capped gate should reject a 3 m jump: {diag}"
