"""Benchmark: end-to-end stereo VO throughput on a real TPU chip.

Runs the full per-frame pipeline (detect + describe + project + gated
Hamming matching + RANSAC PnP + keyframing/triangulation/windowed BA when
triggered) over the EuRoC V1 sample frames bundled with the reference
(201 stereo pairs, 752x480, double-sphere calib), using the same default
hyperparameters as the reference (1500 features etc.).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.md target of 40 fps
(2x real-time EuRoC): vs_baseline = fps / 40.

Falls back to a synthetic 752x480 sequence if the sample data dir is
missing.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SAMPLE_DIR = "/root/reference/data/euroc_V1"
CALIB = "/root/reference/calibration_file/euroc_v1_123_ds_calib.json"
TARGET_FPS = 40.0
WARMUP_FRAMES = 6
MAX_FRAMES = 160


def load_frames():
    from vslam_tpu.io import calib as calib_mod
    from vslam_tpu.io import euroc

    if os.path.isdir(SAMPLE_DIR) and os.path.exists(CALIB):
        seq = euroc.load_sample_dir(SAMPLE_DIR)
        calib = calib_mod.load_calibration(CALIB)
        pf = euroc.Prefetcher(seq.image_paths, depth=12, workers=3)
        n = min(seq.num_frames, MAX_FRAMES + WARMUP_FRAMES)
        frames = [pf.get(i) for i in range(n)]
        return frames, calib
    from vslam_tpu import synthetic

    seq = synthetic.generate(num_frames=64, num_points=900,
                             width=752, height=480)
    return seq.images, seq.calib


def main():
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.pipeline.slam import SlamSystem

    frames, calib = load_frames()
    cfg = SlamConfig(
        enable_relocalization=False,  # BoW assets not bundled; VO config
        enable_loop_closure=False,
        max_landmarks=65536,
        max_keyframes=1024,
    )
    slam = SlamSystem(calib, cfg)

    # warmup: compile every program variant (track + keyframe + BA)
    for i in range(min(WARMUP_FRAMES, len(frames))):
        slam.process_frame(frames[i][0], frames[i][1])

    t0 = time.perf_counter()
    n = 0
    for i in range(WARMUP_FRAMES, len(frames)):
        slam.process_frame(frames[i][0], frames[i][1])
        n += 1
    elapsed = time.perf_counter() - t0
    fps = n / elapsed if elapsed > 0 else 0.0

    kfs = sum(1 for s in slam.stats[WARMUP_FRAMES:] if s["kind"] == "keyframe")
    print(json.dumps({
        "metric": "euroc_vo_fps",
        "value": round(fps, 2),
        "unit": "frames/sec (752x480 stereo, 1500 feats, windowed BA)",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "frames": n,
        "keyframes": kfs,
    }))


if __name__ == "__main__":
    main()
