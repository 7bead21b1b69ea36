"""Benchmark: end-to-end stereo VO throughput on a real TPU chip.

Runs the full per-frame pipeline (detect + describe + project + gated
Hamming matching via the Pallas kernels + RANSAC PnP + keyframing /
triangulation / windowed Schur BA when triggered) at EuRoC scale
(752x480 stereo, 1500 features, reference hyperparameters), using the
sync-free streaming driver (pipeline/streaming.py — one fused XLA program
per frame, device-side keyframe decision, no per-frame host round trips).

Workload: a synthetic EuRoC-like sequence at full resolution, so tracking
is live and the keyframe cadence is realistic. (The 201 sample frames
bundled with the reference are 7-second-apart snapshots — tracking cannot
persist across them, which would skew the keyframe fraction; pass
--sample to measure on them anyway. --driver slam measures the faithful
per-frame-sync driver instead.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus a
secondary multi-sequence throughput figure (BASELINE.json configs[3]:
8 sequences tracked lockstep on one chip). vs_baseline is against the
BASELINE.md target of 40 fps (2x real-time EuRoC): vs_baseline = fps / 40.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

TARGET_FPS = 40.0
WARMUP_FRAMES = 8
SAMPLE_DIR = "/root/reference/data/euroc_V1"
CALIB = "/root/reference/calibration_file/euroc_v1_123_ds_calib.json"


def load_workload(use_sample: bool, num_frames: int):
    if use_sample and os.path.isdir(SAMPLE_DIR) and os.path.exists(CALIB):
        from vslam_tpu.io import calib as calib_mod
        from vslam_tpu.io import euroc

        seq = euroc.load_sample_dir(SAMPLE_DIR)
        calib = calib_mod.load_calibration(CALIB)
        pf = euroc.Prefetcher(seq.image_paths, depth=12, workers=3)
        n = min(seq.num_frames, 126)
        return [pf.get(i) for i in range(n)], calib, "euroc_sample"
    from vslam_tpu import synthetic

    # speed=3 churns the visible landmark set so the keyframe cadence (and
    # therefore the BA cost) is realistic, not a tracking-only best case
    seq = synthetic.generate(num_frames=num_frames, num_points=1200,
                             width=752, height=480, seed=2, speed=3.0)
    return seq.images, seq.calib, "synthetic_752x480"


def _probe_backend(timeout_s: int = 240) -> bool:
    """Check the accelerator tunnel is alive before committing to it.

    A dead/wedged axon relay makes jax.devices() hang forever; probe in a
    subprocess with a timeout and fall back to CPU so the bench always
    produces its JSON line.
    """
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, timeout=timeout_s, text=True)
        return "tpu" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def bench_single(frames, calib, use_slam_driver: bool):
    from vslam_tpu.config import SlamConfig

    cfg = SlamConfig(
        enable_relocalization=False,  # VO configuration (BoW asset-free)
        enable_loop_closure=False,
        max_landmarks=65536,
        max_keyframes=1024,
    )
    if use_slam_driver:
        from vslam_tpu.pipeline.slam import SlamSystem

        slam = SlamSystem(calib, cfg)
        for i in range(min(WARMUP_FRAMES, len(frames))):
            slam.process_frame(frames[i][0], frames[i][1])
        t0 = time.perf_counter()
        n = 0
        for i in range(WARMUP_FRAMES, len(frames)):
            slam.process_frame(frames[i][0], frames[i][1])
            n += 1
        elapsed = time.perf_counter() - t0
        stats = slam.stats[WARMUP_FRAMES:]
        kfs = sum(1 for s in stats if s["kind"] == "keyframe")
        tracked = sum(1 for s in stats if s.get("ok"))
        return n / elapsed, n, kfs, tracked, None, [n / elapsed]

    from vslam_tpu.pipeline.streaming import StreamingVO

    import jax

    # the tunneled device shows +/-30% run-to-run interference; run
    # REPEATS fresh runs (compiles are shared via the jit cache) and
    # report the MEDIAN as the headline, with every run recorded so the
    # artifact carries the dispersion
    REPEATS = 5 if os.environ.get("JAX_PLATFORMS") != "cpu" else 1
    n = len(frames) - WARMUP_FRAMES
    runs = []
    for _ in range(REPEATS):
        vo = StreamingVO(calib, cfg, max_frames=len(frames) + 8)
        # warmup: compile both branches (the first frames include keyframes
        # and tracking frames) and flush the pipeline
        vo.run(frames[:WARMUP_FRAMES], sync_every=0)
        jax.block_until_ready(vo.state.frame)
        t0 = time.perf_counter()
        vo.run(frames[WARMUP_FRAMES:], sync_every=256)
        jax.block_until_ready(vo.state.frame)
        runs.append(n / (time.perf_counter() - t0))
    runs.sort()
    res = vo.results()
    kfs = int(res["is_keyframe"][WARMUP_FRAMES:].sum())
    tracked = int(res["tracked_ok"][WARMUP_FRAMES:].sum())

    # BASELINE.md tracked metric: ms per keyframe-window BA solve
    # (build + LM-Schur solve + merge on the run's final map state)
    from vslam_tpu.pipeline import ba_window

    def one_ba():
        kf2, lm2, _ = ba_window.run_window_ba(
            vo.state.kf, vo.state.lm, vo.state.intr0, vo.state.intr1,
            cam_name=vo.cam_name, huber=cfg.ba_huber_px,
            max_iters=cfg.ba_max_iters, W2=cfg.window_cams // 2,
            Lw=cfg.window_points, O=cfg.window_obs)
        return kf2.pose_l

    jax.block_until_ready(one_ba())
    times = []
    for _ in range(5):
        tb = time.perf_counter()
        jax.block_until_ready(one_ba())
        times.append((time.perf_counter() - tb) * 1e3)
    ba_ms = sorted(times)[len(times) // 2]
    return runs[len(runs) // 2], n, kfs, tracked, ba_ms, runs


def bench_full_slam(num_frames: int = 288, num_features: int = 300,
                    n_runs: int = 3):
    """Full-SLAM throughput + accuracy on a workload where closures fire
    ORGANICALLY.

    Pano revisit world (752x480, 1.75 revolutions) with the reference's
    full default configuration — loop closure + GBA after loop +
    relocalization all enabled (slam.cpp:244-247). The feature budget is
    starved to 300 (the MH04/MH05 analogue: few trackable features →
    drift accrues organically), so the revisit arrives with genuinely
    separated gauges and the closure + pose graph + async global BA all
    execute inside the TIMED region — no synthetic gauge injection.
    (A 1500-feature run of this world tracks tightly enough that the
    revisit re-attaches through guided matching and no closure is needed
    — see ATE_TABLE.md; the VO-throughput headline covers that regime.)

    Also records the SLAM-vs-VO keyframe-ATE pair on the same world: the
    reference's accuracy identity is that full SLAM beats baseline VO on
    drifting sequences (README.md:40-48), and this puts that comparison
    in the driver-captured artifact itself.

    Run 0 is an untimed warmup (closure-path compiles + cache loads);
    the median is over the timed runs, with every run recorded.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.eval import ate
    from vslam_tpu.frontend.features import extract_features
    from vslam_tpu.loop import vocabulary as vocab_mod
    from vslam_tpu.pipeline.streaming import StreamingSLAM, StreamingVO
    from vslam_tpu.synthetic_pano import generate_pano_loop

    seq = generate_pano_loop(num_frames=num_frames, width=752, height=480,
                             revolutions=1.75, seed=2)

    def make_cfg(full):
        return SlamConfig(
            num_features=num_features, ransac_hypotheses=128,
            max_landmarks=32768, max_keyframes=128,
            max_inview_landmarks=512, window_cams=24,
            # obs-subsampled window BA: keep the 4 newest in-window
            # observations per landmark (r03 profile: ~5 obs/landmark mean
            # with a long-lived tail; the per-iteration Schur cost scales
            # with the PADDED obs count, and the KF branch is the
            # full-SLAM fps limiter at the pano world's 2x KF cadence).
            # The per-landmark trim replaces the old arbitrary
            # compaction-order drop at the window_obs cap.
            window_points=2048, window_obs=4096, ba_obs_per_lm=4,
            ba_max_iters=10,
            enable_relocalization=full, enable_loop_closure=full,
            enable_gba_after_loop=full, new_kf_min_inliers=60,
            loop_closing_time_threshold=20, quality_level=0.001,
            match_max_dist_2d=30.0)

    pool = []
    for f in range(0, num_frames, max(1, num_frames // 24)):
        ft = extract_features(jnp.asarray(seq.images[f][0]),
                              num_features=num_features,
                              quality_level=0.001)
        pool.append(np.asarray(ft.bits)[np.asarray(ft.valid)])
    voc = vocab_mod.train(np.concatenate(pool), k=10, depth=4, seed=0)
    vocab_mod.set_idf_weights(voc, pool)

    def keyframe_ate(driver):
        fids, pos, _ = driver.keyframe_trajectory()
        return float(ate.align_svd(pos, seq.poses[fids, :3])[2])

    W = 32  # untimed warmup prefix per run (compile + bootstrap)
    n = num_frames - W

    def one_run(full):
        if full:
            slam = StreamingSLAM(seq.calib, make_cfg(True), voc,
                                 max_frames=num_frames + 8, poll_every=16)
        else:
            slam = StreamingVO(seq.calib, make_cfg(False),
                               max_frames=num_frames + 8)
        slam.run(seq.images[:W])
        if full:
            slam.poll()
        jax.block_until_ready(slam.state.frame)
        t0 = time.perf_counter()
        slam.run(seq.images[W:])
        if full:
            slam._merge_gba_if_ready(force=slam._pending_gba is not None)
        jax.block_until_ready(slam.state.frame)
        return n / (time.perf_counter() - t0), slam

    warmup_fps, _ = one_run(True)  # compiles land here, not in the runs
    runs, loops, gbas, slam_ate = [], 0, 0, None
    for _ in range(n_runs):
        fps, slam = one_run(True)
        runs.append(fps)
        loops = max(loops, len(slam.loop_edges))
        gbas = max(gbas, slam.gba_merges)
        slam_ate = keyframe_ate(slam)
    runs.sort()
    vo_fps, vo = one_run(False)
    vo_ate = keyframe_ate(vo)
    return {
        "full_slam_fps": round(runs[len(runs) // 2], 2),
        "full_slam_runs": [round(r, 2) for r in runs],
        "full_slam_warmup_fps": round(warmup_fps, 2),
        "full_slam_loops_closed": loops,
        "full_slam_gba_merges": gbas,
        "full_slam_ate_m": round(slam_ate, 3),
        "full_slam_vo_control_ate_m": round(vo_ate, 3),
        "full_slam_vo_control_fps": round(vo_fps, 2),
        "full_slam_config": ("streaming driver, pano revisit world "
                             "(752x480, 1.75 rev), 300-feature budget -> "
                             "organic drift; loop closure + GBA after "
                             "loop + relocalization ON; closure + pose "
                             "graph + async GBA inside the timed region; "
                             "trained BoW, poll_every=16; ATE pair = "
                             "same-world SLAM vs VO control"),
    }


def bench_sample(max_frames: int = 126):
    """Real-image throughput: the reference's bundled EuRoC V1 JPEGs
    through the streaming driver, native JPEG decode included. The frames
    are 7-second-apart snapshots, which forces an unrepresentatively high
    keyframe rate (~46%) — reported as its own line, not the headline."""
    import jax

    if not (os.path.isdir(SAMPLE_DIR) and os.path.exists(CALIB)):
        return None
    frames, calib, src = load_workload(True, max_frames)
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.pipeline.streaming import StreamingVO

    cfg = SlamConfig(
        enable_relocalization=False, enable_loop_closure=False,
        max_landmarks=65536, max_keyframes=1024,
    )
    n = len(frames) - WARMUP_FRAMES
    runs = []
    kfs = 0
    for _ in range(2):
        vo = StreamingVO(calib, cfg, max_frames=len(frames) + 8)
        vo.run(frames[:WARMUP_FRAMES], sync_every=0)
        jax.block_until_ready(vo.state.frame)
        t0 = time.perf_counter()
        vo.run(frames[WARMUP_FRAMES:], sync_every=256)
        jax.block_until_ready(vo.state.frame)
        runs.append(n / (time.perf_counter() - t0))
        kfs = int(vo.results()["is_keyframe"][WARMUP_FRAMES:].sum())
    runs.sort()
    return {
        "sample_fps": round(runs[len(runs) // 2], 2),
        "sample_runs": [round(r, 2) for r in runs],
        "sample_frames": n,
        "sample_keyframes": kfs,
        "sample_config": ("reference-bundled EuRoC V1 JPEGs, native "
                          "decode, 7s frame gaps (46% KF rate)"),
    }


def bench_multiseq(num_seq: int = 8, num_frames: int = 30):
    """Sequences/sec throughput: S synthetic sequences tracked lockstep
    (BASELINE.json configs[3])."""
    import jax

    from vslam_tpu import synthetic
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.parallel.multiseq_runner import MultiSeqVO

    import numpy as np

    seqs = [synthetic.generate(num_frames=num_frames, num_points=500,
                               width=752, height=480, seed=10 + s,
                               speed=3.0)
            for s in range(num_seq)]
    cfg = SlamConfig(
        enable_relocalization=False, enable_loop_closure=False,
        max_landmarks=16384, max_keyframes=128,
        window_points=4096, window_obs=10240,
    )
    # pre-stack the per-frame batches (camera-mux work, not SLAM compute)
    frames = [(np.stack([s.images[f][0] for s in seqs]),
               np.stack([s.images[f][1] for s in seqs]))
              for f in range(num_frames)]
    vo = MultiSeqVO(seqs[0].calib, num_seq, cfg)
    warm = 4
    vo.run(frames[:warm])
    jax.block_until_ready(vo.pose)
    t0 = time.perf_counter()
    n = vo.run(frames[warm:])
    jax.block_until_ready(vo.pose)
    elapsed = time.perf_counter() - t0
    return num_seq * n / elapsed  # sequence-frames per second


def main():
    use_sample = "--sample" in sys.argv
    use_slam_driver = "--driver" in sys.argv and \
        sys.argv[sys.argv.index("--driver") + 1] == "slam"
    if ("--no-probe" not in sys.argv
            and os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")):
        if not _probe_backend():
            # The accelerator plugin registers at interpreter start and a
            # dead tunnel leaves retry threads that wedge 'import jax' even
            # under JAX_PLATFORMS=cpu — re-exec with a scrubbed env so the
            # fresh interpreter never touches the tunnel.
            print(json.dumps({"warning": "accelerator tunnel unresponsive; "
                              "re-exec on CPU"}), file=sys.stderr)
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__),
                       "--no-probe", *sys.argv[1:]], env)

    on_cpu = os.environ.get("JAX_PLATFORMS") == "cpu"
    num_frames = WARMUP_FRAMES + (24 if on_cpu else 120)
    frames, calib, src = load_workload(use_sample, num_frames)

    fps, n, kfs, tracked, ba_ms, vo_runs = bench_single(frames, calib,
                                                        use_slam_driver)

    multiseq_fps = None
    slam_out = None
    sample_out = None
    if not on_cpu and not use_sample:
        try:
            slam_out = bench_full_slam()
        except Exception as e:  # secondary metric must not kill the bench
            print(json.dumps({"warning": f"full-slam bench failed: {e}"}),
                  file=sys.stderr)
        try:
            multiseq_fps = bench_multiseq()
        except Exception as e:
            print(json.dumps({"warning": f"multiseq bench failed: {e}"}),
                  file=sys.stderr)
        try:
            sample_out = bench_sample()
        except Exception as e:
            print(json.dumps({"warning": f"sample bench failed: {e}"}),
                  file=sys.stderr)

    out = {
        "metric": "euroc_vo_fps",
        "value": round(fps, 2),
        "unit": (f"frames/sec (752x480 stereo, 1500 feats, windowed BA; "
                 f"{src}; "
                 f"{'faithful' if use_slam_driver else 'streaming'} "
                 "driver; median of runs)"),
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "frames": n,
        "keyframes": kfs,
        "tracked_ok": tracked,
        "vo_runs": [round(r, 2) for r in vo_runs],
    }
    if ba_ms is not None:
        out["window_ba_ms"] = round(ba_ms, 1)
    if slam_out is not None:
        out.update(slam_out)
    if multiseq_fps is not None:
        out["multiseq_seq_frames_per_sec"] = round(multiseq_fps, 2)
        out["multiseq_config"] = "8 sequences lockstep, 752x480, one chip"
    if sample_out is not None:
        out.update(sample_out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
