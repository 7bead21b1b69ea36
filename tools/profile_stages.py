"""Per-stage TPU timing for the per-frame pipeline + cache warmer.

Attributes wall time across every device program the SLAM loop dispatches
(the reference's hot loop is next_step, /root/reference/src/slam.cpp:1087-1458)
plus the host<->device transfer costs that a tunneled TPU makes expensive.
Running it also populates the persistent compile cache for the current
revision, so a subsequent bench.py run pays no compiles.

Usage:  python tools/profile_stages.py [--frames N] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_op(fn, n=20):
    """Median-of-n wall ms for a blocking device call."""
    import jax

    jax.block_until_ready(fn())  # compile + warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


def device_ms_op(fn, n=10):
    """TRUE device time per call from an xplane trace (sums jit_* events).

    Blocking wall through the tunnel is dominated by the ~27.5 ms
    completion-polling quantum; subtracting it (the r3 table's method)
    badly over-estimated device compute — r4 xplane profiling measured
    e.g. extract_features at 0.24 ms device vs "8.3 ms" wall-derived.
    """
    import glob
    import tempfile

    import jax

    jax.block_until_ready(fn())
    d = tempfile.mkdtemp(prefix="xp_stage_")
    jax.profiler.start_trace(d)
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    if not files:
        return None
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[-1], "rb").read())
    tot = 0
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                if ev.name.startswith("jit_"):
                    tot += ev.duration_ns
    return tot / 1e6 / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vslam_tpu import synthetic
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.pipeline.slam import SlamSystem

    backend = jax.default_backend()
    print(f"# backend: {backend}, devices: {jax.devices()}", flush=True)

    seq = synthetic.generate(num_frames=max(args.frames + 10, 30),
                             num_points=900, width=752, height=480, seed=2)
    cfg = SlamConfig(enable_relocalization=False, enable_loop_closure=False,
                     max_landmarks=65536, max_keyframes=1024)
    slam = SlamSystem(seq.calib, cfg)

    out = {}

    def rec(name, ms):
        out[name] = round(ms, 3)
        print(f"{name:32s} {ms:9.2f} ms", flush=True)

    def stage(name, fn, reps):
        """Record blocking wall AND true (xplane) device time."""
        wall = bench_op(fn, reps)
        dev = device_ms_op(fn, min(reps, 10))
        out[name] = round(wall, 3)
        if dev is not None:
            out[name + "_device"] = round(dev, 3)
        print(f"{name:32s} {wall:9.2f} ms wall"
              + (f"  {dev:8.2f} ms device" if dev is not None else ""),
              flush=True)

    # ---- raw transfer costs ----
    img_np = np.asarray(seq.images[0][0])
    rec("h2d_image_752x480", bench_op(
        lambda: jax.device_put(img_np), args.reps))
    scal = jnp.float32(1.0) + 0
    jax.block_until_ready(scal)

    def roundtrip():
        return jax.device_get(scal)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        roundtrip()
    rec("d2h_scalar_roundtrip", (time.perf_counter() - t0) / args.reps * 1e3)

    # noop dispatch latency (tunnel overhead floor)
    f = jax.jit(lambda x: x + 1)
    x1 = jnp.zeros((8,), jnp.float32)
    rec("jit_noop_dispatch", bench_op(lambda: f(x1), args.reps))

    # ---- seed the system so state shapes are realistic ----
    for i in range(6):
        slam.process_frame(seq.images[i][0], seq.images[i][1])

    from vslam_tpu.frontend.features import extract_features
    from vslam_tpu.geometry import cameras as cam_models
    from vslam_tpu.geometry import lie
    from vslam_tpu.ops import hamming
    from vslam_tpu.ops.compact import compact_indices
    from vslam_tpu.pipeline import ba_window, keyframe as kf_mod, tracking
    from vslam_tpu.solvers import ba as ba_mod, pnp

    img_dev = jax.device_put(jnp.asarray(seq.images[6][0]))
    img_r_dev = jax.device_put(jnp.asarray(seq.images[6][1]))
    key = jax.random.PRNGKey(0)

    stage("extract_features", lambda: extract_features(
        img_dev, num_features=cfg.num_features,
        quality_level=cfg.quality_level, min_distance=cfg.min_distance,
        rotate_features=cfg.rotate_features), args.reps)

    feats = extract_features(img_dev, num_features=cfg.num_features,
                             quality_level=cfg.quality_level,
                             min_distance=cfg.min_distance,
                             rotate_features=cfg.rotate_features)
    feats_r = extract_features(img_r_dev, num_features=cfg.num_features,
                               quality_level=cfg.quality_level,
                               min_distance=cfg.min_distance,
                               rotate_features=cfg.rotate_features)
    jax.block_until_ready(feats)

    # guided landmark projection + compact + match (pieces of track_frame)
    lm = slam.lm
    pose = slam.track.current_pose

    @jax.jit
    def proj_compact(lm, pose):
        proj, in_view = tracking.project_landmarks(
            lm, pose, slam.cam_name, slam.intr0, slam.width, slam.height,
            cfg.cam_z_threshold)
        sel, sel_valid = compact_indices(in_view, cfg.max_inview_landmarks,
                                         newest_first=True)
        sel = jnp.clip(sel, 0, lm.pos.shape[0] - 1)
        return proj[sel], sel, sel_valid & in_view[sel]

    stage("project+compact", lambda: proj_compact(lm, pose), args.reps)
    cand_proj, sel, sel_valid = proj_compact(lm, pose)

    @jax.jit
    def match_only(bits, valid, corners, cand_proj, sel, sel_valid):
        return hamming.match_landmarks(
            bits, valid, lm.bank_bits[sel], lm.bank_valid[sel],
            corners, cand_proj, sel_valid,
            max_dist_2d=cfg.match_max_dist_2d, threshold=cfg.match_max_dist,
            ratio=cfg.match_next_best)

    stage("match_landmarks", lambda: match_only(
        feats.bits, feats.valid, feats.corners, cand_proj, sel,
        sel_valid), args.reps)
    match_local, m_ok, _ = match_only(feats.bits, feats.valid, feats.corners,
                                      cand_proj, sel, sel_valid)

    @jax.jit
    def pnp_only(key, match_local, m_ok, corners):
        bearings = cam_models.unproject(slam.cam_name, slam.intr0, corners)
        points = lm.pos[sel][jnp.clip(match_local, 0)]
        return pnp.ransac_pnp(key, points, bearings, m_ok,
                              slam.pnp_threshold,
                              num_hypotheses=cfg.ransac_hypotheses)

    stage("ransac_pnp", lambda: pnp_only(
        key, match_local, m_ok, feats.corners), args.reps)

    # full fused track_frame (what the tracking step actually dispatches)
    def full_track():
        return tracking.track_frame(
            key, img_dev, slam.lm, pose, pose, slam.track.vel, slam.intr0,
            cam_name=slam.cam_name, num_features=cfg.num_features,
            inview_cap=cfg.max_inview_landmarks,
            width=slam.width, height=slam.height,
            z_threshold=cfg.cam_z_threshold,
            match_max_dist_2d=cfg.match_max_dist_2d,
            match_threshold=cfg.match_max_dist,
            match_ratio=cfg.match_next_best,
            pnp_threshold=slam.pnp_threshold,
            num_hypotheses=cfg.ransac_hypotheses,
            min_matches=cfg.ransac_min_matches,
            quality_level=cfg.quality_level,
            min_distance=cfg.min_distance,
            rotate_features=cfg.rotate_features)

    stage("track_frame_fused", full_track, args.reps)

    # host-side step cost (includes transfers + scalar sync + python)
    def host_track_step():
        slam._run_tracking(seq.images[7][0])
    host_track_step()
    t0 = time.perf_counter()
    for _ in range(args.reps):
        host_track_step()
    rec("host _run_tracking (e2e)", (time.perf_counter() - t0)
        / args.reps * 1e3)

    # keyframe-path programs
    stage("stereo_match", lambda: kf_mod.stereo_match(
        feats, feats_r, slam.T_0_1, slam.intr0, slam.intr1,
        cam_name=slam.cam_name, threshold=cfg.match_max_dist,
        ratio=cfg.match_next_best,
        epipolar_threshold=cfg.epipolar_error_threshold)[0], args.reps)

    wp = ba_window.build_window_problem(
        slam.kf, slam.lm, slam.intr0, slam.intr1,
        W2=cfg.window_cams // 2, Lw=cfg.window_points, O=cfg.window_obs)
    jax.block_until_ready(wp.prob)
    rec("build_window_problem", bench_op(lambda: jax.block_until_ready(
        ba_window.build_window_problem(
            slam.kf, slam.lm, slam.intr0, slam.intr1,
            W2=cfg.window_cams // 2, Lw=cfg.window_points,
            O=cfg.window_obs).prob), max(args.reps // 2, 5)))

    stage("window_ba_solve", lambda: ba_mod.solve_ba_schur(
        wp.prob, cam_name=slam.cam_name, huber=cfg.ba_huber_px,
        max_iters=cfg.ba_max_iters)[0], max(args.reps // 2, 5))

    # ---- end-to-end fps on the remaining frames ----
    n = 0
    t0 = time.perf_counter()
    for i in range(8, min(len(seq.images), 8 + args.frames)):
        slam.process_frame(seq.images[i][0], seq.images[i][1])
        n += 1
    elapsed = time.perf_counter() - t0
    fps = n / elapsed
    kfs = sum(1 for s in slam.stats[8:] if s["kind"] == "keyframe")
    rec("e2e_ms_per_frame", elapsed / n * 1e3)
    out["e2e_fps"] = round(fps, 2)
    out["frames"] = n
    out["keyframes"] = kfs
    out["backend"] = backend
    print(f"\n# e2e: {fps:.2f} fps over {n} frames ({kfs} keyframes)",
          flush=True)
    # per-stage timer breakdown from the system itself
    print(json.dumps(slam.timer.summary(), indent=1), flush=True)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
