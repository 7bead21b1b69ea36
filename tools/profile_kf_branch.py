"""Attribute the streaming keyframe-branch cost on the real TPU.

The fused streaming step (pipeline/streaming.py) hides all per-frame host
syncs, so per-stage costs inside the keyframe lax.cond are invisible to
wall-clock instrumentation of a run. This tool measures them directly:

1. end-to-end: per-frame time of the same workload with keyframes forced
   EVERY frame vs NEVER (after bootstrap) -> the true amortized branch cost;
2. piecewise: each device program the branch dispatches (right-image
   extraction, stereo match, insert_keyframe scatters, eviction, culling,
   BA build/solve/merge) timed as a blocking call on a mid-run state
   (includes the ~27.5 ms tunnel quantum; subtract the jit_noop line).

Usage: python tools/profile_kf_branch.py [--json out.json]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_op(fn, n=12):
    import jax

    jax.block_until_ready(fn())
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vslam_tpu import synthetic
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.frontend.features import extract_features
    from vslam_tpu.pipeline import ba_window, keyframe as kf_mod, tracking
    from vslam_tpu.pipeline.streaming import StreamingVO
    from vslam_tpu.solvers import ba

    print(f"# backend: {jax.default_backend()}", flush=True)
    out = {}

    def rec(name, ms):
        out[name] = round(ms, 2)
        print(f"{name:34s} {ms:9.2f} ms", flush=True)

    noop = jax.jit(lambda x: x + 1)
    x = jnp.float32(0)
    rec("jit_noop (tunnel quantum)", bench_op(lambda: noop(x)))

    seq = synthetic.generate(num_frames=90, num_points=1200,
                             width=752, height=480, seed=2, speed=3.0)
    base = dict(enable_relocalization=False, enable_loop_closure=False,
                max_landmarks=65536, max_keyframes=1024)

    # ---- end-to-end branch cost: force-KF vs never-KF runs ----
    def run_fps(cfg):
        vo = StreamingVO(seq.calib, cfg, max_frames=len(seq.images) + 8)
        vo.run(seq.images[:8], sync_every=0)
        jax.block_until_ready(vo.state.frame)
        t0 = time.perf_counter()
        vo.run(seq.images[8:], sync_every=0)
        jax.block_until_ready(vo.state.frame)
        n = len(seq.images) - 8
        return (time.perf_counter() - t0) / n * 1e3, vo

    ms_all, vo = run_fps(SlamConfig(new_kf_min_inliers=10 ** 6, **base))
    ms_none, _ = run_fps(SlamConfig(new_kf_min_inliers=0, **base))
    rec("per-frame, KF every frame", ms_all)
    rec("per-frame, KF never", ms_none)
    rec("keyframe branch (delta)", ms_all - ms_none)

    # ---- piecewise on the mid-run state (KF-every-frame => dense map) ----
    st = vo.state
    cfg = vo.cfg
    cam = vo.cam_name
    img_l = jax.device_put(jnp.asarray(seq.images[40][0]))
    img_r = jax.device_put(jnp.asarray(seq.images[40][1]))

    key = jax.random.PRNGKey(0)
    res = tracking.track_frame(
        key, img_l, st.lm, st.cur_pose, st.last_pose, st.vel, st.intr0,
        cam_name=cam, num_features=cfg.num_features,
        inview_cap=cfg.max_inview_landmarks,
        width=vo.calib.width, height=vo.calib.height,
        z_threshold=cfg.cam_z_threshold,
        match_max_dist_2d=cfg.match_max_dist_2d,
        match_threshold=cfg.match_max_dist, match_ratio=cfg.match_next_best,
        pnp_threshold=vo.pnp_threshold,
        num_hypotheses=cfg.ransac_hypotheses,
        min_matches=cfg.ransac_min_matches,
        quality_level=cfg.quality_level, min_distance=cfg.min_distance,
        rotate_features=cfg.rotate_features, num_octaves=cfg.num_octaves)
    jax.block_until_ready(res.T_w_c)

    feats_r = extract_features(
        img_r, num_features=cfg.num_features,
        quality_level=cfg.quality_level, min_distance=cfg.min_distance,
        rotate_features=cfg.rotate_features, num_octaves=cfg.num_octaves)
    rec("extract_features (right)", bench_op(lambda: extract_features(
        img_r, num_features=cfg.num_features,
        quality_level=cfg.quality_level, min_distance=cfg.min_distance,
        rotate_features=cfg.rotate_features,
        num_octaves=cfg.num_octaves).bits))

    sj, sinl = kf_mod.stereo_match(
        res.feats, feats_r, st.T_0_1, st.intr0, st.intr1, cam_name=cam,
        threshold=cfg.match_max_dist, ratio=cfg.match_next_best,
        epipolar_threshold=cfg.epipolar_error_threshold)
    rec("stereo_match", bench_op(lambda: kf_mod.stereo_match(
        res.feats, feats_r, st.T_0_1, st.intr0, st.intr1, cam_name=cam,
        threshold=cfg.match_max_dist, ratio=cfg.match_next_best,
        epipolar_threshold=cfg.epipolar_error_threshold)[0]))

    def ins():
        return kf_mod.insert_keyframe(
            st.kf, st.lm, st.frame, st.last_kf_slot, res.T_w_c, st.T_0_1,
            res.feats, feats_r, sj, sinl, res.match_lm, res.inlier,
            st.intr0, st.intr1, cam_name=cam,
            suppress_new=res.had_candidate).slot

    rec("insert_keyframe", bench_op(ins))

    deact = st.kf.valid & st.kf.active & (st.kf.frame_id < 40)
    rec("deactivate_keyframes", bench_op(
        lambda: kf_mod.deactivate_keyframes(st.kf, st.lm, deact)[0].active))
    rec("cull_landmarks", bench_op(lambda: kf_mod.cull_landmarks(
        st.kf, st.lm, min_lifetime_obs=cfg.lm_cull_min_obs)[2]))

    wp = ba_window.build_window_problem(
        st.kf, st.lm, st.intr0, st.intr1, W2=cfg.window_cams // 2,
        Lw=cfg.window_points, O=cfg.window_obs)
    rec("build_window_problem", bench_op(lambda: ba_window.
        build_window_problem(
            st.kf, st.lm, st.intr0, st.intr1, W2=cfg.window_cams // 2,
            Lw=cfg.window_points, O=cfg.window_obs).prob.poses))
    nobs = int(jax.device_get(wp.prob.obs_valid.sum()))
    nlm = int(jax.device_get(wp.sel_lm_valid.sum()))
    print(f"# window problem: {nobs} obs, {nlm} points "
          f"(padded {cfg.window_obs}/{cfg.window_points})", flush=True)
    out["window_obs_actual"] = nobs
    out["window_points_actual"] = nlm

    def solve():
        return ba.solve_ba_schur(
            wp.prob, cam_name=cam, huber=cfg.ba_huber_px,
            max_iters=cfg.ba_max_iters)[0]

    rec("window_ba_solve", bench_op(solve))
    poses, points, stats = ba.solve_ba_schur(
        wp.prob, cam_name=cam, huber=cfg.ba_huber_px,
        max_iters=cfg.ba_max_iters)
    out["ba_iterations"] = int(jax.device_get(stats["iterations"]))
    print(f"# ba iterations: {out['ba_iterations']}", flush=True)
    rec("merge_window_result", bench_op(lambda: ba_window.
        merge_window_result(st.kf, st.lm, wp, poses, points)[0].pose_l))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
