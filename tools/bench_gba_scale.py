"""TPU measurement of the 4K-keyframe global-BA stretch configuration.

BASELINE.json configs[4] / SURVEY §5 "long-context analogue": the scale
axis of this workload is the global bundle adjustment over a whole run's
map (the reference's global_bundle_adjustment, loop_closure_utils.h:672-748,
runs Ceres SPARSE_SCHUR over every camera + all_obs). The hermetic CPU
correctness proof lives in tests/test_ba_scale.py; this tool measures the
same problem ON THE CHIP — ms per LM iteration and device memory — for the
matrix-free LM-CG solver (solvers/ba_cg.py) and, at the sizes where it
still fits, the blocked one-hot MXU solver (solvers/ba_blocked.py,
pipeline/ba_global.py's small-map path).

Writes artifacts/gba_scale_tpu.json:
  [{"n_pairs", "solver", "iter_ms", "total_s", "cost_drop",
    "peak_hbm_mb"}, ...]

Usage: python tools/bench_gba_scale.py [--pairs 512,1024,4096]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def peak_hbm_mb():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 2**20, 1)
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="512,1024,4096")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "gba_scale_tpu.json"))
    ap.add_argument("--lm-iters", type=int, default=3)
    ap.add_argument("--cg-iters", type=int, default=8)
    args = ap.parse_args()

    import jax

    from test_ba_scale import make_big_problem
    from vslam_tpu.solvers import ba_cg

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    rows = []
    for n_pairs in [int(x) for x in args.pairs.split(",")]:
        t0 = time.time()
        prob, poses_gt, points_gt = make_big_problem(n_pairs=n_pairs)
        print(f"n_pairs={n_pairs}: problem built in {time.time()-t0:.0f}s "
              f"(K={prob.poses.shape[0]}, L={prob.points.shape[0]}, "
              f"O={prob.obs_cam.shape[0]})", flush=True)

        # warm (compile) with the SAME static config as the timed solve —
        # max_iters is a static argument, so a different warmup iteration
        # count would leave the compile inside the timed region
        _, _, s0 = ba_cg.solve_ba_cg(prob, cam_name="pinhole", huber=2.0,
                                     max_iters=args.lm_iters,
                                     cg_iters=args.cg_iters)
        jax.block_until_ready(s0["final_cost"])
        t0 = time.perf_counter()
        poses, points, stats = ba_cg.solve_ba_cg(
            prob, cam_name="pinhole", huber=2.0, max_iters=args.lm_iters,
            cg_iters=args.cg_iters)
        jax.block_until_ready(stats["final_cost"])
        total = time.perf_counter() - t0
        row = {
            "n_pairs": n_pairs,
            "cams": int(prob.poses.shape[0]),
            "landmarks": int(prob.points.shape[0]),
            "observations": int(prob.obs_cam.shape[0]),
            "solver": f"lm_cg (cg_iters={args.cg_iters})",
            "lm_iters": args.lm_iters,
            "iter_ms": round(1e3 * total / args.lm_iters, 1),
            "total_s": round(total, 2),
            "initial_cost": float(stats["initial_cost"]),
            "final_cost": float(stats["final_cost"]),
            "peak_hbm_mb": peak_hbm_mb(),
            "backend": jax.default_backend(),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
