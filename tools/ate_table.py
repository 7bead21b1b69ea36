"""Seed-averaged hermetic ATE table — the stand-in for the reference's
EuRoC README table (/root/reference/README.md:36-48).

The real EuRoC sequences cannot be downloaded in this container, so the
parity evidence is synthetic worlds with exact ground truth, evaluated by
the same SE3-Umeyama ATE the reference uses (src/slam.cpp:1618-1710 →
vslam_tpu/eval/ate.py). Like the reference's table, rows compare the full
configuration against baseline VO; multiple seeds average out RANSAC
draw variance.

Usage: python tools/ate_table.py [--seeds 3] [--out ATE_TABLE.md]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_vo(seq, seed, degraded=False):
    from vslam_tpu.config import SlamConfig
    from vslam_tpu.eval import ate
    from vslam_tpu.pipeline.streaming import StreamingVO

    cfg = SlamConfig(
        num_features=400, ransac_hypotheses=128, max_landmarks=8192,
        max_keyframes=64, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=10,
        enable_relocalization=False, enable_loop_closure=False,
        new_kf_min_inliers=60, seed=seed)
    vo = StreamingVO(seq.calib, cfg, max_frames=len(seq.images) + 8)
    vo.run(seq.images, sync_every=0)
    fids, pos, _ = vo.keyframe_trajectory()
    if len(fids) < 3:
        return float("nan")
    import numpy as np

    _, _, rmse = ate.align_svd(pos, seq.poses[fids, :3])
    return float(rmse)


_pano_cache = {}


def run_pano(full_slam: bool, seed: int, num_features: int = 600):
    """Pano-world run: ``full_slam`` = the reference's full default
    config (loop closure + GBA after loop + relocalization,
    slam.cpp:244-247); otherwise baseline VO.

    ``num_features=600`` tracks the world tightly (consistent map — the
    SLAM row must not degrade it); ``num_features=300`` starves the
    geometry so drift accrues ORGANICALLY and closures must cut it."""
    import numpy as np
    import jax.numpy as jnp

    from vslam_tpu.config import SlamConfig
    from vslam_tpu.eval import ate
    from vslam_tpu.frontend.features import extract_features
    from vslam_tpu.loop import vocabulary as vocab_mod
    from vslam_tpu.pipeline.streaming import StreamingSLAM, StreamingVO
    from vslam_tpu.synthetic_pano import generate_pano_loop

    if "seq" not in _pano_cache:
        _pano_cache["seq"] = generate_pano_loop(
            num_frames=256, revolutions=1.75, seed=2)
    seq = _pano_cache["seq"]
    cfg = SlamConfig(
        num_features=num_features, ransac_hypotheses=128,
        max_landmarks=32768,
        max_keyframes=128, max_inview_landmarks=512, window_cams=24,
        window_points=2048, window_obs=6144, ba_max_iters=10,
        enable_relocalization=full_slam, enable_loop_closure=full_slam,
        enable_gba_after_loop=full_slam, new_kf_min_inliers=60,
        loop_closing_time_threshold=20, quality_level=0.001,
        match_max_dist_2d=30.0, seed=seed)
    if full_slam:
        if num_features not in _pano_cache:
            pool = []
            for f in range(0, 256, 8):
                ft = extract_features(jnp.asarray(seq.images[f][0]),
                                      num_features=num_features,
                                      quality_level=0.001)
                pool.append(np.asarray(ft.bits)[np.asarray(ft.valid)])
            voc = vocab_mod.train(np.concatenate(pool), k=10, depth=4,
                                  seed=0)
            vocab_mod.set_idf_weights(voc, pool)
            _pano_cache[num_features] = voc
        slam = StreamingSLAM(seq.calib, cfg, _pano_cache[num_features],
                             max_frames=288, poll_every=16)
    else:
        slam = StreamingVO(seq.calib, cfg, max_frames=288)
    slam.run(seq.images)
    if full_slam:
        slam._merge_gba_if_ready(force=slam._pending_gba is not None)
    fids, pos, _ = slam.keyframe_trajectory()
    _, _, rmse = ate.align_svd(pos, seq.poses[fids, :3])
    n_loops = len(slam.loop_edges) if full_slam else 0
    return float(rmse), n_loops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="ATE_TABLE.md")
    args = ap.parse_args()

    import numpy as np

    from vslam_tpu import synthetic

    rows = []
    t_start = time.time()

    for world, gen in (
        ("arc (clean)", lambda: synthetic.generate(
            num_frames=24, num_points=500, seed=3)),
        ("arc (EuRoC-like photometrics)", None),
    ):
        vals = []
        for s in range(args.seeds):
            seq = synthetic.generate(num_frames=24, num_points=500, seed=3)
            if world.startswith("arc (EuRoC"):
                seq.images[:] = synthetic.degrade(seq.images, seed=3 + s)
            vals.append(run_vo(seq, seed=s))
            print(f"  {world} seed {s}: {vals[-1]:.3f} m", flush=True)
        rows.append((world, "VO (streaming)", vals))

    for nf, world in ((600, "pano orbit 1.75 rev (consistent tracking)"),
                      (300, "pano orbit 1.75 rev (organic drift, 300 "
                            "feats)")):
        for full in (False, True):
            vals, loops = [], 0
            for s in range(args.seeds):
                r, nl = run_pano(full, seed=s, num_features=nf)
                vals.append(r)
                loops += nl
                print(f"  pano nf={nf} {'SLAM' if full else 'VO'} "
                      f"seed {s}: {r:.3f} m loops={nl}", flush=True)
            cfg_name = ("full SLAM (LC+GBA+reloc, "
                        f"{loops} closures/{args.seeds} seeds)"
                        if full else "baseline VO")
            rows.append((world, cfg_name, vals))

    lines = [
        "# Hermetic ATE table (synthetic ground truth)",
        "",
        "The in-container stand-in for the reference's EuRoC ATE table",
        "(README.md:36-48; the dataset is not downloadable here). Metric =",
        "SE3-Umeyama keyframe ATE RMSE, the reference's own evaluation",
        f"(slam.cpp:1618-1710). {args.seeds} seeds per row; streaming",
        "drivers.",
        "",
        "| World | Config | ATE RMSE (m), per seed | mean |",
        "|---|---|---|---|",
    ]
    for world, config, vals in rows:
        vs = ", ".join(f"{v:.3f}" for v in vals)
        lines.append(f"| {world} | {config} | {vs} | "
                     f"{np.nanmean(vals):.3f} |")
    lines += [
        "",
        "Like the reference's table, the pano rows compare the FULL",
        "default configuration (loop closure + GBA after loop +",
        "relocalization, slam.cpp:244-247) against baseline VO on a long",
        "revisit loop:",
        "",
        "- On the CONSISTENT world (600 features) tracking re-attaches to",
        "  the old map through guided matching on the revisit, so no",
        "  closure is *needed*; the SLAM row pins that the full machinery",
        "  does not degrade the map (reference analogue: MH02/V1_1, where",
        "  SLAM ~ VO).",
        "- On the ORGANIC-DRIFT world (300 features) the gauges separate",
        "  and closures must cut the accumulated error (reference",
        "  analogue: MH01/MH03-05/V1_2-3, where SLAM beats VO by 2-12x).",
        "  Seeds where no closure fires keep the VO number (detection is",
        "  consistency-gated, num_consistency=3).",
        "",
        "Generated by tools/ate_table.py "
        f"in {time.time() - t_start:.0f}s.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)
    print("\n".join(lines), flush=True)


if __name__ == "__main__":
    main()
