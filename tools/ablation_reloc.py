"""Recovery-machinery ablation with per-event diagnostics (VERDICT r4 #3).

Round 4 measured reloc-only ATE 4.282 m vs 3.547 m for the matched-hygiene
VO control on the bench pano world — a recovery mechanism that WORSENS the
map when loop closure is off, which the reference's reloc never does
(tracking.h:241-419 is strictly recovery). This tool reproduces the
ablation on the EXACT bench workload (bench.full_slam_world) and attaches
the evidence needed to localize the mechanism:

- per reloc event: the recovered pose error vs ground truth at the frame
  the patch applied to (diag["T_wc"] / diag["applied_frame"] recorded by
  StreamingSLAM._try_relocalize_stream);
- per run: ATE computed globally AND per gauge segment (keyframes before
  the first tracking loss vs after), each segment aligned independently —
  if both segments align well alone but the global ATE is large, the map
  holds two internally-consistent but mutually-drifted gauges (gauge
  mixing), which loop closure merges and reloc alone cannot;
- trajectory length + drift%% so the numbers are interpretable in absolute
  terms (VERDICT r4 #4).

Usage:  python tools/ablation_reloc.py [--runs 1] [--out artifacts/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_variant(name, seq, packed, voc, cfg, *, poll_every, chunk,
                num_frames):
    import jax
    import numpy as np

    from vslam_tpu.eval import ate
    from vslam_tpu.pipeline.streaming import StreamingSLAM, StreamingVO

    if cfg.enable_relocalization or cfg.enable_loop_closure:
        drv = StreamingSLAM(seq.calib, cfg, voc,
                            max_frames=num_frames + 8,
                            poll_every=poll_every, chunk=chunk)
    else:
        drv = StreamingVO(seq.calib, cfg, max_frames=num_frames + 8,
                          chunk=chunk)
    drv.run(packed)
    jax.block_until_ready(drv.state.frame)
    res = drv.results()
    fids, pos, _ = drv.keyframe_trajectory()
    gt = seq.poses[fids, :3]
    rmse = float(ate.align_svd(pos, gt)[2])

    ok = np.asarray(res["tracked_ok"])
    lost = np.nonzero(~ok[3:])[0]
    loss_frame = int(lost[0] + 3) if len(lost) else None

    rec = {
        "variant": name,
        "ate_m": round(rmse, 3),
        "keyframes": len(fids),
        "tracked_frames": int(ok.sum()),
        "loss_frame": loss_frame,
        "loops_closed": len(getattr(drv, "loop_edges", [])),
        "gba_merges": getattr(drv, "gba_merges", 0),
    }

    # ---- segment ATE: pre-loss vs post-loss keyframes, each aligned
    # independently. Similar per-segment ATE + larger global ATE = the
    # run holds two self-consistent gauges that never merged.
    if loss_frame is not None:
        pre = fids < loss_frame
        post = ~pre
        for tag, m in (("pre_loss", pre), ("post_loss", post)):
            if m.sum() >= 3:
                rec[f"ate_{tag}_m"] = round(
                    float(ate.align_svd(pos[m], gt[m])[2]), 3)
            rec[f"kf_{tag}"] = int(m.sum())

    # ---- reloc event diagnostics: recovered pose vs GT
    events = []
    for d in getattr(drv, "reloc_diags", []):
        e = dict(d)
        if "T_wc" in d and d.get("applied_frame", -1) is not None:
            af = min(int(d["applied_frame"]), len(seq.poses) - 1)
            err = float(np.linalg.norm(
                np.asarray(d["T_wc"][:3]) - seq.poses[af, :3]))
            e["recovered_err_vs_gt_m"] = round(err, 3)
            # how far had the coast drifted? compare against the logged
            # trajectory pose at the same frame
            traj = np.asarray(res["trajectory"])
            if af < len(traj):
                e["coast_err_vs_gt_m"] = round(float(np.linalg.norm(
                    traj[af, :3] - seq.poses[af, :3])), 3)
        events.append(e)
    rec["reloc_events"] = events
    if hasattr(drv, "loop_stats"):
        rec["loop_stats"] = dict(drv.loop_stats)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--frames", type=int, default=288)
    ap.add_argument("--features", type=int, default=300)
    ap.add_argument("--poll-every", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "ablation_reloc.json"))
    ap.add_argument("--variants", default="full,reloc,lc,vo")
    args = ap.parse_args()

    import numpy as np

    import bench

    seq, packed, voc, make_cfg = bench.full_slam_world(
        args.frames, args.features)
    traj_len = float(np.linalg.norm(
        np.diff(seq.poses[:, :3], axis=0), axis=1).sum())

    variants = {
        "full": dict(full=True),
        "reloc": dict(full=False, reloc=True),
        "lc": dict(full=False, lc=True, gba=True),
        "vo": dict(full=False),
    }
    out = {"traj_len_m": round(traj_len, 1), "rows": []}
    for name in args.variants.split(","):
        kw = variants[name]
        for r in range(args.runs):
            rec = run_variant(name, seq, packed, voc, make_cfg(**kw),
                              poll_every=args.poll_every, chunk=args.chunk,
                              num_frames=args.frames)
            rec["run"] = r
            rec["drift_pct"] = round(100.0 * rec["ate_m"] / traj_len, 2)
            out["rows"].append(rec)
            print(json.dumps(rec), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {args.out}; GT path length {traj_len:.1f} m")
    hdr = f"{'variant':>8} {'ATE':>7} {'drift%':>6} {'pre':>6} {'post':>6} " \
          f"{'loops':>5} {'reloc_ok':>8}"
    print(hdr)
    for rec in out["rows"]:
        print(f"{rec['variant']:>8} {rec['ate_m']:>7.3f} "
              f"{rec['drift_pct']:>6.2f} "
              f"{rec.get('ate_pre_loss_m', float('nan')):>6} "
              f"{rec.get('ate_post_loss_m', float('nan')):>6} "
              f"{rec['loops_closed']:>5} "
              f"{sum(1 for e in rec['reloc_events'] if 'T_wc' in e):>8}")


if __name__ == "__main__":
    main()
