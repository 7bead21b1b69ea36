"""Command-line SLAM driver.

API-compatible with the reference executable's flags
(/root/reference/src/slam.cpp:346-362):
  --dataset-path  EuRoC directory (mav0 layout or the flat sample layout)
  --cam-calib     calibration JSON (cereal schema)
  --voc-path      optional DBoW2 text vocabulary (else trained online)
  --map-name      output map artifact (cereal-JSON layout, load_map.py ready)
  --show-gui      accepted for compatibility (headless; prints progress)

plus framework extras: --config (SlamConfig JSON), --max-frames, --no-loop,
--no-reloc, --metrics (JSONL per-frame metrics).

Usage: python -m vslam_tpu.cli --dataset-path ... --cam-calib ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _make_tuner(path: str):
    """Poll a JSON control file and apply changed params to the driver.

    Returns a callable; each invocation re-reads the file if its mtime
    changed and pushes new {param: value} entries through set_param.
    """
    import os

    state = {"mtime": 0.0, "vals": {}}

    def poll(target):
        if not path:
            return
        try:
            m = os.stat(path).st_mtime
        except OSError:
            return
        if m == state["mtime"]:
            return
        state["mtime"] = m
        try:
            with open(path) as f:
                vals = json.load(f)
        except (ValueError, OSError):
            return  # mid-write or malformed: retry next poll
        for k, v in vals.items():
            if state["vals"].get(k) != v:
                try:
                    target.set_param(k, v)
                    print(f"[tune] {k} = {v}", file=sys.stderr)
                except (ValueError, AttributeError) as e:
                    print(f"[tune] rejected {k}: {e}", file=sys.stderr)
        state["vals"] = vals

    return poll


def main(argv=None):
    p = argparse.ArgumentParser(description="vslam_tpu stereo SLAM")
    p.add_argument("--dataset-path", required=True)
    p.add_argument("--cam-calib", required=True)
    p.add_argument("--voc-path", default="")
    p.add_argument("--map-name", default="map")
    p.add_argument("--show-gui", action="store_true")
    p.add_argument("--config", default="")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--no-reloc", action="store_true")
    p.add_argument("--metrics", default="")
    p.add_argument("--viz-html", default="", help="write an interactive "
                   "HTML map/trajectory viewer (Pangolin-loop replacement)")
    p.add_argument("--trace", default="", help="capture a jax.profiler "
                   "trace (xplane, TensorBoard/Perfetto-viewable) of the "
                   "frame loop into this directory")
    p.add_argument("--driver", default="slam",
                   choices=["slam", "streaming"],
                   help="'slam' = faithful per-frame driver (reloc + loop "
                   "closure, reference semantics); 'streaming' = sync-free "
                   "fused-step driver (max throughput; loop closure and "
                   "relocalization need --voc-path)")
    p.add_argument("--overlay-every", type=int, default=0, help="with "
                   "--overlay-dir: write a live reprojection overlay PNG "
                   "of every Nth frame during the run (detected keypoints "
                   "+ matched landmarks projected through the frame's "
                   "final pose + residual lines) — the headless "
                   "equivalent of the reference's draw_image_overlay "
                   "inspection (slam.cpp:534-771). Faithful driver only.")
    p.add_argument("--overlay-dir", default="")
    p.add_argument("--tune-file", default="", help="JSON file of "
                   "{param: value} polled during the run; changed values "
                   "are applied live via set_param — the headless "
                   "equivalent of the reference's pangolin::Var panel "
                   "(slam.cpp:223-310). Device-tunable gates apply with "
                   "zero recompilation.")
    args = p.parse_args(argv)

    if args.driver == "streaming":
        return _main_streaming(args)

    from .config import SlamConfig
    from .eval import ate as ate_mod
    from .io import calib as calib_mod
    from .io import euroc, map_io
    from .pipeline.slam import SlamSystem

    cfg = SlamConfig.from_json(args.config) if args.config else SlamConfig()
    if args.no_loop:
        cfg.enable_loop_closure = False
    if args.no_reloc:
        cfg.enable_relocalization = False

    calib = calib_mod.load_calibration(args.cam_calib)
    seq = euroc.load_sequence(args.dataset_path)
    n = seq.num_frames if args.max_frames <= 0 else min(
        seq.num_frames, args.max_frames)
    print(f"Loaded {seq.num_frames} image pairs "
          f"({'with' if seq.gt_positions is not None else 'no'} ground truth)",
          file=sys.stderr)

    slam = SlamSystem(calib, cfg)
    if args.voc_path:
        from .loop import vocabulary as vocab_mod

        slam.set_vocabulary(vocab_mod.load_dbow2_text(args.voc_path))
        print(f"Loaded vocabulary: {slam.voc.num_words} words",
              file=sys.stderr)

    from .utils import profiling

    metrics_f = open(args.metrics, "w") if args.metrics else None
    pf = euroc.Prefetcher(seq.image_paths[:n], depth=8, workers=2)
    tune_poll = _make_tuner(args.tune_file)
    t0 = time.perf_counter()
    with profiling.trace(args.trace or None):
        for i in range(n):
            if i % 25 == 0:
                tune_poll(slam)
            img_l, img_r = pf.get(i)
            t_frame = time.perf_counter()
            info = slam.process_frame(img_l, img_r)
            info["ms"] = round(1000 * (time.perf_counter() - t_frame), 2)
            if (args.overlay_every and args.overlay_dir
                    and i % args.overlay_every == 0):
                import os as _os

                from .viz import overlays as _ov

                _os.makedirs(args.overlay_dir, exist_ok=True)
                _ov.save_png(slam.render_overlay(img_l),
                             _os.path.join(args.overlay_dir,
                                           f"frame_{i:05d}.png"))
            if metrics_f:
                metrics_f.write(json.dumps(info) + "\n")
            if info["kind"] == "keyframe" or i % 50 == 0:
                print(f"[{i}/{n}] {info}", file=sys.stderr)
    elapsed = time.perf_counter() - t0
    print(f"Processed {n} frames in {elapsed:.1f}s ({n / elapsed:.1f} fps)",
          file=sys.stderr)
    if metrics_f:
        metrics_f.close()

    # evaluation (align_svd button equivalent, slam.cpp:1712-1722)
    fids, est_pos, est_poses = slam.keyframe_trajectory()
    ate_val = float("nan")
    gt_out = np.zeros((0, 3))
    if seq.gt_positions is not None and len(fids) >= 3:
        est_t_ns = seq.timestamps[fids]
        ate_val = ate_mod.ate_rmse(est_t_ns, est_pos, seq.gt_timestamps,
                                   seq.gt_positions)
        gt_out = seq.gt_positions
        print(f"ATE RMSE: {ate_val:.3f} m over {len(fids)} keyframes",
              file=sys.stderr)

    lm_valid = np.asarray(slam.lm.valid)
    lm_pos = np.asarray(slam.lm.pos)
    cams = [((int(f), 0), est_poses[i]) for i, f in enumerate(fids)]
    lms = [(int(i), lm_pos[i]) for i in np.nonzero(lm_valid)[0]]
    out = f"{args.map_name}.json"
    map_io.save_map(out, cams, lms, est_pos, gt_out, ate_val)
    print(f"Saved map as {out} ({len(cams)} cameras, {len(lms)} landmarks)",
          file=sys.stderr)

    if args.viz_html:
        from .viz import html_viewer

        traj_full = np.asarray(slam.trajectory)[:, :3]
        loop_xyz = []
        for a, b in slam.loop_edges:
            pl = np.asarray(slam.kf.pose_l)
            loop_xyz.append((pl[a, :3], pl[b, :3]))
        html_viewer.write_html(
            args.viz_html, traj_full,
            landmarks=lm_pos[lm_valid],
            gt=gt_out if len(gt_out) else None,
            keyframes=est_poses,
            inliers=[s.get("inliers", 0) for s in slam.stats],
            is_keyframe=[s["kind"] == "keyframe" for s in slam.stats],
            loop_edges=loop_xyz,
            title=f"vslam_tpu — {args.map_name} "
                  f"(ATE {ate_val:.3f} m)" if ate_val == ate_val
                  else f"vslam_tpu — {args.map_name}")
        print(f"Wrote viewer: {args.viz_html}", file=sys.stderr)
    return 0


def _main_streaming(args):
    """Streaming-driver path: maximum throughput on a real device."""
    import jax

    from .config import SlamConfig
    from .eval import ate as ate_mod
    from .io import calib as calib_mod
    from .io import euroc, map_io
    from .pipeline.streaming import StreamingSLAM, StreamingVO

    cfg = SlamConfig.from_json(args.config) if args.config else SlamConfig()
    if args.no_reloc or not args.voc_path:
        cfg.enable_relocalization = False
    if args.no_loop or not args.voc_path:
        cfg.enable_loop_closure = False

    calib = calib_mod.load_calibration(args.cam_calib)
    seq = euroc.load_sequence(args.dataset_path)
    n = seq.num_frames if args.max_frames <= 0 else min(
        seq.num_frames, args.max_frames)
    pf = euroc.Prefetcher(seq.image_paths[:n], depth=16, workers=3)
    # decode + pack once at load time: contiguous [N, 2, H, W] slices
    # upload zero-copy, and chunk=4 batches 4 frames per dispatch/h2d
    frames = StreamingVO.pack_frames([pf.get(i) for i in range(n)])

    if cfg.enable_loop_closure or cfg.enable_relocalization:
        from .loop import vocabulary as vocab_mod

        voc = vocab_mod.load_dbow2_text(args.voc_path)
        print(f"Loaded vocabulary: {voc.num_words} words", file=sys.stderr)
        slam = StreamingSLAM(calib, cfg, voc, max_frames=n + 8, chunk=4)
    else:
        slam = StreamingVO(calib, cfg, max_frames=n + 8, chunk=4)

    from .utils import profiling

    tune_poll = _make_tuner(args.tune_file)
    t0 = time.perf_counter()
    with profiling.trace(args.trace or None):
        for lo in range(0, len(frames), 64):
            tune_poll(slam)
            slam.run(frames[lo:lo + 64])
        jax.block_until_ready(slam.state.frame)
    elapsed = time.perf_counter() - t0
    print(f"Processed {n} frames in {elapsed:.1f}s ({n / elapsed:.1f} fps, "
          f"streaming driver)", file=sys.stderr)

    res = slam.results()
    if args.metrics:
        with open(args.metrics, "w") as f:
            for i in range(res["frames"]):
                f.write(json.dumps({
                    "frame": i,
                    "kind": "keyframe" if bool(res["is_keyframe"][i])
                            else "track",
                    "inliers": int(res["inliers"][i]),
                    "ok": bool(res["tracked_ok"][i]),
                }) + "\n")

    fids, est_pos, est_poses = slam.keyframe_trajectory()
    ate_val = float("nan")
    gt_out = np.zeros((0, 3))
    if seq.gt_positions is not None and len(fids) >= 3:
        est_t_ns = seq.timestamps[fids]
        ate_val = ate_mod.ate_rmse(est_t_ns, est_pos, seq.gt_timestamps,
                                   seq.gt_positions)
        gt_out = seq.gt_positions
        print(f"ATE RMSE: {ate_val:.3f} m over {len(fids)} keyframes",
              file=sys.stderr)

    lm_valid, lm_pos = jax.device_get((slam.state.lm.valid,
                                       slam.state.lm.pos))
    cams = [((int(f), 0), est_poses[i]) for i, f in enumerate(fids)]
    lms = [(int(i), lm_pos[i]) for i in np.nonzero(lm_valid)[0]]
    out = f"{args.map_name}.json"
    map_io.save_map(out, cams, lms, est_pos, gt_out, ate_val)
    print(f"Saved map as {out} ({len(cams)} cameras, {len(lms)} landmarks)",
          file=sys.stderr)

    if args.viz_html:
        from .viz import html_viewer

        loop_xyz = []
        if hasattr(slam, "loop_edges"):
            pl = np.asarray(jax.device_get(slam.state.kf.pose_l))
            loop_xyz = [(pl[a, :3], pl[b, :3]) for a, b in slam.loop_edges]
        html_viewer.write_html(
            args.viz_html, res["trajectory"][:, :3],
            landmarks=lm_pos[lm_valid],
            gt=gt_out if len(gt_out) else None,
            keyframes=est_poses,
            inliers=res["inliers"], is_keyframe=res["is_keyframe"],
            loop_edges=loop_xyz,
            title=f"vslam_tpu (streaming) — {args.map_name}")
        print(f"Wrote viewer: {args.viz_html}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
