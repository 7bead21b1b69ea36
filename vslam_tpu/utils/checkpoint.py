"""Full-state checkpoint / resume.

The reference can only save a final map artifact (slam.cpp:1791-1822); there
is no mid-run resume. Here the complete SLAM state — keyframes, landmarks
(including observation tables and descriptor banks), track state, host
bookkeeping (covisibility graph, window, BoW inverted file, consistency
groups), and the PRNG key — round-trips through a single npz + JSON pair, so
a run can stop and resume exactly.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from ..pipeline.slam import SlamSystem


def save(slam: "SlamSystem", path: str) -> None:
    """Write <path>.npz (arrays) and <path>.json (host bookkeeping)."""
    if hasattr(slam, "_merge_pending_ba"):
        slam._merge_pending_ba(force=True)  # settle in-flight background BA
    arrays = {}
    for name, tree in (("lm", slam.lm), ("kf", slam.kf), ("track", slam.track)):
        for field, val in tree._asdict().items():
            arrays[f"{name}.{field}"] = np.asarray(val)
    arrays["key"] = np.asarray(slam._key)
    # calibration state: BA with ba_optimize_intrinsics=True refines these
    # in-place (slam.py _merge_pending_ba), so 'resume exactly' must carry
    # them — reloading the calibration file would silently revert the map's
    # effective calibration.
    arrays["calib.intr0"] = np.asarray(slam.intr0)
    arrays["calib.intr1"] = np.asarray(slam.intr1)
    arrays["calib.T_0_1"] = np.asarray(slam.T_0_1)
    if slam.voc is not None:
        v = slam.voc
        arrays["voc.meta"] = np.asarray([v.k, v.depth])
        for f in ("node_desc", "children", "is_leaf", "word_of_node",
                  "node_of_word", "weights", "parent", "level"):
            arrays[f"voc.{f}"] = getattr(v, f)
    np.savez_compressed(path + ".npz", **arrays)

    host = {
        "frame": slam.frame,
        "take_keyframe": slam.take_keyframe,
        "last_kf_slot": slam.last_kf_slot,
        "kf_window": slam.kf_window,
        "slot_of_frame": {str(k): v for k, v in slam.slot_of_frame.items()},
        "covis": {str(k): v for k, v in slam.covis.items()},
        "tracking_ok": slam.tracking_ok,
        "trajectory": [t.tolist() for t in slam.trajectory],
        "loop_edges": slam.loop_edges,
        "pose_graph_done": slam.pose_graph_done,
        "db_inverted": {str(k): v for k, v in slam.detector.db.inverted.items()},
        "db_bow": {str(k): v for k, v in slam.detector.db.bow_of.items()},
        "consistent_groups": [
            [sorted(g), n] for g, n in slam.detector.consistent_groups],
        "stats": slam.stats,
    }
    with open(path + ".json", "w") as f:
        json.dump(host, f)


def save_stream(vo, path: str) -> None:
    """Checkpoint a StreamingVO / StreamingSLAM (pipeline/streaming.py).

    The stream state is one pytree; one blocking fetch writes it all.
    StreamingSLAM's host bookkeeping (detector db, covis cache, loop
    edges) goes to the JSON sidecar.
    """
    import jax

    st = jax.device_get(vo.state)
    arrays = {}
    for field, val in st._asdict().items():
        if val is None:
            continue
        if hasattr(val, "_asdict"):   # nested KeyframeState/LandmarkState
            for f2, v2 in val._asdict().items():
                arrays[f"{field}.{f2}"] = np.asarray(v2)
        else:
            arrays[field] = np.asarray(val)
    np.savez_compressed(path + ".npz", **arrays)

    host = {"kind": type(vo).__name__}
    if hasattr(vo, "detector"):
        host.update({
            "polled_to": vo._polled_to,
            "ev_consumed": vo._ev_consumed,
            "covis_host": {str(k): v for k, v in vo.covis_host.items()},
            "frame_of_slot": {str(k): v for k, v in
                              vo.frame_of_slot.items()},
            "loop_edges": vo.loop_edges,
            "host_key": np.asarray(vo._host_key).tolist(),
            "db_inverted": {str(k): v for k, v in
                            vo.detector.db.inverted.items()},
            "db_bow": {str(k): v for k, v in vo.detector.db.bow_of.items()},
            "consistent_groups": [
                [sorted(g), n] for g, n in vo.detector.consistent_groups],
        })
    with open(path + ".json", "w") as f:
        json.dump(host, f)


def load_stream(vo, path: str):
    """Restore a stream checkpoint into an initialized driver of the same
    configuration. Returns the driver."""
    data = np.load(path + ".npz")
    st = vo.state
    fields = {}
    for field, val in st._asdict().items():
        if val is None:
            fields[field] = None
        elif hasattr(val, "_asdict"):
            fields[field] = type(val)(**{
                f2: jnp.asarray(data[f"{field}.{f2}"])
                for f2 in val._fields})
        else:
            fields[field] = jnp.asarray(data[field])
    vo.state = type(st)(**fields)

    with open(path + ".json") as f:
        host = json.load(f)
    if hasattr(vo, "detector") and "db_inverted" in host:
        vo._polled_to = host["polled_to"]
        vo._ev_consumed = host.get("ev_consumed", vo._ev_consumed)
        vo.covis_host = {int(k): {int(s): w for s, w in d.items()}
                         for k, d in host["covis_host"].items()}
        vo.frame_of_slot = {int(k): v for k, v in
                            host["frame_of_slot"].items()}
        vo.loop_edges = [tuple(e) for e in host["loop_edges"]]
        vo._host_key = jnp.asarray(np.asarray(host["host_key"],
                                              np.uint32))
        vo.detector.db.inverted = {
            int(k): list(v) for k, v in host["db_inverted"].items()}
        vo.detector.db.bow_of = {
            int(k): {int(w): x for w, x in d.items()}
            for k, d in host["db_bow"].items()}
        vo.detector.consistent_groups = [
            (set(g), n) for g, n in host["consistent_groups"]]
    return vo


def load(slam: "SlamSystem", path: str) -> "SlamSystem":
    """Restore state saved by ``save`` into an initialized SlamSystem."""
    data = np.load(path + ".npz")

    def restore(tree, prefix):
        return type(tree)(**{
            f: jnp.asarray(data[f"{prefix}.{f}"]) for f in tree._fields})

    slam.lm = restore(slam.lm, "lm")
    slam.kf = restore(slam.kf, "kf")
    slam.track = restore(slam.track, "track")
    slam._key = jnp.asarray(data["key"])
    if "calib.intr0" in data:  # older checkpoints predate calib persistence
        slam.intr0 = jnp.asarray(data["calib.intr0"])
        slam.intr1 = jnp.asarray(data["calib.intr1"])
        slam.T_0_1 = jnp.asarray(data["calib.T_0_1"])
    if "voc.meta" in data:
        from ..loop import vocabulary as vocab_mod

        k, depth = (int(x) for x in data["voc.meta"])
        slam.voc = vocab_mod.Vocabulary(
            k=k, depth=depth,
            node_desc=data["voc.node_desc"], children=data["voc.children"],
            is_leaf=data["voc.is_leaf"],
            word_of_node=data["voc.word_of_node"],
            node_of_word=data["voc.node_of_word"],
            weights=data["voc.weights"], parent=data["voc.parent"],
            level=data["voc.level"])
        slam.device_voc = vocab_mod.DeviceVocabulary(slam.voc)

    with open(path + ".json") as f:
        host = json.load(f)
    slam.frame = host["frame"]
    slam.take_keyframe = host["take_keyframe"]
    slam.last_kf_slot = host["last_kf_slot"]
    slam.kf_window = list(host["kf_window"])
    slam.slot_of_frame = {int(k): v for k, v in host["slot_of_frame"].items()}
    slam.covis = {int(k): {int(s): w for s, w in d.items()}
                  for k, d in host["covis"].items()}
    slam.tracking_ok = host["tracking_ok"]
    slam.trajectory = [np.asarray(t) for t in host["trajectory"]]
    slam.loop_edges = [tuple(e) for e in host["loop_edges"]]
    slam.pose_graph_done = host["pose_graph_done"]
    slam.detector.db.inverted = {
        int(k): list(v) for k, v in host["db_inverted"].items()}
    slam.detector.db.bow_of = {
        int(k): {int(w): x for w, x in d.items()}
        for k, d in host["db_bow"].items()}
    slam.detector.consistent_groups = [
        (set(g), n) for g, n in host["consistent_groups"]]
    slam.stats = host["stats"]
    return slam
