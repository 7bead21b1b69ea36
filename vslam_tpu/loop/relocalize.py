"""Relocalization after tracking loss.

Port of the reference's recovery path (tracking.h:241-419): BoW query for
top-5 candidate keyframes, correspondence harvest against each candidate +
its covisibility neighbors, RANSAC PnP (>= 10 inliers), and the
constant-velocity motion gate; bounded retries per candidate.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import KeyframeState, LandmarkState
from ..geometry import cameras as cam_models
from ..geometry import lie
from ..solvers import pnp
from .closure import _pow2, harvest_correspondences


def relocalize(
    kf: KeyframeState,
    lm: LandmarkState,
    detector,
    cur_bits,
    cur_valid,
    cur_corners,
    bow: dict,
    graph: Dict[int, Set[int]],
    current_pose,
    vel,
    intr0,
    cam_name: str,
    motion_threshold: float,
    pnp_threshold: float,
    key,
    num_hypotheses: int = 256,
    max_retries: int = 5,
    max_candidates: int = 5,
    frames_lost: int = 1,
    gate_cap_mult: int = 12,
):
    """Returns (ok, T_w_c, inlier_pairs [(feat, landmark)], diag dict).

    ``frames_lost`` scales the motion gate: the reference relocalizes on
    EVERY lost frame (slam.cpp:1355-1359), so its gate always compares
    against a one-frame-old motion model. A poll-granularity driver
    arrives ``frames_lost`` frames late, with the coasted pose frozen near
    the loss point while the true camera kept moving — the divergence
    grows roughly linearly per lost frame, so the acceptance window must
    too (gate = motion_threshold * frames_lost). ``gate_cap_mult`` bounds
    the scaling (r4 advisor finding: unbounded it degrades to inlier-
    count-only acceptance, and a long loss could accept an aliased
    candidate far off the trajectory; losses the capped gate cannot
    explain fall through to the sustained-loss re-bootstrap). ORB-SLAM's
    reloc has no motion gate at all; the bounded version keeps fresh-loss
    recoveries reference-faithful.

    ``diag`` records why the search ended (for the bench/metrics
    counters): candidates tried, best PnP inlier count, best gate error.
    """
    diag = {"candidates": 0, "best_n": 0, "best_gate_err": None,
            "gate": motion_threshold * min(max(1, int(frames_lost)),
                                           max(1, int(gate_cap_mult)))}
    candidates = detector.relocalization_candidates(bow, max_candidates)
    if not candidates:
        return False, None, [], diag
    diag["candidates"] = len(candidates)

    vel_log = lie.se3_log(vel)
    inv_cur = lie.se3_inv(current_pose)
    eff_gate = diag["gate"]

    for cand in candidates:
        sources = [cand, *sorted(graph.get(cand, ()))]
        lms, feats = harvest_correspondences(
            kf, lm, cur_bits, cur_valid, sources)
        if len(lms) < 5:
            # reference aborts the whole search on a thin candidate
            # (tracking.h:339-341); keep trying the others instead
            continue
        cap = _pow2(len(lms))
        points = np.zeros((cap, 3), np.float32)
        bearings = np.zeros((cap, 3), np.float32)
        points[:len(lms)] = np.asarray(lm.pos)[lms]
        corners = np.asarray(cur_corners)[feats]
        bearings[:len(lms)] = np.asarray(
            cam_models.unproject(cam_name, intr0, jnp.asarray(corners)))
        valid = np.arange(cap) < len(lms)

        for _ in range(max_retries + 1):
            key, k = jax.random.split(key)
            T_wc, inl, n, _ = pnp.ransac_pnp(
                k, jnp.asarray(points), jnp.asarray(bearings),
                jnp.asarray(valid), pnp_threshold,
                num_hypotheses=num_hypotheses)
            n = int(n)
            diag["best_n"] = max(diag["best_n"], n)
            if n < 10:
                continue
            se3_vel = lie.se3_log(lie.se3_mul(inv_cur, T_wc))
            err = float(jnp.sum(jnp.abs(se3_vel[:3] - vel_log[:3])))
            if diag["best_gate_err"] is None or err < diag["best_gate_err"]:
                diag["best_gate_err"] = round(err, 3)
            if err <= eff_gate:
                inl_np = np.asarray(inl)[:len(lms)]
                pairs = [(int(feats[i]), int(lms[i]))
                         for i in np.nonzero(inl_np)[0]]
                return True, T_wc, pairs, diag
    return False, None, [], diag
