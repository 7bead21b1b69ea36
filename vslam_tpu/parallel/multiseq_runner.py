"""Batched multi-sequence VO: one SLAM instance per sequence, lockstep.

The throughput configuration from BASELINE.json configs[3] ("all 8 EuRoC
sequences mapped in parallel on one chip" / across a mesh): every device
step is vmapped over the sequence axis, optionally sharded over a mesh's
'data' axis. All sequences execute the same fixed-shape programs each
frame; per-sequence keyframe decisions ride an ``enabled`` mask into the
(vmapped) keyframe-insertion and BA programs, so control flow stays on the
host and uniform across the batch.

This runner covers the VO configuration (tracking + keyframing + windowed
BA); loop closure remains per-sequence host logic and is out of the
batched hot path by design (it is rare and keyframe-driven).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..core import state as state_mod
from ..frontend.features import extract_features
from ..geometry import lie
from ..io.calib import Calibration
from ..pipeline import ba_window, keyframe as kf_mod, tracking
from ..solvers import ba


class MultiSeqVO:
    """Lockstep VO over S sequences sharing one calibration."""

    def __init__(self, calib: Calibration, num_sequences: int,
                 config: Optional[SlamConfig] = None, mesh=None):
        self.cfg = cfg = config or SlamConfig()
        self.S = S = num_sequences
        self.calib = calib
        self.cam_name = calib.cam_types[0]
        self.width, self.height = calib.width, calib.height
        self.mesh = mesh

        dt = jnp.float32
        self.intr0 = jnp.asarray(calib.intrinsics[0], dt)
        self.intr1 = jnp.asarray(calib.intrinsics[1], dt)
        T_i_c0 = jnp.asarray(calib.T_i_c[0], dt)
        T_i_c1 = jnp.asarray(calib.T_i_c[1], dt)
        self.T_0_1 = lie.se3_mul(lie.se3_inv(T_i_c0), T_i_c1)

        def batch(tree):
            return jax.tree.map(lambda x: jnp.stack([x] * S), tree)

        self.lm = batch(state_mod.init_landmarks(cfg.max_landmarks,
                                                 B=cfg.lm_desc_bank))
        self.kf = batch(state_mod.init_keyframes(cfg.max_keyframes,
                                                 cfg.num_features))
        self.pose = jnp.tile(lie.identity_pose(dt), (S, 1))
        self.last_pose = jnp.tile(lie.identity_pose(dt), (S, 1))
        self.vel = jnp.tile(lie.identity_pose(dt), (S, 1))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("data"))

            def place(x):
                return jax.device_put(x, NamedSharding(
                    mesh, P("data", *([None] * (x.ndim - 1)))))

            self.lm = jax.tree.map(place, self.lm)
            self.kf = jax.tree.map(place, self.kf)

        import math

        pnp_thr = 1.0 - math.cos(math.atan(cfg.pnp_inlier_thresh_px / 500.0))

        self._track = jax.vmap(functools.partial(
            tracking.track_frame,
            cam_name=self.cam_name, num_features=cfg.num_features,
            inview_cap=cfg.max_inview_landmarks,
            width=self.width, height=self.height,
            z_threshold=cfg.cam_z_threshold,
            match_max_dist_2d=cfg.match_max_dist_2d,
            match_threshold=cfg.match_max_dist,
            match_ratio=cfg.match_next_best,
            pnp_threshold=pnp_thr,
            num_hypotheses=cfg.ransac_hypotheses,
            min_matches=cfg.ransac_min_matches,
            quality_level=cfg.quality_level,
            min_distance=cfg.min_distance,
        ), in_axes=(0, 0, 0, 0, 0, 0, None))

        self._extract = jax.vmap(functools.partial(
            extract_features, num_features=cfg.num_features,
            quality_level=cfg.quality_level,
            min_distance=cfg.min_distance))

        self._stereo = jax.vmap(functools.partial(
            kf_mod.stereo_match, cam_name=self.cam_name,
            threshold=cfg.match_max_dist, ratio=cfg.match_next_best,
            epipolar_threshold=cfg.epipolar_error_threshold,
        ), in_axes=(0, 0, None, None, None))

        def _insert_one(kf1, lm1, fid, parent, pose1, T01, fl, fr, sj, si,
                        ml, li, i0, i1, en):
            return kf_mod.insert_keyframe(
                kf1, lm1, fid, parent, pose1, T01, fl, fr, sj, si, ml, li,
                i0, i1, cam_name=self.cam_name, enabled=en)

        self._insert = jax.vmap(
            _insert_one,
            in_axes=(0, 0, None, 0, 0, None, 0, 0, 0, 0, 0, 0, None, None, 0))

        self._deact = jax.vmap(kf_mod.deactivate_keyframes)

        def window_ba(kf1, lm1):
            wp = ba_window.build_window_problem(
                kf1, lm1, self.intr0, self.intr1,
                W2=cfg.window_cams // 2, Lw=cfg.window_points,
                O=cfg.window_obs)
            poses, points, stats = ba.solve_ba_schur(
                wp.prob, cam_name=self.cam_name, huber=cfg.ba_huber_px,
                max_iters=cfg.ba_max_iters)
            kf2, lm2 = ba_window.merge_window_result(kf1, lm1, wp, poses,
                                                     points)
            return kf2, lm2

        self._window_ba = jax.jit(jax.vmap(window_ba))

        self.frame = 0
        self.take_keyframe = np.ones(S, bool)
        self.last_kf_slot = np.full(S, -1, np.int64)
        self.kf_windows: List[List[int]] = [[] for _ in range(S)]
        self.slot_of_frame: List[dict] = [{} for _ in range(S)]
        self.trajectories: List[List[np.ndarray]] = [[] for _ in range(S)]
        self.stats: List[dict] = []
        self._key = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------
    def process_frames(self, imgs_l, imgs_r) -> dict:
        """One lockstep frame: imgs_* [S, H, W] uint8."""
        cfg = self.cfg
        S = self.S
        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, S)

        res = self._track(keys, jnp.asarray(imgs_l), self.lm, self.pose,
                          self.pose, self.vel, self.intr0)
        ok = np.asarray(res.pnp_ok)
        n_inl = np.asarray(res.num_inliers)
        pose = jnp.where(jnp.asarray(ok)[:, None], res.T_w_c, self.pose)

        need_kf = self.take_keyframe | (n_inl < cfg.new_kf_min_inliers)
        info = {"frame": self.frame, "inliers": n_inl.tolist(),
                "keyframes": need_kf.tolist()}

        if need_kf.any():
            feats_r = self._extract(jnp.asarray(imgs_r))
            sj, sinl = self._stereo(res.feats, feats_r, self.T_0_1,
                                    self.intr0, self.intr1)
            enabled = jnp.asarray(need_kf)
            out = self._insert(
                self.kf, self.lm,
                jnp.asarray(self.frame, jnp.int32),
                jnp.asarray(self.last_kf_slot, jnp.int32),
                pose, self.T_0_1, res.feats, feats_r, sj, sinl,
                res.match_lm, res.inlier, self.intr0, self.intr1, enabled)
            self.kf, self.lm = out.kf, out.lm
            slots = np.asarray(out.slot)

            deact = np.zeros((S, cfg.max_keyframes), bool)
            any_deact = False
            for s in range(S):
                if not need_kf[s]:
                    continue
                self.last_kf_slot[s] = slots[s]
                self.slot_of_frame[s][self.frame] = int(slots[s])
                self.kf_windows[s].append(self.frame)
                while len(self.kf_windows[s]) > cfg.max_num_kfs:
                    old = self.kf_windows[s].pop(0)
                    deact[s, self.slot_of_frame[s][old]] = True
                    any_deact = True
                self.take_keyframe[s] = False
            if any_deact:
                self.kf, self.lm = self._deact(self.kf, self.lm,
                                               jnp.asarray(deact))
            self.kf, self.lm = self._window_ba(self.kf, self.lm)
            # keyframe sequences adopt their optimized pose
            kf_pose = jnp.take_along_axis(
                self.kf.pose_l, jnp.asarray(slots)[:, None, None]
                % cfg.max_keyframes, axis=1)[:, 0]
            pose = jnp.where(enabled[:, None], kf_pose, pose)

        self.vel = jax.vmap(lambda a, b: lie.se3_mul(lie.se3_inv(a), b))(
            self.last_pose, pose)
        self.last_pose = pose
        self.pose = pose
        for s in range(S):
            self.trajectories[s].append(np.asarray(pose[s]))
        self.frame += 1
        self.stats.append(info)
        return info
