"""StreamingVO: sync-free stereo VO — one fused XLA program per frame.

Why this driver exists: through a tunneled/queued accelerator, *blocking*
on in-flight device work costs a completion-polling quantum (~30 ms
measured) even though enqueues pipeline at full device speed (~3 ms/op) —
see tools/probe_tunnel.py. The faithful per-frame driver
(``pipeline.slam.SlamSystem``) syncs scalars every frame to decide
keyframing and retries, capping throughput at ~1/quantum regardless of
compute. This driver removes every per-frame host round trip:

- the keyframe decision (inliers < new_kf_min_inliers,
  /root/reference/src/slam.cpp:1374-1377) is carried ON DEVICE in the
  stream state and consumed by ``lax.cond`` — the host never reads it;
- tracking, stereo matching, keyframe insertion, window eviction
  (vo_utils.h:319-365), landmark culling, and the windowed Schur BA
  (slam.cpp:1510-1569) are all inside ONE jitted step, with the keyframe
  work under the cond so tracking-only frames skip it at runtime;
- per-frame poses and stats are written into device ring buffers and
  fetched once at the end of the run;
- state buffers are donated, so the step updates HBM in place.

Semantics = the reference's VO configuration (localize_camera without the
relocalization machinery, slam.cpp:1362-1372): exactly what
``SlamSystem(enable_relocalization=False, enable_loop_closure=False)``
computes, minus the one-frame BA-merge lag (BA here is synchronous inside
the keyframe branch, so keyframe poses are post-BA — strictly fresher than
the reference's background-thread merge). Parity is pinned by
tests/test_streaming.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import SlamConfig
from ..core import state as state_mod
from ..core.state import KeyframeState, LandmarkState
from ..frontend.features import extract_features
from ..geometry import lie
from ..io.calib import Calibration
from ..solvers import ba
from . import ba_window, keyframe as kf_mod, tracking


class StreamState(NamedTuple):
    kf: KeyframeState
    lm: LandmarkState
    cur_pose: jnp.ndarray     # [7]
    last_pose: jnp.ndarray    # [7]
    vel: jnp.ndarray          # [7]
    take_kf: jnp.ndarray      # [] bool — device-side keyframe decision
    last_kf_slot: jnp.ndarray  # [] int32
    frame: jnp.ndarray        # [] int32
    key: jnp.ndarray          # PRNG
    intr0: jnp.ndarray        # [8]
    intr1: jnp.ndarray        # [8]
    T_0_1: jnp.ndarray        # [7]
    traj: jnp.ndarray         # [F, 7] per-frame pose log
    log_inliers: jnp.ndarray  # [F] int32
    log_kf: jnp.ndarray       # [F] bool
    log_ok: jnp.ndarray       # [F] bool


def _make_step(cfg: SlamConfig, cam_name: str, width: int, height: int,
               pnp_threshold: float):
    """Build the fused per-frame step as a donated jitted function."""

    def step(state: StreamState, img_l, img_r) -> StreamState:
        key, k1 = jax.random.split(state.key)

        res = tracking.track_frame(
            k1, img_l, state.lm, state.cur_pose, state.last_pose, state.vel,
            state.intr0,
            cam_name=cam_name, num_features=cfg.num_features,
            inview_cap=cfg.max_inview_landmarks,
            width=width, height=height,
            z_threshold=cfg.cam_z_threshold,
            match_max_dist_2d=cfg.match_max_dist_2d,
            match_threshold=cfg.match_max_dist,
            match_ratio=cfg.match_next_best,
            pnp_threshold=pnp_threshold,
            num_hypotheses=cfg.ransac_hypotheses,
            min_matches=cfg.ransac_min_matches,
            quality_level=cfg.quality_level,
            min_distance=cfg.min_distance,
            rotate_features=cfg.rotate_features,
            num_octaves=cfg.num_octaves,
        )
        ok = res.pnp_ok
        pose = jnp.where(ok, res.T_w_c, state.cur_pose)
        K = state.kf.frame_id.shape[0]

        def kf_branch(op):
            kf, lm = op
            feats_r = extract_features(
                img_r, num_features=cfg.num_features,
                quality_level=cfg.quality_level,
                min_distance=cfg.min_distance,
                rotate_features=cfg.rotate_features,
                num_octaves=cfg.num_octaves)
            stereo_j, stereo_inl = kf_mod.stereo_match(
                res.feats, feats_r, state.T_0_1, state.intr0, state.intr1,
                cam_name=cam_name, threshold=cfg.match_max_dist,
                ratio=cfg.match_next_best,
                epipolar_threshold=cfg.epipolar_error_threshold)
            suppress = (res.had_candidate
                        if cfg.suppress_duplicate_landmarks else None)
            out = kf_mod.insert_keyframe(
                kf, lm, state.frame, state.last_kf_slot, pose, state.T_0_1,
                res.feats, feats_r, stereo_j, stereo_inl,
                res.match_lm, res.inlier, state.intr0, state.intr1,
                cam_name=cam_name, suppress_new=suppress)

            # window eviction ON DEVICE (remove_old_keyframes semantics):
            # keep the newest max_num_kfs active pairs by frame id
            act = out.kf.valid & out.kf.active
            fid = jnp.where(act, out.kf.frame_id, -1)
            keep_n = min(cfg.max_num_kfs, K)
            kth = lax.top_k(fid, keep_n)[0][keep_n - 1]
            deact = act & (fid < kth)
            kf2, lm2 = kf_mod.deactivate_keyframes(out.kf, out.lm, deact)

            if cfg.enable_lm_culling:
                pressure = int(cfg.lm_cull_pressure * lm2.valid.shape[0])

                def cull(a):
                    k3, l3, _ = kf_mod.cull_landmarks(
                        a[0], a[1], min_lifetime_obs=cfg.lm_cull_min_obs)
                    return k3, l3

                kf2, lm2 = lax.cond(
                    jnp.sum(lm2.valid) >= pressure, cull, lambda a: a,
                    (kf2, lm2))

            # synchronous windowed Schur BA (slam.cpp:1510-1569); the
            # keyframe pose below is post-BA — fresher than the reference's
            # background-thread merge
            wp = ba_window.build_window_problem(
                kf2, lm2, state.intr0, state.intr1,
                W2=cfg.window_cams // 2, Lw=cfg.window_points,
                O=cfg.window_obs)
            poses, points, _ = ba.solve_ba_schur(
                wp.prob, cam_name=cam_name, huber=cfg.ba_huber_px,
                max_iters=cfg.ba_max_iters)
            kf3, lm3 = ba_window.merge_window_result(kf2, lm2, wp, poses,
                                                     points)
            in_cap = out.slot < K
            pose_kf = jnp.where(in_cap, kf3.pose_l[jnp.minimum(out.slot,
                                                               K - 1)], pose)
            slot = jnp.where(in_cap, out.slot,
                             state.last_kf_slot).astype(jnp.int32)
            return kf3, lm3, pose_kf, slot

        def tr_branch(op):
            kf, lm = op
            return kf, lm, pose, state.last_kf_slot

        kf2, lm2, pose2, last_slot = lax.cond(
            state.take_kf, kf_branch, tr_branch, (state.kf, state.lm))

        # advance (slam.cpp:1299-1301,1453-1455) + velocity-decay guard
        vel = lie.se3_mul(lie.se3_inv(state.last_pose), pose2)
        n_inl = jnp.where(ok, res.num_inliers, 0)
        if cfg.enable_vel_decay:
            weak = ~ok | (n_inl < cfg.vel_decay_inlier_floor)
            vel = jnp.where(
                weak, lie.se3_exp(cfg.vel_decay_factor * lie.se3_log(vel)),
                vel)

        # next-frame keyframe decision, carried on device: a keyframe step
        # resets it (the reference's take_keyframe=false), a tracking step
        # re-arms it on low inliers (slam.cpp:1374-1377)
        take_next = ~state.take_kf & (n_inl < cfg.new_kf_min_inliers)

        f = state.frame
        return state._replace(
            kf=kf2, lm=lm2,
            cur_pose=pose2, last_pose=pose2, vel=vel,
            take_kf=take_next,
            last_kf_slot=last_slot,
            frame=f + 1,
            key=key,
            traj=state.traj.at[f].set(pose2, mode="drop"),
            log_inliers=state.log_inliers.at[f].set(n_inl, mode="drop"),
            log_kf=state.log_kf.at[f].set(state.take_kf, mode="drop"),
            log_ok=state.log_ok.at[f].set(ok, mode="drop"),
        )

    return jax.jit(step, donate_argnums=(0,))


class StreamingVO:
    """High-throughput stereo VO runner (see module docstring)."""

    def __init__(self, calib: Calibration,
                 config: Optional[SlamConfig] = None,
                 max_frames: int = 8192):
        import math

        self.cfg = cfg = config or SlamConfig()
        self.calib = calib
        self.cam_name = calib.cam_types[0]
        self.max_frames = max_frames
        pnp_threshold = 1.0 - math.cos(
            math.atan(cfg.pnp_inlier_thresh_px / 500.0))
        self._step = _make_step(cfg, self.cam_name, calib.width,
                                calib.height, pnp_threshold)
        self.reset()

    def reset(self):
        cfg = self.cfg
        dt = jnp.float32
        intr0 = jnp.asarray(self.calib.intrinsics[0], dt)
        intr1 = jnp.asarray(self.calib.intrinsics[1], dt)
        T_i_c0 = jnp.asarray(self.calib.T_i_c[0], dt)
        T_i_c1 = jnp.asarray(self.calib.T_i_c[1], dt)
        F = self.max_frames
        self.state = StreamState(
            kf=state_mod.init_keyframes(cfg.max_keyframes, cfg.num_features),
            lm=state_mod.init_landmarks(cfg.max_landmarks,
                                        B=cfg.lm_desc_bank),
            cur_pose=lie.identity_pose(dt),
            last_pose=lie.identity_pose(dt),
            vel=lie.identity_pose(dt),
            take_kf=jnp.asarray(True),
            last_kf_slot=jnp.asarray(-1, jnp.int32),
            frame=jnp.asarray(0, jnp.int32),
            key=jax.random.PRNGKey(cfg.seed),
            intr0=intr0, intr1=intr1,
            T_0_1=lie.se3_mul(lie.se3_inv(T_i_c0), T_i_c1),
            traj=jnp.zeros((F, 7), dt),
            log_inliers=jnp.zeros((F,), jnp.int32),
            log_kf=jnp.zeros((F,), bool),
            log_ok=jnp.zeros((F,), bool),
        )

    def process_frame(self, img_l, img_r):
        """Enqueue one frame. Non-blocking: no host sync happens here."""
        self.state = self._step(self.state, jnp.asarray(img_l),
                                jnp.asarray(img_r))

    def run(self, frames, prefetch: int = 24, sync_every: int = 256,
            chunk: int = 0):
        """Process [(img_l, img_r)] pairs with a device-side prefetch ring.

        Images are committed individually ``prefetch`` frames ahead (slicing
        a batched upload inside the stream serializes the pipeline — the
        slice executions interleave with the steps and cost ~2x throughput).
        ``sync_every`` occasionally blocks on the frame counter so the
        enqueue queue can't run unboundedly ahead of the device.
        """
        del chunk  # kept for API compat
        n = len(frames)
        buf = {}

        def put(i):
            buf[i] = (jax.device_put(jnp.asarray(frames[i][0])),
                      jax.device_put(jnp.asarray(frames[i][1])))

        for i in range(min(prefetch, n)):
            put(i)
        for i in range(n):
            il, ir = buf.pop(i)
            self.state = self._step(self.state, il, ir)
            j = i + prefetch
            if j < n:
                put(j)
            if sync_every and (i + 1) % sync_every == 0:
                jax.block_until_ready(self.state.frame)
        return n

    def results(self) -> dict:
        """One blocking fetch of every per-frame log + final pose."""
        n, traj, inl, kfm, okm = jax.device_get(
            (self.state.frame, self.state.traj, self.state.log_inliers,
             self.state.log_kf, self.state.log_ok))
        n = int(n)
        return {
            "frames": n,
            "trajectory": traj[:n],
            "inliers": inl[:n],
            "is_keyframe": kfm[:n],
            "tracked_ok": okm[:n],
        }

    def keyframe_trajectory(self):
        """(frame_ids, positions, poses) of valid keyframes, for ATE."""
        valid, fids, poses = jax.device_get(
            (self.state.kf.valid, self.state.kf.frame_id,
             self.state.kf.pose_l))
        fids = fids[valid]
        poses = poses[valid]
        order = np.argsort(fids)
        return fids[order], poses[order][:, :3], poses[order]
