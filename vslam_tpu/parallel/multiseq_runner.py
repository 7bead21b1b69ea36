"""Batched multi-sequence VO: one SLAM instance per sequence, lockstep.

The throughput configuration from BASELINE.json configs[3] ("all 8 EuRoC
sequences mapped in parallel on one chip" / across a mesh). Like
``pipeline.streaming.StreamingVO`` — and for the same reason (any host
block through the tunneled device costs a ~30 ms polling quantum,
tools/probe_tunnel.py) — the whole lockstep frame is ONE fused jitted
step with no per-frame host round trips:

- tracking is vmapped over the sequence axis;
- the per-sequence keyframe decisions live in the state as a device bool
  vector; ``lax.cond(any(take_kf), ...)`` OUTSIDE the vmap skips the
  keyframe work entirely on frames where no sequence needs it (a cond
  under vmap would degenerate to executing both branches);
- single-chip (no mesh), the keyframe branch is COMPACTED to one
  sequence per frame: the round-robin-selected requester is gathered out
  of the batch, its right image alone goes through feature extraction +
  stereo matching + insert + evict/cull at single-sequence cost, and the
  result scatters back. Pending requests stay latched in ``take_kf``, so
  with S staggered sequences the branch drains ~1 request/frame instead
  of paying the S-fold vmapped extraction whenever any sequence fires —
  extraction is the dominant keyframe cost (stage table, ROUND3_NOTES).
  Under a mesh the vmapped all-sequence branch is kept: each device
  inserts its own resident sequence in parallel, and a one-sequence
  gather would serialize the mesh instead;
- in the vmapped (mesh) branch every sequence runs the (enabled-masked)
  insert + eviction + culling — but NOT the windowed BA;
- the windowed BA is DECOUPLED from the lockstep: inserting a keyframe
  latches a per-sequence ``ba_pending`` flag, and each frame solves the
  BA for at most ONE pending sequence (round-robin), gathered out of the
  batch, solved at single-sequence cost, and scattered back. With S
  staggered sequences the old design paid the vmapped S-fold BA whenever
  *any* sequence keyframed — nearly every period — which is exactly the
  S-times-BA bill this scheduler amortizes to one BA per frame. Sequences
  with a BA in flight don't take new keyframes (the reference's
  !opt_running gate, slam.cpp:1374-1377 — its background optimize()
  thread is the same decoupling, one sequence at a time);
- poses/stats land in device ring buffers, fetched on access.

With a mesh, all [S, ...] state is sharded over the 'data' axis (pure
data parallelism, one sequence per device).
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
from ..pipeline import ba_window, keyframe as kf_mod, tracking
from ..solvers import ba


class MultiSeqState(NamedTuple):
    kf: KeyframeState         # [S, ...]
    lm: LandmarkState         # [S, ...]
    pose: jnp.ndarray         # [S, 7]
    last_pose: jnp.ndarray    # [S, 7]
    vel: jnp.ndarray          # [S, 7]
    take_kf: jnp.ndarray      # [S] bool
    last_kf_slot: jnp.ndarray  # [S] int32
    ba_pending: jnp.ndarray   # [S] bool — keyframed, window BA not yet run
    ba_cursor: jnp.ndarray    # [] int32 round-robin fairness cursor
    kf_cursor: jnp.ndarray    # [] int32 round-robin cursor (compact inserts)
    frame: jnp.ndarray        # [] int32
    key: jnp.ndarray
    intr0: jnp.ndarray        # [8]
    intr1: jnp.ndarray        # [8]
    T_0_1: jnp.ndarray        # [7]
    traj: jnp.ndarray         # [S, F, 7]
    log_inliers: jnp.ndarray  # [S, F] int32
    log_kf: jnp.ndarray       # [S, F] bool


def _make_step(cfg: SlamConfig, cam_name: str, width: int, height: int,
               pnp_threshold: float, S: int, compact_inserts: bool,
               chunk: int = 1):
    track1 = functools.partial(
        tracking.track_frame,
        cam_name=cam_name, num_features=cfg.num_features,
        inview_cap=cfg.max_inview_landmarks, width=width, height=height,
        z_threshold=cfg.cam_z_threshold,
        match_max_dist_2d=cfg.match_max_dist_2d,
        match_threshold=cfg.match_max_dist, match_ratio=cfg.match_next_best,
        pnp_threshold=pnp_threshold, num_hypotheses=cfg.ransac_hypotheses,
        min_matches=cfg.ransac_min_matches, quality_level=cfg.quality_level,
        min_distance=cfg.min_distance, rotate_features=cfg.rotate_features,
        num_octaves=cfg.num_octaves)

    extract1 = functools.partial(
        extract_features, num_features=cfg.num_features,
        quality_level=cfg.quality_level, min_distance=cfg.min_distance,
        rotate_features=cfg.rotate_features, num_octaves=cfg.num_octaves)

    def step(state: MultiSeqState, imgs_l, imgs_r) -> MultiSeqState:
        key, k = jax.random.split(state.key)
        keys = jax.random.split(k, S)
        res = jax.vmap(track1, in_axes=(0, 0, 0, 0, 0, 0, None))(
            keys, imgs_l, state.lm, state.pose, state.last_pose, state.vel,
            state.intr0)
        ok = res.pnp_ok
        pose = jnp.where(ok[:, None], res.T_w_c, state.pose)
        K = state.kf.frame_id.shape[1]

        # A sequence whose windowed BA hasn't run yet may not take another
        # keyframe (!opt_running gate, slam.cpp:1374-1377).
        eligible = state.take_kf & ~state.ba_pending
        if compact_inserts:
            # single-chip: drain ONE pending request per frame at
            # single-sequence cost (gather -> extract/stereo/insert ->
            # scatter); the S-fold vmapped extraction was the dominant
            # batched cost (ROUND3_NOTES gap #1)
            fire = jnp.any(eligible)
            S_ids = jnp.arange(S)
            prio = jnp.where(eligible, (S_ids - state.kf_cursor) % S, S + 1)
            sel = jnp.argmin(prio).astype(jnp.int32)
            inserted = (S_ids == sel) & fire
        else:
            # mesh: every device inserts its own resident sequence in
            # parallel; batch the branch on period boundaries to amortize
            period = max(int(cfg.multiseq_kf_period), 1)
            due = (state.frame % period) == 0
            fire = due & jnp.any(eligible)
            inserted = eligible & fire

        stereo1 = functools.partial(
            kf_mod.stereo_match, cam_name=cam_name,
            threshold=cfg.match_max_dist, ratio=cfg.match_next_best,
            epipolar_threshold=cfg.epipolar_error_threshold)

        def evict1(kf1, lm1):
            act = kf1.valid & kf1.active
            fid = jnp.where(act, kf1.frame_id, -1)
            keep_n = min(cfg.max_num_kfs, K)
            kth = lax.top_k(fid, keep_n)[0][keep_n - 1]
            return kf_mod.deactivate_keyframes(kf1, lm1, act & (fid < kth))

        def cull1(kf1, lm1):
            pressure = int(cfg.lm_cull_pressure * lm1.valid.shape[0])

            def do(a):
                k3, l3, _ = kf_mod.cull_landmarks(
                    a[0], a[1], min_lifetime_obs=cfg.lm_cull_min_obs)
                return k3, l3

            return lax.cond(jnp.sum(lm1.valid) >= pressure, do,
                            lambda a: a, (kf1, lm1))

        def kf_branch_compact(op):
            kf_b, lm_b = op
            kf1 = jax.tree.map(lambda x: x[sel], kf_b)
            lm1 = jax.tree.map(lambda x: x[sel], lm_b)
            feats_l = jax.tree.map(lambda x: x[sel], res.feats)
            feats_r = extract1(imgs_r[sel])
            sj, sinl = stereo1(feats_l, feats_r, state.T_0_1, state.intr0,
                               state.intr1)
            out = kf_mod.insert_keyframe(
                kf1, lm1, state.frame, state.last_kf_slot[sel], pose[sel],
                state.T_0_1, feats_l, feats_r, sj, sinl,
                res.match_lm[sel], res.inlier[sel], state.intr0,
                state.intr1, cam_name=cam_name, enabled=True)
            kf2, lm2 = evict1(out.kf, out.lm)
            if cfg.enable_lm_culling:
                kf2, lm2 = cull1(kf2, lm2)
            kf_c = jax.tree.map(lambda X, x: X.at[sel].set(x), kf_b, kf2)
            lm_c = jax.tree.map(lambda X, x: X.at[sel].set(x), lm_b, lm2)
            slot1 = jnp.where(out.slot < K, out.slot,
                              state.last_kf_slot[sel]).astype(jnp.int32)
            return kf_c, lm_c, pose, state.last_kf_slot.at[sel].set(slot1)

        def kf_branch(op):
            kf, lm = op
            feats_r = jax.vmap(extract1)(imgs_r)
            sj, sinl = jax.vmap(stereo1, in_axes=(0, 0, None, None, None))(
                res.feats, feats_r, state.T_0_1, state.intr0, state.intr1)

            def insert1(kf1, lm1, parent, pose1, fl, fr, sj1, si1, ml, li,
                        en):
                return kf_mod.insert_keyframe(
                    kf1, lm1, state.frame, parent, pose1, state.T_0_1,
                    fl, fr, sj1, si1, ml, li, state.intr0, state.intr1,
                    cam_name=cam_name, enabled=en)

            out = jax.vmap(insert1)(
                kf, lm, state.last_kf_slot, pose, res.feats, feats_r,
                sj, sinl, res.match_lm, res.inlier, inserted)

            kf2, lm2 = jax.vmap(evict1)(out.kf, out.lm)
            if cfg.enable_lm_culling:
                kf2, lm2 = jax.vmap(cull1)(kf2, lm2)

            in_cap = out.slot < K
            took = inserted & in_cap
            slot2 = jnp.where(took, out.slot,
                              state.last_kf_slot).astype(jnp.int32)
            return kf2, lm2, pose, slot2

        def tr_branch(op):
            kf, lm = op
            return kf, lm, pose, state.last_kf_slot

        kf2, lm2, pose2, last_slot = lax.cond(
            fire, kf_branch_compact if compact_inserts else kf_branch,
            tr_branch, (state.kf, state.lm))

        kf_cursor = (jnp.where(fire, sel + 1,
                               state.kf_cursor).astype(jnp.int32)
                     if compact_inserts else state.kf_cursor)

        # --- decoupled windowed BA: at most ONE sequence per frame ---
        ba_pending = state.ba_pending | inserted

        def ba_branch(op):
            kf_b, lm_b, pending, cursor = op
            S_ids = jnp.arange(S)
            # round-robin fairness: lowest (id - cursor) mod S among pending
            prio = jnp.where(pending, (S_ids - cursor) % S, S + 1)
            s = jnp.argmin(prio).astype(jnp.int32)
            kf1 = jax.tree.map(lambda x: x[s], kf_b)
            lm1 = jax.tree.map(lambda x: x[s], lm_b)
            wp = ba_window.build_window_problem(
                kf1, lm1, state.intr0, state.intr1,
                W2=cfg.window_cams // 2, Lw=cfg.window_points,
                O=cfg.window_obs, obs_per_lm=cfg.ba_obs_per_lm)
            poses, points, _ = ba.solve_ba_schur(
                wp.prob, cam_name=cam_name, huber=cfg.ba_huber_px,
                max_iters=cfg.ba_max_iters)
            kf1b, lm1b = ba_window.merge_window_result(kf1, lm1, wp, poses,
                                                       points)
            kf_c = jax.tree.map(lambda X, x: X.at[s].set(x), kf_b, kf1b)
            lm_c = jax.tree.map(lambda X, x: X.at[s].set(x), lm_b, lm1b)
            return kf_c, lm_c, pending.at[s].set(False), s + 1

        kf3, lm3, ba_pending2, cursor2 = lax.cond(
            jnp.any(ba_pending), ba_branch, lambda op: op,
            (kf2, lm2, ba_pending, state.ba_cursor))

        vel = jax.vmap(lambda a, b: lie.se3_mul(lie.se3_inv(a), b))(
            state.last_pose, pose2)
        n_inl = jnp.where(ok, res.num_inliers, 0)
        if cfg.enable_vel_decay:
            weak = ~ok | (n_inl < cfg.vel_decay_inlier_floor)
            decayed = jax.vmap(
                lambda v: lie.se3_exp(cfg.vel_decay_factor * lie.se3_log(v))
            )(vel)
            vel = jnp.where(weak[:, None], decayed, vel)
        # pending requests stay latched until their period boundary fires;
        # sequences that just inserted reset; low-inlier frames latch new
        take_next = (state.take_kf
                     | (n_inl < cfg.new_kf_min_inliers)) & ~inserted

        f = state.frame
        return state._replace(
            kf=kf3, lm=lm3, pose=pose2, last_pose=pose2, vel=vel,
            take_kf=take_next, last_kf_slot=last_slot,
            ba_pending=ba_pending2, ba_cursor=cursor2, kf_cursor=kf_cursor,
            frame=f + 1, key=key,
            traj=state.traj.at[:, f].set(pose2, mode="drop"),
            log_inliers=state.log_inliers.at[:, f].set(n_inl, mode="drop"),
            log_kf=state.log_kf.at[:, f].set(inserted, mode="drop"),
        )

    if chunk == 1:
        return jax.jit(step, donate_argnums=(0,))

    def chunk_step(state: MultiSeqState, imgs) -> MultiSeqState:
        # imgs [C, 2, S, H, W]: one dispatch + one h2d per C lockstep
        # frames (same lever as streaming's chunk=4 — per-op relay/host
        # overhead through the tunnel dominates the lockstep wall)
        return lax.scan(lambda s, im: (step(s, im[0], im[1]), None),
                        state, imgs)[0]

    return jax.jit(chunk_step, donate_argnums=(0,))


class MultiSeqVO:
    """Lockstep VO over S sequences sharing one calibration."""

    def __init__(self, calib: Calibration, num_sequences: int,
                 config: Optional[SlamConfig] = None, mesh=None,
                 max_frames: int = 4096, chunk: int = 1):
        import math

        self.cfg = cfg = config or SlamConfig()
        self.S = num_sequences
        self.calib = calib
        self.cam_name = calib.cam_types[0]
        self.mesh = mesh
        self.max_frames = max_frames
        if mesh is not None and chunk and chunk > 1:
            raise ValueError("chunked dispatch is single-chip only (the "
                             "packed [C,2,S,H,W] upload bypasses the "
                             "per-sequence mesh sharding)")
        self.chunk = max(1, int(chunk))
        pnp_thr = 1.0 - math.cos(math.atan(cfg.pnp_inlier_thresh_px / 500.0))
        self._step = _make_step(cfg, self.cam_name, calib.width,
                                calib.height, pnp_thr, num_sequences,
                                compact_inserts=mesh is None,
                                chunk=self.chunk)
        self._step1 = self._step if self.chunk == 1 else None
        self._img_sharding = None
        self.reset()

    def _single_step(self):
        if self._step1 is None:
            import math

            cfg = self.cfg
            pnp_thr = 1.0 - math.cos(
                math.atan(cfg.pnp_inlier_thresh_px / 500.0))
            self._step1 = _make_step(
                cfg, self.cam_name, self.calib.width, self.calib.height,
                pnp_thr, self.S, compact_inserts=self.mesh is None, chunk=1)
        return self._step1

    def reset(self):
        cfg = self.cfg
        S, F = self.S, self.max_frames
        dt = jnp.float32

        def batch(tree):
            return jax.tree.map(lambda x: jnp.stack([x] * S), tree)

        intr0 = jnp.asarray(self.calib.intrinsics[0], dt)
        intr1 = jnp.asarray(self.calib.intrinsics[1], dt)
        T_i_c0 = jnp.asarray(self.calib.T_i_c[0], dt)
        T_i_c1 = jnp.asarray(self.calib.T_i_c[1], dt)
        state = MultiSeqState(
            kf=batch(state_mod.init_keyframes(cfg.max_keyframes,
                                              cfg.num_features)),
            lm=batch(state_mod.init_landmarks(cfg.max_landmarks,
                                              B=cfg.lm_desc_bank)),
            pose=jnp.tile(lie.identity_pose(dt), (S, 1)),
            last_pose=jnp.tile(lie.identity_pose(dt), (S, 1)),
            vel=jnp.tile(lie.identity_pose(dt), (S, 1)),
            take_kf=jnp.ones((S,), bool),
            last_kf_slot=jnp.full((S,), -1, jnp.int32),
            ba_pending=jnp.zeros((S,), bool),
            ba_cursor=jnp.asarray(0, jnp.int32),
            kf_cursor=jnp.asarray(0, jnp.int32),
            frame=jnp.asarray(0, jnp.int32),
            key=jax.random.PRNGKey(cfg.seed),
            intr0=intr0, intr1=intr1,
            T_0_1=lie.se3_mul(lie.se3_inv(T_i_c0), T_i_c1),
            traj=jnp.zeros((S, F, 7), dt),
            log_inliers=jnp.zeros((S, F), jnp.int32),
            log_kf=jnp.zeros((S, F), bool),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.mesh

            def place(x):
                if x.ndim >= 1 and x.shape[0] == S:
                    return jax.device_put(x, NamedSharding(
                        mesh, P("data", *([None] * (x.ndim - 1)))))
                return jax.device_put(x, NamedSharding(mesh, P()))

            state = jax.tree.map(place, state)
            self._img_sharding = NamedSharding(mesh, P("data", None, None))
        self.state = state

    # ------------------------------------------------------------------
    def process_frames(self, imgs_l, imgs_r) -> dict:
        """One lockstep frame: imgs_* [S, H, W] uint8. Non-blocking."""
        il = jnp.asarray(np.asarray(imgs_l))
        ir = jnp.asarray(np.asarray(imgs_r))
        if self._img_sharding is not None:
            il = jax.device_put(il, self._img_sharding)
            ir = jax.device_put(ir, self._img_sharding)
        self.state = self._single_step()(self.state, il, ir)
        return {"frame": int(self.state.frame) - 1}

    @staticmethod
    def pack_frames(frames) -> np.ndarray:
        """Pre-pack [(imgs_l [S,H,W], imgs_r [S,H,W])] into one contiguous
        [N, 2, S, H, W] array at load time (zero-copy chunk uploads)."""
        return np.stack([np.stack([l, r]) for l, r in frames])

    def run(self, frames, prefetch: int = 8, sync_every: int = 256) -> int:
        """Process lockstep frames with a device-side prefetch ring.

        ``frames`` is either [(imgs_l [S,H,W], imgs_r [S,H,W])] or the
        pre-packed [N, 2, S, H, W] ndarray from ``pack_frames``. With
        ``chunk > 1`` (packed input required), one dispatch + one upload
        covers ``chunk`` lockstep frames."""
        n = len(frames)
        buf = {}
        sharding = self._img_sharding
        C = self.chunk

        if C > 1:
            if not isinstance(frames, np.ndarray):
                frames = self.pack_frames(frames)
            ngroups = n // C
            P = max(1, prefetch // C)

            def putg(g):
                buf[g] = jax.device_put(frames[g * C:(g + 1) * C])

            for g in range(min(P, ngroups)):
                putg(g)
            for g in range(ngroups):
                batch = buf.pop(g)
                self.state = self._step(self.state, batch)
                if g + P < ngroups:
                    putg(g + P)
                if sync_every and ((g + 1) * C) % sync_every < C:
                    jax.block_until_ready(self.state.frame)
            for i in range(ngroups * C, n):
                pair = jax.device_put(np.ascontiguousarray(frames[i]))
                self.state = self._single_step()(self.state, pair[0],
                                                 pair[1])
            return n

        def put(i):
            il = jnp.asarray(np.asarray(frames[i][0]))
            ir = jnp.asarray(np.asarray(frames[i][1]))
            if sharding is not None:
                il = jax.device_put(il, sharding)
                ir = jax.device_put(ir, sharding)
            buf[i] = (il, ir)

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

    # ------------------- compat / results accessors -------------------
    @property
    def pose(self):
        return self.state.pose

    @property
    def kf(self):
        return self.state.kf

    @property
    def lm(self):
        return self.state.lm

    @property
    def trajectories(self):
        """Per-sequence [F, 7] pose arrays (fetched from the device)."""
        n, traj = jax.device_get((self.state.frame, self.state.traj))
        return [traj[s, :int(n)] for s in range(self.S)]

    def results(self) -> dict:
        n, traj, inl, kfm = jax.device_get(
            (self.state.frame, self.state.traj, self.state.log_inliers,
             self.state.log_kf))
        n = int(n)
        return {"frames": n, "trajectories": traj[:, :n],
                "inliers": inl[:, :n], "is_keyframe": kfm[:, :n]}
