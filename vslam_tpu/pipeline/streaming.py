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
    log_slot: jnp.ndarray = None   # [F] int32 KF slot taken this frame (-1)
    # place recognition (StreamingSLAM only; None in VO mode) — the BoW
    # words and covisibility rows are produced on device inside the
    # keyframe branch so the host can poll them in batches
    voc_desc: jnp.ndarray = None        # [Nn, 256] uint8
    voc_children: jnp.ndarray = None    # [Nn, k] int32
    voc_word_of_node: jnp.ndarray = None  # [Nn] int32
    kf_words: jnp.ndarray = None        # [K, N] int32
    covis: jnp.ndarray = None           # [K, K] int32


def _make_step(cfg: SlamConfig, cam_name: str, width: int, height: int,
               pnp_threshold: float, voc_depth: int = 0):
    """Build the fused per-frame step as a donated jitted function.

    ``voc_depth > 0`` compiles the BoW branch in (tree descent + word /
    covisibility logging for the host's place-recognition poll)."""

    def step(state: StreamState, img_l, img_r) -> StreamState:
        key, k1 = jax.random.split(state.key)

        # constant-velocity prediction for landmark projection (the
        # reference's track_camera projects from current*vel,
        # tracking.h:66-70); on fast rotation the previous pose alone
        # pushes projections outside the 2D match gate
        predicted = lie.se3_mul(state.cur_pose, state.vel)
        res = tracking.track_frame(
            k1, img_l, state.lm, predicted, state.last_pose, state.vel,
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
        # on failure coast on the motion model (tracking.h:72-84; the
        # velocity-decay guard below keeps repeated losses from running away)
        pose = jnp.where(ok, res.T_w_c, predicted)
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
            if voc_depth > 0:
                from ..loop import vocabulary as vocab_mod

                words = vocab_mod._descend(
                    state.voc_desc, state.voc_children,
                    state.voc_word_of_node, res.feats.bits, res.feats.valid,
                    voc_depth)
                kf_words = state.kf_words.at[out.slot].set(words,
                                                           mode="drop")
                covis = state.covis.at[out.slot, :].set(
                    out.covis_weight, mode="drop")
                covis = covis.at[:, jnp.minimum(out.slot, K - 1)].set(
                    jnp.where(out.slot < K, out.covis_weight,
                              covis[:, jnp.minimum(out.slot, K - 1)]))
            else:
                kf_words, covis = state.kf_words, state.covis
            return kf3, lm3, pose_kf, slot, kf_words, covis

        def tr_branch(op):
            kf, lm = op
            return (kf, lm, pose, state.last_kf_slot, state.kf_words,
                    state.covis)

        kf2, lm2, pose2, last_slot, kf_words, covis = lax.cond(
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
            log_slot=state.log_slot.at[f].set(
                jnp.where(state.take_kf, last_slot, -1), mode="drop"),
            kf_words=kf_words,
            covis=covis,
        )

    return jax.jit(step, donate_argnums=(0,))


class StreamingVO:
    """High-throughput stereo VO runner (see module docstring)."""

    def __init__(self, calib: Calibration,
                 config: Optional[SlamConfig] = None,
                 max_frames: int = 8192,
                 vocabulary=None):
        import math

        self.cfg = cfg = config or SlamConfig()
        self.calib = calib
        self.cam_name = calib.cam_types[0]
        self.max_frames = max_frames
        self.voc = vocabulary
        pnp_threshold = 1.0 - math.cos(
            math.atan(cfg.pnp_inlier_thresh_px / 500.0))
        self.pnp_threshold = pnp_threshold
        self._step = _make_step(
            cfg, self.cam_name, calib.width, calib.height, pnp_threshold,
            voc_depth=vocabulary.depth if vocabulary is not None else 0)
        self.reset()

    def reset(self):
        cfg = self.cfg
        dt = jnp.float32
        intr0 = jnp.asarray(self.calib.intrinsics[0], dt)
        intr1 = jnp.asarray(self.calib.intrinsics[1], dt)
        T_i_c0 = jnp.asarray(self.calib.T_i_c[0], dt)
        T_i_c1 = jnp.asarray(self.calib.T_i_c[1], dt)
        F = self.max_frames
        if self.voc is not None:
            K = cfg.max_keyframes
            bow_fields = dict(
                voc_desc=jnp.asarray(self.voc.node_desc),
                voc_children=jnp.asarray(self.voc.children),
                voc_word_of_node=jnp.asarray(self.voc.word_of_node),
                kf_words=jnp.full((K, cfg.num_features), -1, jnp.int32),
                covis=jnp.zeros((K, K), jnp.int32),
            )
        else:
            bow_fields = {}
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
            log_slot=jnp.full((F,), -1, jnp.int32),
            **bow_fields,
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


class StreamingSLAM(StreamingVO):
    """Streaming full SLAM: the sync-free VO stream + lagged host-side
    place recognition and loop closure.

    The stream runs exactly like StreamingVO (no per-frame syncs); every
    ``poll_every`` frames the host pays ONE polling quantum to fetch the
    keyframe event log, and for each new keyframe reads its device-computed
    BoW words + covisibility row, updates the inverted-file database, and
    runs the loop detector (loop_closure_utils.h:141-388 semantics). When a
    consistent candidate passes compute_sim3 + geometric verification, the
    stream is paused (one sync), the essential-graph closure is applied to
    the live state, and streaming resumes. Because ``fixed_current_kf``
    holds the current keyframe fixed, the correction moves the OLD map into
    the stream's gauge — in-flight tracking stays consistent.

    The closure lands up to ``poll_every`` frames after the keyframe that
    triggered it; the reference has the same character (its loop closure +
    global BA run on background threads and merge later,
    slam.cpp:1410-1447). Relocalization is not part of the streaming
    driver — use SlamSystem when tracking-loss recovery is required.

    A pretrained vocabulary is required (the reference equally loads
    ORBvoc.txt before processing, slam.cpp:370-380).
    """

    def __init__(self, calib: Calibration, config: Optional[SlamConfig],
                 vocabulary, max_frames: int = 8192, poll_every: int = 16):
        if vocabulary is None:
            raise ValueError("StreamingSLAM requires a pretrained "
                             "vocabulary (loop.vocabulary.train or "
                             "load_dbow2_text)")
        super().__init__(calib, config, max_frames, vocabulary=vocabulary)
        from ..loop.detector import LoopDetector

        self.poll_every = poll_every
        self.detector = LoopDetector(self.cfg.num_consistency)
        self.covis_host: dict = {}
        self.frame_of_slot: dict = {}
        self.loop_edges: list = []
        self._polled_to = 0
        self._last_closure_frame = -(10 ** 9)
        self._host_key = jax.random.PRNGKey(self.cfg.seed + 1)

    def _next_key(self):
        self._host_key, k = jax.random.split(self._host_key)
        return k

    def run(self, frames, prefetch: int = 24, sync_every: int = 0,
            chunk: int = 0):
        del sync_every, chunk  # polling provides the queue bound
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
            if (i + 1) % self.poll_every == 0:
                self.poll()
        self.poll()
        return n

    # ------------------------------------------------------------------
    def poll(self):
        """Process keyframe events logged since the last poll."""
        n, kf_log, slot_log = jax.device_get(
            (self.state.frame, self.state.log_kf, self.state.log_slot))
        n = int(n)
        events = [(f, int(slot_log[f])) for f in range(self._polled_to, n)
                  if kf_log[f] and slot_log[f] >= 0]
        self._polled_to = n
        for frame_idx, slot in events:
            if slot in self.frame_of_slot:
                # keyframe-capacity overflow logs the stale last slot;
                # re-handling would duplicate inverted-file entries
                continue
            self._handle_keyframe(frame_idx, slot)

    def _graph_sets(self):
        return {s: set(d) for s, d in self.covis_host.items()}

    def _handle_keyframe(self, frame_idx: int, slot: int):
        from ..loop import closure as closure_mod
        from ..loop import vocabulary as vocab_mod

        cfg = self.cfg
        self.frame_of_slot[slot] = frame_idx
        words, covis_row = jax.device_get(
            (self.state.kf_words[slot], self.state.covis[slot]))
        edges = {int(s): int(covis_row[s])
                 for s in np.nonzero(covis_row >= cfg.num_cov_threshold)[0]
                 if s != slot}
        self.covis_host[slot] = edges
        for s, w in edges.items():
            self.covis_host.setdefault(s, {})[slot] = w

        bow = vocab_mod.bow_from_words(self.voc, words)
        if not bow:
            return
        candidates = self.detector.detect(
            slot, bow, edges, self._graph_sets(), 2 * cfg.num_cov_threshold,
            essential_threshold=cfg.num_ess_threshold)
        if self.loop_edges and frame_idx - self._last_closure_frame \
                < cfg.loop_cooldown_frames:
            return  # cooldown: the same revisit keeps re-detecting
        for cand in candidates:
            gap = frame_idx - self.frame_of_slot.get(cand, frame_idx)
            if gap <= cfg.loop_closing_time_threshold:
                continue
            ok, sim3 = closure_mod.compute_sim3(
                self.state.kf, self.state.lm, slot, cand,
                sorted(self.covis_host.get(cand, {})), self.state.intr0,
                self.cam_name, self.pnp_threshold, self._next_key(),
                num_hypotheses=cfg.ransac_hypotheses)
            if not ok:
                continue
            if cfg.enable_loop_verification:
                nbrs = sorted(self.covis_host.get(cand, {}))
                n_inl, n_vis = closure_mod.verify_loop(
                    self.state.kf, self.state.lm, slot, cand, nbrs, sim3,
                    self.state.intr0, self.cam_name,
                    self.calib.width, self.calib.height,
                    px_gate=cfg.loop_verify_px,
                    threshold=cfg.match_max_dist,
                    ratio=cfg.match_next_best)
                if (n_inl < cfg.loop_verify_min_inliers
                        or n_inl < cfg.loop_verify_min_ratio
                        * max(n_vis, 1)):
                    continue
                if cfg.loop_verify_min_gain > 0:
                    # identity-gain gate (see config): reject corrections
                    # that do not beat the current poses at explaining the
                    # candidate-side structure
                    sim3_id = lie.se3_mul(
                        lie.se3_inv(self.state.kf.pose_l[cand]),
                        self.state.kf.pose_l[slot])
                    n_id, _ = closure_mod.verify_loop(
                        self.state.kf, self.state.lm, slot, cand, nbrs,
                        sim3_id, self.state.intr0, self.cam_name,
                        self.calib.width, self.calib.height,
                        px_gate=cfg.loop_verify_px,
                        threshold=cfg.match_max_dist,
                        ratio=cfg.match_next_best)
                    if n_inl < cfg.loop_verify_min_gain * max(n_id, 1):
                        continue
            if not cfg.use_sim3:
                sim3 = lie.identity_pose()
            # late application: the stream has tracked past `slot` by up to
            # poll_every frames — hold the live gauge (slot + every newer
            # keyframe) fixed and let the pose graph drag the OLD map over
            newer = [s for s, f in self.frame_of_slot.items()
                     if f >= self.frame_of_slot[slot]]
            kf2, lm2, _ = closure_mod.loop_closure(
                self.state.kf, self.state.lm, slot, cand, sim3,
                self.covis_host, self.state.T_0_1,
                essential_threshold=cfg.num_ess_threshold,
                fixed_current=True, align_current=False,
                extra_fixed=newer,
                huber=1.0, max_iters=20)
            self.state = self.state._replace(kf=kf2, lm=lm2)
            self.loop_edges.append((slot, cand))
            self._last_closure_frame = frame_idx
            if cfg.enable_gba_after_loop:
                from . import ba_global

                kf3, lm3, _ = ba_global.run_global_ba(
                    self.state.kf, self.state.lm, self.state.intr0,
                    self.state.intr1, cam_name=self.cam_name,
                    huber=cfg.ba_huber_px)
                self.state = self.state._replace(kf=kf3, lm=lm3)
