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
    # window-BA observations dropped at the O cap this keyframe (0 on
    # tracking frames): silent truncation must be visible evidence — the
    # reference never drops in-window obs (map_utils.h:369-395)
    log_wdrop: jnp.ndarray = None  # [F] int32
    # place recognition (StreamingSLAM only; None in VO mode) — the BoW
    # words and covisibility rows are produced on device inside the
    # keyframe branch and written into a keyframe EVENT RING so the host
    # poll consumes everything (loss log + all new keyframes' words +
    # covis rows) in ONE blocking fetch: through the tunnel every
    # separate d2h costs a completion-polling quantum (~27.5 ms), so the
    # previous two-fetch poll (log scan, then per-new-slot gather) paid
    # double at realistic keyframe rates
    voc_desc: jnp.ndarray = None        # [Nn, 256] uint8
    voc_children: jnp.ndarray = None    # [Nn, k] int32
    voc_word_of_node: jnp.ndarray = None  # [Nn] int32
    ev_count: jnp.ndarray = None        # [] int32 keyframe events so far
    ev_frame: jnp.ndarray = None        # [E] int32 frame of event
    ev_slot: jnp.ndarray = None         # [E] int32 KF slot of event
    ev_words: jnp.ndarray = None        # [E, N] int32 BoW words
    ev_covis: jnp.ndarray = None        # [E, K] int32 covis row at insert
    # current-frame features (streaming relocalization only): the newest
    # frame's descriptors/corners stay resident on device so a loss poll
    # can recover without re-running the frontend (tracking.h:258-261
    # recomputes them from a fresh imread instead)
    cur_bits: jnp.ndarray = None        # [N, 256] uint8
    cur_corners: jnp.ndarray = None     # [N, 2] float32
    cur_valid: jnp.ndarray = None       # [N] bool
    # live-tunable gate scalars (config.DEVICE_TUNABLE order): traced
    # values, so set_param() changes them mid-run with zero recompiles —
    # the reference's pangolin::Var sliders (slam.cpp:223-310)
    tune: jnp.ndarray = None            # [len(DEVICE_TUNABLE)] float32
    # consecutive lost-frame count, carried on device: drives the
    # sustained-loss re-bootstrap (cfg.lost_rebootstrap_frames)
    lost_run: jnp.ndarray = None        # [] int32


# keyframe event ring capacity: the poll must run at least once per
# EV_CAP keyframes (poll_every frames can yield at most poll_every
# keyframes, and poll_every <= EV_CAP is asserted by StreamingSLAM)
EV_CAP = 64


def _pack_poll_blob(st: StreamState) -> jnp.ndarray:
    """Pack everything the host poll consumes into ONE int32 blob.

    Through the tunnel every separate d2h transfer pays a completion-
    polling quantum (~27.5 ms), so the poll fetches one buffer. Layout
    must match StreamingSLAM._poll_splits."""
    return jnp.concatenate([
        jnp.stack([st.frame, st.ev_count]),
        st.log_ok.astype(jnp.int32),
        st.ev_frame, st.ev_slot,
        st.ev_words.reshape(-1), st.ev_covis.reshape(-1)])


def _make_step(cfg: SlamConfig, cam_name: str, width: int, height: int,
               voc_depth: int = 0, store_features: bool = False,
               chunk: int = 1, emit_poll: bool = False, feature_fn=None):
    """Build the fused per-frame step as a donated jitted function.

    ``voc_depth > 0`` compiles the BoW branch in (tree descent + word /
    covisibility logging for the host's place-recognition poll);
    ``store_features`` keeps the newest frame's features in the state for
    the relocalization poll.

    The step takes the stereo pair as ONE packed [2, H, W] array: the
    tunnel serializes h2d transfers with executions in its queue, so one
    upload per frame (instead of two) measurably raises throughput; the
    L/R split is a free slice inside the program.

    ``chunk > 1`` returns a frame-batched variant that lax.scans the step
    over a [chunk, 2, H, W] stack — ONE dispatch and ONE h2d per ``chunk``
    frames. Through the tunnel each enqueued op carries fixed relay/host
    overhead that r4 profiling measured at roughly half the per-frame wall
    budget (device compute ~13-15 ms/frame vs 24-58 ms/frame wall), so
    batching dispatches is the single biggest streaming-throughput lever.
    The keyframe ``lax.cond`` stays a true branch inside the scan body (no
    vmap, so no both-branches execution)."""

    def step(state: StreamState, imgs) -> StreamState:
        img_l, img_r = imgs[0], imgs[1]
        key, k1 = jax.random.split(state.key)

        from ..config import TUNE_INDEX

        def P(name):
            """Live-tunable gate scalar (device state, not a constant)."""
            return state.tune[TUNE_INDEX[name]]

        # RANSAC gate (vo_utils.h:211-212). The tune vector carries the
        # DERIVED 1-cos(atan(px/500)) threshold, pre-computed in f64 on the
        # host (config.DEVICE_TUNE_TRANSFORM) — deriving it here in f32
        # cancels catastrophically and shifts the inlier gate ~0.3%.
        pnp_thresh = P("pnp_inlier_thresh_px")

        # constant-velocity prediction for landmark projection (the
        # reference's track_camera projects from current*vel,
        # tracking.h:66-70); on fast rotation the previous pose alone
        # pushes projections outside the 2D match gate
        predicted = lie.se3_mul(state.cur_pose, state.vel)
        res = tracking.track_frame(
            k1, img_l, state.lm, predicted, state.last_pose, state.vel,
            state.intr0,
            # learned-frontend hook: feature_fn closes over the model
            # params (baked into the compiled step as constants — the
            # weights are fixed at inference)
            feats=feature_fn(img_l) if feature_fn is not None else None,
            cam_name=cam_name, num_features=cfg.num_features,
            inview_cap=cfg.max_inview_landmarks,
            width=width, height=height,
            z_threshold=P("cam_z_threshold"),
            match_max_dist_2d=P("match_max_dist_2d"),
            match_threshold=P("match_max_dist"),
            match_ratio=P("match_next_best"),
            pnp_threshold=pnp_thresh,
            num_hypotheses=cfg.ransac_hypotheses,
            min_matches=P("ransac_min_matches"),
            quality_level=P("quality_level"),
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
            if feature_fn is not None:
                feats_r = feature_fn(img_r)
            else:
                feats_r = extract_features(
                    img_r, num_features=cfg.num_features,
                    quality_level=P("quality_level"),
                    min_distance=cfg.min_distance,
                    rotate_features=cfg.rotate_features,
                    num_octaves=cfg.num_octaves)
            stereo_j, stereo_inl = kf_mod.stereo_match(
                res.feats, feats_r, state.T_0_1, state.intr0, state.intr1,
                cam_name=cam_name, threshold=P("match_max_dist"),
                ratio=P("match_next_best"),
                epipolar_threshold=P("epipolar_error_threshold"))
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
            # background-thread merge. (The flat solver wins at window
            # size; the blocked MXU solver takes over for global BA —
            # see solvers/ba_blocked.py and pipeline/ba_global.py.)
            wp = ba_window.build_window_problem(
                kf2, lm2, state.intr0, state.intr1,
                W2=cfg.window_cams // 2, Lw=cfg.window_points,
                O=cfg.window_obs, obs_per_lm=cfg.ba_obs_per_lm)
            poses, points, _ = ba.solve_ba_schur(
                wp.prob, cam_name=cam_name, huber=P("ba_huber_px"),
                max_iters=cfg.ba_max_iters)
            kf3, lm3 = ba_window.merge_window_result(kf2, lm2, wp, poses,
                                                     points)
            wdrop = wp.obs_dropped
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
                # append to the keyframe event ring (capacity-overflow
                # inserts are dropped: their slot would be stale)
                e = jnp.where(in_cap, state.ev_count % EV_CAP, EV_CAP)
                ev = (state.ev_count + in_cap.astype(jnp.int32),
                      state.ev_frame.at[e].set(state.frame, mode="drop"),
                      state.ev_slot.at[e].set(slot, mode="drop"),
                      state.ev_words.at[e].set(words, mode="drop"),
                      state.ev_covis.at[e].set(out.covis_weight,
                                               mode="drop"))
            else:
                ev = (state.ev_count, state.ev_frame, state.ev_slot,
                      state.ev_words, state.ev_covis)
            return kf3, lm3, pose_kf, slot, ev, wdrop

        def tr_branch(op):
            kf, lm = op
            return (kf, lm, pose, state.last_kf_slot,
                    (state.ev_count, state.ev_frame, state.ev_slot,
                     state.ev_words, state.ev_covis),
                    jnp.asarray(0, jnp.int32))

        # in relocalization mode a lost frame must NOT become a keyframe
        # (while relocalization still has a shot at a clean recovery): it
        # would enter the map (and the recognition database) at the
        # coasted garbage pose, and the reloc search would then "recover"
        # to it by matching the frame against itself. The reference never
        # hits this because its reloc runs in-frame before the KF decision
        # is consumed (slam.cpp:1348-1377).
        # (bootstrap exception: with an empty map tracking cannot succeed,
        # so the first keyframe inserts unconditionally)
        # (sustained-loss exception: after lost_rebootstrap_frames
        # consecutive losses — i.e. relocalization had its poll-latency
        # window and failed — a frame with enough features re-bootstraps
        # mapping at the coasted pose, the reference's own behavior
        # (slam.cpp:1374-1377 keyframes lost frames unconditionally). The
        # map extends in a drifted gauge; the revisit keyframes are NOT
        # covisible with the old map, so loop detection treats them as a
        # genuine loop and the closure merges the gauges — drift-then-
        # close, the identity behind the reference's MH04/MH05 numbers.)
        bootstrap = state.kf.next_slot == 0
        if store_features or cfg.kf_require_tracked:
            reb = P("lost_rebootstrap_frames")
            rebootstrap = ((reb > 0)
                           & (state.lost_run.astype(jnp.float32) >= reb)
                           & (jnp.sum(res.feats.valid).astype(jnp.float32)
                              >= P("reloc_min_features")))
            do_kf = state.take_kf & (ok | bootstrap | rebootstrap)
        else:
            do_kf = state.take_kf
        kf2, lm2, pose2, last_slot, ev, wdrop = lax.cond(
            do_kf, kf_branch, tr_branch, (state.kf, state.lm))

        # advance (slam.cpp:1299-1301,1453-1455) + velocity-decay guard
        vel = lie.se3_mul(lie.se3_inv(state.last_pose), pose2)
        n_inl = jnp.where(ok, res.num_inliers, 0)
        if cfg.enable_vel_decay:
            weak = ~ok | (n_inl < P("vel_decay_inlier_floor"))
            vel = jnp.where(
                weak,
                lie.se3_exp(P("vel_decay_factor") * lie.se3_log(vel)),
                vel)

        # next-frame keyframe decision, carried on device: a keyframe step
        # resets it (the reference's take_keyframe=false), a tracking step
        # re-arms it on low inliers (slam.cpp:1374-1377). A request blocked
        # by the lost-frame gate above stays armed until a good frame
        # consumes it.
        take_next = ~do_kf & (state.take_kf
                              | (n_inl < P("new_kf_min_inliers")))

        feat_fields = {}
        if store_features:
            feat_fields = dict(cur_bits=res.feats.bits,
                               cur_corners=res.feats.corners,
                               cur_valid=res.feats.valid)

        f = state.frame
        return state._replace(
            **feat_fields,
            kf=kf2, lm=lm2,
            cur_pose=pose2, last_pose=pose2, vel=vel,
            # a keyframe insert restarts the loss count too: a re-bootstrap
            # gives tracking a fresh local map to re-acquire against
            lost_run=jnp.where(ok | do_kf, 0,
                               state.lost_run + 1).astype(jnp.int32),
            take_kf=take_next,
            last_kf_slot=last_slot,
            frame=f + 1,
            key=key,
            traj=state.traj.at[f].set(pose2, mode="drop"),
            log_inliers=state.log_inliers.at[f].set(n_inl, mode="drop"),
            log_kf=state.log_kf.at[f].set(do_kf, mode="drop"),
            log_ok=state.log_ok.at[f].set(ok, mode="drop"),
            log_slot=state.log_slot.at[f].set(
                jnp.where(do_kf, last_slot, -1), mode="drop"),
            log_wdrop=state.log_wdrop.at[f].set(wdrop, mode="drop"),
            ev_count=ev[0], ev_frame=ev[1], ev_slot=ev[2],
            ev_words=ev[3], ev_covis=ev[4],
        )

    if chunk == 1:
        return jax.jit(step, donate_argnums=(0,))

    def chunk_step(state: StreamState, imgs):
        st = lax.scan(lambda s, im: (step(s, im), None), state, imgs)[0]
        if not emit_poll:
            return st
        # fold the poll payload into the chunked step's own outputs: the
        # host consumes it LAGGED (one poll period later, via
        # copy_to_host_async), so the steady-state poll pays neither a
        # separate pack dispatch nor a blocking drain of the dispatch
        # queue — r4's biggest residual wall cost at poll_every=32
        return st, _pack_poll_blob(st)

    return jax.jit(chunk_step, donate_argnums=(0,))


class StreamingVO:
    """High-throughput stereo VO runner (see module docstring)."""

    def __init__(self, calib: Calibration,
                 config: Optional[SlamConfig] = None,
                 max_frames: int = 8192,
                 vocabulary=None,
                 store_features: bool = False,
                 chunk: int = 1,
                 feature_fn=None):
        import math

        self.cfg = cfg = config or SlamConfig()
        self.calib = calib
        self.cam_name = calib.cam_types[0]
        self.max_frames = max_frames
        self.voc = vocabulary
        self.store_features = store_features
        self.chunk = max(1, int(chunk))
        # optional learned frontend: (img [H,W] uint8) -> Features with
        # cfg.num_features slots, traced into the fused step (see
        # models/learned_frontend.make_feature_fn)
        self.feature_fn = feature_fn
        self.pnp_threshold = 1.0 - math.cos(
            math.atan(cfg.pnp_inlier_thresh_px / 500.0))
        self._step = _make_step(
            cfg, self.cam_name, calib.width, calib.height,
            voc_depth=vocabulary.depth if vocabulary is not None else 0,
            store_features=store_features, chunk=self.chunk,
            feature_fn=feature_fn)
        # per-frame variant for process_frame() and run() tails, compiled
        # lazily (chunk == 1 shares the main program)
        self._step1 = self._step if self.chunk == 1 else None
        self.reset()

    def _single_step(self):
        if self._step1 is None:
            self._step1 = _make_step(
                self.cfg, self.cam_name, self.calib.width,
                self.calib.height,
                voc_depth=self.voc.depth if self.voc is not None else 0,
                store_features=self.store_features, chunk=1,
                feature_fn=self.feature_fn)
        return self._step1

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
                ev_count=jnp.asarray(0, jnp.int32),
                ev_frame=jnp.full((EV_CAP,), -1, jnp.int32),
                ev_slot=jnp.full((EV_CAP,), -1, jnp.int32),
                ev_words=jnp.full((EV_CAP, cfg.num_features), -1, jnp.int32),
                ev_covis=jnp.zeros((EV_CAP, K), jnp.int32),
            )
        else:
            bow_fields = {}
        if self.store_features:
            N = cfg.num_features
            bow_fields.update(
                cur_bits=jnp.zeros((N, 256), jnp.uint8),
                cur_corners=jnp.full((N, 2), -1.0, dt),
                cur_valid=jnp.zeros((N,), bool))
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
            log_wdrop=jnp.zeros((F,), jnp.int32),
            tune=jnp.asarray(cfg.tune_vector(), dt),
            lost_run=jnp.asarray(0, jnp.int32),
            **bow_fields,
        )
        self._tune = np.asarray(cfg.tune_vector(), np.float32)

    def set_param(self, name: str, value) -> None:
        """Change a runtime parameter mid-run (pangolin::Var analogue).

        DEVICE_TUNABLE names update the tune vector carried in device
        state — the already-compiled stream consumes the new value from
        the next frame on, with zero recompilation. HOST_TUNABLE names
        mutate the config object, which the host-side orchestration
        (keyframe poll, loop closure, relocalization) reads per call.
        Anything else determines compiled buffer shapes and raises.

        Caveat: a handful of HOST_TUNABLE values that the fused streaming
        step also bakes in at build time (lm_cull_min_obs,
        lm_cull_pressure, suppress_duplicate_landmarks, ba_max_iters)
        only affect the host-driven paths here; the faithful SlamSystem
        honors them everywhere.
        """
        from ..config import (DEVICE_TUNABLE, DEVICE_TUNE_TRANSFORM,
                              HOST_TUNABLE, TUNE_INDEX)

        if name in TUNE_INDEX:
            xf = DEVICE_TUNE_TRANSFORM.get(name, lambda v: v)
            self._tune[TUNE_INDEX[name]] = xf(float(value))
            setattr(self.cfg, name, value)  # host-side readers see it too
            if name == "pnp_inlier_thresh_px":
                self.pnp_threshold = xf(float(value))
            self.state = self.state._replace(
                tune=jnp.asarray(self._tune))
        elif name in HOST_TUNABLE:
            setattr(self.cfg, name, value)
        else:
            raise ValueError(
                f"{name!r} is not live-tunable (it sets compiled buffer "
                f"shapes); rebuild the driver with a new SlamConfig. "
                f"Tunable: {sorted(TUNE_INDEX) + sorted(HOST_TUNABLE)}")

    @staticmethod
    def _pack(img_l, img_r):
        """Stack a stereo pair into the step's [2, H, W] upload layout.

        Host-side numpy stays on host (np.stack + one device_put);
        device-resident inputs stack on device (no d2h round trip).
        """
        if isinstance(img_l, np.ndarray) and isinstance(img_r, np.ndarray):
            return np.stack([img_l, img_r])
        return jnp.stack([jnp.asarray(img_l), jnp.asarray(img_r)])

    def process_frame(self, img_l, img_r):
        """Enqueue one frame. Non-blocking: no host sync happens here."""
        self.state = self._single_step()(self.state,
                                         jnp.asarray(self._pack(img_l,
                                                                img_r)))

    def _pack_chunk(self, frame_slice):
        """One [C, 2, H, W] upload for ``chunk`` stereo pairs.

        A pre-packed contiguous ndarray slice (see ``run``) uploads
        zero-copy; a list of pairs is stacked first — measured ~10x
        slower end-to-end on this 1-vCPU host, where the per-chunk
        np.stack serializes with dispatch (device_put of contiguous
        buffers sustains 350-580 MiB/s through the tunnel; the stacked
        path observed ~30 MiB/s effective)."""
        if isinstance(frame_slice, np.ndarray):
            return jax.device_put(frame_slice)
        arrs = [self._pack(a, b) for a, b in frame_slice]
        if all(isinstance(x, np.ndarray) for x in arrs):
            return jax.device_put(np.stack(arrs))
        return jnp.stack([jnp.asarray(x) for x in arrs])

    @staticmethod
    def pack_frames(frames) -> np.ndarray:
        """Pre-pack [(img_l, img_r)] into one contiguous [N, 2, H, W]
        uint8 array (do this at load time, off the streaming hot path —
        the analogue of the dataset Prefetcher's decode threads)."""
        return np.stack([np.stack([l, r]) for l, r in frames])

    def _uploader_pool(self):
        """Threaded device-put prefetcher.

        The h2d commit of a 752x480 pair costs ~4 ms of *host* time through
        the tunnel (the copy into the transfer buffer is synchronous), which
        sat on the dispatch thread's critical path — ~20% of the per-frame
        budget. Two uploader threads move it off; jax.device_put is
        thread-safe and the futures preserve the consumption order.
        """
        import concurrent.futures as cf

        if getattr(self, "_uploaders", None) is None:
            self._uploaders = cf.ThreadPoolExecutor(max_workers=2)
        return self._uploaders

    def run(self, frames, prefetch: int = 24, sync_every: int = 256,
            chunk: int = 0):
        """Process [(img_l, img_r)] pairs with a device-side prefetch ring.

        Images are committed individually ``prefetch`` frames ahead by the
        uploader threads (slicing one batched upload inside the stream
        serializes the pipeline — the slice executions interleave with the
        steps and cost ~2x throughput; scanning frames on device runs the
        keyframe lax.cond as BOTH branches per frame, ~7x). ``sync_every``
        occasionally blocks on the frame counter so the enqueue queue can't
        run unboundedly ahead of the device.
        """
        del chunk  # driver-level batching is set via __init__(chunk=...)
        n = len(frames)
        C = self.chunk
        pool = self._uploader_pool()
        futs = {}

        if C > 1:
            ngroups = n // C
            P = max(1, prefetch // C)

            def putg(g):
                futs[g] = pool.submit(self._pack_chunk,
                                      frames[g * C:(g + 1) * C])

            for g in range(min(P, ngroups)):
                putg(g)
            for g in range(ngroups):
                batch = futs.pop(g).result()
                self.state = self._step(self.state, batch)
                if g + P < ngroups:
                    putg(g + P)
                if sync_every and ((g + 1) * C) % sync_every < C:
                    jax.block_until_ready(self.state.frame)
            for i in range(ngroups * C, n):  # tail: per-frame program
                self.state = self._single_step()(
                    self.state, jax.device_put(np.ascontiguousarray(
                        frames[i]) if isinstance(frames, np.ndarray)
                        else self._pack(*frames[i])))
            return n

        def put(i):
            if isinstance(frames, np.ndarray):
                futs[i] = pool.submit(jax.device_put, frames[i])
            else:
                futs[i] = pool.submit(
                    lambda a, b: jax.device_put(self._pack(a, b)),
                    frames[i][0], frames[i][1])

        for i in range(min(prefetch, n)):
            put(i)
        for i in range(n):
            pair = futs.pop(i).result()
            self.state = self._step(self.state, pair)
            j = i + prefetch
            if j < n:
                put(j)
            if sync_every and (i + 1) % sync_every == 0:
                jax.block_until_ready(self.state.frame)
        return n

    def results(self) -> dict:
        """One blocking fetch of every per-frame log + final pose."""
        n, traj, inl, kfm, okm, wdrop = jax.device_get(
            (self.state.frame, self.state.traj, self.state.log_inliers,
             self.state.log_kf, self.state.log_ok, self.state.log_wdrop))
        n = int(n)
        return {
            "frames": n,
            "trajectory": traj[:n],
            "inliers": inl[:n],
            "is_keyframe": kfm[:n],
            "tracked_ok": okm[:n],
            "window_obs_dropped": wdrop[:n],
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
    slam.cpp:1410-1447).

    Relocalization (``cfg.enable_relocalization``) uses the same pattern:
    the newest frame's features stay resident in device state, the poll
    watches the ``log_ok`` ring for a run of lost frames, and on sustained
    loss the host pays one sync to run the BoW + PnP recovery
    (tracking.h:241-419 semantics, loop/relocalize.py) against the live
    map and patch the tracker pose. Recovery lands up to ``poll_every``
    frames after re-sighting a mapped view; in between the stream coasts
    on the decaying motion model.

    A pretrained vocabulary is required (the reference equally loads
    ORBvoc.txt before processing, slam.cpp:370-380).
    """

    def __init__(self, calib: Calibration, config: Optional[SlamConfig],
                 vocabulary, max_frames: int = 8192, poll_every: int = 16,
                 chunk: int = 1, feature_fn=None):
        if vocabulary is None:
            raise ValueError("StreamingSLAM requires a pretrained "
                             "vocabulary (loop.vocabulary.train or "
                             "load_dbow2_text)")
        cfg = config or SlamConfig()
        super().__init__(calib, cfg, max_frames, vocabulary=vocabulary,
                         store_features=cfg.enable_relocalization,
                         chunk=chunk, feature_fn=feature_fn)
        from ..loop.detector import LoopDetector

        import collections

        # lagged consumption adds up to one chunk boundary of extra age
        # to the newest-unconsumed window
        if poll_every + max(1, chunk) > EV_CAP:
            raise ValueError(f"poll_every={poll_every} (+chunk={chunk} "
                             f"lag) can outrun the keyframe event ring "
                             f"(EV_CAP={EV_CAP})")
        if self.chunk > 1 and poll_every % self.chunk:
            raise ValueError(f"poll_every={poll_every} must be a multiple "
                             f"of chunk={self.chunk} (polls land on chunk "
                             "boundaries)")
        self.poll_every = poll_every
        self.detector = LoopDetector(self.cfg.num_consistency)
        self.covis_host: dict = {}
        self.frame_of_slot: dict = {}
        self.loop_edges: list = []
        self.rejected_loops: list = []  # (slot, cand, n_inl, n_vis)
        self.closure_stats: list = []  # per-closure sub-stage wall times
        self.reloc_events: list = []   # (frame_polled, ok)
        self.reloc_diags: list = []    # per-attempt diag dicts (why it
        # succeeded/failed: candidates, best PnP inliers, best gate err)
        self._reloc_failures = 0       # consecutive failed attempts
        self._reloc_next_attempt = 0   # backoff: no attempt before this frame
        # wall-clock seconds per closure stage (observability: the
        # reference's equivalent is Ceres BriefReport lines scrolling by)
        self.loop_timings = collections.Counter()
        # why candidates did / didn't close, per gate (observability for
        # threshold tuning; the reference's equivalent is watching the
        # cout banners scroll by)
        self.loop_stats = collections.Counter()
        self._polled_to = 0
        self._ev_consumed = 0
        # LOST MODE: deep pipelining (prefetch + lagged polls) gives
        # throughput but ~2*poll_every+prefetch frames of reaction
        # latency — measured fatal for relocalization on rotating scenes
        # (the view leaves the mapped region before the recovery can
        # land, and the sustained-loss re-bootstrap always wins the
        # race). When a fresh poll shows the newest frames lost, the run
        # loop drops to synchronous per-chunk polling (draining the
        # pipeline, latency ~chunk frames) until tracking recovers —
        # the reference pays reloc cost on every lost frame too
        # (slam.cpp:1355-1359); paying throughput only while lost is the
        # streaming analogue.
        self._lost_mode = False
        # adaptive lagged-consume stride, in chunk groups (see _poll_async)
        self._consume_stride = 1
        self._stride_limit = max(1, poll_every // max(1, self.chunk))
        self._group_i = -1
        self._last_closure_frame = -(10 ** 9)
        self._pending_gba = None
        self.gba_merges = 0
        self._host_key = jax.random.PRNGKey(self.cfg.seed + 1)
        # the poll's d2h is ONE packed int32 buffer: device_get of a pytree
        # transfers each leaf separately, and through the tunnel EVERY
        # transfer pays a completion-polling quantum (~27.5 ms) — seven
        # leaves made the poll cost ~0.2 s of pure quantum overhead before
        # any device work drained (r4 measurement; the r3 "one blocking
        # fetch" comment was wrong about pytree fetches being one transfer)
        F, E = self.max_frames, EV_CAP
        N, K = self.cfg.num_features, self.cfg.max_keyframes
        self._poll_splits = np.cumsum(
            [2, F, E, E, E * N])  # then ev_covis [E*K]
        self._pack_poll = jax.jit(_pack_poll_blob)
        # lagged poll (chunked dispatch only): the chunk step emits the
        # poll blob as an output; the host starts an async d2h and consumes
        # it one poll period later, so steady-state polls neither dispatch
        # extra work nor block on the queue
        self._lagged_blob = None
        if self.chunk > 1:
            self._step = _make_step(
                self.cfg, self.cam_name, calib.width, calib.height,
                voc_depth=vocabulary.depth,
                store_features=cfg.enable_relocalization,
                chunk=self.chunk, emit_poll=True,
                feature_fn=self.feature_fn)

    def _next_key(self):
        self._host_key, k = jax.random.split(self._host_key)
        return k

    def run(self, frames, prefetch: int = 24, sync_every: int = 0,
            chunk: int = 0):
        del sync_every, chunk  # polling provides the queue bound
        n = len(frames)
        C = self.chunk
        pool = self._uploader_pool()
        futs = {}

        if C > 1:
            ngroups = n // C
            P = max(1, prefetch // C)

            def putg(g):
                futs[g] = pool.submit(self._pack_chunk,
                                      frames[g * C:(g + 1) * C])

            for g in range(min(P, ngroups)):
                putg(g)
            for g in range(ngroups):
                batch = futs.pop(g).result()
                self.state, blob = self._step(self.state, batch)
                if g + P < ngroups:
                    putg(g + P)
                self._poll_async(
                    blob, force=((g + 1) * C) % self.poll_every == 0)
                if self._lost_mode:
                    self._sync_poll()
            for i in range(ngroups * C, n):
                self.state = self._single_step()(
                    self.state, jax.device_put(np.ascontiguousarray(
                        frames[i]) if isinstance(frames, np.ndarray)
                        else self._pack(*frames[i])))
            self.poll()
            return n

        def put(i):
            if isinstance(frames, np.ndarray):
                futs[i] = pool.submit(jax.device_put, frames[i])
            else:
                futs[i] = pool.submit(
                    lambda a, b: jax.device_put(self._pack(a, b)),
                    frames[i][0], frames[i][1])

        for i in range(min(prefetch, n)):
            put(i)
        for i in range(n):
            pair = futs.pop(i).result()
            self.state = self._step(self.state, pair)
            j = i + prefetch
            if j < n:
                put(j)
            if (i + 1) % self.poll_every == 0:
                self.poll()
        self.poll()
        return n

    # ------------------------------------------------------------------
    def _poll_async(self, blob, force: bool = False):
        """Lagged poll for the chunked stream: every chunk boundary emits
        the poll blob as an output of the step itself (no extra
        dispatch); the host consumes the PREVIOUS boundary's blob with a
        blocking fetch on an ADAPTIVE stride.

        The block waits for the device to reach that boundary (bounding
        the dispatch queue to ~stride chunks) plus the tunnel's
        completion-polling quantum. On a quiet tunnel the quantum is
        ~0 ms, so consuming EVERY boundary is near-free and loss
        reactions land within ~2 chunks of the event — the latency
        relocalization needs on a rotating scene (r5 measured: an
        attempt 27 frames after the loss finds 1 correspondence where
        the 11-frame-late attempt finds a full inlier set). Under
        congestion each consume can cost 30-70 ms, so the stride backs
        off exponentially up to poll_every — recovery latency degrades
        together with everything else the tunnel does, and the per-run
        quantum probe in the bench records attributes it. A consumed
        blob showing recent loss snaps the stride back to 1.
        """
        try:
            blob.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass  # backends without async copy: np.asarray blocks below
        prev, self._lagged_blob = self._lagged_blob, blob
        self._group_i += 1
        if prev is None:
            return
        if self._lost_mode:
            return  # the caller's synchronous poll supersedes the lagged
            # path (consuming the stale blob here would just double-pay)
        if not force and self._group_i % self._consume_stride:
            return  # not due: newest blob stays stashed (lag-1 freshness)
        import time as _time

        t0 = _time.perf_counter()
        host_blob = np.asarray(prev)
        wait_ms = (_time.perf_counter() - t0) * 1e3
        escalate = self._consume_poll_blob(host_blob, stale=True)
        # adapt: cheap consumes (quiet tunnel / device ahead) -> every
        # boundary; expensive ones back off toward poll_every cadence
        if escalate or self._lost_mode:
            self._consume_stride = 1
        elif wait_ms < 6.0:
            self._consume_stride = 1
        elif wait_ms > 15.0:
            self._consume_stride = min(self._consume_stride * 2,
                                       self._stride_limit)
        if escalate:
            self._sync_poll()

    def _poll_flush(self):
        """Consume any stashed lagged blob (end of run / before a forced
        synchronous poll). Returns True if the stale blob asked for a
        fresh synchronous follow-up (sustained loss seen)."""
        prev, self._lagged_blob = self._lagged_blob, None
        return (prev is not None
                and self._consume_poll_blob(np.asarray(prev), stale=True))

    def _sync_poll(self):
        blob = jax.device_get(self._pack_poll(self.state))
        self._consume_poll_blob(blob)

    def poll(self):
        """Process keyframe + loss events logged since the last poll.

        ONE blocking fetch covers everything: the loss log plus the
        keyframe event ring (frame, slot, BoW words, covis row per new
        keyframe). Each separate d2h through the tunnel costs a
        completion-polling quantum (~27.5 ms), so fetch count — not
        bytes — is what the poll must minimize."""
        self._poll_flush()
        self._sync_poll()

    def _consume_poll_blob(self, blob, stale: bool = False):
        import time as _time

        t_poll = _time.perf_counter()
        head, ok_log, ev_frame, ev_slot, ev_words, ev_covis = \
            np.split(blob, self._poll_splits)
        n, ev_count = int(head[0]), int(head[1])
        ok_log = ok_log.astype(bool)
        E = EV_CAP
        ev_words = ev_words.reshape(E, -1)
        ev_covis = ev_covis.reshape(E, -1)
        self.loop_timings["poll_fetch"] += _time.perf_counter() - t_poll
        self._polled_to = n
        # ring overflow can only happen if polls are rarer than EV_CAP
        # keyframes (asserted against in __init__); drop-oldest keeps the
        # detector consistent if it ever does
        start = max(self._ev_consumed, ev_count - EV_CAP)
        for k in range(start, ev_count):
            e = k % EV_CAP
            slot = int(ev_slot[e])
            if slot < 0 or slot in self.frame_of_slot:
                continue
            self._handle_keyframe(int(ev_frame[e]), slot,
                                  ev_words[e], ev_covis[e])
        self._ev_consumed = ev_count
        # sustained-loss detection -> relocalization (slam.cpp:1348-1367
        # runs it per lost frame; here the poll reacts once per quantum).
        # Failed attempts back off exponentially (each costs a multi-sync
        # stall; 12 futile attempts in one r3 bench run); any tracked-ok
        # frame resets the backoff.
        R = self.cfg.reloc_lost_frames
        if not stale and self.cfg.enable_relocalization:
            # fresh info only: enter/exit the low-latency lost mode
            self._lost_mode = bool(
                n > 0 and not ok_log[max(0, n - R):n].any())
        if n > 0 and ok_log[n - 1]:
            self._reloc_failures = 0
            self._reloc_next_attempt = 0
        if (self.cfg.enable_relocalization and self.detector.db.bow_of
                and n >= R and not ok_log[n - R:n].any()
                and n >= self._reloc_next_attempt):
            if stale:
                # lagged blob: the loss evidence is a poll period old and
                # the live features/pose the recovery would use are newer.
                # Ask the caller for one synchronous follow-up poll so the
                # decision re-evaluates on fresh state (tracking may have
                # recovered on its own in the window).
                self._merge_gba_if_ready()
                return True
            oks = np.nonzero(ok_log[:n])[0]
            frames_lost = int(n - 1 - oks[-1]) if len(oks) else n
            self._try_relocalize_stream(n, frames_lost)
        self._merge_gba_if_ready()
        return False

    def _merge_gba_if_ready(self, force: bool = False):
        """Skip-merge a finished async global BA (slam.cpp:1410-1447).

        With cfg.deterministic_async the merge lands at the first poll
        after dispatch (fixed point) instead of whenever the solve
        happens to finish — run-to-run reproducibility over overlap."""
        if self._pending_gba is None:
            return
        if not (force or self.cfg.deterministic_async
                or self._pending_gba.ready()):
            return
        import time as _time

        from . import ba_global

        t0 = _time.perf_counter()
        kf2, lm2 = ba_global.merge_global_ba(
            self.state.kf, self.state.lm, self._pending_gba)
        self.state = self.state._replace(kf=kf2, lm=lm2)
        self._pending_gba = None
        self.gba_merges += 1
        self.loop_timings["gba_merge"] += _time.perf_counter() - t0

    def keyframe_trajectory(self):
        self._merge_gba_if_ready(force=True)
        return super().keyframe_trajectory()

    def _graph_sets(self):
        return {s: set(d) for s, d in self.covis_host.items()}

    def _try_relocalize_stream(self, frame_now: int, frames_lost: int = 1):
        """One-sync recovery: BoW candidates + PnP vs the live map, then
        patch the tracker pose in the stream state (the late-application
        analogue of relocalize_camera, tracking.h:241-419).

        ``frames_lost`` scales the motion gate (see loop/relocalize.py:
        the coasted pose diverges per lost frame, so the fresh-loss gate
        would reject every correct late recovery)."""
        from ..loop import relocalize as reloc_mod
        from ..loop import vocabulary as vocab_mod

        cfg = self.cfg
        bits, valid, corners, cur_pose, vel, live_frame = jax.device_get(
            (self.state.cur_bits, self.state.cur_valid,
             self.state.cur_corners, self.state.cur_pose, self.state.vel,
             self.state.frame))
        if int(valid.sum()) < cfg.reloc_min_features:
            return  # blackout frame: nothing to recognize
        words = np.asarray(vocab_mod._descend(
            self.state.voc_desc, self.state.voc_children,
            self.state.voc_word_of_node, jnp.asarray(bits),
            jnp.asarray(valid), self.voc.depth))
        bow = vocab_mod.bow_from_words(self.voc, words)
        if not bow:
            return
        ok, T_wc, _pairs, diag = reloc_mod.relocalize(
            self.state.kf, self.state.lm, self.detector,
            jnp.asarray(bits), jnp.asarray(valid), jnp.asarray(corners),
            bow, self._graph_sets(), jnp.asarray(cur_pose),
            jnp.asarray(vel), self.state.intr0, self.cam_name,
            cfg.motion_threshold, self.pnp_threshold, self._next_key(),
            num_hypotheses=cfg.ransac_hypotheses,
            max_retries=cfg.track_max_retries,
            max_candidates=cfg.reloc_max_candidates,
            frames_lost=frames_lost,
            # cross-gauge recoveries are only safe when loop closure can
            # merge the gauges afterwards (see config.py)
            gate_cap_mult=(cfg.reloc_gate_cap_mult
                           if cfg.enable_loop_closure else
                           min(cfg.reloc_gate_cap_mult,
                               cfg.reloc_gate_cap_mult_no_lc)))
        self.reloc_events.append((frame_now, bool(ok)))
        # applied_frame: the features/pose the recovery used belong to the
        # newest frame the device has processed (the stream ran ahead of
        # the poll); diagnostics downstream compare T_wc against GT at
        # THIS frame, not at frame_now
        diag.update(frame=frame_now, frames_lost=frames_lost,
                    applied_frame=int(live_frame) - 1)
        if ok:
            diag["T_wc"] = [round(float(v), 4) for v in np.asarray(T_wc)]
        self.reloc_diags.append(diag)
        if not ok:
            self._reloc_failures += 1
            self._reloc_next_attempt = frame_now + min(
                cfg.reloc_backoff_frames * (2 ** (self._reloc_failures - 1)),
                cfg.reloc_backoff_cap_frames)
            return
        self._reloc_failures = 0
        # the patch only affects frames dispatched AFTER this point; the
        # loss log keeps showing lost frames for the in-flight pipeline
        # (~prefetch + poll lag frames), so hold off re-attempts until the
        # recovery has had a chance to land in the log
        self._reloc_next_attempt = frame_now + 2 * self.poll_every
        # patch the tracker: recovered pose, motion model at rest, and a
        # keyframe request so the next frame re-anchors the track (the
        # reference's reloc'd frame re-enters the normal KF decision).
        # cur/last must be DISTINCT buffers: the donated step would
        # otherwise receive the same buffer twice.
        T = jnp.asarray(T_wc, jnp.float32)
        self.state = self.state._replace(
            cur_pose=T, last_pose=T + 0, vel=lie.identity_pose(),
            take_kf=jnp.asarray(True))

    def _handle_keyframe(self, frame_idx: int, slot: int,
                         words, covis_row):
        import time as _time

        from ..loop import closure as closure_mod
        from ..loop import vocabulary as vocab_mod

        class _T:
            """Accumulate wall seconds into loop_timings[key]."""

            def __init__(s, key):
                s.key = key

            def __enter__(s):
                s.t0 = _time.perf_counter()

            def __exit__(s, *a):
                self.loop_timings[s.key] += _time.perf_counter() - s.t0

        cfg = self.cfg
        self.frame_of_slot[slot] = frame_idx
        edges = {int(s): int(covis_row[s])
                 for s in np.nonzero(covis_row >= cfg.num_cov_threshold)[0]
                 if s != slot}
        self.covis_host[slot] = edges
        for s, w in edges.items():
            self.covis_host.setdefault(s, {})[slot] = w

        bow = vocab_mod.bow_from_words(self.voc, words)
        if not bow:
            return
        if not cfg.enable_loop_closure:
            # relocalization-only mode still needs the recognition database
            self.detector.db.insert(slot, bow)
            return
        with _T("detect"):
            candidates = self.detector.detect(
                slot, bow, edges, self._graph_sets(),
                2 * cfg.num_cov_threshold,
                essential_threshold=cfg.num_ess_threshold)
        self.loop_stats["candidates"] += len(candidates)
        if self.loop_edges and frame_idx - self._last_closure_frame \
                < cfg.loop_cooldown_frames:
            self.loop_stats["cooldown"] += len(candidates)
            return  # cooldown: the same revisit keeps re-detecting
        for cand in candidates:
            gap = frame_idx - self.frame_of_slot.get(cand, frame_idx)
            if gap <= cfg.loop_closing_time_threshold:
                self.loop_stats["too_recent"] += 1
                continue
            if cfg.sim3_solver == "horn":
                # 3D-3D alignment of the drifted and old landmark clouds
                # (sim3.h:48-141). On depth-uniform scenes (walls, the pano
                # world) the PnP path has a near-exact lateral-translation /
                # yaw ambiguity (delta_t ~= depth * delta_theta reprojects
                # identically); the 3D-3D form stays well-conditioned.
                with _T("sim3"):
                    ok, sim3, _scale = closure_mod.compute_sim3_horn(
                        self.state.kf, self.state.lm, slot, cand,
                        sorted(self.covis_host.get(cand, {})),
                        self._next_key(),
                        num_hypotheses=cfg.ransac_hypotheses)
            else:
                with _T("sim3"):
                    ok, sim3 = closure_mod.compute_sim3(
                        self.state.kf, self.state.lm, slot, cand,
                        sorted(self.covis_host.get(cand, {})),
                        self.state.intr0,
                        self.cam_name, self.pnp_threshold, self._next_key(),
                        num_hypotheses=cfg.ransac_hypotheses)
            if not ok:
                self.loop_stats["sim3_failed"] += 1
                continue
            if cfg.enable_loop_verification:
                nbrs = sorted(self.covis_host.get(cand, {}))
                with _T("verify"):
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
                    self.loop_stats["verify_failed"] += 1
                    self.rejected_loops.append(
                        (slot, cand, int(n_inl), int(n_vis)))
                    continue
                if cfg.loop_verify_min_gain > 0:
                    # identity-gain gate (see config): reject corrections
                    # that do not beat the current poses at explaining the
                    # candidate-side structure
                    sim3_id = lie.se3_mul(
                        lie.se3_inv(self.state.kf.pose_l[cand]),
                        self.state.kf.pose_l[slot])
                    with _T("verify"):
                        n_id, _ = closure_mod.verify_loop(
                            self.state.kf, self.state.lm, slot, cand, nbrs,
                            sim3_id, self.state.intr0, self.cam_name,
                            self.calib.width, self.calib.height,
                            px_gate=cfg.loop_verify_px,
                            threshold=cfg.match_max_dist,
                            ratio=cfg.match_next_best)
                    if n_inl < cfg.loop_verify_min_gain * max(n_id, 1):
                        self.loop_stats["no_gain"] += 1
                        self.rejected_loops.append(
                            (slot, cand, int(n_inl), -int(n_id)))
                        continue
            if not cfg.use_sim3:
                sim3 = lie.identity_pose()
            # late application: the stream has tracked past `slot` by up to
            # poll_every frames — the whole live gauge (slot + every newer
            # keyframe + the tracker) moves RIGIDLY onto the old map (the
            # datum), and the pose graph bends the chain between the two
            # anchors (see loop_closure docstring for why this direction)
            newer = [s for s, f in self.frame_of_slot.items()
                     if f >= self.frame_of_slot[slot]]
            new_cur, new_last = closure_mod.corr_apply(
                self.state.kf.pose_l[cand], jnp.asarray(sim3),
                self.state.kf.pose_l[slot], self.state.cur_pose,
                self.state.last_pose)
            with _T("pose_graph"):
                kf2, lm2, cl_stats = closure_mod.loop_closure(
                    self.state.kf, self.state.lm, slot, cand, sim3,
                    self.covis_host, self.state.T_0_1,
                    essential_threshold=cfg.num_ess_threshold,
                    live_slots=newer, huber=1.0, max_iters=20)
            # the tracker lives in the corrected gauge now (vel is a
            # relative pose — invariant under the left world correction)
            self.state = self.state._replace(
                kf=kf2, lm=lm2, cur_pose=new_cur, last_pose=new_last)
            self.loop_edges.append((slot, cand))
            self.closure_stats.append(
                {k: v for k, v in cl_stats.items()
                 if k.startswith("t_")})
            self.loop_stats["closed"] += 1
            self._last_closure_frame = frame_idx
            if cfg.enable_gba_after_loop:
                # async dispatch (the reference's global_ba_thread,
                # slam.cpp:1778-1788): the stream keeps tracking while the
                # solve runs; a later poll skip-merges the result. A solve
                # already in flight is superseded (its snapshot predates
                # this closure's correction — merging it would undo it).
                from . import ba_global

                with _T("gba_dispatch"):
                    self._pending_gba = ba_global.dispatch_global_ba(
                        self.state.kf, self.state.lm, self.state.intr0,
                        self.state.intr1, cam_name=self.cam_name,
                        huber=cfg.ba_huber_px,
                        max_iters=cfg.gba_max_iters,
                        cg_iters=cfg.gba_cg_iters,
                        mesh=ba_global.gba_mesh(cfg))
