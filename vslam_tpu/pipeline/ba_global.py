"""Global bundle adjustment over all keyframes and lifetime observations.

The analogue of the reference's ``global_bundle_adjustment`` + ``global_ba``
driver (loop_closure_utils.h:672-748, slam.cpp:1741-1789): every valid
keyframe (both cams), every landmark, the ``all_obs`` observation tables,
intrinsics frozen, first keyframe pair fixed. Uses the matrix-free LM-CG
solver so the problem can grow to thousands of keyframes (and shard across
a mesh via parallel/sharded_ba.py).

Shapes are padded to powers of two so recompiles happen O(log N) times over
a run.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.state import KeyframeState, LandmarkState
from ..geometry import lie
from ..solvers import ba_cg
from ..solvers.ba import BAProblem
from ..solvers.ba_blocked import BlockProblem


def _pow2(n: int, lo: int = 16) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


# Above this many keyframe PAIRS the dense 6K x 6K reduced camera system
# of the blocked Schur solver stops being obviously cheap (12K^2 floats,
# O(K^3) solve) and global BA falls back to matrix-free LM-CG. 128 pairs
# = a 1536-dof dense solve — still small; the CG path exists for the
# thousands-of-keyframes stretch config (tests/test_ba_scale.py).
BLOCKED_MAX_PAIRS = 128


class GlobalProblem(NamedTuple):
    prob: BAProblem
    n_kf: int
    n_lm_cap: int


@functools.partial(jax.jit, static_argnames=("K2", "Lw", "O"))
def _build(kf: KeyframeState, lm: LandmarkState, intr0, intr1,
           K2: int, Lw: int, O: int) -> BAProblem:
    K = kf.frame_id.shape[0]
    dtype = kf.pose_l.dtype
    kf_ids = jnp.arange(K2, dtype=jnp.int32)
    kf_ok = (kf_ids < kf.next_slot) & kf.valid[jnp.clip(kf_ids, 0, K - 1)]
    sel_kf = jnp.clip(kf_ids, 0, K - 1)

    poses = jnp.stack([kf.pose_l[sel_kf], kf.pose_r[sel_kf]], 1).reshape(
        2 * K2, 7)
    # gauge: first keyframe pair fixed (slam.cpp:1781)
    fixed = jnp.repeat(~kf_ok | (kf_ids == 0), 2)
    intr = jnp.stack([jnp.broadcast_to(intr0, (K2, 8)),
                      jnp.broadcast_to(intr1, (K2, 8))], 1).reshape(
        2 * K2, 8).astype(dtype)

    L = lm.pos.shape[0]
    lm_ids = jnp.arange(Lw, dtype=jnp.int32)
    lm_ok = (lm_ids < lm.next_slot) & lm.valid[jnp.clip(lm_ids, 0, L - 1)]
    sel_lm = jnp.clip(lm_ids, 0, L - 1)

    M2 = lm.all_kf.shape[1]
    okf = lm.all_kf[sel_lm]         # [Lw, M2]
    ocam = lm.all_cam[sel_lm]
    ofeat = lm.all_feat[sel_lm]
    ovalid = (okf >= 0) & (okf < K2) & lm_ok[:, None]
    opoint = jnp.broadcast_to(lm_ids[:, None], (Lw, M2))

    from ..ops.compact import compact_indices

    flat_valid = ovalid.reshape(-1)
    oidx, o_sel_ok = compact_indices(flat_valid, O)
    oidx = jnp.clip(oidx, 0, flat_valid.shape[0] - 1)
    o_valid = flat_valid[oidx] & o_sel_ok
    o_kf = okf.reshape(-1)[oidx]
    o_cam = ocam.reshape(-1)[oidx]
    o_feat = ofeat.reshape(-1)[oidx]
    o_point = opoint.reshape(-1)[oidx]
    o_w = jnp.where(o_valid, 2 * jnp.clip(o_kf, 0) + o_cam, 0)
    o_uv = kf.corners[jnp.clip(o_kf, 0), o_cam, o_feat]

    return BAProblem(
        poses=poses, pose_fixed=fixed, intr=intr,
        points=lm.pos[sel_lm], point_valid=lm_ok,
        obs_cam=o_w.astype(jnp.int32), obs_point=o_point.astype(jnp.int32),
        obs_uv=o_uv.astype(dtype), obs_valid=o_valid,
    )


@functools.partial(jax.jit, static_argnames=("K2", "Lw"))
def _build_blocked(kf: KeyframeState, lm: LandmarkState, intr0, intr1,
                   K2: int, Lw: int) -> BlockProblem:
    """Global problem in the blocked [Lw, M2] layout: the lifetime obs
    tables (all_obs, loop_closure_utils.h:702-728) map straight through —
    no flat compaction, no observation cap."""
    K = kf.frame_id.shape[0]
    dtype = kf.pose_l.dtype
    kf_ids = jnp.arange(K2, dtype=jnp.int32)
    kf_ok = (kf_ids < kf.next_slot) & kf.valid[jnp.clip(kf_ids, 0, K - 1)]
    sel_kf = jnp.clip(kf_ids, 0, K - 1)

    poses = jnp.stack([kf.pose_l[sel_kf], kf.pose_r[sel_kf]], 1).reshape(
        2 * K2, 7)
    fixed = jnp.repeat(~kf_ok | (kf_ids == 0), 2)
    intr = jnp.stack([jnp.broadcast_to(intr0, (K2, 8)),
                      jnp.broadcast_to(intr1, (K2, 8))], 1).reshape(
        2 * K2, 8).astype(dtype)

    L = lm.pos.shape[0]
    lm_ids = jnp.arange(Lw, dtype=jnp.int32)
    lm_ok = (lm_ids < lm.next_slot) & lm.valid[jnp.clip(lm_ids, 0, L - 1)]
    sel_lm = jnp.clip(lm_ids, 0, L - 1)

    okf = lm.all_kf[sel_lm]         # [Lw, M2]
    ocam = lm.all_cam[sel_lm]
    ofeat = lm.all_feat[sel_lm]
    ovalid = (okf >= 0) & (okf < K2) & lm_ok[:, None]
    obs_cam = 2 * jnp.clip(okf, 0) + ocam
    obs_uv = kf.corners[jnp.clip(okf, 0), ocam, ofeat]

    return BlockProblem(
        poses=poses, pose_fixed=fixed, intr=intr,
        points=lm.pos[sel_lm], point_valid=lm_ok,
        obs_cam=obs_cam.astype(jnp.int32),
        obs_uv=obs_uv.astype(dtype), obs_valid=ovalid,
    )


@jax.jit
def _merge(kf: KeyframeState, lm: LandmarkState, poses, points):
    """Scatter back all-KF poses and all-landmark positions; refresh p_c."""
    K = kf.pose_l.shape[0]
    K2 = poses.shape[0] // 2
    pl = poses.reshape(K2, 2, 7)
    ids = jnp.arange(K2)
    ok = (ids < kf.next_slot) & kf.valid[jnp.clip(ids, 0, K - 1)]
    tgt = jnp.where(ok, ids, K)
    kf = kf._replace(
        pose_l=kf.pose_l.at[tgt].set(pl[:, 0], mode="drop"),
        pose_r=kf.pose_r.at[tgt].set(pl[:, 1], mode="drop"),
    )
    L = lm.pos.shape[0]
    Lw = points.shape[0]
    lids = jnp.arange(Lw)
    lok = (lids < lm.next_slot) & lm.valid[jnp.clip(lids, 0, L - 1)]
    ltgt = jnp.where(lok, lids, L)
    lm = lm._replace(pos=lm.pos.at[ltgt].set(points, mode="drop"))
    anchor = jnp.clip(lm.from_kf, 0)
    p_c = jax.vmap(lambda T, p: lie.se3_apply(lie.se3_inv(T), p))(
        kf.pose_l[anchor], lm.pos)
    lm = lm._replace(pos_c=jnp.where(lm.valid[:, None], p_c, lm.pos_c))
    return kf, lm


def gba_mesh(cfg):
    """The driver's mesh for sharded global BA, per
    SlamConfig.gba_mesh_devices. Returns None (single-device solve) when
    sharding is off or the process has too few devices."""
    n = int(getattr(cfg, "gba_mesh_devices", 0) or 0)
    if n <= 1 or len(jax.devices()) < n:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh(n, axes=("data",))


def run_global_ba(
    kf: KeyframeState,
    lm: LandmarkState,
    intr0,
    intr1,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 15,
    cg_iters: int = 25,
    mesh=None,
):
    """Build + solve + merge. Returns (kf, lm, stats).

    ``mesh`` (a jax.sharding.Mesh with a 'data' axis, from
    SlamConfig.gba_mesh_devices) shards the solve's observation axis over
    the mesh via parallel/sharded_ba.py — the driver path for multi-chip
    global BA (always the flat LM-CG solver; the blocked Schur solver is
    single-device)."""
    n_kf = int(kf.next_slot)
    n_lm = int(lm.next_slot)
    K2 = _pow2(n_kf)
    Lw = _pow2(n_lm, lo=256)
    if mesh is None and K2 <= BLOCKED_MAX_PAIRS:
        from ..solvers import ba_blocked

        bprob = _build_blocked(kf, lm, intr0, intr1, K2=K2, Lw=Lw)
        poses, points, stats = ba_blocked.solve_ba_blocked(
            bprob, cam_name=cam_name, huber=huber, max_iters=max_iters)
    else:
        M2 = int(lm.all_kf.shape[1])
        O = _pow2(min(n_lm * 6, Lw * M2), lo=1024)
        prob = _build(kf, lm, intr0, intr1, K2=K2, Lw=Lw, O=O)
        if mesh is not None:
            from ..parallel import sharded_ba

            prob = sharded_ba.shard_problem(prob, mesh)
        # stepped solver: one bounded device program per LM iteration (a
        # monolithic full-iteration program at global-BA size was observed
        # to hard-fault the tunneled chip when early termination doesn't
        # trigger)
        poses, points, stats = ba_cg.solve_ba_cg_stepped(
            prob, cam_name=cam_name, huber=huber, max_iters=max_iters,
            cg_iters=cg_iters)
        if mesh is not None:
            dev0 = jax.devices()[0]
            poses = jax.device_put(poses, dev0)
            points = jax.device_put(points, dev0)
    kf, lm = _merge(kf, lm, poses, points)
    return kf, lm, stats


# ---------------------------------------------------------------------------
# Asynchronous GBA: dispatch on a snapshot, keep tracking, skip-merge later
# (the reference's global_ba_thread + modified-flag merge,
# slam.cpp:1778-1788 and :1410-1447)
# ---------------------------------------------------------------------------

class PendingGBA(NamedTuple):
    """An in-flight global BA: lazily-computed results + snapshot info.

    ``poses``/``points`` are device arrays whose computation was dispatched
    asynchronously; nothing blocks until the merge. The snapshot masks
    record which slots were live/active at dispatch so the merge can skip
    entries modified since (slam.cpp:1416-1447: cameras/landmarks with the
    ``modified`` flag keep their newer value)."""
    poses: jnp.ndarray        # [2*K2, 7]
    points: jnp.ndarray       # [Lw, 3]
    n_kf: jnp.ndarray         # [] int32 snapshot keyframe cursor
    n_lm: jnp.ndarray         # [] int32 snapshot landmark cursor
    snap_active_kf: jnp.ndarray  # [K] bool active (window) at dispatch
    snap_active_lm: jnp.ndarray  # [L] bool

    def ready(self) -> bool:
        return self.poses.is_ready()


def dispatch_global_ba(
    kf: KeyframeState,
    lm: LandmarkState,
    intr0,
    intr1,
    cam_name: str = "ds",
    huber: float = 1.0,
    max_iters: int = 15,
    cg_iters: int = 25,
    mesh=None,
) -> PendingGBA:
    """Enqueue a full global BA without blocking on its result.

    The two ``int()`` reads sync only the allocation cursors (the caller is
    already at a sync point when loop closure fires); the solve itself runs
    asynchronously and the caller merges with ``merge_global_ba`` once
    ``pending.ready()``. ``mesh`` shards the solve over a device mesh
    (see run_global_ba)."""
    n_kf = int(kf.next_slot)
    n_lm = int(lm.next_slot)
    K2 = _pow2(n_kf)
    Lw = _pow2(n_lm, lo=256)
    blocked = mesh is None and K2 <= BLOCKED_MAX_PAIRS
    if blocked:
        prob = _build_blocked(kf, lm, intr0, intr1, K2=K2, Lw=Lw)
    else:
        M2 = int(lm.all_kf.shape[1])
        O = _pow2(min(n_lm * 6, Lw * M2), lo=1024)
        prob = _build(kf, lm, intr0, intr1, K2=K2, Lw=Lw, O=O)
        if mesh is not None:
            from ..parallel import sharded_ba

            prob = sharded_ba.shard_problem(prob, mesh)
    snap_kf = kf.active.copy()
    snap_lm = lm.active.copy()
    # Materialize the snapshot BEFORE the caller enqueues more (donated)
    # steps: the problem build and the mask copies read the live state
    # buffers, and the caller's next step donates exactly those buffers.
    # On the tunneled device, letting a donated write race an in-flight
    # read was observed to hard-fault the chip; one blocking sync here
    # (a rare closure-time event) closes the race. Only the SOLVE stays
    # asynchronous — it reads nothing but the materialized problem.
    jax.block_until_ready((prob, snap_kf, snap_lm))
    if blocked:
        from ..solvers import ba_blocked

        poses, points, _stats = ba_blocked.solve_ba_blocked(
            prob, cam_name=cam_name, huber=huber, max_iters=max_iters)
    else:
        poses, points, _stats = ba_cg.solve_ba_cg_stepped(
            prob, cam_name=cam_name, huber=huber, max_iters=max_iters,
            cg_iters=cg_iters)
        if mesh is not None:
            # bring the (replicated) results home: the merge runs on the
            # tracking device's state buffers; the copy enqueues
            # asynchronously like the solve
            dev0 = jax.devices()[0]
            poses = jax.device_put(poses, dev0)
            points = jax.device_put(points, dev0)
    return PendingGBA(
        poses=poses, points=points,
        n_kf=jnp.asarray(n_kf, jnp.int32), n_lm=jnp.asarray(n_lm, jnp.int32),
        snap_active_kf=snap_kf, snap_active_lm=snap_lm)


@jax.jit
def merge_global_ba(kf: KeyframeState, lm: LandmarkState,
                    pending: PendingGBA):
    """Skip-merge: apply GBA results to every snapshot entry NOT modified
    since the dispatch.

    "Modified" = active (windowed BA touches active entries every keyframe
    step) at dispatch or at merge — the union covers entries that entered
    and left the window in between, plus landmark slots recycled by
    culling (they hold a different landmark now and are active). Entries
    created after the snapshot fall outside the ``n_kf``/``n_lm`` bounds.
    Anchor-relative landmark positions are refreshed for every valid
    landmark so ``p_c`` stays consistent with whichever pose/position pair
    survived (the reference recomputes p_c on merge, slam.cpp:1430-1440).
    """
    K = kf.pose_l.shape[0]
    K2 = pending.poses.shape[0] // 2
    pl = pending.poses.reshape(K2, 2, 7)
    ids = jnp.arange(K2)
    sel = jnp.clip(ids, 0, K - 1)
    kf_mod = pending.snap_active_kf[sel] | kf.active[sel]
    ok = (ids < pending.n_kf) & kf.valid[sel] & ~kf_mod
    tgt = jnp.where(ok, ids, K)
    kf = kf._replace(
        pose_l=kf.pose_l.at[tgt].set(pl[:, 0], mode="drop"),
        pose_r=kf.pose_r.at[tgt].set(pl[:, 1], mode="drop"),
    )
    L = lm.pos.shape[0]
    Lw = pending.points.shape[0]
    lids = jnp.arange(Lw)
    lsel = jnp.clip(lids, 0, L - 1)
    lm_mod = pending.snap_active_lm[lsel] | lm.active[lsel]
    lok = (lids < pending.n_lm) & lm.valid[lsel] & ~lm_mod
    ltgt = jnp.where(lok, lids, L)
    lm = lm._replace(pos=lm.pos.at[ltgt].set(pending.points, mode="drop"))
    anchor = jnp.clip(lm.from_kf, 0)
    p_c = jax.vmap(lambda T, p: lie.se3_apply(lie.se3_inv(T), p))(
        kf.pose_l[anchor], lm.pos)
    lm = lm._replace(pos_c=jnp.where(lm.valid[:, None], p_c, lm.pos_c))
    return kf, lm
