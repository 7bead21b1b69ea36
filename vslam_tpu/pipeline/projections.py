"""Reprojection reporting: per-observation errors + outlier flags.

Equivalent of the reference's ``compute_projections`` cache
(/root/reference/src/slam.cpp:1461-1507 filling ImageProjections with
per-observation reprojection errors and OutlierFlags,
common_types.h:313-353), which feeds both the GUI overlays and outlier
inspection. Here it is one jitted program over the windowed observation
tables, returning flat arrays a caller can aggregate per keyframe or feed
to viz.overlays.draw_reprojections.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.state import KeyframeState, LandmarkState
from ..geometry import cameras as cam_models
from ..geometry import lie

# OutlierFlags semantics (common_types.h:314-324)
OUTLIER_NONE = 0
OUTLIER_REPROJECTION_HUGE = 1 << 0    # error much too large
OUTLIER_REPROJECTION_NORMAL = 1 << 1  # error too large
OUTLIER_CAMERA_DISTANCE = 1 << 2      # too close to the camera
OUTLIER_Z_COORDINATE = 1 << 3         # z in camera frame too small


class ProjectionReport(NamedTuple):
    obs_kf: jnp.ndarray        # [O] keyframe slot (-1 padding)
    obs_cam: jnp.ndarray       # [O]
    obs_lm: jnp.ndarray        # [O] landmark slot
    measured: jnp.ndarray      # [O, 2]
    projected: jnp.ndarray     # [O, 2]
    error: jnp.ndarray         # [O] reprojection error (px)
    outlier_flags: jnp.ndarray  # [O] int32 bitmask
    valid: jnp.ndarray         # [O] bool


@functools.partial(jax.jit, static_argnames=("cam_name", "O"))
def compute_projections(
    kf: KeyframeState,
    lm: LandmarkState,
    intr0,
    intr1,
    cam_name: str = "ds",
    O: int = 20480,
    huge_px: float = 8.0,
    normal_px: float = 3.0,
    min_distance: float = 0.1,
    z_threshold: float = 0.1,
) -> ProjectionReport:
    L, M = lm.obs_kf.shape
    flat_kf = lm.obs_kf.reshape(-1)
    flat_cam = lm.obs_cam.reshape(-1)
    flat_feat = lm.obs_feat.reshape(-1)
    flat_lm = jnp.repeat(jnp.arange(L, dtype=jnp.int32), M)
    flat_valid = (flat_kf >= 0) & jnp.repeat(lm.valid & lm.active, M)

    from ..ops.compact import compact_indices

    sel, sel_ok = compact_indices(flat_valid, O)
    sel = jnp.clip(sel, 0, flat_valid.shape[0] - 1)
    o_valid = flat_valid[sel] & sel_ok
    o_kf = jnp.clip(flat_kf[sel], 0)
    o_cam = flat_cam[sel]
    o_feat = flat_feat[sel]
    o_lm = flat_lm[sel]

    T = jnp.where(o_cam[:, None] == 0, kf.pose_l[o_kf], kf.pose_r[o_kf])
    X = lm.pos[o_lm]
    p_c = jax.vmap(lambda t, x: lie.se3_apply(lie.se3_inv(t), x))(T, X)
    intr = jnp.where(o_cam[:, None] == 0, intr0[None, :], intr1[None, :])
    proj = cam_models.project(cam_name, intr, p_c)
    measured = kf.corners[o_kf, o_cam, o_feat]
    err = jnp.linalg.norm(measured - proj, axis=-1)

    flags = jnp.zeros(O, jnp.int32)
    flags = flags | jnp.where(err > huge_px, OUTLIER_REPROJECTION_HUGE, 0)
    flags = flags | jnp.where(err > normal_px, OUTLIER_REPROJECTION_NORMAL, 0)
    dist = jnp.linalg.norm(p_c, axis=-1)
    flags = flags | jnp.where(dist < min_distance, OUTLIER_CAMERA_DISTANCE, 0)
    flags = flags | jnp.where(p_c[:, 2] < z_threshold, OUTLIER_Z_COORDINATE, 0)

    return ProjectionReport(
        obs_kf=jnp.where(o_valid, o_kf, -1),
        obs_cam=o_cam, obs_lm=o_lm,
        measured=measured, projected=proj,
        error=jnp.where(o_valid, err, 0.0),
        outlier_flags=jnp.where(o_valid, flags, 0),
        valid=o_valid,
    )


def reprojection_rmse(report: ProjectionReport) -> float:
    import numpy as np

    e = np.asarray(report.error)[np.asarray(report.valid)]
    return float(np.sqrt(np.mean(e * e))) if len(e) else float("nan")
