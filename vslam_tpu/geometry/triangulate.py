"""Two-view triangulation from unit bearing vectors.

Replaces opengv::triangulation::triangulate as used by the reference's
``add_new_landmarks`` (/root/reference/include/visnav/vo_utils.h:292-303):
given stereo bearings and the extrinsic T_0_1, produce the 3D point in the
left-camera frame. Implemented as the midpoint method (closed-form 2x2
least-squares along the two rays) so it vmaps over thousands of stereo
matches at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import quat_rotate, se3_q, se3_t


def triangulate_midpoint(f1, f2, T_1_2):
    """Triangulate points from bearings in two frames.

    f1 [..., 3]: unit bearings in frame 1; f2 [..., 3]: unit bearings in
    frame 2; T_1_2 [7]: pose of frame 2 in frame 1. Returns points in
    frame 1 [..., 3] and a validity heuristic (positive depths, non-parallel
    rays) [...].
    """
    r2 = quat_rotate(se3_q(T_1_2), f2)  # f2 rotated into frame 1
    t = jnp.broadcast_to(se3_t(T_1_2), f1.shape)

    # min || a*f1 - (t + b*r2) ||^2 over (a, b)
    f1f1 = jnp.sum(f1 * f1, axis=-1)
    r2r2 = jnp.sum(r2 * r2, axis=-1)
    f1r2 = jnp.sum(f1 * r2, axis=-1)
    f1t = jnp.sum(f1 * t, axis=-1)
    r2t = jnp.sum(r2 * t, axis=-1)

    det = f1f1 * r2r2 - f1r2 * f1r2
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    a = (r2r2 * f1t - f1r2 * r2t) / det_safe
    b = (f1r2 * f1t - f1f1 * r2t) / det_safe

    p1 = a[..., None] * f1
    p2 = t + b[..., None] * r2
    point = 0.5 * (p1 + p2)

    valid = (a > 0) & (b > 0) & (jnp.abs(det) > 1e-12)
    return point, valid
