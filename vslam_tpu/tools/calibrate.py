"""Offline stereo camera calibration from calibration-grid detections.

TPU-native equivalent of the reference's sidecar calibration tool
(/root/reference/src/calibration.cpp: full-batch Ceres over per-frame poses
T_w_i, per-camera extrinsics T_i_c, and 8-parameter intrinsics, with the
ReprojectionCostFunctor residual uv - project((T_w_i * T_i_c)^-1 * X),
reprojection.h:46-79; grid geometry aprilgrid.h:39-72).

Here the whole problem is one LM solve with jacfwd Jacobians over a packed
parameter vector — the problem is small (a few hundred poses x 6 + 2x6 +
2x8), so dense normal equations are cheapest. Gauge: frame 0's pose fixed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..geometry import cameras as cam_models
from ..geometry import lie


def aprilgrid_points(rows: int = 6, cols: int = 6, size: float = 0.088,
                     spacing: float = 0.3) -> np.ndarray:
    """3D corner positions of an AprilGrid (tagRows x tagCols, 4 corners
    each), z=0 plane. Mirrors the reference's grid geometry semantics
    (aprilgrid.h:39-72: tag size + spacing fraction)."""
    pts = []
    gap = size * (1 + spacing)
    for r in range(rows):
        for c in range(cols):
            x0, y0 = c * gap, r * gap
            pts += [[x0, y0, 0.0], [x0 + size, y0, 0.0],
                    [x0 + size, y0 + size, 0.0], [x0, y0 + size, 0.0]]
    return np.asarray(pts)


class CalibProblem(NamedTuple):
    grid: jnp.ndarray        # [G, 3] grid corner positions (world frame)
    # observations: frame f, camera c sees grid corner g at uv
    obs_frame: jnp.ndarray   # [O] int32
    obs_cam: jnp.ndarray     # [O] int32 (0/1)
    obs_corner: jnp.ndarray  # [O] int32
    obs_uv: jnp.ndarray      # [O, 2]
    obs_valid: jnp.ndarray   # [O] bool
    T_w_i0: jnp.ndarray      # [F, 7] initial per-frame body poses
    T_i_c0: jnp.ndarray      # [2, 7] initial extrinsics
    intr0: jnp.ndarray       # [2, 8] initial intrinsics


@functools.partial(jax.jit, static_argnames=("cam_name", "max_iters",
                                             "optimize_intrinsics"))
def calibrate(prob: CalibProblem, cam_name: str = "ds", huber: float = 1.0,
              max_iters: int = 25, optimize_intrinsics: bool = True):
    """Returns (T_w_i [F,7], T_i_c [2,7], intr [2,8], stats)."""
    F = prob.T_w_i0.shape[0]
    dtype = prob.T_w_i0.dtype

    n_pose = 6 * F
    n_ext = 12
    n_intr = 16

    # parameter preconditioning: intrinsics entries live on wildly different
    # scales (focal ~ hundreds, distortion ~ 0.1); scaling the deltas keeps
    # the identity-damped LM steps balanced in f32
    intr_scale = jnp.asarray([100.0, 100, 100, 100, 0.1, 0.1, 0.1, 0.1],
                             dtype)

    def unpack(theta):
        d_pose = theta[:n_pose].reshape(F, 6)
        d_ext = theta[n_pose:n_pose + n_ext].reshape(2, 6)
        d_intr = theta[n_pose + n_ext:].reshape(2, 8) * intr_scale
        T_w_i = jax.vmap(lie.se3_retract)(prob.T_w_i0, d_pose)
        T_i_c = jax.vmap(lie.se3_retract)(prob.T_i_c0, d_ext)
        intr = prob.intr0 + d_intr
        return T_w_i, T_i_c, intr

    def residuals(theta):
        T_w_i, T_i_c, intr = unpack(theta)

        def one(f, c, g, uv):
            T_w_c = lie.se3_mul(T_w_i[f], T_i_c[c])
            p_c = lie.se3_apply(lie.se3_inv(T_w_c), prob.grid[g])
            pred = cam_models.project(cam_name, intr[c], p_c)
            return jnp.clip(uv - pred, -1e5, 1e5)

        r = jax.vmap(one)(prob.obs_frame, prob.obs_cam, prob.obs_corner,
                          prob.obs_uv)
        return jnp.nan_to_num(r, nan=0.0, posinf=0.0, neginf=0.0)

    # gauge + optional intrinsics freeze
    free = jnp.ones(n_pose + n_ext + n_intr, dtype)
    free = free.at[:6].set(0.0)  # frame 0 fixed
    if not optimize_intrinsics:
        free = free.at[n_pose + n_ext:].set(0.0)

    def build(theta):
        J = jax.jacfwd(residuals)(theta)  # [O, 2, P]
        r = residuals(theta)
        nrm = jnp.linalg.norm(r, axis=-1)
        w = jnp.minimum(1.0, huber / jnp.maximum(nrm, 1e-12))
        sw = (jnp.sqrt(w) * prob.obs_valid.astype(dtype))[:, None]
        r = (r * sw).reshape(-1)
        J = (J * sw[..., None]).reshape(r.shape[0], -1)
        J = J * free[None, :]
        H = J.T @ J
        g = J.T @ r
        return H, g

    def cost_of(theta):
        r = residuals(theta)
        s = jnp.sum(r * r, axis=-1)
        nrm = jnp.sqrt(jnp.maximum(s, 0.0))
        rho = jnp.where(nrm <= huber, s, 2 * huber * nrm - huber * huber)
        return jnp.sum(jnp.where(prob.obs_valid, rho, 0.0))

    P = n_pose + n_ext + n_intr

    def step(carry, _):
        theta, lam, cost = carry
        H, g = build(theta)
        H = H + lam * jnp.eye(P, dtype=dtype)
        H = H + jnp.diag(jnp.where(free > 0, 0.0, 1.0))
        delta = jnp.nan_to_num(jnp.linalg.solve(H, -g)) * free
        new_theta = theta + delta
        new_cost = cost_of(new_theta)
        accept = new_cost < cost
        theta = jnp.where(accept, new_theta, theta)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (theta, lam, cost), new_cost

    theta0 = jnp.zeros(P, dtype)
    init_cost = cost_of(theta0)
    (theta, lam, cost), hist = lax.scan(
        step, (theta0, jnp.asarray(1e-4, dtype), init_cost), None,
        length=max_iters)
    T_w_i, T_i_c, intr = unpack(theta)
    return T_w_i, T_i_c, intr, {"initial_cost": init_cost,
                                "final_cost": cost, "history": hist}
