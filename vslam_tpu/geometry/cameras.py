"""Camera models: pinhole, extended-unified (eucm), double-sphere (ds),
Kannala-Brandt (kb4).

Same capabilities and 8-parameter layout ``[fx, fy, cx, cy, p1, p2, p3, p4]``
as the reference's templated camera classes
(/root/reference/include/visnav/camera_models.h:48-444); math re-derived for
batched jnp arrays so projection/unprojection vmaps over landmarks, RANSAC
hypotheses, and sequences, and differentiates with jax.grad (the reference
relies on Ceres Jet autodiff flowing through the same formulas).

The kb4 unprojection uses a fixed 5-step Newton iteration like the reference
(/root/reference/include/visnav/camera_models.h:397-426) — already
iteration-bounded there, so it maps directly to an unrolled XLA loop.

All functions take ``params`` with shape [..., 8] broadcasting against point
batches [..., 3] / [..., 2].
"""

from __future__ import annotations

import jax.numpy as jnp

CAMERA_MODELS = ("pinhole", "eucm", "ds", "kb4")


# ---------------------------------------------------------------------------
# project: camera-frame 3D point -> pixel
# ---------------------------------------------------------------------------

def _project_pinhole(params, p):
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return jnp.stack([fx * x / zs + cx, fy * y / zs + cy], axis=-1)


def _safe_sqrt(x):
    # max() keeps the sqrt gradient finite at 0 (NaN Jacobians of padded /
    # degenerate points would otherwise survive zero-weighting: NaN * 0 = NaN)
    return jnp.sqrt(jnp.maximum(x, 1e-18))


def _project_eucm(params, p):
    fx, fy, cx, cy, alpha, beta = (params[..., i] for i in range(6))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    d = _safe_sqrt(beta * (x * x + y * y) + z * z)
    denom = alpha * d + (1.0 - alpha) * z
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.stack([fx * x / denom + cx, fy * y / denom + cy], axis=-1)


def _project_ds(params, p):
    fx, fy, cx, cy, xi, alpha = (params[..., i] for i in range(6))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    d1 = _safe_sqrt(x * x + y * y + z * z)
    zz = xi * d1 + z
    d2 = _safe_sqrt(x * x + y * y + zz * zz)
    denom = alpha * d2 + (1.0 - alpha) * zz
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.stack([fx * x / denom + cx, fy * y / denom + cy], axis=-1)


def _project_kb4(params, p):
    fx, fy, cx, cy, k1, k2, k3, k4 = (params[..., i] for i in range(8))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = _safe_sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    rs = jnp.where(r < 1e-12, 1.0, r)
    u = jnp.where(r < 1e-12, cx, fx * d * x / rs + cx)
    v = jnp.where(r < 1e-12, cy, fy * d * y / rs + cy)
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# unproject: pixel -> unit bearing vector in camera frame
# ---------------------------------------------------------------------------

def _unproject_pinhole(params, uv):
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    one = jnp.ones_like(mx)
    v = jnp.stack([mx, my, one], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _unproject_eucm(params, uv):
    fx, fy, cx, cy, alpha, beta = (params[..., i] for i in range(6))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    rr = mx * mx + my * my
    inner = jnp.maximum(1.0 - (2.0 * alpha - 1.0) * beta * rr, 0.0)
    mz = (1.0 - beta * alpha * alpha * rr) / (
        alpha * jnp.sqrt(inner) + (1.0 - alpha)
    )
    v = jnp.stack([mx, my, mz], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _unproject_ds(params, uv):
    fx, fy, cx, cy, xi, alpha = (params[..., i] for i in range(6))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    rr = mx * mx + my * my
    inner = jnp.maximum(1.0 - (2.0 * alpha - 1.0) * rr, 0.0)
    mz = (1.0 - alpha * alpha * rr) / (alpha * jnp.sqrt(inner) + 1.0 - alpha)
    scale = (mz * xi + jnp.sqrt(jnp.maximum(mz * mz + (1.0 - xi * xi) * rr, 0.0))) / (
        mz * mz + rr
    )
    out = jnp.stack([scale * mx, scale * my, scale * mz - xi], axis=-1)
    # The ds closed-form unprojection already yields a unit vector; normalize
    # anyway for numerical safety.
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def _unproject_kb4(params, uv):
    fx, fy, cx, cy, k1, k2, k3, k4 = (params[..., i] for i in range(8))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    ru = jnp.sqrt(mx * mx + my * my)

    # Fixed 5 Newton steps from theta=0, like the reference.
    theta = jnp.zeros_like(ru)
    for _ in range(5):
        t2 = theta * theta
        d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - ru
        dd = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + t2 * 9.0 * k4)))
        theta = theta - d / dd

    rs = jnp.where(ru < 1e-12, 1.0, ru)
    st = jnp.sin(theta)
    vx = jnp.where(ru < 1e-12, 0.0, st * mx / rs)
    vy = jnp.where(ru < 1e-12, 0.0, st * my / rs)
    v = jnp.stack([vx, vy, jnp.cos(theta)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


_PROJECT = {
    "pinhole": _project_pinhole,
    "eucm": _project_eucm,
    "ds": _project_ds,
    "kb4": _project_kb4,
}
_UNPROJECT = {
    "pinhole": _unproject_pinhole,
    "eucm": _unproject_eucm,
    "ds": _unproject_ds,
    "kb4": _unproject_kb4,
}


def project(name: str, params, p):
    """Project camera-frame points [..., 3] to pixels [..., 2].

    ``name`` is a static (trace-time) model name; params may be traced.
    """
    return _PROJECT[name](jnp.asarray(params), jnp.asarray(p))


def unproject(name: str, params, uv):
    """Unproject pixels [..., 2] to unit bearings [..., 3]."""
    return _UNPROJECT[name](jnp.asarray(params), jnp.asarray(uv))
