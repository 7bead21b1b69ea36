"""SO(3)/SE(3) Lie group operations on quaternion-parameterized poses.

Replaces the reference's Sophus usage (reference: Sophus::SE3d throughout;
the manifold semantics mirror
/root/reference/include/visnav/local_parameterization_se3.hpp:35-68,
i.e. right-multiplicative retraction T * exp(delta) with delta = [upsilon,
omega]).

Pose storage layout is a length-7 vector ``[tx, ty, tz, qx, qy, qz, qw]``
(Sophus/cereal order, matching the reference's calibration JSON schema,
/root/reference/include/visnav/serialization.h). All functions broadcast
over arbitrary leading batch dimensions and are jit/vmap-safe.

Tangent (twist) layout is ``[upsilon (3), omega (3)]`` — translational part
first, matching Sophus' ``SE3::log()`` used by the reference's pose-graph
residual (/root/reference/include/visnav/reprojection.h:121).
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle switch point. f32 sqrt(eps) ~ 3.4e-4; theta^2 below this uses
# Taylor series. Safe for f64 too.
_EPS = 1e-8


def identity_pose(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=dtype)


# ---------------------------------------------------------------------------
# Quaternion primitives (xyzw layout)
# ---------------------------------------------------------------------------

def quat_mul(q1, q2):
    """Hamilton product q1 * q2, xyzw layout, batched."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # v' = v + 2 qw (qv x v) + 2 qv x (qv x v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q):
    """[..., 4] xyzw -> [..., 3, 3] rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """[..., 3, 3] rotation matrix -> [..., 4] xyzw quaternion.

    Shepperd's method, branch-free via jnp.select (jit-safe).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    s0 = _safe_sqrt(1.0 + tr) * 2.0  # 4*qw
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, s0 / 4.0], -1)

    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0  # 4*qx
    q1 = jnp.stack([s1 / 4.0, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)

    s2 = _safe_sqrt(1.0 - m00 + m11 - m22) * 2.0  # 4*qy
    q2 = jnp.stack([(m01 + m10) / s2, s2 / 4.0, (m12 + m21) / s2, (m02 - m20) / s2], -1)

    s3 = _safe_sqrt(1.0 - m00 - m11 + m22) * 2.0  # 4*qz
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, s3 / 4.0, (m10 - m01) / s3], -1)

    cond0 = tr > 0.0
    cond1 = jnp.logical_and(~cond0, jnp.logical_and(m00 > m11, m00 > m22))
    cond2 = jnp.logical_and(~cond0, jnp.logical_and(~(m00 > m11) | ~(m00 > m22), m11 > m22))
    cond2 = jnp.logical_and(~cond1, cond2)
    conds = [cond0[..., None], cond1[..., None], cond2[..., None]]
    q = jnp.select(conds + [jnp.ones_like(cond0[..., None], dtype=bool)], [q0, q1, q2, q3])
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp_quat(omega):
    """Axis-angle [..., 3] -> quaternion [..., 4].

    Double-where pattern throughout: sqrt/div inputs are replaced with safe
    values on the Taylor branch, otherwise reverse-mode AD propagates
    NaN * 0 = NaN from the untaken branch at omega = 0 (this silently
    poisoned BA gradients).
    """
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    half = 0.5 * theta
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([k * omega, w], axis=-1)


def so3_log(q):
    """Quaternion [..., 4] -> axis-angle [..., 3]. Angle in (-pi, pi]."""
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # shortest arc
    qv = q[..., :3]
    qw = jnp.clip(q[..., 3:4], -1.0, 1.0)
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n_sq < 1e-14
    n = jnp.sqrt(jnp.where(small, 1.0, n_sq))  # double-where: AD-safe at 0
    theta = 2.0 * jnp.arctan2(n, qw)
    k = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-12), theta / n)
    return k * qv


def hat(w):
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix.

    Semantics of the reference's ``skew``
    (/root/reference/include/visnav/matching_utils.h:51-55).
    """
    x, y, z = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def _so3_left_jacobian(omega):
    """V(omega): t = V * upsilon in se3_exp. [..., 3] -> [..., 3, 3]."""
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, 1.0, theta_sq)   # double-where: AD-safe at 0
    theta = jnp.sqrt(safe_sq)
    W = hat(omega)
    W2 = W @ W
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / safe_sq)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / (safe_sq * theta))
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a * W + b * W2


def _so3_left_jacobian_inv(omega):
    """V(omega)^-1, closed form."""
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, 1.0, theta_sq)   # double-where: AD-safe at 0
    theta = jnp.sqrt(safe_sq)
    W = hat(omega)
    W2 = W @ W
    half_theta = 0.5 * theta
    # coefficient of W2: (1 - theta*cot(theta/2)/2) / theta^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta))
        / safe_sq,
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye - 0.5 * W + cot_term * W2


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_t(T):
    return T[..., :3]


def se3_q(T):
    return T[..., 3:7]


def se3_make(t, q):
    return jnp.concatenate([t, q], axis=-1)


def se3_mul(T1, T2):
    """Compose T1 * T2."""
    q = quat_mul(se3_q(T1), se3_q(T2))
    t = se3_t(T1) + quat_rotate(se3_q(T1), se3_t(T2))
    return se3_make(t, quat_normalize(q))


def se3_inv(T):
    qi = quat_conj(se3_q(T))
    ti = -quat_rotate(qi, se3_t(T))
    return se3_make(ti, qi)


def se3_apply(T, p):
    """Apply T [..., 7] to points p [..., 3]."""
    return quat_rotate(se3_q(T), p) + se3_t(T)


def se3_exp(xi):
    """Twist [..., 6] = [upsilon, omega] -> pose [..., 7]."""
    ups, omega = xi[..., :3], xi[..., 3:6]
    q = so3_exp_quat(omega)
    V = _so3_left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, ups)
    return se3_make(t, q)


def se3_log(T):
    """Pose [..., 7] -> twist [..., 6] = [upsilon, omega]."""
    omega = so3_log(se3_q(T))
    Vinv = _so3_left_jacobian_inv(omega)
    ups = jnp.einsum("...ij,...j->...i", Vinv, se3_t(T))
    return jnp.concatenate([ups, omega], axis=-1)


def se3_retract(T, delta):
    """Right-multiplicative retraction T * exp(delta).

    Matches the reference's Ceres SE3 local parameterization
    (/root/reference/include/visnav/local_parameterization_se3.hpp:43-50).
    """
    return se3_mul(T, se3_exp(delta))


def se3_matrix(T):
    """[..., 7] -> [..., 4, 4] homogeneous matrix."""
    R = quat_to_matrix(se3_q(T))
    t = se3_t(T)[..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_Rt(R, t):
    return se3_make(t, matrix_to_quat(R))


def se3_normalize(T):
    return se3_make(se3_t(T), quat_normalize(se3_q(T)))
