"""SO(3) Lie-group operations on unit quaternions.

TPU-native replacement for the reference's Sophus::SO3d usage
(``/root/reference/thirdparty/basalt-headers/include/sophus/so3.hpp``,
``basalt/utils/sophus_utils.hpp:155-411``). Everything is pure ``jnp``,
batch-friendly (leading axes broadcast), and differentiable; the closed-form
left Jacobians are kept primarily as test oracles — production gradients come
from autodiff.

Quaternions are stored as ``(..., 4)`` arrays in ``(w, x, y, z)`` order.
Rotation vectors (tangent space) are ``(..., 3)``.
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this angle (radians) Taylor expansions replace trig ratios.
_EPS = 1e-6


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``v``: hat(v) @ x == cross(v, x).

    Mirrors ``cross2Matrix`` (/root/reference/include/utils/image_geom_util.h:5-8).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def exp(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector -> unit quaternion (w, x, y, z).

    Safe-where guarded so autodiff is NaN-free at the identity (the BA
    objective is evaluated at zero increments every window)."""
    theta_sq = jnp.sum(rotvec * rotvec, axis=-1, keepdims=True)
    small = theta_sq < _EPS * _EPS
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    half = 0.5 * theta
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    xyz = rotvec * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)


def log(q: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: unit quaternion -> rotation vector (angle in [0, pi])."""
    w = q[..., :1]
    xyz = q[..., 1:]
    # Force positive hemisphere so the angle is the minimal one.
    sign = jnp.where(w < 0, -1.0, 1.0)
    w = w * sign
    xyz = xyz * sign
    n_sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = n_sq < _EPS * _EPS
    n = jnp.sqrt(jnp.where(small, 1.0, n_sq))
    w_c = jnp.clip(w, -1.0, 1.0)
    theta = 2.0 * jnp.arctan2(n, w_c)
    # theta / sin(theta/2) = 2/w * (1 - n^2/(3 w^2) + ...) ~ 2/w for tiny n
    w_safe = jnp.maximum(w_c, 0.5)
    scale = jnp.where(
        small, 2.0 / w_safe - 2.0 * n_sq / (3.0 * w_safe**3), theta / n
    )
    return xyz * scale


def mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 (compose rotations: first q2, then q1)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return rows


def from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> unit quaternion, branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidate quaternions, each stable in a different region.
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    traces = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(traces, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return normalize(q)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q without forming the matrix."""
    u = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def left_jacobian(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3); oracle for
    ``Sophus::leftJacobianSO3`` (basalt/utils/sophus_utils.hpp:333-371)."""
    theta_sq = jnp.sum(rotvec * rotvec, axis=-1)[..., None, None]
    small = theta_sq < _EPS * _EPS
    safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    K = hat(rotvec)
    K2 = K @ K
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (safe - jnp.sin(safe)) / (safe**3))
    eye = jnp.eye(3, dtype=rotvec.dtype)
    return eye + a * K + b * K2


def left_jacobian_inv(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3); oracle for
    ``Sophus::leftJacobianInvSO3`` (basalt/utils/sophus_utils.hpp:373-411)."""
    theta_sq = jnp.sum(rotvec * rotvec, axis=-1)[..., None, None]
    small = theta_sq < _EPS * _EPS
    safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    K = hat(rotvec)
    K2 = K @ K
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / (safe * safe)) - (1.0 + jnp.cos(safe)) / (2.0 * safe * jnp.sin(safe)),
    )
    eye = jnp.eye(3, dtype=rotvec.dtype)
    return eye - 0.5 * K + cot_term * K2
