"""Continuous-time SO(3) trajectory: cumulative uniform B-splines.

TPU-native replacement for basalt::So3Spline
(``/root/reference/thirdparty/basalt-headers/include/basalt/spline/
so3_spline.h:218-274``) and the reference's Trajectory layer
(``/root/reference/src/backend/trajectory.cpp``):

- linear (order N=2) and cubic (order N=4) cumulative splines,
- batch evaluation at many timestamps at once (vmapped gather + unrolled
  exp/log composition) — differentiable w.r.t. the knots, so the reference's
  hand-coded d_val_d_knot blocks (so3_spline.h:241-273) come from autodiff,
- control-pose fitting from pose samples by a tangent-space linear solve
  (trajectory.cpp:112-192 linear / 357-464 cubic),
- left-perturbation incremental update (trajectory.cpp:221-238).

Knots are stored as an (K, 4) array of unit quaternions. All functions are
pure; the host-side Trajectory class wraps a growing numpy knot buffer.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp

from . import lie


# ---------------------------------------------------------------------------
# Blending matrices (spline_common.h:70-100)
# ---------------------------------------------------------------------------

def _binom(n: int, k: int) -> int:
    return math.comb(n, k)


@functools.lru_cache(maxsize=8)
def blending_matrix(order: int, cumulative: bool = True) -> np.ndarray:
    """Uniform B-spline blending matrix M (order x order), optionally
    cumulative, using the published formula (Qin 1998) that
    basalt::computeBlendingMatrix implements (spline_common.h:70-100).

    Layout convention: basis weights = [1, u, u^2, ...] @ M, i.e. rows index
    powers of u and columns index basis functions — the same layout as the
    reference's hand-written M2/M4 fitting matrices
    (src/backend/trajectory.cpp:148-149, 419-422)."""
    n = order
    m = np.zeros((n, n), dtype=np.float64)  # m[basis j, power i]
    for i in range(n):
        for j in range(n):
            s_sum = 0.0
            for s in range(j, n):
                s_sum += (-1.0) ** (s - j) * _binom(n, s - j) * (n - s - 1.0) ** (n - 1 - i)
            m[j, i] = _binom(n - 1, n - 1 - i) * s_sum
    if cumulative:
        for i in range(n):
            for j in range(i + 1, n):
                m[i, :] += m[j, :]
    m /= math.factorial(n - 1)
    return np.ascontiguousarray(m.T)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def _segment_and_u(t: jnp.ndarray, t0, dt, num_knots: int, order: int):
    """Segment index s and normalized position u for times t (batched)."""
    rel = (t - t0) / dt
    s = jnp.floor(rel).astype(jnp.int32)
    s = jnp.clip(s, 0, num_knots - order)
    u = rel - s.astype(rel.dtype)
    return s, u


def evaluate(
    knots: jnp.ndarray, t: jnp.ndarray, t0, dt, order: int
) -> jnp.ndarray:
    """Evaluate the cumulative SO(3) B-spline at times ``t``.

    Args:
      knots: (K, 4) unit quaternions.
      t: (...,) times (same units as t0/dt; use *relative* seconds in f32).
      t0: spline start time; dt: knot spacing; order: 2 (linear) or 4 (cubic).

    Returns: (..., 4) quaternions R(t).

    Mirrors So3Spline::evaluate (so3_spline.h:218-274):
      R(t) = R_s * prod_{j=1..N-1} exp(coeff_j * log(R_{s+j-1}^{-1} R_{s+j}))
    with coeff = M_cum @ [1, u, u^2, ...].
    """
    M = jnp.asarray(blending_matrix(order, cumulative=True), dtype=knots.dtype)
    num_knots = knots.shape[0]
    s, u = _segment_and_u(t, t0, dt, num_knots, order)

    # Powers of u: (..., order)
    up = jnp.stack([u**i for i in range(order)], axis=-1)
    coeff = (up @ M).astype(knots.dtype)  # (..., order) cumulative weights

    # Gather the order knots per evaluation point: (..., order, 4)
    offs = jnp.arange(order)
    idx = s[..., None] + offs  # (..., order)
    kq = jnp.take(knots, idx, axis=0)

    res = kq[..., 0, :]
    for j in range(1, order):
        q0 = kq[..., j - 1, :]
        q1 = kq[..., j, :]
        delta = lie.log(lie.mul(lie.inv(q0), q1))  # (..., 3)
        res = lie.mul(res, lie.exp(coeff[..., j, None] * delta))
    return res


# ---------------------------------------------------------------------------
# Lane-major (structure-of-arrays) fast path
#
# `evaluate` operates on (..., 4) quaternion tensors whose minor dimension of
# 4 occupies 4/128 of a TPU vector lane tile; with a few dozen elementwise ops
# per spline segment this dominates the back-end objective's per-evaluation
# cost (measured 0.78 ms of a 0.84 ms warp at B=256 on v5e). The SoA variants
# below carry each quaternion/vector COMPONENT as its own (B,) array — full
# lane tiles, identical math, same autodiff semantics.
# ---------------------------------------------------------------------------


def _soa_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return (
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    )


def _soa_log(q):
    w, x, y, z = q
    sign = jnp.where(w < 0, -1.0, 1.0)
    w, x, y, z = w * sign, x * sign, y * sign, z * sign
    n_sq = x * x + y * y + z * z
    small = n_sq < lie._EPS * lie._EPS
    n = jnp.sqrt(jnp.where(small, 1.0, n_sq))
    w_c = jnp.clip(w, -1.0, 1.0)
    theta = 2.0 * jnp.arctan2(n, w_c)
    w_safe = jnp.maximum(w_c, 0.5)
    scale = jnp.where(
        small, 2.0 / w_safe - 2.0 * n_sq / (3.0 * w_safe**3), theta / n
    )
    return x * scale, y * scale, z * scale


def _soa_exp(v):
    x, y, z = v
    theta_sq = x * x + y * y + z * z
    small = theta_sq < lie._EPS * lie._EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * theta
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return w, x * sinc_half, y * sinc_half, z * sinc_half


def evaluate_rotmats(knots: jnp.ndarray, t: jnp.ndarray, t0, dt, order: int):
    """Evaluate the spline at times ``t`` and return the rotation matrices as
    a 3x3 nest of (B,) component arrays R[i][j] — exactly ``lie.to_matrix(
    evaluate(...))`` reassociated into lane-major arithmetic (the back-end
    warp consumes components anyway; see warp_pano.warp_to_pano)."""
    M = jnp.asarray(blending_matrix(order, cumulative=True), dtype=knots.dtype)
    num_knots = knots.shape[0]
    s, u = _segment_and_u(t, t0, dt, num_knots, order)
    up = jnp.stack([u**i for i in range(order)], axis=-1)
    coeff = (up @ M).astype(knots.dtype)  # (B, order)

    idx = s[:, None] + jnp.arange(order)  # (B, order)
    kq = jnp.take(knots.T, idx, axis=1)  # (4, B, order)

    res = (kq[0, :, 0], kq[1, :, 0], kq[2, :, 0], kq[3, :, 0])
    for j in range(1, order):
        q0_inv = (kq[0, :, j - 1], -kq[1, :, j - 1],
                  -kq[2, :, j - 1], -kq[3, :, j - 1])
        q1 = (kq[0, :, j], kq[1, :, j], kq[2, :, j], kq[3, :, j])
        dx, dy, dz = _soa_log(_soa_mul(q0_inv, q1))
        c = coeff[:, j]
        res = _soa_mul(res, _soa_exp((c * dx, c * dy, c * dz)))

    w, x, y, z = res
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def evaluate_with_jacobian(
    knots: jnp.ndarray, t: jnp.ndarray, t0, dt, order: int
):
    """Closed-form Jacobian d(R(t)) / d(left-perturbation of each knot).

    Port of the recursion in So3Spline::evaluate with J != nullptr
    (so3_spline.h:237-273); kept as a test oracle — production gradients flow
    through `evaluate` by autodiff. Returns (quat, start_idx, (order,3,3))."""
    M = jnp.asarray(blending_matrix(order, cumulative=True), dtype=knots.dtype)
    num_knots = knots.shape[0]
    s, u = _segment_and_u(t, t0, dt, num_knots, order)
    up = jnp.stack([u**i for i in range(order)], axis=-1)
    coeff = up @ M

    offs = jnp.arange(order)
    kq = jnp.take(knots, s[..., None] + offs, axis=0)

    res = kq[..., 0, :]
    J_helper = jnp.broadcast_to(
        jnp.eye(3, dtype=knots.dtype), t.shape + (3, 3)
    )
    Js = []
    for j in range(1, order):
        q0 = kq[..., j - 1, :]
        q1 = kq[..., j, :]
        delta = lie.log(lie.mul(lie.inv(q0), q1))
        kdelta = coeff[..., j, None] * delta
        Jl_inv = lie.left_jacobian_inv(delta)
        Jl_k = lie.left_jacobian(kdelta)
        Ji = J_helper
        R_res = lie.to_matrix(res)
        R0_inv = lie.to_matrix(lie.inv(q0))
        J_helper = coeff[..., j, None, None] * (R_res @ Jl_k @ Jl_inv @ R0_inv)
        Js.append(Ji - J_helper)
        res = lie.mul(res, lie.exp(kdelta))
    Js.append(J_helper)
    return res, s, jnp.stack(Js, axis=-3)


# ---------------------------------------------------------------------------
# Fitting control poses from pose samples (trajectory.cpp:112-192 / 357-464)
# ---------------------------------------------------------------------------

def fit_ctrl_poses(
    pose_times: np.ndarray,
    pose_quats: np.ndarray,
    t_beg: float,
    dt_knots: float,
    num_cps: int,
    order: int,
) -> np.ndarray:
    """Fit ``num_cps`` control poses to pose samples via a tangent-space
    linear solve (host-side, float64; runs once per window so speed is
    irrelevant — fidelity to the reference matters).

    Uses the *non-cumulative* basis like the reference: each pose row
    activates knots t_i..t_i+order-1 with weights [1, u, ...] @ M.
    """
    assert len(pose_times) >= num_cps, "underdetermined control-pose fit"
    M = blending_matrix(order, cumulative=False)

    # 1. Lift: rotation increments relative to the first pose.
    q_off = pose_quats[0]
    q_off_inv = q_off * np.array([1.0, -1, -1, -1])
    d = np.zeros((len(pose_times), 3))
    for i, q in enumerate(pose_quats):
        dq = _np_quat_mul(q_off_inv, q)
        d[i] = _np_quat_log(dq)

    # 2. Solve N P = D in least squares.
    N = np.zeros((len(pose_times), num_cps))
    for row, t in enumerate(pose_times):
        t_i = int(np.floor((t - t_beg) / dt_knots))
        t_i = min(max(t_i, 0), num_cps - order)
        u = (t - (t_i * dt_knots + t_beg)) / dt_knots
        U = np.array([u**i for i in range(order)])
        N[row, t_i : t_i + order] = U @ M
    P, *_ = np.linalg.lstsq(N, d, rcond=None)

    # 3. Retract.
    out = np.zeros((num_cps, 4))
    for i in range(num_cps):
        out[i] = _np_quat_mul(q_off, _np_quat_exp(P[i]))
    return out


def evaluate_np(
    knots: np.ndarray, t: np.ndarray, t0: float, dt: float, order: int
) -> np.ndarray:
    """Pure-numpy float64 batch evaluation (same math as `evaluate`).

    Host-side paths (pose bookkeeping, crop planning, checkpoint resume) call
    this instead of the jnp version: a trajectory lookup is a handful of
    flops, and routing it through the device costs a dispatch round-trip per
    call (~25 ms through a remote-TPU tunnel)."""
    knots = np.asarray(knots, np.float64)
    t = np.atleast_1d(np.asarray(t, np.float64))
    M = blending_matrix(order, cumulative=True)
    rel = (t - t0) / dt
    s = np.clip(np.floor(rel).astype(np.int64), 0, len(knots) - order)
    u = rel - s
    up = np.stack([u**i for i in range(order)], axis=-1)
    coeff = up @ M  # (B, order)
    kq = knots[s[:, None] + np.arange(order)]  # (B, order, 4)
    res = kq[:, 0]
    for j in range(1, order):
        q0 = kq[:, j - 1] * np.array([1.0, -1, -1, -1])
        d = _np_quat_log_batch(_np_quat_mul_batch(q0, kq[:, j]))
        res = _np_quat_mul_batch(res, _np_quat_exp_batch(coeff[:, j, None] * d))
    return res


# Small float64 numpy quaternion helpers for host-side fitting.
def _np_quat_mul_batch(a, b):
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def _np_quat_exp_batch(v):
    theta = np.linalg.norm(v, axis=-1, keepdims=True)
    small = theta < 1e-12
    safe = np.where(small, 1.0, theta)
    w = np.cos(theta / 2)
    s = np.where(small, 0.5, np.sin(safe / 2) / safe)
    return np.concatenate([w, s * v], axis=-1)


def _np_quat_log_batch(q):
    w = q[..., :1]
    xyz = q[..., 1:]
    sign = np.where(w < 0, -1.0, 1.0)
    w = w * sign
    xyz = xyz * sign
    n = np.linalg.norm(xyz, axis=-1, keepdims=True)
    small = n < 1e-12
    scale = np.where(
        small, 2.0 / np.maximum(w, 0.5),
        2.0 * np.arctan2(n, w) / np.where(small, 1.0, n),
    )
    return xyz * scale


def _np_quat_rotmat_batch(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def _np_quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _np_quat_exp(v):
    theta = np.linalg.norm(v)
    if theta < 1e-12:
        return np.array([1.0, *(0.5 * v)])
    return np.array([np.cos(theta / 2), *(np.sin(theta / 2) * v / theta)])


def _np_quat_log(q):
    w = q[0]
    xyz = np.asarray(q[1:])
    if w < 0:
        w, xyz = -w, -xyz
    n = np.linalg.norm(xyz)
    if n < 1e-12:
        return 2.0 * xyz / max(w, 0.5)
    return 2.0 * np.arctan2(n, w) * xyz / n


def _np_quat_rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def interp_pose_mid(t1, q1, t2, q2):
    """SO(3) midpoint interpolation (Trajectory::interpPoseMid,
    trajectory.cpp:7-20). Host-side utility."""
    dq = _np_quat_mul(q1 * np.array([1.0, -1, -1, -1]), q2)
    q_mid = _np_quat_mul(q1, _np_quat_exp(0.5 * _np_quat_log(dq)))
    return 0.5 * (t1 + t2), q_mid


# ---------------------------------------------------------------------------
# Incremental update (trajectory.cpp:221-238, 491-499)
# ---------------------------------------------------------------------------

def incremental_update(knots: jnp.ndarray, drotv: jnp.ndarray, idx_beg: int) -> jnp.ndarray:
    """Left-perturb knots[idx_beg:] by exp(drotv): the BA update step."""
    tail = knots[idx_beg:]
    updated = lie.mul(lie.exp(drotv), tail)
    return jnp.concatenate([knots[:idx_beg], updated], axis=0)


def apply_masked_increments(
    knots: jnp.ndarray, drotv: jnp.ndarray, free_mask: jnp.ndarray
) -> jnp.ndarray:
    """Differentiable left-perturbation with a per-knot free/frozen mask.

    The BA objective optimizes increments on the K free knots while earlier
    knots stay frozen (pose_graph_optimizer.cpp:283-288); masking (instead of
    slicing) keeps shapes static under jit.
    """
    d = drotv * free_mask[:, None]
    return lie.mul(lie.exp(d), knots)


class Trajectory:
    """Host-side growing trajectory, analog of cmax_slam::Trajectory
    (include/backend/trajectory.h:25-78). Holds knots as numpy; hands out
    jnp views for jitted evaluation."""

    def __init__(self, t_beg: float, dt_knots: float, order: int):
        assert order in (2, 4)
        self.t_beg = float(t_beg)
        self.dt_knots = float(dt_knots)
        self.order = order
        self.knots = np.zeros((0, 4), dtype=np.float64)

    @property
    def size(self) -> int:
        return len(self.knots)

    @property
    def degree(self) -> int:
        return self.order - 1

    def knot_time(self, i: int) -> float:
        return self.t_beg + i * self.dt_knots

    def push_ctrl_poses(self, quats: np.ndarray) -> None:
        self.knots = np.concatenate([self.knots, np.atleast_2d(quats)], axis=0)

    def generate_ctrl_poses(
        self, pose_times: np.ndarray, pose_quats: np.ndarray, t_beg: float, t_end: float
    ) -> np.ndarray:
        """LinearTrajectory::generateCtrlPoses (trajectory.cpp:210-219) /
        CubicTrajectory (:480-489): fit round(span/dt) + degree knots, where
        degree = 1 (linear) / 3 (cubic)."""
        num_cps = int(round((t_end - t_beg) / self.dt_knots)) + self.degree
        return fit_ctrl_poses(
            pose_times, pose_quats, t_beg, self.dt_knots, num_cps, self.order
        )

    def evaluate(self, t) -> np.ndarray:
        """Evaluate at scalar/array times (float64 host path, pure numpy —
        no device dispatch for bookkeeping lookups)."""
        return evaluate_np(self.knots, t, self.t_beg, self.dt_knots, self.order)

    def incremental_update(self, drotv: np.ndarray, idx_beg: int) -> None:
        out = incremental_update(
            jnp.asarray(self.knots), jnp.asarray(drotv), idx_beg
        )
        self.knots = np.asarray(out)

    def max_time(self) -> float:
        return self.t_beg + (self.size - self.order + 1) * self.dt_knots
