"""Cleanroom scalar oracle: an independent, slow, double-precision numpy
implementation of the FULL CMax-SLAM pipeline, written from SURVEY.md's
recorded semantics of the reference (tub-rip/cmax_slam) — NOT translated from
the C++ and NOT sharing any compute code with the production JAX system.

Purpose (VERDICT round-2, next-round item 6): the sandbox has no datasets and
no egress, so end-to-end parity against the C++ reference cannot be measured
directly. This oracle converts "RMS vs synthetic ground truth" into "RMS vs an
independent implementation of the reference algorithm": tests/test_oracle_parity.py
runs both this oracle and the production system on the same synthetic stream
and asserts their trajectories agree.

Independence properties:
- pure numpy float64 end to end; no JAX imports;
- ALL gradients by central finite differences (the production system uses
  reverse-mode autodiff; the reference hand-codes analytic chains) — a third,
  independent derivative path;
- its own conjugate-gradient optimizer with a simple bracketing line search
  (production: vectorized-ladder FR-CG in lax.while_loop; reference: GSL
  multimin) — agreement therefore checks the OBJECTIVE and PROTOCOL, not the
  solver implementation;
- its own linear SO(3) spline with quaternion algebra written from the
  cumulative-B-spline definition (reference semantics: basalt so3_spline.h,
  trajectory.cpp; see SURVEY.md section 3.4).

Reference semantics mirrored (file:line cites are to /root/reference):
- front-end packet protocol      src/frontend/ang_vel_estimator.cpp:68-135
- first-order local warp         src/frontend/local_image_warped_events.cpp:59-170
- variance contrast              src/frontend/local_focus_funcs.cpp:26-44
- back-end window protocol       src/backend/pose_graph_optimizer.cpp:244-354
- trapezoidal pose integration   src/backend/pose_graph_optimizer.cpp:191-222
- pano warp + alpha blend        src/backend/event_pano_warper.cpp:167-336
- global-map update + FOV count  src/backend/event_pano_warper.cpp:81-126
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Quaternion algebra (wxyz), float64
# ---------------------------------------------------------------------------

def qmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def qinv(q: np.ndarray) -> np.ndarray:
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def qexp(v: np.ndarray) -> np.ndarray:
    """Rotation-vector exponential -> unit quaternion."""
    th = np.linalg.norm(v)
    if th < 1e-14:
        return np.array([1.0, 0.5 * v[0], 0.5 * v[1], 0.5 * v[2]]) / np.sqrt(
            1.0 + 0.25 * th * th
        )
    u = v / th
    s = np.sin(0.5 * th)
    return np.array([np.cos(0.5 * th), s * u[0], s * u[1], s * u[2]])


def qlog(q: np.ndarray) -> np.ndarray:
    """Unit quaternion -> rotation vector (angle * axis)."""
    w = np.clip(q[0], -1.0, 1.0)
    vec = q[1:]
    n = np.linalg.norm(vec)
    if n < 1e-14:
        return 2.0 * vec / max(w, 1e-14)
    th = 2.0 * np.arctan2(n, w)
    if th > np.pi:
        th -= 2.0 * np.pi
    return th * vec / n


def qrot(q: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Rotate (..., 3) vectors by one quaternion."""
    return p @ qmat(q).T


def qmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


# --- batched (vectorized) quaternion helpers: same formulas over (N, ...) ---

def qmul_b(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = a.T
    w2, x2, y2, z2 = b.T
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def qinv_b(q: np.ndarray) -> np.ndarray:
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def qexp_b(v: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(v, axis=-1)
    small = th < 1e-14
    th_safe = np.where(small, 1.0, th)
    s = np.sin(0.5 * th) / th_safe
    s = np.where(small, 0.5, s)
    return np.concatenate([np.cos(0.5 * th)[..., None], s[..., None] * v],
                          axis=-1)


def qlog_b(q: np.ndarray) -> np.ndarray:
    w = np.clip(q[..., 0], -1.0, 1.0)
    vec = q[..., 1:]
    n = np.linalg.norm(vec, axis=-1)
    small = n < 1e-14
    n_safe = np.where(small, 1.0, n)
    th = 2.0 * np.arctan2(n, w)
    th = np.where(th > np.pi, th - 2.0 * np.pi, th)
    fac = np.where(small, 2.0 / np.maximum(np.abs(w), 1e-14), th / n_safe)
    return fac[..., None] * vec


def qmat_b(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q.T
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


# ---------------------------------------------------------------------------
# Image ops: bilinear voting, Gaussian blur, variance
# ---------------------------------------------------------------------------

def bilinear_vote(px, py, w, height: int, width: int) -> np.ndarray:
    """Accumulate bilinear votes; reference in-bounds rule on the floored
    point: 1 <= floor(px) < W-2, 1 <= floor(py) < H-2
    (local_image_warped_events.cpp:142)."""
    fx = np.floor(px)
    fy = np.floor(py)
    ok = (fx >= 1) & (fx < width - 2) & (fy >= 1) & (fy < height - 2) & (w != 0)
    ix = fx[ok].astype(np.int64)
    iy = fy[ok].astype(np.int64)
    dx = px[ok] - ix
    dy = py[ok] - iy
    ww = w[ok]
    size = height * width
    flat = iy * width + ix
    # bincount is the fast exact scatter-add in numpy (np.add.at is ~10x
    # slower on large vote sets)
    img = np.bincount(flat, ww * (1 - dx) * (1 - dy), minlength=size)
    img += np.bincount(flat + 1, ww * dx * (1 - dy), minlength=size)
    img += np.bincount(flat + width, ww * (1 - dx) * dy, minlength=size)
    img += np.bincount(flat + width + 1, ww * dx * dy, minlength=size)
    return img.reshape(height, width)


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """cv::GaussianBlur(Size(0,0), sigma) semantics: auto ksize for float
    images = round(sigma*8+1)|1, reflect-101 border."""
    if sigma <= 0:
        return img
    ksize = int(round(sigma * 8 + 1)) | 1
    half = ksize // 2
    xs = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    k /= k.sum()

    def conv1d(a, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (half, half)
        ap = np.pad(a, pad, mode="reflect")  # numpy reflect == REFLECT_101
        out = np.zeros_like(a)
        for t in range(ksize):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(t, t + a.shape[axis])
            out += k[t] * ap[tuple(sl)]
        return out

    return conv1d(conv1d(img, 0), 1)


def variance(img: np.ndarray) -> float:
    m = img.mean()
    return float(((img - m) ** 2).mean())


# ---------------------------------------------------------------------------
# Optimizer: FR conjugate gradient, FD gradients, bracketing line search
# ---------------------------------------------------------------------------

def fd_grad(f, x: np.ndarray, h: float) -> np.ndarray:
    g = np.zeros_like(x)
    for i in range(len(x)):
        xp = x.copy(); xp[i] += h
        xm = x.copy(); xm[i] -= h
        g[i] = (f(xp) - f(xm)) / (2.0 * h)
    return g


def line_search(f, x, d, f0, step0):
    """Bracket the minimum along the UNIT direction d (callers normalize) by
    octave probes around step0 (both directions of scale), then
    golden-section polish. Returns (alpha, fmin) in arc units."""
    alphas = step0 * np.power(2.0, np.arange(-8, 9, dtype=np.float64))
    fs = np.array([f(x + a * d) for a in alphas])
    i = int(np.argmin(fs))
    if fs[i] >= f0:
        return 0.0, f0
    lo = alphas[i - 1] if i > 0 else alphas[i] * 0.25
    hi = alphas[i + 1] if i < len(alphas) - 1 else alphas[i] * 4.0
    # golden-section polish (14 shrinks: bracket to ~0.3% of its width)
    gr = 0.6180339887498949
    a, b = lo, hi
    c = b - gr * (b - a)
    dd = a + gr * (b - a)
    fc, fd_ = f(x + c * d), f(x + dd * d)
    for _ in range(14):
        if fc < fd_:
            b, dd, fd_ = dd, c, fc
            c = b - gr * (b - a)
            fc = f(x + c * d)
        else:
            a, c, fc = c, dd, fd_
            dd = a + gr * (b - a)
            fd_ = f(x + dd * d)
    alpha = c if fc < fd_ else dd
    fmin = min(fc, fd_)
    if fmin >= f0:
        return alphas[i], fs[i]
    return alpha, fmin


def minimize_cg(
    f,
    x0: np.ndarray,
    max_iters: int = 50,
    grad_tol: float = 1e-3,
    fun_tol: float = 1e-4,
    initial_step: float = 1.0,
    fd_h: float = 1e-6,
) -> Tuple[np.ndarray, float, int]:
    """Fletcher-Reeves nonlinear CG with GSL-shaped convergence tests
    (gradient norm; relative f stagnation). Gradients by central FD."""
    x = x0.astype(np.float64).copy()
    fx = f(x)
    g = fd_grad(f, x, fd_h)
    d = -g
    step = initial_step
    it = 0
    while it < max_iters:
        if np.linalg.norm(g) < grad_tol:
            break
        # Search along the unit direction so step scales are arc lengths in
        # parameter space, independent of the gradient's magnitude (GSL's
        # line minimization is likewise scale-free).
        dn = np.linalg.norm(d)
        if dn < 1e-300:
            break
        u = d / dn
        alpha, fnew = line_search(f, x, u, fx, step)
        if alpha == 0.0:
            # stall: one steepest-descent restart, then stop if still stuck
            if np.allclose(d, -g):
                break
            d = -g
            continue
        x = x + alpha * u
        step = max(alpha, 1e-6)
        it += 1
        if abs(fx - fnew) < fun_tol * (abs(fx) + 1e-12):
            fx = fnew
            g = fd_grad(f, x, fd_h)
            break
        fx = fnew
        g_new = fd_grad(f, x, fd_h)
        beta = float(g_new @ g_new) / max(float(g @ g), 1e-300)
        d = -g_new + beta * d
        g = g_new
    return x, fx, it


# ---------------------------------------------------------------------------
# Linear SO(3) cumulative B-spline (degree 1 / order 2)
# ---------------------------------------------------------------------------

class LinearSpline:
    """pose(t) = q_i * exp(u * log(q_i^{-1} q_{i+1})), u = (t-t_i)/dt
    (basalt cumulative spline at order 2; trajectory.cpp:86-110)."""

    def __init__(self, t0: float, dt: float):
        self.t0 = t0
        self.dt = dt
        self.knots: List[np.ndarray] = []

    @property
    def size(self) -> int:
        return len(self.knots)

    def knot_time(self, i: int) -> float:
        return self.t0 + i * self.dt

    def max_time(self) -> float:
        return self.t0 + (len(self.knots) - 1) * self.dt

    def evaluate(self, t: float) -> np.ndarray:
        u = (t - self.t0) / self.dt
        i = int(np.floor(u))
        i = min(max(i, 0), len(self.knots) - 2)
        u = u - i
        qa, qb = self.knots[i], self.knots[i + 1]
        return qmul(qa, qexp(u * qlog(qmul(qinv(qa), qb))))

    def evaluate_many(self, ts: np.ndarray) -> np.ndarray:
        """Vectorized evaluate over (B,) times -> (B, 4) quaternions."""
        K = np.stack(self.knots)
        u = (np.asarray(ts) - self.t0) / self.dt
        i = np.clip(np.floor(u).astype(np.int64), 0, len(self.knots) - 2)
        u = u - i
        qa, qb = K[i], K[i + 1]
        return qmul_b(qa, qexp_b(u[:, None] * qlog_b(qmul_b(qinv_b(qa), qb))))

    def fit_append(self, times: np.ndarray, quats: np.ndarray,
                   t_beg: float, num_cps: int, drop_head: int) -> None:
        """Fit num_cps knots on [t_beg, t_beg + (num_cps-1)*dt] to pose
        samples, then append knots[drop_head:] (generateCtrlPoses +
        pushbackCtrlPoses semantics, pose_graph_optimizer.cpp:254-278).

        Initialization: interpolate the integrated pose polyline at knot
        times; refinement: Gauss-Newton on the tangent-space residuals with
        FD Jacobian (the reference solves the same least-squares problem by
        one QR solve on an analytic linearization, trajectory.cpp:112-192)."""
        knot_ts = t_beg + self.dt * np.arange(num_cps)
        init = [interp_pose(times, quats, tk) for tk in knot_ts]

        base = np.stack(init)  # (K, 4)

        tj = np.clip(times, t_beg, knot_ts[-1] - 1e-12)

        def residuals(dv):
            dv = dv.reshape(num_cps, 3)
            sp = LinearSpline(t_beg, self.dt)
            sp.knots = list(qmul_b(qexp_b(dv), base))
            return qlog_b(qmul_b(qinv_b(quats), sp.evaluate_many(tj))).ravel()

        dv = np.zeros(3 * num_cps)
        for _ in range(3):  # GN iterations; residuals are near-linear
            r0 = residuals(dv)
            J = np.zeros((len(r0), len(dv)))
            h = 1e-6
            for j in range(len(dv)):
                dp = dv.copy(); dp[j] += h
                J[:, j] = (residuals(dp) - r0) / h
            sol, *_ = np.linalg.lstsq(J, -r0, rcond=None)
            dv = dv + sol
            if np.linalg.norm(sol) < 1e-10:
                break
        dv = dv.reshape(num_cps, 3)
        fitted = [qmul(qexp(dv[k]), base[k]) for k in range(num_cps)]
        self.knots.extend(fitted[drop_head:])


class CubicSpline:
    """Uniform cumulative SO(3) B-spline of order 4 (degree 3), the
    reference's spline_degree=3 mode (basalt So3Spline at order 4;
    trajectory.cpp:86-110). Knots-forward convention: the segment at
    ``t in [t_i, t_{i+1})`` uses knots i..i+3, so the evaluable span is
    ``[t0, t0 + (size-3)*dt]``. Written independently from the standard
    cumulative-basis formulation (uniform cubic B-spline basis summed from
    the tail): btilde_1 = (5+3u-3u^2+u^3)/6, btilde_2 = (1+3u+3u^2-2u^3)/6,
    btilde_3 = u^3/6."""

    def __init__(self, t0: float, dt: float):
        self.t0 = t0
        self.dt = dt
        self.knots: List[np.ndarray] = []

    @property
    def size(self) -> int:
        return len(self.knots)

    def knot_time(self, i: int) -> float:
        return self.t0 + i * self.dt

    def max_time(self) -> float:
        return self.t0 + (len(self.knots) - 3) * self.dt

    def evaluate(self, t: float) -> np.ndarray:
        return self.evaluate_many(np.array([t]))[0]

    def evaluate_many(self, ts: np.ndarray) -> np.ndarray:
        K = np.stack(self.knots)
        u = (np.asarray(ts, np.float64) - self.t0) / self.dt
        i = np.clip(np.floor(u).astype(np.int64), 0, len(self.knots) - 4)
        u = u - i
        d1 = qlog_b(qmul_b(qinv_b(K[i]), K[i + 1]))
        d2 = qlog_b(qmul_b(qinv_b(K[i + 1]), K[i + 2]))
        d3 = qlog_b(qmul_b(qinv_b(K[i + 2]), K[i + 3]))
        u2 = u * u
        u3 = u2 * u
        b1 = (5.0 + 3.0 * u - 3.0 * u2 + u3) / 6.0
        b2 = (1.0 + 3.0 * u + 3.0 * u2 - 2.0 * u3) / 6.0
        b3 = u3 / 6.0
        q = qmul_b(K[i], qexp_b(b1[:, None] * d1))
        q = qmul_b(q, qexp_b(b2[:, None] * d2))
        return qmul_b(q, qexp_b(b3[:, None] * d3))

    def fit_append(self, times: np.ndarray, quats: np.ndarray,
                   t_beg: float, num_cps: int, drop_head: int) -> None:
        """Same GN-on-FD-Jacobian fit as LinearSpline.fit_append, with the
        cubic evaluable span [t_beg, t_beg + (num_cps-3)*dt]."""
        knot_ts = t_beg + self.dt * np.arange(num_cps)
        init = [interp_pose(times, quats, tk) for tk in knot_ts]
        base = np.stack(init)
        t_max = t_beg + (num_cps - 3) * self.dt
        tj = np.clip(times, t_beg, t_max - 1e-12)

        def residuals(dv):
            dv = dv.reshape(num_cps, 3)
            sp = CubicSpline(t_beg, self.dt)
            sp.knots = list(qmul_b(qexp_b(dv), base))
            return qlog_b(qmul_b(qinv_b(quats), sp.evaluate_many(tj))).ravel()

        dv = np.zeros(3 * num_cps)
        for _ in range(3):
            r0 = residuals(dv)
            J = np.zeros((len(r0), len(dv)))
            h = 1e-6
            for j in range(len(dv)):
                dp = dv.copy(); dp[j] += h
                J[:, j] = (residuals(dp) - r0) / h
            sol, *_ = np.linalg.lstsq(J, -r0, rcond=None)
            dv = dv + sol
            if np.linalg.norm(sol) < 1e-10:
                break
        dv = dv.reshape(num_cps, 3)
        fitted = [qmul(qexp(dv[k]), base[k]) for k in range(num_cps)]
        self.knots.extend(fitted[drop_head:])


def interp_pose(times: np.ndarray, quats: np.ndarray, t: float) -> np.ndarray:
    """Geodesic interpolation of a pose polyline at time t (clamped)."""
    if t <= times[0]:
        return quats[0].copy()
    if t >= times[-1]:
        return quats[-1].copy()
    i = int(np.searchsorted(times, t, side="right")) - 1
    u = (t - times[i]) / max(times[i + 1] - times[i], 1e-15)
    qa, qb = quats[i], quats[i + 1]
    return qmul(qa, qexp(u * qlog(qmul(qinv(qa), qb))))


# ---------------------------------------------------------------------------
# Front-end oracle
# ---------------------------------------------------------------------------

@dataclass
class OracleFrontend:
    """Packet-windowed CMax angular-velocity estimation
    (ang_vel_estimator.cpp:68-189 semantics)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    num_events_per_packet: int
    dt_ang_vel: float
    blur_sigma: float
    event_batch_size: int
    max_iters: int = 50

    estimates: List[Tuple[float, np.ndarray]] = field(default_factory=list)

    def run(self, xs, ys, ts) -> List[Tuple[float, np.ndarray]]:
        xs = np.asarray(xs, np.float64)
        ys = np.asarray(ys, np.float64)
        ts = np.asarray(ts, np.float64)
        half = self.num_events_per_packet // 2

        # bearing LUT (ideal pinhole; matches the production identity_lut)
        gx, gy = np.meshgrid(np.arange(self.width), np.arange(self.height))
        bx = (gx - self.cx) / self.fx
        by = (gy - self.cy) / self.fy
        lut = np.stack([bx.ravel(), by.ravel(), np.ones(bx.size)], axis=-1)
        lut /= np.linalg.norm(lut, axis=-1, keepdims=True)

        cursor = ts[0] + 0.5 * self.dt_ang_vel
        t_packet = cursor
        omega = np.zeros(3)
        i = 0
        n = len(ts)
        while i < n:
            # first event crossing the subset cursor triggers a packet
            if ts[i] >= cursor:
                count = i + 1
                beg = max(count - half, 0)
                end = count + half
                if end > n:
                    break  # packet never completes
                exs, eys, ets = xs[beg:end], ys[beg:end], ts[beg:end]
                span = ets[-1] - ets[0]
                if span > 10.0 * self.dt_ang_vel or len(ets) < 2:
                    omega = np.zeros(3)  # degenerate guard (:108-114)
                    self.estimates.append((t_packet, omega.copy()))
                else:
                    omega = self._solve_packet(exs, eys, ets, t_packet,
                                               lut, omega)
                    self.estimates.append((t_packet, omega.copy()))
                t_packet += self.dt_ang_vel  # slideWindow
                cursor += self.dt_ang_vel
            i += 1
        return self.estimates

    def _solve_packet(self, xs, ys, ts, t_ref, lut, omega0) -> np.ndarray:
        idx = ys.astype(np.int64) * self.width + xs.astype(np.int64)
        b = lut[idx]  # (n, 3)
        # batch-shared midpoint dt (local_image_warped_events.cpp:59-76)
        dts = np.empty(len(ts))
        bs = self.event_batch_size
        for k in range(0, len(ts), bs):
            blk = ts[k:k + bs]
            dts[k:k + bs] = blk[0] + 0.5 * (blk[-1] - blk[0]) - t_ref
        w = np.ones(len(ts))

        def f(om):
            rot = b + np.cross(dts[:, None] * om[None, :], b)
            px = self.fx * rot[:, 0] / rot[:, 2] + self.cx
            py = self.fy * rot[:, 1] / rot[:, 2] + self.cy
            iwe = bilinear_vote(px, py, w, self.height, self.width)
            return -variance(gaussian_blur(iwe, self.blur_sigma))

        x, _, _ = minimize_cg(f, omega0, max_iters=self.max_iters,
                              grad_tol=1e-3, fun_tol=1e-4, initial_step=1.0,
                              fd_h=1e-5)
        return x


# ---------------------------------------------------------------------------
# Back-end oracle
# ---------------------------------------------------------------------------

@dataclass
class OracleBackend:
    """Sliding-window rotational bundle adjustment on a linear SO(3) spline
    over an equirectangular panorama (pose_graph_optimizer.cpp:244-354,
    event_pano_warper.cpp:167-336 semantics)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    pano_width: int
    pano_height: int
    time_window_size: float
    sliding_window_stride: float
    dt_knots: float
    blur_sigma: float
    event_batch_size: int
    min_ev_rate: float
    max_update_times: int
    max_iters: int = 100
    spline_degree: int = 1
    # Knots frozen in the very first window: None = reference semantics
    # (`degree`); the production library's de-cliffed default is 1
    # (config.first_window_frozen_knots).
    first_window_frozen_knots: Optional[int] = None
    # One-time causal re-solve of all completed windows at this window
    # index (production: config.bootstrap_resolve_window) — the scalar
    # mirror of Backend._run_bootstrap_resolve so parity can gate the
    # feature on both sides. None = off (reference semantics).
    bootstrap_resolve_window: Optional[int] = None

    trajectory_log: List[Tuple[float, np.ndarray]] = field(default_factory=list)

    def __post_init__(self):
        self.degree = 3 if self.spline_degree == 3 else 1
        self.order = self.degree + 1
        self._spline_cls = CubicSpline if self.degree == 3 else LinearSpline
        # Equirectangular focal: full panorama spans 2*pi x pi
        self.pfx = self.pano_width / (2.0 * np.pi)
        self.pfy = self.pano_height / np.pi
        self.pcx = 0.5 * self.pano_width
        self.pcy = 0.5 * self.pano_height
        self.IG = np.zeros((self.pano_height, self.pano_width))
        self.update_times = np.zeros((self.pano_height, self.pano_width),
                                     np.int64)
        gx, gy = np.meshgrid(np.arange(self.width), np.arange(self.height))
        bx = (gx - self.cx) / self.fx
        by = (gy - self.cy) / self.fy
        lut = np.stack([bx.ravel(), by.ravel(), np.ones(bx.size)], axis=-1)
        self.lut = lut / np.linalg.norm(lut, axis=-1, keepdims=True)
        self.traj = None

    def run(self, xs, ys, ts, av_times, av_vals) -> LinearSpline:
        """Replay the full window protocol over a finished (t, omega) log."""
        xs = np.asarray(xs, np.float64)
        ys = np.asarray(ys, np.float64)
        ts = np.asarray(ts, np.float64)
        av_times = np.asarray(av_times, np.float64)
        av_vals = np.asarray(av_vals, np.float64)

        t0 = av_times[0]
        t_win_beg = t0
        t_win_end = t0 + self.time_window_size
        t_av_beg, t_av_end = t_win_beg, t_win_end
        self.traj = self._spline_cls(t_win_beg, self.dt_knots)
        q_curr = np.array([1.0, 0.0, 0.0, 0.0])
        t_curr = t0
        w_prev, t_prev = av_vals[0], av_times[0]
        av_cursor = 0
        first_window = True
        idx_cp_opt_beg = 0
        count_window = 0
        cp_stride = int(round(self.sliding_window_stride / self.dt_knots))
        min_events = int(self.time_window_size * self.min_ev_rate)
        K_win = int(round(self.time_window_size / self.dt_knots)) + self.degree

        boot_pending = self.bootstrap_resolve_window
        while av_times[-1] > t_win_end and ts[-1] >= t_win_end:
            # --- one-time bootstrap re-solve of every completed window
            # against the map accumulated so far (production:
            # Backend._run_bootstrap_resolve; fires at the same point in
            # the stream — before this window's processing).
            if boot_pending is not None and count_window >= boot_pending:
                boot_pending = None
                for wdx in range(count_window):
                    tb = t0 + wdx * self.sliding_window_stride
                    te = tb + self.time_window_size
                    wa = int(np.searchsorted(ts, tb, side="left"))
                    wb = int(np.searchsorted(ts, te - 1e-6, side="right"))
                    if wb - wa > min_events and self.traj.size > wdx * cp_stride:
                        self._solve_window(
                            xs[wa:wb], ys[wa:wb], ts[wa:wb],
                            wdx * cp_stride, 0, K_win,
                            tb + self.sliding_window_stride, tb,
                        )
                self.trajectory_log = [
                    (t, self.traj.evaluate(t)) for (t, _) in self.trajectory_log
                ]

            # --- ang-vel subset (t_av_beg, t_av_end), consumed
            lo = int(np.searchsorted(av_times, t_av_beg, side="right"))
            hi = int(np.searchsorted(av_times, t_av_end, side="left"))
            lo = max(lo, av_cursor)
            av_cursor = hi

            # --- trapezoidal integration (:191-222)
            pose_times, pose_quats = [], []
            for j in range(lo, hi):
                t, w = av_times[j], av_vals[j]
                if t <= t_prev and not first_window:
                    continue
                drotv = (t - t_curr) * 0.5 * (w_prev + w)
                q_curr = qmul(q_curr, qexp(drotv))
                t_curr = t
                pose_times.append(t)
                pose_quats.append(q_curr.copy())
                t_prev, w_prev = t, w

            # --- fit + append control poses (:254-278)
            if len(pose_times) >= 2:
                num_cps = int(round((t_av_end - t_av_beg) / self.dt_knots)) \
                    + self.degree
                drop = 0 if first_window else self.degree
                if first_window:
                    nfz = self.first_window_frozen_knots
                    idx_cp_opt_beg = self.degree if nfz is None else int(nfz)
                    first_window = False
                self.traj.fit_append(
                    np.asarray(pose_times), np.stack(pose_quats),
                    t_av_beg, num_cps, drop,
                )

            idx_cp_traj_beg = count_window * cp_stride
            idx_cp_opt_beg = max(idx_cp_traj_beg, idx_cp_opt_beg)
            num_fixed = idx_cp_opt_beg - idx_cp_traj_beg

            # --- event subset [t_win_beg, t_win_end)
            a = int(np.searchsorted(ts, t_win_beg, side="left"))
            bidx = int(np.searchsorted(ts, t_win_end - 1e-6, side="right"))
            n_ev = bidx - a

            if n_ev > min_events and self.traj.size > idx_cp_traj_beg:
                self._solve_window(
                    xs[a:bidx], ys[a:bidx], ts[a:bidx],
                    idx_cp_traj_beg, num_fixed, K_win,
                    t_win_beg + self.sliding_window_stride,
                    t_win_beg,
                )

            # pose bookkeeping (:316-323)
            if self.traj.size >= self.order:
                t_eval = min(t_win_end - 1e-6, self.traj.max_time() - 1e-9)
                self.trajectory_log.append((t_eval, self.traj.evaluate(t_eval)))

            # --- slideWindow (:339-354)
            t_win_beg += self.sliding_window_stride
            t_av_beg = t_win_end
            t_win_end += self.sliding_window_stride
            t_av_end = t_win_end
            count_window += 1
        return self.traj

    # -- pano warp of one window's events through a candidate sub-trajectory
    def _warp(self, knots, t_knot0, b, batch_ids, batch_mids):
        ks = self._spline_cls(t_knot0, self.dt_knots)
        ks.knots = list(knots)
        Rb = qmat_b(ks.evaluate_many(batch_mids))  # (B, 3, 3)
        R = Rb[batch_ids]  # (n, 3, 3)
        p = np.einsum("nij,nj->ni", R, b)
        rho = np.linalg.norm(p, axis=-1)
        phi = np.arctan2(p[:, 0], p[:, 2])
        theta = np.arcsin(np.clip(p[:, 1] / rho, -1.0, 1.0))
        px = self.pcx + phi * self.pfx
        py = self.pcy + theta * self.pfy
        return px, py

    @staticmethod
    def _density(img: np.ndarray) -> float:
        area = float((1.0 - np.exp(-img)).sum())
        return float(img.sum()) / max(area, 1e-12)

    def _solve_window(self, xs, ys, ts, idx_cp_traj_beg, num_fixed, K_win,
                      t_next_win_beg, t_win_beg):
        idx = ys.astype(np.int64) * self.width + xs.astype(np.int64)
        b = self.lut[idx]
        bs = self.event_batch_size
        nb = (len(ts) + bs - 1) // bs
        batch_ids = np.minimum(np.arange(len(ts)) // bs, nb - 1)
        batch_mids = np.array([
            ts[k * bs] + 0.5 * (ts[min((k + 1) * bs, len(ts)) - 1] - ts[k * bs])
            for k in range(nb)
        ])
        w = np.ones(len(ts))
        is_old = ts < t_next_win_beg

        sub = self.traj.knots[idx_cp_traj_beg:idx_cp_traj_beg + K_win]
        K = len(sub)
        t_knot0 = self.traj.knot_time(idx_cp_traj_beg)
        free = np.zeros(K)
        free[num_fixed:] = 1.0

        ig_prime = self.IG  # updateIGp: linear copy (:128-132)

        def perturbed(dv):
            dv = dv.reshape(K, 3)
            return [qmul(qexp(free[k] * dv[k]), sub[k]) for k in range(K)]

        # alpha from the initial trajectory's IL (updateAlpha, :134-165)
        px0, py0 = self._warp(sub, t_knot0, b, batch_ids, batch_mids)
        il0 = bilinear_vote(px0, py0, w, self.pano_height, self.pano_width)
        if np.count_nonzero(ig_prime) < 1:
            alpha = 0.0
        else:
            alpha = self._density(il0) / self._density(ig_prime)

        def f(dv):
            px, py = self._warp(perturbed(dv), t_knot0, b, batch_ids,
                                batch_mids)
            il = bilinear_vote(px, py, w, self.pano_height, self.pano_width)
            img = gaussian_blur(il + alpha * ig_prime, self.blur_sigma)
            return -variance(img)

        # Tighter-than-reference tolerances: the oracle's job is to land on
        # the TRUE optimum of the shared objective (the parity bar is 0.1
        # deg; GSL-loose stopping leaves ~0.1 deg of slack per window).
        dv, _, _ = minimize_cg(
            f, np.zeros(3 * K), max_iters=self.max_iters,
            grad_tol=1e-6, fun_tol=1e-6, initial_step=0.05, fd_h=1e-5,
        )
        new_knots = perturbed(dv)
        self.traj.knots[idx_cp_traj_beg:idx_cp_traj_beg + K] = new_knots

        # --- updateIG with saturation (:109-126) from IL_old at the optimum
        px, py = self._warp(new_knots, t_knot0, b, batch_ids, batch_mids)
        il_old = bilinear_vote(px[is_old], py[is_old], w[is_old],
                               self.pano_height, self.pano_width)
        keep = self.update_times <= self.max_update_times
        self.IG = np.where(keep, self.IG + il_old, self.IG)

        # --- setUpdateTimesIG: dilated FOV footprints every 0.05 s (:81-107)
        dt_check = 0.05
        count = max(1, int(np.ceil(self.sliding_window_stride / dt_check
                                   - 1e-9)))
        fov = np.zeros_like(self.update_times)
        for j in range(count):
            t_c = min(t_win_beg + dt_check * j, self.traj.max_time() - 1e-9)
            R = qmat(self.traj.evaluate(t_c))
            rays = self.lut @ R.T
            rho = np.linalg.norm(rays, axis=-1)
            phi = np.arctan2(rays[:, 0], rays[:, 2])
            theta = np.arcsin(np.clip(rays[:, 1] / rho, -1, 1))
            ix = np.clip(np.round(self.pcx + phi * self.pfx).astype(np.int64),
                         0, self.pano_width - 1)
            iy = np.clip(np.round(self.pcy + theta * self.pfy).astype(np.int64),
                         0, self.pano_height - 1)
            hit = np.zeros_like(fov)
            hit[iy, ix] = 1
            # dilate by radius 3 (7x7 max filter)
            d = hit
            for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
                for _ in range(3):
                    d = np.maximum(d, np.roll(d, sh, axis=ax))
            fov = np.maximum(fov, d)
        self.update_times = self.update_times + fov


def run_oracle(xs, ys, ts, fe: OracleFrontend, be: OracleBackend):
    """Full-pipeline oracle: front-end packets -> (t, omega) -> back-end BA.
    Returns (trajectory, [(t, omega)], trajectory_log)."""
    ests = fe.run(xs, ys, ts)
    av_t = np.array([t for t, _ in ests])
    av_w = np.stack([w for _, w in ests])
    traj = be.run(xs, ys, ts, av_t, av_w)
    return traj, ests, be.trajectory_log
