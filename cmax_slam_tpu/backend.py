"""Back-end: sliding-window rotational bundle adjustment by global CMax.

TPU-native rebuild of PoseGraphOptimizer (src/backend/pose_graph_optimizer.cpp,
include/backend/pose_graph_optimizer.h:42-55). The busy-wait worker thread and
mutex-guarded shared vectors become a cooperative host-side state machine over
the shared EventStore; each window's bundle adjustment is one jitted device
program (spline-warp -> pano matmul-votes -> blend -> blur -> variance ->
FR-CG over R^{3K}), with reverse-mode autodiff replacing the reference's 3K
hand-accumulated derivative images.

Window protocol (pose_graph_optimizer.cpp:244-354):
- windows of `time_window_size` slide by `sliding_window_stride` (50% overlap
  at the defaults),
- front-end angular velocities are trapezoid-integrated into absolute poses
  (post-multiplicative exp updates, :191-222),
- new control poses are fitted to those poses over the fresh ang-vel span and
  appended (dropping the first degree knots that overlap, :254-278),
- knots before the window and the first 1/3 knots of the very first window
  are frozen (:261-264, 283-288),
- events with ts < t_win_beg + stride vote into IL_old and are absorbed into
  the global map IG after the solve, saturated per pixel by an update-count
  map grown from dilated FOV footprints every 0.05 s (:303-337).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import spline
from .calib import EquirectCamera
from .config import BackendConfig
from .io.events import EventStore
from .ops import optim, warp_pano
from .ops.warp_pano import PanoWindow
from .utils.metrics import Metrics, logger


def _np_exp(v):
    return spline._np_quat_exp(v)


def _np_mul(a, b):
    return spline._np_quat_mul(a, b)


def _map_epilogue(ig, update_times, il_old, knots_new, fov_times,
                  t0, dt_knots, pano, order, lut_dev, max_updates: int):
    """Device-side end-of-window map updates, fused into the solve program:
    IG absorption with per-pixel saturation (updateIG,
    pose_graph_optimizer.cpp:303) and FOV update-count growth at the
    dt_check grid (setUpdateTimesIG, :325-337)."""
    ig_new = warp_pano.accumulate_global_map(ig, il_old, update_times,
                                             max_updates)
    q_fov = spline.evaluate(knots_new, fov_times, t0, dt_knots, order)
    fovm = warp_pano.fov_mask(q_fov, lut_dev, pano, radius=3)
    upd_new = update_times + fovm
    return ig_new, upd_new


def _unpack_window(evd, batch_times, knots, free_mask, t0, dt_knots,
                   ig_prime, lut_dev, cam_width: int) -> PanoWindow:
    """Device-side window assembly from the bit-packed int32 event upload
    (x: bits 0-11, y: 12-23, valid: 24, is_old: 25 — see _window_arrays):
    LUT bearing gather (component-major) + flag decode. 4 B/event on the
    host->device link, bit-exact vs the old (4, N) float32 layout."""
    valid = (evd >> 24) & 1
    idx = jnp.where(
        valid > 0, ((evd >> 12) & 0xFFF) * cam_width + (evd & 0xFFF), 0
    )
    bearings = jnp.take(lut_dev, idx, axis=0).T  # (3, N) lane-major
    return PanoWindow(
        bearings=bearings, batch_times=batch_times,
        weights=valid.astype(jnp.float32),
        is_old=((evd >> 25) & 1) > 0, knots=knots, free_mask=free_mask,
        t0=t0, dt_knots=dt_knots, ig_prime=ig_prime, alpha=jnp.float32(0.0),
    )


def _with_prior(f, vg, lam):
    """Wrap an objective with a quadratic prior 0.5*lam*||x||^2 toward the
    initialization (x is the knot-increment vector, so x=0 IS the incoming
    trajectory). lam is a runtime scalar: 0 for the online pass (a pull
    toward the FE-integrated guess was measured to hurt BA accuracy); >0
    for offline refine sweeps, where the incoming trajectory is the online
    OPTIMUM and near-still spans leave the contrast objective flat — the
    prior pins those gauge-like directions without disturbing
    well-constrained ones (MAP with the online estimate as prior)."""
    def f2(x):
        return f(x) + 0.5 * lam * jnp.sum(x * x)

    def vg2(x):
        v, g = vg(x)
        return v + 0.5 * lam * jnp.sum(x * x), g + lam * x

    return f2, vg2


def _unpack_smalls(smalls, K: int, F: int):
    """Decode the fused per-window small-argument vector (packed inline in
    Backend._dispatch_window_solve_impl): [batch_times(B) | knots(4K) | free(K) |
    fov_times(F) | crop_ints(6) | prior_lam, t0, dt_knots]. One packed
    upload replaces seven small host->device transfers — on a remote-device
    tunnel each transfer is its own RPC, and the per-window dispatch cost
    is set by RPC count, not bytes."""
    B = smalls.shape[0] - 5 * K - F - 9
    batch_times = smalls[:B]
    knots = smalls[B:B + 4 * K].reshape(K, 4)
    free_mask = smalls[B + 4 * K:B + 5 * K]
    fov_times = smalls[B + 5 * K:B + 5 * K + F]
    crop_ints = smalls[B + 5 * K + F:B + 5 * K + F + 6].astype(jnp.int32)
    prior_lam, t0, dt_knots = smalls[-3], smalls[-2], smalls[-1]
    return (batch_times, knots, free_mask, fov_times, crop_ints, prior_lam,
            t0, dt_knots)


@functools.lru_cache(maxsize=None)
def _build_window_solver(pano, order: int, blur_sigma: float, measure: int,
                         o, max_up: int, cam_width: int,
                         precision: str = "highest",
                         trust_radius: float | None = None,
                         K: int = 0, F: int = 0, restarts: int = 0):
    """Full-panorama window solver, memoized at module level so every
    Backend instance (and every replay pass in a process) shares one jit
    function — and therefore one compiled-executable cache. The sensor
    bearing LUT is a runtime argument for the same reason."""

    @jax.jit
    def solve(evd, smalls, ig_prime, update_times, lut_dev):
        (batch_times, knots, free_mask, fov_times, _ints, prior_lam,
         t0, dt_knots) = _unpack_smalls(smalls, K, F)
        win0 = _unpack_window(evd, batch_times, knots, free_mask, t0,
                              dt_knots, ig_prime, lut_dev, cam_width)
        # First evaluation of the window computes alpha from the initial
        # trajectory's IL (setFirstIter/updateAlpha semantics,
        # event_pano_warper.cpp:201-213).
        il0, _ = warp_pano.pano_objective_image(
            jnp.zeros((K, 3), jnp.float32), win0, pano, order, blur_sigma,
            precision,
        )
        alpha = warp_pano.compute_alpha(il0, ig_prime)
        win = win0._replace(alpha=alpha)

        f, vg = warp_pano.make_pano_objective(
            win, pano, order, blur_sigma, measure, precision
        )
        f, vg = _with_prior(f, vg, prior_lam)
        res = optim.minimize_fr_cg(
            vg, jnp.zeros(3 * K, jnp.float32), f_fn=f,
            max_line_searches=o.max_line_searches,
            initial_step=o.initial_step,
            line_search_tol=o.line_search_tol,
            grad_tol=o.grad_tol,
            fun_tol=o.fun_tol,
            max_fevals_per_linesearch=o.max_fevals_per_linesearch,
            stagnation_patience=o.stagnation_patience,
            secant_refine_evals=o.secant_refine_evals,
            cg_variant=o.cg_variant,
            ladder=o.ladder,
            trust_radius=trust_radius,
        )
        # Bounded re-seeded restarts (config.ba_solve_restarts): GSL's
        # stagnation test is routinely premature in the cubic spline's
        # curved valleys; a fresh full-scale bracket from the optimum
        # keeps moving, and costs ~1 line search when truly converged.
        for _ in range(restarts):
            res2 = optim.minimize_fr_cg(
                vg, res.x, f_fn=f,
                max_line_searches=o.max_line_searches,
                initial_step=o.initial_step,
                line_search_tol=o.line_search_tol,
                grad_tol=o.grad_tol,
                fun_tol=o.fun_tol,
                max_fevals_per_linesearch=o.max_fevals_per_linesearch,
                stagnation_patience=o.stagnation_patience,
                secant_refine_evals=o.secant_refine_evals,
                cg_variant=o.cg_variant,
                ladder=o.ladder,
                trust_radius=trust_radius,
            )
            res = optim.CGResult(x=res2.x, fun=res2.fun,
                                 iters=res.iters + res2.iters,
                                 status=res2.status, f0=res.f0)
        drotv = res.x.reshape(K, 3)
        knots_new = spline.apply_masked_increments(knots, drotv, free_mask)
        # IL at the optimum feeds the global-map update (updateIG uses the
        # last evaluation's IL_old, pose_graph_optimizer.cpp:303); the
        # old/new split runs once here, outside the optimization loop.
        il_old, il_new = warp_pano.pano_il_split(drotv, win, pano, order,
                                                 precision)
        ig_new, upd_new = _map_epilogue(
            ig_prime, update_times, il_old, knots_new, fov_times,
            t0, dt_knots, pano, order, lut_dev, max_up,
        )
        stats = jnp.stack([
            res.f0, res.fun, res.iters.astype(jnp.float32), alpha,
            jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0),
        ])
        # One packed host-bound array (knots + stats): a single readback
        # round trip per window; the maps stay device-resident.
        packed = jnp.concatenate([knots_new.reshape(-1), stats])
        return packed, ig_new, upd_new

    return solve


@functools.lru_cache(maxsize=None)
def _build_crop_solver(pano, order: int, blur_sigma: float, measure: int,
                       o, max_up: int, Hc: int, Wc: int, cam_width: int,
                       precision: str = "highest",
                       trust_radius: float | None = None,
                       K: int = 0, F: int = 0, restarts: int = 0):
    """FOV-crop window solver (module-memoized like _build_window_solver):
    identical protocol but every objective evaluation runs at crop scale.
    Shares the fused small-argument layout with the full-pano solver, so a
    crop-escape re-solve reuses the SAME uploaded arrays."""
    H, W = pano.height, pano.width

    @jax.jit
    def solve(evd, smalls, ig_prime, update_times, lut_dev):
        (batch_times, knots, free_mask, fov_times, crop_ints, prior_lam,
         t0, dt_knots) = _unpack_smalls(smalls, K, F)
        win0 = _unpack_window(evd, batch_times, knots, free_mask, t0,
                              dt_knots, ig_prime, lut_dev, cam_width)
        win, x0f, y0f, a_crop, mask, out_s1, out_s2 = (
            warp_pano.crop_window_constants(
                win0, pano, order, blur_sigma, measure, (Hc, Wc), crop_ints,
                precision,
            )
        )
        f, vg = warp_pano.make_crop_objective(
            win, pano, order, blur_sigma, measure, (Hc, Wc),
            x0f, y0f, a_crop, mask, out_s1, out_s2, precision,
        )
        f, vg = _with_prior(f, vg, prior_lam)
        res = optim.minimize_fr_cg(
            vg, jnp.zeros(3 * K, jnp.float32), f_fn=f,
            max_line_searches=o.max_line_searches,
            initial_step=o.initial_step,
            line_search_tol=o.line_search_tol,
            grad_tol=o.grad_tol,
            fun_tol=o.fun_tol,
            max_fevals_per_linesearch=o.max_fevals_per_linesearch,
            stagnation_patience=o.stagnation_patience,
            secant_refine_evals=o.secant_refine_evals,
            cg_variant=o.cg_variant,
            ladder=o.ladder,
            trust_radius=trust_radius,
        )
        # Bounded re-seeded restarts (config.ba_solve_restarts): GSL's
        # stagnation test is routinely premature in the cubic spline's
        # curved valleys; a fresh full-scale bracket from the optimum
        # keeps moving, and costs ~1 line search when truly converged.
        for _ in range(restarts):
            res2 = optim.minimize_fr_cg(
                vg, res.x, f_fn=f,
                max_line_searches=o.max_line_searches,
                initial_step=o.initial_step,
                line_search_tol=o.line_search_tol,
                grad_tol=o.grad_tol,
                fun_tol=o.fun_tol,
                max_fevals_per_linesearch=o.max_fevals_per_linesearch,
                stagnation_patience=o.stagnation_patience,
                secant_refine_evals=o.secant_refine_evals,
                cg_variant=o.cg_variant,
                ladder=o.ladder,
                trust_radius=trust_radius,
            )
            res = optim.CGResult(x=res2.x, fun=res2.fun,
                                 iters=res.iters + res2.iters,
                                 status=res2.status, f0=res.f0)
        drotv = res.x.reshape(K, 3)
        knots_new = spline.apply_masked_increments(knots, drotv, free_mask)
        # Old/new split at the optimum, on the crop, scattered back into
        # full-pano frames for updateIG; plus the optimum's bounding box
        # for the host-side escape check.
        px, py = warp_pano.warp_to_pano(drotv, win, pano, order)
        valid = win.weights > 0
        inf = jnp.asarray(jnp.inf, px.dtype)
        bbox_opt = jnp.stack([
            jnp.min(jnp.where(valid, px, inf)),
            jnp.max(jnp.where(valid, px, -inf)),
            jnp.min(jnp.where(valid, py, inf)),
            jnp.max(jnp.where(valid, py, -inf)),
        ])
        from .ops.scatter import bilinear_accumulate_two

        ilo_c, _ = bilinear_accumulate_two(
            px - x0f, py - y0f, win.weights, ~win.is_old,
            height=Hc, width=Wc,
        )
        il_old = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W), jnp.float32), ilo_c,
            (crop_ints[0], crop_ints[1]),
        )
        ig_new, upd_new = _map_epilogue(
            ig_prime, update_times, il_old, knots_new, fov_times,
            t0, dt_knots, pano, order, lut_dev, max_up,
        )
        stats = jnp.concatenate([
            jnp.stack([res.f0, res.fun, res.iters.astype(jnp.float32),
                       win.alpha]),
            bbox_opt,
        ])
        packed = jnp.concatenate([knots_new.reshape(-1), stats])
        return packed, ig_new, upd_new

    return solve


@dataclass
class WindowResult:
    index: int
    t_beg: float
    t_end: float
    num_events: int
    ran_ba: bool
    initial_cost: float
    final_cost: float
    iters: int
    # True when the BA correction was rejected by the
    # max_ba_correction_rad trust region (degenerate window; the
    # FE-integrated knots were kept and the map was not updated).
    rejected: bool = False


class Backend:
    def __init__(
        self,
        cam_width: int,
        cam_height: int,
        lut: np.ndarray,
        cfg: BackendConfig,
        store: EventStore,
        frontend_sample_rate: int = 1,
        metrics: Optional[Metrics] = None,
        device=None,
    ):
        self.cfg = cfg
        self.store = store
        self.metrics = metrics if metrics is not None else Metrics()
        # Optional device pinning: run ALL back-end programs (window solves,
        # map state) on their own chip so the bundle adjustment overlaps the
        # front-end's packet solves in hardware — the TPU-native analog of
        # the reference's dedicated worker thread (src/cmax_slam.cpp:92).
        self.device = device
        self.lut = np.asarray(lut, np.float32)
        with self._on_device():
            self.lut_dev = jnp.asarray(self.lut)
        if cam_width > 0xFFF or cam_height > 0xFFF:
            # The window event upload bit-packs x/y into 12 bits each
            # (_window_arrays); every event-camera sensor is far below this.
            raise ValueError(
                f"sensor {cam_width}x{cam_height} exceeds the 4095-pixel "
                "bit-packed event upload limit")
        self.cam_width = cam_width
        self.cam_height = cam_height

        m = cfg.pano_map
        self.pano = EquirectCamera(width=m.pano_width, height=m.pano_height)
        self.order = 4 if cfg.trajectory.spline_degree == 3 else 2
        self.degree = self.order - 1

        # Global map state (event_pano_warper.cpp:21-28). DEVICE-resident:
        # the per-window updates (IG absorption, FOV update counts) run
        # inside the window-solve program, so the multi-megabyte maps never
        # cross the host-device boundary during streaming.
        with self._on_device():
            self.IG = jnp.zeros((m.pano_height, m.pano_width), jnp.float32)
            self.update_times = jnp.zeros(
                (m.pano_height, m.pano_width), jnp.int32
            )

        # Sliding-window cursors
        sw = cfg.sliding_window
        self.win_size = sw.time_window_size
        self.win_stride = sw.sliding_window_stride
        self.cp_stride = int(round(sw.sliding_window_stride / cfg.trajectory.dt_knots))
        self.count_window = 0
        self.initialized = False
        self.first_window = True
        self.idx_cp_opt_beg = 0

        # minimum events per window to run BA (pose_graph_optimizer.cpp:65-67)
        self.min_events_per_win = int(
            sw.time_window_size
            * m.backend_min_ev_rate
            / (cfg.warp.event_sample_rate * frontend_sample_rate)
        )

        # ang-vel inbox from the front-end (frontend_ang_vel_ map)
        self._av_times: List[float] = []
        self._av_vals: List[np.ndarray] = []
        self._av_prev: Optional[Tuple[float, np.ndarray]] = None
        # In-flight window solve awaiting its readback (see step()/flush()).
        # The readback happens on the MAIN thread, fused with the stride's
        # ang-vel finalize into ONE device_get RPC (_fused_fetch): round-3
        # profiling showed a background-thread np.asarray resolving ~5x
        # slower (~140 ms) than a main-thread fetch of the same completed
        # result (~26 ms) when the main thread keeps dispatching.
        self._pending_win: Optional[dict] = None
        # Batch-finalizer for in-flight front-end estimates in the ang-vel
        # inbox (set by system.CMaxSLAM to frontend.finalize_batch).
        self.finalize_fn = None

        self.traj: Optional[spline.Trajectory] = None
        self.pose_latest: Optional[Tuple[float, np.ndarray]] = None
        self.results: List[WindowResult] = []
        self.trajectory_log: List[Tuple[float, np.ndarray]] = []
        # Optional clamp on prefix retirement: absolute index the front-end
        # still needs (deleteOldEvents' min(), ang_vel_estimator.cpp:149-152).
        self.retain_from_fn = None

        # Bounded re-seeded BA restarts (None = auto: cubic only).
        self._ba_restarts = (
            cfg.ba_solve_restarts if cfg.ba_solve_restarts is not None
            else (1 if self.order == 4 else 0)
        )
        # static window-knot count: round(win/dt) + degree
        self.K_win = int(round(self.win_size / cfg.trajectory.dt_knots)) + self.degree
        # static FOV-grid length (setUpdateTimesIG's dt_check count); part
        # of the fused small-argument layout (_unpack_smalls)
        self._fov_count = max(1, int(math.ceil(self.win_stride / 0.05 - 1e-9)))
        self._crop_shapes: set = set()  # (Hc, Wc) of compiled crop solvers
        # Quadratic prior weight toward the incoming knots (runtime scalar
        # in the solver programs): 0 online; refine_pass raises it to
        # cfg.refine_prior_lambda for the duration of the sweep.
        self._prior_lam = 0.0
        # One-time online bootstrap re-solve (config.bootstrap_resolve_window):
        # while pending, _get_event_subset retires no prefix so the tracked
        # span stays available; step() fires the re-solve at the target index.
        self._bootstrap_pending = cfg.bootstrap_resolve_window
        self.bootstrap_results: List[WindowResult] = []

    def _on_device(self):
        """Context manager pinning jax dispatches to this back-end's device
        (no-op when unpinned)."""
        import contextlib

        if self.device is None:
            return contextlib.nullcontext()
        return jax.default_device(self.device)

    # ------------------------------------------------------------------
    # Front-end interface (pushAngVel, pose_graph_optimizer.cpp:73-110)
    # ------------------------------------------------------------------
    def push_ang_vel(self, t: float, omega) -> None:
        """Accepts a (3,) host array OR a frontend.AngVelEstimate whose
        device results are still in flight — only the timestamp is needed
        now; values materialize (batched via finalize_fn) at window time."""
        if not self.initialized:
            self.t_win_beg = t
            self.t_win_end = t + self.win_size
            self.t_av_beg = self.t_win_beg
            self.t_av_end = self.t_win_end
            self.traj = spline.Trajectory(
                self.t_win_beg, self.cfg.trajectory.dt_knots, self.order
            )
            self._av_prev = (t, self._av_value(omega))
            theta = math.radians(self.cfg.pano_map.y_angle_deg)
            q0 = np.array(
                [math.cos(theta / 2.0), 0.0, math.sin(theta / 2.0), 0.0]
            )  # rotation about +Y
            self.pose_latest = (t, q0)
            self.initialized = True
        self._av_times.append(float(t))
        self._av_vals.append(omega)

    def _av_value(self, omega) -> np.ndarray:
        """Materialize one inbox entry (estimate or plain array)."""
        est = getattr(omega, "packed", None)
        if est is not None and self.finalize_fn is not None:
            self.finalize_fn([omega])
        if hasattr(omega, "omega"):
            return np.asarray(omega.omega, np.float64)
        return np.asarray(omega, np.float64)

    def ready(self) -> bool:
        """isReadyFrontendPoses (pose_graph_optimizer.cpp:112-129).

        The reference's second condition — a non-empty event-subset map
        (:118) — is the shared EventStore holding events past the window
        end; events always precede their packet's angular velocity in our
        single ingest path, but the check is kept explicit so the invariant
        holds even if ang-vels are pushed out-of-band (e.g. replayed from a
        checkpointed log)."""
        return (
            self.initialized
            and len(self._av_times) > 0
            and self._av_times[-1] > self.t_win_end
            and self.store.total > 0
            and self.store.latest_time() >= self.t_win_end
        )

    def step(self) -> List[WindowResult]:
        """One Run-loop iteration (pose_graph_optimizer.cpp:356-376).

        Completes the previous window's in-flight solve (its device program
        ran while the host streamed the last stride), then dispatches this
        window's. Returns every window COMPLETED during this call — usually
        one, but a BA-skipped current window can complete together with the
        previous window's in-flight solve."""
        if not self.ready():
            return []
        self._fused_fetch()
        done = self._complete_pending()
        if (self._bootstrap_pending is not None
                and self.count_window >= self._bootstrap_pending):
            self._run_bootstrap_resolve()
        ev = self._get_event_subset(self.t_win_beg, self.t_win_end)
        av = self._get_ang_vel_subset(self.t_av_beg, self.t_av_end)
        res = self._process_time_window(ev, av)
        self._slide_window()
        return [r for r in (done, res) if r is not None]

    def run(self) -> List[WindowResult]:
        out = []
        while self.ready():
            out.extend(self.step())
        tail = self.flush()
        if tail is not None:
            out.append(tail)
        return out

    # ------------------------------------------------------------------
    def _get_event_subset(self, t_beg: float, t_end: float):
        """Window slice of the shared store + prefix retirement
        (getEventSubset, pose_graph_optimizer.cpp:131-165)."""
        a = self.store.searchsorted_time(t_beg, side="left")
        b = self.store.searchsorted_time(t_end - 1e-6, side="right")
        xs, ys, ts, ps = self.store.slice_abs(a, b)
        out = (xs.copy(), ys.copy(), ts.copy(), ps.copy())
        if self._bootstrap_pending is not None:
            # Retain the full tracked span for the one-time bootstrap
            # re-solve (bounded: bootstrap_resolve_window strides of events).
            return out
        drop_to = a
        if self.retain_from_fn is not None:
            drop_to = min(drop_to, self.retain_from_fn())
        self.store.drop_before(drop_to)
        return out

    def _get_ang_vel_subset(self, t_beg: float, t_end: float):
        """(getAngVelSubset, pose_graph_optimizer.cpp:167-189): consume
        ang-vels in (t_beg, t_end); erase everything up to t_end. In-flight
        front-end estimates materialize here, batched (one readback)."""
        times = np.asarray(self._av_times)
        lo = int(np.searchsorted(times, t_beg, side="right"))
        hi = int(np.searchsorted(times, t_end, side="left"))
        if self.finalize_fn is not None:
            pend = [v for v in self._av_vals[lo:hi]
                    if getattr(v, "packed", None) is not None]
            if pend:
                self.finalize_fn(pend)
        sub = [(self._av_times[i], self._av_value(self._av_vals[i]))
               for i in range(lo, hi)]
        self._av_times = self._av_times[hi:]
        self._av_vals = self._av_vals[hi:]
        return sub

    def _integrate_ang_vel(self, av_subset):
        """Trapezoidal integration into absolute poses with post-multiplied
        exponentials (integrateAngVel, pose_graph_optimizer.cpp:191-222)."""
        t_curr, q_curr = self.pose_latest
        t_prev, w_prev = self._av_prev
        times, quats = [], []
        for t, w in av_subset:
            if t <= t_prev and not self.first_window:
                continue  # out-of-order guard (:199-202)
            dt = t - t_curr
            drotv = dt * 0.5 * (w_prev + w)
            q_curr = _np_mul(q_curr, _np_exp(drotv))
            t_curr = t
            times.append(t)
            quats.append(q_curr)
            t_prev, w_prev = t, w
        self._av_prev = (t_prev, w_prev)
        return np.asarray(times), (np.stack(quats) if quats else np.zeros((0, 4)))

    # ------------------------------------------------------------------
    def _process_time_window(self, ev, av_subset) -> WindowResult:
        """processTimeWindow (pose_graph_optimizer.cpp:244-323)."""
        cfg = self.cfg
        pose_times, pose_quats = self._integrate_ang_vel(av_subset)

        # Fit + append new control poses over the fresh ang-vel span.
        if len(pose_times) >= 2:
            num_cps = (
                int(round((self.t_av_end - self.t_av_beg) / cfg.trajectory.dt_knots))
                + self.degree
            )
            if len(pose_times) >= num_cps:
                new_cps = spline.fit_ctrl_poses(
                    pose_times, pose_quats, self.t_av_beg,
                    cfg.trajectory.dt_knots, num_cps, self.order,
                )
            else:
                # Degenerate: too few ang-vels; hold the last pose.
                new_cps = np.tile(self.pose_latest[1], (num_cps, 1))
            if self.first_window:
                # Freeze the trajectory start to pin the gauge. The
                # reference freezes `degree` knots; the default here frees
                # all but one (config.first_window_frozen_knots rationale).
                nfz = cfg.first_window_frozen_knots
                self.idx_cp_opt_beg = self.degree if nfz is None else int(nfz)
                self.first_window = False
            else:
                new_cps = new_cps[self.degree:]
            self.traj.push_ctrl_poses(new_cps)

        idx_cp_traj_beg = self.count_window * self.cp_stride
        self.idx_cp_opt_beg = max(idx_cp_traj_beg, self.idx_cp_opt_beg)
        num_fixed = self.idx_cp_opt_beg - idx_cp_traj_beg

        xs, ys, ts, _ = ev
        n_raw = len(ts)
        ran_ba = n_raw > self.min_events_per_win and self.traj.size > idx_cp_traj_beg

        meta = dict(
            index=self.count_window, t_beg=self.t_win_beg,
            t_end=self.t_win_end, num_events=n_raw, ran_ba=ran_ba,
            t_eval=self.t_win_end - 1e-6,
        )
        if ran_ba:
            # DISPATCH the window solve; the readback + write-back happen in
            # _complete_pending at the start of the next step (the analog of
            # the reference's back-end worker thread running concurrently
            # with the front-end callback thread, src/cmax_slam.cpp:92 — the
            # device crunches this window while the host streams the next
            # stride of packets).
            with self.metrics.timer("backend.solve"):
                pend = self._dispatch_window_solve(
                    xs, ys, ts, idx_cp_traj_beg, num_fixed
                )
            pend.update(meta)
            self._pending_win = pend
            self.metrics.count("backend.events", n_raw)
            return None
        return self._finish_window(meta, 0.0, 0.0, 0)

    def _finish_window(self, meta, initial_cost, final_cost, iters,
                       rejected: bool = False):
        """Pose-latest update + result bookkeeping for a completed window
        (pose_graph_optimizer.cpp:316-323)."""
        t_eval = meta["t_eval"]
        if self.traj.size >= self.order:
            q = self.traj.evaluate(min(t_eval, self.traj.max_time() - 1e-9))[0]
            self.pose_latest = (t_eval, q)
            self.trajectory_log.append((t_eval, q))

        res = WindowResult(
            index=meta["index"],
            t_beg=meta["t_beg"],
            t_end=meta["t_end"],
            num_events=meta["num_events"],
            ran_ba=meta["ran_ba"],
            initial_cost=initial_cost,
            final_cost=final_cost,
            iters=iters,
            rejected=rejected,
        )
        self.results.append(res)
        logger.info(
            "[back-end] window %d [%.3f, %.3f) n=%d ba=%s cost=%.5f iters=%d",
            res.index, res.t_beg, res.t_end, res.num_events, res.ran_ba,
            final_cost, iters,
        )
        return res

    def _fused_fetch(self) -> None:
        """ONE device->host RPC per stride: the in-flight window's packed
        result + every pending ang-vel estimate the upcoming window will
        integrate, fetched together through frontend.finalize_batch.

        On the remote-TPU tunnel each blocking readback RPC costs ~25-30 ms
        regardless of size; the stride loop's realtime budget is set by RPC
        COUNT. (An eager device-side concat instead of the list-fetch was
        measured slower in round 2 — it enqueues at the FIFO tail.)"""
        p = self._pending_win
        handles = [p["packed"]] if p is not None else []
        pend_avs = []
        if self.finalize_fn is not None:
            times = np.asarray(self._av_times)
            lo = int(np.searchsorted(times, self.t_av_beg, side="right"))
            hi = int(np.searchsorted(times, self.t_av_end, side="left"))
            pend_avs = [v for v in self._av_vals[lo:hi]
                        if getattr(v, "packed", None) is not None]
        if not handles and not pend_avs:
            return
        with self.metrics.timer("backend.fetch"):
            if self.finalize_fn is not None:
                extras = self.finalize_fn(pend_avs, extra_handles=handles)
            else:
                import jax as _jax

                extras = _jax.device_get(handles)
        if p is not None:
            p["fetched"] = extras[0]

    def _complete_pending(self) -> Optional[WindowResult]:
        """Finish the in-flight window solve: packed readback (already on
        host if _fused_fetch ran), knot write-back (+ full-pano re-solve if
        the optimum escaped its crop), map-state promotion, then the usual
        window bookkeeping."""
        p = self._pending_win
        if p is None:
            return None
        self._pending_win = None
        with self.metrics.timer("backend.fetch"):
            initial, final, iters, rejected = self._finish_solve(p)
        return self._finish_window(p, initial, final, iters, rejected)

    def flush(self) -> Optional[WindowResult]:
        """Join the asynchronous back-end: complete any in-flight window.
        Call before reading results/trajectory/maps mid-stream (the final
        state accessors on CMaxSLAM flush automatically)."""
        return self._complete_pending()

    def close(self) -> Optional[WindowResult]:
        """Flush any in-flight window. Kept as the retire-an-instance entry
        point (segment-per-device replay closes each system); the back-end
        holds no background threads since the fused main-thread fetch."""
        return self.flush()

    # ------------------------------------------------------------------
    def _run_bootstrap_resolve(self) -> None:
        """One-time online bootstrap re-solve (config.bootstrap_resolve_window).

        Fires once the window counter reaches the configured index: re-runs
        the sliding-window BA over every COMPLETED window (events retained
        in the shared store since t0) against the global map accumulated so
        far, then retires the held prefix and resumes streaming. Causal —
        uses only events already consumed — so the trajectory stays a valid
        online estimate; it undoes the cold-start error the first windows
        bake into the early knots while the map is still nearly empty."""
        self._bootstrap_pending = None
        t0 = self.traj.t_beg
        t_stop = self.t_win_end - self.win_stride  # last completed window end
        a = self.store.searchsorted_time(t0, side="left")
        b = self.store.searchsorted_time(t_stop - 1e-6, side="right")
        xs, ys, ts, _ = self.store.slice_abs(a, b)
        # prior_lam=0: the online bootstrap must match the scalar oracle's
        # bootstrap mirror and the documented semantics (refine_prior_lambda
        # applies ONLY to offline refine sweeps).
        self.bootstrap_results = self.refine_pass(
            (xs.copy(), ys.copy(), ts.copy()), t_stop=t_stop, prior_lam=0.0
        )
        # The early trajectory_log entries predate the re-solve.
        self.trajectory_log = [
            (t, self.traj.evaluate(t)[0]) if t <= t_stop else (t, q)
            for (t, q) in self.trajectory_log
        ]
        # Retire the prefix normal streaming would have dropped by now.
        drop_to = self.store.searchsorted_time(self.t_win_beg, side="left")
        if self.retain_from_fn is not None:
            drop_to = min(drop_to, self.retain_from_fn())
        self.store.drop_before(drop_to)
        logger.info(
            "[back-end] bootstrap re-solve: %d windows over [%.3f, %.3f)",
            len(self.bootstrap_results), t0, t_stop,
        )

    # ------------------------------------------------------------------
    # Offline refinement sweep (beyond the reference)
    # ------------------------------------------------------------------
    def refine_pass(self, source, t_stop: Optional[float] = None,
                    prior_lam: Optional[float] = None) -> List[WindowResult]:
        """One additional sliding-window BA sweep over an already-tracked
        stream, starting from the online trajectory and the online global
        map.

        The online pass bootstraps its map from nothing, so the first
        windows optimize against a nearly-empty IG and their error is baked
        into the early knots (the same cold-start transient the reference
        has — its first window freezes `degree` knots of an FE-integrated
        guess, pose_graph_optimizer.cpp:283-288, and never revisits them).
        Re-running the window solves with the FULL pass-1 map as IL_old
        anchors every window — including the first — against the same
        globally-consistent panorama, and re-absorbs each window's events
        at their refined alignment (progressively sharpening IG).

        `source` is either a tuple of event arrays ``(xs, ys, ts[, ps])``
        or an iterable of such chunk tuples (bounded memory: the rolling
        buffer holds ~one window). Events must be the same stream the
        online pass consumed (the CLI re-opens its reader; tests pass the
        arrays). Returns the refined per-window results; the online
        ``results``/``trajectory_log`` are left untouched.

        ``t_stop``: only re-solve windows that END at or before this time —
        the online bootstrap re-solve uses it to leave the stream head
        (whose windows are still collecting events) untouched.

        ``prior_lam``: quadratic-prior weight toward the incoming knots for
        this sweep (defaults to ``cfg.refine_prior_lambda``; the online
        bootstrap re-solve forces 0 so it matches the oracle's bootstrap).
        """
        if self.traj is None or self.traj.size < self.order:
            raise ValueError("refine_pass needs a tracked trajectory; "
                             "run the stream through the system first")
        self.flush()
        saved = (self.t_win_beg, self.t_win_end, self.t_av_beg,
                 self.t_av_end, self.count_window, self.idx_cp_opt_beg,
                 self.first_window, self._prior_lam)
        self._prior_lam = float(
            self.cfg.refine_prior_lambda if prior_lam is None else prior_lam
        )
        if isinstance(source, tuple):
            chunks = iter([source])
        else:
            chunks = iter(source)

        # No gauge freeze in refine: the pass-1 global map anchors every
        # window (including the first) absolutely, and freeing knot 0 lets
        # the solve undo online cold-start error baked into the trajectory
        # origin (measured: linear e2e start error 0.375 -> 0.117 deg,
        # refined RMS 0.090 -> 0.067).
        t0 = self.traj.t_beg
        t_traj_end = self.traj.max_time()
        results: List[WindowResult] = []
        bufs = [np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.float64)]
        drained = False
        try:
            self.count_window = 0
            self.t_win_beg, self.t_win_end = t0, t0 + self.win_size
            while self.t_win_beg < t_traj_end - 1e-9 and (
                t_stop is None or self.t_win_end <= t_stop + 1e-9
            ):
                # Grow the rolling buffer until it covers this window.
                while not drained and (
                    len(bufs[2]) == 0 or bufs[2][-1] < self.t_win_end
                ):
                    try:
                        ch = next(chunks)
                    except StopIteration:
                        drained = True
                        break
                    bufs[0] = np.concatenate([bufs[0], np.asarray(ch[0], np.int32)])
                    bufs[1] = np.concatenate([bufs[1], np.asarray(ch[1], np.int32)])
                    bufs[2] = np.concatenate([bufs[2], np.asarray(ch[2], np.float64)])
                ts_b = bufs[2]
                if drained and (len(ts_b) == 0 or ts_b[-1] < self.t_win_beg):
                    break
                # Events past the spline domain cannot be warped (their
                # segment clamps to the last knots) — clamp the window's
                # event span to the trajectory, and skip a tail window
                # whose usable span is mostly missing: re-solving weakly
                # observed trailing knots degrades the FE-fitted tail
                # (measured +0.26 deg on the linear e2e stream).
                t_hi = min(self.t_win_end, t_traj_end)
                if t_hi - self.t_win_beg < 0.7 * self.win_size:
                    break
                a = int(np.searchsorted(ts_b, self.t_win_beg, side="left"))
                b = int(np.searchsorted(ts_b, t_hi - 1e-6, side="right"))
                idx_beg = self.count_window * self.cp_stride
                n_raw = b - a
                ran_ba = (n_raw > self.min_events_per_win
                          and self.traj.size > idx_beg)
                meta = dict(index=self.count_window, t_beg=self.t_win_beg,
                            t_end=self.t_win_end, num_events=n_raw,
                            ran_ba=ran_ba)
                if ran_ba:
                    num_fixed = 0
                    with self.metrics.timer("backend.refine"):
                        p = self._dispatch_window_solve(
                            bufs[0][a:b], bufs[1][a:b], ts_b[a:b],
                            idx_beg, num_fixed,
                        )
                        p.update(meta)
                        initial, final, iters, rejected = (
                            self._finish_solve(p)
                        )
                else:
                    initial = final = 0.0
                    iters = 0
                    rejected = False
                results.append(WindowResult(
                    index=meta["index"], t_beg=meta["t_beg"],
                    t_end=meta["t_end"], num_events=n_raw, ran_ba=ran_ba,
                    initial_cost=initial, final_cost=final, iters=iters,
                    rejected=rejected,
                ))
                logger.info(
                    "[back-end] refine window %d [%.3f, %.3f) n=%d ba=%s "
                    "cost=%.5f iters=%d", meta["index"], meta["t_beg"],
                    meta["t_end"], n_raw, ran_ba, final, iters,
                )
                # Retire the buffer prefix the next window can't need.
                keep = int(np.searchsorted(ts_b, self.t_win_beg
                                           + self.win_stride, side="left"))
                if keep > 0:
                    bufs = [x[keep:] for x in bufs]
                self.count_window += 1
                self.t_win_beg += self.win_stride
                self.t_win_end += self.win_stride
        finally:
            (self.t_win_beg, self.t_win_end, self.t_av_beg, self.t_av_end,
             self.count_window, self.idx_cp_opt_beg,
             self.first_window, self._prior_lam) = saved
        self.metrics.count("backend.refine_windows", len(results))
        return results

    # ------------------------------------------------------------------
    def _window_arrays(self, xs, ys, ts, idx_cp_traj_beg):
        """Marshal a window's events into fixed-shape device arrays."""
        cfg = self.cfg
        bs = cfg.warp.event_batch_size
        rate = cfg.warp.event_sample_rate
        n = len(ts)

        # Static bucket: pad event count to bs * {1, 1.5} * 2^k so only a
        # handful of window shapes ever compile while padding waste stays
        # under 33% (pure powers of two waste up to 50% — at a typical
        # 60k-event window that is a quarter of the whole solve cost).
        need = min(n, cfg.max_events_per_window)
        size = bs
        while size < need:
            if size * 3 // 2 >= need and (size // bs) % 2 == 0:
                size = size * 3 // 2
                break
            size *= 2
        size = min(size, ((cfg.max_events_per_window + bs - 1) // bs) * bs)
        n_use = min(n, size)
        if n_use < n:
            # Never truncate silently: a dense window (poster_rotation-scale
            # bursts) losing votes must be visible in stats.json/logs.
            self.metrics.count("backend.events_dropped", n - n_use)
            logger.warning(
                "[back-end] window %d: %d of %d events dropped by "
                "max_events_per_window=%d (raise cfg.backend."
                "max_events_per_window to keep them)",
                self.count_window, n - n_use, n, cfg.max_events_per_window,
            )

        xs_p = np.zeros(size, np.int32)
        ys_p = np.zeros(size, np.int32)
        ts_p = np.zeros(size, np.float64)
        valid = np.zeros(size, bool)
        xs_p[:n_use] = xs[:n_use]
        ys_p[:n_use] = ys[:n_use]
        ts_p[:n_use] = ts[:n_use]
        valid[:n_use] = True

        # Batch midpoint times on the raw stream (event_pano_warper.cpp:238-243)
        B = size // bs
        tsb = ts_p.reshape(B, bs)
        vb = valid.reshape(B, bs)
        t_first = np.where(vb.any(1), np.where(vb, tsb, np.inf).min(1), 0.0)
        t_last = np.where(vb.any(1), np.where(vb, tsb, -np.inf).max(1), 0.0)
        batch_mid = t_first + 0.5 * (t_last - t_first)

        # In-batch decimation (event_pano_warper.cpp:262): keep every
        # rate-th event within each batch.
        if rate > 1:
            keep = (np.arange(size) % bs) % rate == 0
            valid &= keep

        # Old/new split against the next window start (:296-311).
        t_next = self.t_win_beg + self.win_stride
        is_old = ts_p < t_next

        # Times relative to the window sub-spline origin.
        t_knot0 = self.traj.knot_time(idx_cp_traj_beg)
        batch_rel = (batch_mid - t_knot0).astype(np.float32)

        # One bit-packed int32 upload per event (x: bits 0-11, y: 12-23,
        # valid: 24, is_old: 25; decoded in _unpack_window) — 4 B/event on
        # the link vs 16 B for the old (4, N) float32 layout, bit-exact.
        # The (3, N) bearing gather runs on device inside the solver (the
        # host gather + 3x larger transfer used to cost ~15 ms per window).
        evd = (xs_p | (ys_p << 12)
               | (valid.astype(np.int32) << 24)
               | ((is_old & valid).astype(np.int32) << 25))

        return {
            "evd": jnp.asarray(evd),
            "size": size,
            # numpy views for host-side planning (crop bbox) — no dispatch
            "np_xs": xs_p,
            "np_ys": ys_p,
            "np_batch_rel": batch_rel,
            "np_valid": valid,
        }

    def _get_solver(self, size: int, K: int):
        """Jitted window solver (module-memoized: a fresh Backend instance
        reuses already-compiled programs within the process; jit itself
        re-specializes per array shape, so size/K need not key the cache)."""
        return _build_window_solver(
            self.pano, self.order, self.cfg.warp.blur_sigma,
            self.cfg.contrast_measure, self.cfg.optim,
            self.cfg.pano_map.max_update_times, self.cam_width,
            self.cfg.warp.precision, self.cfg.max_ba_correction_rad,
            K, self._fov_count, self._ba_restarts,
        )

    # Crop-dimension ladder: coarse buckets bound the number of compiled
    # solver variants; TPU-friendly (multiples of 128).
    _CROP_LADDER = (128, 256, 384, 512, 640, 768, 1024, 1280, 1536,
                    2048, 2560, 3072, 4096)

    def _crop_halo(self) -> int:
        """h = blur radius (+1 for Sobel stencils), the crop-exactness halo."""
        from .config import IMAGE_GRADIENT_MAGNITUDE_CONTRAST
        from .ops.blur import opencv_ksize

        sigma = self.cfg.warp.blur_sigma
        r = (opencv_ksize(sigma) // 2) if sigma > 0 else 0
        s = 1 if self.cfg.contrast_measure == IMAGE_GRADIENT_MAGNITUDE_CONTRAST else 0
        return r + s

    def _host_bbox(self, np_xs, np_ys, np_batch_rel, np_valid, knots_sub):
        """Zero-increment warp bounding box in pure numpy (crop planning).

        Subsampled for big windows: the pad margin (>= 34 px) dwarfs the
        subsampling error, and the post-solve escape check uses the exact
        device-computed bbox anyway. Bearings are gathered from the LUT for
        the subsample only (the full gather runs on device in the solver)."""
        B = len(np_batch_rel)
        E = len(np_xs) // B
        bstride = max(1, B // 2048)
        q = spline.evaluate_np(
            knots_sub, np_batch_rel[::bstride], 0.0,
            self.cfg.trajectory.dt_knots, self.order,
        )
        R = spline._np_quat_rotmat_batch(q)  # (Bs, 3, 3)
        estride = max(1, E // 16)
        sub2 = np.s_[::bstride, ::estride]
        xs = np_xs.reshape(B, E)[sub2]
        ys = np_ys.reshape(B, E)[sub2]
        valid = np_valid.reshape(B, E)[sub2]
        if not valid.any():
            return None
        idx = ys.astype(np.int64) * self.cam_width + xs.astype(np.int64)
        b = np.moveaxis(self.lut[idx], -1, 0)  # (3, Bs, Es)
        x = R[:, 0, 0, None] * b[0] + R[:, 0, 1, None] * b[1] + R[:, 0, 2, None] * b[2]
        y = R[:, 1, 0, None] * b[0] + R[:, 1, 1, None] * b[1] + R[:, 1, 2, None] * b[2]
        z = R[:, 2, 0, None] * b[0] + R[:, 2, 1, None] * b[1] + R[:, 2, 2, None] * b[2]
        rho = np.sqrt(x * x + y * y + z * z)
        phi = np.arctan2(x, z)
        theta = np.arcsin(np.clip(y / rho, -1.0, 1.0))
        px = self.pano.cx + phi * self.pano.fx
        py = self.pano.cy + theta * self.pano.fy
        return (
            float(px[valid].min()), float(px[valid].max()),
            float(py[valid].min()), float(py[valid].max()),
        )

    def _plan_crop(self, arrays, knots_sub):
        """Host-side crop geometry for one window; None -> use the full pano.

        Returns (Hc, Wc, ints, h) with ints = [y0, x0, vy0, vy1, vx0, vx1]
        (v* crop-relative valid-interior bounds; see warp_pano crop notes).
        A footprint spanning (nearly) a full axis — seam crossings, poles —
        degrades to a full-axis band or the full image automatically.
        """
        bbox = self._host_bbox(
            arrays["np_xs"], arrays["np_ys"], arrays["np_batch_rel"],
            arrays["np_valid"], knots_sub,
        )
        if bbox is None or not np.all(np.isfinite(bbox)):
            return None
        pxm, pxM, pym, pyM = bbox
        H, W = self.pano.height, self.pano.width
        h = self._crop_halo()
        # Margin in pixels the optimizer may move warped events (+2 for the
        # 2x2 bilinear footprint), then the 2h exactness halo.
        m = max(32.0, self.cfg.crop_margin_rad * self.pano.fx)
        pad = m + 2 * h + 2

        def bucket(need: float, dim: int) -> int:
            for b in self._CROP_LADDER:
                if b >= need:
                    return min(b, dim)
            return dim

        need_w = (pxM - pxm) + 2 * pad
        need_h = (pyM - pym) + 2 * pad
        # Sticky shapes: reuse an already-compiled crop solver whose shape
        # covers this window's need. Every distinct (Hc, Wc) is a fresh XLA
        # program (tens of seconds to compile, ~2 s even from the persistent
        # cache), and the footprint wobbles across ladder rungs as the camera
        # moves — without stickiness a replay recompiles mid-stream.
        best = None
        for (hc, wc) in self._crop_shapes:
            if hc >= need_h and wc >= need_w and hc * wc < 0.7 * H * W:
                if best is None or hc * wc < best[0] * best[1]:
                    best = (hc, wc)
        if best is not None:
            Hc, Wc = best
        else:
            Wc = bucket(need_w, W)
            Hc = bucket(need_h, H)
            if Hc * Wc >= 0.7 * H * W:
                return None
            self._crop_shapes.add((Hc, Wc))
        x0 = min(max(int(round(0.5 * (pxm + pxM) - Wc / 2)), 0), W - Wc)
        y0 = min(max(int(round(0.5 * (pym + pyM) - Hc / 2)), 0), H - Hc)
        vx0 = h if x0 > 0 else 0
        vx1 = Wc - (h if x0 + Wc < W else 0)
        vy0 = h if y0 > 0 else 0
        vy1 = Hc - (h if y0 + Hc < H else 0)
        ints = np.array([y0, x0, vy0, vy1, vx0, vx1], np.int32)
        return Hc, Wc, ints, h

    def _crop_escaped(self, bbox_opt, ints, Hc: int, Wc: int, h: int) -> bool:
        """True if the optimum's warped events got too close to a non-border
        crop edge for the crop objective to have been exact there."""
        box = np.asarray(bbox_opt, np.float64)
        if not np.all(np.isfinite(box)):
            return True
        pxm, pxM, pym, pyM = (float(v) for v in box)
        y0, x0, vy0, vy1, vx0, vx1 = (int(v) for v in ints)
        ok = True
        if vx0 > 0:
            ok &= pxm - 2 >= x0 + vx0 + h
        if vx1 < Wc:
            ok &= pxM + 2 <= x0 + vx1 - h
        if vy0 > 0:
            ok &= pym - 2 >= y0 + vy0 + h
        if vy1 < Hc:
            ok &= pyM + 2 <= y0 + vy1 - h
        return not ok

    def _get_crop_solver(self, size: int, K: int, Hc: int, Wc: int):
        """Jitted FOV-crop window solver (module-memoized; see
        _build_crop_solver)."""
        return _build_crop_solver(
            self.pano, self.order, self.cfg.warp.blur_sigma,
            self.cfg.contrast_measure, self.cfg.optim,
            self.cfg.pano_map.max_update_times, Hc, Wc, self.cam_width,
            self.cfg.warp.precision, self.cfg.max_ba_correction_rad,
            K, self._fov_count, self._ba_restarts,
        )

    def _dispatch_window_solve(self, xs, ys, ts, idx_cp_traj_beg, num_fixed):
        """Marshal the window and ENQUEUE its solve; no blocking readback.
        Returns the pending-completion record for _finish_solve."""
        with self._on_device():
            return self._dispatch_window_solve_impl(
                xs, ys, ts, idx_cp_traj_beg, num_fixed
            )

    def _dispatch_window_solve_impl(self, xs, ys, ts, idx_cp_traj_beg,
                                    num_fixed):
        arrays = self._window_arrays(xs, ys, ts, idx_cp_traj_beg)
        size = arrays.pop("size")

        # Window sub-trajectory knots, padded to the static K_win.
        K = self.K_win
        sub = self.traj.knots[idx_cp_traj_beg:]
        if len(sub) > K:
            sub = sub[:K]
        pad = K - len(sub)
        n_real = len(sub)
        if pad > 0:
            sub = np.concatenate([sub, np.tile(sub[-1], (pad, 1))], axis=0)
        free = np.zeros(K, np.float32)
        free[num_fixed:n_real] = 1.0

        t_knot0 = self.traj.knot_time(idx_cp_traj_beg)
        fov_rel = self._fov_times_rel(t_knot0, n_real)
        plan = self._plan_crop(arrays, sub) if self.cfg.crop_solver else None
        ints = plan[2] if plan is not None else np.zeros(6, np.int32)
        # ONE fused upload for every small argument (see _unpack_smalls):
        # per-window dispatch cost on a remote-device tunnel is set by RPC
        # count — this plus the evd upload makes exactly two.
        smalls = np.concatenate([
            arrays["np_batch_rel"],
            sub.astype(np.float32).reshape(-1),
            free,
            fov_rel,
            ints.astype(np.float32),
            np.array([self._prior_lam, 0.0, self.cfg.trajectory.dt_knots],
                     np.float32),
        ]).astype(np.float32)
        args = (arrays["evd"], jnp.asarray(smalls), self.IG,
                self.update_times)
        if plan is not None:
            Hc, Wc, _, h = plan
            crop_solve = self._get_crop_solver(size, K, Hc, Wc)
            packed, ig_new, upd_new = crop_solve(*args, self.lut_dev)
        else:
            solve = self._get_solver(size, K)
            packed, ig_new, upd_new = solve(*args, self.lut_dev)
        return dict(
            packed=packed, ig_new=ig_new, upd_new=upd_new, plan=plan,
            args=args, size=size, K=K, n_real=n_real,
            idx_cp_traj_beg=idx_cp_traj_beg, np_knots_sub=sub,
        )

    def _finish_solve(self, p, packed=None
                      ) -> Tuple[float, float, int, bool]:
        """Complete a dispatched window solve given its packed readback
        [4K knots | 8 stats] (fetched here if not already part of a fused
        readback), crop-escape re-solve if needed, then knot write-back
        (incrementalUpdate on the live trajectory,
        global_optim_contrast_gsl.cpp:130) and device-resident map
        promotion. Returns (initial, final, iters, rejected)."""
        K = p["K"]
        if packed is None:
            packed = p.get("fetched")
        if packed is None:
            packed = np.asarray(p["packed"])
        knots_new, stats = packed[: 4 * K].reshape(K, 4), packed[4 * K:]
        ig_new, upd_new = p["ig_new"], p["upd_new"]
        if p["plan"] is not None:
            Hc, Wc, ints, h = p["plan"]
            if self._crop_escaped(stats[4:8], ints, Hc, Wc, h):
                logger.info(
                    "[back-end] window %d: optimum escaped the %dx%d crop; "
                    "re-solving on the full panorama", p["index"], Hc, Wc,
                )
                self.metrics.count("backend.crop_escapes", 1)
                solve = self._get_solver(p["size"], K)
                with self._on_device():
                    packed, ig_new, upd_new = solve(*p["args"], self.lut_dev)
                packed = np.asarray(packed)
                knots_new, stats = (packed[: 4 * K].reshape(K, 4),
                                    packed[4 * K:])
            else:
                self.metrics.count("backend.crop_windows", 1)

        cap = self.cfg.max_ba_correction_rad
        if cap is not None:
            # Degenerate-landscape guard (pairs with the in-solve trust
            # stop, ops/optim._within_trust): a correction that moved any
            # knot past the cap is a wandering solve on a weakly-textured
            # window, not a refinement — keep the FE-integrated knots and
            # do NOT absorb this window's (misaligned) votes into the map.
            q0 = p["np_knots_sub"][: p["n_real"]].astype(np.float64)
            q1 = knots_new.astype(np.float64)[: p["n_real"]]
            dots = np.abs(np.sum(q0 * q1, axis=1))
            max_ang = 2.0 * np.arccos(np.clip(dots, -1.0, 1.0)).max()
            if max_ang > cap:
                logger.warning(
                    "[back-end] window %d: BA correction %.2f deg exceeds "
                    "max_ba_correction_rad (%.2f deg) — rejected "
                    "(weakly-constrained window; keeping front-end "
                    "trajectory)", p.get("index", -1),
                    math.degrees(max_ang), math.degrees(cap),
                )
                self.metrics.count("backend.ba_rejected", 1)
                return float(stats[0]), float(stats[1]), int(stats[2]), True

        idx = p["idx_cp_traj_beg"]
        self.traj.knots[idx : idx + p["n_real"]] = (
            knots_new.astype(np.float64)[: p["n_real"]]
        )
        self.IG = ig_new
        self.update_times = upd_new
        return float(stats[0]), float(stats[1]), int(stats[2]), False

    def _fov_times_rel(self, t_knot0: float, n_real: int,
                       dt_check: float = 0.05) -> np.ndarray:
        """setUpdateTimesIG's dt_check grid across the consumed stride
        (pose_graph_optimizer.cpp:325-337), clamped to the evaluable span and
        shifted to the window sub-spline clock. Length depends only on the
        configured stride, so the solver signature stays static."""
        count = max(1, int(math.ceil(self.win_stride / dt_check - 1e-9)))
        times = self.t_win_beg + dt_check * np.arange(count)
        t_max = min(
            self.traj.max_time() - 1e-9,
            t_knot0 + (n_real - self.order + 1) * self.cfg.trajectory.dt_knots
            - 1e-9,
        )
        return (np.minimum(times, t_max) - t_knot0).astype(np.float32)

    def _slide_window(self):
        """slideWindow (pose_graph_optimizer.cpp:339-354)."""
        self.t_win_beg += self.win_stride
        self.t_av_beg = self.t_win_end
        self.t_win_end += self.win_stride
        self.t_av_end = self.t_win_end
        self.count_window += 1

    # ------------------------------------------------------------------
    def render_map(self) -> np.ndarray:
        """Pano display image (publishEventImage,
        pose_graph_optimizer.cpp:378-413)."""
        from .utils.image import render_pano

        self.flush()

        img = render_pano(np.asarray(self.IG), gamma=self.cfg.gamma, invert=True)
        if self.cfg.draw_fov and self.traj is not None and self.traj.size >= self.order:
            img = np.stack([img] * 3, axis=-1)
            t_plot = min(self.t_win_end - 1e-6, self.traj.max_time() - 1e-9)
            q = self.traj.evaluate(t_plot)[0]
            # Sensor-FOV *outline*: project only the border pixels' bearings
            # (drawSensorFOV, event_pano_warper.cpp:56-79) — not the filled
            # footprint. Host numpy; runs only on visualization requests.
            W, H = self.cam_width, self.cam_height
            border = np.concatenate([
                np.arange(W),                       # y = 0
                (H - 1) * W + np.arange(W),         # y = H-1
                np.arange(H) * W,                   # x = 0
                np.arange(H) * W + (W - 1),         # x = W-1
            ])
            rays = self.lut[border] @ spline._np_quat_rotmat(q).T
            rho = np.linalg.norm(rays, axis=-1)
            px = self.pano.cx + np.arctan2(rays[:, 0], rays[:, 2]) * self.pano.fx
            py = self.pano.cy + np.arcsin(np.clip(rays[:, 1] / rho, -1, 1)) * self.pano.fy
            ix = np.clip(np.round(px).astype(int), 0, self.pano.width - 1)
            iy = np.clip(np.round(py).astype(int), 0, self.pano.height - 1)
            img[iy, ix] = np.array([255, 0, 0], np.uint8)
        return img

    def restore(self, d) -> None:
        """Inverse of checkpoint(): resume a run mid-stream.

        Restores the trajectory, global map, window cursors, the
        integrator state (``pose_latest``/``_av_prev``) and the pending
        ang-vel inbox, so the first window processed after resume
        continues the interrupted stream exactly. Tolerates legacy
        checkpoints (pre round-5) that lack the integrator keys by
        reconstructing ``pose_latest`` from the restored spline."""
        knots = np.asarray(d["knots"])
        if len(knots):
            self.traj = spline.Trajectory(
                float(d["traj_t_beg"]), self.cfg.trajectory.dt_knots, self.order
            )
            self.traj.push_ctrl_poses(knots)
        with self._on_device():
            self.IG = jnp.asarray(np.asarray(d["IG"], np.float32))
            self.update_times = jnp.asarray(
                np.asarray(d["update_times"], np.int32)
            )
        self.count_window = int(d["count_window"])
        self.t_win_beg = float(d["t_win_beg"])
        self.t_win_end = float(d["t_win_end"])
        self._pending_win = None
        if "be_initialized" in d:
            self.t_av_beg = float(d["t_av_beg"])
            self.t_av_end = float(d["t_av_end"])
            self.initialized = bool(d["be_initialized"])
            if self.initialized and self.traj is None:
                # Initialized but no window completed yet: the live run had
                # an EMPTY trajectory object (created by the first
                # push_ang_vel); recreate it so the first window can push.
                self.traj = spline.Trajectory(
                    float(d["traj_t_beg"]), self.cfg.trajectory.dt_knots,
                    self.order,
                )
            self.first_window = bool(d["first_window"])
            self.idx_cp_opt_beg = int(d["idx_cp_opt_beg"])
            pl = np.asarray(d["pose_latest"], np.float64)
            self.pose_latest = (float(pl[0]), pl[1:5]) if len(pl) else None
            ap = np.asarray(d["av_prev"], np.float64)
            self._av_prev = (float(ap[0]), ap[1:4]) if len(ap) else None
            self._av_times = [float(t) for t in np.asarray(d["av_inbox_t"])]
            self._av_vals = [w for w in np.asarray(d["av_inbox_w"], np.float64)]
            bp = int(d["bootstrap_pending"])
            self._bootstrap_pending = None if bp < 0 else bp
            tl = np.asarray(d["trajectory_log"], np.float64).reshape(-1, 5)
            self.trajectory_log = [(float(r[0]), r[1:5]) for r in tl]
            return
        # Legacy checkpoint (no integrator state): re-init window-protocol
        # phase from the cursors and rebuild pose_latest/_av_prev from the
        # restored spline so the first _integrate_ang_vel after resume has
        # a valid anchor instead of crashing on None.
        self.t_av_beg = self.t_win_beg
        self.t_av_end = self.t_win_end
        self.initialized = bool(len(knots))
        self.first_window = self.count_window == 0
        if self.initialized and self.traj.size >= self.order:
            t_anchor = min(self.t_win_beg, self.traj.max_time() - 1e-9)
            q = self.traj.evaluate(t_anchor)[0]
            self.pose_latest = (t_anchor, q)
            self._av_prev = (t_anchor, np.zeros(3))

    def checkpoint(self) -> dict:
        """Serializable back-end state (SURVEY.md section 5: the reference has
        no checkpoint/resume; knots + IG + counts are the whole state, plus
        the window-protocol cursors and integrator anchors so a resumed run
        continues the stream exactly)."""
        self.flush()
        if self._av_vals:
            av_w = np.stack([self._av_value(v) for v in self._av_vals])
        else:
            av_w = np.zeros((0, 3))
        tl = (np.array([[t, *q] for t, q in self.trajectory_log])
              if self.trajectory_log else np.zeros((0, 5)))
        return {
            "knots": self.traj.knots if self.traj else np.zeros((0, 4)),
            "traj_t_beg": self.traj.t_beg if self.traj else 0.0,
            "IG": np.asarray(self.IG),
            "update_times": np.asarray(self.update_times),
            "count_window": self.count_window,
            "t_win_beg": getattr(self, "t_win_beg", 0.0),
            "t_win_end": getattr(self, "t_win_end", 0.0),
            "t_av_beg": getattr(self, "t_av_beg", 0.0),
            "t_av_end": getattr(self, "t_av_end", 0.0),
            "be_initialized": self.initialized,
            "first_window": self.first_window,
            "idx_cp_opt_beg": self.idx_cp_opt_beg,
            "pose_latest": (
                np.array([self.pose_latest[0], *self.pose_latest[1]])
                if self.pose_latest is not None else np.zeros(0)
            ),
            "av_prev": (
                np.array([self._av_prev[0], *self._av_prev[1]])
                if self._av_prev is not None else np.zeros(0)
            ),
            "av_inbox_t": np.asarray(self._av_times, np.float64),
            "av_inbox_w": av_w,
            "bootstrap_pending": (
                -1 if self._bootstrap_pending is None
                else int(self._bootstrap_pending)
            ),
            "trajectory_log": tl,
        }
