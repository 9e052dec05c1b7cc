"""Front-end: sliding-window angular-velocity estimation by CMax.

TPU-native rebuild of AngVelEstimator (src/frontend/ang_vel_estimator.cpp,
include/frontend/ang_vel_estimator.h:38-67). The per-event ROS callback state
machine becomes a vectorized host-side packetizer over an EventStore, and
each packet's contrast-maximization solve is ONE jitted device program
(warp -> matmul-vote -> blur -> variance -> FR-CG while_loop), warm-started
from the previous packet's solution.

Packet semantics mirror the reference exactly (ang_vel_estimator.cpp:68-135):
- output timestamps on a rigid grid t_k = t_first + dt_ang_vel/2 + k*dt,
- a packet is *centered* on the first event crossing the subset cursor:
  absolute indices [i+1-half, i+1+half) where half = num_events_per_packet/2,
- the warp reference time is the grid time t_k, not the event midpoint,
- a packet spanning more than 10*dt_ang_vel of wall time yields omega = 0
  (degenerate/still camera guard),
- omega is warm-started from the previous packet.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import FrontendConfig
from .io.devring import DeviceEventRing, _next_pow2
from .io.events import EventStore
from .ops import optim, warp_local
from .ops.contrast import contrast
from .utils.metrics import Metrics, logger


def _ring_packet(idx_ring, ts_ring, beg, nvalid, S: int, cap: int,
                 lut, cam, batch_size: int, t_ref):
    """Assemble one packet by gathering [beg, beg+S) from the device ring.

    Produces bit-identical solver inputs to the host-marshal path: the ring
    stores the same int32 LUT index and float32 epoch-relative time the
    (4, S) upload carried, and padding lanes are masked to the same zeros.
    """
    j = jnp.arange(S, dtype=jnp.int32)
    pos = (beg + j) & (cap - 1)
    idxs = jnp.take(idx_ring, pos)
    tsv = jnp.take(ts_ring, pos)
    valid = j < nvalid
    return warp_local.EventPacket(
        bearings=jnp.take(lut, jnp.where(valid, idxs, 0), axis=0),
        dts=warp_local.batch_midpoint_dts(
            jnp.where(valid, tsv, 0.0), valid, batch_size, t_ref),
        weights=valid.astype(jnp.float32),
    )


@functools.lru_cache(maxsize=None)
def _build_packet_solver(cam, batch_size: int, blur_sigma: float,
                         measure: int, o, coarse_to_fine: bool,
                         precision: str = "highest"):
    """Fused packet-assembly + CMax solve as ONE jitted program.

    Module-memoized so Frontend instances share compiled executables, and
    fused so a packet costs exactly one host->device upload (the packed
    (4, S) event block) plus one program dispatch — eager per-op dispatch
    and per-field uploads each cost a tunnel round trip on remote devices.
    The bearing LUT is a runtime argument (not a baked-in constant)."""

    # The vector ladder vmaps the objective over ladder rungs; the Pallas
    # IWE kernel re-launches per vmap lane, so route votes through the XLA
    # path there (it batches into one MXU contraction and is also the
    # faster single-eval impl at packet size: 30 vs 74 us measured).
    impl = "xla" if o.ladder in ("vector", "grid") else "auto"

    @jax.jit
    def solve(evdata, t_ref, omega0, lut):
        xs, ys, ts, validf = evdata[0], evdata[1], evdata[2], evdata[3]
        valid = validf > 0
        idx = jnp.where(
            valid, ys.astype(jnp.int32) * cam.width + xs.astype(jnp.int32), 0
        )
        packet = warp_local.EventPacket(
            bearings=jnp.take(lut, idx, axis=0),
            dts=warp_local.batch_midpoint_dts(ts, valid, batch_size, t_ref),
            weights=validf,
        )

        def make_f(sigma):
            def f(omega):
                iwe = warp_local.local_iwe(omega, packet, cam, sigma,
                                           precision, impl=impl)
                return -contrast(iwe, measure)
            return f

        def minimize(f, x0, max_ls):
            return optim.minimize_fr_cg(
                jax.value_and_grad(f), x0, f_fn=f,
                max_line_searches=max_ls,
                initial_step=o.initial_step,
                line_search_tol=o.line_search_tol,
                grad_tol=o.grad_tol,
                fun_tol=o.fun_tol,
                max_fevals_per_linesearch=o.max_fevals_per_linesearch,
                stagnation_patience=o.stagnation_patience,
                secant_refine_evals=o.secant_refine_evals,
                ladder=o.ladder,
                cg_variant=o.cg_variant,
            )

        x0 = omega0
        iters_coarse = 0
        if coarse_to_fine:
            coarse = minimize(
                make_f(max(blur_sigma, 1.0) * 3.0), x0,
                o.max_line_searches // 2,
            )
            x0 = coarse.x
            iters_coarse = coarse.iters
        res = minimize(make_f(blur_sigma), x0, o.max_line_searches)
        packed = jnp.concatenate([
            res.x,
            jnp.stack([res.fun,
                       (res.iters + iters_coarse).astype(jnp.float32)]),
        ])
        return res.x, packed

    return solve


@functools.lru_cache(maxsize=None)
def _build_packet_solver_ring(cam, batch_size: int, blur_sigma: float,
                              measure: int, o, coarse_to_fine: bool,
                              precision: str, S: int, cap: int):
    """Ring-sourced variant of _build_packet_solver: the packet is gathered
    on device from the resident event ring (io/devring.py) instead of being
    re-uploaded, so a packet dispatch costs only five scalars on the link."""

    impl = "xla" if o.ladder in ("vector", "grid") else "auto"

    @jax.jit
    def solve(idx_ring, ts_ring, beg, nvalid, t_ref, omega0, lut):
        packet = _ring_packet(idx_ring, ts_ring, beg, nvalid, S, cap,
                              lut, cam, batch_size, t_ref)

        def make_f(sigma):
            def f(omega):
                iwe = warp_local.local_iwe(omega, packet, cam, sigma,
                                           precision, impl=impl)
                return -contrast(iwe, measure)
            return f

        def minimize(f, x0, max_ls):
            return optim.minimize_fr_cg(
                jax.value_and_grad(f), x0, f_fn=f,
                max_line_searches=max_ls,
                initial_step=o.initial_step,
                line_search_tol=o.line_search_tol,
                grad_tol=o.grad_tol,
                fun_tol=o.fun_tol,
                max_fevals_per_linesearch=o.max_fevals_per_linesearch,
                stagnation_patience=o.stagnation_patience,
                secant_refine_evals=o.secant_refine_evals,
                ladder=o.ladder,
                cg_variant=o.cg_variant,
            )

        x0 = omega0
        iters_coarse = 0
        if coarse_to_fine:
            coarse = minimize(make_f(max(blur_sigma, 1.0) * 3.0), x0,
                              o.max_line_searches // 2)
            x0 = coarse.x
            iters_coarse = coarse.iters
        res = minimize(make_f(blur_sigma), x0, o.max_line_searches)
        packed = jnp.concatenate([
            res.x,
            jnp.stack([res.fun,
                       (res.iters + iters_coarse).astype(jnp.float32)]),
        ])
        return res.x, packed

    return solve


@functools.lru_cache(maxsize=None)
def _build_stride_solver(cam, batch_size: int, blur_sigma: float,
                         measure: int, o, coarse_to_fine: bool,
                         precision: str, sweeps: int):
    """All of a stride's packets as ONE jitted program (TPU-native
    scheduling; config knob FrontendConfig.batch_sweeps).

    The reference solves packets strictly sequentially, warm-starting each
    from its predecessor (ang_vel_estimator.cpp:184-189 + member ang_vel_).
    Dispatching each of those ~10 small solves as its own device program
    costs a per-program tunnel/dispatch latency that dominates a realtime
    stride; a vmapped lockstep batch was measured 2.7x SLOWER still (every
    lane pays the slowest lane's iterations times the full line-search
    ladder: 204 ms vs the chain's 77 ms per stride on TPU). This solver is
    the best of both: lax.scan over lanes INSIDE one program — the exact
    sequential warm-start chain (identical numerics to the per-packet
    path, including the degenerate-lane omega reset), one dispatch, and
    each lane runs only its own while_loop trip count. Dead lanes
    (bucket padding / degenerate packets) skip the solve via lax.cond.

    ``sweeps`` is kept in the cache key for config compatibility; any
    value >= 1 selects this exact chain (there is no approximation left
    to iterate on)."""
    del sweeps

    impl = "xla" if o.ladder in ("vector", "grid") else "auto"

    def minimize(f, x0, max_ls):
        return optim.minimize_fr_cg(
            jax.value_and_grad(f), x0, f_fn=f,
            max_line_searches=max_ls,
            initial_step=o.initial_step,
            line_search_tol=o.line_search_tol,
            grad_tol=o.grad_tol,
            fun_tol=o.fun_tol,
            max_fevals_per_linesearch=o.max_fevals_per_linesearch,
            stagnation_patience=o.stagnation_patience,
            secant_refine_evals=o.secant_refine_evals,
            ladder=o.ladder,
            cg_variant=o.cg_variant,
        )

    @jax.jit
    def solve(evP, t_refs, flags, omega0, lut):
        """evP: (P, 4, S); t_refs: (P,); flags: (P,) lane kind (1 = live,
        0 = degenerate packet, -1 = bucket padding); omega0: (3,) previous
        stride's warm start. Returns (omega_next (3,), packed (P, 5))."""

        def solve_lane(evdata, t_ref, om0):
            def fsig(sigma):
                xs, ys, ts, validf = (evdata[0], evdata[1], evdata[2],
                                      evdata[3])
                valid = validf > 0
                idx = jnp.where(
                    valid,
                    ys.astype(jnp.int32) * cam.width + xs.astype(jnp.int32),
                    0,
                )
                packet = warp_local.EventPacket(
                    bearings=jnp.take(lut, idx, axis=0),
                    dts=warp_local.batch_midpoint_dts(
                        ts, valid, batch_size, t_ref),
                    weights=validf,
                )

                def f(omega):
                    iwe = warp_local.local_iwe(omega, packet, cam, sigma,
                                               precision, impl=impl)
                    return -contrast(iwe, measure)

                return f

            x0 = om0
            iters_coarse = 0
            if coarse_to_fine:
                coarse = minimize(fsig(max(blur_sigma, 1.0) * 3.0), x0,
                                  o.max_line_searches // 2)
                x0 = coarse.x
                iters_coarse = coarse.iters
            res = minimize(fsig(blur_sigma), x0, o.max_line_searches)
            packed = jnp.concatenate([
                res.x,
                jnp.stack([res.fun,
                           (res.iters + iters_coarse).astype(jnp.float32)]),
            ])
            return res.x, packed

        def step(om, lane):
            evdata, t_ref, flag = lane

            def live(_):
                return solve_lane(evdata, t_ref, om)

            def dead(_):
                # Degenerate packet: zero estimate and the warm-start chain
                # resets to zero (ang_vel_estimator.cpp:108-114). Bucket
                # padding (flag < 0) instead passes the carry through so a
                # short stride keeps its warm start for the next one.
                om_next = jnp.where(flag < 0, om, jnp.zeros(3, evP.dtype))
                return om_next, jnp.zeros(5, evP.dtype)

            om_new, packed = jax.lax.cond(flag > 0, live, dead, None)
            return om_new, packed

        omega_next, packed = jax.lax.scan(step, omega0, (evP, t_refs, flags))
        return omega_next, packed

    return solve


@functools.lru_cache(maxsize=None)
def _build_stride_solver_ring(cam, batch_size: int, blur_sigma: float,
                              measure: int, o, coarse_to_fine: bool,
                              precision: str, S: int, cap: int):
    """Ring-sourced variant of _build_stride_solver: each lane gathers its
    (overlapping) packet from the device-resident event ring instead of
    receiving a re-uploaded (P, 4, S) tensor. Identical scan/warm-start/
    degenerate semantics; only the event source differs. At ECRot-shed
    geometry (20k packets, 5k stride spacing) this cuts per-stride upload
    from ~P*4*S*4 bytes to ~4*P scalars."""

    impl = "xla" if o.ladder in ("vector", "grid") else "auto"

    def minimize(f, x0, max_ls):
        return optim.minimize_fr_cg(
            jax.value_and_grad(f), x0, f_fn=f,
            max_line_searches=max_ls,
            initial_step=o.initial_step,
            line_search_tol=o.line_search_tol,
            grad_tol=o.grad_tol,
            fun_tol=o.fun_tol,
            max_fevals_per_linesearch=o.max_fevals_per_linesearch,
            stagnation_patience=o.stagnation_patience,
            secant_refine_evals=o.secant_refine_evals,
            ladder=o.ladder,
            cg_variant=o.cg_variant,
        )

    @jax.jit
    def solve(idx_ring, ts_ring, begs, ns, t_refs, flags, omega0, lut):
        """begs/ns: (P,) int32 ring offsets / valid counts; t_refs: (P,);
        flags: (P,) lane kind (1 live, 0 degenerate, -1 bucket padding);
        omega0: (3,) warm start. Returns (omega_next, packed (P, 5))."""

        def solve_lane(beg, nv, t_ref, om0):
            def fsig(sigma):
                packet = _ring_packet(idx_ring, ts_ring, beg, nv, S, cap,
                                      lut, cam, batch_size, t_ref)

                def f(omega):
                    iwe = warp_local.local_iwe(omega, packet, cam, sigma,
                                               precision, impl=impl)
                    return -contrast(iwe, measure)

                return f

            x0 = om0
            iters_coarse = 0
            if coarse_to_fine:
                coarse = minimize(fsig(max(blur_sigma, 1.0) * 3.0), x0,
                                  o.max_line_searches // 2)
                x0 = coarse.x
                iters_coarse = coarse.iters
            res = minimize(fsig(blur_sigma), x0, o.max_line_searches)
            packed = jnp.concatenate([
                res.x,
                jnp.stack([res.fun,
                           (res.iters + iters_coarse).astype(jnp.float32)]),
            ])
            return res.x, packed

        def step(om, lane):
            beg, nv, t_ref, flag = lane

            def live(_):
                return solve_lane(beg, nv, t_ref, om)

            def dead(_):
                om_next = jnp.where(flag < 0, om, jnp.zeros(3, jnp.float32))
                return om_next, jnp.zeros(5, jnp.float32)

            om_new, packed = jax.lax.cond(flag > 0, live, dead, None)
            return om_new, packed

        omega_next, packed = jax.lax.scan(
            step, omega0, (begs, ns, t_refs, flags))
        return omega_next, packed

    return solve


@dataclass
class AngVelEstimate:
    """One packet's angular-velocity estimate.

    CONTRACT: while ``packed`` is not None the solve is still in flight on
    device and ``omega``/``cost``/``iters`` hold placeholders (the device
    handle / 0.0 / 0). With ``Frontend.auto_finalize`` (the standalone
    default) estimates returned from push_events are always finalized; in
    the system loop (auto_finalize=False) they finalize lazily when the
    back-end consumes them — call ``Frontend.finalize_batch(ests)`` before
    reading scalar fields of estimates you hold on to."""

    t: float
    omega: np.ndarray  # (3,) rad/s
    cost: float
    iters: int
    num_events: int
    span: Tuple[int, int] = (0, 0)  # absolute event-store indices [beg, end)
    # In-flight device results packed as one (5,) array [omega, cost, iters]:
    # a single host fetch per packet — and one STACKED fetch per stride —
    # instead of three (each blocking device->host round trip costs ~25 ms
    # over a remote-device tunnel; readback count, not bytes, is what the
    # streaming loop must minimize).
    packed: object = None


class Frontend:
    def __init__(
        self,
        cam: warp_local.CameraParams,
        lut: np.ndarray,
        cfg: FrontendConfig,
        store: Optional[EventStore] = None,
        metrics: Optional[Metrics] = None,
    ):
        self.cam = cam
        self.cfg = cfg
        self.lut = jnp.asarray(lut)
        self.store = store if store is not None else EventStore()
        self.metrics = metrics if metrics is not None else Metrics()

        self.half = cfg.num_events_per_packet // 2
        self.packet_size = 2 * self.half  # static device shape
        # pad to a multiple of the event batch size for batch-midpoint dts
        bs = cfg.warp.event_batch_size
        self.packet_size = ((self.packet_size + bs - 1) // bs) * bs

        # Device-resident event ring (io/devring.py): events cross the
        # host->device link once at 8 B each; the solvers gather their
        # overlapping packets from the ring on device. Auto capacity covers
        # >= 16 packets of reach-back (min 2M events = 16 MiB HBM); strides
        # whose packets have been lapped fall back to host marshalling.
        self._ring: Optional[DeviceEventRing] = None
        if cfg.device_store:
            cap = cfg.device_store_capacity or max(16 * self.packet_size,
                                                   1 << 21)
            self._ring = DeviceEventRing(_next_pow2(cap), cam.width)

        self._initialized = False
        # Finalize (fetch) packet results as they are returned. The system
        # loop disables this and finalizes lazily — in one stacked readback —
        # only when the back-end actually consumes the angular velocities.
        self.auto_finalize = True
        self._t0: float = 0.0  # stream epoch: all device times are t - _t0
        self._cursor: float = 0.0  # time_get_subset_
        self._t_packet: float = 0.0  # time_packet_
        self._next_check_abs = 0  # next absolute event index to scan for triggers
        self._pending: List[Tuple[int, int]] = []  # subset (beg, end) abs indices
        self._omega_dev = jnp.zeros(3, jnp.float32)  # warm start (ang_vel_)
        self.estimates: List[AngVelEstimate] = []
        # 1-deep solve pipeline: the estimate whose device arrays are still
        # in flight (dispatching packet k overlaps packet k-1's solve).
        self._inflight: Optional[AngVelEstimate] = None
        # NOTE on fetch strategy: round 2 prefetched in-flight results from a
        # background thread. Round-3 profiling showed that on the remote-TPU
        # tunnel a background device_get issued while the main thread keeps
        # dispatching resolves ~5x SLOWER (~140 ms) than a main-thread fetch
        # of the same (long-completed) result (~26 ms), so estimates are now
        # fetched lazily on the MAIN thread, fused into one device_get per
        # back-end stride (Backend._fused_fetch).
        self._solve = self._build_solver()

    def close(self) -> None:
        """Kept for API symmetry with Backend.close(); the front-end holds no
        background resources (fetches are main-thread, fused per stride)."""

    # ------------------------------------------------------------------
    def checkpoint(self) -> dict:
        """Serializable packetizer state: the rigid packet grid's phase
        (``_t0``/``_cursor``/``_t_packet``), trigger-scan cursor, pending
        packet spans, and the warm-start omega. Together with the shared
        EventStore contents (serialized by the system) a resumed run emits
        exactly the packets the interrupted run would have."""
        return {
            "fe_initialized": self._initialized,
            "fe_t0": self._t0,
            "fe_cursor": self._cursor,
            "fe_t_packet": self._t_packet,
            "fe_next_check_abs": self._next_check_abs,
            "fe_pending": np.asarray(self._pending, np.int64).reshape(-1, 2),
            "fe_omega": self.omega,
        }

    def restore(self, d) -> None:
        """Inverse of checkpoint()."""
        self._initialized = bool(d["fe_initialized"])
        self._t0 = float(d["fe_t0"])
        self._cursor = float(d["fe_cursor"])
        self._t_packet = float(d["fe_t_packet"])
        self._next_check_abs = int(d["fe_next_check_abs"])
        self._pending = [
            (int(a), int(b))
            for a, b in np.asarray(d["fe_pending"]).reshape(-1, 2)
        ]
        self.omega = np.asarray(d["fe_omega"], np.float64)
        self._inflight = None
        if self._ring is not None:
            # The ring is never serialized; rebuild it from the restored
            # EventStore's resident window so post-resume packets that
            # reach back into pre-checkpoint events stay on the fast path.
            self._ring.resync(self.store, self._t0)

    @property
    def omega(self) -> np.ndarray:
        """Current warm-start angular velocity (syncs the device)."""
        return np.asarray(self._omega_dev, np.float64)

    @omega.setter
    def omega(self, value) -> None:
        self._omega_dev = jnp.asarray(value, jnp.float32)

    # ------------------------------------------------------------------
    def _build_solver(self) -> Callable:
        cfg = self.cfg
        return _build_packet_solver(
            self.cam, cfg.warp.event_batch_size, cfg.warp.blur_sigma,
            cfg.contrast_measure, cfg.optim, cfg.coarse_to_fine,
            cfg.warp.precision,
        )

    # ------------------------------------------------------------------
    def push_events(self, xs, ys, ts, ps) -> List[AngVelEstimate]:
        """Ingest a chunk of events (stream order); returns new estimates.

        Vectorized equivalent of the per-event pushEvent loop
        (ang_vel_estimator.cpp:68-135); the sample-rate decimation of
        eventsCallback (src/cmax_slam.cpp:155-156) is the caller's job
        (see system.CMaxSLAM).
        """
        ts = np.asarray(ts, np.float64)
        if len(ts) == 0:
            return []
        if not self._initialized:
            self._t0 = float(ts[0])
            self._t_packet = float(ts[0]) + 0.5 * self.cfg.dt_ang_vel
            self._cursor = self._t_packet
            self._initialized = True

        self.store.append(xs, ys, ts, ps)
        if self._ring is not None:
            self._ring.append(xs, ys, (ts - self._t0).astype(np.float32))
        self._scan_triggers()
        return self._process_ready_packets()

    def _scan_triggers(self) -> None:
        """Find subset-cursor crossings among newly stored events (native
        C++ scan with numpy fallback, io/native.py)."""
        from .io import native

        store = self.store
        ts = store._ts  # current resident window (store.base offset applies)
        rel_next = max(self._next_check_abs - store.base, 0)
        trig, cursor, rel_next = native.scan_triggers(
            ts, self._cursor, rel_next, self.cfg.dt_ang_vel
        )
        self._cursor = cursor
        self._next_check_abs = store.base + rel_next
        for idx_rel in trig:
            count = store.base + int(idx_rel) + 1
            beg = max(count - self.half, 0)
            end = count + self.half
            self._pending.append((beg, end))

    def min_needed_abs_index(self) -> int:
        """Oldest absolute event index the front-end may still read: pending
        packet starts and the reach-back of the next (unformed) packet. The
        back-end clamps its prefix retirement to this, mirroring
        deleteOldEvents' min(idx_backend, ev_beg_idx_)
        (ang_vel_estimator.cpp:149-152)."""
        candidates = [max(self.store.total - self.half, 0)]
        if self._pending:
            candidates.append(self._pending[0][0])
        return min(candidates)

    @staticmethod
    def _assign(est: "AngVelEstimate", vals: np.ndarray) -> None:
        est.omega = vals[:3].astype(np.float64)
        est.cost = float(vals[3])
        est.iters = int(vals[4])
        est.packed = None

    def _finalize(self, est: "AngVelEstimate") -> "AngVelEstimate":
        """Materialize a pipelined estimate's device results on host."""
        if est is not None and est.packed is not None:
            if isinstance(est.packed, tuple):
                mat, row = est.packed
                self._assign(est, np.asarray(mat)[row])
            else:
                self._assign(est, np.asarray(est.packed))
        return est

    def finalize_batch(self, ests: List["AngVelEstimate"],
                       extra_handles: tuple = ()) -> List[np.ndarray]:
        """Materialize many estimates with ONE stacked device->host fetch
        (readback round trips, not bytes, dominate streaming wall time on
        remote devices; see AngVelEstimate.packed).

        Stride-batched estimates share one (P, 5) device matrix — each
        holds ``packed = (matrix, row)``; the matrix is fetched once.

        ``extra_handles``: additional device arrays to ride the same RPC
        (the back-end fuses its window-result readback in here — one
        device_get per stride total); their host values are returned."""
        pend = [e for e in ests if e.packed is not None]
        mats: List = []
        mat_rows: dict = {}
        singles: List = []
        for e in pend:
            if isinstance(e.packed, tuple):
                m = e.packed[0]
                if id(m) not in mat_rows:
                    mat_rows[id(m)] = len(mats)
                    mats.append(m)
            else:
                singles.append(e.packed)
        handles = mats + singles + list(extra_handles)
        if not handles:
            return []
        # device_get on a LIST is one transfer RPC for all arrays, and
        # unlike an eager jnp.stack it enqueues no new device program
        # (which would land at the tail of the device FIFO and wait for
        # every queued solve).
        vals = jax.device_get(handles)
        k = len(mats)
        for e in pend:
            if isinstance(e.packed, tuple):
                m, row = e.packed
                self._assign(e, vals[mat_rows[id(m)]][row])
            else:
                self._assign(e, vals[k])
                k += 1
        return vals[len(mats) + len(singles):]

    def _process_ready_packets(self) -> List[AngVelEstimate]:
        ready = []
        while self._pending and self.store.total > self._pending[0][1]:
            ready.append(self._pending.pop(0))
        if not ready:
            return []
        sweeps = self.cfg.batch_sweeps
        if len(ready) >= 2 and sweeps > 0:
            out = self._process_packets_batched(ready, sweeps)
        else:
            out = []
            for beg, end in ready:
                est = self._process_packet(beg, end)
                # hand over the previous in-flight solve; its device work
                # overlapped this packet's host prep + dispatch
                if self._inflight is not None:
                    out.append(self._inflight)
                self._inflight = est
            if self._inflight is not None:
                out.append(self._inflight)
                self._inflight = None
        if self.auto_finalize:
            self.finalize_batch(out)
        return out

    @staticmethod
    def _lane_bucket(n: int) -> int:
        """Pad the lane count to a small bucket set (bounded compile cache)."""
        for b in (2, 4, 6, 8, 10, 12, 16):
            if n <= b:
                return b
        return ((n + 7) // 8) * 8

    def _get_stride_solver(self, sweeps: int):
        cfg = self.cfg
        return _build_stride_solver(
            self.cam, cfg.warp.event_batch_size, cfg.warp.blur_sigma,
            cfg.contrast_measure, cfg.optim, cfg.coarse_to_fine,
            cfg.warp.precision, sweeps,
        )

    def _get_stride_solver_ring(self, sweeps: int):
        del sweeps  # same chain for any value >= 1 (see _build_stride_solver)
        cfg = self.cfg
        return _build_stride_solver_ring(
            self.cam, cfg.warp.event_batch_size, cfg.warp.blur_sigma,
            cfg.contrast_measure, cfg.optim, cfg.coarse_to_fine,
            cfg.warp.precision, self.packet_size, self._ring.capacity,
        )

    def _process_packets_batched(self, ready, sweeps: int
                                 ) -> List[AngVelEstimate]:
        """Solve a whole stride's packets in one vmapped device program
        (see _build_stride_solver). Packet semantics — centered windows,
        rigid grid times, degenerate guard — are identical to
        _process_packet; only the solve scheduling differs."""
        cfg = self.cfg
        S = self.packet_size
        bucket = self._lane_bucket(len(ready))
        t_refs = np.zeros(bucket, np.float32)
        flags = np.full(bucket, -1.0, np.float32)  # bucket padding
        begs = np.zeros(bucket, np.int64)
        ns = np.zeros(bucket, np.int32)
        ests: List[AngVelEstimate] = []
        solved: List[bool] = []
        for i, (beg, end) in enumerate(ready):
            _, _, ts, _ = self.store.slice_abs(beg, end)
            n = len(ts)
            t_packet = self._t_packet
            self._t_packet += cfg.dt_ang_vel  # slideWindow
            t_refs[i] = t_packet - self._t0
            timespan = float(ts[-1] - ts[0]) if n else 0.0
            degenerate = timespan > 10.0 * cfg.dt_ang_vel or n < 2
            est = AngVelEstimate(t=t_packet, omega=np.zeros(3), cost=0.0,
                                 iters=0, num_events=n, span=(beg, end))
            flags[i] = 0.0 if degenerate else 1.0
            begs[i] = beg
            ns[i] = n
            if not degenerate:
                self.metrics.count("frontend.events", n)
            solved.append(not degenerate)
            ests.append(est)
            self.estimates.append(est)

        ring = self._ring
        use_ring = ring is not None and ring.resident(int(begs[:len(ready)].min()))
        with self.metrics.timer("frontend.solve"):
            if use_ring:
                idx_ring, ts_ring = ring.buffers
                solver = self._get_stride_solver_ring(sweeps)
                omega_next, packed = solver(
                    idx_ring, ts_ring,
                    jnp.asarray((begs & (ring.capacity - 1)).astype(np.int32)),
                    jnp.asarray(ns), jnp.asarray(t_refs), jnp.asarray(flags),
                    self._omega_dev, self.lut,
                )
            else:
                evP = np.zeros((bucket, 4, S), np.float32)
                for i, (beg, end) in enumerate(ready):
                    if not solved[i]:
                        continue
                    xs, ys, ts, _ = self.store.slice_abs(beg, end)
                    n = len(ts)
                    evP[i, 0, :n] = xs
                    evP[i, 1, :n] = ys
                    evP[i, 2, :n] = (ts - self._t0).astype(np.float32)
                    evP[i, 3, :n] = 1.0
                solver = self._get_stride_solver(sweeps)
                omega_next, packed = solver(
                    jnp.asarray(evP), jnp.asarray(t_refs), jnp.asarray(flags),
                    self._omega_dev, self.lut,
                )
        # Warm-start handover: the scan carry already encodes the sequential
        # semantics (last live lane's solution; zero after a trailing
        # degenerate packet; unchanged across bucket padding).
        self._omega_dev = omega_next
        for i, est in enumerate(ests):
            if solved[i]:
                est.packed = (packed, i)
        logger.debug("[front-end] stride batch of %d packets dispatched",
                     len(ready))
        return ests

    def _process_packet(self, beg: int, end: int) -> AngVelEstimate:
        cfg = self.cfg
        xs, ys, ts, _ = self.store.slice_abs(beg, end)
        n = len(ts)
        t_packet = self._t_packet
        self._t_packet += cfg.dt_ang_vel  # slideWindow (ang_vel_estimator.cpp:175-182)

        timespan = float(ts[-1] - ts[0]) if n else 0.0
        if timespan > 10.0 * cfg.dt_ang_vel or n < 2:
            # Degenerate packet guard (ang_vel_estimator.cpp:108-114)
            self._omega_dev = jnp.zeros(3, jnp.float32)
            est = AngVelEstimate(t=t_packet, omega=np.zeros(3), cost=0.0,
                                 iters=0, num_events=n, span=(beg, end))
            self.estimates.append(est)
            return est

        ring = self._ring
        with self.metrics.timer("frontend.solve"):
            # Asynchronous dispatch: ONE fused program per packet; the warm
            # start is handed over as a device array, so back-to-back packet
            # solves chain on device with no host round trip in between.
            # Ring-resident packets skip the (4, S) upload entirely.
            if ring is not None and ring.resident(beg):
                idx_ring, ts_ring = ring.buffers
                solver = _build_packet_solver_ring(
                    self.cam, cfg.warp.event_batch_size, cfg.warp.blur_sigma,
                    cfg.contrast_measure, cfg.optim, cfg.coarse_to_fine,
                    cfg.warp.precision, self.packet_size, ring.capacity,
                )
                omega, packed = solver(
                    idx_ring, ts_ring,
                    np.int32(beg & (ring.capacity - 1)), np.int32(n),
                    np.float32(t_packet - self._t0), self._omega_dev,
                    self.lut,
                )
            else:
                S = self.packet_size
                evdata = np.zeros((4, S), np.float32)
                evdata[0, :n] = xs
                evdata[1, :n] = ys
                evdata[2, :n] = (ts - self._t0).astype(np.float32)
                evdata[3, :n] = 1.0
                omega, packed = self._solve(
                    jnp.asarray(evdata), np.float32(t_packet - self._t0),
                    self._omega_dev, self.lut,
                )

        self._omega_dev = omega
        self.metrics.count("frontend.events", n)
        est = AngVelEstimate(
            t=t_packet, omega=omega, cost=0.0, iters=0, num_events=n,
            span=(beg, end), packed=packed,
        )
        self.estimates.append(est)
        logger.debug("[front-end] packet t=%.4f n=%d dispatched", t_packet, n)
        return est

    # ------------------------------------------------------------------
    def render_iwe_pair(self, beg: int, end: int, omega: np.ndarray):
        """Zero-motion vs motion-compensated IWE side-by-side, normalized and
        inverted (publishEventImage, ang_vel_estimator.cpp:203-233)."""
        from .utils.image import normalize_minmax

        xs, ys, ts, _ = self.store.slice_abs(beg, end)
        n = len(ts)
        if n == 0:
            return None  # packet already retired from the store
        S = self.packet_size
        pad = S - n
        valid = np.zeros(S, bool)
        valid[:n] = True
        packet = warp_local.make_packet(
            jnp.asarray(np.pad(xs, (0, pad))),
            jnp.asarray(np.pad(ys, (0, pad))),
            jnp.asarray(np.pad((ts - self._t0).astype(np.float32), (0, pad))),
            jnp.asarray(valid), self.lut, self.cam,
            self.cfg.warp.event_batch_size,
            np.float32(0.5 * (ts[0] + ts[-1]) - self._t0),
        )
        img0 = warp_local.local_iwe(jnp.zeros(3, jnp.float32), packet, self.cam, 0.0)
        img1 = warp_local.local_iwe(
            jnp.asarray(omega, jnp.float32), packet, self.cam, 0.0
        )
        stacked = np.concatenate([np.asarray(img0), np.asarray(img1)], axis=1)
        return 255.0 - normalize_minmax(stacked) * 255.0
