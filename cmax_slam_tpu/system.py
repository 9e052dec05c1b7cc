"""System orchestration: wire the front-end and back-end over a shared event
store and drive them from an event stream.

Rebuild of CMaxSLAM (src/cmax_slam.cpp:14-161) without ROS: construction loads
a SystemConfig, precomputes the bearing-vector LUT from the camera
calibration, and cross-wires the two stages. The reference's callback-thread /
worker-thread pipeline (src/cmax_slam.cpp:28,86,92) becomes a cooperative
loop: pushing events advances the front-end; every new angular-velocity
estimate feeds the back-end, which consumes windows as they complete. Device
work is asynchronously dispatched by JAX, so front-end and back-end programs
still overlap on the TPU without host threads or mutexes.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np

from .backend import Backend, WindowResult
from .calib import CameraCalibration, bearing_lut
from .config import SystemConfig
from .frontend import AngVelEstimate, Frontend
from .io.events import EventStore
from .ops.warp_local import CameraParams
from .utils.metrics import Metrics


class CMaxSLAM:
    def __init__(
        self,
        calib: CameraCalibration,
        cfg: Optional[SystemConfig] = None,
        run_backend: bool = True,
        backend_device=None,
    ):
        """``backend_device``: optionally pin the back-end's programs and
        map state to a second chip so bundle adjustment runs concurrently
        with the front-end's packet solves — the hardware mapping of the
        reference's worker thread (src/cmax_slam.cpp:92). With one device
        (or None) everything shares the default device."""
        self.cfg = cfg if cfg is not None else SystemConfig()
        self.calib = calib
        self.metrics = Metrics()

        lut = bearing_lut(calib)
        K = calib.K
        cam = CameraParams(
            fx=float(K[0, 0]), fy=float(K[1, 1]),
            cx=float(K[0, 2]), cy=float(K[1, 2]),
            width=calib.width, height=calib.height,
        )

        self.store = EventStore()
        self.frontend = Frontend(
            cam, lut, self.cfg.frontend, store=self.store, metrics=self.metrics
        )
        self.backend = (
            Backend(
                calib.width, calib.height, lut, self.cfg.backend,
                store=self.store,
                frontend_sample_rate=self.cfg.frontend_event_sample_rate,
                metrics=self.metrics,
                device=backend_device,
            )
            if run_backend
            else None
        )
        if self.backend is not None:
            self.backend.retain_from_fn = self.frontend.min_needed_abs_index
            # Lazy finalize: packet results stay on device until the back-end
            # integrates them (one stacked readback per window) instead of
            # one readback per pushed chunk.
            self.frontend.auto_finalize = False
            self.backend.finalize_fn = self.frontend.finalize_batch
        self._decim_phase = 0
        # Raw (pre-decimation) events consumed; checkpointed so a resumed
        # replay knows how far into the recording to skip.
        self._raw_count = 0

    # ------------------------------------------------------------------
    def push_events(self, xs, ys, ts, ps) -> List[AngVelEstimate]:
        """Feed a chunk of raw sensor events (eventsCallback,
        src/cmax_slam.cpp:147-161): decimate by frontend_event_sample_rate,
        advance the front-end, forward fresh ang-vels to the back-end.

        Returned estimates may still be in flight on device (see
        AngVelEstimate's contract): with a back-end attached they finalize
        lazily — call ``frontend.finalize_batch(ests)`` (or read
        ``ang_vel_log``) before using their cost/iters fields."""
        rate = self.cfg.frontend_event_sample_rate
        self._raw_count += len(ts)
        if rate > 1:
            # phase-continuous every-rate-th selection across chunks
            n = len(ts)
            sel = (np.arange(n) + self._decim_phase) % rate == 0
            self._decim_phase = (self._decim_phase + n) % rate
            xs, ys, ts, ps = xs[sel], ys[sel], ts[sel], ps[sel]

        estimates = self.frontend.push_events(xs, ys, ts, ps)
        if self.backend is not None:
            for est in estimates:
                # The estimate may still be in flight on device; the back-end
                # materializes it (batched) when the window integrates it.
                self.backend.push_ang_vel(est.t, est)
            while self.backend.ready():
                self.backend.step()
        return estimates

    def run(self, chunks: Iterable) -> None:
        """Drive the full pipeline from an iterator of event chunks."""
        for xs, ys, ts, ps in chunks:
            self.push_events(xs, ys, ts, ps)

    # ------------------------------------------------------------------
    @property
    def ang_vel_log(self):
        """All front-end estimates as (T, 4) array [t, wx, wy, wz] (rad/s).
        The reference publishes these in deg/s on /dvs/angular_velocity
        (ang_vel_estimator.cpp:191-201)."""
        es = self.frontend.estimates
        if not es:
            return np.zeros((0, 4))
        self.frontend.finalize_batch(es)
        return np.array([[e.t, *e.omega] for e in es])

    @property
    def trajectory_log(self):
        """Back-end refined absolute poses as [(t, quat_wxyz)]."""
        if self.backend is None:
            return []
        self.backend.flush()
        return self.backend.trajectory_log

    def window_results(self) -> List[WindowResult]:
        if self.backend is None:
            return []
        self.backend.flush()
        return self.backend.results

    def flush(self) -> None:
        """Join any in-flight back-end window (the analog of waiting for the
        reference's worker thread to drain, src/cmax_slam.cpp:92)."""
        if self.backend is not None:
            self.backend.flush()

    def refine(self, source, passes: int = 1) -> List[WindowResult]:
        """Offline polish: re-run the sliding-window bundle adjustment over
        the whole stream ``passes`` times, starting from the online
        trajectory and global map (see Backend.refine_pass — this removes
        the map-bootstrap transient the online pass bakes into the early
        knots; the reference has no offline mode at all).

        ``source`` is the SAME raw event stream the online pass consumed:
        a tuple of arrays ``(xs, ys, ts[, ps])``, an iterable of such
        chunks (single pass only), or a zero-arg callable returning a fresh
        chunk iterator (re-readable; required for ``passes > 1``).
        Decimation by ``frontend_event_sample_rate`` is re-applied
        identically, so callers always pass raw sensor events."""
        if self.backend is None:
            raise ValueError("refine requires a back-end")
        if passes > 1 and not (callable(source) or isinstance(source, tuple)):
            raise ValueError("passes > 1 needs a re-readable source: pass "
                             "arrays or a callable returning a fresh iterator")
        results: List[WindowResult] = []
        for _ in range(passes):
            if callable(source):
                chunks = source()
            elif isinstance(source, tuple):
                chunks = iter([source])
            else:
                chunks = iter(source)
            results = self.backend.refine_pass(self._decimated(chunks))
        return results

    def _decimated(self, chunks):
        """Re-apply push_events' phase-continuous decimation to raw chunks
        (the back-end consumed the decimated store during the online pass)."""
        rate = self.cfg.frontend_event_sample_rate
        phase = 0
        for ch in chunks:
            xs, ys, ts = ch[0], ch[1], ch[2]
            if rate > 1:
                n = len(ts)
                sel = (np.arange(n) + phase) % rate == 0
                phase = (phase + n) % rate
                xs, ys, ts = xs[sel], ys[sel], ts[sel]
            yield (xs, ys, ts)

    def close(self) -> None:
        """Flush and release background readback threads (front and back
        end). The system stays usable afterwards — fetches just run
        synchronously; call when retiring instances in bulk (e.g. one system
        per device in segmented replay)."""
        self.flush()
        self.frontend.close()
        if self.backend is not None:
            self.backend.close()

    @property
    def raw_count(self) -> int:
        """Raw (pre-decimation) events consumed so far. A resume driver
        skips this many events of the recording before resuming the feed
        (see load_checkpoint / cli --resume)."""
        return self._raw_count

    def save_checkpoint(self, path: str) -> None:
        """Serialize full system state — a capability the reference lacks
        (SURVEY.md section 5): trajectory knots, global map, window
        cursors, integrator anchors, the ang-vel inbox, the front-end
        packetizer phase, the resident EventStore window, and the raw
        stream position. ``load_checkpoint`` + feeding the events after
        ``raw_count`` reproduces the uninterrupted run."""
        self.flush()
        state = {}
        if self.backend is not None:
            state.update(self.backend.checkpoint())
        state.update(self.frontend.checkpoint())
        st = self.store
        state.update(
            store_base=st.base, store_xs=st._xs, store_ys=st._ys,
            store_ts=st._ts, store_ps=st._ps, store_t_last=st._t_last,
            raw_count=self._raw_count, decim_phase=self._decim_phase,
        )
        state["ang_vel_log"] = self.ang_vel_log
        state["frontend_omega"] = self.frontend.omega
        np.savez_compressed(path, **state)

    def load_checkpoint(self, path: str) -> None:
        """Restore full system state from a checkpoint (see save_checkpoint).
        Construct the system with the SAME config and calibration, load, then
        resume pushing the raw events after ``raw_count``. Tolerates legacy
        (pre round-5) checkpoints that carried only knots + map + warm start:
        those re-init the stream protocol on the next pushed chunk."""
        d = np.load(path)
        if "store_base" in d:
            st = self.store
            st._xs = np.asarray(d["store_xs"], np.int32)
            st._ys = np.asarray(d["store_ys"], np.int32)
            st._ts = np.asarray(d["store_ts"], np.float64)
            st._ps = np.asarray(d["store_ps"], np.int8)
            st.base = int(d["store_base"])
            st._t_last = float(d["store_t_last"])
            self.frontend.restore(d)
            self._raw_count = int(d["raw_count"])
            self._decim_phase = int(d["decim_phase"])
        else:
            self.frontend.omega = np.asarray(d["frontend_omega"], np.float64)
        if self.backend is not None:
            self.backend.restore(d)
