"""Decompose the front-end's per-stride HOST cost on the realtime stream.

rt_factor_fe measured ~1.2 at bf16 while the stride solver's device time is
~29 ms: ~45 ms/stride is host-side. This probe times each stage of
Frontend.push_events (store append, trigger scan, packet marshal, upload +
dispatch, finalize fetch) separately, plus one end-to-end FE-only replay for
cross-checking.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cmax_slam_tpu.calib import CameraCalibration, bearing_lut
from cmax_slam_tpu.config import ijrr_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.frontend import Frontend
from cmax_slam_tpu.ops.warp_local import CameraParams
import cmax_slam_tpu.frontend as fe_mod

W = int(os.environ.get("RT_W", 240))
H = int(os.environ.get("RT_H", 180))
FX = FY = float(os.environ.get("RT_F", 180.0))
RATE = int(os.environ.get("RT_RATE", 390_000))
DURATION = float(os.environ.get("RT_DURATION", 3.0))
CHUNK = RATE // 10

rng = np.random.default_rng(11)
omega_true = np.array([0.9, -1.3, 1.9])
n = int(RATE * DURATION)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400
)
calib = CameraCalibration(
    width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
)
cfg = ijrr_config()
PRECISION = os.environ.get("RT_PRECISION", "default")
cfg = cfg_replace(cfg, **{"frontend.warp.precision": PRECISION})
# Optional overrides so the same probe covers ECRot-shed geometry
# (dt_ang_vel 0.01, 20k packets): RT_PACKET / RT_DT.
if os.environ.get("RT_PACKET"):
    cfg = cfg_replace(cfg, **{
        "frontend.num_events_per_packet": int(os.environ["RT_PACKET"])})
if os.environ.get("RT_DT"):
    cfg = cfg_replace(cfg, **{"frontend.dt_ang_vel": float(os.environ["RT_DT"])})

cam = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
lut = bearing_lut(calib)

buckets = {k: 0.0 for k in
           ["append", "scan", "marshal", "upload", "dispatch", "finalize"]}

orig_batched = Frontend._process_packets_batched


def run(instrumented: bool):
    fe = Frontend(cam, lut, cfg.frontend)

    if instrumented:
        def patched(self, ready, sweeps):
            t0 = time.perf_counter()
            cfgf = self.cfg
            S = self.packet_size
            bucket = self._lane_bucket(len(ready))
            evP = np.zeros((bucket, 4, S), np.float32)
            t_refs = np.zeros(bucket, np.float32)
            flags = np.full(bucket, -1.0, np.float32)
            ests, solved = [], []
            for i, (beg, end) in enumerate(ready):
                xs, ys, ts, _ = self.store.slice_abs(beg, end)
                nn = len(ts)
                t_packet = self._t_packet
                self._t_packet += cfgf.dt_ang_vel
                t_refs[i] = t_packet - self._t0
                timespan = float(ts[-1] - ts[0]) if nn else 0.0
                degenerate = timespan > 10.0 * cfgf.dt_ang_vel or nn < 2
                est = fe_mod.AngVelEstimate(
                    t=t_packet, omega=np.zeros(3), cost=0.0, iters=0,
                    num_events=nn, span=(beg, end))
                flags[i] = 0.0 if degenerate else 1.0
                if not degenerate:
                    evP[i, 0, :nn] = xs
                    evP[i, 1, :nn] = ys
                    evP[i, 2, :nn] = (ts - self._t0).astype(np.float32)
                    evP[i, 3, :nn] = 1.0
                solved.append(not degenerate)
                ests.append(est)
                self.estimates.append(est)
            t1 = time.perf_counter(); buckets["marshal"] += t1 - t0
            evP_d = jnp.asarray(evP)
            t_refs_d = jnp.asarray(t_refs)
            flags_d = jnp.asarray(flags)
            jax.block_until_ready(evP_d)
            t2 = time.perf_counter(); buckets["upload"] += t2 - t1
            solver = self._get_stride_solver(sweeps)
            omega_next, packed = solver(evP_d, t_refs_d, flags_d,
                                        self._omega_dev, self.lut)
            self._omega_dev = omega_next
            for i, est in enumerate(ests):
                if solved[i]:
                    est.packed = (packed, i)
            buckets["dispatch"] += time.perf_counter() - t2
            return ests

        Frontend._process_packets_batched = patched

        orig_push = Frontend.push_events

        def push(self, xs, ys, ts, ps):
            ts = np.asarray(ts, np.float64)
            if len(ts) == 0:
                return []
            if not self._initialized:
                self._t0 = float(ts[0])
                self._t_packet = float(ts[0]) + 0.5 * self.cfg.dt_ang_vel
                self._cursor = self._t_packet
                self._initialized = True
            t0 = time.perf_counter()
            self.store.append(xs, ys, ts, ps)
            t1 = time.perf_counter(); buckets["append"] += t1 - t0
            self._scan_triggers()
            t2 = time.perf_counter(); buckets["scan"] += t2 - t1
            out = self._process_ready_packets()
            return out

        Frontend.push_events = push

        orig_fin = Frontend.finalize_batch

        def fin(self, ests, extra_handles=()):
            t0 = time.perf_counter()
            r = orig_fin(self, ests, extra_handles)
            buckets["finalize"] += time.perf_counter() - t0
            return r

        Frontend.finalize_batch = fin

    t0 = time.perf_counter()
    for i in range(0, n, CHUNK):
        fe.push_events(ev.xs[i:i + CHUNK], ev.ys[i:i + CHUNK],
                       ev.ts[i:i + CHUNK], ev.pols[i:i + CHUNK])
    fe.finalize_batch(fe.estimates)
    return time.perf_counter() - t0


print("compile pass...", flush=True)
run(False)
wall_plain = run(False)
wall_instr = run(True)
strides = max(1, int(DURATION / cfg.frontend.dt_ang_vel))
print(json.dumps({
    "wall_plain_s": round(wall_plain, 3),
    "wall_instrumented_s": round(wall_instr, 3),
    "per_stride_ms": {k: round(1e3 * v / strides, 2)
                      for k, v in buckets.items()},
    "rt_factor_fe": round(DURATION / wall_plain, 3),
}, indent=2))
