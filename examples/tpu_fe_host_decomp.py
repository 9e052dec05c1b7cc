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
           ["append", "ring_upload", "scan", "stride", "finalize"]}

_ORIG = {
    "append": __import__("cmax_slam_tpu.io.events", fromlist=["EventStore"]
                         ).EventStore.append,
    "scan": Frontend._scan_triggers,
    "stride": Frontend._process_packets_batched,
    "finalize": Frontend.finalize_batch,
}


def _timed(bucket, orig):
    def wrapper(self, *a, **k):
        t0 = time.perf_counter()
        r = orig(self, *a, **k)
        buckets[bucket] += time.perf_counter() - t0
        return r
    return wrapper


def run(instrumented: bool):
    fe = Frontend(cam, lut, cfg.frontend)

    if instrumented:
        # Wrap the REAL methods (no duplicated internals) so the probe
        # measures whatever packet-source path the library actually takes
        # (device ring vs host marshal). "stride" = per-stride host time in
        # _process_packets_batched incl. marshal-or-index build + dispatch.
        from cmax_slam_tpu.io.events import EventStore
        from cmax_slam_tpu.io.devring import DeviceEventRing
        EventStore.append = _timed("append", _ORIG["append"])
        Frontend._scan_triggers = _timed("scan", _ORIG["scan"])
        Frontend._process_packets_batched = _timed("stride", _ORIG["stride"])
        Frontend.finalize_batch = _timed("finalize", _ORIG["finalize"])
        orig_ring = DeviceEventRing.append

        def ring_append(self, *a, **k):
            t0 = time.perf_counter()
            r = orig_ring(self, *a, **k)
            buckets["ring_upload"] += time.perf_counter() - t0
            return r

        DeviceEventRing.append = ring_append

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
