"""Per-packet device time of the sequential front-end chain (round-3 item 1).

Replays a stride of packets through the production packet solver and measures
the device-side chain: dispatch N warm packet solves back-to-back (each warm
started from the previous, exactly as the streaming front-end does) and
block at the end.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ijrr_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.frontend import Frontend
from cmax_slam_tpu.ops.warp_local import CameraParams
from cmax_slam_tpu.calib import bearing_lut

W, H = 240, 180
FX = FY = 180.0
RATE = 390_000
DURATION = 1.0
rng = np.random.default_rng(11)
omega_true = np.array([0.9, -1.3, 1.9])
n = int(RATE * DURATION)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400)
calib = CameraCalibration(width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]))
cfg = ijrr_config()
PRECISION = os.environ.get("RT_PRECISION", "default")
cfg = cfg_replace(cfg, **{"frontend.warp.precision": PRECISION})

cam = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
lut = bearing_lut(calib)

fe = Frontend(cam, lut, cfg.frontend)
fe.auto_finalize = False
CHUNK = RATE // 10
ests = []
for i in range(0, n, CHUNK):
    ests += fe.push_events(ev.xs[i:i+CHUNK], ev.ys[i:i+CHUNK],
                           ev.ts[i:i+CHUNK], ev.pols[i:i+CHUNK])
fe.finalize_batch(ests)
print(f"{len(ests)} packets; warm chain timing...", flush=True)

# Re-dispatch the same packets back-to-back (compiled, warm starts chained on
# device) and block only at the end: total/packets = device-bound per-packet
# cost including inter-program latency.
spans = [e.span for e in fe.estimates if e.num_events > 0]
t_packets = [e.t for e in fe.estimates if e.num_events > 0]

import cmax_slam_tpu.frontend as fe_mod

def chain_once():
    omega = jnp.zeros(3, jnp.float32)
    packeds = []
    for (beg, end), tp in zip(spans, t_packets):
        xs, ys, ts, _ = fe.store.slice_abs(beg, end)
        S = fe.packet_size
        nev = len(ts)
        evdata = np.zeros((4, S), np.float32)
        evdata[0, :nev] = xs; evdata[1, :nev] = ys
        evdata[2, :nev] = (ts - fe._t0).astype(np.float32)
        evdata[3, :nev] = 1.0
        omega, packed = fe._solve(jnp.asarray(evdata),
                                  np.float32(tp - fe._t0), omega, fe.lut)
        packeds.append(packed)
    jax.block_until_ready(packeds[-1])
    return packeds

chain_once()
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    chain_once()
    best = min(best, time.perf_counter() - t0)
print(f"warm chain: {best*1e3:.1f} ms total, "
      f"{best/len(spans)*1e3:.2f} ms/packet ({len(spans)} packets)")

# iters per packet
fe.finalize_batch(fe.estimates)
iters = [e.iters for e in fe.estimates]
print("iters per packet:", iters)
