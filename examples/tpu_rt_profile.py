"""Decompose the full-system replay cost on TPU (round-3 item 1).

Breaks the per-stride budget into: front-end host dispatch, back-end window
marshal+dispatch, readback wait, and the warm DEVICE time of one window-solve
program (timed with block_until_ready on a captured window's args).
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ijrr_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
import cmax_slam_tpu.backend as backend_mod

W, H = 240, 180
FX = FY = 180.0
RATE = int(os.environ.get("RT_RATE", 390_000))
DURATION = 3.0
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
cfg = cfg_replace(cfg, **{"frontend.warp.precision": PRECISION,
                          "backend.warp.precision": PRECISION})

# --- capture dispatch records -------------------------------------------------
records = []
orig_dispatch = backend_mod.Backend._dispatch_window_solve_impl


def patched(self, xs, ys, ts, idx_cp, nf):
    t0 = time.perf_counter()
    p = orig_dispatch(self, xs, ys, ts, idx_cp, nf)
    records.append(dict(host_s=time.perf_counter() - t0, plan=p["plan"],
                        size=p["size"], K=p["K"], args=p["args"],
                        backend=self))
    return p


backend_mod.Backend._dispatch_window_solve_impl = patched

orig_finish = backend_mod.Backend._finish_solve
fetch_waits = []


def patched_finish(self, p, packed=None):
    t0 = time.perf_counter()
    out = orig_finish(self, p, packed)
    fetch_waits.append(time.perf_counter() - t0)
    return out


backend_mod.Backend._finish_solve = patched_finish


def replay(run_backend=True):
    slam = CMaxSLAM(calib, cfg, run_backend=run_backend)
    t0 = time.perf_counter()
    for i in range(0, n, CHUNK):
        slam.push_events(ev.xs[i:i + CHUNK], ev.ys[i:i + CHUNK],
                         ev.ts[i:i + CHUNK], ev.pols[i:i + CHUNK])
    slam.flush()
    return slam, time.perf_counter() - t0


print("compile pass...", flush=True)
replay()
records.clear(); fetch_waits.clear()
slam, wall_full = replay()
warm_records = list(records)
warm_waits = list(fetch_waits)

records.clear(); fetch_waits.clear()
_, wall_fe = replay(run_backend=False)
_, wall_fe2 = replay(run_backend=False)
wall_fe = min(wall_fe, wall_fe2)

m = slam.metrics
iters = [r.iters for r in slam.window_results() if r.ran_ba]

# --- warm device time of one window solve ------------------------------------
r = warm_records[len(warm_records) // 2]
be = r["backend"]
if r["plan"] is not None:
    Hc, Wc, ints, h = r["plan"]
    solver = be._get_crop_solver(r["size"], r["K"], Hc, Wc)
    print(f"captured window: crop {Hc}x{Wc}, size={r['size']}, K={r['K']}")
else:
    solver = be._get_solver(r["size"], r["K"])
    print(f"captured window: FULL pano, size={r['size']}, K={r['K']}")
extra = (be.lut_dev,)  # crop ints ride the fused smalls vector in args

out = solver(*r["args"], *extra)
jax.block_until_ready(out)
t_dev = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(solver(*r["args"], *extra))
    t_dev = min(t_dev, time.perf_counter() - t0)

n_win = len(warm_records)
print(json.dumps({
    "wall_full_s": round(wall_full, 3),
    "wall_frontend_only_s": round(wall_fe, 3),
    "rt_factor_full": round(DURATION / wall_full, 3),
    "rt_factor_fe": round(DURATION / wall_fe, 3),
    "windows": n_win,
    "ba_iters_per_window": iters,
    "backend_host_dispatch_ms": round(1e3 * float(np.mean([r["host_s"] for r in warm_records])), 2),
    "backend_fetch_wait_ms": [round(1e3 * w, 1) for w in warm_waits],
    "window_solve_device_ms": round(1e3 * t_dev, 1),
    "timers_s": {k: round(v.total, 3) for k, v in m.timers.items()},
}, indent=2))
