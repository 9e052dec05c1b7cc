"""Decompose one back-end window solve's device time: setup/epilogue vs
per-CG-iteration cost (round-3 item 1). Replays a short stream to capture a
real window's args, then times crop solvers built with varying line-search
budgets."""
import os, sys, time, dataclasses
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
RATE = 390_000
DURATION = 1.2
CHUNK = RATE // 10
rng = np.random.default_rng(11)
omega_true = np.array([0.9, -1.3, 1.9])
n = int(RATE * DURATION)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400)
calib = CameraCalibration(width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]))
cfg = ijrr_config()
PRECISION = os.environ.get("RT_PRECISION", "default")
cfg = cfg_replace(cfg, **{"frontend.warp.precision": PRECISION,
                          "backend.warp.precision": PRECISION})

records = []
orig_dispatch = backend_mod.Backend._dispatch_window_solve_impl

def patched(self, xs, ys, ts, idx_cp, nf):
    p = orig_dispatch(self, xs, ys, ts, idx_cp, nf)
    records.append(dict(plan=p["plan"], size=p["size"], K=p["K"],
                        args=p["args"], backend=self))
    return p

backend_mod.Backend._dispatch_window_solve_impl = patched

slam = CMaxSLAM(calib, cfg)
for i in range(0, n, CHUNK):
    slam.push_events(ev.xs[i:i + CHUNK], ev.ys[i:i + CHUNK],
                     ev.ts[i:i + CHUNK], ev.pols[i:i + CHUNK])
slam.flush()

r = records[-1]
be = r["backend"]
assert r["plan"] is not None, "expected a crop window"
Hc, Wc, ints, h = r["plan"]
print(f"window: crop {Hc}x{Wc}, size={r['size']}, K={r['K']}", flush=True)

def time_solver(o, label, reps=5):
    solver = backend_mod._build_crop_solver(
        be.pano, be.order, be.cfg.warp.blur_sigma, be.cfg.contrast_measure,
        o, be.cfg.pano_map.max_update_times, Hc, Wc, be.cam_width,
        be.cfg.warp.precision, be.cfg.max_ba_correction_rad,
        r["K"], be._fov_count)
    args = (*r["args"], be.lut_dev)  # crop ints ride the fused smalls
    out = solver(*args); jax.block_until_ready(out)
    t = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(solver(*args))
        t = min(t, time.perf_counter() - t0)
    iters = int(np.asarray(out[0])[4 * r["K"] + 2])
    print(f"{label}: {t*1e3:.1f} ms (iters={iters})", flush=True)
    return t

o0 = be.cfg.optim
MODE = os.environ.get("DECOMP_MODE", "ls")
if MODE == "ls":
    for mls in (0, 1, 2, 3, 5, 50):
        time_solver(dataclasses.replace(o0, max_line_searches=mls),
                    f"max_ls={mls:2d}")
    for mf in (4, 8):
        time_solver(dataclasses.replace(o0, max_fevals_per_linesearch=mf),
                    f"max_ls=50 max_fev={mf}")
elif MODE == "ladder":
    # Round-4 realtime hunt: bracket scheduling x secant budget on the
    # SAME captured window (identical data, warm timings).
    time_solver(o0, "sequential refine=4 (default)")
    time_solver(dataclasses.replace(o0, secant_refine_evals=2),
                "sequential refine=2")
    time_solver(dataclasses.replace(o0, ladder="grid"),
                "grid       refine=4")
    time_solver(dataclasses.replace(o0, ladder="grid",
                                    secant_refine_evals=2),
                "grid       refine=2")
    time_solver(dataclasses.replace(o0, ladder="grid",
                                    max_fevals_per_linesearch=8),
                "grid(8)    refine=4")
