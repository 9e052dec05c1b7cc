"""Example: track a synthetic rotating-camera event stream with the CMax front-end."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cmax_slam_tpu.config import FrontendConfig, WarpOptions
from cmax_slam_tpu.frontend import Frontend
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops.warp_local import CameraParams

W, H = 240, 180
FX = FY = 180.0
cam = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
lut = synthetic.identity_lut(W, H, FX, FY, W / 2, H / 2)

rng = np.random.default_rng(7)
omega_true = np.array([1.0, -1.6, 2.4])
n = 50000
ev = synthetic.rotating_camera_events(
    rng, n, 0.25, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=300
)

cfg = FrontendConfig(
    num_events_per_packet=8000, dt_ang_vel=0.02,
    warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
)
fe = Frontend(cam, lut, cfg)

print("== streaming 50k events in 5 chunks ==")
for i in range(0, n, 10000):
    ests = fe.push_events(
        ev.xs[i:i + 10000], ev.ys[i:i + 10000],
        ev.ts[i:i + 10000], ev.pols[i:i + 10000],
    )
    for e in ests:
        err = np.linalg.norm(e.omega - omega_true)
        print(f"t={e.t:.3f}  omega=[{e.omega[0]:+.3f} {e.omega[1]:+.3f} "
              f"{e.omega[2]:+.3f}]  |err|={err:.4f}  iters={e.iters}  "
              f"n_ev={e.num_events}")

errs = [np.linalg.norm(e.omega - omega_true) for e in fe.estimates]
print(f"\npackets={len(fe.estimates)}  median|err|={np.median(errs):.4f} rad/s "
      f"(truth |omega|={np.linalg.norm(omega_true):.3f})")
print("timers:", {k: round(v.total, 2) for k, v in fe.metrics.timers.items()})
print("throughput: %.0f events/s (frontend.solve wall time)" %
      fe.metrics.throughput("frontend.events", "frontend.solve"))

print("\n== probe: out-of-order events ==")
try:
    fe.push_events(np.array([5]), np.array([5]),
                   np.array([0.01]), np.array([1], np.int8))
    print("NO ERROR (bad)")
except ValueError as e:
    print("ValueError:", e)

print("\n== probe: empty chunk ==")
out = fe.push_events(np.array([], np.int32), np.array([], np.int32),
                     np.array([]), np.array([], np.int8))
print("empty push ->", out)

print("\n== probe: sparse/degenerate stream (fresh instance) ==")
fe2 = Frontend(cam, lut, FrontendConfig(
    num_events_per_packet=8000, dt_ang_vel=0.01,
    warp=WarpOptions(event_batch_size=100)))
ts = np.linspace(0, 5.0, 9000)  # 9000 events over 5s: packet spans >> 10*dt
ests2 = fe2.push_events(np.full(9000, 9, np.int32), np.full(9000, 9, np.int32),
                        ts, np.ones(9000, np.int8))
print(f"degenerate estimates: {len(ests2)}, all zero omega:",
      all(np.all(e.omega == 0) for e in ests2))
