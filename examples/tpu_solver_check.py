"""TPU validation of the full jitted CMax solver (CG while_loop with the
Pallas vote kernel + custom VJP inside) at the e2e test geometry."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from cmax_slam_tpu.config import FrontendConfig, WarpOptions
from cmax_slam_tpu.frontend import Frontend
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops.warp_local import CameraParams

W, H = 120, 90
FX = FY = 90.0
cam = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
lut = synthetic.identity_lut(W, H, FX, FY, W / 2, H / 2)

rng = np.random.default_rng(7)
omega_true = np.array([1.0, -1.6, 2.4])
n = 40000
ev = synthetic.rotating_camera_events(
    rng, n, 0.2, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=250
)

cfg = FrontendConfig(
    num_events_per_packet=4000, dt_ang_vel=0.02,
    warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
)
fe = Frontend(cam, lut, cfg)
t0 = time.perf_counter()
for i in range(0, n, 10000):
    fe.push_events(ev.xs[i:i+10000], ev.ys[i:i+10000],
                   ev.ts[i:i+10000], ev.pols[i:i+10000])
wall = time.perf_counter() - t0
errs = [np.linalg.norm(e.omega - omega_true) for e in fe.estimates]
print(f"packets={len(fe.estimates)} median|err|={np.median(errs):.4f} "
      f"wall={wall:.1f}s solve_time={fe.metrics.timers['frontend.solve'].total:.2f}s")
per = fe.metrics.timers["frontend.solve"]
print(f"per-solve mean {per.mean*1e3:.1f} ms (min {per.minimum*1e3:.1f} ms)")
assert np.median(errs) < 0.15, "tracking accuracy regression"  # ~0.10 intrinsic at this tiny geometry (CPU parity)
print("TPU solver check OK")
