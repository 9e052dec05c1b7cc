"""TPU validation of the back-end bundle adjustment: full SLAM with a
512x1024 panorama (IJRR-preset geometry), reporting per-window solve times."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from cmax_slam_tpu import spline
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import (
    BackendConfig, FrontendConfig, PanoMapOptions, SlidingWindowOptions,
    SystemConfig, TrajectoryOptions, WarpOptions,
)
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

W, H = 240, 180
FX = FY = 180.0
rng = np.random.default_rng(2)
omega_true = np.array([0.7, -1.1, 1.6])
n = 400000
duration = 1.0
print("generating...", flush=True)
ev = synthetic.rotating_camera_events(
    rng, n, duration, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400
)
calib = CameraCalibration(
    width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
)
cfg = SystemConfig(
    frontend=FrontendConfig(
        num_events_per_packet=10000, dt_ang_vel=0.01,
        warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
    ),
    backend=BackendConfig(
        sliding_window=SlidingWindowOptions(0.2, 0.1),
        warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
        trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=1),
        pano_map=PanoMapOptions(
            pano_height=512, pano_width=1024, backend_min_ev_rate=10000,
            max_update_times=200,
        ),
    ),
)
slam = CMaxSLAM(calib, cfg)
t0 = time.perf_counter()
for i in range(0, n, 50000):
    slam.push_events(ev.xs[i:i+50000], ev.ys[i:i+50000],
                     ev.ts[i:i+50000], ev.pols[i:i+50000])
wall = time.perf_counter() - t0

res = slam.window_results()
m = slam.metrics
fs = m.timers.get("frontend.solve")
bs = m.timers.get("backend.solve")
print(f"windows={len(res)} all_ba={all(r.ran_ba for r in res)} wall={wall:.1f}s")
for r in res:
    print(f"  win {r.index}: iters={r.iters} cost {r.initial_cost:.6f} -> "
          f"{r.final_cost:.6f}")
print(f"frontend solves: {fs.count} mean {fs.mean*1e3:.1f} ms (min {fs.minimum*1e3:.1f})")
print(f"backend  solves: {bs.count} mean {bs.mean*1e3:.1f} ms (min {bs.minimum*1e3:.1f})")

slam.flush()
traj = slam.backend.traj
t_grid = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 50)
q_est = traj.evaluate(t_grid)
q_gt = np.stack([spline._np_quat_exp(omega_true * t) for t in t_grid])
rms, errs = rotation_rms_deg(t_grid, q_gt, q_est, "global")
print(f"trajectory RMS vs GT: {rms:.3f} deg (max {errs.max():.3f})")
assert rms < 1.0, "backend accuracy regression on TPU"
print("TPU backend check OK")
