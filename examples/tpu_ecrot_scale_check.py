"""TPU validation at ECRot-real scale: 2048x4096 panorama back-end windows
(~130k events each) through the chunked vote path."""
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
rng = np.random.default_rng(4)
omega_true = np.array([0.6, -1.0, 1.4])
n = 300000
duration = 0.45
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
            pano_height=2048, pano_width=4096, backend_min_ev_rate=10000,
            max_update_times=200,
        ),
        max_events_per_window=1 << 20,
    ),
)
# A/B knobs for the window-time hunt (VERDICT r2 item 2): the BA line-search
# ladder ("vector" = all bracket rungs in ONE batched objective call) and the
# vote matmul precision.
from cmax_slam_tpu.config import replace as _cfg_replace  # noqa: E402
_LADDER = os.environ.get("ECROT_LADDER")
_PREC = os.environ.get("ECROT_PRECISION")
if _LADDER:
    cfg = _cfg_replace(cfg, **{"backend.optim.ladder": _LADDER})
if _PREC:
    cfg = _cfg_replace(cfg, **{"backend.warp.precision": _PREC})
print(f"ba_ladder={_LADDER or 'sequential'} "
      f"precision={_PREC or cfg.backend.warp.precision}")
PASSES = int(os.environ.get("ECROT_PASSES", 1))
for p in range(max(1, PASSES)):
    slam = CMaxSLAM(calib, cfg)
    t0 = time.perf_counter()
    for i in range(0, n, 50000):
        slam.push_events(ev.xs[i:i+50000], ev.ys[i:i+50000],
                         ev.ts[i:i+50000], ev.pols[i:i+50000])
    slam.flush()  # join the in-flight window so wall is end-to-end
    wall = time.perf_counter() - t0
    res = slam.window_results()
    bs = slam.metrics.timers.get("backend.solve")
    bf = slam.metrics.timers.get("backend.fetch")
    tag = "warm" if p else "cold"
    print(f"[{tag}] windows={len(res)} ba={[r.ran_ba for r in res]} "
          f"wall={wall:.1f}s rt_factor={duration / wall:.3f}")
    if bs:
        print(f"[{tag}] backend dispatches: {bs.count} mean {bs.mean:.2f}s "
              f"(min {bs.minimum:.2f}s)")
    if bf and bf.count:
        # bench.py's per-window metric: dispatch + readback wait — the
        # number PARITY.md's ECRot-scale row records.
        ms = (bs.total + bf.total) / bf.count * 1e3
        print(f"[{tag}] backend window (solve+fetch): {ms:.1f} ms")
traj = slam.backend.traj
t_grid = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 30)
q_est = traj.evaluate(t_grid)
q_gt = np.stack([spline._np_quat_exp(omega_true * t) for t in t_grid])
rms, _ = rotation_rms_deg(t_grid, q_gt, q_est, "global")
print(f"trajectory RMS: {rms:.3f} deg; IG sum {slam.backend.IG.sum():.0f}")
assert rms < 0.5
print("ECRot-scale TPU check OK")
