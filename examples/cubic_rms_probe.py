"""Cubic-BA accuracy probe (CPU): reproduce tests/test_e2e_cubic.py's stream
and print per-window costs + final RMS. Knobs via env:
  BRACKET  max_fevals_per_linesearch (default 16)
  LS_TOL   backend line_search_tol   (default 0.1)
  PATIENCE backend stagnation_patience (default 1)
  STEP     backend initial_step      (default 0.1)
  ADAPT    backend adaptive_initial_step (default unset -> config default)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
if not int(os.environ.get("PROBE_TPU", "0")):
    import conftest  # noqa: F401  (cpu + cache env)
else:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

from cmax_slam_tpu import spline
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import (
    BackendConfig, FrontendConfig, OptimOptions, PanoMapOptions,
    SlidingWindowOptions, SystemConfig, TrajectoryOptions, WarpOptions,
)
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg
from test_e2e import W, H, FX, FY
from test_e2e_cubic import smooth_rot_fn_noramp

BRACKET = int(os.environ.get("BRACKET", 16))
LS_TOL = float(os.environ.get("LS_TOL", 0.1))
PATIENCE = int(os.environ.get("PATIENCE", 1))
STEP = float(os.environ.get("STEP", 0.1))
CG = os.environ.get("CG", "fr")
LADDER = os.environ.get("LADDER", "sequential")
MAXLS = int(os.environ.get("MAXLS", 50))
RESTARTS = os.environ.get("RESTARTS")  # backend.ba_solve_restarts (None=auto)
PREC = os.environ.get("PREC", None)  # WarpOptions.precision (None=library default)
PANO_H = int(os.environ.get("PANO_H", 256))  # 256x512 = CPU-suite size;
# 512x1024 matches the reference's smallest real config (launch/ijrr.launch)
BOOTSTRAP = os.environ.get("BOOTSTRAP")  # bootstrap_resolve_window (None=off)

rng = np.random.default_rng(11)
duration = 0.8
rot_fn, omega_fn = smooth_rot_fn_noramp(duration)
n = 80000
ev = synthetic.rotating_camera_events(
    rng, n, duration, np.zeros(3), FX, FY, W / 2, H / 2, W, H,
    n_points=250, rot_fn=rot_fn,
)
calib = CameraCalibration(
    width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
)
opt_kw = dict(max_line_searches=MAXLS, grad_tol=1e-4, line_search_tol=LS_TOL,
              stagnation_patience=PATIENCE, initial_step=STEP,
              max_fevals_per_linesearch=BRACKET, cg_variant=CG,
              ladder=LADDER)
cfg = SystemConfig(
    frontend=FrontendConfig(
        num_events_per_packet=4000, dt_ang_vel=0.02,
        warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
    ),
    backend=BackendConfig(
        sliding_window=SlidingWindowOptions(0.2, 0.1),
        warp=WarpOptions(blur_sigma=1.0, event_batch_size=100,
                         **({"precision": PREC} if PREC else {})),
        trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=3),
        pano_map=PanoMapOptions(
            pano_height=PANO_H, pano_width=2 * PANO_H,
            backend_min_ev_rate=10000, max_update_times=200,
        ),
        optim=OptimOptions(**opt_kw),
        ba_solve_restarts=None if RESTARTS is None else int(RESTARTS),
        bootstrap_resolve_window=None if BOOTSTRAP is None else int(BOOTSTRAP),
    ),
)
slam = CMaxSLAM(calib, cfg)
for i in range(0, n, 20000):
    slam.push_events(ev.xs[i:i+20000], ev.ys[i:i+20000],
                     ev.ts[i:i+20000], ev.pols[i:i+20000])
slam.flush()

REFINE = int(os.environ.get("REFINE", 0))
if REFINE:
    for r in slam.refine((ev.xs, ev.ys, ev.ts, ev.pols), passes=REFINE):
        print(f"refine win {r.index}: n={r.num_events} f0={r.initial_cost:.5f} "
              f"f={r.final_cost:.5f} iters={r.iters}")

for r in slam.window_results():
    print(f"win {r.index}: n={r.num_events} f0={r.initial_cost:.5f} "
          f"f={r.final_cost:.5f} iters={r.iters}")

traj = slam.backend.traj
t0, t1 = traj.t_beg + 1e-6, traj.max_time() - 1e-6
times = np.linspace(t0, t1, 50)
q_est = traj.evaluate(times)
R_gt = rot_fn(times)
q_gt = np.asarray([spline._np_quat_from_matrix(R) if hasattr(
    spline, "_np_quat_from_matrix") else None for R in R_gt])
if q_gt[0] is None:
    from cmax_slam_tpu import lie
    q_gt = np.asarray(lie.from_matrix(R_gt))
rms, errs = rotation_rms_deg(times, q_gt, q_est, alignment="global")
print("errs:", np.round(errs, 3).tolist())
print(f"CONFIG bracket={BRACKET} ls_tol={LS_TOL} patience={PATIENCE} "
      f"step={STEP} cg={CG} ladder={LADDER} maxls={MAXLS} "
      f"restarts={RESTARTS} prec={PREC} pano={PANO_H}x{2*PANO_H} "
      f"bootstrap={BOOTSTRAP}")
print(f"RMS {rms:.4f} deg  max {errs.max():.3f}")
