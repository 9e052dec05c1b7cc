"""Throughput-mode tracking on TPU: batched multi-window CMax over a long
synthetic stream (BASELINE config 5 analog) — full solves, not just warps."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from cmax_slam_tpu.config import FrontendConfig, WarpOptions
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops.warp_local import CameraParams
from cmax_slam_tpu.parallel import batched

W, H = 240, 180
FX = FY = 180.0
cam = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
lut = synthetic.identity_lut(W, H, FX, FY, W / 2, H / 2)

rng = np.random.default_rng(1)
omega_true = np.array([1.0, -1.5, 2.2])
n = 2_000_000
duration = 2.0  # 1M ev/s stream
print("generating stream...", flush=True)
ev = synthetic.rotating_camera_events(
    rng, n, duration, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400
)

cfg = FrontendConfig(
    num_events_per_packet=16384, dt_ang_vel=0.01,
    warp=WarpOptions(blur_sigma=1.0, event_batch_size=128),
)
t0 = time.perf_counter()
batch = batched.cut_packets(ev.xs, ev.ys, ev.ts, lut, cam, cfg)
t_cut = time.perf_counter() - t0
Pn, S = batch.weights.shape
print(f"cut {Pn} packets of {S} in {t_cut:.2f}s (host)", flush=True)

# warmup/compile
_ = batched.track_batched(batch, cam, cfg, sweeps=1)
t0 = time.perf_counter()
times, omegas, costs, iters = batched.track_batched(batch, cam, cfg, sweeps=2)
t_solve = time.perf_counter() - t0

errs = np.linalg.norm(omegas - omega_true, axis=1)
total_events = float(np.asarray(batch.weights).sum())
print(f"solved {Pn} packets ({total_events:.0f} event-solves) in {t_solve:.2f}s")
print(f"tracking throughput: {total_events / t_solve / 1e6:.1f} M events/s "
      f"(stream rate {n/duration/1e6:.1f} M ev/s; packets overlap)")
print(f"median |omega err| = {np.median(errs):.4f} rad/s; "
      f"mean iters/packet = {iters.mean():.1f}")
