"""Throughput-mode tracking on TPU: batched multi-window CMax over a long
synthetic stream (BASELINE config 5 analog) — full solves, not just warps.

Compares the three single-chip tracking schedules:
- sequential: the pipelined front-end (frontend.py), warm-started chain
- lockstep:   vmapped whole-solve batches (track_batched), chunked
- compacted:  round-based solves with host-side lane compaction
              (track_batched_compacted) — the straggler-free schedule
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from cmax_slam_tpu.config import FrontendConfig, WarpOptions
from cmax_slam_tpu.frontend import Frontend
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
total_events = float(np.asarray(batch.weights).sum())
print(f"cut {Pn} packets of {S} in {t_cut:.2f}s (host)", flush=True)

results = {}

# --- sequential pipelined front-end (chunked stream feed, warm chain)
fe = Frontend(cam, lut, cfg)
chunk = 65536
for lo in range(0, n, chunk):  # warmup/compile pass
    fe.push_events(ev.xs[lo:lo + chunk], ev.ys[lo:lo + chunk],
                   ev.ts[lo:lo + chunk], ev.pols[lo:lo + chunk])
fe = Frontend(cam, lut, cfg)
t0 = time.perf_counter()
ests = []
for lo in range(0, n, chunk):
    ests += fe.push_events(ev.xs[lo:lo + chunk], ev.ys[lo:lo + chunk],
                           ev.ts[lo:lo + chunk], ev.pols[lo:lo + chunk])
t_seq = time.perf_counter() - t0
seq_om = np.stack([e.omega for e in ests if e.num_events > 1])
results["sequential"] = (t_seq, np.median(
    np.linalg.norm(seq_om - omega_true, axis=1)))

# --- lockstep batched (chunked vmapped while_loop)
_ = batched.track_batched(batch, cam, cfg, sweeps=1)
t0 = time.perf_counter()
_, om_l, _, _ = batched.track_batched(batch, cam, cfg, sweeps=2)
results["lockstep"] = (time.perf_counter() - t0, np.median(
    np.linalg.norm(om_l - omega_true, axis=1)))

# --- compacted batched (round-based + host compaction)
_ = batched.track_batched_compacted(batch, cam, cfg, sweeps=2)
t0 = time.perf_counter()
_, om_c, _, it_c = batched.track_batched_compacted(batch, cam, cfg, sweeps=2)
results["compacted"] = (time.perf_counter() - t0, np.median(
    np.linalg.norm(om_c - omega_true, axis=1)))

print(f"\nstream: {n/duration/1e6:.1f} M ev/s for {duration:.1f}s; "
      f"{Pn} packets x {S} = {total_events:.0f} event-solves")
for name, (dt, med) in results.items():
    print(f"{name:>10}: {dt:6.2f}s  {total_events/dt/1e6:5.2f} M ev/s  "
          f"median |omega err| {med:.4f} rad/s")

t_seq = results["sequential"][0]
t_cmp = results["compacted"][0]
print(f"\ncompacted vs sequential speedup: {t_seq/t_cmp:.2f}x")
assert t_cmp <= t_seq * 1.05, (
    f"compacted batched ({t_cmp:.2f}s) should match or beat sequential "
    f"({t_seq:.2f}s)")
assert results["compacted"][1] < 0.12, "compacted accuracy regressed"
print("OK")
