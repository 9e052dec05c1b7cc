"""Event-sharded bundle adjustment: per-device work scaling at ECRot scale.

Builds ONE ECRot-real-scale back-end window (2048x4096 panorama, ~130k
events — the 0.67 s/window case in PARITY.md) and shards its CMax objective
across virtual CPU meshes of 1/2/4/8 devices (parallel/window_shard.py).
For each mesh size it verifies objective parity against the single-device
path and reports XLA's per-device FLOP count for one objective evaluation —
the quantity the ICI claim rests on: event warp + vote work scales ~1/n_dev
while the psum moves one 32 MiB image per evaluation.

Wall-clock on this host does NOT scale (all virtual devices share one CPU
core); per-device FLOPs is the hardware-independent evidence. Run:
  python examples/winshard_scale_table.py
"""
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cmax_slam_tpu import spline
from cmax_slam_tpu.calib import EquirectCamera
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops import warp_pano
from cmax_slam_tpu.ops.warp_pano import PanoWindow
from cmax_slam_tpu.parallel import sharding
from cmax_slam_tpu.parallel.window_shard import (
    make_sharded_pano_objective, shard_window_events,
)

N_EVENTS = int(os.environ.get("WS_EVENTS", 130_000))
BS = 100
PH, PW = 2048, 4096

W, H, FXY = 240, 180, 180.0
B = N_EVENTS // BS
n = B * BS
rng = np.random.default_rng(4)
omega = np.array([0.6, -1.0, 1.4])
dur = 0.2
print(f"building window: {n} events, B={B}, pano {PH}x{PW}...", flush=True)
ev = synthetic.rotating_camera_events(
    rng, n, dur, omega, FXY, FXY, W / 2, H / 2, W, H, n_points=400)
lut = synthetic.identity_lut(W, H, FXY, FXY, W / 2, H / 2)
idx = ev.ys.astype(np.int64) * W + ev.xs.astype(np.int64)
bearings = lut[idx].T.astype(np.float32)

K, dt_knots = 5, 0.05
knots = np.stack([
    spline._np_quat_exp(omega * (k * dt_knots) + 0.004 * rng.normal(size=3))
    for k in range(K)
]).astype(np.float32)
E = n // B
batch_mid = np.array([
    ev.ts[b * E] + 0.5 * (ev.ts[min((b + 1) * E, n) - 1] - ev.ts[b * E])
    for b in range(B)
], np.float32)
pano = EquirectCamera(width=PW, height=PH)
win = PanoWindow(
    bearings=jnp.asarray(bearings),
    batch_times=jnp.asarray(batch_mid),
    weights=jnp.ones(n, jnp.float32),
    is_old=jnp.zeros(n, bool),
    knots=jnp.asarray(knots),
    free_mask=jnp.asarray(np.concatenate([[0.0], np.ones(K - 1)]), jnp.float32),
    t0=jnp.float32(0.0),
    dt_knots=jnp.float32(dt_knots),
    ig_prime=jnp.zeros((PH, PW), jnp.float32),
    alpha=jnp.float32(0.0),
)

x = jnp.zeros(3 * K, jnp.float32)
f_ref, _ = warp_pano.make_pano_objective(win, pano, 2, 1.0, 0)
t0 = time.perf_counter()
ref_val = float(f_ref(x))
print(f"single-device objective: f={ref_val:.6f} "
      f"({time.perf_counter() - t0:.1f}s first eval)", flush=True)

rows = []
for n_dev in (1, 2, 4, 8):
    mesh = sharding.make_mesh(n_dev)
    win_sh = shard_window_events(win, mesh)
    f_sh, _ = make_sharded_pano_objective(mesh, win_sh, pano, 2, 1.0, 0)
    val = float(f_sh(x))
    rel = abs(val - ref_val) / abs(ref_val)
    assert rel < 2e-5, f"n_dev={n_dev}: parity {val} vs {ref_val} (rel {rel})"
    lowered = jax.jit(f_sh).lower(x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f_sh(x))
    wall = (time.perf_counter() - t0) / 3
    rows.append((n_dev, val, rel, flops, wall))
    print(f"n_dev={n_dev}: f={val:.6f} (rel err {rel:.2e})  "
          f"per-device flops/eval={flops:.3e}  wall/eval={wall*1e3:.0f} ms",
          flush=True)

base = rows[0][3]
# Decompose flops(n) = sharded/n + floor from the n=1 and n=8 points: the
# floor is the REPLICATED blur+contrast over the full panorama (every
# device runs it on the psum'd image); the 1/n part is the event
# warp+vote work — the dominant wall-time cost of a big window on real
# hardware, where the vote accumulation (not the fused blur epilogue)
# sets the 2048x4096 window time.
f1, f8 = rows[0][3], rows[-1][3]
n8 = rows[-1][0]
sharded = (f1 - f8) * n8 / (n8 - 1)
floor = f1 - sharded
print("\n| devices | per-device FLOPs/eval | sharded warp+vote FLOPs "
      "| vs 1 dev | objective rel err |")
print("|---|---|---|---|---|")
for n_dev, val, rel, flops, wall in rows:
    sh = flops - floor
    print(f"| {n_dev} | {flops:.3e} | {sh:.3e} | {sh / sharded:.3f}x "
          f"| {rel:.1e} |")
print(f"\nfit: flops(n) = {sharded:.3e}/n + {floor:.3e} "
      f"(floor = replicated blur+contrast on the {PH}x{PW} panorama; "
      "the psum moves one 32 MiB image per evaluation)")
