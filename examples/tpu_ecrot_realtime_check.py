"""ECRot-scale realtime check: the STOCK ecrot_real preset (mirrors
/root/reference/launch/ecrot_handheld.launch — 200k-event packets at 100 Hz,
non-overlapping 0.2 s windows, 2048x4096 panorama) replaying a synthetic
DVXplorer-geometry (640x480) stream at a stated event rate, end to end.

Reports the warm realtime factor (stream seconds per wall second; the
reference replays its rosbags at rate 1.0 on CPU, ecrot_handheld.launch),
the bench-style per-window back-end cost (solve dispatch + readback wait),
and trajectory RMS vs the generator's ground truth.

Env knobs: ECRT_RATE (events/s, default 5e6), ECRT_DURATION (s, default
1.2), ECRT_SHED=1 adds the reference live-mode style load shedding
(frontend_event_sample_rate=10, backend warp.event_sample_rate=5,
launch/live_davis.launch) on top of the preset.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cmax_slam_tpu import spline
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ecrot_real_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

W, H = 640, 480
FX = FY = 335.0  # DVXplorer-ish FOV
RATE = int(float(os.environ.get("ECRT_RATE", 5e6)))
DURATION = float(os.environ.get("ECRT_DURATION", 1.2))
SHED = os.environ.get("ECRT_SHED", "0") == "1"
CHUNK = RATE // 10

rng = np.random.default_rng(3)
omega_true = np.array([0.5, -0.9, 1.3])
n = int(RATE * DURATION)
print(f"generating {n} events over {DURATION}s at 640x480...", flush=True)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=1200
)
calib = CameraCalibration(
    width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
)
cfg = ecrot_real_config()
label = "stock ecrot_real preset"
if SHED:
    # The reference's own answer to live rates: uniform event decimation
    # (launch/live_davis.launch decimates 10x front / 5x back, and pairs it
    # with a proportionally smaller packet so the packet's TIME span stays
    # the same — 200k/10 = 20k here, else every packet spans > 10*dt and
    # trips the degenerate guard).
    cfg = cfg_replace(cfg, frontend_event_sample_rate=10,
                      **{"backend.warp.event_sample_rate": 5,
                         "frontend.num_events_per_packet": 20000})
    label += " + live-mode shedding (10x FE / 5x BE, 20k packets)"
# Generic dotted overrides for A/B hunts, e.g.
# ECRT_SET="backend.optim.ladder=vector"
for kv in filter(None, os.environ.get("ECRT_SET", "").split(",")):
    key, val = kv.split("=", 1)
    cur = cfg
    for part in key.split(".")[:-1]:
        cur = getattr(cur, part)
    old = getattr(cur, key.split(".")[-1])
    typed = val if isinstance(old, str) else type(old)(
        float(val) if isinstance(old, float) else int(val))
    cfg = cfg_replace(cfg, **{key: typed})
    label += f" [{key}={typed!r}]"
print(f"config: {label}", flush=True)


def replay():
    slam = CMaxSLAM(calib, cfg)
    t0 = time.perf_counter()
    for i in range(0, n, CHUNK):
        slam.push_events(ev.xs[i:i + CHUNK], ev.ys[i:i + CHUNK],
                         ev.ts[i:i + CHUNK], ev.pols[i:i + CHUNK])
    slam.flush()
    return slam, time.perf_counter() - t0


for tag in ("cold", "warm"):
    slam, wall = replay()
    res = slam.window_results()
    solve = slam.metrics.timers.get("backend.solve")
    fetch = slam.metrics.timers.get("backend.fetch")
    win_ms = ((solve.total + fetch.total) / fetch.count * 1e3
              if fetch and fetch.count else float("nan"))
    print(f"[{tag}] windows={len(res)} ba={[r.ran_ba for r in res]} "
          f"wall={wall:.1f}s rt_factor={DURATION / wall:.3f} "
          f"backend_window_ms={win_ms:.1f}", flush=True)

traj = slam.backend.traj
t_grid = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 40)
q_est = traj.evaluate(t_grid)
q_gt = np.stack([spline._np_quat_exp(omega_true * t) for t in t_grid])
rms, _ = rotation_rms_deg(t_grid, q_gt, q_est, "global")
print(f"trajectory RMS vs ground truth: {rms:.3f} deg "
      f"(stream {RATE / 1e6:.1f} M ev/s)")
assert rms < 0.5
print("ECRot realtime check OK")
