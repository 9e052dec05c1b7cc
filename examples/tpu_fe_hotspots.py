"""cProfile the frontend-only replay loop on TPU (round-3 item 1).

The rt profile showed FE-only wall ~2.9 s for a 3 s stream while the
frontend.solve timer is only 0.13 s — the cost is host-side. Find it.
"""
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ijrr_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM

W, H = 240, 180
FX = FY = 180.0
RATE = 390_000
DURATION = 3.0
CHUNK = RATE // 10
rng = np.random.default_rng(11)
omega_true = np.array([0.9, -1.3, 1.9])
n = int(RATE * DURATION)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400)
calib = CameraCalibration(width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]))
cfg = ijrr_config()


def replay():
    slam = CMaxSLAM(calib, cfg, run_backend=False)
    t0 = time.perf_counter()
    for i in range(0, n, CHUNK):
        slam.push_events(ev.xs[i:i + CHUNK], ev.ys[i:i + CHUNK],
                         ev.ts[i:i + CHUNK], ev.pols[i:i + CHUNK])
    slam.flush()
    return time.perf_counter() - t0


print("compile pass:", round(replay(), 3), "s", flush=True)
print("warm:", round(replay(), 3), "s", flush=True)

prof = cProfile.Profile()
prof.enable()
wall = replay()
prof.disable()
print("profiled wall:", round(wall, 3), "s")
stats = pstats.Stats(prof)
stats.sort_stats("cumulative").print_stats(30)
