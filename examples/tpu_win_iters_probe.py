"""Diagnose back-end windows that max the 50-iteration budget on the
realtime stream (round-4 item 2): per-window f0 -> f, iters, crop plan,
event count, and the knot-increment norm applied.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ijrr_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg
from cmax_slam_tpu import spline

W, H = 240, 180
FX = FY = 180.0
RATE = int(os.environ.get("RT_RATE", 390_000))
DURATION = float(os.environ.get("RT_DURATION", 3.0))
CHUNK = RATE // 10

rng = np.random.default_rng(11)
omega_true = np.array([0.9, -1.3, 1.9])
n = int(RATE * DURATION)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400
)
calib = CameraCalibration(
    width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
)
cfg = ijrr_config()
for kv in filter(None, os.environ.get("RT_SET", "").split(",")):
    key, val = kv.split("=", 1)
    cur = cfg
    for part in key.split(".")[:-1]:
        cur = getattr(cur, part)
    old = getattr(cur, key.split(".")[-1])
    cfg = cfg_replace(cfg, **{key: type(old)(val) if old is not None else val})

slam = CMaxSLAM(calib, cfg)
knots_before = {}
import cmax_slam_tpu.backend as backend_mod
orig = backend_mod.Backend._finish_solve

def patched(self, p, packed=None):
    k0 = self.traj.knots[p["idx_cp_traj_beg"]:
                         p["idx_cp_traj_beg"] + p["n_real"]].copy()
    out = orig(self, p, packed)
    k1 = self.traj.knots[p["idx_cp_traj_beg"]:
                         p["idx_cp_traj_beg"] + p["n_real"]]
    dq = [2 * np.degrees(np.arccos(np.clip(abs(np.dot(a, b)), -1, 1)))
          for a, b in zip(k0, k1)]
    knots_before[p["index"]] = (max(dq), p["plan"][0:2] if p["plan"] else None)
    return out

backend_mod.Backend._finish_solve = patched

t0 = time.perf_counter()
for i in range(0, n, CHUNK):
    slam.push_events(ev.xs[i:i + CHUNK], ev.ys[i:i + CHUNK],
                     ev.ts[i:i + CHUNK], ev.pols[i:i + CHUNK])
slam.flush()
wall = time.perf_counter() - t0
print(f"wall={wall:.2f}s rt={DURATION / wall:.3f} (cold-ish)")
for r in slam.window_results():
    dmax, plan = knots_before.get(r.index, (0.0, None))
    print(f"win {r.index:2d} [{r.t_beg:.2f},{r.t_end:.2f}) n={r.num_events:6d} "
          f"ba={int(r.ran_ba)} iters={r.iters:2d} f0={r.initial_cost:9.5f} "
          f"f={r.final_cost:9.5f} dknot_max={dmax:7.4f}deg crop={plan}")

traj = slam.backend.traj
times = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 60)
q_est = traj.evaluate(times)
from cmax_slam_tpu import lie
R_gt = np.stack([spline._np_quat_rotmat(
    spline._np_quat_exp(omega_true * t)) for t in times])
q_gt = np.asarray(lie.from_matrix(R_gt))
rms, errs = rotation_rms_deg(times, q_gt, q_est, "global")
print(f"RMS {rms:.4f} deg (max {errs.max():.3f})")
