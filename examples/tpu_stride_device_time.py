"""Warm device time of the stride-batched FE solver vs the sequential chain.

Round-3 item 1: the stride solver runs all lanes in one vmapped masked-CG
program; lockstep means its device time is set by the slowest lane times
every lane's per-iteration cost. Compare against the 10-small-programs
sequential chain on the same stride of packets.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cmax_slam_tpu.calib import CameraCalibration, bearing_lut
from cmax_slam_tpu.config import ijrr_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.frontend import Frontend
from cmax_slam_tpu.ops.warp_local import CameraParams

W, H = 240, 180
FX = FY = 180.0
RATE = 390_000
DURATION = 1.0
rng = np.random.default_rng(11)
omega_true = np.array([0.9, -1.3, 1.9])
n = int(RATE * DURATION)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400)
calib = CameraCalibration(width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]))
cfg = ijrr_config()
SWEEPS = int(os.environ.get("SWEEPS", "2"))
PATIENCE = int(os.environ.get("PATIENCE", "0"))
if PATIENCE:
    cfg = cfg_replace(cfg, **{"frontend.optim.stagnation_patience": PATIENCE})
PRECISION = os.environ.get("RT_PRECISION")
if PRECISION:
    cfg = cfg_replace(cfg, **{"frontend.warp.precision": PRECISION})
# Generic dotted overrides, e.g.
# FE_SET="frontend.optim.secant_refine_evals=2,frontend.optim.line_search_tol=0.1"
for kv in filter(None, os.environ.get("FE_SET", "").split(",")):
    key, val = kv.split("=", 1)
    cur = cfg
    for part in key.split(".")[:-1]:
        cur = getattr(cur, part)
    old = getattr(cur, key.split(".")[-1])
    typed = val if isinstance(old, str) else type(old)(
        float(val) if isinstance(old, float) else int(val))
    cfg = cfg_replace(cfg, **{key: typed})
    print(f"override {key} = {typed!r}")

cam = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
lut = bearing_lut(calib)

fe = Frontend(cam, lut, cfg.frontend)
CHUNK = RATE // 10
for i in range(0, n, CHUNK):
    fe.push_events(ev.xs[i:i+CHUNK], ev.ys[i:i+CHUNK],
                   ev.ts[i:i+CHUNK], ev.pols[i:i+CHUNK])
fe.finalize_batch(fe.estimates)
iters = [e.iters for e in fe.estimates]
print(f"{len(fe.estimates)} packets, iters={iters}")

# Marshal ONE stride (the middle chunk's packets) exactly as
# _process_packets_batched does.
per_stride = max(1, len(fe.estimates) // 10)
mid = fe.estimates[5 * per_stride: 6 * per_stride]
S = fe.packet_size
bucket = fe._lane_bucket(len(mid))
evP = np.zeros((bucket, 4, S), np.float32)
t_refs = np.zeros(bucket, np.float32)
flags = np.full(bucket, -1.0, np.float32)
for i, e in enumerate(mid):
    flags[i] = 1.0
    xs, ys, ts, _ = fe.store.slice_abs(*e.span)
    nev = len(ts)
    evP[i, 0, :nev] = xs; evP[i, 1, :nev] = ys
    evP[i, 2, :nev] = (ts - fe._t0).astype(np.float32)
    evP[i, 3, :nev] = 1.0
    t_refs[i] = e.t - fe._t0

evP_d = jnp.asarray(evP); t_refs_d = jnp.asarray(t_refs)
flags_d = jnp.asarray(flags)
om0 = jnp.zeros(3, jnp.float32)

for sweeps in ([SWEEPS] if SWEEPS else [1, 2]):
    solver = fe._get_stride_solver(sweeps)
    out = solver(evP_d, t_refs_d, flags_d, om0, fe.lut)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(solver(evP_d, t_refs_d, flags_d, om0, fe.lut))
        best = min(best, time.perf_counter() - t0)
    omega_next, packed = solver(evP_d, t_refs_d, flags_d, om0, fe.lut)
    pk = np.asarray(packed)
    print(f"stride solver sweeps={sweeps}: {best*1e3:.1f} ms warm "
          f"({bucket} lanes, iters={pk[:, 4].astype(int).tolist()})")

# Sequential chain on the same packets (old path), warm.
def chain():
    omega = jnp.zeros(3, jnp.float32)
    packeds = []
    for i, e in enumerate(mid):
        omega, packed = fe._solve(evP_d[i], t_refs[i], omega, fe.lut)
        packeds.append(packed)
    jax.block_until_ready(packeds[-1])
    return packeds

chain()
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    chain()
    best = min(best, time.perf_counter() - t0)
print(f"sequential chain: {best*1e3:.1f} ms warm ({len(mid)} packets)")
