"""Microbenchmark one front-end objective eval (fwd / fwd+bwd) on TPU.

The stride chain costs ~2.4 ms per CG iteration at 8000-event packets;
each iteration is ~3 fwd + ~2-4 fwd+bwd objective evals. Find the per-eval
floor and its split across warp / vote / blur / contrast.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cmax_slam_tpu.calib import CameraCalibration, bearing_lut
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops import contrast as contrast_mod
from cmax_slam_tpu.ops import warp_local
from cmax_slam_tpu.ops.warp_local import CameraParams

W, H = 240, 180
FX = FY = 180.0
S = 8000
BATCH = 100
rng = np.random.default_rng(3)
ev = synthetic.rotating_camera_events(
    rng, S, 0.02, np.array([0.9, -1.3, 1.9]), FX, FY, W / 2, H / 2, W, H,
    n_points=400)
calib = CameraCalibration(width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]))
cam = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
lut = jnp.asarray(bearing_lut(calib))

idx = ev.ys.astype(np.int32) * W + ev.xs.astype(np.int32)
bearings = jnp.take(lut, jnp.asarray(idx), axis=0)
ts = jnp.asarray(ev.ts.astype(np.float32))
valid = jnp.ones(S, bool)
dts = warp_local.batch_midpoint_dts(ts, valid, BATCH, jnp.float32(0.01))
packet = warp_local.EventPacket(bearings=bearings, dts=dts,
                                weights=jnp.ones(S, jnp.float32))
omega = jnp.asarray(np.array([0.8, -1.2, 1.7], np.float32))


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.3f} ms")
    return best


for precision in ("highest", "default"):
    for impl in ("auto", "xla"):
        def obj(om):
            iwe = warp_local.local_iwe(om, packet, cam, 1.0, precision,
                                       impl=impl)
            return -contrast_mod.contrast(iwe, 0)

        f_j = jax.jit(obj)
        vg_j = jax.jit(jax.value_and_grad(obj))
        bench(f"fwd    {precision}/{impl}", f_j, omega)
        bench(f"fwdbwd {precision}/{impl}", vg_j, omega)

# pieces (auto impl, highest)
warp_j = jax.jit(lambda om: warp_local.warp_events(om, packet, cam))
bench("warp only", warp_j, omega)


# Amortized: chain N dependent evals inside ONE program; marginal cost per
# eval = (t(N2) - t(N1)) / (N2 - N1), immune to the ~26 ms tunnel RPC floor.
def chained(n_iters, precision, impl, grad):
    def obj(om):
        iwe = warp_local.local_iwe(om, packet, cam, 1.0, precision, impl=impl)
        return -contrast_mod.contrast(iwe, 0)

    @jax.jit
    def run(om):
        def body(_, o):
            if grad:
                f, g = jax.value_and_grad(obj)(o)
                return o + 1e-6 * g
            return o + 1e-6 * obj(o) * o
        return jax.lax.fori_loop(0, n_iters, body, om)
    return run


for precision in ("highest", "default"):
    for impl in ("auto", "xla"):
        for grad in (False, True):
            t = {}
            for N in (8, 64):
                fn = chained(N, precision, impl, grad)
                jax.block_until_ready(fn(omega))
                best = 1e9
                for _ in range(5):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(omega))
                    best = min(best, time.perf_counter() - t0)
                t[N] = best
            per = (t[64] - t[8]) / 56
            kind = "fwdbwd" if grad else "fwd"
            print(f"amortized {kind} {precision}/{impl}: {per*1e6:.0f} us/eval")
