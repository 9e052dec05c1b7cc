"""Sweep the Pallas kernel lane width on TPU (dependent-chain timing)."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from cmax_slam_tpu.ops.pallas_iwe import bilinear_accumulate_pallas

H, W = 180, 240
n = 1 << 20
rng = np.random.default_rng(0)
px = jnp.asarray(rng.uniform(1, W - 2, n), jnp.float32)
py = jnp.asarray(rng.uniform(1, H - 2, n), jnp.float32)
w = jnp.ones(n, jnp.float32)

for lane in (512, 1024, 2048, 4096):
    def step(c, i, lane=lane):
        out = bilinear_accumulate_pallas(px + c * 1e-12 + i * 1e-9, py, w,
                                         H, W, "highest", lane)
        return jnp.mean(out), None

    @functools.partial(jax.jit, static_argnums=0)
    def chain(k, step=step):
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(k, dtype=jnp.float32))
        return c

    try:
        jax.block_until_ready(chain(16))
        t0 = time.perf_counter(); jax.block_until_ready(chain(16))
        dt = (time.perf_counter() - t0) / 16
        print(f"lane {lane}: {n/dt/1e6:.1f} M ev/s ({dt*1e3:.2f} ms)")
    except Exception as e:
        print(f"lane {lane}: FAILED {type(e).__name__}: {str(e)[:120]}")
