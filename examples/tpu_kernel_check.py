"""TPU validation of the fused Pallas vote-accumulation kernel:
correctness vs the XLA matmul-vote path, gradient parity, and throughput."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from cmax_slam_tpu.ops import scatter
from cmax_slam_tpu.ops.pallas_iwe import bilinear_accumulate_pallas

H, W = 180, 240
n = 1 << 20
rng = np.random.default_rng(0)
px = jnp.asarray(rng.uniform(-3, W + 3, n), jnp.float32)
py = jnp.asarray(rng.uniform(-3, H + 3, n), jnp.float32)
w = jnp.asarray((rng.uniform(size=n) > 0.05).astype(np.float32))

xla_f = jax.jit(lambda a, b, c: scatter.bilinear_accumulate(
    a, b, c, height=H, width=W, precision="highest"))
pls_f = jax.jit(lambda a, b, c: bilinear_accumulate_pallas(a, b, c, H, W, "highest"))
pls_fast = jax.jit(lambda a, b, c: bilinear_accumulate_pallas(a, b, c, H, W, "default"))

ref = xla_f(px, py, w).block_until_ready()
out = pls_f(px, py, w).block_until_ready()
err = float(jnp.max(jnp.abs(out - ref)))
rel = err / float(jnp.max(ref))
print(f"forward max abs err = {err:.6f} (rel {rel:.2e}), sum ref={float(ref.sum()):.1f} pallas={float(out.sum()):.1f}")

# gradient parity on a smaller problem
ns = 4096
pxs, pys, ws = px[:ns], py[:ns], w[:ns]
key = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)

def loss_xla(a, b, c):
    return jnp.vdot(key, scatter.bilinear_accumulate(a, b, c, height=H, width=W))

def loss_pls(a, b, c):
    return jnp.vdot(key, bilinear_accumulate_pallas(a, b, c, H, W))

g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(pxs, pys, ws)
g_pls = jax.jit(jax.grad(loss_pls, argnums=(0, 1, 2)))(pxs, pys, ws)
for name, a, b in zip("px py w".split(), g_xla, g_pls):
    d = float(jnp.max(jnp.abs(a - b)))
    m = float(jnp.max(jnp.abs(a))) + 1e-12
    print(f"grad {name}: max abs diff {d:.6f} (rel {d/m:.2e})")

# throughput
for name, f in [("xla", xla_f), ("pallas-highest", pls_f), ("pallas-default", pls_fast)]:
    f(px, py, w).block_until_ready()
    reps = 50
    t0 = time.perf_counter()
    acc = None
    for i in range(reps):
        acc = f(px + 1e-6 * i, py, w)
    acc.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{name}: {reps * n / dt / 1e6:.1f} M votes(events)/s")
