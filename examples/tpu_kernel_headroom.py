"""Decompose the hot-path eval (warp -> Pallas vote kernel -> blur) on TPU
and sweep the vote kernel's (rows, lane) tiling for headroom (VERDICT r4
item 7: forward kernel ran ~6% of bf16 peak at ROWS=8, LANE=2048).

Each stage is timed as a dependent chain (lax.scan, each iteration's input
perturbed by the previous output) so device executions strictly serialize —
the same honest-throughput methodology as bench.py.

Usage: python examples/tpu_kernel_headroom.py   (needs the TPU; ~2 min)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/jax_cache_bench", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cmax_slam_tpu.io import synthetic
    from cmax_slam_tpu.ops import warp_local
    from cmax_slam_tpu.ops.blur import gaussian_blur
    from cmax_slam_tpu.ops.pallas_iwe import bilinear_accumulate_pallas

    W, H = 240, 180
    FX = FY = 180.0
    cam = warp_local.CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2,
                                  width=W, height=H)
    n = 1 << 20
    rng = np.random.default_rng(0)
    omega_true = np.array([1.2, -2.0, 3.0])
    ev = synthetic.rotating_camera_events(
        rng, n, 0.2, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400
    )
    lut = jnp.asarray(synthetic.identity_lut(W, H, FX, FY, W / 2, H / 2))
    t_ref = 0.5 * (ev.ts[0] + ev.ts[-1])
    packet = warp_local.make_packet(
        jnp.asarray(ev.xs), jnp.asarray(ev.ys),
        jnp.asarray(ev.ts - ev.ts[0], jnp.float32),
        jnp.ones(n, bool), lut, cam, 256, np.float32(t_ref - ev.ts[0]),
    )
    packet = jax.tree.map(jax.block_until_ready, packet)
    omega0 = jnp.asarray(omega_true * 0.9, jnp.float32)
    reps = 24

    def timed(step_fn, *fixed):
        @functools.partial(jax.jit, static_argnums=0)
        def chain(k, *args):
            c, _ = jax.lax.scan(
                lambda carry, i: (step_fn(carry, i, *args), None),
                jnp.float32(0.0), jnp.arange(k, dtype=jnp.float32))
            return c

        chain(reps, *fixed).block_until_ready()
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chain(reps, *fixed).block_until_ready()
            dt = min(dt, time.perf_counter() - t0)
        return reps * n / dt

    # -- full eval (the bench.py number): warp + pallas vote + blur, default
    def full_step(carry, i):
        omega = omega0 + carry * 1e-12 + i * 1e-6
        iwe = warp_local.local_iwe(omega, warp_local.EventPacket(*packet),
                                   cam, 1.0, precision="default")
        return jnp.mean(iwe)

    print(f"full eval (warp+vote+blur, default): "
          f"{timed(full_step) / 1e6:8.1f} M ev/s", flush=True)

    # -- warp only: rotation + projection, reduced (no votes, no blur)
    def warp_step(carry, i):
        omega = omega0 + carry * 1e-12 + i * 1e-6
        px, py = warp_local.warp_events(
            omega, warp_local.EventPacket(*packet), cam)
        return jnp.mean(px) + jnp.mean(py)

    print(f"warp only:                            "
          f"{timed(warp_step) / 1e6:8.1f} M ev/s", flush=True)

    # -- warp in component-major (3, N) layout: does dodging the (N, 3)
    # narrow-lane layout matter, or does XLA's layout assignment already
    # store it transposed?
    b3 = jax.block_until_ready(packet.bearings.T.copy())

    def warp_cm_step(carry, i, b, dts):
        omega = omega0 + carry * 1e-12 + i * 1e-6
        dx, dy, dz = dts * omega[0], dts * omega[1], dts * omega[2]
        bx, by, bz = b
        rx = bx + dy * bz - dz * by
        ry = by + dz * bx - dx * bz
        rz = bz + dx * by - dy * bx
        inv_z = 1.0 / rz
        px = cam.fx * rx * inv_z + cam.cx
        py = cam.fy * ry * inv_z + cam.cy
        return jnp.mean(px) + jnp.mean(py)

    print(f"warp only, component-major (3, N):    "
          f"{timed(warp_cm_step, b3, packet.dts) / 1e6:8.1f} M ev/s",
          flush=True)

    # -- blur only (per-eval cost expressed against the 1M-event packet).
    # NB the perturbation must be NONLINEAR (abs): blur is linear, so any
    # affine perturbation lets XLA hoist the loop-invariant matmuls out of
    # the scan and the chain measures nothing.
    iwe0 = jax.block_until_ready(warp_local.local_iwe(
        omega0, warp_local.EventPacket(*packet), cam, 1.0,
        precision="default"))

    def blur_step(carry, i, img):
        return jnp.mean(gaussian_blur(jnp.abs(img - carry * 1e-6 - i * 1e-9),
                                      1.0, precision="default"))

    print(f"blur only:                            "
          f"{timed(blur_step, iwe0) / 1e6:8.1f} M ev/s", flush=True)

    # -- vote kernel only, (rows, lane) sweep at default precision
    px0, py0 = warp_local.warp_events(
        omega0, warp_local.EventPacket(*packet), cam)
    px0, py0 = jax.block_until_ready((px0, py0))
    w0 = packet.weights

    def vote_step(rows, lane, prec, orient, carry, i, px, py, w):
        pxp = px + carry * 1e-12 + i * 1e-9
        iwe = bilinear_accumulate_pallas(pxp, py, w, H, W, prec, lane, rows,
                                         orient)
        return jnp.mean(iwe)

    # Hat/contraction orientation is the main experiment (the 'rows' layout
    # contracts over the sublane dim — suspected relayout cost); rows/lane
    # tiling is secondary (measured <= +4% at rows=64 lane=4096).
    # lane=4096 at 'highest' exceeds scoped VMEM (the 3-pass contraction
    # keeps more live) — probe only configs real callers can reach.
    for prec in ("default", "highest"):
        for orient in ("rows", "mixed", "lanes"):
            for rows in (8, 32):
                for lane in (2048,) if prec == "highest" else (2048, 4096):
                    rate = timed(
                        functools.partial(vote_step, rows, lane, prec, orient),
                        px0, py0, w0)
                    print(f"vote kernel orient={orient:5s} rows={rows:3d} "
                          f"lane={lane:5d} prec={prec:8s}: "
                          f"{rate / 1e6:8.1f} M ev/s", flush=True)

    # -- value_and_grad through the kernel (what each solver iteration pays)
    def vjp_step(prec, orient, carry, i, px, py, w):
        def f(p):
            return jnp.mean(bilinear_accumulate_pallas(
                p, py, w, H, W, prec, 2048, 8, orient))
        v, gr = jax.value_and_grad(f)(px + carry * 1e-12 + i * 1e-9)
        return v + jnp.mean(gr)

    for prec in ("default", "highest"):
        for orient in ("rows", "lanes"):
            rate = timed(functools.partial(vjp_step, prec, orient),
                         px0, py0, w0)
            print(f"vote fwd+VJP orient={orient:5s} prec={prec:8s}: "
                  f"{rate / 1e6:8.1f} M ev/s", flush=True)


if __name__ == "__main__":
    main()
