"""Local warp + CMax objective: geometry checks and angular-velocity recovery
on synthetic rotating-camera events (the reference's front-end hot path,
local_image_warped_events.cpp + local_optim_contrast_gsl.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmax_slam_tpu.ops import warp_local, optim
from cmax_slam_tpu.io import synthetic

W, H = 240, 180
FX = FY = 180.0
CX, CY = W / 2, H / 2
CAM = warp_local.CameraParams(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H)


def build_packet(rng, omega, n_events=8000, duration=0.04, batch_size=100):
    ev = synthetic.rotating_camera_events(
        rng, n_events, duration, omega, FX, FY, CX, CY, W, H, n_points=200
    )
    lut = jnp.asarray(synthetic.identity_lut(W, H, FX, FY, CX, CY))
    t_ref = 0.5 * (ev.ts[0] + ev.ts[-1])
    packet = warp_local.make_packet(
        jnp.asarray(ev.xs),
        jnp.asarray(ev.ys),
        jnp.asarray(ev.ts - ev.ts[0], jnp.float32),
        jnp.ones(n_events, bool),
        lut,
        CAM,
        batch_size,
        t_ref - ev.ts[0],
    )
    return packet


def test_zero_omega_zero_dt_identity(rng):
    """With omega=0 the warp must land each event on its own pixel."""
    ev = synthetic.rotating_camera_events(
        rng, 1000, 0.02, np.zeros(3), FX, FY, CX, CY, W, H
    )
    lut = jnp.asarray(synthetic.identity_lut(W, H, FX, FY, CX, CY))
    packet = warp_local.make_packet(
        jnp.asarray(ev.xs), jnp.asarray(ev.ys),
        jnp.asarray(ev.ts, jnp.float32), jnp.ones(1000, bool),
        lut, CAM, 100, 0.0,
    )
    px, py = warp_local.warp_events(jnp.zeros(3), packet, CAM)
    np.testing.assert_allclose(np.asarray(px), ev.xs, atol=1e-3)
    np.testing.assert_allclose(np.asarray(py), ev.ys, atol=1e-3)


def test_batch_midpoint_dts():
    ts = jnp.asarray(np.arange(8, dtype=np.float32))
    valid = jnp.ones(8, bool)
    dts = warp_local.batch_midpoint_dts(ts, valid, 4, 2.0)
    # batch 0: mid of [0..3] = 1.5; batch 1: mid of [4..7] = 5.5
    np.testing.assert_allclose(np.asarray(dts), [-0.5] * 4 + [3.5] * 4)


def test_contrast_peaks_at_true_omega(rng):
    omega_true = np.array([0.8, -1.5, 2.0])
    packet = build_packet(rng, omega_true)
    f, vg = warp_local.make_local_objective(packet, CAM, 1.0, 0)
    fj = jax.jit(f)
    f_true = float(fj(jnp.asarray(omega_true, jnp.float32)))
    f_zero = float(fj(jnp.zeros(3, jnp.float32)))
    assert f_true < f_zero  # objective is negative contrast
    # perturbed omegas are all worse than the truth
    for d in np.eye(3) * 0.5:
        assert f_true < float(fj(jnp.asarray(omega_true + d, jnp.float32)))


def test_cmax_recovers_omega(rng):
    omega_true = np.array([1.2, -2.0, 3.0])  # rad/s, brisk rotation
    packet = build_packet(rng, omega_true, n_events=8000)
    f, vg = warp_local.make_local_objective(packet, CAM, 1.0, 0)
    solve = jax.jit(
        lambda x0: optim.minimize_fr_cg(
            vg, x0, f_fn=f, max_line_searches=50,
            initial_step=0.1, grad_tol=1e-3, fun_tol=1e-4,
        )
    )
    res = solve(jnp.zeros(3, jnp.float32))
    # Reference tolerance story: sub-0.1 rad/s accuracy on clean synthetic data
    np.testing.assert_allclose(np.asarray(res.x), omega_true, atol=0.1)


def test_gradient_matches_finite_difference(rng):
    omega = np.array([0.5, 0.3, -0.8])
    packet = build_packet(rng, omega, n_events=8000)
    f, vg = warp_local.make_local_objective(packet, CAM, 1.0, 0)
    fj = jax.jit(f)
    _, g = jax.jit(vg)(jnp.asarray(omega, jnp.float32))
    eps = 1e-3
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        fd = (
            float(fj(jnp.asarray(omega + d, jnp.float32)))
            - float(fj(jnp.asarray(omega - d, jnp.float32)))
        ) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), fd, rtol=0.05, atol=1e-5)
