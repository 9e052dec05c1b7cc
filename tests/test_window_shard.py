"""Event-parallel sharded window objective (parallel/window_shard.py):
value/gradient parity with the single-device objective on the virtual
8-device mesh, and a full FR-CG solve through the sharded objective."""

import numpy as np
import jax
import jax.numpy as jnp

from cmax_slam_tpu.calib import EquirectCamera
from cmax_slam_tpu.config import OptimOptions
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops import optim, warp_pano
from cmax_slam_tpu.ops.warp_pano import PanoWindow
from cmax_slam_tpu.parallel import sharding
from cmax_slam_tpu.parallel.window_shard import (
    make_sharded_pano_objective, shard_window_events,
)


def _make_window(n_events=12_000, B=120, K=5, seed=2):
    """A realistic window: events from a rotating camera, linear sub-spline
    knots slightly off the true motion (so the solve has work to do)."""
    W, H, FXY = 120, 90, 90.0
    E = n_events // B
    rng = np.random.default_rng(seed)
    omega = np.array([0.7, -1.0, 1.5])
    dur = 0.2
    ev = synthetic.rotating_camera_events(
        rng, n_events, dur, omega, FXY, FXY, W / 2, H / 2, W, H, n_points=250
    )
    lut = synthetic.identity_lut(W, H, FXY, FXY, W / 2, H / 2)
    idx = ev.ys.astype(np.int64) * W + ev.xs.astype(np.int64)
    bearings = lut[idx].T.astype(np.float32)  # (3, N)

    dt_knots = 0.05
    from cmax_slam_tpu import spline
    knots = np.stack([
        spline._np_quat_exp(omega * (k * dt_knots) + 0.004 * rng.normal(size=3))
        for k in range(K)
    ]).astype(np.float32)

    batch_mid = np.array([
        ev.ts[b * E] + 0.5 * (ev.ts[min((b + 1) * E, n_events) - 1]
                              - ev.ts[b * E])
        for b in range(B)
    ], np.float32)
    pano = EquirectCamera(width=512, height=256)
    win = PanoWindow(
        bearings=jnp.asarray(bearings),
        batch_times=jnp.asarray(batch_mid),
        weights=jnp.ones(n_events, jnp.float32),
        is_old=jnp.zeros(n_events, bool),
        knots=jnp.asarray(knots),
        free_mask=jnp.asarray(np.concatenate([[0.0], np.ones(K - 1)]),
                              jnp.float32),
        t0=jnp.float32(0.0),
        dt_knots=jnp.float32(dt_knots),
        ig_prime=jnp.zeros((256, 512), jnp.float32),
        alpha=jnp.float32(0.0),
    )
    return win, pano


def test_sharded_objective_matches_single_device():
    win, pano = _make_window()
    mesh = sharding.make_mesh(8)
    K = win.knots.shape[0]

    f_ref, vg_ref = warp_pano.make_pano_objective(win, pano, 2, 1.0, 0)
    win_sh = shard_window_events(win, mesh)
    f_sh, vg_sh = make_sharded_pano_objective(mesh, win_sh, pano, 2, 1.0, 0)

    x = jnp.asarray(
        0.01 * np.random.default_rng(0).normal(size=3 * K), jnp.float32)
    v_ref, g_ref = vg_ref(x)
    v_sh, g_sh = vg_sh(x)
    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-6)


def test_sharded_objective_padding_is_neutral():
    """A batch axis that does NOT divide the mesh gets zero-weight padding;
    the objective must be unchanged."""
    win, pano = _make_window(n_events=11_700, B=117)  # 117 % 8 != 0
    mesh = sharding.make_mesh(8)
    f_ref, _ = warp_pano.make_pano_objective(win, pano, 2, 1.0, 0)
    win_sh = shard_window_events(win, mesh)
    assert win_sh.batch_times.shape[0] % 8 == 0
    f_sh, _ = make_sharded_pano_objective(mesh, win_sh, pano, 2, 1.0, 0)
    x = jnp.zeros(3 * win.knots.shape[0], jnp.float32)
    np.testing.assert_allclose(float(f_sh(x)), float(f_ref(x)), rtol=2e-5)


def test_sharded_objective_padding_big_pano():
    """Regression: padding batches used to carry ZERO bearings, and the
    equirect projection's y/||ray|| then produced NaN which the weight-0
    vote spread as 0*NaN through the big-pano SCATTER path (surfaced as a
    NaN objective at B=1300 on the 8-device mesh, ECRot-scale table).
    Padded rays are now valid unit-ish vectors; the objective must be
    finite and match the single-device value."""
    win, _ = _make_window(n_events=13_000, B=130)  # 130 % 8 = 2 -> pad 6
    pano = EquirectCamera(width=4096, height=2048)
    win = win._replace(ig_prime=jnp.zeros((2048, 4096), jnp.float32))
    mesh = sharding.make_mesh(8)
    f_ref, _ = warp_pano.make_pano_objective(win, pano, 2, 1.0, 0)
    win_sh = shard_window_events(win, mesh)
    f_sh, _ = make_sharded_pano_objective(mesh, win_sh, pano, 2, 1.0, 0)
    x = jnp.zeros(3 * win.knots.shape[0], jnp.float32)
    a, b = float(f_sh(x)), float(f_ref(x))
    assert np.isfinite(a), "sharded objective is NaN"
    np.testing.assert_allclose(a, b, rtol=2e-5)


def test_sharded_window_solve_converges():
    """FR-CG through the sharded objective recovers the knot perturbation
    (the full multi-chip BA path: warp/votes sharded, psum per eval)."""
    win, pano = _make_window()
    mesh = sharding.make_mesh(8)
    K = win.knots.shape[0]
    win_sh = shard_window_events(win, mesh)
    f, vg = make_sharded_pano_objective(mesh, win_sh, pano, 2, 1.0, 0)
    o = OptimOptions(grad_tol=1e-4, line_search_tol=0.1)
    res = optim.minimize_fr_cg(
        vg, jnp.zeros(3 * K, jnp.float32), f_fn=f,
        max_line_searches=o.max_line_searches,
        initial_step=o.initial_step, line_search_tol=o.line_search_tol,
        grad_tol=o.grad_tol, fun_tol=o.fun_tol,
    )
    assert float(res.fun) < float(res.f0) - 1e-4, (
        f"no contrast improvement: {float(res.f0)} -> {float(res.fun)}")
    assert int(res.iters) > 0
