"""Equirectangular camera + pano warp objective (back-end hot path,
event_pano_warper.cpp / equirectangular_camera.h)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmax_slam_tpu import lie, spline
from cmax_slam_tpu.calib import EquirectCamera
from cmax_slam_tpu.ops import warp_pano
from cmax_slam_tpu.ops.warp_pano import PanoWindow


def test_equirect_projection_landmarks():
    pano = EquirectCamera(width=256, height=128)
    # +z (forward) -> map center
    uv = np.asarray(pano.project(jnp.asarray([[0.0, 0.0, 1.0]])))[0]
    np.testing.assert_allclose(uv, [128.0, 64.0], atol=1e-5)
    # +x -> phi = pi/2 -> cx + (pi/2) * W/(2pi) = cx + W/4
    uv = np.asarray(pano.project(jnp.asarray([[1.0, 0.0, 0.0]])))[0]
    np.testing.assert_allclose(uv, [128.0 + 64.0, 64.0], atol=1e-4)
    # +y (down) -> theta = pi/2 -> cy + H/2
    uv = np.asarray(pano.project(jnp.asarray([[0.0, 1.0, 1e-8]])))[0]
    np.testing.assert_allclose(uv[1], 128.0, atol=1e-3)


def test_equirect_jacobian_matches_reference_formula(rng):
    """Autodiff of project == the closed-form 2x3 Jacobian hand-coded at
    equirectangular_camera.h:31-43."""
    pano = EquirectCamera(width=512, height=256)
    fx, fy = pano.fx, pano.fy
    for _ in range(10):
        P = rng.normal(size=3)
        P[2] = abs(P[2]) + 0.5
        x, y, z = P
        rho = np.linalg.norm(P)
        J_auto = np.asarray(jax.jacobian(pano.project)(jnp.asarray(P)))
        XdivZ = x / z
        tmp1 = fx / ((1 + XdivZ**2) * z)
        Ydivrho = y / rho
        tmp2 = -fy / np.sqrt(1 - Ydivrho**2)
        tmp3 = Ydivrho / rho**2
        J_ref = np.array([
            [tmp1, 0.0, -tmp1 * XdivZ],
            [tmp2 * tmp3 * x, tmp2 * (tmp3 * y - 1 / rho), tmp2 * tmp3 * z],
        ])
        np.testing.assert_allclose(J_auto, J_ref, atol=1e-7)


def test_equirect_lift_roundtrip(rng):
    pano = EquirectCamera(width=512, height=256)
    rays = rng.normal(size=(50, 3))
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    uv = pano.project(jnp.asarray(rays))
    back = np.asarray(pano.lift(uv))
    np.testing.assert_allclose(back, rays, atol=1e-6)


def _make_window(rng, n_events=4096, K=5, Hp=128, Wp=256, batch=128,
                 omega=np.array([0.6, -1.0, 1.4]), duration=0.2):
    """Synthetic window: constant-rotation trajectory, consistent events."""
    from cmax_slam_tpu.io import synthetic

    W, H = 120, 90
    FX = FY = 90.0
    CX, CY = W / 2, H / 2
    ev = synthetic.rotating_camera_events(
        rng, n_events, duration, omega, FX, FY, CX, CY, W, H, n_points=200
    )
    lut = synthetic.identity_lut(W, H, FX, FY, CX, CY)
    bearings = np.ascontiguousarray(lut[ev.ys * W + ev.xs].T)  # (3, N)

    dt_knots = duration / (K - 1)
    knot_times = np.arange(K) * dt_knots
    knots = np.stack([spline._np_quat_exp(omega * t) for t in knot_times])

    B = n_events // batch
    tsb = ev.ts.reshape(B, batch)
    batch_mid = 0.5 * (tsb[:, 0] + tsb[:, -1])

    pano = EquirectCamera(width=Wp, height=Hp)
    win = PanoWindow(
        bearings=jnp.asarray(bearings),
        batch_times=jnp.asarray(batch_mid, jnp.float32),
        weights=jnp.ones(n_events, jnp.float32),
        is_old=jnp.asarray(ev.ts < duration / 2),
        knots=jnp.asarray(knots, jnp.float32),
        free_mask=jnp.ones(K, jnp.float32),
        t0=jnp.float32(0.0),
        dt_knots=jnp.float32(dt_knots),
        ig_prime=jnp.zeros((Hp, Wp), jnp.float32),
        alpha=jnp.float32(0.0),
    )
    return win, pano, ev, omega


def test_pano_contrast_peaks_at_true_trajectory(rng):
    win, pano, ev, omega = _make_window(rng)
    K = win.knots.shape[0]
    f, vg = warp_pano.make_pano_objective(win, pano, order=2, blur_sigma=1.0,
                                          measure=0)
    fj = jax.jit(f)
    f_true = float(fj(jnp.zeros(3 * K, jnp.float32)))
    # perturb all knots coherently -> worse contrast
    for scale in (0.05, 0.15):
        d = rng.normal(size=(K, 3)).astype(np.float32) * scale
        f_pert = float(fj(jnp.asarray(d.ravel())))
        assert f_true < f_pert, (scale, f_true, f_pert)


def test_pano_ba_refines_perturbed_trajectory(rng):
    """Perturb the true knots, run the window BA, and verify the increments
    recover the truth (the CMax-BA core, global_optim_contrast_gsl.cpp)."""
    from cmax_slam_tpu.ops import optim

    win, pano, ev, omega = _make_window(rng, n_events=8192)
    K = win.knots.shape[0]
    # perturb knots (except the first, which we freeze like the reference)
    pert = rng.normal(size=(K, 3)) * 0.02
    pert[0] = 0
    knots_pert = np.asarray(
        spline.apply_masked_increments(
            win.knots, jnp.asarray(pert, jnp.float32), jnp.ones(K, jnp.float32)
        )
    )
    free = np.ones(K, np.float32)
    free[0] = 0.0
    win_p = win._replace(
        knots=jnp.asarray(knots_pert), free_mask=jnp.asarray(free)
    )
    f, vg = warp_pano.make_pano_objective(win_p, pano, order=2, blur_sigma=1.0,
                                          measure=0)
    solve = jax.jit(
        lambda x0: optim.minimize_fr_cg(vg, x0, f_fn=f, grad_tol=1e-4,
                                        fun_tol=1e-4)
    )
    res = solve(jnp.zeros(3 * K, jnp.float32))
    drotv = np.asarray(res.x).reshape(K, 3)
    knots_opt = np.asarray(
        spline.apply_masked_increments(
            jnp.asarray(knots_pert), jnp.asarray(drotv, jnp.float32),
            jnp.asarray(free),
        )
    )
    # compare optimized knots to truth (angle error per knot, frozen excluded)
    errs = []
    for i in range(1, K):
        dq = spline._np_quat_mul(
            knots_opt[i] * np.array([1.0, -1, -1, -1]), np.asarray(win.knots)[i]
        )
        errs.append(np.linalg.norm(spline._np_quat_log(dq)))
    # perturbation was ~0.02*sqrt(3) rad/knot; BA should cut it well down
    assert np.median(errs) < 0.01, f"knot errors {errs}"


def test_alpha_zero_on_empty_map():
    il = jnp.ones((16, 32))
    a = warp_pano.compute_alpha(il, jnp.zeros((16, 32)))
    assert float(a) == 0.0


def test_alpha_density_ratio():
    # IL with 10 pixels of value 2; IG' with 40 pixels of value 1
    il = jnp.zeros((32, 32)).at[:2, :5].set(2.0)
    ig = jnp.zeros((32, 32)).at[:8, :5].set(1.0)
    a = float(warp_pano.compute_alpha(il, ig))
    d_il = 20.0 / (10 * (1 - np.exp(-2)))
    d_ig = 40.0 / (40 * (1 - np.exp(-1)))
    np.testing.assert_allclose(a, d_il / d_ig, rtol=1e-5)


def test_accumulate_global_map_saturation():
    ig = jnp.zeros((4, 4))
    il = jnp.ones((4, 4))
    times = jnp.asarray(np.array([[0, 5, 11, 20]] * 4).T, jnp.int32)
    out = np.asarray(warp_pano.accumulate_global_map(ig, il, times, 10))
    np.testing.assert_array_equal(out[0], 1.0)  # count 0 <= 10
    np.testing.assert_array_equal(out[1], 1.0)  # count 5 <= 10
    np.testing.assert_array_equal(out[2], 0.0)  # count 11 > 10
    np.testing.assert_array_equal(out[3], 0.0)


def test_fov_mask_marks_footprint():
    pano = EquirectCamera(width=128, height=64)
    lut = np.zeros((100, 3), np.float32)
    lut[:, 2] = 1.0  # all rays forward
    q = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    mask = np.asarray(warp_pano.fov_mask(q, jnp.asarray(lut), pano, radius=2))
    assert mask[32, 64] == 1  # forward maps to center, dilated
    assert mask[32 - 2, 64 + 2] == 1
    assert mask[0, 0] == 0
