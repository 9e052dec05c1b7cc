"""FOV-crop back-end objective: exactness vs the full-panorama objective.

The crop solver (backend.py _get_crop_solver, warp_pano.make_crop_objective)
evaluates each window's contrast on a crop around the warped-event footprint
plus per-window-constant outside statistics. These tests assert the crop
objective's VALUE and GRADIENT equal the full-pano objective's (same alpha),
including with a non-empty global map, for all three contrast measures, and
that the backend integration (plan / escape check / fallback) behaves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmax_slam_tpu.config import (
    IMAGE_GRADIENT_MAGNITUDE_CONTRAST,
    MEAN_SQUARE_CONTRAST,
    VARIANCE_CONTRAST,
)
from cmax_slam_tpu.ops import warp_pano
from cmax_slam_tpu.ops.blur import gaussian_blur, opencv_ksize

from test_pano import _make_window


def _smooth_map(rng, Hp, Wp):
    """Non-negative smooth global map exercising the alpha blend."""
    ig = np.zeros((Hp, Wp), np.float32)
    ys = rng.integers(0, Hp, 200)
    xs = rng.integers(0, Wp, 200)
    ig[ys, xs] = rng.uniform(1.0, 6.0, 200).astype(np.float32)
    return np.asarray(gaussian_blur(jnp.asarray(ig), 3.0)) * 4.0


def _plan_for_test(win, pano, order, blur_sigma, measure, margin=10.0,
                   ladder=(64, 96, 128, 192, 256, 512)):
    """Minimal host planner mirroring Backend._plan_crop's invariants."""
    bbox = np.asarray(
        warp_pano.warp_bbox(
            jnp.zeros((win.knots.shape[0], 3), jnp.float32), win, pano, order
        )
    )
    pxm, pxM, pym, pyM = (float(v) for v in bbox)
    r = opencv_ksize(blur_sigma) // 2 if blur_sigma > 0 else 0
    h = r + (1 if measure == IMAGE_GRADIENT_MAGNITUDE_CONTRAST else 0)
    pad = margin + 2 * h + 2
    H, W = pano.height, pano.width

    def bucket(need, dim):
        for b in ladder:
            if b >= need:
                return min(b, dim)
        return dim

    Wc = bucket(pxM - pxm + 2 * pad, W)
    Hc = bucket(pyM - pym + 2 * pad, H)
    x0 = min(max(int(round(0.5 * (pxm + pxM) - Wc / 2)), 0), W - Wc)
    y0 = min(max(int(round(0.5 * (pym + pyM) - Hc / 2)), 0), H - Hc)
    vx0 = h if x0 > 0 else 0
    vx1 = Wc - (h if x0 + Wc < W else 0)
    vy0 = h if y0 > 0 else 0
    vy1 = Hc - (h if y0 + Hc < H else 0)
    return Hc, Wc, np.array([y0, x0, vy0, vy1, vx0, vx1], np.int32)


@pytest.mark.parametrize(
    "measure",
    [VARIANCE_CONTRAST, MEAN_SQUARE_CONTRAST, IMAGE_GRADIENT_MAGNITUDE_CONTRAST],
)
def test_crop_objective_matches_full(rng, measure):
    blur_sigma = 1.0
    order = 2
    win, pano, ev, omega = _make_window(rng, n_events=4096)
    ig = _smooth_map(rng, pano.height, pano.width)
    win = win._replace(ig_prime=jnp.asarray(ig))
    K = win.knots.shape[0]

    Hc, Wc, ints = _plan_for_test(win, pano, order, blur_sigma, measure)
    assert (Hc, Wc) != (pano.height, pano.width), "crop degenerated to full"

    win_c, x0f, y0f, a_crop, mask, out_s1, out_s2 = jax.jit(
        lambda w, ci: warp_pano.crop_window_constants(
            w, pano, order, blur_sigma, measure, (Hc, Wc), ci
        ),
        static_argnums=(),
    )(win, jnp.asarray(ints))
    assert float(win_c.alpha) > 0.0  # non-empty map engaged the blend

    f_crop, vg_crop = warp_pano.make_crop_objective(
        win_c, pano, order, blur_sigma, measure, (Hc, Wc),
        x0f, y0f, a_crop, mask, out_s1, out_s2,
    )
    win_full = win._replace(alpha=win_c.alpha)
    f_full, vg_full = warp_pano.make_pano_objective(
        win_full, pano, order, blur_sigma, measure
    )
    fc = jax.jit(vg_crop)
    ff = jax.jit(vg_full)

    for scale in (0.0, 0.005, 0.02):
        d = (rng.normal(size=3 * K) * scale).astype(np.float32)
        v_c, g_c = fc(jnp.asarray(d))
        v_f, g_f = ff(jnp.asarray(d))
        np.testing.assert_allclose(
            float(v_c), float(v_f), rtol=2e-4,
            err_msg=f"measure={measure} scale={scale}",
        )
        np.testing.assert_allclose(
            np.asarray(g_c), np.asarray(g_f), rtol=2e-3, atol=1e-6,
            err_msg=f"measure={measure} scale={scale}",
        )


def test_crop_objective_matches_full_at_image_border(rng):
    """Crop clamped to the image border: reflect-101 semantics coincide."""
    measure = VARIANCE_CONTRAST
    blur_sigma = 1.0
    order = 2
    win, pano, ev, omega = _make_window(rng, n_events=4096)
    ig = _smooth_map(rng, pano.height, pano.width)
    win = win._replace(ig_prime=jnp.asarray(ig))
    K = win.knots.shape[0]
    r = opencv_ksize(blur_sigma) // 2
    h = r

    # Footprint sits near the pano center; take a full-height band so the
    # crop's top/bottom edges ARE the image border (vy0=0, vy1=Hc).
    Hc, Wc = pano.height, 128
    bbox = np.asarray(
        warp_pano.warp_bbox(jnp.zeros((K, 3), jnp.float32), win, pano, order)
    )
    x0 = min(max(int(0.5 * (bbox[0] + bbox[1]) - Wc / 2), 0), pano.width - Wc)
    ints = np.array([0, x0, 0, Hc, h, Wc - h], np.int32)

    win_c, x0f, y0f, a_crop, mask, out_s1, out_s2 = (
        warp_pano.crop_window_constants(
            win, pano, order, blur_sigma, measure, (Hc, Wc), jnp.asarray(ints)
        )
    )
    f_crop, _ = warp_pano.make_crop_objective(
        win_c, pano, order, blur_sigma, measure, (Hc, Wc),
        x0f, y0f, a_crop, mask, out_s1, out_s2,
    )
    f_full, _ = warp_pano.make_pano_objective(
        win._replace(alpha=win_c.alpha), pano, order, blur_sigma, measure
    )
    z = jnp.zeros(3 * K, jnp.float32)
    np.testing.assert_allclose(float(f_crop(z)), float(f_full(z)), rtol=2e-4)


def test_backend_crop_plan_and_escape_geometry():
    """Unit checks of the host-side planner + escape test (no solving)."""
    from cmax_slam_tpu.backend import Backend
    from cmax_slam_tpu.config import BackendConfig, PanoMapOptions
    from cmax_slam_tpu.io.events import EventStore

    cfg = BackendConfig(
        pano_map=PanoMapOptions(pano_height=512, pano_width=1024)
    )
    be = Backend(120, 90, np.zeros((120 * 90, 3), np.float32), cfg,
                 EventStore())
    h = be._crop_halo()
    assert h == opencv_ksize(cfg.warp.blur_sigma) // 2

    # interior crop: all four edges carry the halo
    Hc, Wc = 128, 256
    ints = np.array([100, 300, h, Hc - h, h, Wc - h], np.int32)
    inside = np.array([300 + Wc / 2, 300 + Wc / 2, 100 + Hc / 2, 100 + Hc / 2])
    assert not be._crop_escaped(inside, ints, Hc, Wc, h)
    # px max within h of the right valid edge -> escaped
    near_edge = np.array([310.0, 300 + Wc - h - 1, 150.0, 160.0])
    assert be._crop_escaped(near_edge, ints, Hc, Wc, h)
    # non-finite bbox -> escaped (degenerate window)
    assert be._crop_escaped(np.array([np.inf, -np.inf, np.inf, -np.inf]),
                            ints, Hc, Wc, h)
    # border edge (vx0 = 0): no constraint on that side
    ints_b = np.array([100, 0, h, Hc - h, 0, Wc - h], np.int32)
    at_border = np.array([0.5, 100.0, 150.0, 160.0])
    assert not be._crop_escaped(at_border, ints_b, Hc, Wc, h)


def test_backend_solves_windows_with_crop(rng):
    """Backend integration: the crop solver runs (metric counted) and the
    contrast improves initial -> final on every BA window."""
    from cmax_slam_tpu import spline
    from cmax_slam_tpu.calib import CameraCalibration
    from cmax_slam_tpu.config import (
        BackendConfig, FrontendConfig, PanoMapOptions, SlidingWindowOptions,
        SystemConfig, TrajectoryOptions, WarpOptions,
    )
    from cmax_slam_tpu.io import synthetic
    from cmax_slam_tpu.system import CMaxSLAM

    W, H, FXY = 120, 90, 90.0
    duration = 0.62
    omega = np.array([0.5, -1.1, 1.6])
    n = 50000
    ev = synthetic.rotating_camera_events(
        rng, n, duration, omega, FXY, FXY, W / 2, H / 2, W, H, n_points=250
    )
    calib = CameraCalibration(
        width=W, height=H,
        K=np.array([[FXY, 0, W / 2], [0, FXY, H / 2], [0, 0, 1.0]]),
    )
    cfg = SystemConfig(
        frontend=FrontendConfig(
            num_events_per_packet=4000, dt_ang_vel=0.02,
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
        ),
        backend=BackendConfig(
            sliding_window=SlidingWindowOptions(0.2, 0.1),
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
            trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=1),
            pano_map=PanoMapOptions(
                pano_height=256, pano_width=512, backend_min_ev_rate=10000,
                max_update_times=200,
            ),
        ),
    )
    slam = CMaxSLAM(calib, cfg)
    for i in range(0, n, 10000):
        slam.push_events(ev.xs[i:i+10000], ev.ys[i:i+10000],
                         ev.ts[i:i+10000], ev.pols[i:i+10000])
    results = [r for r in slam.window_results() if r.ran_ba]
    assert len(results) >= 3
    counters = slam.backend.metrics.counters
    assert counters.get("backend.crop_windows", 0) >= 1, counters
    for r in results:
        assert r.final_cost <= r.initial_cost + 1e-7, r
    # trajectory tracks the constant-rate rotation
    traj = slam.backend.traj
    times = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 40)
    q_est = traj.evaluate(times)
    R_est = np.stack([spline._np_quat_rotmat(q) for q in q_est])
    R_gt = np.stack([
        spline._np_quat_rotmat(spline._np_quat_exp(omega * t)) for t in times
    ])
    R_align = R_gt[0] @ R_est[0].T
    errs = [
        np.degrees(np.arccos(np.clip(
            (np.trace(R_gt[i].T @ (R_align @ R_est[i])) - 1) / 2, -1, 1)))
        for i in range(len(times))
    ]
    rms = float(np.sqrt(np.mean(np.square(errs))))
    assert rms < 0.5, f"trajectory RMS {rms} deg"
