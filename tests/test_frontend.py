"""Front-end driver: packet windowing semantics + tracking on a synthetic
constant-rotation stream (reference: ang_vel_estimator.cpp:68-189)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmax_slam_tpu.config import FrontendConfig, WarpOptions
from cmax_slam_tpu.frontend import Frontend
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops.warp_local import CameraParams

W, H = 240, 180
FX = FY = 180.0
CX, CY = W / 2, H / 2
CAM = CameraParams(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H)
LUT = synthetic.identity_lut(W, H, FX, FY, CX, CY)


def test_packet_trigger_semantics(monkeypatch):
    """Packets are centered on the cursor-crossing event: [i+1-half, i+1+half),
    cursors on the grid t0 + dt/2 + k*dt (ang_vel_estimator.cpp:74-97)."""
    # batch_sweeps=0: route every packet through _process_packet so the
    # monkeypatch below observes the spans (the stride-batched path shares
    # the same _scan_triggers windowing, exercised by the batched tests).
    cfg = FrontendConfig(num_events_per_packet=6, dt_ang_vel=0.1,
                         warp=WarpOptions(event_batch_size=2),
                         batch_sweeps=0)
    fe = Frontend(CAM, LUT, cfg)
    processed = []
    monkeypatch.setattr(
        fe, "_process_packet",
        lambda beg, end: processed.append((beg, end)) or None,
    )
    # events at t = 0.00, 0.01, ..., 0.30 (31 events); first at 0 =>
    # cursor_0 = 0.05: first crossing is event idx 6 (t=0.06) -> subset [4, 10)
    ts = np.arange(31) * 0.01
    fe.push_events(np.zeros(31, np.int32), np.zeros(31, np.int32), ts,
                   np.ones(31, np.int8))
    # cursor_1 = 0.15 -> idx 16 -> [14, 20); cursor_2 = 0.25 -> idx 26 -> [24, 30)
    assert processed[0] == (4, 10)
    assert processed[1] == (14, 20)
    assert processed[2] == (24, 30)
    # last pending subset [24+..] completes only when total > 30 events


def test_degenerate_packet_gives_zero_omega():
    """A packet spanning > 10*dt_ang_vel yields omega = 0
    (ang_vel_estimator.cpp:108-114)."""
    cfg = FrontendConfig(num_events_per_packet=8, dt_ang_vel=0.01,
                         warp=WarpOptions(event_batch_size=4))
    fe = Frontend(CAM, LUT, cfg)
    # 20 events spread over 2 seconds (sparse; every packet degenerate)
    ts = np.linspace(0, 2.0, 20)
    ests = fe.push_events(
        np.full(20, 10, np.int32), np.full(20, 10, np.int32), ts,
        np.ones(20, np.int8),
    )
    assert len(ests) >= 1
    for e in ests:
        np.testing.assert_array_equal(e.omega, 0.0)


def test_tracking_constant_rotation(rng):
    """Stream a constant-omega synthetic sequence through the front-end and
    check every grid estimate (BASELINE config 2 miniature)."""
    omega_true = np.array([0.9, -1.4, 2.2])
    n = 60000
    ev = synthetic.rotating_camera_events(
        rng, n, 0.3, omega_true, FX, FY, CX, CY, W, H, n_points=300
    )
    cfg = FrontendConfig(
        num_events_per_packet=8000, dt_ang_vel=0.02,
        warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
    )
    fe = Frontend(CAM, LUT, cfg)
    # stream in chunks like the subscriber callback would
    for i in range(0, n, 10000):
        fe.push_events(ev.xs[i:i+10000], ev.ys[i:i+10000],
                       ev.ts[i:i+10000], ev.pols[i:i+10000])
    assert len(fe.estimates) >= 8
    errs = [np.linalg.norm(e.omega - omega_true) for e in fe.estimates[1:]]
    assert np.median(errs) < 0.08, f"median omega error {np.median(errs)}"
    # timestamps are on the rigid grid
    t_grid = np.array([e.t for e in fe.estimates])
    np.testing.assert_allclose(np.diff(t_grid), cfg.dt_ang_vel, atol=1e-9)


def test_coarse_to_fine_cold_start_fast_motion(rng):
    """Very fast rotation (|omega| ~ 5.7 rad/s) from a cold start: the
    3x-blurred coarse stage widens the basin of attraction (capability beyond
    the reference, config.FrontendConfig.coarse_to_fine)."""
    omega_true = np.array([2.0, -3.5, 4.0])
    n = 30000
    ev = synthetic.rotating_camera_events(
        rng, n, 0.12, omega_true, FX, FY, CX, CY, W, H, n_points=300
    )
    cfg = FrontendConfig(
        num_events_per_packet=8000, dt_ang_vel=0.02,
        warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
        coarse_to_fine=True,
    )
    fe = Frontend(CAM, LUT, cfg)
    fe.push_events(ev.xs, ev.ys, ev.ts, ev.pols)
    assert len(fe.estimates) >= 3
    errs = [np.linalg.norm(e.omega - omega_true) for e in fe.estimates]
    # cold-start first packet included: all packets should lock on
    assert np.median(errs) < 0.25, f"errs={np.round(errs, 3)}"


def test_batched_matches_sequential(rng):
    """The stride-batched solver (batch_sweeps=2) must reproduce the
    sequential warm-start chain's estimates on a time-varying rotation
    (identical objective and convergence tests; only scheduling differs)."""
    duration = 0.3

    def omega_fn(t):
        return np.array([0.9 * np.sin(2 * np.pi * t),
                         -1.4 * np.cos(2 * np.pi * 0.7 * t),
                         2.0 * np.sin(2 * np.pi * 0.4 * t + 0.3)])

    # integrate omega(t) into a rotation profile
    from cmax_slam_tpu import spline as sp
    dt_int = 1e-3
    steps = int(duration / dt_int) + 2
    qs = [np.array([1.0, 0, 0, 0])]
    for i in range(1, steps):
        qs.append(sp._np_quat_mul(
            qs[-1], sp._np_quat_exp(omega_fn((i - 0.5) * dt_int) * dt_int)))
    mats = np.stack([sp._np_quat_rotmat(q) for q in qs])

    def rot_fn(t):
        idx = np.clip((np.atleast_1d(t) / dt_int).astype(int), 0, steps - 1)
        return mats[idx]

    n = 60000
    ev = synthetic.rotating_camera_events(
        rng, n, duration, np.zeros(3), FX, FY, CX, CY, W, H, n_points=300,
        rot_fn=rot_fn,
    )

    def run(sweeps):
        cfg = FrontendConfig(
            num_events_per_packet=8000, dt_ang_vel=0.02,
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
            batch_sweeps=sweeps,
        )
        fe = Frontend(CAM, LUT, cfg)
        for i in range(0, n, 20000):
            fe.push_events(ev.xs[i:i+20000], ev.ys[i:i+20000],
                           ev.ts[i:i+20000], ev.pols[i:i+20000])
        fe.finalize_batch(fe.estimates)
        return np.array([e.omega for e in fe.estimates])

    om_seq = run(0)
    om_bat = run(2)
    assert om_seq.shape == om_bat.shape and len(om_seq) >= 10
    diff = np.linalg.norm(om_seq - om_bat, axis=1)
    assert np.max(diff) < 0.05, f"batched vs sequential diff {diff}"
