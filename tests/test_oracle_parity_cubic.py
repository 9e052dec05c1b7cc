"""Cubic-spline (reference spline_degree=3) semantic parity vs the cleanroom
scalar oracle — the order-4 companion to test_oracle_parity.py.

The oracle's CubicSpline is an independent implementation of the cumulative
SO(3) B-spline (numpy f64, standard cumulative-basis formulation); the
production system uses its own blending-matrix JAX path. Agreement checks
the spline math, the window protocol at degree 3 (first-window freeze =
``degree`` knots, reference semantics), and the shared CMax objective.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import scalar_oracle as oracle  # noqa: E402

from cmax_slam_tpu import spline as pspline
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import (
    BackendConfig, FrontendConfig, PanoMapOptions, SlidingWindowOptions,
    SystemConfig, TrajectoryOptions, WarpOptions,
)
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

# Full-tier suite: long e2e run (see pytest.ini; run with -m "")
pytestmark = pytest.mark.slow


W, H = 120, 90
FXY = 90.0
DURATION = 0.9
N_EVENTS = 180_000
OMEGA_TRUE = np.array([0.7, -1.1, 1.6])

PANO_H, PANO_W = 256, 512
DT_AV = 0.02
PACKET = 6000
BATCH = 100
SIGMA = 1.0
WIN, STRIDE = 0.2, 0.1
DT_KNOTS = 0.05
MIN_EV_RATE = 1000
MAX_UPD = 200


def test_cubic_spline_math_parity():
    """Oracle CubicSpline (cumulative-basis numpy) vs production
    spline.evaluate (blending-matrix JAX) on random knots: two independent
    implementations of the order-4 cumulative SO(3) B-spline must agree to
    float tolerance everywhere on the evaluable span."""
    rng = np.random.default_rng(0)
    dt = 0.05
    K = 9
    sp = oracle.CubicSpline(0.0, dt)
    q = np.array([1.0, 0, 0, 0])
    knots = []
    for _ in range(K):
        q = oracle.qmul(q, oracle.qexp(rng.normal(0, 0.12, 3)))
        knots.append(q.copy())
    sp.knots = list(knots)
    ts = np.linspace(1e-6, sp.max_time() - 1e-6, 200)
    q_o = sp.evaluate_many(ts)
    q_p = pspline.evaluate_np(np.stack(knots), ts, 0.0, dt, order=4)
    dots = np.abs(np.sum(q_o * np.asarray(q_p), axis=1))
    ang = 2 * np.degrees(np.arccos(np.clip(dots, -1, 1)))
    assert ang.max() < 1e-4, f"max spline gap {ang.max()} deg"


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(9)
    return synthetic.rotating_camera_events(
        rng, N_EVENTS, DURATION, OMEGA_TRUE, FXY, FXY, W / 2, H / 2, W, H,
        n_points=300,
    )


@pytest.fixture(scope="module")
def production(stream):
    calib = CameraCalibration(
        width=W, height=H,
        K=np.array([[FXY, 0, W / 2], [0, FXY, H / 2], [0, 0, 1.0]]),
    )
    cfg = SystemConfig(
        frontend=FrontendConfig(
            num_events_per_packet=PACKET, dt_ang_vel=DT_AV,
            warp=WarpOptions(blur_sigma=SIGMA, event_batch_size=BATCH),
        ),
        backend=BackendConfig(
            sliding_window=SlidingWindowOptions(WIN, STRIDE),
            warp=WarpOptions(blur_sigma=SIGMA, event_batch_size=BATCH),
            trajectory=TrajectoryOptions(dt_knots=DT_KNOTS, spline_degree=3),
            pano_map=PanoMapOptions(
                pano_height=PANO_H, pano_width=PANO_W,
                backend_min_ev_rate=MIN_EV_RATE, max_update_times=MAX_UPD,
                y_angle_deg=0.0,
            ),
            crop_solver=False,
            # Library-default first-window policy (freeze 1 knot) on BOTH
            # sides: under reference semantics (freeze degree=3) each side
            # locks ITS OWN front-end integration into three knots and the
            # comparison is dominated by that frozen transient (measured
            # parity 0.50 deg at nfz=3 vs 0.32 at nfz=1).
            first_window_frozen_knots=1,
            # Online bootstrap re-solve on BOTH sides (the oracle carries
            # the same protocol): without it the parity residual is
            # dominated by each side's own cold-start transient, not by
            # semantic divergence.
            bootstrap_resolve_window=4,
        ),
    )
    slam = CMaxSLAM(calib, cfg)
    ev = stream
    for i in range(0, N_EVENTS, 40_000):
        slam.push_events(ev.xs[i:i + 40_000], ev.ys[i:i + 40_000],
                         ev.ts[i:i + 40_000], ev.pols[i:i + 40_000])
    slam.flush()
    return slam


@pytest.fixture(scope="module")
def oracle_run(stream):
    fe = oracle.OracleFrontend(
        fx=FXY, fy=FXY, cx=W / 2, cy=H / 2, width=W, height=H,
        num_events_per_packet=PACKET, dt_ang_vel=DT_AV, blur_sigma=SIGMA,
        event_batch_size=BATCH,
    )
    be = oracle.OracleBackend(
        fx=FXY, fy=FXY, cx=W / 2, cy=H / 2, width=W, height=H,
        pano_width=PANO_W, pano_height=PANO_H,
        time_window_size=WIN, sliding_window_stride=STRIDE,
        dt_knots=DT_KNOTS, blur_sigma=SIGMA, event_batch_size=BATCH,
        min_ev_rate=MIN_EV_RATE, max_update_times=MAX_UPD,
        spline_degree=3, first_window_frozen_knots=1,
        bootstrap_resolve_window=4,
    )
    ev = stream
    traj, ests, tlog = oracle.run_oracle(ev.xs, ev.ys, ev.ts, fe, be)
    assert traj is not None and traj.size >= 4
    return traj, ests, tlog


def test_cubic_trajectory_parity(production, oracle_run):
    traj_o, _, _ = oracle_run
    traj_p = production.backend.traj
    assert traj_p.order == 4
    t0 = max(traj_p.t_beg, traj_o.t0) + 1e-6
    t1 = min(traj_p.max_time(), traj_o.max_time()) - 1e-6
    assert t1 - t0 > 0.3, "overlapping refined span too short"
    grid = np.linspace(t0, t1, 50)
    q_p = traj_p.evaluate(grid)
    q_o = traj_o.evaluate_many(grid)
    rms, errs = rotation_rms_deg(grid, q_o, q_p, "global")
    # Round-4 gate (was 0.45, measured 0.32): with the bootstrap re-solve
    # on BOTH sides the cold-start transient — which dominated the parity
    # residual with each side's own baked-in early-knot error — is gone,
    # and what remains is solver slack on a shared objective. This gate
    # catches semantic divergence (protocol/spline/objective).
    assert rms < 0.2, f"production vs oracle cubic RMS {rms:.4f} deg"
    assert errs.max() < 0.6, f"max sample gap {errs.max():.4f} deg"


def test_cubic_oracle_tracks_ground_truth(oracle_run):
    traj_o, _, _ = oracle_run
    t0, t1 = traj_o.t0 + 1e-6, traj_o.max_time() - 1e-6
    grid = np.linspace(t0, t1, 50)
    q_o = traj_o.evaluate_many(grid)
    q_gt = np.stack([oracle.qexp(OMEGA_TRUE * t) for t in grid])
    rms, _ = rotation_rms_deg(grid, q_gt, q_o, "global")
    # Was 0.35 (measured ~0.16 without the bootstrap re-solve); the
    # re-solve removes the oracle's own cold-start transient too.
    assert rms < 0.2, f"cubic oracle vs ground truth RMS {rms:.4f} deg"
