"""Semantic-parity check against the cleanroom scalar oracle.

The sandbox has no reference datasets/egress, so trajectory parity against the
C++ binary cannot be measured directly. tools/scalar_oracle.py is an
INDEPENDENT implementation of the reference algorithm (pure numpy f64, FD
gradients, its own CG and spline — see its module docstring); this test runs
the production system and the oracle on the same synthetic stream and asserts
their trajectories and angular velocities agree. This is the strongest parity
evidence available here (BASELINE.md north star: <= 0.1 deg vs the C++
reference).
"""

import numpy as np
import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import scalar_oracle as oracle  # noqa: E402

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
DURATION = 1.2
N_EVENTS = 240_000
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


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(7)
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
            trajectory=TrajectoryOptions(dt_knots=DT_KNOTS, spline_degree=1),
            pano_map=PanoMapOptions(
                pano_height=PANO_H, pano_width=PANO_W,
                backend_min_ev_rate=MIN_EV_RATE, max_update_times=MAX_UPD,
                y_angle_deg=0.0,
            ),
            crop_solver=False,
        ),
    )
    slam = CMaxSLAM(calib, cfg)
    ev = stream
    for i in range(0, N_EVENTS, 40_000):
        slam.push_events(ev.xs[i:i + 40_000], ev.ys[i:i + 40_000],
                         ev.ts[i:i + 40_000], ev.pols[i:i + 40_000])
    slam.flush()
    slam.frontend.finalize_batch(slam.frontend.estimates)
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
        # Mirror the production library default (config.BackendConfig
        # .bootstrap_resolve_window=4): the parity gate certifies the
        # STOCK protocol on both sides.
        bootstrap_resolve_window=4,
    )
    ev = stream
    traj, ests, tlog = oracle.run_oracle(ev.xs, ev.ys, ev.ts, fe, be)
    return traj, ests, tlog


def test_frontend_omega_parity(production, oracle_run):
    """Per-packet angular velocities from the two independent front-ends
    agree (same objective + packet protocol, different solvers/gradients)."""
    _, ests_o, _ = oracle_run
    ests_p = production.frontend.estimates
    to = np.array([t for t, _ in ests_o])
    wo = np.stack([w for _, w in ests_o])
    tp = np.array([e.t for e in ests_p])
    wp = np.stack([e.omega for e in ests_p])
    n = min(len(to), len(tp))
    assert n >= 30
    np.testing.assert_allclose(to[:n], tp[:n], atol=1e-9)
    # Solver-level agreement on live packets; both sides solve the same
    # CMax objective to tight tolerances on a high-contrast stream.
    live = (np.linalg.norm(wo[:n], axis=1) > 0) & (
        np.linalg.norm(wp[:n], axis=1) > 0
    )
    diffs = np.linalg.norm(wo[:n][live] - wp[:n][live], axis=1)
    assert np.median(diffs) < 0.03, f"median omega gap {np.median(diffs)}"
    assert np.percentile(diffs, 90) < 0.08, f"p90 omega gap {np.percentile(diffs, 90)}"


def test_trajectory_parity(production, oracle_run):
    """Refined trajectories agree after gauge alignment — production vs the
    independent oracle implementation of the reference algorithm."""
    traj_o, _, _ = oracle_run
    traj_p = production.backend.traj
    t0 = max(traj_p.t_beg, traj_o.t0) + 1e-6
    t1 = min(traj_p.max_time(), traj_o.max_time()) - 1e-6
    assert t1 - t0 > 0.5, "overlapping refined span too short"
    grid = np.linspace(t0, t1, 60)
    q_p = traj_p.evaluate(grid)
    q_o = np.stack([traj_o.evaluate(t) for t in grid])
    rms, errs = rotation_rms_deg(grid, q_o, q_p, "global")
    # North-star parity bar (BASELINE.md): <= 0.1 deg vs the reference.
    assert rms < 0.1, f"production vs oracle RMS {rms:.4f} deg"
    assert errs.max() < 0.3, f"max sample gap {errs.max():.4f} deg"


def test_oracle_tracks_ground_truth(oracle_run):
    """Sanity: the oracle itself converges near the true motion (otherwise
    trajectory 'parity' could be two equally wrong systems agreeing)."""
    traj_o, _, _ = oracle_run
    t0, t1 = traj_o.t0 + 1e-6, traj_o.max_time() - 1e-6
    grid = np.linspace(t0, t1, 60)
    q_o = np.stack([traj_o.evaluate(t) for t in grid])
    q_gt = np.stack([oracle.qexp(OMEGA_TRUE * t) for t in grid])
    rms, _ = rotation_rms_deg(grid, q_gt, q_o, "global")
    assert rms < 0.3, f"oracle vs ground truth RMS {rms:.4f} deg"
