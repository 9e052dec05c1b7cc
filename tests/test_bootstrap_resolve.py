"""Online bootstrap re-solve (config.bootstrap_resolve_window): a one-time
causal re-run of the sliding-window BA over the already-tracked span once
the global map has matured — undoes the cold-start error the first windows
bake into the early knots while IG is still nearly empty. Beyond the
reference (which never revisits early knots,
/root/reference/src/backend/pose_graph_optimizer.cpp:283-288)."""

import numpy as np
import pytest

from cmax_slam_tpu import lie
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import (
    BackendConfig, FrontendConfig, PanoMapOptions, SlidingWindowOptions,
    SystemConfig, TrajectoryOptions, WarpOptions,
)
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

from test_e2e import smooth_rot_fn, W, H, FX, FY

pytestmark = pytest.mark.slow


def _run(bootstrap, duration=0.7, n=70000):
    rng = np.random.default_rng(3)
    rot_fn, omega_fn = smooth_rot_fn(duration)
    ev = synthetic.rotating_camera_events(
        rng, n, duration, np.zeros(3), FX, FY, W / 2, H / 2, W, H,
        n_points=250, rot_fn=rot_fn,
    )
    calib = CameraCalibration(
        width=W, height=H,
        K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
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
            bootstrap_resolve_window=bootstrap,
        ),
    )
    slam = CMaxSLAM(calib, cfg)
    for i in range(0, n, 20000):
        slam.push_events(ev.xs[i:i+20000], ev.ys[i:i+20000],
                         ev.ts[i:i+20000], ev.pols[i:i+20000])
    slam.flush()
    return slam, rot_fn


def _rms(slam, rot_fn):
    traj = slam.backend.traj
    times = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 40)
    q_est = traj.evaluate(times)
    q_gt = np.asarray(lie.from_matrix(rot_fn(times)))
    return rotation_rms_deg(times, q_gt, q_est, "global")


def test_bootstrap_resolve_fires_and_helps():
    slam, rot_fn = _run(bootstrap=3)
    be = slam.backend
    # Fired exactly once: pending cleared, results recorded, solves improved
    # (or at least did not worsen) each re-solved window's objective.
    assert be._bootstrap_pending is None
    assert len(be.bootstrap_results) >= 2
    assert all(r.final_cost <= r.initial_cost + 1e-6
               for r in be.bootstrap_results if r.ran_ba)
    # The re-solve happened BEFORE the stream head: only completed windows.
    assert all(r.t_end <= be.t_win_beg + be.win_size
               for r in be.bootstrap_results)
    # Online streaming continued normally after the re-solve.
    assert len(be.results) >= 5
    rms, errs = _rms(slam, rot_fn)
    assert rms < 0.25, f"bootstrap-resolve RMS {rms} deg"

    # The early trajectory_log entries were refreshed from the re-solved
    # trajectory (they must match a direct evaluation, not the stale knots).
    # Tolerance 1e-7 (~0.03 deg): later prefix-retirement re-basing perturbs
    # the frozen knots at f32 rounding level (measured |dot| ~ 1 - 5e-9),
    # while a STALE entry differs by the re-solve's whole correction
    # (~0.3 deg, |dot| ~ 1 - 1e-5) — two orders of margin either side.
    for t, q in be.trajectory_log[:2]:
        q_now = be.traj.evaluate(t)[0]
        assert abs(float(np.dot(q, q_now))) > 1 - 1e-7


def test_bootstrap_retention_then_release():
    """While the re-solve is pending the store retires nothing; afterwards
    the prefix is dropped as in plain streaming (bounded memory)."""
    slam, _ = _run(bootstrap=3)
    store = slam.backend.store
    # After the run the retained prefix has been released: the store no
    # longer holds the stream start.
    assert store.base > 0
