"""End-to-end SLAM with the cubic (order-4) spline back-end — the reference's
spline_degree=3 mode (BASELINE config 4)."""

import numpy as np
import pytest

from cmax_slam_tpu import spline
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ijrr_config, replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

from test_e2e import smooth_rot_fn, W, H, FX, FY

# Full-tier suite: long e2e run (see pytest.ini; run with -m "")
pytestmark = pytest.mark.slow



def smooth_rot_fn_noramp(duration, dt_int=1e-3):
    """Full-amplitude smooth profile from t=0: measures steady-state cubic
    BA accuracy, not the near-still cold-start transient (during which the
    first window's frozen knots lock in integrator error — same behavior as
    the reference's first-window freeze, pose_graph_optimizer.cpp:283-288)."""
    from cmax_slam_tpu import spline as sp

    steps = int(duration / dt_int) + 2
    ts = np.arange(steps) * dt_int

    def omega(t):
        return np.array(
            [1.2 * np.sin(2 * np.pi * 0.8 * t + 0.4),
             -1.8 * np.cos(2 * np.pi * 0.5 * t),
             2.2 * np.sin(2 * np.pi * 0.3 * t + 0.5)]
        )

    qs = [np.array([1.0, 0, 0, 0])]
    for i in range(1, steps):
        w_mid = omega(ts[i - 1] + dt_int / 2)
        qs.append(sp._np_quat_mul(qs[-1], sp._np_quat_exp(w_mid * dt_int)))
    mats = np.stack([sp._np_quat_rotmat(q) for q in qs])

    def rot_fn(t):
        idx = np.clip((np.atleast_1d(t) / dt_int).astype(int), 0, steps - 1)
        return mats[idx]

    return rot_fn, omega


def _run_cubic(bracket: int = 16, refine_passes: int = 0):
    rng = np.random.default_rng(11)
    duration = 0.8
    rot_fn, omega_fn = smooth_rot_fn_noramp(duration)
    n = 80000
    ev = synthetic.rotating_camera_events(
        rng, n, duration, np.zeros(3), FX, FY, W / 2, H / 2, W, H,
        n_points=250, rot_fn=rot_fn,
    )
    calib = CameraCalibration(
        width=W, height=H,
        K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
    )
    # STOCK ijrr preset + the reference's spline_degree=3 launch knob, with
    # dataset-scale overrides only (same dotted keys as the CLI's --set).
    # Accuracy knobs (optimizer, bootstrap re-solve) are library defaults:
    # the gate certifies what a user running the preset gets.
    cfg = replace(
        ijrr_config(num_events_per_packet=4000),
        **{
            "frontend.dt_ang_vel": 0.02,
            "backend.pano_map.pano_height": 256,
            "backend.pano_map.pano_width": 512,
            "backend.trajectory.spline_degree": 3,
            "backend.optim.max_fevals_per_linesearch": bracket,
        },
    )
    slam = CMaxSLAM(calib, cfg)
    for i in range(0, n, 20000):
        slam.push_events(ev.xs[i:i+20000], ev.ys[i:i+20000],
                         ev.ts[i:i+20000], ev.pols[i:i+20000])
    slam.flush()

    results = slam.window_results()
    assert len(results) >= 4
    assert all(r.ran_ba for r in results)

    if refine_passes:
        online_snapshot = list(results)
        ref_results = slam.refine((ev.xs, ev.ys, ev.ts, ev.pols),
                                  passes=refine_passes)
        assert all(r.ran_ba for r in ref_results)
        # refine starts from the online optimum against the FULL map: each
        # window solve may only improve the objective.
        assert all(r.final_cost <= r.initial_cost + 1e-6 for r in ref_results)
        # online results list untouched (refine keeps its own bookkeeping)
        assert slam.backend.results == online_snapshot

    # Front-end omega-error percentiles on the cubic stream too (mirrors
    # test_e2e.test_frontend_tracks_omega; measured median 0.070 / p90 0.115
    # on the full-amplitude no-ramp profile).
    log = slam.ang_vel_log

    def omega_window_avg(t, half=0.01, k=9):
        return np.mean(
            [omega_fn(tt) for tt in np.linspace(t - half, t + half, k)],
            axis=0)

    fe_errs = [np.linalg.norm(row[1:] - omega_window_avg(row[0]))
               for row in log]
    assert np.median(fe_errs) < 0.12, f"median omega err {np.median(fe_errs)}"
    assert np.percentile(fe_errs, 90) < 0.2, \
        f"p90 omega err {np.percentile(fe_errs, 90)}"

    traj = slam.backend.traj
    assert traj.order == 4
    t0 = traj.t_beg + 1e-6
    t1 = traj.max_time() - 1e-6
    times = np.linspace(t0, t1, 50)
    q_est = traj.evaluate(times)
    R_gt = rot_fn(times)
    q_gt = np.stack([
        spline.from_matrix_np(R) if hasattr(spline, "from_matrix_np") else _q(R)
        for R in R_gt
    ])
    return rotation_rms_deg(times, q_gt, q_est, alignment="global")


def test_cubic_backend_rms():
    rms, errs = _run_cubic()
    # North-star gate (was 0.15): cubic ONLINE, stock ijrr-preset defaults
    # (bootstrap re-solve on), measured 0.094 deg on this stream (CPU x64,
    # deterministic) — matching the linear path's <= 0.1 deg bar with no
    # offline refine. Reference semantics: cubic windows converge online
    # (/root/reference/src/backend/trajectory.cpp:357-464).
    assert rms < 0.10, f"cubic trajectory RMS {rms} deg; errs={np.round(errs,2)}"


def test_cubic_refine_pass_rms():
    """One offline refine sweep (CMaxSLAM.refine) on top of the online run:
    measured 0.081 deg — under BASELINE.md's 0.1 deg north star."""
    rms, errs = _run_cubic(refine_passes=1)
    assert rms < 0.10, f"refined cubic RMS {rms} deg; errs={np.round(errs,2)}"


def test_cubic_bracket_budget_robust():
    """Perturbing the line-search bracket budget must not blow up the cubic
    BA (round-2 recorded a 0.6 -> 3.8 deg cliff at 16 -> 10; the
    first-window freeze fix removed the cliff in the 12..20 band). Measured
    0.114 deg at bracket=12 with stock defaults; gate 0.15."""
    rms, errs = _run_cubic(bracket=12)
    assert rms < 0.15, f"bracket=12 RMS {rms} deg; errs={np.round(errs,2)}"


def _q(R):
    """Rotation matrix -> quaternion (wxyz), numpy."""
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # xyzw
    return np.array([q[3], q[0], q[1], q[2]])
