"""End-to-end SLAM on a synthetic smoothly-rotating camera: front-end
tracking -> back-end spline bundle adjustment -> global map. The synthetic
analog of BASELINE configs 3-4 (reference validates only visually;
SURVEY.md section 4 calls for exactly this kind of RMS check)."""

import numpy as np
import pytest

from cmax_slam_tpu import spline
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ijrr_config, replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM

# Full-tier suite: long e2e run (see pytest.ini; run with -m "")
pytestmark = pytest.mark.slow


W, H = 120, 90
FX = FY = 90.0


def smooth_rot_fn(duration, dt_int=1e-3):
    """Integrate a smooth angular-velocity profile into R(t) samples."""
    steps = int(duration / dt_int) + 2
    ts = np.arange(steps) * dt_int

    def omega(t):
        # slow start, then up to ~2.5 rad/s
        ramp = np.clip(t / 0.3, 0, 1)
        return ramp * np.array(
            [1.2 * np.sin(2 * np.pi * 0.8 * t),
             -1.8 * np.cos(2 * np.pi * 0.5 * t),
             2.2 * np.sin(2 * np.pi * 0.3 * t + 0.5)]
        )

    qs = [np.array([1.0, 0, 0, 0])]
    for i in range(1, steps):
        w_mid = omega(ts[i - 1] + dt_int / 2)
        qs.append(spline._np_quat_mul(qs[-1], spline._np_quat_exp(w_mid * dt_int)))
    qs = np.stack(qs)
    mats = np.stack([spline._np_quat_rotmat(q) for q in qs])

    def rot_fn(t):
        t = np.atleast_1d(t)
        idx = np.clip((t / dt_int).astype(int), 0, steps - 1)
        return mats[idx]

    return rot_fn, omega


@pytest.fixture(scope="module")
def slam_run():
    rng = np.random.default_rng(3)
    duration = 1.0
    rot_fn, omega_fn = smooth_rot_fn(duration)
    n = 100000
    ev = synthetic.rotating_camera_events(
        rng, n, duration, np.zeros(3), FX, FY, W / 2, H / 2, W, H,
        n_points=250, rot_fn=rot_fn,
    )
    calib = CameraCalibration(
        width=W, height=H,
        K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]),
    )
    # STOCK ijrr preset (mirrors /root/reference/launch/ijrr.launch) with
    # dataset-scale overrides ONLY — the same dotted keys a user passes via
    # the CLI's --set. Every accuracy-relevant knob (optimizer ladder and
    # budgets, bootstrap re-solve, precision) is the preset/library default,
    # so this gate certifies what users actually run (VERDICT r4 item 3).
    cfg = replace(
        ijrr_config(num_events_per_packet=4000),
        **{
            # 1 s / 100k-event synthetic stream on a 120x90 camera: packet
            # cadence and panorama sized to the data, like the launch files
            # size them per dataset.
            "frontend.dt_ang_vel": 0.02,
            "backend.pano_map.pano_height": 256,
            "backend.pano_map.pano_width": 512,
        },
    )
    slam = CMaxSLAM(calib, cfg)
    for i in range(0, n, 20000):
        slam.push_events(ev.xs[i:i+20000], ev.ys[i:i+20000],
                         ev.ts[i:i+20000], ev.pols[i:i+20000])
    slam.flush()
    return slam, rot_fn, omega_fn, ev


def _angle_err_deg(R_a, R_b):
    dR = R_a.T @ R_b
    c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def test_frontend_tracks_omega(slam_run):
    slam, rot_fn, omega_fn, ev = slam_run
    log = slam.ang_vel_log
    assert len(log) >= 40

    def omega_window_avg(t, half=0.01, n=9):
        # A CMax packet estimates the MEAN angular velocity over its ~2*half
        # span; compare against that, not the instantaneous omega(t).
        return np.mean([omega_fn(tt) for tt in np.linspace(t - half, t + half, n)],
                       axis=0)

    errs = [np.linalg.norm(row[1:] - omega_window_avg(row[0])) for row in log]
    assert np.median(errs) < 0.08, f"median omega err {np.median(errs)}"
    assert np.percentile(errs, 90) < 0.25, f"p90 omega err {np.percentile(errs, 90)}"


def test_backend_windows_ran(slam_run):
    slam, *_ = slam_run
    results = slam.window_results()
    assert len(results) >= 6
    assert all(r.ran_ba for r in results)
    # contrast improved (cost = -contrast decreases) or at least not worse
    assert np.mean([r.final_cost for r in results]) < 0.0


def test_backend_trajectory_rms(slam_run):
    slam, rot_fn, omega_fn, ev = slam_run
    traj = slam.backend.traj
    assert traj is not None and traj.size >= 5
    # Evaluate the estimated trajectory against ground truth on a dense grid,
    # after aligning the (arbitrary) global gauge at the first sample.
    t0 = traj.t_beg + 1e-6
    t1 = traj.max_time() - 1e-6
    times = np.linspace(t0, t1, 60)
    q_est = traj.evaluate(times)
    # Rotation-only SLAM has a global gauge freedom; evaluate with the
    # least-squares gauge alignment (like the TPU example checks), not
    # anchored at the first — least constrained — sample.
    from cmax_slam_tpu import lie
    from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

    q_gt = np.asarray(lie.from_matrix(rot_fn(times)))
    rms, errs = rotation_rms_deg(times, q_gt, q_est, "global")
    # Round-4 gate (was 0.15): with the online bootstrap re-solve the gate
    # sits AT BASELINE.md's 0.1-deg north star — any regression that pushes
    # the online linear path off the star fails CI (round-3 measured 0.096
    # without the re-solve; the re-solve adds margin, not slack).
    assert rms < 0.10, f"trajectory RMS {rms} deg; errs={np.round(errs,2)}"


def test_global_map_accumulates(slam_run):
    slam, *_ = slam_run
    ig = slam.backend.IG
    assert float(ig.sum()) > 0
    assert int((slam.backend.update_times > 0).sum()) > 0


def test_checkpoint_roundtrip(slam_run, tmp_path):
    slam, *_ = slam_run
    p = str(tmp_path / "state.npz")
    slam.save_checkpoint(p)
    d = np.load(p)
    assert d["knots"].shape[1] == 4
    np.testing.assert_allclose(d["IG"], slam.backend.IG)
    assert d["ang_vel_log"].shape[0] == len(slam.frontend.estimates)


def test_refine_reaches_north_star(slam_run):
    """KEEP LAST in this module: refine mutates the module fixture's
    backend state (knots + map). One offline sweep over the same stream
    pushes the linear path under BASELINE.md's 0.1-deg north star
    (online gate above: 0.10)."""
    slam, rot_fn, omega_fn, ev = slam_run
    slam.refine((ev.xs, ev.ys, ev.ts, ev.pols))
    from cmax_slam_tpu import lie
    from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

    traj = slam.backend.traj
    times = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 60)
    q_gt = np.asarray(lie.from_matrix(rot_fn(times)))
    rms, errs = rotation_rms_deg(times, q_gt, traj.evaluate(times), "global")
    assert rms < 0.1, f"refined RMS {rms} deg; errs={np.round(errs, 2)}"
