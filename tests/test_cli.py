"""CLI entry point: end-to-end run on a tiny synthetic dataset (the
process-entry analog of src/node.cpp + launch harness)."""

import json
import os

import numpy as np
import pytest

from cmax_slam_tpu import cli
from cmax_slam_tpu.io import synthetic

W, H = 120, 90
FX = FY = 90.0


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(5)
    ev = synthetic.rotating_camera_events(
        rng, 40000, 0.5, np.array([0.9, -1.4, 2.0]),
        FX, FY, W / 2, H / 2, W, H, n_points=250,
    )
    epath = d / "events.txt"
    with open(epath, "w") as f:
        for t, x, y, p in zip(ev.ts, ev.xs, ev.ys, ev.pols):
            f.write(f"{t:.9f} {x} {y} {1 if p > 0 else 0}\n")
    cpath = d / "calib.txt"
    cpath.write_text(f"{FX} {FY} {W/2} {H/2} 0 0 0 0 0\n")
    return str(epath), str(cpath), str(d)


SETTINGS = [
    "--set", "frontend.num_events_per_packet=4000",
    "--set", "frontend.dt_ang_vel=0.02",
    "--set", "backend.pano_map.pano_height=128",
    "--set", "backend.pano_map.pano_width=256",
    "--set", "backend.pano_map.backend_min_ev_rate=10000",
    "--set", "backend.trajectory.dt_knots=0.05",
]


def test_cli_full_run(dataset):
    epath, cpath, d = dataset
    out = os.path.join(d, "out")
    rc = cli.main([
        "--events", epath, "--calib", cpath, "--width", str(W),
        "--height", str(H), "--out-dir", out, *SETTINGS,
    ])
    assert rc == 0
    for f in ("angular_velocity.txt", "trajectory_tum.txt", "pano_map.png",
              "final_state.npz", "stats.json"):
        assert os.path.exists(os.path.join(out, f)), f
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert stats["ang_vel_estimates"] >= 15
    assert stats["windows"] >= 2
    av = np.loadtxt(os.path.join(out, "angular_velocity.txt"))
    errs = np.linalg.norm(av[:, 1:] - np.array([0.9, -1.4, 2.0]), axis=1)
    assert np.median(errs) < 0.2


def test_cli_resume(dataset):
    epath, cpath, d = dataset
    out = os.path.join(d, "out2")
    rc = cli.main([
        "--events", epath, "--calib", cpath, "--width", str(W),
        "--height", str(H), "--out-dir", out, "--max-events", "20000",
        *SETTINGS,
    ])
    assert rc == 0
    # resume from the final state and continue (mechanism smoke test)
    out3 = os.path.join(d, "out3")
    rc = cli.main([
        "--events", epath, "--calib", cpath, "--width", str(W),
        "--height", str(H), "--out-dir", out3,
        "--resume", os.path.join(out, "final_state.npz"), *SETTINGS,
    ])
    assert rc == 0


def test_cli_bad_set_key(dataset):
    epath, cpath, d = dataset
    with pytest.raises(SystemExit, match="unknown config key"):
        cli.main([
            "--events", epath, "--calib", cpath, "--width", str(W),
            "--height", str(H), "--out-dir", os.path.join(d, "outx"),
            "--set", "frontend.nope=1",
        ])


def test_cli_missing_width(dataset):
    epath, cpath, d = dataset
    with pytest.raises(SystemExit, match="width"):
        cli.main(["--events", epath, "--calib", cpath,
                  "--out-dir", os.path.join(d, "outy")])


def test_cli_rosbag_autocalib_and_iwe_dump(dataset, tmp_path):
    """--events foo.bag with no --calib: events + CameraInfo come from the
    bag (the reference's primary data path, launch/ijrr.launch), and
    --save-iwe-every dumps local IWE pairs like the /local_iwe topic."""
    from test_io import _camera_info_msg, _event_array_msg, _write_test_bag

    rng = np.random.default_rng(6)
    ev = synthetic.rotating_camera_events(
        rng, 12000, 0.15, np.array([0.9, -1.4, 2.0]),
        FX, FY, W / 2, H / 2, W, H, n_points=250,
    )
    bag = str(tmp_path / "stream.bag")
    msgs = [(1, _camera_info_msg(W, H, FX, FY, W / 2, H / 2, d=[0] * 5))]
    step = 3000
    for i in range(0, len(ev.ts), step):
        msgs.append((0, _event_array_msg(
            ev.xs[i:i+step], ev.ys[i:i+step], ev.ts[i:i+step],
            ev.pols[i:i+step], width=W, height=H,
        )))
    _write_test_bag(
        bag, msgs,
        conns=[("/dvs/events", "dvs_msgs/EventArray"),
               ("/dvs/camera_info", "sensor_msgs/CameraInfo")],
    )
    out = os.path.join(str(tmp_path), "out")
    rc = cli.main([
        "--events", bag, "--out-dir", out, "--no-backend",
        "--save-iwe-every", "2", *SETTINGS,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "angular_velocity.txt"))
    iwes = [f for f in os.listdir(out) if f.startswith("local_iwe_")]
    assert len(iwes) >= 2, sorted(os.listdir(out))
    av = np.loadtxt(os.path.join(out, "angular_velocity.txt"))
    errs = np.linalg.norm(np.atleast_2d(av)[:, 1:] - np.array([0.9, -1.4, 2.0]), axis=1)
    assert np.median(errs) < 0.2


def test_cli_rosbag_full_system(tmp_path):
    """The reference's primary input path end-to-end: a .bag carrying BOTH
    the event stream and the CameraInfo calibration (launch/ijrr.launch
    plays a bag; src/cmax_slam.cpp:122-145 reads one CameraInfo and
    unsubscribes) driven through the CLI with the back-end ON — trajectory,
    pano map, and checkpoint outputs must land."""
    from test_io import _camera_info_msg, _event_array_msg, _write_test_bag

    rng = np.random.default_rng(9)
    duration = 0.5
    ev = synthetic.rotating_camera_events(
        rng, 40000, duration, np.array([0.9, -1.4, 2.0]),
        FX, FY, W / 2, H / 2, W, H, n_points=250,
    )
    bag = str(tmp_path / "full.bag")
    # CameraInfo arrives mid-stream (connection 1) like a real recording.
    msgs = [(1, _camera_info_msg(W, H, FX, FY, W / 2, H / 2, d=[0] * 5))]
    step = 5000
    for i in range(0, len(ev.ts), step):
        msgs.append((0, _event_array_msg(
            ev.xs[i:i+step], ev.ys[i:i+step], ev.ts[i:i+step],
            ev.pols[i:i+step], width=W, height=H,
        )))
    _write_test_bag(
        bag, msgs,
        conns=[("/dvs/events", "dvs_msgs/EventArray"),
               ("/dvs/camera_info", "sensor_msgs/CameraInfo")],
    )
    out = os.path.join(str(tmp_path), "out")
    rc = cli.main(["--events", bag, "--out-dir", out, *SETTINGS])
    assert rc == 0
    for f in ("angular_velocity.txt", "trajectory_tum.txt", "pano_map.png",
              "final_state.npz", "stats.json"):
        assert os.path.exists(os.path.join(out, f)), f
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert stats["windows"] >= 2
    av = np.loadtxt(os.path.join(out, "angular_velocity.txt"))
    errs = np.linalg.norm(av[:, 1:] - np.array([0.9, -1.4, 2.0]), axis=1)
    assert np.median(errs) < 0.2
    # the trajectory tracks the constant-omega ground truth (gauge-aligned)
    from cmax_slam_tpu import spline
    from cmax_slam_tpu.utils.evaluate import (read_tum_trajectory,
                                              rotation_rms_deg)

    times, quats = read_tum_trajectory(os.path.join(out, "trajectory_tum.txt"))
    t0 = float(ev.ts[0])
    q_gt = np.stack([spline._np_quat_exp(np.array([0.9, -1.4, 2.0]) * (t - t0))
                     for t in times])
    rms, _ = rotation_rms_deg(times, q_gt, quats, "global")
    assert rms < 1.0, f"bag e2e trajectory RMS {rms} deg"


def test_compare_to_reference_tool(tmp_path):
    """tools/compare_to_reference.py: gauge-aligned self-comparison of a
    trajectory against a gauge-rotated copy is ~0; a corrupted trajectory
    trips the --max-rms-deg gate."""
    import importlib.util
    import os as _os

    from cmax_slam_tpu import spline
    from cmax_slam_tpu.utils import evaluate

    spec = importlib.util.spec_from_file_location(
        "compare_to_reference",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "compare_to_reference.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    traj = spline.Trajectory(0.0, 0.05, order=2)
    omega = np.array([0.4, -0.8, 1.1])
    qs = np.stack([spline._np_quat_exp(omega * (0.05 * i)) for i in range(12)])
    traj.push_ctrl_poses(qs)
    p_ref = str(tmp_path / "ref.txt")
    evaluate.write_tum_trajectory(p_ref, traj, dt_sample=0.02)

    # ours: same trajectory under a different global gauge
    g = spline._np_quat_exp(np.array([0.3, 0.5, -0.2]))
    traj2 = spline.Trajectory(0.0, 0.05, order=2)
    traj2.push_ctrl_poses(np.stack([spline._np_quat_mul(g, q) for q in qs]))
    p_ours = str(tmp_path / "ours.txt")
    evaluate.write_tum_trajectory(p_ours, traj2, dt_sample=0.02)

    # angular velocities: identical logs
    t = np.arange(20) * 0.01
    av = np.column_stack([t, np.tile(omega, (20, 1))])
    p_av = str(tmp_path / "av.txt")
    np.savetxt(p_av, av)

    rc = tool.main([
        "--ours-traj", p_ours, "--ref-traj", p_ref,
        "--ours-av", p_av, "--ref-av", p_av,
        "--max-rms-deg", "0.01", "--max-av-median", "1e-9",
    ])
    assert rc == 0

    # corrupted trajectory fails the gate
    traj3 = spline.Trajectory(0.0, 0.05, order=2)
    qs_bad = qs.copy()
    qs_bad[6:] = np.stack([
        spline._np_quat_mul(spline._np_quat_exp(np.array([0.05, 0, 0])), q)
        for q in qs_bad[6:]
    ])
    traj3.push_ctrl_poses(qs_bad)
    p_bad = str(tmp_path / "bad.txt")
    evaluate.write_tum_trajectory(p_bad, traj3, dt_sample=0.02)
    rc = tool.main([
        "--ours-traj", p_bad, "--ref-traj", p_ref, "--max-rms-deg", "0.5",
    ])
    assert rc == 1
