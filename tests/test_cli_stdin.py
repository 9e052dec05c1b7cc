"""CLI live-feed mode: `--events -` consumes a 't x y p' text stream from
stdin (the live_davis analog — the reference subscribes to a live driver
topic, docs/live_demo.md; here a driver process pipes events in)."""

import subprocess
import sys

import numpy as np


def test_cli_stdin_live_feed(tmp_path):
    from cmax_slam_tpu.io import synthetic

    W, H, FXY = 120, 90, 90.0
    rng = np.random.default_rng(13)
    ev = synthetic.rotating_camera_events(
        rng, 30_000, 0.15, np.array([0.9, -1.1, 1.5]), FXY, FXY, W / 2, H / 2,
        W, H, n_points=250,
    )
    lines = "".join(
        f"{t:.9f} {x} {y} {max(p, 0)}\n"
        for t, x, y, p in zip(ev.ts, ev.xs, ev.ys, ev.pols)
    )
    calp = tmp_path / "calib.txt"
    calp.write_text(f"{FXY} {FXY} {W/2} {H/2} 0 0 0 0 0\n")
    out = tmp_path / "out"

    # Subprocess so stdin is a real pipe; same env discipline as conftest.
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "cmax_slam_tpu.cli",
         "--events", "-", "--calib", str(calp),
         "--width", str(W), "--height", str(H),
         "--chunk-size", "8192", "--no-backend", "--out-dir", str(out),
         "--set", "frontend.num_events_per_packet=6000",
         "--set", "frontend.dt_ang_vel=0.02"],
        input=lines, capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    av = np.loadtxt(out / "angular_velocity.txt")
    assert len(np.atleast_2d(av)) >= 3
