"""Two-device pipeline: back-end pinned to its own (virtual) chip.

Maps the reference's front-end-thread / back-end-thread split
(src/cmax_slam.cpp:92) onto two devices: packet solves on device 0, window
bundle adjustment + map state on device 1, overlapping in hardware. Here we
verify correctness of the placement on the CPU mesh (results must match the
single-device system bit-for-semantics).
"""

import numpy as np
import jax

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


def test_backend_on_second_device():
    assert len(jax.devices()) >= 2
    rng = np.random.default_rng(3)
    duration = 0.6
    rot_fn, _ = smooth_rot_fn(duration)
    n = 60000
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
        ),
    )
    slam = CMaxSLAM(calib, cfg, backend_device=jax.devices()[1])
    for i in range(0, n, 20000):
        slam.push_events(ev.xs[i:i+20000], ev.ys[i:i+20000],
                         ev.ts[i:i+20000], ev.pols[i:i+20000])
    slam.flush()

    # back-end state lives on device 1; front-end warm start on device 0
    assert list(slam.backend.IG.devices())[0] == jax.devices()[1]
    results = slam.window_results()
    assert len(results) >= 3 and all(r.ran_ba for r in results)

    traj = slam.backend.traj
    times = np.linspace(traj.t_beg + 1e-6, traj.max_time() - 1e-6, 40)
    q_est = traj.evaluate(times)
    q_gt = np.asarray(lie.from_matrix(rot_fn(times)))
    rms, _ = rotation_rms_deg(times, q_gt, q_est, "global")
    assert rms < 0.3, f"two-device pipeline RMS {rms} deg"
