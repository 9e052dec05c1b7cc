"""Visualization parity: front-end IWE pair and back-end pano rendering
(publishEventImage equivalents)."""

import numpy as np
import pytest

from cmax_slam_tpu.config import FrontendConfig, WarpOptions
from cmax_slam_tpu.frontend import Frontend
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops.warp_local import CameraParams

W, H = 120, 90
FX = FY = 90.0
CAM = CameraParams(fx=FX, fy=FY, cx=W / 2, cy=H / 2, width=W, height=H)
LUT = synthetic.identity_lut(W, H, FX, FY, W / 2, H / 2)


def test_frontend_iwe_pair(rng):
    omega = np.array([0.9, -1.2, 1.6])
    n = 6000
    ev = synthetic.rotating_camera_events(
        rng, n, 0.05, omega, FX, FY, W / 2, H / 2, W, H, n_points=150
    )
    cfg = FrontendConfig(num_events_per_packet=4000, dt_ang_vel=0.02,
                         warp=WarpOptions(event_batch_size=100))
    fe = Frontend(CAM, LUT, cfg)
    fe.push_events(ev.xs, ev.ys, ev.ts, ev.pols)
    assert fe.estimates
    img = fe.render_iwe_pair(0, 4000, fe.estimates[-1].omega)
    # side-by-side: raw (left) vs motion-compensated (right), inverted
    assert img.shape == (H, 2 * W)
    assert img.min() >= 0 and img.max() <= 255
    left = img[:, :W]
    right = img[:, W:]
    # motion compensation sharpens: the compensated half has darker minima
    # (inverted display: sharp accumulation -> low values)
    assert right.min() <= left.min()


def test_backend_render_map(rng):
    from cmax_slam_tpu.backend import Backend
    from cmax_slam_tpu.config import BackendConfig, PanoMapOptions
    from cmax_slam_tpu.io.events import EventStore

    store = EventStore()
    cfg = BackendConfig(
        pano_map=PanoMapOptions(pano_height=64, pano_width=128),
        draw_fov=True,
    )
    be = Backend(W, H, LUT, cfg, store)
    be.push_ang_vel(0.0, np.zeros(3))
    # trajectory with enough knots to evaluate
    import cmax_slam_tpu.spline as spline

    be.traj.push_ctrl_poses(np.stack([spline._np_quat_exp(np.zeros(3))] * 4))
    be.IG = np.abs(rng.normal(size=(64, 128))).astype(np.float32)
    img = be.render_map()
    assert img.shape == (64, 128, 3)  # FOV drawing -> RGB
    assert (img[..., 0] == 255).any()  # red FOV pixels present
