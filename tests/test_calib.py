"""Camera calibration: plumb_bob undistortion, bearing LUT, file loaders."""

import numpy as np
import pytest

from cmax_slam_tpu import calib as C


def test_undistort_roundtrip(rng):
    K = np.array([[200.0, 0, 120], [0, 200.0, 90], [0, 0, 1]])
    D = np.array([-0.35, 0.11, -0.0004, -0.0002, 0.0])
    # ground-truth normalized points in a moderate FOV
    pts_norm = rng.uniform(-0.4, 0.4, (100, 2))
    distorted = C.distort_points(pts_norm, D)
    pix = np.stack(
        [K[0, 0] * distorted[:, 0] + K[0, 2], K[1, 1] * distorted[:, 1] + K[1, 2]],
        axis=-1,
    )
    undist = C.undistort_points(pix, K, D)
    np.testing.assert_allclose(undist, pts_norm, atol=1e-6)


def test_bearing_lut_pinhole_center():
    cal = C.CameraCalibration(
        width=64, height=48,
        K=np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]),
    )
    lut = C.bearing_lut(cal)
    assert lut.shape == (64 * 48, 3)
    center = lut[24 * 64 + 32]
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(lut, axis=1), 1.0, atol=1e-6)
    # corner pixel: correct direction sign
    corner = lut[0]
    assert corner[0] < 0 and corner[1] < 0 and corner[2] > 0


def test_yaml_loader(tmp_path):
    y = tmp_path / "cam.yaml"
    y.write_text(
        """
image_width: 346
image_height: 260
camera_name: test
camera_matrix:
  rows: 3
  cols: 3
  data: [248.16, 0.0, 180.66, 0.0, 247.77, 128.10, 0.0, 0.0, 1.0]
distortion_model: plumb_bob
distortion_coefficients:
  rows: 1
  cols: 5
  data: [-0.358, 0.115, -0.0004, -0.0002, 0.0]
rectification_matrix:
  rows: 3
  cols: 3
  data: [1,0,0, 0,1,0, 0,0,1]
projection_matrix:
  rows: 3
  cols: 4
  data: [196.41, 0.0, 184.50, 0.0, 0.0, 220.21, 127.43, 0.0, 0.0, 0.0, 1.0, 0.0]
"""
    )
    cal = C.CameraCalibration.from_yaml(str(y))
    assert cal.width == 346 and cal.height == 260
    assert cal.K[0, 0] == pytest.approx(248.16)
    assert cal.D[0] == pytest.approx(-0.358)
    assert cal.P[0, 0] == pytest.approx(196.41)
    lut = C.bearing_lut(cal)
    assert np.all(np.isfinite(lut))


def test_txt_loader(tmp_path):
    t = tmp_path / "calib.txt"
    t.write_text("199.0 198.0 132.0 110.0 -0.38 0.18 0.001 0.0002 0.0\n")
    cal = C.CameraCalibration.from_txt(str(t), 240, 180)
    assert cal.K[0, 0] == pytest.approx(199.0)
    assert cal.D[4] == pytest.approx(0.0)
    assert cal.width == 240
