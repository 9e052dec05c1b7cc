"""Camera models: pinhole + plumb_bob calibration, bearing-vector LUT, and the
equirectangular panorama camera.

Replaces the reference's use of ``image_geometry::PinholeCameraModel``
(``/root/reference/src/cmax_slam.cpp:106-120`` — per-pixel ``rectifyPoint`` +
``projectPixelTo3dRay`` LUT) and ``dvs::EquirectangularCamera``
(``/root/reference/include/backend/equirectangular_camera.h:8-81``).

The bearing LUT is computed once on host in float64 and shipped to device as
float32; the equirectangular projection is pure ``jnp`` and differentiable
(its analytic 2x3 Jacobian, equirectangular_camera.h:31-43, is recovered by
autodiff and cross-checked in tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class CameraCalibration:
    """Pinhole calibration in ROS CameraInfo convention.

    K: 3x3 raw intrinsics; D: plumb_bob (k1,k2,p1,p2,k3); R: rectification;
    P: 3x4 projection (used for ray lifting, as image_geometry does).
    """

    width: int
    height: int
    K: np.ndarray
    D: np.ndarray = field(default_factory=lambda: np.zeros(5))
    R: Optional[np.ndarray] = None
    P: Optional[np.ndarray] = None

    @staticmethod
    def from_yaml(path: str) -> "CameraCalibration":
        """Load a ROS camera-calibration YAML (docs/DAVIS-00000254.yaml layout)."""
        import yaml

        with open(path) as f:
            d = yaml.safe_load(f)
        K = np.asarray(d["camera_matrix"]["data"], dtype=np.float64).reshape(3, 3)
        D = np.asarray(
            d.get("distortion_coefficients", {"data": [0] * 5})["data"], dtype=np.float64
        ).reshape(-1)
        R = None
        if "rectification_matrix" in d:
            R = np.asarray(d["rectification_matrix"]["data"], dtype=np.float64).reshape(3, 3)
        P = None
        if "projection_matrix" in d:
            P = np.asarray(d["projection_matrix"]["data"], dtype=np.float64).reshape(3, 4)
        return CameraCalibration(
            width=int(d["image_width"]), height=int(d["image_height"]), K=K, D=D, R=R, P=P
        )

    @staticmethod
    def from_txt(path: str, width: int, height: int) -> "CameraCalibration":
        """Load the IJRR/ECD plain-text calib: 'fx fy cx cy k1 k2 p1 p2 k3'."""
        vals = np.loadtxt(path).reshape(-1)
        fx, fy, cx, cy = vals[:4]
        D = np.zeros(5)
        D[: len(vals) - 4] = vals[4:9] if len(vals) >= 9 else vals[4:]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float64)
        return CameraCalibration(width=width, height=height, K=K, D=D)

    @property
    def projection(self) -> np.ndarray:
        """Effective projection intrinsics (P if present else K)."""
        if self.P is not None:
            return self.P[:3, :3]
        return self.K


def undistort_points(
    pts: np.ndarray, K: np.ndarray, D: np.ndarray, num_iters: int = 20
) -> np.ndarray:
    """Iterative plumb_bob undistortion (fixed-point, as cv::undistortPoints).

    pts: (N, 2) raw pixel coords. Returns (N, 2) normalized (canonical) coords.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    k1, k2, p1, p2, k3 = (list(D) + [0.0] * 5)[:5]

    x0 = (pts[:, 0] - cx) / fx
    y0 = (pts[:, 1] - cy) / fy
    x, y = x0.copy(), y0.copy()
    for _ in range(num_iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return np.stack([x, y], axis=-1)


def distort_points(pts_norm: np.ndarray, D: np.ndarray) -> np.ndarray:
    """Forward plumb_bob distortion of normalized coords (for tests/synthesis)."""
    k1, k2, p1, p2, k3 = (list(D) + [0.0] * 5)[:5]
    x, y = pts_norm[..., 0], pts_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def bearing_lut(calib: CameraCalibration, unit: bool = True) -> np.ndarray:
    """Per-pixel bearing vectors, row-major (H*W, 3) float32.

    Reproduces CMaxSLAM::precomputeBearingVectors
    (/root/reference/src/cmax_slam.cpp:106-120): rectify each raw pixel with
    (K, D, R, P), then lift through P to a 3D ray. Scale of the ray is
    irrelevant downstream (canonical and equirectangular projections are
    scale-invariant), so we return unit vectors for float32 hygiene.
    """
    H, W = calib.height, calib.width
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    raw = np.stack([xs.ravel(), ys.ravel()], axis=-1)

    norm = undistort_points(raw, calib.K, calib.D)
    ones = np.ones((norm.shape[0], 1))
    rays = np.concatenate([norm, ones], axis=-1)
    if calib.R is not None:
        rays = rays @ calib.R.T  # rectification rotation

    if calib.P is not None:
        # image_geometry: rectified pixel = P @ ray, then lift via P^-1 gives
        # the same direction as `rays`; lifting through P after projecting
        # through P is identity on directions, so `rays` already is the LUT.
        pass

    if unit:
        rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    return rays.astype(np.float32)


@dataclass(frozen=True)
class EquirectCamera:
    """Equirectangular panorama camera.

    Matches dvs::EquirectangularCamera
    (/root/reference/include/backend/equirectangular_camera.h:8-81) with
    hfov=360, vfov=180: fx = (W/360)*(180/pi) = W/(2*pi), fy = H/pi.
    """

    width: int
    height: int

    @property
    def fx(self) -> float:
        return self.width / (2.0 * np.pi)

    @property
    def fy(self) -> float:
        return self.height / np.pi

    @property
    def cx(self) -> float:
        return self.width / 2.0

    @property
    def cy(self) -> float:
        return self.height / 2.0

    def project(self, P: jnp.ndarray) -> jnp.ndarray:
        """Project (..., 3) rays to (..., 2) panorama pixels.

        phi = atan2(x, z), theta = asin(y / |P|)
        (equirectangular_camera.h:25-26,44). Differentiable; autodiff
        reproduces the reference's analytic Jacobian.
        """
        x, y, z = P[..., 0], P[..., 1], P[..., 2]
        rho = jnp.sqrt(x * x + y * y + z * z)
        phi = jnp.arctan2(x, z)
        theta = jnp.arcsin(jnp.clip(y / rho, -1.0, 1.0))
        u = self.cx + phi * self.fx
        v = self.cy + theta * self.fy
        return jnp.stack([u, v], axis=-1)

    def lift(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Inverse projection: pixels -> unit rays (the reference stubs this,
        equirectangular_camera.h:47-50; we implement it fully)."""
        phi = (uv[..., 0] - self.cx) / self.fx
        theta = (uv[..., 1] - self.cy) / self.fy
        cos_t = jnp.cos(theta)
        return jnp.stack(
            [cos_t * jnp.sin(phi), jnp.sin(theta), cos_t * jnp.cos(phi)], axis=-1
        )


def canonical_project(points: jnp.ndarray) -> jnp.ndarray:
    """Perspective division: (..., 3) -> (..., 2).

    Reference: canonicalProjection (src/utils/image_geom_util.cpp:24-41)."""
    return points[..., :2] / points[..., 2:3]


def apply_intrinsics(pts: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Pixel = K @ canonical. Reference: applyIntrinsics
    (src/utils/image_geom_util.cpp:7-22)."""
    u = fx * pts[..., 0] + cx
    v = fy * pts[..., 1] + cy
    return jnp.stack([u, v], axis=-1)
