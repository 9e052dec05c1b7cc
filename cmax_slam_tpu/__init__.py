"""CMax-SLAM-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of event-camera
rotational-motion bundle adjustment and SLAM by Contrast Maximization.

Capabilities mirror the reference system tub-rip/cmax_slam (Guo & Gallego,
IEEE T-RO 2024): a sliding-window angular-velocity front-end, a continuous-time
SO(3) B-spline back-end refined by maximizing the contrast of a global
equirectangular panoramic image of warped events, and the supporting IO,
calibration, and rendering stack — redesigned for TPUs: fixed-shape event
tensors, scatter-as-matmul vote accumulation on the MXU, autodiff in place of
hand-coded Jacobians, and whole-optimizer jit compilation.
"""

from . import calib, config, lie

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing the full device stack on
    # `import cmax_slam_tpu`).
    if name == "CMaxSLAM":
        from .system import CMaxSLAM

        return CMaxSLAM
    if name == "Frontend":
        from .frontend import Frontend

        return Frontend
    if name == "Backend":
        from .backend import Backend

        return Backend
    raise AttributeError(name)
