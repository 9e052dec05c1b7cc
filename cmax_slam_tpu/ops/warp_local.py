"""Front-end local warp: events -> image of warped events under candidate
angular velocity.

Reference: src/frontend/local_image_warped_events.cpp:10-170. Per event the
reference rotates the precomputed bearing vector with the first-order rotation
``b' = b + (omega * dt) x b``, projects canonically, applies K, and bilinearly
votes into the camera-frame IWE (plus 3-channel derivative images). Here the
whole packet is warped as one fused tensor expression, votes accumulate via
the separable-matmul scatter (ops/scatter.py), and the derivative images are
replaced by autodiff.

The per-batch shared timestamp (all events in a 100-event batch share the
batch midpoint time; local_image_warped_events.cpp:59-76) is honored by
precomputing per-event effective dt once per packet — it does not depend on
omega, so it lives outside the optimization loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .scatter import bilinear_accumulate
from .blur import gaussian_blur
from .contrast import contrast


class CameraParams(NamedTuple):
    """Static pinhole parameters used by the warp (floats, hashable)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int


class EventPacket(NamedTuple):
    """Fixed-size, device-resident event packet.

    bearings: (N, 3) unit rays for each event's pixel (LUT gather).
    dts:      (N,) effective warp dt (batch midpoint minus packet reference
              time), seconds, float32.
    weights:  (N,) vote weight; 0 marks padding.
    """

    bearings: jnp.ndarray
    dts: jnp.ndarray
    weights: jnp.ndarray


def batch_midpoint_dts(
    ts: jnp.ndarray, valid: jnp.ndarray, batch_size: int, t_ref
) -> jnp.ndarray:
    """Per-event effective dt with batch-shared midpoint semantics.

    Events are grouped into consecutive batches of ``batch_size``; every event
    in a batch warps with dt = (t_first + t_last)/2 - t_ref where first/last
    are the batch's valid extremes (local_image_warped_events.cpp:67-75).
    ``ts`` must be padded to a multiple of batch_size.
    """
    n = ts.shape[0]
    assert n % batch_size == 0, "pad packet to a multiple of event_batch_size"
    tsb = ts.reshape(-1, batch_size)
    vb = valid.reshape(-1, batch_size)
    big = jnp.asarray(jnp.finfo(ts.dtype).max, ts.dtype)
    t_first = jnp.min(jnp.where(vb, tsb, big), axis=1)
    t_last = jnp.max(jnp.where(vb, tsb, -big), axis=1)
    mid = t_first + 0.5 * (t_last - t_first)
    dt = mid - t_ref
    dt = jnp.where(jnp.any(vb, axis=1), dt, 0.0)
    return jnp.repeat(dt, batch_size)


def make_packet(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
    lut: jnp.ndarray,
    cam: CameraParams,
    batch_size: int,
    t_ref,
) -> EventPacket:
    """Assemble an EventPacket from raw event arrays and the bearing LUT."""
    idx = ys.astype(jnp.int32) * cam.width + xs.astype(jnp.int32)
    idx = jnp.where(valid, idx, 0)
    bearings = jnp.take(lut, idx, axis=0)
    dts = batch_midpoint_dts(ts, valid, batch_size, t_ref)
    weights = valid.astype(jnp.float32)
    return EventPacket(bearings=bearings, dts=dts, weights=weights)


def warp_events(omega: jnp.ndarray, packet: EventPacket, cam: CameraParams):
    """First-order rotational warp of the packet; returns pixel coords (px, py).

    Reference math: rotatePoint3DFirstOrder + canonicalProjection +
    applyIntrinsics (src/utils/image_geom_util.cpp:7-58)."""
    delta = packet.dts[:, None] * omega[None, :]
    b = packet.bearings
    rotated = b + jnp.cross(delta, b)
    inv_z = 1.0 / rotated[:, 2]
    px = cam.fx * (rotated[:, 0] * inv_z) + cam.cx
    py = cam.fy * (rotated[:, 1] * inv_z) + cam.cy
    return px, py


@functools.partial(
    jax.jit, static_argnames=("cam", "blur_sigma", "precision", "impl")
)
def local_iwe(
    omega: jnp.ndarray,
    packet: EventPacket,
    cam: CameraParams,
    blur_sigma: float = 1.0,
    precision: str = "highest",
    impl: str = "auto",
) -> jnp.ndarray:
    """Image of warped events for a packet under angular velocity omega.

    Mirrors AngVelEstimator::computeImageOfWarpedEvents
    (local_image_warped_events.cpp:10-57).

    impl: 'xla' = matmul-vote via ops/scatter.py; 'pallas' = fused VMEM
    kernel (ops/pallas_iwe.py); 'auto' = pallas on TPU when the image fits
    VMEM, else xla.
    """
    px, py = warp_events(omega, packet, cam)
    if impl == "auto":
        from .pallas_iwe import vmem_fits

        use_pallas = jax.default_backend() == "tpu" and vmem_fits(
            cam.height, cam.width
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from .pallas_iwe import bilinear_accumulate_pallas

        iwe = bilinear_accumulate_pallas(
            px, py, packet.weights, cam.height, cam.width, precision
        )
    else:
        iwe = bilinear_accumulate(
            px, py, packet.weights, height=cam.height, width=cam.width,
            precision=precision,
        )
    return gaussian_blur(iwe, blur_sigma, precision=precision)


def make_local_objective(
    packet: EventPacket,
    cam: CameraParams,
    blur_sigma: float,
    measure: int,
    precision: str = "highest",
):
    """Negative-contrast objective f(omega) plus value_and_grad, both jittable.

    Equivalent of the GSL callback triple {f, df, fdf}
    (src/frontend/local_optim_contrast_gsl.cpp:20-70), with df via autodiff.
    """

    def f(omega):
        iwe = local_iwe(omega, packet, cam, blur_sigma, precision)
        return -contrast(iwe, measure)

    return f, jax.value_and_grad(f)
