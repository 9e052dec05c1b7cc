"""Back-end global warp: events -> panoramic image of warped events through a
continuous-time SO(3) spline trajectory.

Reference: EventWarper (src/backend/event_pano_warper.cpp:167-336). Per event
batch the reference evaluates the spline with its hand-coded Jacobian, rotates
each bearing, projects to the equirectangular map with its analytic 2x3
Jacobian, chains everything, and scatters votes into IL_old/IL_new plus 3K
derivative images. Here:

- the batch spline evaluation is a vmapped gather + quaternion composition,
- rotation and projection are fused tensor expressions,
- the old/new vote split is two matmul-vote accumulations (ops/scatter.py),
- the map-alignment blend I = IL + alpha * IG' and the Gaussian blur follow,
- ALL derivatives (w.r.t. the 3K free knot increments) come from one
  reverse-mode pass through this function — the 3K derivative images are
  never materialized.

The warp respects the reference's batch-sharing semantics: all events in an
`event_batch_size` batch share the spline pose at the batch-midpoint time
(event_pano_warper.cpp:238-251), and in-batch decimation by event_sample_rate
(:262) is applied by zeroing vote weights (static shapes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie, spline
from ..calib import EquirectCamera
from . import contrast as contrast_mod
from .blur import gaussian_blur
from .contrast import contrast
from .scatter import bilinear_accumulate_two


class PanoWindow(NamedTuple):
    """Fixed-shape device inputs for one back-end window.

    bearings: (3, N) per-event camera-frame rays, component-major — arrays
              with a minor dimension of 3 waste 128/3 of the TPU lane tile,
              so rays are stored transposed and rotated by components.
    batch_times: (B,) spline-evaluation times, relative to the window's spline
                 origin (B = N / event_batch_size).
    weights: (N,) vote weights (0 = padding or decimated).
    is_old: (N,) True if the event leaves the window on the next slide
            (ts < t_next_win_beg; event_pano_warper.cpp:298).
    knots: (K, 4) window sub-trajectory control poses.
    free_mask: (K,) 1.0 for knots optimized this window, 0.0 for frozen.
    t0: scalar — time of knots[0] on the same clock as batch_times.
    dt_knots: scalar knot spacing.
    ig_prime: (H, W) global-map term IG' (zeros on the first window).
    alpha: scalar map-alignment weight (event_pano_warper.cpp:134-165).
    """

    bearings: jnp.ndarray
    batch_times: jnp.ndarray
    weights: jnp.ndarray
    is_old: jnp.ndarray
    knots: jnp.ndarray
    free_mask: jnp.ndarray
    t0: jnp.ndarray
    dt_knots: jnp.ndarray
    ig_prime: jnp.ndarray
    alpha: jnp.ndarray


def warp_to_pano(
    drotv: jnp.ndarray,
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
):
    """Warp all events through the (perturbed) trajectory; returns (px, py).

    Rotation is expanded by matrix components over (B, E) event blocks so the
    TPU lane dimension stays wide (no minor-dim-3 tensors in the hot path)."""
    knots = spline.apply_masked_increments(win.knots, drotv, win.free_mask)
    # Lane-major spline evaluation: rotation-matrix components as (B,) arrays
    # (a (B, 4) quaternion path wastes 124/128 of each vector lane tile and
    # measured as ~90% of the objective's warp cost).
    R = spline.evaluate_rotmats(
        knots, win.batch_times, win.t0, win.dt_knots, order
    )

    B = win.batch_times.shape[0]
    bx = win.bearings[0].reshape(B, -1)
    by = win.bearings[1].reshape(B, -1)
    bz = win.bearings[2].reshape(B, -1)

    def comp(i):
        return (
            R[i][0][:, None] * bx + R[i][1][:, None] * by + R[i][2][:, None] * bz
        )

    x, y, z = comp(0), comp(1), comp(2)
    # Equirectangular projection, inlined on (B, E) blocks
    # (phi = atan2(x, z), theta = asin(y / rho); equirectangular_camera.h:25-26)
    rho = jnp.sqrt(x * x + y * y + z * z)
    phi = jnp.arctan2(x, z)
    theta = jnp.arcsin(jnp.clip(y / rho, -1.0, 1.0))
    px = (pano.cx + phi * pano.fx).reshape(-1)
    py = (pano.cy + theta * pano.fy).reshape(-1)
    return px, py


def _accumulate_image(px, py, weights, height: int, width: int, precision: str):
    """Single vote accumulation, dispatched by image size:

    - big images (panoramas, pano crops): O(N) hardware scatter-add,
    - small images on TPU: the fused Pallas matmul kernel (VMEM-resident),
    - fallback: the XLA rank-factorized matmul.
    All three share the reference's in-bounds rule and gradient semantics."""
    from .scatter import SCATTER_MIN_PIXELS, bilinear_accumulate_scatter

    if height * width >= SCATTER_MIN_PIXELS:
        return bilinear_accumulate_scatter(
            px, py, weights, height=height, width=width
        )
    from .pallas_iwe import bilinear_accumulate_pallas, pick_lane

    lane = pick_lane(height, width)
    if jax.default_backend() == "tpu" and lane > 0:
        return bilinear_accumulate_pallas(
            px, py, weights, height, width, precision, lane
        )
    from .scatter import bilinear_accumulate

    return bilinear_accumulate(
        px, py, weights, height=height, width=width, precision=precision,
    )


def _accumulate_total(px, py, weights, pano: EquirectCamera, precision: str):
    return _accumulate_image(px, py, weights, pano.height, pano.width, precision)


def pano_objective_image(
    drotv: jnp.ndarray,
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    blur_sigma: float,
    precision: str = "highest",
):
    """The blended+blurred optimization image I = IL + alpha*IG', blur.

    Mirrors EventWarper::computeImageOfWarpedEvents
    (event_pano_warper.cpp:167-231) for the *objective*: the contrast only
    ever sees IL_old + IL_new summed, so the hot path accumulates the total
    with one (Pallas) pass; the old/new split is produced separately, once,
    at the optimum (pano_il_split)."""
    px, py = warp_to_pano(drotv, win, pano, order)
    il = _accumulate_total(px, py, win.weights, pano, precision)
    image = il + win.alpha * win.ig_prime
    return il, gaussian_blur(image, blur_sigma, precision=precision)


def pano_il_split(
    drotv: jnp.ndarray,
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    precision: str = "highest",
):
    """IL_old / IL_new at a given trajectory (forward-only; feeds updateIG,
    event_pano_warper.cpp:296-311)."""
    px, py = warp_to_pano(drotv, win, pano, order)
    return bilinear_accumulate_two(
        px, py, win.weights, ~win.is_old,
        height=pano.height, width=pano.width, precision=precision,
    )


def pano_iwe(
    drotv: jnp.ndarray,
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    blur_sigma: float,
    precision: str = "highest",
):
    """IL_old, IL_new, and the blended+blurred optimization image I."""
    il_old, il_new = pano_il_split(drotv, win, pano, order, precision)
    image = il_old + il_new + win.alpha * win.ig_prime
    image = gaussian_blur(image, blur_sigma, precision=precision)
    return il_old, il_new, image


def make_pano_objective(
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    blur_sigma: float,
    measure: int,
    precision: str = "highest",
):
    """Negative-contrast objective over flattened knot increments R^{3K}.

    Equivalent of the GSL callback global_contrast_fdf
    (global_optim_contrast_gsl_analytical.cpp:17-68) with the gradient by
    autodiff instead of 3K derivative images."""
    K = win.knots.shape[0]

    def f(flat_drotv):
        drotv = flat_drotv.reshape(K, 3)
        _, image = pano_objective_image(
            drotv, win, pano, order, blur_sigma, precision
        )
        return -contrast(image, measure)

    return f, jax.value_and_grad(f)


def derivative_images(
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    blur_sigma: float,
) -> jnp.ndarray:
    """Per-parameter derivative images d(IWE)/d(knot increments): (K, 3, H, W).

    The reference accumulates these 3K channel images in its hot loop
    (event_pano_warper.cpp:313-333) as the carrier of the analytic gradient;
    our gradients never materialize them, but they remain available for
    debugging/visualization parity (saveDerivativeImages,
    src/utils/image_utils.cpp:41-62) via one forward-mode pass."""
    K = win.knots.shape[0]

    def image_of(drotv):
        _, _, image = pano_iwe(drotv, win, pano, order, blur_sigma)
        return image

    J = jax.jacfwd(image_of)(jnp.zeros((K, 3), jnp.float32))  # (H, W, K, 3)
    return jnp.moveaxis(J, (2, 3), (0, 1))


# ---------------------------------------------------------------------------
# FOV-crop objective
#
# The warped events of one back-end window only ever cover the sensor-FOV
# footprint swept during the window — a small fraction of the panorama (the
# reference's own setUpdateTimesIG leans on the same fact,
# event_pano_warper.cpp:81-107). The solver therefore accumulates votes into
# a crop around the zero-increment footprint and evaluates the contrast as
#     measure(full image) = combine(stats over crop interior,
#                                   per-window-constant stats elsewhere)
# which is EXACT as long as warped events stay inside the crop margin — the
# caller checks the optimum's bounding box and re-solves on the full pano in
# the (rare) escape case. Geometry invariants, with r = blur radius and
# s = 1 for Sobel measures (h = r + s):
#   * crop C ⊇ footprint ⊕ (margin + 2h): all votes stay ≥ 2h inside C,
#   * valid interior V = C shrunk by h on edges not on the image border:
#     blur/Sobel of the crop are exact on V (stencils never read a
#     reflect-101 value that the full image wouldn't also reflect),
#   * blur(IL) (and its Sobel) vanish outside V, so outside V the true image
#     is the constant alpha * blur(IG'), whose stats are precomputed.
# ---------------------------------------------------------------------------


def interior_mask(height: int, width: int, bounds) -> jnp.ndarray:
    """(H, W) float mask of the dynamic interior [vy0, vy1) x [vx0, vx1)."""
    vy0, vy1, vx0, vx1 = bounds
    ry = jax.lax.broadcasted_iota(jnp.int32, (height, 1), 0)
    rx = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    m = (ry >= vy0) & (ry < vy1) & (rx >= vx0) & (rx < vx1)
    return m.astype(jnp.float32)


def warp_bbox(drotv, win: PanoWindow, pano: EquirectCamera, order: int):
    """(min px, max px, min py, max py) over valid events; ±inf when empty."""
    px, py = warp_to_pano(drotv, win, pano, order)
    valid = win.weights > 0
    inf = jnp.asarray(jnp.inf, px.dtype)
    return jnp.stack(
        [
            jnp.min(jnp.where(valid, px, inf)),
            jnp.max(jnp.where(valid, px, -inf)),
            jnp.min(jnp.where(valid, py, inf)),
            jnp.max(jnp.where(valid, py, -inf)),
        ]
    )


def make_crop_objective(
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    blur_sigma: float,
    measure: int,
    crop_hw: tuple,
    x0f,
    y0f,
    a_crop: jnp.ndarray,
    mask: jnp.ndarray,
    out_s1,
    out_s2,
    precision: str = "highest",
):
    """Crop-decomposed negative-contrast objective over R^{3K}; exactly equal
    to make_pano_objective's value under the geometry invariants above.

    a_crop is the per-window-constant alpha * blur(IG') slice under the crop
    (blur linearity: blur(IL + a*IG') = blur(IL) + a*blur(IG')); out_s1/out_s2
    are the constant stats of that term over the pixels outside the valid
    interior."""
    K = win.knots.shape[0]
    Hc, Wc = crop_hw
    n_total = pano.height * pano.width

    def f(flat_drotv):
        drotv = flat_drotv.reshape(K, 3)
        px, py = warp_to_pano(drotv, win, pano, order)
        il = _accumulate_image(px - x0f, py - y0f, win.weights, Hc, Wc, precision)
        image = gaussian_blur(il, blur_sigma, precision=precision) + a_crop
        s1, s2 = contrast_mod.region_stats(image, mask, measure)
        return -contrast_mod.contrast_from_stats(
            s1 + out_s1, s2 + out_s2, n_total, measure
        )

    return f, jax.value_and_grad(f)


def crop_window_constants(
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    blur_sigma: float,
    measure: int,
    crop_hw: tuple,
    crop_ints: jnp.ndarray,
    precision: str = "highest",
):
    """Per-window constants of the crop objective (all inside one jit):
    alpha from the zero-increment IL (whose full-image density equals its
    crop density — zeros elsewhere), the a_crop slice, the interior mask and
    the outside stats. Returns (win_with_alpha, x0f, y0f, a_crop, mask,
    out_s1, out_s2)."""
    Hc, Wc = crop_hw
    y0, x0 = crop_ints[0], crop_ints[1]
    bounds = (crop_ints[2], crop_ints[3], crop_ints[4], crop_ints[5])
    x0f = x0.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)

    K = win.knots.shape[0]
    px0, py0 = warp_to_pano(jnp.zeros((K, 3), jnp.float32), win, pano, order)
    il0 = _accumulate_image(px0 - x0f, py0 - y0f, win.weights, Hc, Wc, precision)
    alpha = compute_alpha(il0, win.ig_prime)

    a_full = alpha * gaussian_blur(win.ig_prime, blur_sigma, precision=precision)
    a_crop = jax.lax.dynamic_slice(a_full, (y0, x0), (Hc, Wc))
    mask = interior_mask(Hc, Wc, bounds)

    # For the Sobel measure the same decomposition holds: a_crop is an exact
    # slice of a_full and the mask sits >= h inside the crop, so the masked
    # Sobel of a_crop equals the Sobel of a_full on those pixels.
    s1_full, s2_full = contrast_mod.full_stats(a_full, measure)
    s1_v, s2_v = contrast_mod.region_stats(a_crop, mask, measure)
    return (
        win._replace(alpha=alpha), x0f, y0f, a_crop, mask,
        s1_full - s1_v, s2_full - s2_v,
    )


def event_density(image: jnp.ndarray, lam0: float = 1.0) -> jnp.ndarray:
    """Event density = sum(I) / aggregated support area (Gallego CVPR'19
    measure used by updateAlpha, event_pano_warper.cpp:142-159)."""
    area = jnp.sum(1.0 - jnp.exp(-image / lam0))
    num = jnp.sum(image)
    return num / jnp.maximum(area, 1e-12)


@functools.partial(jax.jit, static_argnames=())
def compute_alpha(il: jnp.ndarray, ig_prime: jnp.ndarray) -> jnp.ndarray:
    """alpha = density(IL) / density(IG'); 0 when the global map is empty
    (event_pano_warper.cpp:134-165)."""
    nonzero = jnp.sum((ig_prime != 0).astype(jnp.int32))
    dens_ratio = event_density(il) / event_density(ig_prime)
    return jnp.where(nonzero < 1, 0.0, dens_ratio)


def fov_mask(
    q_poses: jnp.ndarray,
    sensor_lut: jnp.ndarray,
    pano: EquirectCamera,
    radius: int = 3,
) -> jnp.ndarray:
    """Union of sensor-FOV footprints on the pano for a set of poses, dilated
    by ``radius`` (setUpdateTimesIG, event_pano_warper.cpp:81-107).

    q_poses: (P, 4) quaternions; sensor_lut: (H*W, 3) sensor bearings.
    Returns (Hp, Wp) int32 0/1 mask.
    """
    R = lie.to_matrix(q_poses)  # (P, 3, 3)
    rays = jnp.einsum("pij,nj->pni", R, sensor_lut).reshape(-1, 3)
    uv = pano.project(rays)
    ix = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, pano.width - 1)
    iy = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, pano.height - 1)
    flat = iy * pano.width + ix
    hits = jnp.zeros(pano.height * pano.width, jnp.int32).at[flat].max(1)
    mask = hits.reshape(pano.height, pano.width)
    k = 2 * radius + 1
    mask = jax.lax.reduce_window(
        mask, jnp.asarray(0, mask.dtype), jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return mask


@jax.jit
def accumulate_global_map(
    ig: jnp.ndarray, il_old: jnp.ndarray, update_times: jnp.ndarray, max_updates: int
) -> jnp.ndarray:
    """IG += IL_old wherever the per-pixel update count is still below the
    saturation limit (updateIG, event_pano_warper.cpp:109-126)."""
    keep = update_times <= max_updates
    return jnp.where(keep, ig + il_old, ig)
