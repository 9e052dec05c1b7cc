"""Contrast (focus) objectives over images of warped events.

Reference: src/frontend/local_focus_funcs.cpp:9-120 and
src/backend/global_focus_funcs.cpp:11-80. The reference hand-codes the
gradient of each measure w.r.t. the per-parameter derivative images; here the
measures are plain differentiable reductions and all gradients come from
autodiff through the full warp -> vote -> blur -> contrast chain.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import (
    IMAGE_GRADIENT_MAGNITUDE_CONTRAST,
    MEAN_SQUARE_CONTRAST,
    VARIANCE_CONTRAST,
)


def variance(image: jnp.ndarray) -> jnp.ndarray:
    """Population variance of pixel intensities (cv::meanStdDev semantics;
    local_focus_funcs.cpp:26-44)."""
    mean = jnp.mean(image)
    return jnp.mean(jnp.square(image - mean))


def mean_square(image: jnp.ndarray) -> jnp.ndarray:
    """Mean of squared intensities (local_focus_funcs.cpp:9-24)."""
    return jnp.mean(jnp.square(image))


def _sobel(image: jnp.ndarray, axis: int) -> jnp.ndarray:
    """3x3 Sobel with BORDER_REFLECT_101, matching cv::Sobel defaults."""
    pad = [(0, 0)] * image.ndim
    pad[-2] = (1, 1)
    pad[-1] = (1, 1)
    p = jnp.pad(image, pad, mode="reflect")
    # Separable: derivative [-1, 0, 1] along `axis`, smoothing [1, 2, 1] along other.
    if axis == 1:  # d/dx (columns)
        d = p[..., :, 2:] - p[..., :, :-2]
        out = d[..., :-2, :] + 2.0 * d[..., 1:-1, :] + d[..., 2:, :]
    else:  # d/dy (rows)
        d = p[..., 2:, :] - p[..., :-2, :]
        out = d[..., :, :-2] + 2.0 * d[..., :, 1:-1] + d[..., :, 2:]
    return out


def gradient_magnitude(image: jnp.ndarray) -> jnp.ndarray:
    """Mean squared Sobel-gradient magnitude (local_focus_funcs.cpp:47-73)."""
    gx = _sobel(image, axis=1)
    gy = _sobel(image, axis=0)
    return jnp.mean(gx * gx + gy * gy)


def contrast(image: jnp.ndarray, measure: int = VARIANCE_CONTRAST) -> jnp.ndarray:
    """Dispatch on the contrast measure (computeContrast,
    local_focus_funcs.cpp:82-120). `measure` is a static Python int."""
    if measure == MEAN_SQUARE_CONTRAST:
        return mean_square(image)
    if measure == IMAGE_GRADIENT_MAGNITUDE_CONTRAST:
        return gradient_magnitude(image)
    return variance(image)


# ---------------------------------------------------------------------------
# Sufficient-statistics form: every measure above is a function of image-wide
# sums, so a region-decomposed objective (back-end FOV-crop solver,
# warp_pano.make_crop_objective) can evaluate the crop's sums per iteration
# and fold in per-window-constant sums for the untouched remainder — the
# result is bit-for-bit the measure over the full panorama.
# ---------------------------------------------------------------------------

def region_stats(
    image: jnp.ndarray, mask: jnp.ndarray, measure: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(s1, s2) sums of the measure's integrand over ``mask`` pixels.

    variance:      s1 = sum(I),  s2 = sum(I^2)
    mean_square:   s1 = 0,       s2 = sum(I^2)
    grad-mag:      s1 = 0,       s2 = sum(|Sobel I|^2)  (Sobel over the whole
                   crop, masked afterwards — stencils of masked-in pixels must
                   stay inside the crop, which the caller's halo guarantees).
    """
    if measure == IMAGE_GRADIENT_MAGNITUDE_CONTRAST:
        gx = _sobel(image, axis=1)
        gy = _sobel(image, axis=0)
        s2 = jnp.sum((gx * gx + gy * gy) * mask)
        return jnp.zeros_like(s2), s2
    s2 = jnp.sum(jnp.square(image) * mask)
    if measure == MEAN_SQUARE_CONTRAST:
        return jnp.zeros_like(s2), s2
    return jnp.sum(image * mask), s2


def full_stats(image: jnp.ndarray, measure: int):
    """(s1, s2) over every pixel (mask-free fast path of region_stats)."""
    if measure == IMAGE_GRADIENT_MAGNITUDE_CONTRAST:
        gx = _sobel(image, axis=1)
        gy = _sobel(image, axis=0)
        s2 = jnp.sum(gx * gx + gy * gy)
        return jnp.zeros_like(s2), s2
    s2 = jnp.sum(jnp.square(image))
    if measure == MEAN_SQUARE_CONTRAST:
        return jnp.zeros_like(s2), s2
    return jnp.sum(image), s2


def contrast_from_stats(s1, s2, n_pixels: int, measure: int) -> jnp.ndarray:
    """Measure value from summed statistics over ``n_pixels`` total pixels."""
    if measure == MEAN_SQUARE_CONTRAST:
        return s2 / n_pixels
    if measure == IMAGE_GRADIENT_MAGNITUDE_CONTRAST:
        return s2 / n_pixels
    mean = s1 / n_pixels
    return s2 / n_pixels - mean * mean
