"""Vote accumulation, Gaussian blur, and contrast measures vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmax_slam_tpu.ops import scatter, blur, contrast
from cmax_slam_tpu import config


def numpy_bilinear_scatter(px, py, w, H, W):
    """Scalar-loop oracle replicating local_image_warped_events.cpp:137-151."""
    img = np.zeros((H, W), dtype=np.float64)
    for x, y, wi in zip(px, py, w):
        xx, yy = int(np.floor(x)), int(np.floor(y))
        if 1 <= xx < W - 2 and 1 <= yy < H - 2 and wi != 0:
            dx, dy = x - xx, y - yy
            img[yy, xx] += wi * (1 - dx) * (1 - dy)
            img[yy, xx + 1] += wi * dx * (1 - dy)
            img[yy + 1, xx] += wi * (1 - dx) * dy
            img[yy + 1, xx + 1] += wi * dx * dy
    return img


def test_bilinear_accumulate_matches_scalar_oracle(rng):
    H, W = 40, 60
    n = 500
    px = rng.uniform(-5, W + 5, n)
    py = rng.uniform(-5, H + 5, n)
    w = np.ones(n)
    w[::7] = 0.0  # padded events
    out = scatter.bilinear_accumulate(
        jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
        jnp.asarray(w, jnp.float32), height=H, width=W,
    )
    ref = numpy_bilinear_scatter(px, py, w, H, W)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    # Total mass conservation for in-bounds events
    assert np.isclose(np.asarray(out).sum(), ref.sum(), atol=1e-3)


def test_bilinear_accumulate_gradient_matches_reference_formula(rng):
    """d(vote)/d(px) must reproduce the Kronecker-delta derivative
    (local_image_warped_events.cpp:162-166): for a single event the image
    gradient w.r.t. px is [-(1-dy), (1-dy), -dy, dy] on the 4 pixels."""
    H, W = 16, 16
    px0, py0 = 5.3, 7.6
    dx, dy = 0.3, 0.6

    def img_sum_weighted(p):
        img = scatter.bilinear_accumulate(
            p[:1], p[1:], jnp.ones(1), height=H, width=W
        )
        return img

    jac = jax.jacobian(lambda p: img_sum_weighted(p))(jnp.asarray([px0, py0], jnp.float32))
    j = np.asarray(jac)  # (H, W, 2)
    xx, yy = 5, 7
    np.testing.assert_allclose(j[yy, xx, 0], -(1 - dy), atol=1e-5)
    np.testing.assert_allclose(j[yy, xx + 1, 0], (1 - dy), atol=1e-5)
    np.testing.assert_allclose(j[yy + 1, xx, 0], -dy, atol=1e-5)
    np.testing.assert_allclose(j[yy + 1, xx + 1, 0], dy, atol=1e-5)
    np.testing.assert_allclose(j[yy, xx, 1], -(1 - dx), atol=1e-5)
    np.testing.assert_allclose(j[yy + 1, xx, 1], (1 - dx), atol=1e-5)


def test_bilinear_two_split(rng):
    H, W = 24, 32
    n = 200
    px = rng.uniform(0, W, n)
    py = rng.uniform(0, H, n)
    w = np.ones(n)
    sel = (rng.uniform(size=n) > 0.5)
    old, new = scatter.bilinear_accumulate_two(
        jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
        jnp.asarray(w, jnp.float32), jnp.asarray(sel), height=H, width=W,
    )
    ref_old = numpy_bilinear_scatter(px[~sel], py[~sel], w[~sel], H, W)
    ref_new = numpy_bilinear_scatter(px[sel], py[sel], w[sel], H, W)
    np.testing.assert_allclose(np.asarray(old), ref_old, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new), ref_new, atol=1e-4)


def numpy_gaussian_blur(img, sigma):
    """Oracle: separable Gaussian with reflect-101, OpenCV auto ksize."""
    from scipy.ndimage import correlate1d

    k = blur.gaussian_kernel(sigma)
    out = correlate1d(img, k, axis=0, mode="mirror")
    out = correlate1d(out, k, axis=1, mode="mirror")
    return out


def test_gaussian_blur_matches_scipy(rng):
    img = rng.normal(size=(37, 53)).astype(np.float32)
    for sigma in (0.5, 1.0, 2.0):
        out = blur.gaussian_blur(jnp.asarray(img), sigma)
        ref = numpy_gaussian_blur(img.astype(np.float64), sigma)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_gaussian_blur_preserves_interior_mass(rng):
    # reflect-101 redistributes mass only near borders; with an empty margin
    # wider than the kernel radius, total mass is exactly conserved.
    img = np.zeros((32, 32), dtype=np.float32)
    img[8:24, 8:24] = np.abs(rng.normal(size=(16, 16))).astype(np.float32)
    out = blur.gaussian_blur(jnp.asarray(img), 1.0)
    np.testing.assert_allclose(np.asarray(out).sum(), img.sum(), rtol=1e-5)


def test_gaussian_blur_zero_sigma_identity(rng):
    img = rng.normal(size=(8, 8)).astype(np.float32)
    out = blur.gaussian_blur(jnp.asarray(img), 0.0)
    np.testing.assert_array_equal(np.asarray(out), img)


def test_contrast_measures(rng):
    img = rng.normal(size=(30, 40)).astype(np.float64)
    j = jnp.asarray(img)
    np.testing.assert_allclose(
        float(contrast.variance(j)), img.var(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(contrast.mean_square(j)), (img**2).mean(), rtol=1e-5
    )
    assert float(contrast.contrast(j, config.VARIANCE_CONTRAST)) == pytest.approx(
        img.var(), rel=1e-5
    )


def test_sobel_matches_opencv_convention(rng):
    """cv::Sobel 3x3 kernels: x: [[-1,0,1],[-2,0,2],[-1,0,1]], reflect-101."""
    from scipy.ndimage import correlate

    img = rng.normal(size=(20, 25))
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float64)
    gx_ref = correlate(img, kx, mode="mirror")
    gy_ref = correlate(img, kx.T, mode="mirror")
    ref = (gx_ref**2 + gy_ref**2).mean()
    out = float(contrast.gradient_magnitude(jnp.asarray(img)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_gaussian_blur_conv_path_matches_matmul(rng):
    """Large images dispatch to the separable conv; values must match the
    banded-matmul path exactly (same kernel, same reflect-101 border)."""
    img = rng.normal(size=(1100, 2048)).astype(np.float32)  # > 1<<21 px
    out_conv = blur.gaussian_blur(jnp.asarray(img), 1.0)
    ref = numpy_gaussian_blur(img.astype(np.float64), 1.0)
    np.testing.assert_allclose(np.asarray(out_conv), ref, atol=1e-4)


def test_bilinear_accumulate_chunked_path(rng, monkeypatch):
    """Force the chunked scan path and check it matches the dense path."""
    from cmax_slam_tpu.ops import scatter as sc

    H, W = 40, 60
    n = 5000
    px = rng.uniform(-5, W + 5, n).astype(np.float32)
    py = rng.uniform(-5, H + 5, n).astype(np.float32)
    w = np.ones(n, np.float32)
    dense = sc.bilinear_accumulate(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(w), height=H, width=W
    )
    monkeypatch.setattr(sc, "_HAT_BYTES_BUDGET", 1 << 20)  # ~2.6k events/chunk
    sc.bilinear_accumulate._clear_cache()
    chunked = sc.bilinear_accumulate(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(w), height=H, width=W
    )
    sc.bilinear_accumulate._clear_cache()
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), atol=1e-3)


def test_scatter_add_path_matches_matmul_votes(rng):
    """bilinear_accumulate_scatter (O(N) hardware scatter) == the
    rank-factorized matmul path, values AND gradients (same floor
    parametrization and in-bounds rule)."""
    H, W = 48, 64
    n = 4000
    px = jnp.asarray(rng.uniform(-3, W + 3, n), jnp.float32)
    py = jnp.asarray(rng.uniform(-3, H + 3, n), jnp.float32)
    w = jnp.asarray(rng.uniform(0.0, 2.0, n), jnp.float32)
    # include exact-integer coordinates (the zero-subgradient trap)
    px = px.at[:100].set(jnp.floor(px[:100]))

    a = scatter.bilinear_accumulate(px, py, w, height=H, width=W)
    b = scatter.bilinear_accumulate_scatter(px, py, w, height=H, width=W)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    tgt = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)

    def loss_mat(px_, py_, w_):
        return jnp.sum(
            scatter.bilinear_accumulate(px_, py_, w_, height=H, width=W) * tgt
        )

    def loss_sca(px_, py_, w_):
        return jnp.sum(
            scatter.bilinear_accumulate_scatter(px_, py_, w_, height=H, width=W)
            * tgt
        )

    g_mat = jax.grad(loss_mat, argnums=(0, 1, 2))(px, py, w)
    g_sca = jax.grad(loss_sca, argnums=(0, 1, 2))(px, py, w)
    for gm, gs, name in zip(g_mat, g_sca, ("dpx", "dpy", "dw")):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gs), atol=2e-5, err_msg=name
        )
