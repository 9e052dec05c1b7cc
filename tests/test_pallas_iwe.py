"""Pallas vote-accumulation kernel vs the XLA matmul path (interpret mode on
CPU; the same comparison runs compiled on real TPU via
examples/tpu_kernel_check.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmax_slam_tpu.ops import scatter
from cmax_slam_tpu.ops.pallas_iwe import LANE, ROWS, bilinear_accumulate_pallas

BLOCK = ROWS * LANE


def test_pallas_forward_matches_xla(rng):
    H, W = 48, 64
    n = BLOCK + 137  # exercise padding
    px = jnp.asarray(rng.uniform(-3, W + 3, n), jnp.float32)
    py = jnp.asarray(rng.uniform(-3, H + 3, n), jnp.float32)
    w = jnp.asarray((rng.uniform(size=n) > 0.1).astype(np.float32))
    ref = scatter.bilinear_accumulate(px, py, w, height=H, width=W)
    out = bilinear_accumulate_pallas(px, py, w, H, W, "highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_pallas_gradient_matches_xla(rng):
    H, W = 32, 32
    n = 512
    px = jnp.asarray(rng.uniform(2, W - 3, n), jnp.float32)
    py = jnp.asarray(rng.uniform(2, H - 3, n), jnp.float32)
    w = jnp.ones(n, jnp.float32)
    key = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)

    def loss_ref(a, b, c):
        return jnp.vdot(key, scatter.bilinear_accumulate(a, b, c, height=H, width=W))

    def loss_pls(a, b, c):
        return jnp.vdot(key, bilinear_accumulate_pallas(a, b, c, H, W, "highest"))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(px, py, w)
    g_pls = jax.grad(loss_pls, argnums=(0, 1, 2))(px, py, w)
    for a, b in zip(g_ref, g_pls):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("orient", ["rows", "mixed"])
def test_hat_orientations_match_default(rng, orient):
    """The hat/contraction layout variants ('orient'; the library default is
    the measured-fastest 'lanes') must agree with each other in forward AND
    gradient — same votes, same floor-parametrized one-sided derivative."""
    H, W = 40, 56
    n = 700
    px = jnp.asarray(rng.uniform(-2, W + 2, n), jnp.float32)
    py = jnp.asarray(rng.uniform(-2, H + 2, n), jnp.float32)
    w = jnp.asarray(rng.uniform(size=n), jnp.float32)
    key = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)

    def loss(o):
        def f(a, b, c):
            return jnp.vdot(key, bilinear_accumulate_pallas(
                a, b, c, H, W, "highest", 512, 8, o))
        return f

    ref = bilinear_accumulate_pallas(px, py, w, H, W, "highest", 512, 8,
                                     "lanes")
    out = bilinear_accumulate_pallas(px, py, w, H, W, "highest", 512, 8,
                                     orient)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    g_ref = jax.grad(loss("lanes"), argnums=(0, 1, 2))(px, py, w)
    g_out = jax.grad(loss(orient), argnums=(0, 1, 2))(px, py, w)
    for a, b in zip(g_ref, g_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
