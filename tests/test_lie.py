"""SO(3) ops vs scipy.spatial.transform oracles and finite differences.

Mirrors the reference's numeric-vs-analytic test pattern
(basalt-headers test_sophus.cpp / test_utils.h:22-65)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from cmax_slam_tpu import lie


def random_rotvecs(rng, n=64, scale=np.pi * 0.9):
    v = rng.normal(size=(n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    mags = rng.uniform(1e-8, scale, size=(n, 1))
    return v * mags


def to_scipy(q):
    # lie uses (w, x, y, z); scipy uses (x, y, z, w)
    q = np.asarray(q)
    return R.from_quat(np.concatenate([q[..., 1:], q[..., :1]], axis=-1))


def test_exp_log_roundtrip(rng):
    v = random_rotvecs(rng)
    q = lie.exp(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(lie.log(q)), v, atol=1e-9)


def test_exp_matches_scipy(rng):
    v = random_rotvecs(rng)
    q = np.asarray(lie.exp(jnp.asarray(v)))
    Rm = to_scipy(q).as_matrix()
    np.testing.assert_allclose(Rm, R.from_rotvec(v).as_matrix(), atol=1e-12)


def test_to_matrix_and_rotate(rng):
    v = random_rotvecs(rng)
    q = lie.exp(jnp.asarray(v))
    M = np.asarray(lie.to_matrix(q))
    np.testing.assert_allclose(M, R.from_rotvec(v).as_matrix(), atol=1e-12)
    pts = rng.normal(size=(64, 3))
    out = np.asarray(lie.rotate(q, jnp.asarray(pts)))
    np.testing.assert_allclose(out, np.einsum("nij,nj->ni", M, pts), atol=1e-12)


def test_from_matrix_roundtrip(rng):
    v = random_rotvecs(rng)
    M = R.from_rotvec(v).as_matrix()
    q = np.asarray(lie.from_matrix(jnp.asarray(M)))
    # Sign of q is arbitrary; compare matrices.
    M2 = np.asarray(lie.to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(M2, M, atol=1e-9)


def test_mul_inv(rng):
    v1, v2 = random_rotvecs(rng, 32), random_rotvecs(rng, 32)
    q1, q2 = lie.exp(jnp.asarray(v1)), lie.exp(jnp.asarray(v2))
    q12 = lie.mul(q1, q2)
    M12 = np.asarray(lie.to_matrix(q12))
    np.testing.assert_allclose(
        M12, R.from_rotvec(v1).as_matrix() @ R.from_rotvec(v2).as_matrix(), atol=1e-12
    )
    qi = lie.mul(q1, lie.inv(q1))
    np.testing.assert_allclose(np.abs(np.asarray(qi)[:, 0]), 1.0, atol=1e-12)


def test_hat():
    v = jnp.asarray([1.0, 2.0, 3.0])
    x = jnp.asarray([0.3, -0.2, 0.5])
    np.testing.assert_allclose(
        np.asarray(lie.hat(v) @ x), np.cross(np.asarray(v), np.asarray(x)), atol=1e-12
    )


def test_left_jacobian_finite_difference(rng):
    """J_l(v) = d/d(eps) log-space: exp(v + J_l^-1-ish ...) — check the defining
    identity exp(v + eps) ~ exp(J_l(v) @ eps) * exp(v) by finite differences."""
    v = random_rotvecs(rng, 16, scale=2.5)
    eps = 1e-7
    for vi in v:
        Jl = np.asarray(lie.left_jacobian(jnp.asarray(vi)))
        for k in range(3):
            d = np.zeros(3)
            d[k] = eps
            lhs = R.from_rotvec(vi + d).as_matrix()
            rhs = R.from_rotvec(Jl @ d).as_matrix() @ R.from_rotvec(vi).as_matrix()
            np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_left_jacobian_inverse(rng):
    v = random_rotvecs(rng, 32, scale=2.5)
    Jl = np.asarray(lie.left_jacobian(jnp.asarray(v)))
    Jli = np.asarray(lie.left_jacobian_inv(jnp.asarray(v)))
    prod = np.einsum("nij,njk->nik", Jl, Jli)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-9)


def test_small_angle_stability():
    tiny = jnp.asarray([[0.0, 0.0, 0.0], [1e-12, -1e-12, 1e-12], [1e-7, 0.0, 0.0]])
    q = lie.exp(tiny)
    assert np.all(np.isfinite(np.asarray(q)))
    v = lie.log(q)
    np.testing.assert_allclose(np.asarray(v), np.asarray(tiny), atol=1e-12)
    assert np.all(np.isfinite(np.asarray(lie.left_jacobian(tiny))))
    assert np.all(np.isfinite(np.asarray(lie.left_jacobian_inv(tiny))))


def test_grad_flows_through_exp():
    def f(v):
        return jnp.sum(lie.rotate(lie.exp(v), jnp.asarray([1.0, 0.0, 0.0])))

    g = jax.grad(f)(jnp.asarray([0.1, 0.2, -0.3]))
    gn = jax.grad(f)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.isfinite(np.asarray(gn)))
