"""SO(3) B-spline: blending matrices, evaluation, Jacobians, and fitting.

Follows the reference's test pattern (basalt-headers test_spline.cpp:313-420):
analytic Jacobians vs central finite differences on random trajectories."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from cmax_slam_tpu import lie, spline


def test_blending_matrix_linear():
    # Non-cumulative order-2 basis: value = (1-u) k0 + u k1
    M = spline.blending_matrix(2, cumulative=False)
    np.testing.assert_allclose(M, [[1.0, 0.0], [-1.0, 1.0]], atol=1e-12)
    Mc = spline.blending_matrix(2, cumulative=True)
    np.testing.assert_allclose(Mc, [[1.0, 0.0], [0.0, 1.0]], atol=1e-12)


def test_blending_matrix_cubic():
    # Standard uniform cubic B-spline basis (rows = powers of u).
    M = spline.blending_matrix(4, cumulative=False)
    expected = (
        np.array(
            [
                [1, 4, 1, 0],
                [-3, 0, 3, 0],
                [3, -6, 3, 0],
                [-1, 3, -3, 1],
            ],
            dtype=np.float64,
        )
        / 6.0
    )
    np.testing.assert_allclose(M, expected, atol=1e-12)
    Mc = spline.blending_matrix(4, cumulative=True)
    # rows = powers of u, columns = cumulative basis functions
    expected_c = (
        np.array(
            [
                [6, 5, 1, 0],
                [0, 3, 3, 0],
                [0, -3, 3, 0],
                [0, 1, -2, 1],
            ],
            dtype=np.float64,
        )
        / 6.0
    )
    np.testing.assert_allclose(Mc, expected_c, atol=1e-12)


def random_knots(rng, n):
    """Random walk of knots (like So3Spline::genRandomTrajectory)."""
    qs = [np.array([1.0, 0, 0, 0])]
    for _ in range(n - 1):
        step = rng.normal(size=3) * 0.4
        qs.append(spline._np_quat_mul(qs[-1], spline._np_quat_exp(step)))
    return np.stack(qs)


def np_evaluate(knots, t, t0, dt, order):
    """Pure-numpy float64 oracle for spline.evaluate (cumulative formula).

    Needed because XLA CPU's *vectorized* float64 transcendentals are only
    ~5e-9 accurate, which is too noisy as a finite-difference oracle."""
    M = spline.blending_matrix(order, cumulative=True)
    rel = (t - t0) / dt
    s = min(max(int(np.floor(rel)), 0), len(knots) - order)
    u = rel - s
    coeff = np.array([u**i for i in range(order)]) @ M
    res = knots[s]
    for j in range(1, order):
        q0, q1 = knots[s + j - 1], knots[s + j]
        delta = spline._np_quat_log(
            spline._np_quat_mul(q0 * np.array([1.0, -1, -1, -1]), q1)
        )
        res = spline._np_quat_mul(res, spline._np_quat_exp(coeff[j] * delta))
    return res, s


@pytest.mark.parametrize("order", [2, 4])
def test_evaluate_endpoint_consistency(rng, order):
    """At u=0 the linear spline equals the segment's first knot; value is
    continuous across segment boundaries for both orders."""
    knots = random_knots(rng, 8)
    kj = jnp.asarray(knots)
    dt = 0.1
    if order == 2:
        q = spline.evaluate(kj, jnp.asarray([0.3]), 0.0, dt, order)
        q_knot = knots[3]
        Rq = spline._np_quat_rotmat(np.asarray(q)[0])
        np.testing.assert_allclose(Rq, spline._np_quat_rotmat(q_knot), atol=1e-6)
    # continuity across boundary
    eps = 1e-6
    for t in (0.2, 0.3):
        qa = np.asarray(spline.evaluate(kj, jnp.asarray([t - eps]), 0.0, dt, order))[0]
        qb = np.asarray(spline.evaluate(kj, jnp.asarray([t + eps]), 0.0, dt, order))[0]
        Ra = spline._np_quat_rotmat(qa)
        Rb = spline._np_quat_rotmat(qb)
        np.testing.assert_allclose(Ra, Rb, atol=1e-4)


def test_linear_spline_is_geodesic_interp(rng):
    """Order-2 cumulative spline == SLERP between adjacent knots."""
    knots = random_knots(rng, 4)
    dt = 0.5
    u = 0.3
    q = np.asarray(
        spline.evaluate(jnp.asarray(knots), jnp.asarray([dt * (1 + u)]), 0.0, dt, 2)
    )[0]
    d = spline._np_quat_mul(knots[1] * np.array([1.0, -1, -1, -1]), knots[2])
    expected = spline._np_quat_mul(knots[1], spline._np_quat_exp(u * spline._np_quat_log(d)))
    np.testing.assert_allclose(
        spline._np_quat_rotmat(q), spline._np_quat_rotmat(expected), atol=1e-6
    )


@pytest.mark.parametrize("order", [2, 4])
def test_closed_form_jacobian_vs_finite_difference(rng, order):
    """d R(t) / d(left-perturbation of knot i): closed-form recursion
    (so3_spline.h:241-273 port) vs central differences."""
    knots = random_knots(rng, order + 3)
    kj = jnp.asarray(knots)
    dt = 0.2
    t_val = 0.2 * 1.0 + 0.13  # inside segment 1
    _, s_, J = spline.evaluate_with_jacobian(kj, jnp.asarray([t_val]), 0.0, dt, order)
    s = int(np.asarray(s_)[0])
    J = np.asarray(J)[0]  # (order, 3, 3)
    q, _ = np_evaluate(knots, t_val, 0.0, dt, order)

    eps = 1e-6
    for i in range(order):
        for k in range(3):
            d = np.zeros(3)
            d[k] = eps
            kp = knots.copy()
            km = knots.copy()
            kp[s + i] = spline._np_quat_mul(spline._np_quat_exp(d), kp[s + i])
            km[s + i] = spline._np_quat_mul(spline._np_quat_exp(-d), km[s + i])
            qp, _ = np_evaluate(kp, t_val, 0.0, dt, order)
            qm, _ = np_evaluate(km, t_val, 0.0, dt, order)
            # d(R)/d(eps) expressed as left-perturbation of R(t):
            # log(R_p R(t)^-1) / (2 eps)
            dq = spline._np_quat_mul(qp, q * np.array([1.0, -1, -1, -1]))
            dqm = spline._np_quat_mul(qm, q * np.array([1.0, -1, -1, -1]))
            fd = (spline._np_quat_log(dq) - spline._np_quat_log(dqm)) / (2 * eps)
            np.testing.assert_allclose(J[i][:, k], fd, atol=1e-5)


@pytest.mark.parametrize("order", [2, 4])
def test_autodiff_matches_closed_form_jacobian(rng, order):
    """Autodiff through `evaluate` == the reference's hand-coded Jacobian."""
    knots = random_knots(rng, order + 3)
    kj = jnp.asarray(knots)
    dt = 0.2
    t = jnp.asarray([0.33])
    _, s, J_closed = spline.evaluate_with_jacobian(kj, t, 0.0, dt, order)
    s = int(np.asarray(s)[0])

    def eval_perturbed(drotv):
        # left-perturb all knots, evaluate, return rotvec of R(t) R0(t)^-1
        pert = lie.mul(lie.exp(drotv), kj)
        q = spline.evaluate(pert, t, 0.0, dt, order)[0]
        q0 = spline.evaluate(kj, t, 0.0, dt, order)[0]
        return lie.log(lie.mul(q, lie.inv(q0)))

    J_auto = jax.jacobian(eval_perturbed)(jnp.zeros((len(knots), 3)))
    J_auto = np.asarray(J_auto)  # (3, K, 3)
    for i in range(order):
        np.testing.assert_allclose(
            J_auto[:, s + i, :], np.asarray(J_closed)[0][i], atol=1e-6
        )
    # knots outside the active window have zero influence
    for i in range(len(knots)):
        if not (s <= i < s + order):
            np.testing.assert_allclose(J_auto[:, i, :], 0.0, atol=1e-9)


@pytest.mark.parametrize("order", [2, 4])
def test_fit_ctrl_poses_roundtrip(rng, order):
    """Sample a random spline, fit control poses to the samples, and check
    the fitted spline reproduces the samples (trajectory.cpp:112-192)."""
    knots_true = random_knots(rng, order + 4)
    dt = 0.1
    num_cps = len(knots_true)
    t_max = (num_cps - order + 1) * dt
    times = np.linspace(1e-6, t_max - 1e-6, 40)
    qs = np.asarray(
        spline.evaluate(jnp.asarray(knots_true), jnp.asarray(times), 0.0, dt, order)
    )

    fitted = spline.fit_ctrl_poses(times, qs, 0.0, dt, num_cps, order)
    qs_fit = np.asarray(
        spline.evaluate(jnp.asarray(fitted), jnp.asarray(times), 0.0, dt, order)
    )
    for a, b in zip(qs, qs_fit):
        Ra, Rb = spline._np_quat_rotmat(a), spline._np_quat_rotmat(b)
        err = np.linalg.norm(
            spline._np_quat_log(
                spline._np_quat_mul(a * np.array([1.0, -1, -1, -1]), b)
            )
        )
        assert err < 0.02, f"fit error {err}"


def test_incremental_update():
    knots = np.stack([np.array([1.0, 0, 0, 0])] * 4)
    drotv = np.tile(np.array([0.1, 0.0, 0.0]), (2, 1))
    out = np.asarray(
        spline.incremental_update(jnp.asarray(knots), jnp.asarray(drotv), 2)
    )
    np.testing.assert_allclose(out[:2], knots[:2], atol=1e-12)
    expected = spline._np_quat_exp(np.array([0.1, 0, 0]))
    np.testing.assert_allclose(out[2], expected, atol=1e-7)


def test_apply_masked_increments_freezes():
    knots = jnp.asarray(np.stack([np.array([1.0, 0, 0, 0])] * 3))
    drotv = jnp.asarray(np.tile([0.2, -0.1, 0.05], (3, 1)))
    mask = jnp.asarray([0.0, 1.0, 1.0])
    out = np.asarray(spline.apply_masked_increments(knots, drotv, mask))
    np.testing.assert_allclose(out[0], [1, 0, 0, 0], atol=1e-12)
    assert abs(out[1][0] - 1.0) > 1e-4  # moved


def test_trajectory_class(rng):
    traj = spline.Trajectory(0.0, 0.05, order=2)
    # constant angular velocity poses
    omega = np.array([0.5, -0.2, 0.8])
    times = np.linspace(0, 0.2, 21)
    qs = np.stack([spline._np_quat_exp(omega * t) for t in times])
    cps = traj.generate_ctrl_poses(times, qs, 0.0, 0.2)
    assert len(cps) == 5  # round(0.2/0.05) + 1
    traj.push_ctrl_poses(cps)
    q_eval = traj.evaluate(0.1)[0]
    expected = spline._np_quat_exp(omega * 0.1)
    np.testing.assert_allclose(
        spline._np_quat_rotmat(q_eval), spline._np_quat_rotmat(expected), atol=1e-3
    )


def test_evaluate_rotmats_matches_aos(rng):
    """Lane-major evaluate_rotmats == to_matrix(evaluate(...)) (both orders)."""
    import jax.numpy as jnp
    from cmax_slam_tpu import lie

    for order in (2, 4):
        K = 8
        rv = rng.normal(size=(K, 3)) * 0.5
        knots = jnp.asarray(
            np.stack([spline._np_quat_exp(v) for v in rv]), jnp.float32
        )
        t = jnp.asarray(rng.uniform(0, (K - order + 1) * 0.1, 64), jnp.float32)
        q = spline.evaluate(knots, t, 0.0, 0.1, order)
        R_ref = np.asarray(lie.to_matrix(q))
        R_soa = spline.evaluate_rotmats(knots, t, 0.0, 0.1, order)
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(
                    np.asarray(R_soa[i][j]), R_ref[:, i, j],
                    rtol=1e-5, atol=1e-6, err_msg=f"order={order} R[{i}][{j}]",
                )
