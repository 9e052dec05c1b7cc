"""Fletcher-Reeves CG minimizer: convergence on standard problems.

The whole solve compiles to one XLA while_loop; checks mirror the reference's
GSL budget and tolerances (local_optim_contrast_gsl.cpp:119-122)."""

import numpy as np
import jax
import jax.numpy as jnp

from cmax_slam_tpu.ops import optim


def test_quadratic_bowl():
    A = jnp.asarray([[3.0, 0.4, 0.0], [0.4, 2.0, 0.1], [0.0, 0.1, 1.0]])
    b = jnp.asarray([1.0, -2.0, 0.5])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = optim.minimize_fr_cg(jax.value_and_grad(f), jnp.zeros(3), grad_tol=1e-6)
    x_star = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-4)
    assert int(res.status) in (optim.CONVERGED_FTOL, optim.CONVERGED_GTOL)


def test_rosenbrock_descends():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    x0 = jnp.asarray([-0.5, 0.5])
    res = optim.minimize_fr_cg(
        jax.value_and_grad(f), x0, max_line_searches=50, fun_tol=1e-12, grad_tol=1e-8
    )
    assert float(res.fun) < float(f(x0)) * 0.02  # strong descent within budget


def test_jit_compiles_whole_solve():
    def f(x):
        return jnp.sum((x - 1.5) ** 2) + 0.1 * jnp.sum(x**4)

    @jax.jit
    def solve(x0):
        return optim.minimize_fr_cg(
            jax.value_and_grad(f), x0, grad_tol=1e-6, fun_tol=1e-12
        )

    res = solve(jnp.zeros(4))
    res2 = solve(jnp.full(4, 3.0))
    # Both starts must land at the same minimum to line-search resolution
    # (GSL-style no-progress stopping leaves ~1e-3 slack near the optimum).
    assert np.allclose(np.asarray(res.x), np.asarray(res2.x), atol=5e-3)
    x_star = 1.1757  # root of 2(x-1.5) + 0.4 x^3
    assert np.allclose(np.asarray(res.x), x_star, atol=5e-3)
    assert np.allclose(np.asarray(res2.x), x_star, atol=5e-3)


def test_stagnation_tolerance_stops_early():
    def f(x):
        return jnp.sum(x * x)

    res = optim.minimize_fr_cg(
        jax.value_and_grad(f), jnp.asarray([10.0, -7.0]), fun_tol=1e-4, grad_tol=1e-30
    )
    assert int(res.iters) < 50


def test_already_converged_at_start():
    def f(x):
        return jnp.sum(x * x)

    res = optim.minimize_fr_cg(jax.value_and_grad(f), jnp.zeros(3), grad_tol=1e-3)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert float(res.fun) <= 1e-12


def test_grid_ladder_matches_sequential():
    """ladder='grid' batches the bracket evaluations but must REPLAY the
    sequential ladder's decisions: same step choices, same iterates, same
    iteration counts (up to vmap-reassociation float noise) on objectives
    where 'vector''s global argmin may pick different rungs."""
    import numpy as np

    def rosen(x):
        return (100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
                + 100.0 * (x[2] - x[1] ** 2) ** 2 + (1 - x[1]) ** 2)

    for f, x0, ls in [
        (lambda x: jnp.sum((x - jnp.array([0.3, -0.7, 1.1])) ** 2) +
         0.3 * jnp.sin(5 * x[0]), jnp.zeros(3), 40),
        (rosen, jnp.array([-1.2, 1.0, -0.5]), 60),
    ]:
        rs = optim.minimize_fr_cg(jax.value_and_grad(f), x0,
                                  max_line_searches=ls, ladder="sequential")
        rg = optim.minimize_fr_cg(jax.value_and_grad(f), x0,
                                  max_line_searches=ls, ladder="grid")
        assert int(rs.iters) == int(rg.iters), (rs.iters, rg.iters)
        np.testing.assert_allclose(np.asarray(rg.x), np.asarray(rs.x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(rg.fun), float(rs.fun),
                                   rtol=1e-5, atol=1e-7)


def test_grid_ladder_under_vmap():
    """make_cg_body(ladder='grid') must compose with vmap (nested vmap:
    lanes x ladder rungs) — the batched trackers vmap the CG body."""
    import numpy as np

    def f(x):
        return jnp.sum((x - jnp.array([0.5, -0.25, 1.0])) ** 2)

    body = optim.make_cg_body(jax.value_and_grad(f), f, dim=3, ladder="grid")
    states = jax.vmap(lambda x0: optim.cg_init(jax.value_and_grad(f), x0))(
        jnp.stack([jnp.zeros(3), jnp.ones(3), -jnp.ones(3), 2 * jnp.ones(3)])
    )
    out = jax.vmap(lambda s: optim.cg_run_rounds(body, s, 8, 50))(states)
    assert np.all(np.asarray(out.f) < 1e-3), np.asarray(out.f)
