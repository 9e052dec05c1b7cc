"""Jittable nonlinear conjugate-gradient minimizer (Fletcher-Reeves).

TPU-native replacement for GSL's ``gsl_multimin_fdfminimizer_conjugate_fr``
loops (src/frontend/local_optim_contrast_gsl.cpp:74-233,
src/backend/global_optim_contrast_gsl.cpp:15-145). The whole optimization —
line searches included — compiles to a single XLA ``while_loop``, so a CMax
solve is one device program with no host round-trips.

Matches the reference's optimizer semantics:
- Fletcher-Reeves beta = |g1|^2 / |g0|^2 with periodic direction restart.
- Line search: backtracking bracket (function-only evals, cheap forward pass)
  followed by secant refinement on the directional derivative until
  ``|g1 . u| <= tol * |g1|`` (GSL's directional-minimize stopping rule).
- Convergence tests identical to the reference: function stagnation
  ``|1 - f_new/(f_old + 1e-7)| < fun_tol`` and gradient norm
  ``|g| < grad_tol`` with a hard cap of ``max_line_searches`` iterations
  (local_optim_contrast_gsl.cpp:119-204).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Status codes
RUNNING = 0
CONVERGED_FTOL = 1
CONVERGED_GTOL = 2
NO_PROGRESS = 3
MAX_ITERS = 4
TRUST_STOP = 5


def _within_trust(x: jnp.ndarray, trust_radius, block: int) -> jnp.ndarray:
    """True while every ``block``-sized sub-vector of x has norm below
    ``trust_radius``. Degenerate-landscape guard for the bundle adjustment:
    on weakly-textured windows the equirect contrast objective admits long
    spurious-descent paths (pole-ward drift concentrates votes), so a solve
    that has already moved a knot this far is diverging, not converging —
    stop it and let the caller reject the correction (no reference
    counterpart; SURVEY.md section 5 failure-detection row)."""
    r = x.reshape(-1, block)
    return jnp.max(jnp.sum(r * r, axis=1)) < trust_radius * trust_radius


class CGResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    iters: jnp.ndarray
    status: jnp.ndarray
    f0: jnp.ndarray  # objective at x0 (the reference logs initial contrast)


class _LSState(NamedTuple):
    f_best: jnp.ndarray
    alpha_best: jnp.ndarray
    grow: jnp.ndarray         # step multiplier once improving
    k: jnp.ndarray
    done: jnp.ndarray


def _line_search(f_fn, vg_fn, x, f0, g0, u, alpha0, tol, max_evals,
                 refine_evals: int = 4):
    """Minimize phi(a) = f(x + a*u) approximately. Returns (alpha, f, g, ok).

    Phase 1 brackets an improving step with function-only evals (cheap
    forward pass). Trial steps fan out geometrically in BOTH directions from
    alpha0 (a0, 2a0, a0/2, 4a0, a0/4, ...): a CMax objective evaluated at a
    warped position sitting exactly on the pixel grid (cold start with
    quantized events) has one-sided kinks that can make tiny steps look
    uphill even along a descent direction, so pure backtracking — GSL's
    strategy — stalls exactly where the reference stalls; probing larger
    steps too rides over the kinks. Once improving, keep doubling while f
    decreases. Phase 2 polishes with secant steps on the directional
    derivative until the GSL stopping rule |g1.u| <= tol*|g1| holds.
    """
    dtype = x.dtype
    dphi0 = jnp.vdot(g0, u).astype(dtype)
    alpha0 = jnp.asarray(alpha0, dtype)

    def trial_alpha(s):
        # Before the first improvement: alternate 2^m above/below alpha0.
        m = (s.k + 1) // 2
        scale = jnp.where(
            s.k % 2 == 1,
            2.0 ** m.astype(dtype),
            0.5 ** m.astype(dtype),
        )
        ladder = alpha0 * scale
        # After an improvement: keep growing from the best step.
        return jnp.where(s.grow > 0, s.alpha_best * 2.0, ladder)

    def bt_cond(s):
        return (~s.done) & (s.k < max_evals)

    def bt_body(s):
        a = trial_alpha(s)
        f1 = f_fn(x + a * u).astype(dtype)
        improved = f1 < s.f_best
        # Once we were improving and stop, the minimum is bracketed.
        done_now = (s.grow > 0) & (~improved)
        return _LSState(
            f_best=jnp.where(improved, f1, s.f_best),
            alpha_best=jnp.where(improved, a, s.alpha_best),
            grow=s.grow | improved.astype(jnp.int32),
            k=s.k + 1,
            done=done_now,
        )

    init = _LSState(
        f_best=f0,
        alpha_best=jnp.zeros_like(f0),
        grow=jnp.asarray(0, jnp.int32),
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    s = jax.lax.while_loop(bt_cond, bt_body, init)
    bracketed = s.grow > 0  # at least one improving step was found

    # --- Phase 2: secant refinement on the directional derivative.
    # Carry: (a_cur, a_prev, dphi_prev, f_best, a_best, g_best, k, done)
    def refine_cond(t):
        return (~t[-1]) & (t[-2] < refine_evals)

    def refine_body(t):
        a_cur, a_prev, dphi_prev, fb, ab, gb, k, done = t
        f1, g1 = vg_fn(x + a_cur * u)
        f1 = f1.astype(dtype)
        g1 = g1.astype(dtype)
        dphi1 = jnp.vdot(g1, u)
        better = f1 <= fb
        fb2 = jnp.where(better, f1, fb)
        ab2 = jnp.where(better, a_cur, ab)
        gb2 = jnp.where(better, g1, gb)
        # GSL-style stop: new gradient nearly orthogonal to search direction.
        ok = jnp.abs(dphi1) <= tol * jnp.linalg.norm(g1)
        # Secant step toward phi'(a) = 0 between (a_prev, a_cur).
        denom = dphi1 - dphi_prev
        step = dphi1 * (a_cur - a_prev) / jnp.where(jnp.abs(denom) < 1e-30, 1.0, denom)
        a_next = a_cur - step
        a_next = jnp.clip(a_next, 0.05 * a_cur, 4.0 * a_cur)
        return (a_next, a_cur, dphi1, fb2, ab2, gb2, k + 1, ok)

    _, _, _, f_r, a_r, g_r, _, _ = jax.lax.while_loop(
        refine_cond,
        refine_body,
        (s.alpha_best, jnp.zeros_like(s.alpha_best), dphi0,
         s.f_best, s.alpha_best, g0, jnp.asarray(0, jnp.int32), ~bracketed),
    )

    # If we never bracketed, evaluate the gradient at x (unchanged state).
    f_out = jnp.where(bracketed, f_r, f0)
    a_out = jnp.where(bracketed, a_r, 0.0)
    g_out = jnp.where(bracketed, g_r, g0)
    return a_out, f_out, g_out, bracketed


def _line_search_vec(f_fn, vg_fn, x, f0, g0, u, alpha0, tol, max_evals,
                     refine_evals: int = 4):
    """Vectorized variant of _line_search: same contract, TPU-native probing.

    The sequential bracket is a while_loop of tiny data-dependent steps —
    on TPU each loop iteration costs fixed scheduling overhead comparable
    to the objective itself at packet sizes, so the ladder is latency-bound
    (measured ~2.4 ms per CG iteration vs ~0.5 ms of pure eval work).
    Here ALL ``max_evals`` ladder rungs ``alpha0 * 2^m``
    (m = -max_evals/2+1 .. max_evals/2) are evaluated in ONE vmapped
    objective call — one wide op on the MXU instead of up to 16 sequential
    trips — then the winner is polished with the same secant refinement.
    Semantics relative to the sequential ladder: the bracket picks the
    global best rung (the sequential one stops at the first local dip), so
    this is the same deliberate improvement over GSL backtracking documented
    on _line_search, evaluated wider."""
    dtype = x.dtype
    dphi0 = jnp.vdot(g0, u).astype(dtype)
    alpha0 = jnp.asarray(alpha0, dtype)
    # Rung span matches the sequential bidirectional ladder (2^-4..2^4
    # around alpha0): a wider global-argmin span was measured to hop
    # across contrast basins on warm-started packet solves (FE omega
    # median error 0.066 -> 0.074 rad/s, cubic e2e 0.67 -> 0.83 deg).
    # 2*half+1 rungs, capped so the batched sweep never spends more forward
    # evaluations than the configured bracket budget (max_evals=4 -> 3
    # rungs, not 5; at the default 16 the span cap of 9 rungs governs).
    half = min(max_evals - 1, 9) // 2
    ms = jnp.arange(-half, half + 1, dtype=dtype)
    alphas = alpha0 * (2.0 ** ms)
    fs = jax.vmap(lambda a: f_fn(x + a * u))(alphas).astype(dtype)
    i_best = jnp.argmin(fs)
    f_best = fs[i_best]
    a_best = alphas[i_best]
    bracketed = f_best < f0

    def refine_cond(t):
        return (~t[-1]) & (t[-2] < refine_evals)

    def refine_body(t):
        a_cur, a_prev, dphi_prev, fb, ab, gb, k, done = t
        f1, g1 = vg_fn(x + a_cur * u)
        f1 = f1.astype(dtype)
        g1 = g1.astype(dtype)
        dphi1 = jnp.vdot(g1, u)
        better = f1 <= fb
        fb2 = jnp.where(better, f1, fb)
        ab2 = jnp.where(better, a_cur, ab)
        gb2 = jnp.where(better, g1, gb)
        ok = jnp.abs(dphi1) <= tol * jnp.linalg.norm(g1)
        denom = dphi1 - dphi_prev
        step = dphi1 * (a_cur - a_prev) / jnp.where(
            jnp.abs(denom) < 1e-30, 1.0, denom)
        a_next = a_cur - step
        a_next = jnp.clip(a_next, 0.05 * a_cur, 4.0 * a_cur)
        return (a_next, a_cur, dphi1, fb2, ab2, gb2, k + 1, ok)

    _, _, _, f_r, a_r, g_r, _, _ = jax.lax.while_loop(
        refine_cond,
        refine_body,
        (a_best, jnp.zeros_like(a_best), dphi0,
         f_best, a_best, g0, jnp.asarray(0, jnp.int32), ~bracketed),
    )

    f_out = jnp.where(bracketed, f_r, f0)
    a_out = jnp.where(bracketed, a_r, 0.0)
    g_out = jnp.where(bracketed, g_r, g0)
    return a_out, f_out, g_out, bracketed


def _line_search_grid(f_fn, vg_fn, x, f0, g0, u, alpha0, tol, max_evals,
                      refine_evals: int = 4):
    """Batched-evaluation, sequential-semantics variant of _line_search.

    Every point the sequential bracket can ever probe lies on the geometric
    grid ``alpha0 * 2^m``: the alternating ladder visits m = 0, +1, -1,
    +2, -2, ... and the subsequent doubling walk visits m_best+1, m_best+2,
    ... — all grid rungs. So evaluate the WHOLE reachable grid in ONE
    vmapped objective call (one wide op instead of up to ``max_evals``
    sequential while_loop trips — the sequential ladder is latency-bound on
    TPU, ~2.4 ms/iteration of scheduling for ~0.5 ms of eval work), then
    REPLAY the sequential decision process (alternation, first-improvement
    switch to doubling, stop on first non-improving step, the eval budget)
    as a scalar while_loop over the precomputed values. The chosen step is
    the sequential ladder's choice — NOT the global argmin, whose basin
    hopping was measured to hurt the curved-valley BA (cubic e2e 0.372 ->
    1.06 deg) — followed by the same secant refinement.
    """
    dtype = x.dtype
    dphi0 = jnp.vdot(g0, u).astype(dtype)
    alpha0 = jnp.asarray(alpha0, dtype)
    # Reachable exponents: alternation reaches -( (max_evals-2)//2 ) at the
    # deepest even probe; doubling from an improvement at k=0 reaches
    # max_evals-1. (For max_evals=16: m in [-7, 15], 23 rungs.)
    m_lo = -((max_evals - 2) // 2)
    m_hi = max_evals - 1
    ms = jnp.arange(m_lo, m_hi + 1, dtype=dtype)
    alphas = alpha0 * (2.0 ** ms)
    fs = jax.vmap(lambda a: f_fn(x + a * u))(alphas).astype(dtype)

    def probe_m(k, grow, m_best):
        # Alternation: k odd -> +((k+1)//2), k even -> -(k//2); doubling
        # walk: one rung above the current best.
        ladder_m = jnp.where(k % 2 == 1, (k + 1) // 2, -(k // 2))
        return jnp.where(grow > 0, m_best + 1, ladder_m)

    def cond(s):
        k, grow, m_best, f_best, done = s
        return (~done) & (k < max_evals)

    def body(s):
        k, grow, m_best, f_best, done = s
        m = probe_m(k, grow, m_best)
        f1 = fs[jnp.clip(m - m_lo, 0, m_hi - m_lo)]
        improved = f1 < f_best
        done_now = (grow > 0) & (~improved)
        return (k + 1,
                grow | improved.astype(jnp.int32),
                jnp.where(improved, m, m_best),
                jnp.where(improved, f1, f_best),
                done_now)

    k0 = jnp.asarray(0, jnp.int32)
    _, grow, m_best, f_best, _ = jax.lax.while_loop(
        cond, body,
        (k0, jnp.asarray(0, jnp.int32), k0, f0, jnp.asarray(False)),
    )
    bracketed = grow > 0
    a_best = alpha0 * (2.0 ** m_best.astype(dtype))

    # Secant refinement on the directional derivative (same as _line_search).
    def refine_cond(t):
        return (~t[-1]) & (t[-2] < refine_evals)

    def refine_body(t):
        a_cur, a_prev, dphi_prev, fb, ab, gb, k, done = t
        f1, g1 = vg_fn(x + a_cur * u)
        f1 = f1.astype(dtype)
        g1 = g1.astype(dtype)
        dphi1 = jnp.vdot(g1, u)
        better = f1 <= fb
        fb2 = jnp.where(better, f1, fb)
        ab2 = jnp.where(better, a_cur, ab)
        gb2 = jnp.where(better, g1, gb)
        ok = jnp.abs(dphi1) <= tol * jnp.linalg.norm(g1)
        denom = dphi1 - dphi_prev
        step = dphi1 * (a_cur - a_prev) / jnp.where(
            jnp.abs(denom) < 1e-30, 1.0, denom)
        a_next = a_cur - step
        a_next = jnp.clip(a_next, 0.05 * a_cur, 4.0 * a_cur)
        return (a_next, a_cur, dphi1, fb2, ab2, gb2, k + 1, ok)

    _, _, _, f_r, a_r, g_r, _, _ = jax.lax.while_loop(
        refine_cond,
        refine_body,
        (a_best, jnp.zeros_like(a_best), dphi0,
         f_best, a_best, g0, jnp.asarray(0, jnp.int32), ~bracketed),
    )

    f_out = jnp.where(bracketed, f_r, f0)
    a_out = jnp.where(bracketed, a_r, 0.0)
    g_out = jnp.where(bracketed, g_r, g0)
    return a_out, f_out, g_out, bracketed


class CGState(NamedTuple):
    """Resumable per-solve CG state (a pytree; stacks under vmap)."""

    x: jnp.ndarray
    f: jnp.ndarray
    f_prev: jnp.ndarray
    g: jnp.ndarray
    d: jnp.ndarray
    alpha0: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray
    f0: jnp.ndarray
    # Consecutive stall count (stagnation or failed line search); see
    # make_cg_body's stagnation_patience.
    stall: jnp.ndarray


_CGState = CGState  # internal alias (pre-resumable name)


def cg_init(
    value_and_grad_fn: Callable, x0: jnp.ndarray, initial_step: float = 0.1
) -> CGState:
    """Evaluate f/g at x0 and build the initial CG state."""
    dtype = x0.dtype
    f0, g0 = value_and_grad_fn(x0)
    f0 = f0.astype(dtype)
    g0 = g0.astype(dtype)
    return CGState(
        x=x0,
        f=f0,
        f_prev=jnp.full_like(f0, jnp.inf),
        g=g0,
        d=-g0,
        alpha0=jnp.asarray(initial_step, dtype),
        it=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(RUNNING, jnp.int32),
        f0=f0,
        stall=jnp.asarray(0, jnp.int32),
    )


def make_cg_body(
    value_and_grad_fn: Callable,
    f_fn: Callable | None = None,
    *,
    dim: int,
    line_search_tol: float = 0.05,
    grad_tol: float = 1e-3,
    fun_tol: float = 1e-4,
    max_fevals_per_linesearch: int = 16,
    stagnation_patience: int = 1,
    initial_step: float = 0.1,
    ladder: str = "sequential",
    cg_variant: str = "fr",
    secant_refine_evals: int = 4,
) -> Callable:
    """One conjugate-gradient line-search iteration: CGState -> CGState.

    ``cg_variant``: "fr" = Fletcher-Reeves (GSL's conjugate_fr, the
    reference's method); "pr" = Polak-Ribiere+ (beta clipped at 0 — its
    built-in auto-restart makes it markedly faster on the curved valleys of
    the cubic-spline bundle adjustment, where FR drags stale directions).

    ``ladder``: "sequential" probes bracket steps one at a time in a
    while_loop (GSL-shaped); "vector" evaluates every ladder rung in one
    vmapped objective call (_line_search_vec) — much faster on TPU when the
    objective is small enough that loop-iteration overhead dominates;
    "grid" batches the evaluations like "vector" but replays the
    sequential decision process over them (_line_search_grid) — sequential
    accuracy at batched latency.

    The returned body performs the work unconditionally; callers gate it
    (while_loop cond, lax.cond, or round-based fori_loop with masking).

    ``stagnation_patience`` de-cliffs narrow-valley solves (the cubic-spline
    BA, VERDICT r2 weak #4): the GSL-style relative-stagnation test and a
    failed bracket only STOP the solve after ``patience`` consecutive hits;
    earlier hits instead restart — steepest-descent direction and the
    bracket ladder re-seeded at ``initial_step``. Rationale: ``alpha0`` is
    doubled from each ACCEPTED step, so one tiny accepted step in a curved
    valley collapses the bidirectional ladder (span 2^-4..2^4 x alpha0) to a
    microscopic scale; every later improvement is then < fun_tol relative
    and a single-shot test kills a solve that a fresh full-scale probe would
    keep moving (measured: cubic e2e 8.7 deg -> sub-degree). patience=1
    reproduces the reference's GSL semantics exactly
    (local_optim_contrast_gsl.cpp:176-194)."""
    if f_fn is None:
        f_fn = lambda x: value_and_grad_fn(x)[0]
    restart_every = max(dim, 2)
    search = {"vector": _line_search_vec,
              "grid": _line_search_grid}.get(ladder, _line_search)

    def body(s: CGState) -> CGState:
        dnorm = jnp.linalg.norm(s.d)
        u = s.d / jnp.where(dnorm == 0, 1.0, dnorm)
        descent = jnp.vdot(s.g, u) < 0
        # Restart on non-descent direction.
        u = jnp.where(descent, u, -s.g / jnp.maximum(jnp.linalg.norm(s.g), 1e-30))

        alpha, f_new, g_new, ok = search(
            f_fn, value_and_grad_fn, s.x, s.f, s.g, u,
            s.alpha0, line_search_tol, max_fevals_per_linesearch,
            secant_refine_evals,
        )
        x_new = s.x + alpha * u

        # Convergence tests, in the reference's order and form
        # (local_optim_contrast_gsl.cpp:176-194): stagnation compares this
        # iteration's minimum to the *previous* iteration's (never fires on
        # the first line search, like GSL's cost_old = 1e9 init), then the
        # gradient-norm test. Both stall modes are gated by the patience
        # counter (see make_cg_body docstring).
        stagnated = jnp.abs(1.0 - f_new / (s.f_prev + 1e-7)) < fun_tol
        gsmall = jnp.linalg.norm(g_new) < grad_tol
        stall_event = (~ok) | stagnated
        stall_new = jnp.where(stall_event, s.stall + 1, 0).astype(jnp.int32)
        final = stall_event & (stall_new >= stagnation_patience)
        status = jnp.where(
            final,
            jnp.where(~ok, NO_PROGRESS, CONVERGED_FTOL),
            jnp.where(gsmall, CONVERGED_GTOL, RUNNING),
        ).astype(jnp.int32)
        retry = stall_event & ~final

        # Conjugate direction update with periodic restart; a patience
        # retry also restarts (steepest descent, fresh step scale).
        if cg_variant == "pr":
            beta = jnp.maximum(
                jnp.vdot(g_new, g_new - s.g)
                / jnp.maximum(jnp.vdot(s.g, s.g), 1e-30),
                0.0,
            )
        else:
            beta = jnp.vdot(g_new, g_new) / jnp.maximum(
                jnp.vdot(s.g, s.g), 1e-30)
        it_new = s.it + 1
        restart = ((it_new % restart_every) == 0) | retry
        d_new = jnp.where(restart, -g_new, -g_new + beta * (u * dnorm))

        # Next bracket scale: doubled from the accepted step, decaying
        # freely (GSL-like). Do NOT floor this at a fraction of
        # initial_step: any mechanism that keeps the bracket exploring after
        # the natural scale collapse (a floor here, or stall-restarts via
        # stagnation_patience > 1) lets weakly-anchored back-end windows
        # ride a slow spurious-descent direction — equirect contrast
        # genuinely improves as a window's whole pose slides pole-ward —
        # for the full iteration budget (measured: 0.08 -> ~21 deg RMS on
        # examples/tpu_realtime_check.py with either mechanism enabled).
        alpha0_new = jnp.where(ok, jnp.clip(2.0 * alpha, 1e-6, 1e3), s.alpha0)
        alpha0_new = jnp.where(
            retry, jnp.asarray(initial_step, s.alpha0.dtype), alpha0_new
        )
        return CGState(
            x=jnp.where(ok, x_new, s.x),
            f=jnp.where(ok, f_new, s.f),
            f_prev=s.f,
            g=jnp.where(ok, g_new, s.g),
            d=d_new,
            alpha0=alpha0_new,
            it=it_new,
            status=status,
            f0=s.f0,
            stall=stall_new,
        )

    return body


def cg_run_rounds(
    body: Callable, state: CGState, num_iters: int,
    max_total_iters: int | None = None,
) -> CGState:
    """Advance a CG state by up to ``num_iters`` line searches.

    Unlike the while_loop in minimize_fr_cg, this uses a fixed-trip fori_loop
    with a masked update, so it stays a constant-shape program under vmap —
    the building block for compacted batch solving (parallel/batched.py):
    run a round, drop converged lanes on the host, re-pack, repeat.
    ``max_total_iters`` enforces the overall line-search budget (GSL's hard
    cap) regardless of how rounds divide it."""

    def step(_, s: CGState) -> CGState:
        s_new = body(s)
        keep = s.status == RUNNING
        if max_total_iters is not None:
            keep = keep & (s.it < max_total_iters)
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep, new, old), s_new, s
        )

    return jax.lax.fori_loop(0, num_iters, step, state)


def cg_finalize(state: CGState, max_line_searches: int) -> CGResult:
    status = jnp.where(
        (state.status == RUNNING) & (state.it >= max_line_searches),
        MAX_ITERS, state.status,
    )
    return CGResult(x=state.x, fun=state.f, iters=state.it, status=status,
                    f0=state.f0)


def minimize_fr_cg(
    value_and_grad_fn: Callable,
    x0: jnp.ndarray,
    f_fn: Callable | None = None,
    *,
    max_line_searches: int = 50,
    initial_step: float = 0.1,
    line_search_tol: float = 0.05,
    grad_tol: float = 1e-3,
    fun_tol: float = 1e-4,
    max_fevals_per_linesearch: int = 16,
    stagnation_patience: int = 1,
    ladder: str = "sequential",
    cg_variant: str = "fr",
    trust_radius: float | None = None,
    trust_block: int = 3,
    secant_refine_evals: int = 4,
) -> CGResult:
    """Minimize a smooth function with nonlinear CG (FR or PR+).

    value_and_grad_fn: x -> (f, g). f_fn: x -> f (cheaper forward-only path
    used during bracketing; defaults to value_and_grad_fn's value).

    ``trust_radius``: optional degenerate-landscape guard — stop as soon as
    any ``trust_block``-sized sub-vector of x exceeds this norm (see
    _within_trust; the back-end sets it to
    BackendConfig.max_ba_correction_rad and rejects the window's
    correction on the host).
    """
    dim = x0.shape[-1] if x0.ndim else 1
    body = make_cg_body(
        value_and_grad_fn, f_fn, dim=dim,
        line_search_tol=line_search_tol, grad_tol=grad_tol, fun_tol=fun_tol,
        max_fevals_per_linesearch=max_fevals_per_linesearch,
        stagnation_patience=stagnation_patience, initial_step=initial_step,
        ladder=ladder, cg_variant=cg_variant,
        secant_refine_evals=secant_refine_evals,
    )

    def cond(s: CGState):
        ok = (s.status == RUNNING) & (s.it < max_line_searches)
        if trust_radius is not None:
            ok = ok & _within_trust(s.x, trust_radius, trust_block)
        return ok

    init = cg_init(value_and_grad_fn, x0, initial_step)
    out = jax.lax.while_loop(cond, body, init)
    status = out.status
    if trust_radius is not None:
        status = jnp.where(
            (status == RUNNING)
            & ~_within_trust(out.x, trust_radius, trust_block),
            TRUST_STOP, status,
        )
    status = jnp.where(status == RUNNING, MAX_ITERS, status)
    return CGResult(x=out.x, fun=out.f, iters=out.it, status=status, f0=out.f0)
