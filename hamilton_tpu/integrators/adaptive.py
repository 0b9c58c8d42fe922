"""Adaptive embedded Runge-Kutta driver with GSL step-control semantics.

The reference's entire time integration is GSL's adaptive RKF45
(``odeSolveV RKf45 hi eps eps``, ``Numeric/Hamilton.hs:443-448``, with
``hi = (t₁−t₀)/100`` and ``eps_abs = eps_rel = 1.49012e-08``).  For trajectory
parity (BASELINE.md north-star: match reference trajectories to 1e-6) this
module reimplements GSL's exact control laws as a ``lax.while_loop``:

* **error weighting** (gsl ``control/standard.c`` with a_y=1, a_dydt=0):
  ``D_i = eps_abs + eps_rel·|y_i|`` evaluated at the *updated* y, and
  ``rmax = max_i |yerr_i| / D_i``;
* **reject** if ``rmax > 1.1``: retry with ``h ← h·max(0.9·rmax^(−1/ord), 0.2)``;
* **grow** if ``rmax < 0.5``: ``h ← h·clip(0.9·rmax^(−1/(ord+1)), 1, 5)``;
* otherwise keep ``h``;
* the final step of an interval is truncated to land exactly on ``t1``, and
  the next suggested ``h`` is adjusted from that truncated step — exactly the
  (slightly surprising) behavior of ``gsl_odeiv2_evolve_apply``.

Everything is shape-static and branch-free (``jnp.where`` + one
``while_loop``), so it jits, vmaps (the loop runs until the whole batch
finishes — the wavefront effect SURVEY.md §7 notes), and runs on TPU.  Use
float64 (``jax.config.update('jax_enable_x64', True)``) for GSL-level parity.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hamilton_tpu.integrators.tableaus import DOPRI5, RKCK, RKF45, Tableau

__all__ = ["ADAPTIVE_METHODS", "gsl_evolve_to", "embedded_rk_step", "GSL_EPS_DEFAULT"]

#: The reference's hard-coded tolerance (``Numeric/Hamilton.hs:448``).
GSL_EPS_DEFAULT = 1.49012e-08

ADAPTIVE_METHODS = {"rkf45": RKF45, "rkck": RKCK, "dopri5": DOPRI5}


def embedded_rk_step(
    rhs: Callable[[jax.Array], jax.Array], tab: Tableau
) -> Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """One explicit embedded-RK step: ``(y, h) -> (y_new, yerr)``.

    The RHS is time-independent, as in the reference (``const f``,
    ``Numeric/Hamilton.hs:445``).
    """

    def step(y: jax.Array, h: jax.Array) -> Tuple[jax.Array, jax.Array]:
        ks = []
        for i in range(tab.stages):
            yi = y
            for j, aij in enumerate(tab.a[i]):
                if aij != 0.0:
                    yi = yi + (h * aij) * ks[j]
            ks.append(rhs(yi))
        y_new = y
        for bi, ki in zip(tab.b, ks):
            if bi != 0.0:
                y_new = y_new + (h * bi) * ki
        yerr = jnp.zeros_like(y)
        for ei, ki in zip(tab.b_err, ks):
            if ei != 0.0:
                yerr = yerr + (h * ei) * ki
        return y_new, yerr

    return step


class _EvolveState(NamedTuple):
    t: jax.Array
    y: jax.Array
    h_star: jax.Array  # GSL's *h — the suggested step, updated only on accept
    h_try: jax.Array  # the step size to attempt next (≤ h_star after rejects)
    n_steps: jax.Array
    n_failed: jax.Array


def gsl_evolve_to(
    rhs: Callable[[jax.Array], jax.Array],
    y0: jax.Array,
    t0,
    t1,
    h_suggest,
    *,
    eps_abs: float = GSL_EPS_DEFAULT,
    eps_rel: float = GSL_EPS_DEFAULT,
    method: str = "rkf45",
    max_steps: int = 1_000_000,
    return_stats: bool = False,
):
    """Integrate ``y' = rhs(y)`` from ``t0`` to ``t1`` with GSL semantics.

    Returns ``(y(t1), h_suggest_next)`` — the suggested step is carried across
    output intervals exactly as ``gsl_odeiv2_driver_apply`` does.
    Forward integration only (``t1 >= t0``), matching every reference use.

    ``return_stats=True`` appends a stats dict: ``n_steps`` / ``n_failed``
    attempt counters and ``saturated`` — True when the loop exhausted
    ``max_steps`` before reaching ``t1``, in which case the returned state
    is at ``t < t1``, NOT at the requested time.  (The controller cannot
    raise inside jit; callers that need a hard failure should check this
    flag — ``max_steps`` exists as a progress guard against pathological
    RHS/tolerance combinations driving h → 0.)
    """
    tab = ADAPTIVE_METHODS[method]
    order = tab.order
    step = embedded_rk_step(rhs, tab)

    dtype = y0.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    h_suggest = jnp.asarray(h_suggest, dtype)

    def cond(s: _EvolveState):
        return jnp.logical_and(s.t < t1, s.n_steps < max_steps)

    def body(s: _EvolveState) -> _EvolveState:
        dt_rem = t1 - s.t
        final = s.h_try >= dt_rem
        h0 = jnp.where(final, dt_rem, s.h_try)

        y_new, yerr = step(s.y, h0)

        # gsl control/standard.c hadjust on the *updated* y, with the
        # reference's weighting a_y = 1, a_dydt = 0 (the only mode
        # hmatrix-gsl's odeSolveV uses)
        d0 = eps_rel * jnp.abs(y_new) + eps_abs
        rmax = jnp.max(jnp.abs(yerr) / d0)

        dec = rmax > 1.1
        inc = rmax < 0.5
        r_dec = jnp.maximum(0.9 * rmax ** (-1.0 / order), 0.2)
        r_inc = jnp.clip(0.9 * rmax ** (-1.0 / (order + 1.0)), 1.0, 5.0)
        h_dec = h0 * r_dec
        h_inc = h0 * r_inc

        # gsl evolve_apply: retry only if the step actually decreased vs *h
        # and would still advance time (underflow guard).
        retry = jnp.logical_and(
            dec, jnp.logical_and(h_dec < s.h_star, s.t + h_dec > s.t)
        )
        accept = jnp.logical_not(retry)

        t_acc = jnp.where(final, t1, s.t + h0)
        # next suggested step on accept:
        #   dec-but-not-retried -> keep *h; inc -> grown from h0; else -> h0
        h_star_acc = jnp.where(dec, s.h_star, jnp.where(inc, h_inc, h0))

        return _EvolveState(
            t=jnp.where(accept, t_acc, s.t),
            y=jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), y_new, s.y
            ),
            h_star=jnp.where(accept, h_star_acc, s.h_star),
            h_try=jnp.where(accept, h_star_acc, h_dec),
            n_steps=s.n_steps + 1,
            n_failed=s.n_failed + jnp.where(retry, 1, 0),
        )

    init = _EvolveState(
        t=t0,
        y=y0,
        h_star=h_suggest,
        h_try=h_suggest,
        n_steps=jnp.zeros((), jnp.int32),
        n_failed=jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    if return_stats:
        stats = {
            "n_steps": out.n_steps,
            "n_failed": out.n_failed,
            "saturated": jnp.logical_and(
                out.n_steps >= max_steps, out.t < t1
            ),
        }
        return out.y, out.h_star, stats
    return out.y, out.h_star
