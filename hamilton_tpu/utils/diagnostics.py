"""Numerical-health sentinels: NaN guards and energy-blowup detection.

The physics analog of failure detection (SURVEY.md §5): long ``lax.scan``
horizons can silently go non-finite (too-large dt, singular coordinate maps
like the two-body ``r → 0``).  These helpers catch that without breaking jit.

Error semantics: :func:`nan_guard` records a ``checkify`` error — exceptions
cannot reliably cross compiled-TPU execution, so the error is *carried* as a
value and raised on the host by :func:`checked` (or by the caller running
``checkify.checkify`` + ``err.throw()`` itself).  This makes the failure path
deterministic under jit on every backend.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from hamilton_tpu.mechanics import hamiltonian
from hamilton_tpu.state import Phase
from hamilton_tpu.system import System

__all__ = ["check_finite_phase", "nan_guard", "checked", "energy_sentinel"]


def check_finite_phase(phase: Phase) -> jax.Array:
    """Scalar bool: every member of (batched) phase is finite."""
    return jnp.logical_and(
        jnp.all(jnp.isfinite(phase.q)), jnp.all(jnp.isfinite(phase.p))
    )


def nan_guard(phase: Phase, where: str = "step") -> Phase:
    """Record a ``checkify`` error if the state went non-finite; pass-through
    otherwise.  Insertable in any hot loop (scan/fori/cond-safe).

    The guarded computation must be run through :func:`checked` (or
    ``checkify.checkify`` directly) for the error to surface as a raised
    ``JaxRuntimeError`` — a raise inside compiled TPU code would be silently
    swallowed, so the error is threaded as a value instead.
    """
    checkify.check(
        check_finite_phase(phase), f"non-finite state detected at {where}"
    )
    return phase


def checked(fn: Callable, *, errors=checkify.user_checks) -> Callable:
    """Wrap ``fn`` (which may contain :func:`nan_guard` /
    ``checkify.check`` calls, and may be jitted) so that carried errors are
    raised on the host after the computation returns.

    ``errors=checkify.float_checks`` additionally instruments every
    floating-point op for NaN/inf (heavier; debugging mode).
    """
    cfn = checkify.checkify(fn, errors=errors)

    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return run


def energy_sentinel(
    system: System, phase: Phase, h0: jax.Array, *, tol: float = 1e3
) -> jax.Array:
    """Scalar bool: |H − H₀| within ``tol·max(|H₀|, 1)`` for every member —
    a cheap blowup detector for fixed-step runs with too-large dt."""
    h = (
        hamiltonian(system, phase)
        if phase.q.ndim == 1
        else jax.vmap(lambda ph: hamiltonian(system, ph))(phase)
    )
    return jnp.all(jnp.abs(h - h0) <= tol * jnp.maximum(jnp.abs(h0), 1.0))
