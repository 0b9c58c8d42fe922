"""Numerical-health sentinels: NaN guards and energy-blowup detection.

The physics analog of failure detection (SURVEY.md §5): long ``lax.scan``
horizons can silently go non-finite (too-large dt, singular coordinate maps
like the two-body ``r → 0``).  These helpers catch that without breaking jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hamilton_tpu.mechanics import hamiltonian
from hamilton_tpu.state import Phase
from hamilton_tpu.system import System

__all__ = ["check_finite_phase", "nan_guard", "energy_sentinel"]


def check_finite_phase(phase: Phase) -> jax.Array:
    """Scalar bool: every member of (batched) phase is finite."""
    return jnp.logical_and(
        jnp.all(jnp.isfinite(phase.q)), jnp.all(jnp.isfinite(phase.p))
    )


def nan_guard(phase: Phase, where: str = "step") -> Phase:
    """Inside jit: raise (via ``checkify``-style debug callback) if the state
    went non-finite.  Pass-through otherwise — insertable in any hot loop at
    zero cost when finite (the check fuses into the scan)."""
    ok = check_finite_phase(phase)

    def _report(ok_val):
        if not ok_val:
            raise FloatingPointError(f"non-finite state detected at {where}")

    jax.debug.callback(_report, ok)
    return phase


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
