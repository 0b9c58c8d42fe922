"""Vectorized observables over trajectories and ensembles.

First-class version of what the reference only computes ad hoc in its demo
infobox — per-frame KE/PE/H via ``keP``/``pe``/``hamiltonian``
(``app/Examples.hs:448-450``) — with the energy-drift statistic promoted to a
headline metric (BASELINE.md ``max |ΔH/H₀|``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from hamilton_tpu.mechanics import ke_p, pe
from hamilton_tpu.state import Phase
from hamilton_tpu.system import System

__all__ = [
    "energies",
    "hamiltonian_trajectory",
    "energy_drift",
    "lyapunov_estimate",
]


def energies(system: System, phase: Phase) -> Dict[str, jax.Array]:
    """KE, PE, and H for a (arbitrarily batched) phase-space state.

    The demo-infobox trio (``app/Examples.hs:448-450``), vectorized: input
    axes ``(..., n)`` give outputs of shape ``(...)``.  The mechanics
    functions are batch-aware, so this is a direct call.
    """
    ke = ke_p(system, phase)
    pot = pe(system, phase.q)
    return {"ke": ke, "pe": pot, "h": ke + pot}


def hamiltonian_trajectory(system: System, traj: Phase) -> jax.Array:
    """``H(t)`` along a trajectory (leading axes = time/batch)."""
    return energies(system, traj)["h"]


def energy_drift(system: System, traj: Phase) -> jax.Array:
    """``max_t |H(t) − H(0)| / max(|H(0)|, 1)`` per trajectory.

    The BASELINE.md headline correctness metric.  ``traj`` has axes
    ``(time, ..., n)``; the max is over the time axis, returning shape
    ``(...)``.
    """
    h = hamiltonian_trajectory(system, traj)
    h0 = h[0]
    return jnp.max(jnp.abs(h - h0) / jnp.maximum(jnp.abs(h0), 1.0), axis=0)


def lyapunov_estimate(
    system: System,
    traj_a: Phase,
    traj_b: Phase,
    dt_emit: float,
) -> jax.Array:
    """Crude largest-Lyapunov-exponent estimate from a pair of nearby
    trajectories (ensemble chaos statistics, BASELINE.json configs[4]).

    Fits ``log‖Δz(t)‖`` growth over the emitted grid by least squares on the
    window before saturation.  Axes ``(time, ..., n)`` → shape ``(...)``.
    """
    dq = traj_a.q - traj_b.q
    dp = traj_a.p - traj_b.p
    sep = jnp.sqrt(jnp.sum(dq**2 + dp**2, axis=-1))  # (time, ...)
    tiny = jnp.asarray(1e-300 if sep.dtype == jnp.float64 else 1e-37, sep.dtype)
    log_sep = jnp.log(jnp.maximum(sep, tiny))
    t = jnp.arange(log_sep.shape[0], dtype=log_sep.dtype) * dt_emit
    t_mean = jnp.mean(t)
    shape = (-1,) + (1,) * (log_sep.ndim - 1)
    tc = (t - t_mean).reshape(shape)
    slope = jnp.sum(tc * (log_sep - jnp.mean(log_sep, axis=0)), axis=0) / jnp.sum(
        tc**2
    )
    return slope
