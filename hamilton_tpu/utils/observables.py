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
    "RunningExtrema",
    "LyapunovPairs",
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


# ----------------------------------------------------------------------
# Streaming observables: in-loop reductions without trajectory emission
# ----------------------------------------------------------------------
#
# The evolution drivers' drift sampler generalized into a user hook
# (ensemble.py `_final_loop_body`): pass `observable=` + `obs_every=` to
# `evolve_ensemble_final/chunked` and `update` runs cond-guarded inside the
# flat hot loop, accumulating into a pytree that rides the loop carry.
# Protocol (duck-typed):
#
#   transforms_state: bool          # class attribute
#   init(phase0) -> obs_state       # pytree accumulator
#   update(obs_state, phase, step) -> obs_state            (observe-only)
#   update(obs_state, phase, step) -> (obs_state, phase')  (transforming)
#
# Transforming observables (Benettin renormalization below) return a
# replacement Phase; the driver re-inits the stepper carry from it.


class RunningExtrema:
    """Streaming min/max of a scalar observable ``fn(phase) -> (...)`` —
    e.g. closest-approach distances or amplitude envelopes over a full
    horizon with no emitted trajectory."""

    transforms_state = False

    def __init__(self, fn):
        self.fn = fn

    def init(self, phase0):
        v = self.fn(phase0)
        return {"min": v, "max": v}

    def update(self, state, phase, step):
        v = self.fn(phase)
        return {
            "min": jnp.minimum(state["min"], v),
            "max": jnp.maximum(state["max"], v),
        }


class LyapunovPairs:
    """Streaming largest-Lyapunov-exponent estimate by the classic Benettin
    pair method, running INSIDE the evolution loop — full 10⁵-step horizons
    at 16k members with zero trajectory emission (VERDICT r3 item 5; the
    post-hoc :func:`lyapunov_estimate` needs emitted trajectories and
    saturates once ‖Δz‖ reaches attractor size).

    Members are **interleaved pairs**: member ``2j`` is the fiducial
    trajectory, member ``2j+1`` its perturbation at phase-space distance
    ``d0`` (use :meth:`pair_ensemble` to build one).  Every ``obs_every``
    steps the separation ``d = ‖Δq‖⊕‖Δp‖`` is measured, ``log(d/d0)``
    accumulates per pair, and the perturbed member is pulled back to
    distance ``d0`` along the current separation direction (the
    renormalization that keeps the growth in the linear regime).  λ_max =
    accumulated log-growth / elapsed time (:meth:`lyapunov`).

    Interleaving keeps pairs contiguous, so an even shard size keeps every
    pair on one device and the observable runs unchanged under
    ``shard_map`` (sharded ≡ unsharded tested).

    Determinism caveat (intrinsic to chaos, not to this estimator): per-pair
    λ values are only reproducible across *numerically identical* execution
    schedules.  The chunked/sharded drivers may differ from the one-dispatch
    run by ~1 ULP per dispatch boundary (XLA fusion), which a chaotic flow
    amplifies by e^{λt}; after the linear window the pairs sample different
    stretches of the attractor, so per-pair λ scatters by the estimator's
    own variance while regular systems (λ ≈ 0) stay bitwise-close.  Compare
    ensemble statistics (mean/quantiles) across drivers, not raw pairs —
    tests/test_ensemble.py pins the regular case tightly and the chaotic
    case at the mean.
    """

    transforms_state = True

    def __init__(self, d0: float = 1e-5):
        self.d0 = float(d0)

    @staticmethod
    def pair_ensemble(phase0: Phase, d0: float, *, key=None) -> Phase:
        """Interleave a (B, n) ensemble with perturbed partners → (2B, n).

        The perturbation displaces q along a deterministic unit direction
        (or a random one per member with ``key``) at phase-space distance
        ``d0``."""
        b, n = phase0.q.shape
        if key is None:
            direction = jnp.ones((b, n), phase0.q.dtype)
        else:
            direction = jax.random.normal(key, (b, n), phase0.q.dtype)
        direction = direction / jnp.linalg.norm(
            direction, axis=-1, keepdims=True
        )
        q = jnp.stack([phase0.q, phase0.q + d0 * direction], axis=1)
        p = jnp.stack([phase0.p, phase0.p], axis=1)
        return Phase(q.reshape(2 * b, n), p.reshape(2 * b, n))

    def _sep(self, phase):
        dq = phase.q[1::2] - phase.q[0::2]
        dp = phase.p[1::2] - phase.p[0::2]
        d2 = jnp.sum(dq * dq + dp * dp, axis=-1)
        tiny = jnp.asarray(
            1e-300 if d2.dtype == jnp.float64 else 1e-37, d2.dtype
        )
        return jnp.sqrt(jnp.maximum(d2, tiny)), dq, dp

    def init(self, phase0):
        if phase0.q.shape[0] % 2:
            raise ValueError("LyapunovPairs needs an even (paired) batch")
        d, _, _ = self._sep(phase0)
        return {
            "sum_log": jnp.zeros_like(d),
            "n_renorms": jnp.zeros((), jnp.int32),
        }

    def update(self, state, phase, step):
        d, dq, dp = self._sep(phase)
        scale = (self.d0 / d)[:, None].astype(phase.q.dtype)
        q = phase.q.at[1::2].set(phase.q[0::2] + dq * scale)
        p = phase.p.at[1::2].set(phase.p[0::2] + dp * scale)
        new = {
            "sum_log": state["sum_log"] + jnp.log(d / self.d0),
            "n_renorms": state["n_renorms"] + 1,
        }
        return new, Phase(q, p)

    def lyapunov(self, state, total_time: float) -> jax.Array:
        """λ_max per pair: accumulated log-growth over elapsed time.

        ``total_time`` must be the time span the accumulator actually saw —
        ``n_steps * dt`` when ``obs_every`` divides ``n_steps`` (the driver
        samples through the final step)."""
        return state["sum_log"] / total_time

    def shard_specs(self, axis: str):
        """Sharding specs for ``evolve_ensemble_sharded``: the per-pair
        log-growth shards with the ensemble; the renormalization counter is
        shard-replicated."""
        from jax.sharding import PartitionSpec as P

        return {"sum_log": P(axis), "n_renorms": P()}


class PoincareSections:
    """Streaming Poincaré-section accumulator: upward crossings of
    ``section(phase) -> (B,)`` collected INSIDE the evolution loop into
    ``max_crossings`` static slots per member — full horizons at
    O(max_crossings · B) memory instead of emitting O(T · B) trajectories
    for the post-hoc :func:`hamilton_tpu.utils.poincare.poincare_section`.

    Run with ``obs_every = stepper.substeps`` (i.e. every dt-step on the
    library path): crossings are detected between CONSECUTIVE OBSERVED
    states, so coarser cadences can miss sign round-trips inside a window.
    Crossing states are linearly interpolated between the bracketing
    observations (the same interpolation the post-hoc extractor uses —
    results are identical on the same stride, tested).

    Truncation is explicit, not silent: crossings past ``max_crossings``
    land in the per-member ``overflow`` counter, so a truncated section is
    detectable without the all-slots-True heuristic.
    """

    transforms_state = False

    def __init__(self, section, max_crossings: int):
        self.section = section
        self.max_crossings = int(max_crossings)

    def init(self, phase0):
        g = self.section(phase0)
        b = g.shape
        n = phase0.q.shape[-1]
        m = self.max_crossings
        return {
            "prev_g": g,
            "prev_q": phase0.q,
            "prev_p": phase0.p,
            "count": jnp.zeros(b, jnp.int32),
            "overflow": jnp.zeros(b, jnp.int32),
            "q": jnp.zeros((m,) + b + (n,), phase0.q.dtype),
            "p": jnp.zeros((m,) + b + (n,), phase0.p.dtype),
        }

    def update(self, state, phase, step):
        g = self.section(phase)
        prev_g = state["prev_g"]
        crossing = jnp.logical_and(prev_g < 0, g >= 0)
        tiny = jnp.asarray(
            1e-300 if g.dtype == jnp.float64 else 1e-37, g.dtype
        )
        denom = jnp.where(crossing, prev_g - g, 1.0)
        frac = jnp.where(
            crossing, prev_g / jnp.where(jnp.abs(denom) < tiny, tiny, denom),
            0.0,
        )[..., None]
        qx = state["prev_q"] + frac * (phase.q - state["prev_q"])
        px = state["prev_p"] + frac * (phase.p - state["prev_p"])
        m = self.max_crossings
        count = state["count"]
        slot = jnp.minimum(count, m - 1)
        idx = jnp.arange(count.shape[0])
        store = jnp.logical_and(crossing, count < m)
        cur_q = state["q"][slot, idx]
        cur_p = state["p"][slot, idx]
        new_q = state["q"].at[slot, idx].set(
            jnp.where(store[..., None], qx, cur_q)
        )
        new_p = state["p"].at[slot, idx].set(
            jnp.where(store[..., None], px, cur_p)
        )
        return {
            "prev_g": g,
            "prev_q": phase.q,
            "prev_p": phase.p,
            "count": count + store.astype(jnp.int32),
            "overflow": state["overflow"]
            + jnp.logical_and(crossing, count >= m).astype(jnp.int32),
            "q": new_q,
            "p": new_p,
        }

    @staticmethod
    def points(state):
        """``(points, valid)`` in the post-hoc extractor's layout:
        ``Phase[(max_crossings, B, n)]`` + boolean mask."""
        m = state["q"].shape[0]
        valid = jnp.arange(m)[:, None] < state["count"][None, :]
        return Phase(state["q"], state["p"]), valid
