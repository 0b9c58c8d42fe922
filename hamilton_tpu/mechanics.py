"""Mechanics core: mass matrix, state conversions, energies, Hamilton's equations.

TPU-native analog of the reference's L2 layer (``Numeric/Hamilton.hs:256-387``).
All functions here take *unbatched* states (trailing-axis ``(n,)`` vectors) and
are pure — batching over ensembles is done with ``jax.vmap`` (see
:mod:`hamilton_tpu.ensemble`), which XLA lowers to batched dense algebra that
tiles onto the MXU.

Numerical upgrades over the reference (deliberate, SURVEY.md §7):

* the generalized mass matrix ``K = JᵀMJ`` is solved via **Cholesky**
  (``cho_factor``/``cho_solve``) instead of the reference's explicit ``inv``
  (``Numeric/Hamilton.hs:321,381``) — K is symmetric positive definite by
  construction, and a Cholesky solve is both faster and numerically better;
* the rank-3 Hessian contraction in ``hamEqs`` is one ``einsum`` instead of
  the reference's n-way vector-of-matrices loop (``:382-385``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from typing import NamedTuple

from hamilton_tpu.state import Config, Phase
from hamilton_tpu.system import System
from hamilton_tpu.ops.linalg import small_cholesky, small_cho_solve, spd_solve

__all__ = [
    "mass_matrix",
    "momenta",
    "velocities",
    "to_phase",
    "from_phase",
    "pe",
    "ke_c",
    "ke_p",
    "lagrangian",
    "hamiltonian",
    "ham_eqs",
    "ham_rhs",
    "QFactor",
    "q_factor",
    "dhdp_factored",
    "dhdq_factored",
]


def mass_matrix(system: System, q: jax.Array) -> jax.Array:
    """Generalized mass matrix ``K(q) = J(q)ᵀ M J(q)``, shape ``(n, n)``.

    The ``tr j <> diag m <> j`` product of the reference
    (``Numeric/Hamilton.hs:324,380``), formed with the diagonal inertia applied
    as a row scaling rather than materializing ``diag M``.
    """
    j = system.jacobian(q)
    return j.T @ (system.inertia[:, None] * j)


def momenta(system: System, config: Config) -> jax.Array:
    """Conjugate momenta ``p = JᵀMJ q̇`` from a configuration-space state.

    Reference ``momenta`` (``Numeric/Hamilton.hs:262-269``).
    """
    j = system.jacobian(config.q)
    return j.T @ (system.inertia * (j @ config.v))


def velocities(system: System, phase: Phase) -> jax.Array:
    """Generalized velocities ``q̇ = (JᵀMJ)⁻¹ p`` from a phase-space state.

    Reference ``velocities`` (``Numeric/Hamilton.hs:316-324``), with the
    explicit ``inv`` replaced by a Cholesky solve.
    """
    return spd_solve(mass_matrix(system, phase.q), phase.p)


def to_phase(system: System, config: Config) -> Phase:
    """Configuration space -> phase space (reference ``toPhase``,
    ``Numeric/Hamilton.hs:279-284``)."""
    return Phase(config.q, momenta(system, config))


def from_phase(system: System, phase: Phase) -> Config:
    """Phase space -> configuration space (reference ``fromPhase``,
    ``Numeric/Hamilton.hs:332-337``)."""
    return Config(phase.q, velocities(system, phase))


def pe(system: System, q: jax.Array) -> jax.Array:
    """Potential energy ``U(q)`` (reference ``pe``, ``Numeric/Hamilton.hs:182-186``)."""
    return system.potential_value(q)


def ke_c(system: System, config: Config) -> jax.Array:
    """Kinetic energy from configuration space: ``⟨q̇, p⟩ / 2``.

    Reference ``keC`` (``Numeric/Hamilton.hs:288-296``).
    """
    return jnp.dot(config.v, momenta(system, config)) / 2


def ke_p(system: System, phase: Phase) -> jax.Array:
    """Kinetic energy from phase space: ``⟨p, q̇⟩ / 2``.

    Reference ``keP`` (``Numeric/Hamilton.hs:341-349``).
    """
    return jnp.dot(phase.p, velocities(system, phase)) / 2


def lagrangian(system: System, config: Config) -> jax.Array:
    """``L = T - U`` (reference ``lagrangian``, ``Numeric/Hamilton.hs:301-309``)."""
    return ke_c(system, config) - pe(system, config.q)


def hamiltonian(system: System, phase: Phase) -> jax.Array:
    """``H = T + U`` (reference ``hamiltonian``, ``Numeric/Hamilton.hs:353-361``)."""
    return ke_p(system, phase) + pe(system, phase.q)


def ham_eqs(system: System, phase: Phase) -> Tuple[jax.Array, jax.Array]:
    """Hamilton's equations: ``(q̇, ṗ) = (∂H/∂p, −∂H/∂q)``.

    The mathematical heart, mirroring reference ``hamEqs``
    (``Numeric/Hamilton.hs:363-387``) with two structural upgrades:

    * ``w = K⁻¹ p`` via an SPD Cholesky solve instead of the explicit ``inv``
      (``:381``);
    * the reference forms the full rank-3 Hessian ``∂J/∂q`` and contracts it
      per-coordinate (``:382-385``).  That tensor has ``m·n²`` entries per
      state — the dominant memory traffic at ensemble scale.  But the needed
      contraction ``∂T/∂q_k = −(MJw)ᵀ (∂J/∂q_k) w`` is exactly the VJP of
      ``g(q) = J(q)·w = jvp(f, q, w)`` with cotangent ``u = M⊙(Jw)`` (holding
      ``w`` fixed), i.e. one reverse-over-forward AD sweep: O(cost(f)) work
      and O(m+n) memory, never materializing the rank-3 object.
    """
    q, p = phase.q, phase.p
    mdiag = system.inertia
    j = system.jacobian(q)  # (m, n)
    k_mat = j.T @ (mdiag[:, None] * j)  # K = JᵀMJ
    w = spd_solve(k_mat, p)  # q̇ = K⁻¹p  (∂H/∂p, :386)
    u = mdiag * (j @ w)  # (m,)

    def jw(qq):
        # J(qq)·w as a JVP of the coordinate map (w held constant)
        return jax.jvp(system.coords, (qq,), (w,))[1]

    _, vjp_fn = jax.vjp(jw, q)
    dtdq = -vjp_fn(u)[0]  # −(MJw)ᵀ ∂J/∂q_k w   (:382-385)
    dhdq = dtdq + system.potential_grad(q)  # (:387)
    return w, -dhdq


class QFactor(NamedTuple):
    """Position-dependent factorization of the dynamics, cacheable across any
    computation that holds ``q`` fixed (the semi-implicit integrators' inner
    fixed-point loops, and across consecutive leapfrog steps).

    All fields are arrays, so a ``QFactor`` is a pytree leaf-bundle that can
    be carried through ``scan``/``fori_loop``.
    """

    jac: jax.Array  # J(q), (m, n)
    chol: jax.Array  # lower Cholesky factor of K(q) = JᵀMJ, (n, n)
    grad_u: jax.Array  # ∇U(q), (n,)


def q_factor(system: System, q: jax.Array) -> QFactor:
    """Factorize the q-dependent parts of :func:`ham_eqs` once."""
    j = system.jacobian(q)
    k_mat = j.T @ (system.inertia[:, None] * j)
    return QFactor(j, small_cholesky(k_mat), system.potential_grad(q))


def dhdp_factored(factor: QFactor, p: jax.Array) -> jax.Array:
    """``∂H/∂p = q̇ = K⁻¹p`` using a cached factor — one pair of triangular
    substitutions, no refactorization."""
    return small_cho_solve(factor.chol, p)


def dhdq_factored(
    system: System, factor: QFactor, q: jax.Array, p: jax.Array
) -> jax.Array:
    """``∂H/∂q`` using a cached factor: only the w-dependent VJP sweep is
    recomputed (see :func:`ham_eqs` for the contraction identity)."""
    w = small_cho_solve(factor.chol, p)
    u = system.inertia * (factor.jac @ w)

    def jw(qq):
        return jax.jvp(system.coords, (qq,), (w,))[1]

    _, vjp_fn = jax.vjp(jw, q)
    return -vjp_fn(u)[0] + factor.grad_u


def ham_rhs(system: System):
    """RHS closure on flat state vectors ``y = [q, p] ∈ R^{2n}``.

    The analog of the reference's integrator boundary function ``f``
    (``Numeric/Hamilton.hs:449-454``): flatten ∘ hamEqs ∘ unflatten.  Used by
    the integrator drivers in :mod:`hamilton_tpu.integrators`.
    """

    def rhs(y: jax.Array) -> jax.Array:
        dq, dp = ham_eqs(system, Phase.unflatten(y))
        return jnp.concatenate([dq, dp], axis=-1)

    return rhs
