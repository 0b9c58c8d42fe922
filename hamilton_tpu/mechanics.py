"""Mechanics core: mass matrix, state conversions, energies, Hamilton's equations.

TPU-native analog of the reference's L2 layer (``Numeric/Hamilton.hs:256-387``).
Every function here is **batch-aware**: states may carry arbitrary leading
batch axes (``q: (..., n)``), and the batched paths route the small-SPD
solves to the Pallas batch-in-registers kernels on TPU
(:mod:`hamilton_tpu.ops.pallas_solve`) — the reference's per-trajectory
BLAS/LAPACK calls become one fused vector op over the whole ensemble.
(``jax.vmap`` over the unbatched path also works and is what user-level code
gets when it vmaps; the native batch axis is what the ensemble hot loop uses
so the Pallas kernels can engage.)

Numerical upgrades over the reference (deliberate, SURVEY.md §7):

* the generalized mass matrix ``K = JᵀMJ`` is solved via **Cholesky**
  (unrolled/masked/Pallas by size and batch) instead of the reference's
  explicit ``inv`` (``Numeric/Hamilton.hs:321,381``) — K is symmetric
  positive definite by construction;
* the rank-3 Hessian contraction in ``hamEqs`` (``:382-385``) is replaced by
  a VJP-of-JVP sweep that never materializes the ``m·n²`` tensor.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

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


def _map_member(system: System, fn, *args):
    """Map a member-level ``fn(*member_args, params)`` over the leading batch
    axes of ``args`` (each ``(..., n)``-shaped, batch shapes equal).

    This is THE params-batching primitive: when the system's ``params``
    leaves carry ``pb`` extra batch axes (:meth:`System.param_batch_ndim`),
    those axes align with the **trailing** ``pb`` batch axes of the state —
    an ensemble ``q: (B, n)`` pairs member-wise with ``(B, ...)``-batched
    params, while extra *leading* state axes (time, integrator stages) map
    with params held fixed.  For unbatched/absent params this reduces to the
    plain leading-axis vmap (``fn`` then receives ``params=None`` for
    legacy systems).
    """
    nd = args[0].ndim - 1
    if system.params is None:
        g = lambda *a: fn(*a, None)  # noqa: E731
        for _ in range(nd):
            g = jax.vmap(g)
        return g(*args)
    pb = system.param_batch_ndim()
    if pb > nd:
        raise ValueError(
            f"params carry {pb} batch axes but the state has only {nd} "
            f"batch axes; batched params must align with the trailing "
            f"state batch axes (state {args[0].shape})"
        )

    def g(params, *a):
        return fn(*a, params)

    for _ in range(pb):  # innermost: member axes, params mapped jointly
        g = jax.vmap(g)
    for _ in range(nd - pb):  # outer axes (time/stages): params held fixed
        g = jax.vmap(g, in_axes=(None,) + (0,) * len(args))
    return g(system.params, *args)


def _mass_matrix_member(system: System):
    """Member-level ``(q, params) -> K`` from the analytic override."""
    fn = system.mass_matrix_fn
    if system.has_params:
        return fn
    return lambda q, _p: fn(q)


def _tiles_ok(q: jax.Array) -> bool:
    """Route this call through the tile-resident Pallas hot path?  True for a
    native single batch axis whose size is a register-tile multiple on a
    TPU-like backend (the ensemble hot loop); everything else takes the
    dense/masked path.  Static — resolved at trace time."""
    if q.ndim != 2:
        return False
    from hamilton_tpu.ops.pallas_solve import tiles_eligible

    return tiles_eligible(q.shape[0], q.shape[1], q.dtype)


def _jac_solve(system: System, j: jax.Array, b: jax.Array) -> jax.Array:
    """``(JᵀMJ)⁻¹ b`` via the fused form-K+factor+solve kernel on √M·J tiles.

    The entire K contraction happens inside the kernel on the VPU in exact
    f32 — measured 2.3× faster per formation than einsum-ing K at f32
    matmul precision and relayouting it (scripts/perf_probe.py k_path vs
    jac_solve), and immune to the TPU's bf16 dot default."""
    from hamilton_tpu.ops.pallas_solve import (
        from_vec_tiles,
        jac_tiles,
        spd_solve_jac_tiles,
        to_vec_tiles,
    )

    m, n = j.shape[-2], j.shape[-1]
    jt = jac_tiles(j, system.inertia)  # batched inertia broadcasts in
    return from_vec_tiles(spd_solve_jac_tiles(jt, to_vec_tiles(b), n, m))


def _k_solve_tiles(system: System, q: jax.Array, b: jax.Array) -> jax.Array:
    """``K(q)⁻¹ b`` on the tile path from an analytic ``mass_matrix_fn`` —
    no Jacobian exists at all; the only per-solve HBM traffic is the (B, n²)
    K formation plus its tile relayout (¼ of the Jacobian path's)."""
    from hamilton_tpu.ops.pallas_solve import (
        _to_tiles,
        from_vec_tiles,
        spd_solve_tiles,
        to_vec_tiles,
    )

    k_mat = _map_member(system, _mass_matrix_member(system), q)
    return from_vec_tiles(spd_solve_tiles(_to_tiles(k_mat, 2), to_vec_tiles(b)))


def _jacobian(system: System, q: jax.Array) -> jax.Array:
    """J(q) with leading batch axes: (..., m, n)."""
    return _map_member(
        system, lambda qq, pp: system.jacobian(qq, params=pp), q
    )


# Contractions as explicit multiply+reduce: exact f32 on the VPU, never
# lowered to the MXU (whose f32 "HIGHEST" mode costs multiple bf16 passes
# and whose default silently rounds operands to bf16 — docs/design.md
# "Precision on TPU").  Mat-vecs are always cheaper this way (the
# intermediate is J-sized); the K formation only below a size gate (the
# (..., m, n, n) intermediate must stay small — big n takes the fused
# Pallas kernel on TPU or the HIGHEST einsum elsewhere).

_K_MULSUM_LIMIT = 512  # max m·n² for the elementwise K formation


def _mv(a: jax.Array, v: jax.Array) -> jax.Array:
    """``A @ v`` for A (..., m, n), v (..., n) — exact elementwise form."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def _tmv(a: jax.Array, u: jax.Array) -> jax.Array:
    """``Aᵀ @ u`` for A (..., m, n), u (..., m) — exact elementwise form."""
    return jnp.sum(a * u[..., :, None], axis=-2)


def _form_k(j: jax.Array, inertia: jax.Array) -> jax.Array:
    """``K = JᵀMJ`` (..., n, n) from J (..., m, n).  ``inertia`` may carry
    leading batch axes (derived from batched params) — they broadcast against
    J's batch axes (trailing-aligned, like everything params-batched)."""
    # params (hence the derived inertia) may be stored wider than the state
    # (e.g. f64 params from an x64 build driving an f32 ensemble); compute in
    # the state dtype like every other params consumer (cf. jac_tiles)
    inertia = inertia.astype(j.dtype)
    m, n = j.shape[-2], j.shape[-1]
    if m * n * n <= _K_MULSUM_LIMIT:
        jm = j * inertia[..., :, None]
        return jnp.sum(jm[..., :, :, None] * j[..., :, None, :], axis=-3)
    if inertia.ndim == 1:
        return jnp.einsum(
            "...mi,m,...mj->...ij", j, inertia, j,
            precision=jax.lax.Precision.HIGHEST,
        )
    jm = j * inertia[..., :, None]
    return jnp.einsum(
        "...mi,...mj->...ij", jm, j, precision=jax.lax.Precision.HIGHEST
    )


def _grad_u(system: System, q: jax.Array) -> jax.Array:
    return _map_member(
        system, lambda qq, pp: system.potential_grad(qq, params=pp), q
    )


def mass_matrix(system: System, q: jax.Array) -> jax.Array:
    """Generalized mass matrix ``K(q) = J(q)ᵀ M J(q)``, shape ``(..., n, n)``.

    The ``tr j <> diag m <> j`` product of the reference
    (``Numeric/Hamilton.hs:324,380``) with the diagonal inertia applied as a
    scaling, batched over any leading axes.  An analytic ``mass_matrix_fn``
    on the system replaces the Jacobian contraction entirely.
    """
    if system.mass_matrix_fn is not None:
        return _map_member(system, _mass_matrix_member(system), jnp.asarray(q))
    j = _jacobian(system, q)
    return _form_k(j, system.inertia)


def momenta(system: System, config: Config) -> jax.Array:
    """Conjugate momenta ``p = JᵀMJ q̇`` (reference ``momenta``,
    ``Numeric/Hamilton.hs:262-269``), batch-aware."""
    if system.mass_matrix_fn is not None:
        return _mv(mass_matrix(system, config.q), config.v)
    j = _jacobian(system, config.q)
    return _tmv(j, system.inertia.astype(j.dtype) * _mv(j, config.v))


def velocities(system: System, phase: Phase) -> jax.Array:
    """Generalized velocities ``q̇ = (JᵀMJ)⁻¹ p`` (reference ``velocities``,
    ``Numeric/Hamilton.hs:316-324``) via Cholesky, batch-aware.  On the
    ensemble hot path K is contracted directly into register-tile layout and
    solved there (no matrix relayout)."""
    if _tiles_ok(phase.q):
        if system.mass_matrix_fn is not None:
            return _k_solve_tiles(system, phase.q, phase.p)
        j = _jacobian(system, phase.q)
        return _jac_solve(system, j, phase.p)
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
    """Potential energy ``U(q)`` (reference ``pe``,
    ``Numeric/Hamilton.hs:182-186``); shape ``(...)`` for ``q (..., n)``."""
    return _map_member(
        system, lambda qq, pp: system.potential_value(qq, params=pp),
        jnp.asarray(q),
    )


def ke_c(system: System, config: Config) -> jax.Array:
    """Kinetic energy from configuration space: ``⟨q̇, p⟩ / 2``
    (reference ``keC``, ``Numeric/Hamilton.hs:288-296``)."""
    return jnp.sum(config.v * momenta(system, config), axis=-1) / 2


def ke_p(system: System, phase: Phase) -> jax.Array:
    """Kinetic energy from phase space: ``⟨p, q̇⟩ / 2``
    (reference ``keP``, ``Numeric/Hamilton.hs:341-349``)."""
    return jnp.sum(phase.p * velocities(system, phase), axis=-1) / 2


def lagrangian(system: System, config: Config) -> jax.Array:
    """``L = T - U`` (reference ``lagrangian``, ``Numeric/Hamilton.hs:301-309``)."""
    return ke_c(system, config) - pe(system, config.q)


def hamiltonian(system: System, phase: Phase) -> jax.Array:
    """``H = T + U`` (reference ``hamiltonian``, ``Numeric/Hamilton.hs:353-361``)."""
    return ke_p(system, phase) + pe(system, phase.q)


def _dtdq(system: System, q: jax.Array, w: jax.Array) -> jax.Array:
    """``∂T/∂q_k = −uᵀ (∂J/∂q_k) w`` with ``u = M·J·w``, as a VJP of
    ``q ↦ J(q)·w``.

    The reference materializes the rank-3 ``∂J/∂q`` and loops its slices
    (``Numeric/Hamilton.hs:382-385``); this computes the same contraction in
    one reverse-over-forward AD sweep — O(cost(f)) work, O(m+n) memory.
    ``J·w`` itself falls out as the *primal* output of the linearization, so
    the cotangent ``u`` costs no extra pass — and, on the ensemble hot path,
    no re-read of a (B, m, n) Jacobian from HBM (the step is
    bandwidth-bound; docs/design.md "Round-2 additions").
    """

    # An analytic ``dtdq_fn`` (∂T/∂q at fixed w) replaces the sweep outright.
    # NOTE the sign: this function returns the KINETIC PART OF ∂H/∂q, which
    # is −∂T/∂q|_w (Legendre identity), hence the negation of the override.
    if system.dtdq_fn is not None:
        fn = system.dtdq_fn
        if system.has_params:
            return -_map_member(system, fn, q, w)
        return -_map_member(system, lambda qq, ww, _p: fn(qq, ww), q, w)

    # NOTE: even when the system carries an analytic ``mass_matrix_fn``, this
    # sweep stays on the coords linearization — ∂T/∂q = −½wᵀ(∂K/∂q)w via
    # reverse AD through K was measured SLOWER on TPU (1.50 vs 1.00 ms/step,
    # 16384×chain-20): its cotangent is a (B, n, n) array per call, while the
    # coords sweep's activations are (B, m)-sized.
    def one(qi, wi, pp):
        coords1 = system.coords_bound(pp)
        # cast to the state dtype: the VJP cotangent must match qi's dtype
        # exactly (f64 params from an x64 build would otherwise crash an
        # f32 evolution here — the only inertia consumer where mixed dtypes
        # raise instead of silently promoting)
        inert = system.inertia_of(pp).astype(qi.dtype)

        def jw(qq):
            return jax.jvp(coords1, (qq,), (wi,))[1]

        jw_val, vjp_fn = jax.vjp(jw, qi)
        return -vjp_fn(inert * jw_val)[0]

    return _map_member(system, one, q, w)


def ham_eqs(system: System, phase: Phase) -> Tuple[jax.Array, jax.Array]:
    """Hamilton's equations: ``(q̇, ṗ) = (∂H/∂p, −∂H/∂q)``.

    The mathematical heart, mirroring reference ``hamEqs``
    (``Numeric/Hamilton.hs:363-387``); batch-aware, with the SPD solve routed
    to the Pallas ensemble kernel when a real batch axis is present on TPU.
    """
    q, p = phase.q, phase.p
    if system.mass_matrix_fn is not None:
        if _tiles_ok(q):
            w = _k_solve_tiles(system, q, p)
        else:
            w = spd_solve(mass_matrix(system, q), p)
    elif _tiles_ok(q):
        w = _jac_solve(system, _jacobian(system, q), p)
    else:
        k_mat = _form_k(_jacobian(system, q), system.inertia)
        w = spd_solve(k_mat, p)  # q̇ = K⁻¹p  (∂H/∂p, :386)
    dhdq = _dtdq(system, q, w) + _grad_u(system, q)  # (:387)
    return w, -dhdq


class QFactor(NamedTuple):
    """Position-dependent factorization of the dynamics, cacheable across any
    computation that holds ``q`` fixed (the semi-implicit integrators' inner
    fixed-point loops, and across consecutive leapfrog steps).

    Both fields are arrays (with leading batch axes matching ``q``), so a
    ``QFactor`` is carryable through ``scan``/``fori_loop``.  On the ensemble
    hot path ``chol`` is held in Pallas register-tile layout
    ``(G, n², 8, 128)`` — produced and consumed with zero matrix relayout —
    and in dense ``(..., n, n)`` layout everywhere else; the consumers
    dispatch on the array rank.  The Jacobian itself is deliberately NOT
    carried: its only factored-path consumer, ``u = M·J·w``, falls out of the
    :func:`_dtdq` linearization, and carrying the (B, m, n) array through the
    evolution loop costs more HBM traffic than everything else combined.
    """

    chol: jax.Array  # lower Cholesky factor of K(q): (..., n, n) or tiles
    grad_u: jax.Array  # ∇U(q), (..., n)


def q_factor(system: System, q: jax.Array) -> QFactor:
    """Factorize the q-dependent parts of :func:`ham_eqs` once."""
    if system.mass_matrix_fn is not None:
        k_mat = mass_matrix(system, q)
        if _tiles_ok(q):
            from hamilton_tpu.ops.pallas_solve import _to_tiles, cholesky_tiles

            return QFactor(cholesky_tiles(_to_tiles(k_mat, 2)),
                           _grad_u(system, q))
        return QFactor(small_cholesky(k_mat), _grad_u(system, q))
    j = _jacobian(system, q)
    if _tiles_ok(q):
        from hamilton_tpu.ops.pallas_solve import cholesky_jac_tiles, jac_tiles

        m, n = j.shape[-2], j.shape[-1]
        chol = cholesky_jac_tiles(jac_tiles(j, system.inertia), n, m)
        return QFactor(chol, _grad_u(system, q))
    k_mat = _form_k(j, system.inertia)
    return QFactor(small_cholesky(k_mat), _grad_u(system, q))


def _factor_solve(factor: QFactor, p: jax.Array) -> jax.Array:
    """``K⁻¹p`` from a cached factor, dispatching on the factor layout."""
    if factor.chol.ndim == 4 and p.ndim == 2:
        from hamilton_tpu.ops.pallas_solve import (
            cho_solve_tiles,
            from_vec_tiles,
            to_vec_tiles,
        )

        return from_vec_tiles(cho_solve_tiles(factor.chol, to_vec_tiles(p)))
    return small_cho_solve(factor.chol, p)


def dhdp_factored(factor: QFactor, p: jax.Array) -> jax.Array:
    """``∂H/∂p = q̇ = K⁻¹p`` from a cached factor — substitutions only."""
    return _factor_solve(factor, p)


def dhdq_factored(
    system: System, factor: QFactor, q: jax.Array, p: jax.Array
) -> jax.Array:
    """``∂H/∂q`` from a cached factor: only the w-dependent VJP sweep is
    recomputed (``J·w`` comes out of the sweep's own linearization)."""
    w = _factor_solve(factor, p)
    return _dtdq(system, q, w) + factor.grad_u


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
