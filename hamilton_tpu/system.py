"""System construction via automatic differentiation.

TPU-native analog of the reference's L1 layer (``Numeric/Hamilton.hs:147-254``):
the ``System m n`` GADT of six pre-differentiated closures becomes a registered
pytree holding the inertia vector plus the *user's pure functions*; the
Jacobian, the rank-3 Hessian, and the potential gradient are not stored — they
are ``jax.jacfwd`` / ``jax.hessian`` / ``jax.grad`` transforms applied lazily
and fused into the surrounding jit-compiled step (SURVEY.md §7 design table).

User-function contract (the analog of the reference's
``forall a. RealFloat a => V.Vector n a -> V.Vector m a`` rank-polymorphism,
``Numeric/Hamilton.hs:212-215``): ``coords`` and ``potential`` must be *pure,
jax.numpy-traceable* functions — no Python branching on traced values, no
side effects.  Hard walls must be modeled as smooth potentials (like the
reference's ``logistic`` soft wall, ``app/Examples.hs:601-605``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["System", "mk_system", "mk_system_cart", "underlying_pos"]


class System:
    """A physical system with ``n`` generalized coordinates embedded in an
    ``m``-dimensional Cartesian space.

    Analog of the reference ``System m n`` (``Numeric/Hamilton.hs:160-169``),
    with the six stored closures replaced by AD transforms of the two user
    functions:

    ==================  =============================================
    reference field     here
    ==================  =============================================
    ``_sysInertia``     :attr:`inertia` (array, pytree leaf)
    ``_sysCoords``      :attr:`coords` (user fn, static)
    ``_sysJacobian``    :meth:`jacobian` = ``jax.jacfwd(coords)``
    ``_sysHessian``     :meth:`hessian` = ``jax.hessian(coords)``
    ``_sysPotential``   :attr:`potential` (user fn, static)
    ``_sysPotentialGrad``  :meth:`potential_grad` = ``jax.grad(potential)``
    ==================  =============================================

    ``System`` is a pytree: :attr:`inertia` is a leaf (so it can be traced,
    vmapped over for parameter sweeps, and donated), while the two functions
    are static aux data (so ``jit`` specializes per system).
    """

    def __init__(
        self,
        inertia: jax.Array,
        coords: Callable[[jax.Array], jax.Array],
        potential: Callable[[jax.Array], jax.Array],
        n: Optional[int] = None,
        name: str = "system",
        jacobian_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        mass_matrix_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        dtdq_fn: Optional[
            Callable[[jax.Array, jax.Array], jax.Array]
        ] = None,
        pallas_step: Optional[Callable[..., object]] = None,
    ):
        self.inertia = jnp.asarray(inertia)
        if self.inertia.ndim != 1:
            raise ValueError(
                f"inertia must be a rank-1 vector of per-Cartesian-coordinate "
                f"masses, got shape {self.inertia.shape}"
            )
        self.coords = coords
        self.potential = potential
        self._n = n
        self.name = name
        self.jacobian_fn = jacobian_fn
        self.mass_matrix_fn = mass_matrix_fn
        self.dtdq_fn = dtdq_fn
        # Optional fused whole-step kernel factory,
        # ``pallas_step(iters=..., compensated=...) -> Stepper`` — selected
        # with ``method="leapfrog_fused"`` (see ops/pallas_step.py).  Static
        # aux data: its physics constants are baked at construction and do
        # NOT track later pytree edits of ``inertia``.
        self.pallas_step = pallas_step

    # -- dimensions -----------------------------------------------------
    @property
    def m(self) -> int:
        """Cartesian (underlying) dimension."""
        return self.inertia.shape[0]

    @property
    def n(self) -> Optional[int]:
        """Generalized-coordinate dimension, if declared at construction."""
        return self._n

    # -- AD-derived closures (reference Hamilton.hs:217-225) ------------
    def jacobian(self, q: jax.Array) -> jax.Array:
        """``J(q) = df/dq``, shape ``(m, n)``.

        Reference ``_sysJacobian = tr . vec2l . jacobianT f``
        (``Numeric/Hamilton.hs:221``), via forward-mode AD — forward mode is
        the right choice for ``n <= m`` tall Jacobians.

        When the constructor was given an analytic ``jacobian_fn`` it is used
        instead: materializing J via ``jacfwd`` costs ``n`` tangent passes of
        ``coords`` (measured as 2/3 of the entire ensemble step for the
        20-link chain — docs/design.md "Round-2 hot-loop reductions"), while
        a hand-derived form is typically a few elementwise ops.  Correctness
        of the override against the AD Jacobian is the user's contract (and
        unit-tested for the bundled models).
        """
        if self.jacobian_fn is not None:
            return self.jacobian_fn(q)
        return jax.jacfwd(self.coords)(q)

    def hessian(self, q: jax.Array) -> jax.Array:
        """Rank-3 ``d2f/dq2``, shape ``(m, n, n)``.

        ``hessian(q)[a, j, k] = ∂²f_a/∂q_j∂q_k``.  Reference ``_sysHessian``
        (``Numeric/Hamilton.hs:222``) stores this re-sliced as ``n`` matrices
        of ``(m, n)`` via ``tr2`` (``:227-233``); here it stays one contiguous
        rank-3 array so the dynamics contraction is a single ``einsum``
        (see :func:`hamilton_tpu.mechanics.ham_eqs`).
        """
        return jax.jacfwd(jax.jacfwd(self.coords))(q)

    def potential_value(self, q: jax.Array) -> jax.Array:
        """``U(q)`` as a scalar array (reference ``_sysPotential``, ``:223``)."""
        return jnp.asarray(self.potential(q)).reshape(())

    def potential_grad(self, q: jax.Array) -> jax.Array:
        """``∇U(q)``, shape ``(n,)`` (reference ``_sysPotentialGrad``, ``:224``)."""
        return jax.grad(lambda qq: jnp.asarray(self.potential(qq)).reshape(()))(q)

    def underlying_pos(self, q: jax.Array) -> jax.Array:
        """``f(q)``: generalized -> Cartesian positions (reference
        ``underlyingPos``, ``Numeric/Hamilton.hs:174-178``)."""
        return self.coords(q)

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        return (self.inertia,), (
            self.coords, self.potential, self._n, self.name,
            self.jacobian_fn, self.mass_matrix_fn, self.dtdq_fn,
            self.pallas_step,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (coords, potential, n, name, jacobian_fn, mass_matrix_fn, dtdq_fn,
         pallas_step) = aux
        (inertia,) = children
        obj = cls.__new__(cls)
        obj.inertia = inertia
        obj.coords = coords
        obj.potential = potential
        obj._n = n
        obj.name = name
        obj.jacobian_fn = jacobian_fn
        obj.mass_matrix_fn = mass_matrix_fn
        obj.dtdq_fn = dtdq_fn
        obj.pallas_step = pallas_step
        return obj

    def __repr__(self) -> str:
        return f"System(name={self.name!r}, m={self.inertia.shape[0]}, n={self._n})"


jax.tree_util.register_pytree_node(
    System,
    lambda s: s.tree_flatten(),
    System.tree_unflatten,
)


def mk_system(
    inertia,
    coords: Callable[[jax.Array], jax.Array],
    potential: Callable[[jax.Array], jax.Array],
    *,
    n: Optional[int] = None,
    name: str = "system",
    jacobian_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    mass_matrix_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    dtdq_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    pallas_step: Optional[Callable[..., object]] = None,
) -> System:
    """Create a system from generalized-coordinate data.

    Analog of reference ``mkSystem`` (``Numeric/Hamilton.hs:201-233``):

    Args:
      inertia: ``(m,)`` vector — mass for linear coordinates, rotational
        inertia for angular ones (``:204-208``).
      coords: pure traceable map from generalized positions ``(n,)`` to
        Cartesian positions ``(m,)`` (``:209-212``).
      potential: potential energy as a function of *generalized* positions
        ``(n,) -> scalar`` (``:213-215``).
      n: optional declared generalized dimension (runtime-checked on use).
      name: label for diagnostics.
      jacobian_fn: optional analytic ``(n,) -> (m, n)`` Jacobian of
        ``coords``, replacing the ``jacfwd`` derivation on the hot path (the
        reference always derives via AD; this is the standard hand-derived
        escape hatch — it must equal the AD Jacobian, which is cheap to
        unit-test via ``jax.jacfwd(coords)``).
      mass_matrix_fn: optional analytic ``(n,) -> (n, n)`` generalized mass
        matrix ``K(q) = J(q)ᵀ M J(q)``.  When given, the dynamics form K
        directly — O(n²) elementwise ops instead of materializing the
        (m, n) Jacobian and contracting (the dominant HBM traffic of the
        ensemble hot loop; docs/design.md "Round-2 hot-loop reductions") —
        and ``∂T/∂q`` is taken as ``−½ wᵀ(∂K/∂q)w`` by reverse AD through
        this function.  Must equal ``JᵀMJ`` (unit-tested for bundled
        models).
      dtdq_fn: optional analytic ``(q, w) -> (n,)`` kinetic-energy gradient
        ``∂T/∂q`` at *fixed generalized velocity* ``w = q̇``, i.e.
        ``½ ∂(wᵀK(q)w)/∂q``.  The dynamics use ``∂H/∂q = ∇U − ∂T/∂q|_w``
        (the standard Legendre identity), so an override here replaces the
        reverse-over-forward AD sweep of ``hamEqs`` — the dominant cost of
        the factored leapfrog step (three sweeps/step; docs/design.md
        "Round-2 hot-loop reductions").  Must equal the AD sweep
        (unit-tested for bundled models).
    """
    system = System(
        inertia, coords, potential, n=n, name=name, jacobian_fn=jacobian_fn,
        mass_matrix_fn=mass_matrix_fn, dtdq_fn=dtdq_fn,
        pallas_step=pallas_step,
    )
    if n is not None:
        _validate_system(system, n)
    return system


def _validate_system(system: System, n: int) -> None:
    """Shape-check the user functions with ``jax.eval_shape`` (no FLOPs, no
    tracing side effects beyond shape propagation) — the runtime analog of
    the reference's type-level dimension checking (SURVEY.md §2.3)."""
    import jax

    probe = jax.ShapeDtypeStruct((n,), system.inertia.dtype)
    try:
        out = jax.eval_shape(system.coords, probe)
    except Exception as e:
        raise ValueError(
            f"coords function failed shape tracing on a ({n},) input: {e}"
        ) from e
    if tuple(out.shape) != (system.m,):
        raise ValueError(
            f"coords must map ({n},) -> ({system.m},) to match the inertia "
            f"vector, got output shape {tuple(out.shape)}"
        )
    try:
        u_out = jax.eval_shape(system.potential, probe)
    except Exception as e:
        raise ValueError(
            f"potential function failed shape tracing on a ({n},) input: {e}"
        ) from e
    if tuple(u_out.shape) not in ((), (1,)):
        raise ValueError(
            f"potential must return a scalar, got shape {tuple(u_out.shape)}"
        )
    if system.jacobian_fn is not None:
        try:
            j_out = jax.eval_shape(system.jacobian_fn, probe)
        except Exception as e:
            raise ValueError(
                f"jacobian_fn failed shape tracing on a ({n},) input: {e}"
            ) from e
        if tuple(j_out.shape) != (system.m, n):
            raise ValueError(
                f"jacobian_fn must map ({n},) -> ({system.m}, {n}), got "
                f"output shape {tuple(j_out.shape)}"
            )
    if system.mass_matrix_fn is not None:
        try:
            k_out = jax.eval_shape(system.mass_matrix_fn, probe)
        except Exception as e:
            raise ValueError(
                f"mass_matrix_fn failed shape tracing on a ({n},) input: {e}"
            ) from e
        if tuple(k_out.shape) != (n, n):
            raise ValueError(
                f"mass_matrix_fn must map ({n},) -> ({n}, {n}), got "
                f"output shape {tuple(k_out.shape)}"
            )
    if system.dtdq_fn is not None:
        try:
            d_out = jax.eval_shape(system.dtdq_fn, probe, probe)
        except Exception as e:
            raise ValueError(
                f"dtdq_fn failed shape tracing on ({n},), ({n},) inputs: {e}"
            ) from e
        if tuple(d_out.shape) != (n,):
            raise ValueError(
                f"dtdq_fn must map ({n},), ({n},) -> ({n},), got "
                f"output shape {tuple(d_out.shape)}"
            )


def mk_system_cart(
    inertia,
    coords: Callable[[jax.Array], jax.Array],
    potential_cart: Callable[[jax.Array], jax.Array],
    *,
    n: Optional[int] = None,
    name: str = "system",
    jacobian_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    mass_matrix_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    dtdq_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    pallas_step: Optional[Callable[..., object]] = None,
) -> System:
    """Create a system with the potential stated in *Cartesian* coordinates.

    Analog of reference ``mkSystem'`` = ``mkSystem m f (u . f)``
    (``Numeric/Hamilton.hs:238-254``).  See :func:`mk_system` for
    ``jacobian_fn`` / ``mass_matrix_fn`` / ``dtdq_fn``; ``pallas_step``
    attaches a fused whole-step kernel factory (ops/pallas_step.py).
    """
    system = System(
        inertia, coords, lambda q: potential_cart(coords(q)), n=n, name=name,
        jacobian_fn=jacobian_fn, mass_matrix_fn=mass_matrix_fn,
        dtdq_fn=dtdq_fn, pallas_step=pallas_step,
    )
    if n is not None:
        _validate_system(system, n)
    return system


def underlying_pos(system: System, q: jax.Array) -> jax.Array:
    """Convert generalized positions to underlying Cartesian positions.

    Analog of reference ``underlyingPos`` (``Numeric/Hamilton.hs:174-178``) —
    the only API consumer of the ``m`` dimension; used for plotting/drawing.
    Batched ``q`` is supported via vmap over the leading axes.
    """
    q = jnp.asarray(q)
    if q.ndim == 1:
        return system.coords(q)
    fn = system.coords
    for _ in range(q.ndim - 1):
        fn = jax.vmap(fn)
    return fn(q)
