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

**Physics parameters** (masses, lengths, spring constants, …) should live in
the ``params`` pytree leaf rather than being closed over: the reference makes
them ordinary arguments of every example (``app/Examples.hs:195-359``,
masses as plain data ``Numeric/Hamilton.hs:201-215``), and here a ``params``
leaf is what makes parameter *sweeps* first-class — tree-mapping a batch axis
onto ``params`` gives a per-member-parameterized ensemble that the mechanics
evaluate natively (see :func:`hamilton_tpu.mechanics` and
``ensemble.evolve_ensemble``).  When ``params`` is given, every user function
takes it as a trailing argument: ``coords(q, params)``,
``potential(q, params)``, ``jacobian_fn(q, params)``,
``mass_matrix_fn(q, params)``, ``dtdq_fn(q, w, params)``, and the optional
``inertia_fn(params)`` derives the inertia vector from the parameters so it
can never fall out of sync with them.
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
    ``_sysInertia``     :attr:`inertia` (array leaf, or derived from
                        ``params`` via ``inertia_fn``)
    ``_sysCoords``      :attr:`coords` (user fn, static)
    ``_sysJacobian``    :meth:`jacobian` = ``jax.jacfwd(coords)``
    ``_sysHessian``     :meth:`hessian` = ``jax.hessian(coords)``
    ``_sysPotential``   :attr:`potential` (user fn, static)
    ``_sysPotentialGrad``  :meth:`potential_grad` = ``jax.grad(potential)``
    ==================  =============================================

    ``System`` is a pytree: :attr:`inertia` and :attr:`params` are leaves (so
    they can be traced, vmapped/tree-mapped over for parameter sweeps, and
    donated), while the functions are static aux data (so ``jit`` specializes
    per system).

    **Parameter batching**: ``params`` leaves may carry extra leading batch
    axes relative to their construction-time shapes (all leaves must agree —
    :meth:`param_batch_ndim`).  The mechanics align those axes with the
    *trailing* batch axes of the state, i.e. an ensemble ``q: (B, n)`` pairs
    with ``params`` batched ``(B, ...)``, and a trajectory ``q: (T, B, n)``
    evaluates the same ``(B, ...)`` params across the time axis.
    """

    def __init__(
        self,
        inertia,
        coords: Callable[..., jax.Array],
        potential: Callable[..., jax.Array],
        n: Optional[int] = None,
        name: str = "system",
        jacobian_fn: Optional[Callable[..., jax.Array]] = None,
        mass_matrix_fn: Optional[Callable[..., jax.Array]] = None,
        dtdq_fn: Optional[Callable[..., jax.Array]] = None,
        pallas_step: Optional[Callable[..., object]] = None,
        params=None,
        inertia_fn: Optional[Callable[..., jax.Array]] = None,
        fused_forms: Optional[Callable[..., object]] = None,
    ):
        if inertia_fn is not None:
            if params is None:
                raise ValueError("inertia_fn requires params")
            if inertia is not None:
                raise ValueError(
                    "give either a concrete inertia vector or inertia_fn "
                    "(derived from params), not both"
                )
            self._inertia = None
        else:
            if inertia is None:
                raise ValueError(
                    "inertia is required: give a concrete per-Cartesian-"
                    "coordinate mass vector, or derive it from params via "
                    "inertia_fn"
                )
            self._inertia = jnp.asarray(inertia)
            if self._inertia.ndim != 1:
                raise ValueError(
                    f"inertia must be a rank-1 vector of per-Cartesian-"
                    f"coordinate masses, got shape {self._inertia.shape}"
                )
        if params is not None:
            params = jax.tree_util.tree_map(jnp.asarray, params)
            self._params_ndim = tuple(
                int(leaf.ndim) for leaf in jax.tree_util.tree_leaves(params)
            )
        else:
            self._params_ndim = ()
        self.params = params
        self.inertia_fn = inertia_fn
        self.coords = coords
        self.potential = potential
        self._n = n
        self.name = name
        self.jacobian_fn = jacobian_fn
        self.mass_matrix_fn = mass_matrix_fn
        self.dtdq_fn = dtdq_fn
        # Optional fused whole-step kernel factory,
        # ``pallas_step(system, iters=..., ...) -> Stepper`` — selected with
        # ``method="leapfrog_fused"`` (see ops/pallas_step.py).  The factory
        # itself is static aux data; it receives the *current* system at
        # stepper-build time, so its physics constants come from the live
        # ``params``/``inertia`` leaves (parameter edits and sweeps reach it).
        self.pallas_step = pallas_step
        # Optional closed-form family contract,
        # ``fused_forms(system) -> ops.pallas_step.FusedForms`` — the
        # declarative way to join the fused-kernel family: the fused methods
        # build their stepper from it via ``fused_stepper``, and the
        # double-f32 drift sampler reads its potential/mass-matrix closed
        # forms.  ``pallas_step`` (a fully custom stepper factory) takes
        # precedence when both are set.
        self.fused_forms = fused_forms

    # -- params plumbing ------------------------------------------------
    @property
    def has_params(self) -> bool:
        return self.params is not None

    def param_batch_ndim(self) -> int:
        """Number of extra leading batch axes the ``params`` leaves carry
        relative to their construction-time shapes (0 for unbatched).  All
        leaves must agree."""
        if self.params is None:
            return 0
        leaves = jax.tree_util.tree_leaves(self.params)
        if len(leaves) != len(self._params_ndim):
            raise ValueError(
                f"params leaf count changed since construction "
                f"({len(leaves)} != {len(self._params_ndim)}) — params edits "
                f"must preserve the pytree structure (use replace_params)"
            )
        pbs = {
            jnp.ndim(leaf) - base
            for leaf, base in zip(leaves, self._params_ndim)
        }
        if len(pbs) != 1:
            raise ValueError(
                f"inconsistent params batching: leaf batch ndims {sorted(pbs)}"
                f" — every params leaf must carry the same number of extra "
                f"leading axes"
            )
        (pb,) = pbs
        if pb < 0:
            raise ValueError(
                "params leaves have FEWER axes than at construction — "
                "params edits must preserve each leaf's base shape"
            )
        return pb

    def params_axes_tree(self, params_mark, other_mark=None):
        """A System-shaped pytree with ``params_mark`` at every ``params``
        leaf and ``other_mark`` at every other leaf (the concrete inertia
        leaf, when present) — the building block for ``vmap`` ``in_axes``
        and ``shard_map``/``NamedSharding`` spec trees that batch or shard
        only the parameters.

        Built positionally from the flatten order (children are
        ``(inertia, params)``, so the params leaves are the trailing ones),
        not by leaf identity — a user passing the same array object as both
        the inertia and a params leaf still gets the correct marks.
        """
        leaves, treedef = jax.tree_util.tree_flatten(self)
        n_params = len(jax.tree_util.tree_leaves(self.params))
        n_other = len(leaves) - n_params
        return jax.tree_util.tree_unflatten(
            treedef, [other_mark] * n_other + [params_mark] * n_params
        )

    def _member_params(self, params):
        """Resolve the params to use for a single-member call: an explicit
        member ``params`` wins; otherwise ``self.params`` (which must then be
        unbatched)."""
        if params is not None:
            return params
        if self.params is not None and self.param_batch_ndim() > 0:
            raise ValueError(
                "this System carries batched params; member-level calls "
                "(System.jacobian / potential_grad / ...) need explicit "
                "member params — use the batch-aware functions in "
                "hamilton_tpu.mechanics instead"
            )
        return self.params

    def inertia_of(self, params=None) -> jax.Array:
        """Single-member inertia vector ``(m,)`` for the given member params
        (or this system's own, when unbatched)."""
        if self.inertia_fn is None:
            return self._inertia
        return self.inertia_fn(self._member_params(params))

    @property
    def inertia(self) -> jax.Array:
        """The inertia vector: the stored leaf, or — with ``inertia_fn`` —
        derived from ``params`` (with any params batch axes leading)."""
        if self.inertia_fn is None:
            return self._inertia
        fn = self.inertia_fn
        for _ in range(self.param_batch_ndim()):
            fn = jax.vmap(fn)
        return fn(self.params)

    # -- dimensions -----------------------------------------------------
    @property
    def m(self) -> int:
        """Cartesian (underlying) dimension."""
        return self.inertia.shape[-1]

    @property
    def n(self) -> Optional[int]:
        """Generalized-coordinate dimension, if declared at construction."""
        return self._n

    # -- member-level closures (params bound) ---------------------------
    def coords_bound(self, params=None) -> Callable[[jax.Array], jax.Array]:
        """``coords`` as a single-argument closure with params bound."""
        if self.params is None:
            return self.coords
        p = self._member_params(params)
        return lambda q: self.coords(q, p)

    def potential_bound(self, params=None) -> Callable[[jax.Array], jax.Array]:
        """``potential`` as a single-argument closure with params bound."""
        if self.params is None:
            return self.potential
        p = self._member_params(params)
        return lambda q: self.potential(q, p)

    # -- AD-derived closures (reference Hamilton.hs:217-225) ------------
    def jacobian(self, q: jax.Array, params=None) -> jax.Array:
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
            if self.params is None:
                return self.jacobian_fn(q)
            return self.jacobian_fn(q, self._member_params(params))
        return jax.jacfwd(self.coords_bound(params))(q)

    def hessian(self, q: jax.Array, params=None) -> jax.Array:
        """Rank-3 ``d2f/dq2``, shape ``(m, n, n)``.

        ``hessian(q)[a, j, k] = ∂²f_a/∂q_j∂q_k``.  Reference ``_sysHessian``
        (``Numeric/Hamilton.hs:222``) stores this re-sliced as ``n`` matrices
        of ``(m, n)`` via ``tr2`` (``:227-233``); here it stays one contiguous
        rank-3 array so the dynamics contraction is a single ``einsum``
        (see :func:`hamilton_tpu.mechanics.ham_eqs`).
        """
        fn = self.coords_bound(params)
        return jax.jacfwd(jax.jacfwd(fn))(q)

    def potential_value(self, q: jax.Array, params=None) -> jax.Array:
        """``U(q)`` as a scalar array (reference ``_sysPotential``, ``:223``)."""
        return jnp.asarray(self.potential_bound(params)(q)).reshape(())

    def potential_grad(self, q: jax.Array, params=None) -> jax.Array:
        """``∇U(q)``, shape ``(n,)`` (reference ``_sysPotentialGrad``, ``:224``)."""
        fn = self.potential_bound(params)
        return jax.grad(lambda qq: jnp.asarray(fn(qq)).reshape(()))(q)

    def underlying_pos(self, q: jax.Array, params=None) -> jax.Array:
        """``f(q)``: generalized -> Cartesian positions (reference
        ``underlyingPos``, ``Numeric/Hamilton.hs:174-178``)."""
        return self.coords_bound(params)(q)

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        return (self._inertia, self.params), (
            self.coords, self.potential, self._n, self.name,
            self.jacobian_fn, self.mass_matrix_fn, self.dtdq_fn,
            self.pallas_step, self.inertia_fn, self._params_ndim,
            self.fused_forms,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (coords, potential, n, name, jacobian_fn, mass_matrix_fn, dtdq_fn,
         pallas_step, inertia_fn, params_ndim, fused_forms) = aux
        (inertia, params) = children
        obj = cls.__new__(cls)
        obj._inertia = inertia
        obj.params = params
        obj.inertia_fn = inertia_fn
        obj._params_ndim = params_ndim
        obj.coords = coords
        obj.potential = potential
        obj._n = n
        obj.name = name
        obj.jacobian_fn = jacobian_fn
        obj.mass_matrix_fn = mass_matrix_fn
        obj.dtdq_fn = dtdq_fn
        obj.pallas_step = pallas_step
        obj.fused_forms = fused_forms
        return obj

    def replace_params(self, params) -> "System":
        """A copy of this system with new ``params`` (same structure; leaves
        may carry extra leading batch axes — the sweep entry point)."""
        if self.params is None:
            raise ValueError(f"system {self.name!r} carries no params")
        params = jax.tree_util.tree_map(jnp.asarray, params)
        old_def = jax.tree_util.tree_structure(self.params)
        new_def = jax.tree_util.tree_structure(params)
        if new_def != old_def:
            raise ValueError(
                f"replace_params: new params structure {new_def} does not "
                f"match the system's {old_def} — every construction-time "
                f"leaf must be present (batch axes go on the leaves, not "
                f"the structure)"
            )
        children, aux = self.tree_flatten()
        new = type(self).tree_unflatten(aux, (children[0], params))
        new.param_batch_ndim()  # validate leaf-batching consistency now
        return new

    def __repr__(self) -> str:
        return f"System(name={self.name!r}, m={self.m}, n={self._n})"


jax.tree_util.register_pytree_node(
    System,
    lambda s: s.tree_flatten(),
    System.tree_unflatten,
)


def mk_system(
    inertia,
    coords: Callable[..., jax.Array],
    potential: Callable[..., jax.Array],
    *,
    n: Optional[int] = None,
    name: str = "system",
    jacobian_fn: Optional[Callable[..., jax.Array]] = None,
    mass_matrix_fn: Optional[Callable[..., jax.Array]] = None,
    dtdq_fn: Optional[Callable[..., jax.Array]] = None,
    pallas_step: Optional[Callable[..., object]] = None,
    params=None,
    inertia_fn: Optional[Callable[..., jax.Array]] = None,
    fused_forms: Optional[Callable[..., object]] = None,
) -> System:
    """Create a system from generalized-coordinate data.

    Analog of reference ``mkSystem`` (``Numeric/Hamilton.hs:201-233``):

    Args:
      inertia: ``(m,)`` vector — mass for linear coordinates, rotational
        inertia for angular ones (``:204-208``).  Pass ``None`` with
        ``inertia_fn`` to derive it from ``params`` instead.
      coords: pure traceable map from generalized positions ``(n,)`` to
        Cartesian positions ``(m,)`` (``:209-212``); with ``params`` given,
        called as ``coords(q, params)``.
      potential: potential energy as a function of *generalized* positions
        ``(n,) -> scalar`` (``:213-215``); with ``params``,
        ``potential(q, params)``.
      n: optional declared generalized dimension (runtime-checked on use).
      name: label for diagnostics.
      jacobian_fn: optional analytic ``(n,)[, params] -> (m, n)`` Jacobian of
        ``coords``, replacing the ``jacfwd`` derivation on the hot path (the
        reference always derives via AD; this is the standard hand-derived
        escape hatch — it must equal the AD Jacobian, which is cheap to
        unit-test via ``jax.jacfwd(coords)``).
      mass_matrix_fn: optional analytic ``(n,)[, params] -> (n, n)``
        generalized mass matrix ``K(q) = J(q)ᵀ M J(q)``.  When given, the
        dynamics form K directly — O(n²) elementwise ops instead of
        materializing the (m, n) Jacobian and contracting (the dominant HBM
        traffic of the ensemble hot loop; docs/design.md "Round-2 hot-loop
        reductions").  Must equal ``JᵀMJ`` (unit-tested for bundled models).
      dtdq_fn: optional analytic ``(q, w[, params]) -> (n,)`` kinetic-energy
        gradient ``∂T/∂q`` at *fixed generalized velocity* ``w = q̇``, i.e.
        ``½ ∂(wᵀK(q)w)/∂q``.  The dynamics use ``∂H/∂q = ∇U − ∂T/∂q|_w``
        (the standard Legendre identity), so an override here replaces the
        reverse-over-forward AD sweep of ``hamEqs`` — the dominant cost of
        the factored leapfrog step (three sweeps/step; docs/design.md
        "Round-2 hot-loop reductions").  Must equal the AD sweep
        (unit-tested for bundled models).
      params: optional pytree of physics-parameter arrays.  When given, ALL
        the functions above take it as a trailing argument, and parameter
        sweeps become first-class: leaves may later carry extra leading
        batch axes (via :meth:`System.replace_params` or ``tree_map``) and
        the mechanics evaluate the ensemble with per-member parameters.
        Without ``params``, constants closed over in the functions are
        invisible to pytree edits — do NOT tree-map ``inertia`` on such a
        system expecting the potential/overrides to follow.
      inertia_fn: optional ``params -> (m,)`` derivation of the inertia
        vector, keeping it in sync with swept parameters by construction.
      fused_forms: optional ``system -> FusedForms`` factory declaring the
        system's closed-form family contract with the fused whole-step
        kernel (ops/pallas_step.py) — enables ``method="leapfrog_fused"``
        (and the order-4 fused compositions) plus the double-f32 drift
        sampler.  Called with the LIVE system, so parameter edits and
        sweeps reach the kernel's coefficient tables.
    """
    system = System(
        inertia, coords, potential, n=n, name=name, jacobian_fn=jacobian_fn,
        mass_matrix_fn=mass_matrix_fn, dtdq_fn=dtdq_fn,
        pallas_step=pallas_step, params=params, inertia_fn=inertia_fn,
        fused_forms=fused_forms,
    )
    if n is not None:
        _validate_system(system, n)
    return system


def _validate_system(system: System, n: int) -> None:
    """Shape-check the user functions with ``jax.eval_shape`` (no FLOPs, no
    tracing side effects beyond shape propagation) — the runtime analog of
    the reference's type-level dimension checking (SURVEY.md §2.3)."""
    import jax

    if system.inertia_fn is not None:
        try:
            i_out = jax.eval_shape(system.inertia_fn, system.params)
        except Exception as e:
            raise ValueError(f"inertia_fn failed shape tracing: {e}") from e
        if len(i_out.shape) != 1:
            raise ValueError(
                f"inertia_fn must return a rank-1 (m,) vector, got shape "
                f"{tuple(i_out.shape)}"
            )
        dtype = i_out.dtype
    else:
        dtype = system.inertia.dtype
    probe = jax.ShapeDtypeStruct((n,), dtype)

    def shape_of(fn, *args):
        if system.has_params:
            return jax.eval_shape(fn, *args, system.params)
        return jax.eval_shape(fn, *args)

    try:
        out = shape_of(system.coords, probe)
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
        u_out = shape_of(system.potential, probe)
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
            j_out = shape_of(system.jacobian_fn, probe)
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
            k_out = shape_of(system.mass_matrix_fn, probe)
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
            d_out = shape_of(system.dtdq_fn, probe, probe)
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
    coords: Callable[..., jax.Array],
    potential_cart: Callable[..., jax.Array],
    *,
    n: Optional[int] = None,
    name: str = "system",
    jacobian_fn: Optional[Callable[..., jax.Array]] = None,
    mass_matrix_fn: Optional[Callable[..., jax.Array]] = None,
    dtdq_fn: Optional[Callable[..., jax.Array]] = None,
    pallas_step: Optional[Callable[..., object]] = None,
    params=None,
    inertia_fn: Optional[Callable[..., jax.Array]] = None,
    fused_forms: Optional[Callable[..., object]] = None,
) -> System:
    """Create a system with the potential stated in *Cartesian* coordinates.

    Analog of reference ``mkSystem'`` = ``mkSystem m f (u . f)``
    (``Numeric/Hamilton.hs:238-254``).  See :func:`mk_system` for
    ``jacobian_fn`` / ``mass_matrix_fn`` / ``dtdq_fn`` / ``params`` /
    ``inertia_fn`` / ``fused_forms``; with ``params`` given,
    ``potential_cart`` is called as ``potential_cart(x, params)``.
    ``pallas_step`` attaches a fully custom fused whole-step kernel factory
    (ops/pallas_step.py); ``fused_forms`` the declarative closed-form
    family contract.
    """
    if params is not None:
        potential = lambda q, p: potential_cart(coords(q, p), p)  # noqa: E731
    else:
        potential = lambda q: potential_cart(coords(q))  # noqa: E731
    system = System(
        inertia, coords, potential, n=n, name=name,
        jacobian_fn=jacobian_fn, mass_matrix_fn=mass_matrix_fn,
        dtdq_fn=dtdq_fn, pallas_step=pallas_step, params=params,
        inertia_fn=inertia_fn, fused_forms=fused_forms,
    )
    if n is not None:
        _validate_system(system, n)
    return system


def underlying_pos(system: System, q: jax.Array) -> jax.Array:
    """Convert generalized positions to underlying Cartesian positions.

    Analog of reference ``underlyingPos`` (``Numeric/Hamilton.hs:174-178``) —
    the only API consumer of the ``m`` dimension; used for plotting/drawing.
    Batched ``q`` is supported via vmap over the leading axes (with batched
    ``params`` aligned to the trailing batch axes, as everywhere).
    """
    from hamilton_tpu.mechanics import _map_member

    q = jnp.asarray(q)
    if q.ndim == 1 and system.param_batch_ndim() == 0:
        return system.underlying_pos(q)
    return _map_member(
        system, lambda qq, pp: system.underlying_pos(qq, params=pp), q
    )
