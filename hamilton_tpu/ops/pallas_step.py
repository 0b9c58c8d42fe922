"""Fused whole-step Pallas kernel: the closed-form family interface.

The tile-resident hot loop (:mod:`hamilton_tpu.ops.pallas_solve`) still pays
one HBM round-trip per *operation* — factor, five solves, three AD sweeps and
their elementwise glue each read and write (B, n)-to-(B, n²)-sized arrays.
At 16384×chain-20 that is ~0.95 ms/step while the arithmetic itself is worth
~60 µs: the step is pure memory traffic.

This module collapses the **entire generalized Störmer-Verlet step** into one
Pallas kernel for any system family whose physics admit *closed forms* — a
:class:`FusedForms` contract supplying, as tile arithmetic:

* the mass-matrix entries      ``K_ij(q)``
* the Hamiltonian q-gradient   ``∂H/∂q_k = ∇U_k(q) − ∂T/∂q_k|_w``
* (optionally) the potential   ``U(q)`` — used by the double-f32 drift sampler

from a small per-member *auxiliary tuple* (e.g. the sin/cos pairs of the
coordinates) plus per-family *coefficient tables* derived from the physical
parameters.  Built-in families: the planar serial chain (pendulum, double
pendulum, N-link chain — reference ``app/Examples.hs:61-183`` members plus
the BASELINE chain config, :func:`serial_chain_forms` here), and the
spherical-pendulum / two-body / spring / room forms defined alongside their
models (``hamilton_tpu/models/*.py`` — each ~30 lines, the template for user
systems; see ``docs/api.md`` "Joining the fused family").

The kernel keeps the whole step in registers/VMEM (batch-in-registers
layout, one (8, 128) tile per scalar — see pallas_solve.py); per step the
only HBM traffic is the (B, n) state in and out.  The fixed points are
warm-started from the previous step's converged force/velocity-derivative
(carried tiles), and inside ``steps_per_call`` blocks the end-of-step
factor+aux ride the Mosaic loop carry so only the first step of a block pays
the q₀ factorization (exact for ``iters_q ≥ 1``; see ``increments``).

**Parameters are first-class operands.**  When the physical parameters are
concrete unbatched values, the coefficient tables are baked into the kernel
as immediate scalars (the fastest mode, and the headline-bench path).  When
any of them is traced or carries a leading batch axis — a **parameter
sweep** — the tables are materialized per member as ``(G, len_t, 8, 128)``
tile operands computed once at ``init`` and carried alongside the state, so
a 16k (IC × mass-grid) ensemble runs through the same fused kernel with
per-member physics (the reference parameterizes every example,
``app/Examples.hs:195-359``; masses are plain data,
``Numeric/Hamilton.hs:201-215``).  Traced-but-unbatched (shared) parameters
get a single ``(1, …)`` tile group whose block-index map reuses block 0 for
every grid step, so gradients w.r.t. scalar masses don't pay B-fold
coefficient traffic.

**The fused step is differentiable.**  The kernel itself is an opaque Mosaic
program, so reverse-mode runs through an *exact replay*: a pure-jnp mirror
of the identical arithmetic (same closed forms, same fixed-point iteration
order, same factor carry) evaluated under ``jax.checkpoint`` inside the
backward pass.  ``jax.grad`` through the fused methods therefore matches the
library-path gradient (tested), including gradients with respect to the
per-member parameter tiles (mass/length/gravity sensitivities) and ``dt``.

The evolution state stays in tile layout **across steps** (the Stepper carry
is the tiled state), so chained steps move no layout at all; ``extract`` is
the only relayout and runs once per emission/drift sample.

This is an opt-in hot path: systems carrying closed forms attach a
``fused_forms`` factory (``System.fused_forms``, called with the live system
so the parameters come from ``System.params``) and callers select it with
``method="leapfrog_fused"`` (or the order-4 ``yoshida4_fused`` /
``suzuki4_fused`` compositions); the generic AD/library path stays the
default and the correctness reference (parity unit-tested in interpreter
mode).
"""

from __future__ import annotations

import types
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hamilton_tpu.state import Phase

__all__ = [
    "FusedForms",
    "FamilyFns",
    "fused_stepper",
    "serial_chain_forms",
    "serial_chain_forms_on",
    "serial_chain_forms_linv",
    "serial_chain_forms_mobius",
    "serial_chain_stepper",
    "concrete_vec",
    "concrete_scalar",
    "FM_JNP",
    "YOSHIDA4_COMPOSITION",
    "SUZUKI4_COMPOSITION",
]

TILE_B = 8 * 128

# Yoshida/Suzuki triple jump over a symmetric order-2 base: raises to order 4
_GAMMA = 2.0 ** (1.0 / 3.0)
YOSHIDA4_COMPOSITION = (
    1.0 / (2.0 - _GAMMA), -_GAMMA / (2.0 - _GAMMA), 1.0 / (2.0 - _GAMMA),
)

# Suzuki's 5-stage fractal composition (Suzuki 1990), also order 4 over a
# symmetric order-2 base.  Two more substeps than the triple jump, but every
# |w| ≤ 0.42 where the triple jump's middle substep runs |w0| ≈ 1.70 — the
# per-substep fixed-point contraction (∝ |w·dt|) is ~4× milder, so even the
# predictor-factor (2, 0) schedule converges where the triple jump needs
# (3, 2): measured at full horizon 48.9e6 member-steps/s @ 3.17e-7 drift,
# the order-4 Pareto point ((1, 1) over-drifts at 1.91e-6 — docs/design.md
# round-4 "a cheap fused order 4").
_S5 = 1.0 / (4.0 - 4.0 ** (1.0 / 3.0))
SUZUKI4_COMPOSITION = (_S5, _S5, 1.0 - 4.0 * _S5, _S5, _S5)


def _suffix_sums(xs):
    out, acc = [], 0.0
    for x in reversed(xs):
        acc += float(x)
        out.append(acc)
    return list(reversed(out))


def _to_tiles(x: jax.Array) -> jax.Array:
    """(B, k) → (G, k, 8, 128) with member b = g·1024 + s·128 + l."""
    b, k = x.shape
    return jnp.moveaxis(x.reshape(b // TILE_B, 8, 128, k), 3, 1)


def _from_tiles(xt: jax.Array) -> jax.Array:
    """(G, k, 8, 128) → (B, k)."""
    g, k = xt.shape[0], xt.shape[1]
    return jnp.moveaxis(xt, 1, 3).reshape(g * TILE_B, k)


def concrete_vec(x, n: int):
    """``x`` as a list of n Python floats if it is concrete and unbatched,
    else None (→ runtime-operand mode).  Family-constructor helper."""
    if isinstance(x, jax.core.Tracer):
        return None
    if isinstance(x, (list, tuple)):
        if len(x) != n:
            raise ValueError(f"expected {n} per-link values, got {len(x)}")
        try:
            return [float(v) for v in x]
        except TypeError:
            return None
    if hasattr(x, "ndim"):
        if x.ndim != 1:
            return None
        try:
            import numpy as np

            return [float(v) for v in np.asarray(x)]
        except Exception:
            return None
    return None


def concrete_scalar(x):
    """``x`` as a Python float if concrete and unbatched, else None."""
    if isinstance(x, jax.core.Tracer):
        return None
    if isinstance(x, (int, float)):
        return float(x)
    if hasattr(x, "ndim"):
        if x.ndim != 0:
            return None
        try:
            return float(x)
        except Exception:
            return None
    return None


# backward-compatible private aliases (round-3 call sites / tests)
_concrete_vec = concrete_vec
_concrete_scalar = concrete_scalar


def _fm_full(v, like):
    """A coefficient as a value in the arithmetic domain of ``like``:
    Python floats broadcast to ``like``'s shape, everything else (already a
    tile / member column / DF pair) passes through."""
    if isinstance(v, (int, float)):
        return jnp.full_like(like, v)
    return v


#: The jnp math namespace handed to ``FusedForms.make`` on the kernel and
#: replay paths.  Families write their closed forms against this interface
#: (``fm.sin``/``cos``/``exp``/``sqrt``/``full``/``zero``) plus the ordinary
#: ``+ − * /`` operators, which makes the SAME family code evaluable in
#: double-f32 arithmetic (ops/df32.py swaps in a DF-valued namespace for the
#: high-precision drift sampler).
FM_JNP = types.SimpleNamespace(
    sin=jnp.sin,
    cos=jnp.cos,
    exp=jnp.exp,
    sqrt=jnp.sqrt,
    full=_fm_full,
    zero=lambda like: jnp.zeros_like(like),
)


class FamilyFns(NamedTuple):
    """The closed forms of one system family, in tile arithmetic.

    All callables receive/return *per-member values* — (8, 128) tiles inside
    the kernel, (B,) columns in the replay, DF pairs in the double-f32 drift
    sampler — and must only combine them with ``+ − * /`` and the ``fm``
    namespace they were built against (no ``jnp.`` calls, no shape access).

    ``aux(q)``
        The per-evaluation-point auxiliary tuple (length ``n_aux``, fixed)
        from the coordinate list ``q`` (length n) — e.g. the sin/cos pairs.
        Everything ``k_at`` needs must be derivable from ``aux`` + ``q``;
        the aux tuple rides the kernel's factor carry across steps.
    ``k_at(aux, q)``
        Returns an entry accessor ``(i, j) → K_ij`` for the SPD mass matrix
        (only ``j ≤ i`` is consulted).  Entries must be value-typed (use
        ``fm.full(coef, aux[0])`` for constant entries, ``fm.zero(aux[0])``
        for structural zeros).
    ``dhdq(aux, q, w)``
        The length-n list ``∂H/∂q_k = ∇U_k(q) − ∂T/∂q_k|_w`` with
        ``∂T/∂q_k|_w = ½ wᵀ(∂K/∂q_k)w`` evaluated at the velocity ``w``.
    ``potential(aux, q)``
        Optional: the scalar potential ``U(q)`` as a per-member value.  Not
        used by the kernel itself; powers the double-f32 energy-drift
        sampler (ops/df32.py) and the closed-form parity tests.
    ``factor_solve``
        Optional ``(factor, solve)`` pair replacing the generic in-register
        dense Cholesky with a *structure-exploiting* factorization:
        ``factor(aux, q) -> entries`` returns a flat tuple of per-member
        values (the opaque factorization state that rides the kernel's
        factor carry), and ``solve(entries, b) -> x`` applies K⁻¹ to the
        length-n list ``b``.  Both must be written in the same value
        arithmetic as the other callables.  When None the kernel runs the
        O(n³) dense path on ``k_at``.  (Used by the O(n) semiseparable
        serial-chain solver, :func:`serial_chain_forms_on`.)
    ``aux_shift``
        Optional ``aux_shift(aux, dq) -> aux'``: the aux tuple at ``q + dq``
        by FIRST-ORDER expansion from the aux at ``q`` (e.g. the trig
        rotation ``s' = s + dq·c``, ``c' = c − dq·s``).  The kernel uses it
        ONLY for the within-step refinement re-evaluations, where
        ``|dq| = O(dt²·q̈)`` makes the truncation error ``dq²/2 ≲ 1e-12`` —
        far below f32 resolution, so results are exact at working precision
        while each use replaces ``n_aux`` transcendentals with ~2·n_aux
        mul/adds.  The per-step BASE aux is always a fresh transcendental
        evaluation (no error accumulation across steps).  When None every
        aux evaluation calls ``aux``.
    """

    aux: Callable[..., tuple]
    k_at: Callable[..., Callable[[int, int], Any]]
    dhdq: Callable[..., list]
    potential: Optional[Callable[..., Any]] = None
    factor_solve: Optional[Tuple[Callable[..., tuple], Callable[..., list]]] = None
    aux_shift: Optional[Callable[..., tuple]] = None


@dataclass(frozen=True)
class FusedForms:
    """A system family's contract with the fused whole-step kernel.

    Constructed per *system instance* (typically by a ``System.fused_forms``
    factory reading the live ``System.params``), capturing the physical
    parameters either as baked immediates or as runtime coefficient tables:

    ``n``
        Generalized degrees of freedom (states are (B, n)).
    ``n_aux``
        Length of the auxiliary tuple ``FamilyFns.aux`` returns (static).
    ``coef_lens``
        Flat length of each coefficient table.  The entry accessors handed
        to ``make`` index these tables: ``at[t](i)`` is entry ``i`` of table
        ``t`` (a Python float when the parameters were concrete, a
        per-member value otherwise).
    ``consts``
        The tables as tuples of Python floats when every physical parameter
        is concrete and unbatched (the immediate-constant kernel mode), else
        None.
    ``arrays_fn``
        ``arrays_fn(dtype) → tuple[jax.Array]`` materializing each table as
        an array of shape ``lead + (coef_lens[t],)`` where ``lead`` is
        ``()`` (shared/traced parameters — a single broadcast tile group) or
        ``(B,)`` (a parameter sweep; must equal the state batch).  Only
        consulted when ``consts`` is None.
    ``make``
        ``make(at, fm) → FamilyFns``: build the closed forms against entry
        accessors ``at`` and math namespace ``fm`` (see :data:`FM_JNP`).
    ``name``
        For error messages.
    """

    n: int
    n_aux: int
    coef_lens: Tuple[int, ...]
    consts: Optional[Tuple[Tuple[float, ...], ...]]
    arrays_fn: Optional[Callable[[Any], Tuple[jax.Array, ...]]]
    make: Callable[..., FamilyFns]
    name: str = "family"

    def const_accessors(self):
        """Entry accessors over the baked tables (static mode only)."""
        return tuple(
            (lambda i, t=t: self.consts[t][i]) for t in range(len(self.coef_lens))
        )


def fused_stepper(
    forms: FusedForms,
    *,
    iters=(3, 1),
    compensated: bool = False,
    steps_per_call: int = 1,
    composition=(1.0,),
    group_unroll: int = 1,
):
    """Build a fused whole-step leapfrog :class:`Stepper` from a family's
    :class:`FusedForms`.

    ``group_unroll`` processes that many 1024-member tile groups per kernel
    instance (block shape ``(u, n, 8, 128)``, grid ``B/1024/u``): every
    per-member value becomes ``u`` independent vector registers flowing
    through the same instruction stream, which hides the latency of
    *sequential* arithmetic chains — built for the O(n) semiseparable
    solver, whose ~25n-deep recursions are dependency-bound where the dense
    Cholesky's O(n³) supplies its own ILP.  Per-lane results are bitwise
    identical for any value (elementwise ops never mix lanes); the batch
    must be a multiple of ``1024·group_unroll``.

    ``iters=(iters_p, iters_q)`` are the momentum/position fixed-point
    counts, both *exact* (fresh in-register factorization per iterate);
    ``iters_q=0`` selects the predictor-factor (Gauss-Seidel) placement
    matching the library's mode.  State batches must be ``(B, n)`` with
    ``B`` a multiple of 1024.

    ``steps_per_call`` executes that many consecutive dt-steps inside ONE
    kernel invocation (a Mosaic-level ``fori_loop`` whose carry lives in
    registers/VMEM), and the resulting ``Stepper`` reports it as
    ``.substeps`` so evolution drivers keep step counts and drift-sampling
    cadence aligned.  Its value comes from the **factor carry**: steps
    1..S−1 of a block skip the q₀ aux+factorization entirely (see
    ``increments``), measured 0.114 → 0.088 ms/step at 16384×chain-20 with
    S=50.  (Raw per-kernel-call launch cost inside a compiled loop is
    negligible on this backend — the ~25 ms fixed cost is per *jit
    dispatch* through the device relay, which long-chunk drivers
    amortize.)

    ``composition`` is a tuple of dt-scale coefficients executed as
    consecutive substeps *inside* each dt-step — ``(1.0,)`` is plain
    Verlet; :data:`YOSHIDA4_COMPOSITION` / :data:`SUZUKI4_COMPOSITION`
    yield 4th-order methods with the factor carried across substeps (the
    warm quantities are physical, so their dt-scaling survives the sign
    alternation).
    """
    from hamilton_tpu.integrators.fixed import Stepper, _kahan_add  # no cycle

    n = forms.n
    n_aux = forms.n_aux
    iters_p, iters_q = iters if isinstance(iters, tuple) else (iters, iters)
    if iters_p < 1:
        raise ValueError("fused leapfrog needs iters_p >= 1")
    if iters_q < 0:
        raise ValueError(
            f"iters_q must be >= 0 (0 selects the predictor-factor mode), "
            f"got {iters_q}"
        )
    composition = tuple(float(w) for w in composition)
    u_grp = int(group_unroll)
    if u_grp < 1:
        raise ValueError(f"group_unroll must be >= 1, got {group_unroll}")

    static_mode = forms.consts is not None
    n_par = 0 if static_mode else len(forms.coef_lens)

    # reuse the unrolled tile-entry factor/solve bodies from pallas_solve
    from hamilton_tpu.ops.pallas_solve import _chol_entries, _solve_entries

    def make_increments(fam: FamilyFns):
        aux_fn, k_at, dhdq = fam.aux, fam.k_at, fam.dhdq
        if fam.factor_solve is not None:
            # structure-exploiting path (e.g. the O(n) semiseparable chain
            # solver): the family owns the factorization representation
            factor_fn, solve_fn = fam.factor_solve
        else:
            # generic dense path: unrolled in-register Cholesky over k_at
            # entries, packed as a flat tuple (loop-carryable tile tuple)
            def factor_fn(aux_v, q):
                low, inv_d = _chol_entries(k_at(aux_v, q), n)
                return tuple(
                    low[(i, j)] for i in range(n) for j in range(i + 1)
                ) + tuple(inv_d)

            def solve_fn(ent, b):
                low, k = {}, 0
                for i in range(n):
                    for j in range(i + 1):
                        low[(i, j)] = ent[k]
                        k += 1
                return _solve_entries(
                    low, list(ent[k:]), lambda i: b[i], n
                )

        def increments(q0, p0, a_est, vdot_est, dt, half, fac0=None):
            """Lists of per-member values → (dq_inc, dp_inc, warm', fac1).

            ``(a_est, vdot_est)`` warm-start the two fixed points from the
            previous step's converged force / velocity derivative, exactly as
            the library stepper does (fixed.py): the fixed *points* are
            unchanged, only the residual after the static iteration counts
            shrinks — measured on-TPU f32 drift at 16384×chain-20, 1e4 steps:
            cold (3,1) 6.7e-7 vs warm (3,1) at the converged level (the cold
            residual dominates the Kahan-compensated rounding floor).

            ``fac0``, when given, replaces the q₀ aux+factorization with the
            previous step's end-of-step factor and aux (``fac1``): for
            ``iters_q ≥ 1`` the carried factor was computed at exactly this
            q₀ (the converged q₁) so the substitution is EXACT; for
            ``iters_q=0`` it is the predictor factor, consistently stale by
            O(dt³) — the same placement the library's Gauss-Seidel mode runs,
            measured at converged drift.  Used inside multi-step blocks,
            where the carry lives in VMEM (through HBM it would cost more
            than it saves)."""
            if fac0 is not None:
                ent0, aux0 = fac0
            else:
                aux0 = aux_fn(q0)
                ent0 = factor_fn(aux0, q0)
            ph = [p0[i] - half * a_est[i] for i in range(n)]
            a_last = a_est
            for _ in range(iters_p):
                w = solve_fn(ent0, ph)
                a_last = dhdq(aux0, q0, w)
                ph = [p0[i] - half * a_last[i] for i in range(n)]
            v0 = solve_fn(ent0, ph)
            q1 = [q0[i] + dt * v0[i] + (dt * half) * vdot_est[i]
                  for i in range(n)]  # warm predictor
            v_last = v0
            # within-step aux re-evaluations sit O(dt²·q̈) from the last
            # fresh evaluation — when the family provides aux_shift, derive
            # them by first-order expansion (replaces n_aux transcendentals
            # per re-evaluation, ~40% of the kernel's per-step
            # transcendental budget at (2,0)).  f32 ONLY: the shift's
            # dq²/2 ≈ 1e-12 truncation is far below f32 resolution but
            # visible at f64, where the kernel's value is exact parity,
            # not throughput.
            shift = fam.aux_shift
            if shift is not None and jnp.result_type(q0[0]) != jnp.float32:
                shift = None

            def aux_at(q_new, q_base, aux_base):
                if shift is None:
                    return aux_fn(q_new)
                return shift(
                    aux_base, [q_new[i] - q_base[i] for i in range(n)]
                )

            if iters_q == 0:
                # predictor-factor placement (cf. fixed.py Gauss-Seidel
                # mode): one factor at the O(dt²) predictor serves the
                # q-refinement and the end-of-step force
                aux1 = aux_fn(q1)
                ent1 = factor_fn(aux1, q1)
                v_last = solve_fn(ent1, ph)
                q1p, q1 = q1, [
                    q0[i] + half * (v0[i] + v_last[i]) for i in range(n)
                ]
                # force at the refined q1 with the predictor factor velocity
                aux1r = aux_at(q1, q1p, aux1)
                b = dhdq(aux1r, q1, v_last)
                fac1 = (tuple(ent1), tuple(aux1r))
            else:
                q1p, aux1 = None, None
                for _ in range(iters_q):
                    aux1 = aux_fn(q1) if aux1 is None else aux_at(
                        q1, q1p, aux1
                    )
                    q1p = q1
                    ent1 = factor_fn(aux1, q1)
                    v_last = solve_fn(ent1, ph)
                    q1 = [q0[i] + half * (v0[i] + v_last[i]) for i in range(n)]
                # exact end-of-step factor at the converged q1
                aux1 = aux_at(q1, q1p, aux1)
                ent1 = factor_fn(aux1, q1)
                w1 = solve_fn(ent1, ph)
                b = dhdq(aux1, q1, w1)
                fac1 = (tuple(ent1), tuple(aux1))
            dq_inc = [half * (v0[i] + v_last[i]) for i in range(n)]
            dp_inc = [-half * (a_last[i] + b[i]) for i in range(n)]
            inv_dt = 1.0 / dt
            vdot1 = [(v_last[i] - v0[i]) * inv_dt for i in range(n)]
            return dq_inc, dp_inc, b, vdot1, fac1

        return increments

    if static_mode:
        increments_static = make_increments(
            forms.make(forms.const_accessors(), FM_JNP)
        )

    def build_step_once(increments, dt, half):
        """One dt-step body (runs the composition substeps), with or without
        Kahan-compensated accumulation; state entries are per-member values
        (tiles in the kernel, columns in the replay)."""
        if not compensated:

            def step_once(state, fac):
                qs, ps, avs, vds = state
                for w in composition:
                    dq, dp, b, vd1, fac = increments(
                        list(qs), list(ps), list(avs), list(vds),
                        w * dt, w * half, fac0=fac,
                    )
                    qs = tuple(qs[i] + dq[i] for i in range(n))
                    ps = tuple(ps[i] + dp[i] for i in range(n))
                    avs, vds = tuple(b), tuple(vd1)
                return (qs, ps, avs, vds), fac

            return step_once

        def step_once(state, fac):
            qs, ps, cqs, cps, avs, vds = state
            for w in composition:
                dq, dp, b, vd1, fac = increments(
                    list(qs), list(ps), list(avs), list(vds),
                    w * dt, w * half, fac0=fac,
                )
                new_q, new_cq, new_p, new_cp = [], [], [], []
                for i in range(n):
                    qi, cqi = _kahan_add(qs[i], cqs[i], dq[i])
                    pi, cpi = _kahan_add(ps[i], cps[i], dp[i])
                    new_q.append(qi)
                    new_cq.append(cqi)
                    new_p.append(pi)
                    new_cp.append(cpi)

                qs, ps = tuple(new_q), tuple(new_p)
                cqs, cps = tuple(new_cq), tuple(new_cp)
                avs, vds = tuple(b), tuple(vd1)
            return (qs, ps, cqs, cps, avs, vds), fac

        return step_once

    n_sv = 6 if compensated else 4  # state vectors per member

    class _View:
        # u_grp == 1 reads (8, 128) tiles from (1, k, 8, 128) blocks; with
        # unrolled groups the leading block axis stays in the value —
        # (u, 8, 128) (or (1, 8, 128) for shared-param blocks, which
        # broadcast) — giving u independent register streams per op
        def __init__(self, ref):
            self._ref = ref

        def __getitem__(self, i):
            return self._ref[0, i] if u_grp == 1 else self._ref[:, i]

        def __setitem__(self, i, val):
            if u_grp == 1:
                self._ref[0, i] = val
            else:
                self._ref[:, i] = val

    def _multi(step_once, state):
        """Run ``steps_per_call`` step bodies; the carry (a tuple of tile
        tuples) stays in registers/VMEM across the Mosaic-level loop.

        Step 0 is peeled (no carried factor at block entry — carrying it
        through HBM between dispatches would cost more than it saves);
        steps 1..S−1 run in a Mosaic-level ``fori_loop`` whose carry
        includes the end-of-step factor+aux, so they skip the q₀
        aux+factorization entirely."""
        state, fac = step_once(state, None)
        if steps_per_call == 1:
            return state
        out = jax.lax.fori_loop(
            0, steps_per_call - 1,
            lambda i, sf: step_once(sf[0], sf[1]), (state, fac),
        )
        return out[0]

    def kernel(*refs):
        # refs: dt, [coefficient tables,] n_sv state-in, n_sv state-out
        dt = refs[0][...]
        half = dt * 0.5
        if static_mode:
            increments = increments_static
        else:
            views = [_View(refs[1 + t]) for t in range(n_par)]
            at = tuple((lambda i, v=v: v[i]) for v in views)
            increments = make_increments(forms.make(at, FM_JNP))
        in_views = [_View(r) for r in refs[1 + n_par: 1 + n_par + n_sv]]
        out_views = [_View(r) for r in refs[1 + n_par + n_sv:]]
        step_once = build_step_once(increments, dt, half)
        state = tuple(
            tuple(r[i] for i in range(n)) for r in in_views
        )
        state = _multi(step_once, state)
        for vi, r in enumerate(out_views):
            for i in range(n):
                r[i] = state[vi][i]

    def _call(dt_tile, ops):
        g = ops[n_par].shape[0]
        if g % u_grp != 0:
            raise ValueError(
                f"batch of {g} tile groups not divisible by "
                f"group_unroll={u_grp} (batch must be a multiple of "
                f"{TILE_B * u_grp})"
            )

        def vec_spec(k, shared=False):
            # ``shared``: a single-group operand (params identical for every
            # member) — every grid step reads block 0 instead of carrying
            # B-fold redundant per-member copies through HBM
            if shared:
                return pl.BlockSpec(
                    (1, k, 8, 128), lambda gg: (gg * 0,) * 4,
                    memory_space=pltpu.VMEM,
                )
            return pl.BlockSpec(
                (u_grp, k, 8, 128), lambda gg: (gg, gg * 0, gg * 0, gg * 0),
                memory_space=pltpu.VMEM,
            )

        dt_spec = pl.BlockSpec(
            (8, 128), lambda gg: (gg * 0, gg * 0), memory_space=pltpu.VMEM
        )
        param_specs = [
            vec_spec(forms.coef_lens[t], ops[t].shape[0] == 1)
            for t in range(n_par)
        ]
        state_specs = [vec_spec(n)] * n_sv

        def sds(t):
            # propagate the varying-across-mesh-axes set so the kernel
            # composes with shard_map (check_vma requires it on out_shape)
            vma = getattr(jax.typeof(t), "vma", None)
            if vma is not None:
                return jax.ShapeDtypeStruct((g, n, 8, 128), t.dtype, vma=vma)
            return jax.ShapeDtypeStruct((g, n, 8, 128), t.dtype)

        out_shapes = tuple(sds(t) for t in ops[n_par:])
        extra = {}
        if u_grp > 4 or u_grp * n > 80:
            # the per-instance live set (u× state tuples + the factor carry,
            # which for the semiseparable chain is ~5n (8,128) tiles per
            # group) outgrows Mosaic's default 16 MiB scoped-VMEM budget
            # past u·n ≈ 80 (u=8 at chain-20, u=4 at chain-40); raise the
            # cap toward the physical 128 MiB, keeping headroom for the
            # grid pipeline's double buffers
            extra["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        return pl.pallas_call(
            kernel,
            grid=(g // u_grp,),
            in_specs=[dt_spec] + param_specs + state_specs,
            out_specs=tuple(state_specs),
            out_shape=out_shapes,
            **extra,
        )(dt_tile, *ops)

    def _replay(dt_tile, *ops):
        """Pure-jnp mirror of the kernel: identical arithmetic on (B,)
        member columns, used as the reverse-mode path (``jax.checkpoint``-ed
        per step so the backward memory is O(steps) small residuals, not the
        full unrolled block).  Forward-executing this instead of the kernel
        reproduces the kernel's math exactly (same operation order)."""
        state_tiles = ops[n_par:]
        arrays = [_from_tiles(t) for t in state_tiles]  # (B, n)
        b = arrays[0].shape[0]
        if static_mode:
            increments = increments_static
        else:
            all_cols = []
            for t in range(n_par):
                cols = _from_tiles(ops[t])  # (B, len_t) — or (1024, …) shared
                if cols.shape[0] != b:
                    # shared single-group operands: every lane holds the same
                    # value; keep lane 0 as a length-1 column that broadcasts
                    # over members (its cotangent lands in lane 0, and init's
                    # broadcast_to sums lanes, so parameter grads are exact)
                    cols = cols[:1]
                all_cols.append(cols)
            at = tuple(
                (lambda i, c=c: c[:, i]) for c in all_cols
            )
            increments = make_increments(forms.make(at, FM_JNP))
        # per-member dt: the kernel multiplies the (8, 128) dt tile
        # elementwise into every member lane (shared across groups)
        dt_col = jnp.broadcast_to(
            dt_tile.reshape(1, TILE_B), (b // TILE_B, TILE_B)
        ).reshape(b)
        half = dt_col * 0.5
        step_once = build_step_once(increments, dt_col, half)
        state = tuple(
            tuple(a[:, i] for i in range(n)) for a in arrays
        )
        import os

        # Loop strategy for steps 1..S-1 of the replay.  Default is an
        # UNROLLED chain of checkpointed steps: reverse-differentiating a
        # lax.scan of this body never finished compiling through this
        # environment's remote TPU compile service (>20 min observed at
        # spc=5, chain-4 — both with and without per-step checkpoint),
        # while the unrolled chain compiles in ~1 min and the checkpoint
        # keeps backward memory at one step's activations
        # (docs/design.md round-3).  HAMILTON_REPLAY_LOOP selects
        # "scan"/"scan_ckpt" for backends where reverse-scan compiles fine.
        strategy = os.environ.get("HAMILTON_REPLAY_LOOP", "unroll_ckpt")
        state, fac = jax.checkpoint(lambda st: step_once(st, None))(state)
        if steps_per_call > 1:
            if strategy == "unroll_ckpt":
                step_ck = jax.checkpoint(step_once)
                for _ in range(steps_per_call - 1):
                    state, fac = step_ck(state, fac)
            else:
                def body(carry, _):
                    st, fc = carry
                    st, fc = step_once(st, fc)
                    return (st, fc), None

                if strategy == "scan_ckpt":
                    body = jax.checkpoint(body)
                (state, fac), _ = jax.lax.scan(
                    body, (state, fac), None, length=steps_per_call - 1,
                )
        outs = tuple(
            _to_tiles(jnp.stack(cols, axis=1)) for cols in state
        )
        return outs

    # Reverse-mode: custom VJP whose backward pass differentiates the exact
    # replay.  The primal path stays the fused kernel; gradients flow to the
    # state, the dt tile, and (runtime mode) the coefficient tiles.
    @jax.custom_vjp
    def _kernel_step(dt_tile, *ops):
        return _call(dt_tile, ops)

    def _kernel_step_fwd(dt_tile, *ops):
        return _call(dt_tile, ops), (dt_tile, ops)

    def _kernel_step_bwd(res, g):
        dt_tile, ops = res
        _, vjp_fn = jax.vjp(_replay, dt_tile, *ops)
        return vjp_fn(tuple(g))

    _kernel_step.defvjp(_kernel_step_fwd, _kernel_step_bwd)

    def _check(ph: Phase):
        if ph.q.ndim != 2 or ph.q.shape[-1] != n:
            raise ValueError(
                f"fused {forms.name} stepper needs (B, {n}) states, got "
                f"{tuple(ph.q.shape)} (single trajectories and other "
                f"shapes: use the library leapfrog)"
            )
        if ph.q.shape[0] % (TILE_B * u_grp) != 0:
            raise ValueError(
                f"fused stepper batch must be a multiple of "
                f"{TILE_B * u_grp} (TILE_B × group_unroll), got "
                f"{ph.q.shape[0]} (use the library leapfrog for other shapes)"
            )

    def init(ph: Phase):
        _check(ph)
        qt, pt = _to_tiles(ph.q), _to_tiles(ph.p)
        z = jnp.zeros_like(qt)
        # trailing (a_est, vdot_est) warm-start carries, zero-initialized
        # (≡ the cold start; see `increments`)
        if not compensated:
            state = (qt, pt, z, z)
        else:
            state = (qt, pt, z, jnp.zeros_like(pt), z, z)
        if static_mode:
            return state
        # runtime-parameter mode: materialize the coefficient tables once;
        # they ride the carry (read-only) so chunked/resumed drivers keep
        # them with the state.  Unbatched (shared) params — e.g. gradients
        # w.r.t. scalar masses, or a system passed as a traced jit argument
        # — get ONE tile group reused by every grid step instead of B-fold
        # per-member copies.
        b = ph.q.shape[0]
        tables = forms.arrays_fn(ph.q.dtype)
        if len(tables) != n_par:
            raise ValueError(
                f"{forms.name}: arrays_fn returned {len(tables)} tables, "
                f"declared {n_par}"
            )
        if all(t.ndim == 1 for t in tables):
            ops = tuple(
                _to_tiles(jnp.broadcast_to(
                    t.reshape(1, ln), (TILE_B, ln)
                ))
                for t, ln in zip(tables, forms.coef_lens)
            )
        else:
            # per coefficient table: unbatched replicates across members
            # (as the library path's broadcast of shared params does), a
            # leading batch axis must EQUAL the state batch — the library
            # path (the fused path's correctness reference) vmaps members
            # pairwise and rejects size-1 broadcasting, so accepting it
            # here would silently break the parity contract
            def member_rows(arr, flat, tag):
                lead = arr.shape[:-1]
                if arr.shape[-1] != flat:
                    raise ValueError(
                        f"{forms.name}: coefficient table {tag} has flat "
                        f"length {arr.shape[-1]}, declared {flat}"
                    )
                if lead == ():
                    return jnp.broadcast_to(arr.reshape(1, flat), (b, flat))
                if lead != (b,):
                    raise ValueError(
                        f"batched {forms.name} parameters must carry a "
                        f"leading batch axis equal to the state batch ({b}); "
                        f"got table {tag} shape {tuple(arr.shape)} "
                        f"(broadcast size-1 axes explicitly, as the library "
                        f"path requires)"
                    )
                return arr.reshape(b, flat)

            ops = tuple(
                _to_tiles(member_rows(t, ln, ti))
                for ti, (t, ln) in enumerate(
                    zip(tables, forms.coef_lens)
                )
            )
        return state + ops

    def step(carry, dt):
        if static_mode:
            tiles, params = carry, ()
        else:
            tiles, params = carry[:n_sv], carry[n_sv:]
        dt_tile = jnp.full((8, 128), dt, carry[0].dtype)
        out = _kernel_step(dt_tile, *params, *tiles)
        return tuple(out) + tuple(params) if n_par else tuple(out)

    def extract(carry):
        return Phase(_from_tiles(carry[0]), _from_tiles(carry[1]))

    order = 2 if composition == (1.0,) else 4  # symmetric compositions
    return Stepper(init, step, extract, order=order, symplectic=True,
                   substeps=steps_per_call)


# ----------------------------------------------------------------------
# The planar serial-chain family (pendulum, double pendulum, N-link chain)
# ----------------------------------------------------------------------


def serial_chain_forms(masses, lengths, gravity) -> FusedForms:
    """:class:`FusedForms` for the planar serial linkage family (pendulum,
    double pendulum, N-link chain — reference ``app/Examples.hs:61-183``
    members plus the BASELINE chain config), whose closed forms make every
    per-step quantity computable from ``2n`` transcendentals and per-link
    coefficients:

    * mass matrix      ``K_ij(q)   = l_i·l_j·cos(θ_i−θ_j)·S_max(i,j)``
    * potential grad   ``∇U_i(q)   = g·l_i·sin(θ_i)·S_i``
    * kinetic gradient ``∂T/∂θ_k|w = −l_k·w_k·Σ_j l_j·sin(θ_k−θ_j)·S_kj·w_j``
    * potential        ``U(q)      = Σ_i g·l_i·S_i·(1 − cos θ_i)``

    with ``S_r = Σ_{k≥r} m_k`` the suffix mass sums.  All pairwise
    ``sin/cos(θ_i−θ_j)`` come from the ``n`` sin/cos pairs by the
    angle-subtraction identities — vector FMAs, not transcendentals.

    Coefficient tables: ``C_ij = l_i·l_j·S_max(i,j)`` (flat n²) and
    ``g·l_i·S_i`` (n).
    """
    if isinstance(masses, (list, tuple)):
        n = len(masses)
    else:
        n = int(masses.shape[-1])
    n_len = len(lengths) if isinstance(lengths, (list, tuple)) else int(
        lengths.shape[-1]
    )
    if n_len != n:
        raise ValueError(f"need {n} lengths, got {n_len}")

    m_c = concrete_vec(masses, n)
    l_c = concrete_vec(lengths, n)
    g_c = concrete_scalar(gravity)
    consts = None
    if m_c is not None and l_c is not None and g_c is not None:
        suff = _suffix_sums(m_c)  # S_r
        consts = (
            tuple(
                l_c[i] * l_c[j] * suff[max(i, j)]
                for i in range(n) for j in range(n)
            ),
            tuple(g_c * l_c[i] * suff[i] for i in range(n)),
        )

    def arrays_fn(dtype):
        """Runtime mode: the flat coefficient tables from the (possibly
        traced/batched) parameters."""
        m_ = jnp.asarray(masses).astype(dtype)
        l_ = jnp.asarray(lengths).astype(dtype)
        g_ = jnp.asarray(gravity).astype(dtype)
        suffix = jnp.cumsum(m_[..., ::-1], axis=-1)[..., ::-1]  # S_r
        # S_max(i,j) = min(S_i, S_j): the suffix sums are non-increasing
        smax = jnp.minimum(suffix[..., :, None], suffix[..., None, :])
        cmat = l_[..., :, None] * l_[..., None, :] * smax
        gu = g_[..., None] * l_ * suffix
        cmat = cmat.reshape(cmat.shape[:-2] + (n * n,))
        # align leading batch axes: a batched table next to an unbatched one
        # is resolved by fused_stepper's member_rows (broadcast vs B-check)
        return cmat, gu

    def make(at, fm):
        cm = lambda i, j: at[0](i * n + j)  # noqa: E731
        gu_at = at[1]

        def aux(q):
            return tuple(fm.sin(qi) for qi in q) + tuple(
                fm.cos(qi) for qi in q
            )

        def k_at(aux_v, q):
            s, c = aux_v[:n], aux_v[n:]

            def at_(i, j):
                if i == j:
                    # cos(0)·C_ii exactly (not c²+s² with its rounding)
                    return fm.full(cm(i, i), s[0])
                return cm(i, j) * (c[i] * c[j] + s[i] * s[j])

            return at_

        def dhdq(aux_v, q, w):
            """∂H/∂q = ∇U − ∂T/∂q|_w, from the trig pairs at this q.

            Dot-product form: Σ_j C_kj·sin(θk−θj)·w_j = s_k·Σ_j C_kj·(c_j·w_j)
            − c_k·Σ_j C_kj·(s_j·w_j) — 4n²+O(n) vector ops instead of 6n²
            (the j=k term contributes s_k·C_kk·c_k·w_k to both sums and
            cancels exactly in real arithmetic; in floats it perturbs at the
            rounding level, below the integrator's own f32 noise)."""
            s, c = aux_v[:n], aux_v[n:]
            cw = [c[j] * w[j] for j in range(n)]
            sw = [s[j] * w[j] for j in range(n)]
            out = []
            for k in range(n):
                acc_c = cm(k, 0) * cw[0]
                acc_s = cm(k, 0) * sw[0]
                for j in range(1, n):
                    acc_c = acc_c + cm(k, j) * cw[j]
                    acc_s = acc_s + cm(k, j) * sw[j]
                out.append(
                    gu_at(k) * s[k] + w[k] * (s[k] * acc_c - c[k] * acc_s)
                )
            return out

        def potential(aux_v, q):
            """U(q) = Σ_i g·l_i·S_i·(1 − cos θ_i) — the chain's gravitational
            potential in the same zero convention as the model's cumsum
            coordinate map (y measured downward from the pivot)."""
            c = aux_v[n:]
            u = gu_at(0) * (1.0 - c[0])
            for i in range(1, n):
                u = u + gu_at(i) * (1.0 - c[i])
            return u

        return FamilyFns(aux, k_at, dhdq, potential,
                         aux_shift=_trig_aux_shift(n))

    return FusedForms(
        n=n, n_aux=2 * n, coef_lens=(n * n, n), consts=consts,
        arrays_fn=arrays_fn, make=make, name="serial_chain",
    )


def _trig_aux_shift(n):
    """First-order rotation of an (n sin, n cos) aux tuple: ``s' = s+dq·c``,
    ``c' = c−dq·s`` — exact to ``dq²/2`` (≪ f32 eps for the kernel's
    within-step ``|dq| = O(dt²·q̈)`` uses; see ``FamilyFns.aux_shift``)."""

    def aux_shift(aux_v, dq):
        s, c = aux_v[:n], aux_v[n:]
        return tuple(s[i] + dq[i] * c[i] for i in range(n)) + tuple(
            c[i] - dq[i] * s[i] for i in range(n)
        )

    return aux_shift


def serial_chain_forms_on(masses, lengths, gravity) -> FusedForms:
    """O(n) **semiseparable** variant of :func:`serial_chain_forms`.

    The chain's mass matrix is order-2 semiseparable: with suffix mass sums
    ``S_r = Σ_{k≥r} m_k`` and link vectors ``u_i = l_i·(cosθ_i, sinθ_i)``,

        ``K_ij = S_max(i,j) · (u_i · u_j)``,

    so in tip-to-base order ``K̃_ab = ũ_a · (S̃_b ũ_b)`` for ``a ≥ b`` —
    generator-representable below the diagonal.  That admits an **exact
    O(n) Cholesky** with a 2×2 running state ``P_j = Σ_{k<j} z_k z_kᵀ``:

        ``y_j = (S̃_j I − P_j) ũ_j``,  ``d_j = √(ũ_j·y_j)``,
        ``z_j = y_j / d_j``,          ``L_ij = ũ_i·z_j (i>j)``,

    and O(n) triangular solves with 2-vector accumulators — the structural
    reason Featherstone's articulated-body algorithm is O(n).  Per solve:
    ~25n flops to factor and ~18n per triangular pair, vs the dense path's
    O(n³)/O(n²); ``∂H/∂q`` likewise drops from 4n² to ~20n via
    prefix/suffix accumulators.  The factor carry shrinks from
    n(n+1)/2 + n to 5n per-member values, and the coefficient table from
    n² + n to 3n per-link entries ``(l_i, S_i, g·l_i·S_i)`` — parameter
    sweeps carry 3n-per-member tiles instead of n².

    Fixed points, iteration schedules, and warm starts are IDENTICAL to
    the dense family — only the linear-algebra representation changes —
    so trajectories agree to f64 rounding (tested); f32 drift at the full
    horizon is measured in bench extras before this variant is preferred.
    """
    if isinstance(masses, (list, tuple)):
        n = len(masses)
    else:
        n = int(masses.shape[-1])
    n_len = len(lengths) if isinstance(lengths, (list, tuple)) else int(
        lengths.shape[-1]
    )
    if n_len != n:
        raise ValueError(f"need {n} lengths, got {n_len}")

    m_c = concrete_vec(masses, n)
    l_c = concrete_vec(lengths, n)
    g_c = concrete_scalar(gravity)
    consts = None
    if m_c is not None and l_c is not None and g_c is not None:
        suff = _suffix_sums(m_c)  # S_r
        consts = (
            tuple(l_c) + tuple(suff)
            + tuple(g_c * l_c[i] * suff[i] for i in range(n)),
        )

    def arrays_fn(dtype):
        m_ = jnp.asarray(masses).astype(dtype)
        l_ = jnp.asarray(lengths).astype(dtype)
        g_ = jnp.asarray(gravity).astype(dtype)
        suffix = jnp.cumsum(m_[..., ::-1], axis=-1)[..., ::-1]  # S_r
        gu = g_[..., None] * l_ * suffix
        return (jnp.concatenate([l_, suffix, gu], axis=-1),)

    def make(at, fm):
        l_at = lambda i: at[0](i)            # noqa: E731  l_i
        s_at = lambda i: at[0](n + i)        # noqa: E731  S_i (suffix mass)
        gu_at = lambda i: at[0](2 * n + i)   # noqa: E731  g·l_i·S_i

        def aux(q):
            return tuple(fm.sin(qi) for qi in q) + tuple(
                fm.cos(qi) for qi in q
            )

        def k_at(aux_v, q):
            # dense-entry fallback (df32 H sampler, parity tests); the
            # kernel itself uses factor_solve below
            s, c = aux_v[:n], aux_v[n:]

            def at_(i, j):
                if i == j:
                    return fm.full(
                        l_at(i) * l_at(i) * s_at(i), s[0]
                    )
                hi = max(i, j)
                return (l_at(i) * l_at(j) * s_at(hi)) * (
                    c[i] * c[j] + s[i] * s[j]
                )

            return at_

        def factor(aux_v, q):
            """Semiseparable Cholesky, tip-to-base; returns the flat
            entries (z, 1/d, u per link in processing order)."""
            s, c = aux_v[:n], aux_v[n:]
            zxs, zys, ids, uxs, uys = [], [], [], [], []
            pxx = pxy = pyy = None  # 2×2 running state, starts at zero
            for a in range(n):
                i = n - 1 - a  # original link index, tip → base
                ux = l_at(i) * c[i]
                uy = l_at(i) * s[i]
                si = s_at(i)
                if pxx is None:
                    yx = si * ux
                    yy = si * uy
                else:
                    yx = si * ux - (pxx * ux + pxy * uy)
                    yy = si * uy - (pxy * ux + pyy * uy)
                d = fm.sqrt(ux * yx + uy * yy)
                inv_d = 1.0 / d
                zx = yx * inv_d
                zy = yy * inv_d
                if pxx is None:
                    pxx, pxy, pyy = zx * zx, zx * zy, zy * zy
                else:
                    pxx = pxx + zx * zx
                    pxy = pxy + zx * zy
                    pyy = pyy + zy * zy
                zxs.append(zx)
                zys.append(zy)
                ids.append(inv_d)
                uxs.append(ux)
                uys.append(uy)
            return tuple(zxs + zys + ids + uxs + uys)

        def solve(ent, b):
            """O(n) L Lᵀ x = b with 2-vector accumulators; ``b``/result in
            original (base-to-tip) link order."""
            zx, zy = ent[0:n], ent[n:2 * n]
            idv = ent[2 * n:3 * n]
            ux, uy = ent[3 * n:4 * n], ent[4 * n:5 * n]
            y = [None] * n
            sx = sy = None
            for a in range(n):
                bi = b[n - 1 - a]
                t = bi if sx is None else bi - (ux[a] * sx + uy[a] * sy)
                ya = t * idv[a]
                y[a] = ya
                if sx is None:
                    sx, sy = zx[a] * ya, zy[a] * ya
                else:
                    sx = sx + zx[a] * ya
                    sy = sy + zy[a] * ya
            x = [None] * n
            tx = ty = None
            for a in reversed(range(n)):
                t = y[a] if tx is None else y[a] - (zx[a] * tx + zy[a] * ty)
                xa = t * idv[a]
                x[n - 1 - a] = xa
                if tx is None:
                    tx, ty = ux[a] * xa, uy[a] * xa
                else:
                    tx = tx + ux[a] * xa
                    ty = ty + uy[a] * xa
            return x

        def dhdq(aux_v, q, w):
            """O(n): ∂H/∂θ_k = g·l_k·S_k·s_k + w_k·l_k·[s_k·A_k − c_k·B_k]
            with A_k = S_k·Σ_{j<k} l_j c_j w_j + Σ_{j≥k} S_j l_j c_j w_j
            (prefix/suffix accumulators; B_k the sin analog).  Same fixed
            point as the dense 4n² dot-product form — summation order
            differs at the rounding level only."""
            s, c = aux_v[:n], aux_v[n:]
            lw = [l_at(j) * w[j] for j in range(n)]
            lcw = [lw[j] * c[j] for j in range(n)]
            lsw = [lw[j] * s[j] for j in range(n)]
            # suffix sums Q_k = Σ_{j≥k} S_j·(l_j x_j)
            qc = [None] * n
            qs = [None] * n
            qc[n - 1] = s_at(n - 1) * lcw[n - 1]
            qs[n - 1] = s_at(n - 1) * lsw[n - 1]
            for k in range(n - 2, -1, -1):
                qc[k] = qc[k + 1] + s_at(k) * lcw[k]
                qs[k] = qs[k + 1] + s_at(k) * lsw[k]
            out = []
            pc = ps = None  # prefix sums Σ_{j<k} l_j x_j
            for k in range(n):
                if pc is None:
                    ak = qc[k]
                    bk = qs[k]
                else:
                    ak = s_at(k) * pc + qc[k]
                    bk = s_at(k) * ps + qs[k]
                out.append(
                    gu_at(k) * s[k] + w[k] * l_at(k) * (s[k] * ak - c[k] * bk)
                )
                if pc is None:
                    pc, ps = lcw[k], lsw[k]
                else:
                    pc = pc + lcw[k]
                    ps = ps + lsw[k]
            return out

        def potential(aux_v, q):
            c = aux_v[n:]
            u = gu_at(0) * (1.0 - c[0])
            for i in range(1, n):
                u = u + gu_at(i) * (1.0 - c[i])
            return u

        return FamilyFns(aux, k_at, dhdq, potential, (factor, solve),
                         aux_shift=_trig_aux_shift(n))

    return FusedForms(
        n=n, n_aux=2 * n, coef_lens=(3 * n,), consts=consts,
        arrays_fn=arrays_fn, make=make, name="serial_chain_on",
    )


def serial_chain_forms_mobius(masses, lengths, gravity) -> FusedForms:
    """Depth-optimized variant of :func:`serial_chain_forms_on`: the
    semiseparable Cholesky's 2×2 Riccati recursion collapsed to a
    **division-free, sqrt-free scalar Möbius chain**.

    Derivation.  Write the running factor state as ``W_a = S̃_a·I − P_{a-1}``
    (the base family computes ``y_a = W_a ũ_a``).  One step of the recursion
    is a discrete Riccati map ``W' = δ·I + W − Wu(uᵀWu)⁻¹uᵀW`` with
    ``δ_a = S̃_a − S̃_{a-1}`` (the processed link's mass).  In the plane the
    projection ``W − Wu(uᵀWu)⁻¹uᵀW`` annihilates ``û`` and leaves the single
    value ``β = 1/(f̂ᵀW⁻¹f̂)`` on ``f̂ = rot90(û)`` — so the whole 2×2 state
    is ``W_a = δ_a·I + β_{a-1}·f̂_{a-1}f̂_{a-1}ᵀ``, and β obeys the scalar
    Möbius recursion

        ``β_a = δ_a(δ_a + β_{a-1}) / (δ_a + σ_a·β_{a-1})``,

    with ``σ_a = sin²(θ_a − θ_{a-1})`` the squared sine of the *relative*
    link angle.  Kept in homogeneous form ``β = p/q`` the chain is linear,

        ``p' = p + δ_a·q``,  ``q' = (σ_a/δ_a)·p + q``,

    — per link TWO multiply-adds of critical-path depth, no division, no
    square root.  Everything else (β = p/q, ``y_a = δ_aũ_a + β_{a-1}
    (f̂_{a-1}·ũ_a)f̂_{a-1}``, ``d², 1/d, z``) is per-link independent work
    off the critical path.  The factor's dependency chain drops from ~25n
    (mul/sub/sqrt/div per link, docs/design.md round-4b) to ~2n at the SAME
    flop count — the "shorten the recursion itself" lever the round-4
    journal left unexplored.  Entry layout and the triangular solves are
    identical to the base family; in exact arithmetic the factors are
    equal, so fixed points and trajectories agree to rounding.

    Overflow note: the homogeneous pair grows multiplicatively; with the
    ``1/δ``-normalized transfer matrix above, ``q_n ≤ Π(1 + σβ/δ)`` stays
    far inside f32 range for physical mass ratios (β ≤ total mass, so each
    factor ≤ 1 + M/δ_min; 20 links at 400:1 total:link mass ratio would be
    needed to approach 1e38).
    """
    base = serial_chain_forms_on(masses, lengths, gravity)
    n = base.n

    m_c = concrete_vec(masses, n)
    l_c = concrete_vec(lengths, n)
    g_c = concrete_scalar(gravity)
    consts = None
    if m_c is not None and l_c is not None and g_c is not None:
        suff = _suffix_sums(m_c)
        consts = (
            tuple(l_c) + tuple(suff)
            + tuple(g_c * l_c[i] * suff[i] for i in range(n))
            + tuple(m_c)
            + tuple(1.0 / m_c[i] for i in range(n)),
        )

    def arrays_fn(dtype):
        m_ = jnp.asarray(masses).astype(dtype)
        l_ = jnp.asarray(lengths).astype(dtype)
        g_ = jnp.asarray(gravity).astype(dtype)
        suffix = jnp.cumsum(m_[..., ::-1], axis=-1)[..., ::-1]
        gu = g_[..., None] * l_ * suffix
        return (jnp.concatenate([l_, suffix, gu, m_, 1.0 / m_], axis=-1),)

    def make(at, fm):
        # base family against a 3n-prefix view of the 5n table (same layout)
        fam = base.make(at, fm)
        l_at = lambda i: at[0](i)              # noqa: E731
        m_at = lambda i: at[0](3 * n + i)      # noqa: E731  δ by link index
        im_at = lambda i: at[0](4 * n + i)     # noqa: E731  1/δ

        def factor(aux_v, q):
            s, c = aux_v[:n], aux_v[n:]
            # per-link prep (tip-to-base processing order a; link i = n-1-a)
            idx = [n - 1 - a for a in range(n)]
            ux = [l_at(i) * c[i] for i in idx]
            uy = [l_at(i) * s[i] for i in idx]
            # cross_a = û_{a-1} × û_a = sin(θ_a − θ_{a-1});  σ_a = cross²
            cross = [None] + [
                c[idx[a - 1]] * s[idx[a]] - s[idx[a - 1]] * c[idx[a]]
                for a in range(1, n)
            ]
            sig = [None] + [cross[a] * cross[a] for a in range(1, n)]
            # -- the critical-path chain: homogeneous Möbius pair (p, q) --
            ps = [None] * n  # p_a, q_a AFTER processing link a
            qs = [None] * n
            ps[0] = fm.full(m_at(idx[0]), s[0])  # passes tiles through
            qs[0] = fm.full(1.0, s[0])
            for a in range(1, n):
                da, ida = m_at(idx[a]), im_at(idx[a])
                ps[a] = ps[a - 1] + da * qs[a - 1]
                qs[a] = (sig[a] * ida) * ps[a - 1] + qs[a - 1]
            # -- off-chain reconstruction (independent per link) --
            zxs, zys, ids = [], [], []
            for a in range(n):
                da = m_at(idx[a])
                if a == 0:
                    yx = da * ux[0]
                    yy = da * uy[0]
                else:
                    beta = ps[a - 1] / qs[a - 1]
                    # f̂_{a-1} = rot90(û_{a-1}) = (−s', c');  f̂·ũ_a = l_a·cross_a
                    bfu = beta * (l_at(idx[a]) * cross[a])
                    yx = da * ux[a] - bfu * s[idx[a - 1]]
                    yy = da * uy[a] + bfu * c[idx[a - 1]]
                d2 = ux[a] * yx + uy[a] * yy
                inv_d = 1.0 / fm.sqrt(d2)
                zxs.append(yx * inv_d)
                zys.append(yy * inv_d)
                ids.append(inv_d)
            return tuple(zxs + zys + ids + ux + uy)

        return FamilyFns(
            fam.aux, fam.k_at, fam.dhdq, fam.potential,
            (factor, fam.factor_solve[1]), aux_shift=fam.aux_shift,
        )

    return FusedForms(
        n=n, n_aux=base.n_aux, coef_lens=(5 * n,), consts=consts,
        arrays_fn=arrays_fn, make=make, name="serial_chain_mobius",
    )


def _tree_sum(terms):
    """Balanced pairwise sum over a list of per-member values.

    Floating-point addition is not reassociable, so the Mosaic scheduler
    cannot turn a left-fold into a log-depth reduction itself — emit the
    tree explicitly.  Depth ⌈log₂ k⌉ instead of k−1; same add count."""
    terms = list(terms)
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def serial_chain_forms_linv(masses, lengths, gravity):
    """Latency-optimized variant of :func:`serial_chain_forms_on`: the
    factorization additionally **materializes the explicit inverse
    Cholesky factor** ``L⁻¹`` (n(n+1)/2 entries), so each triangular
    solve becomes a dense mat-vec with balanced log-depth reductions —
    straight-line arithmetic of depth ~⌈log₂ n⌉ — instead of two
    depth-n sequential recursions.

    Rationale (docs/design.md round-4b): the semiseparable kernel is
    **latency-bound** (fused_vpu_util ~0.37) — its ~25n-deep factor/solve
    recursions serialize, and the four solves per (2,0) step are ~2/3 of
    the step's critical path.  Here the O(n²) column materialization
    happens ONCE per step (inside ``factor``, amortized over all solves
    of the step and carried across the ``steps_per_call`` block like any
    factor), and its n columns are **mutually independent** O(n)
    recursions — n parallel chains the scheduler can interleave — via
    column-wise forward substitution on the semiseparable generators:

        col a:  x_a = 1/d_a;   s = z_a·x_a;
                x_i = −(1/d_i)·(u_i·s),  s += z_i·x_i     (i > a).

    Flops/step roughly double vs ``serial_chain_forms_on`` (still ~2×
    below the dense family), buying ~5× less solve-chain depth; whether
    that nets out is measured on hardware (scripts/probe_semiseparable.py
    --solver linv), not assumed.  Fixed points are identical to the dense
    and semiseparable families; results differ only at rounding level
    (the mat-vec's balanced summation order).
    """
    base = serial_chain_forms_on(masses, lengths, gravity)
    n = base.n

    def make(at, fm):
        fam = base.make(at, fm)
        base_factor = fam.factor_solve[0]

        def factor(aux_v, q):
            """Semiseparable O(n) factorization, then L⁻¹ columns.

            Entry layout: column-major lower triangle, column ``a``
            holding ``L⁻¹[i, a]`` for ``i ≥ a`` (processing order —
            tip-to-base, like the base family's factor)."""
            ent = base_factor(aux_v, q)
            zx, zy = ent[0:n], ent[n:2 * n]
            idv = ent[2 * n:3 * n]
            ux, uy = ent[3 * n:4 * n], ent[4 * n:5 * n]
            flat = []
            for a in range(n):
                xa = idv[a]
                col = [xa]
                sx, sy = zx[a] * xa, zy[a] * xa
                for i in range(a + 1, n):
                    xi = -(idv[i] * (ux[i] * sx + uy[i] * sy))
                    col.append(xi)
                    if i < n - 1:
                        sx = sx + zx[i] * xi
                        sy = sy + zy[i] * xi
                flat.extend(col)
            return tuple(flat)

        def solve(ent, b):
            """``x = L⁻ᵀ (L⁻¹ b̃)`` as two triangular mat-vecs with
            balanced reductions; ``b``/result in original link order."""
            linv = {}
            k = 0
            for a in range(n):
                for i in range(a, n):
                    linv[(i, a)] = ent[k]
                    k += 1
            bt = [b[n - 1 - a] for a in range(n)]  # tilde order
            y = [
                _tree_sum([linv[(i, a)] * bt[a] for a in range(i + 1)])
                for i in range(n)
            ]
            xt = [
                _tree_sum([linv[(i, a)] * y[i] for i in range(a, n)])
                for a in range(n)
            ]
            return [xt[n - 1 - j] for j in range(n)]

        return FamilyFns(
            fam.aux, fam.k_at, fam.dhdq, fam.potential, (factor, solve),
            aux_shift=fam.aux_shift,
        )

    return FusedForms(
        n=n, n_aux=base.n_aux, coef_lens=base.coef_lens, consts=base.consts,
        arrays_fn=base.arrays_fn, make=make, name="serial_chain_linv",
    )


def serial_chain_stepper(
    masses,
    lengths,
    gravity,
    *,
    iters=(3, 1),
    compensated: bool = False,
    steps_per_call: int = 1,
    composition=(1.0,),
    group_unroll: int = 1,
):
    """Build a fused whole-step leapfrog :class:`Stepper` for a planar serial
    chain with the given per-link masses/lengths and gravity.

    ``masses``/``lengths`` are length-n sequences or arrays ``(..., n)``;
    ``gravity`` a scalar or ``(...)`` array.  Concrete unbatched values are
    baked into the kernel as immediate constants (the fastest mode); traced
    or batched values become per-member coefficient tiles computed at
    ``init`` and carried with the state (parameter sweeps: a leading batch
    axis must EQUAL the state batch ``B``, matching the library path's
    member-pairwise vmap semantics).

    Convenience wrapper over :func:`fused_stepper` +
    :func:`serial_chain_forms` (see those for the knob semantics).
    """
    return fused_stepper(
        serial_chain_forms(masses, lengths, gravity),
        iters=iters, compensated=compensated,
        steps_per_call=steps_per_call, composition=composition,
        group_unroll=group_unroll,
    )
