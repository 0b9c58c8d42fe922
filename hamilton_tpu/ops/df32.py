"""Double-f32 (two-float) arithmetic for the in-loop energy-drift sampler.

The headline bench measures ``max |ΔH/H₀|`` ON DEVICE during the run.  The
trajectory is f32 (Kahan-compensated), but the *measurement* must be more
precise than the ~6e-7 drift it measures — an f32 H evaluation's own
rounding (~1e-6 relative) would mask it.  Round 3 paid for that precision
with emulated-f64 evaluations of the full library-path Hamiltonian
(AD jacobian sweep + solve, every op ~30× an f32 op), measured at ~8 ms per
sample — 157.5e6 vs 169.9e6 member-steps/s at dense 1000-step cadence, the
headline's last ~8% (docs/design.md round-3; VERDICT r3 item 2).

This module replaces that with **double-f32 (Dekker/Knuth pair) arithmetic
over the system's closed forms**: every value is an unevaluated sum
``hi + lo`` of two f32s (~49 bits of significand, unit roundoff ~2⁻⁴⁹ ≈
1.8e-15 relative — six decimal orders below the drift being measured), and
every ``+ − * /`` is an error-free-transformation sequence of plain f32
VPU ops.  The Hamiltonian is evaluated from the family's
:class:`~hamilton_tpu.ops.pallas_step.FamilyFns` closed forms (K entries,
potential) — no AD, no rank-3 Hessian, no f64 emulation — via a DF-valued
Cholesky solve for the kinetic term ``½ pᵀK⁻¹p``.

Error-free transformations (Dekker 1971; Knuth TAOCP §4.2.2; the QD library
of Hida/Li/Bailey 2001):

* ``two_sum(a, b)``      — exact: a+b = s + e, 6 flops, no branch
* ``two_prod(a, b)``     — exact via Dekker splitting (no FMA primitive is
  exposed through XLA:TPU at the jnp level, so the classic 17-flop split
  form is used; products of f32 pairs split at 12 bits are exact in f32)
* ``df_add/df_mul/df_div/df_sqrt`` — the usual QD "sloppy" double-double
  kernels, relative error O(2⁻⁴⁸)

Transcendentals (``sin``/``cos``/``exp``) route through one emulated-f64
evaluation per *input* and split the result into a pair — the closed forms
need only ~2n of them per member-sample vs the thousands of arithmetic ops
in the K-formation/solve, so the emulation tax stays negligible (requires
x64 enabled, which the bench holds for its h₀ anchor anyway).

The family's closed forms run unmodified in DF arithmetic: ``FM_DF``
mirrors :data:`~hamilton_tpu.ops.pallas_step.FM_JNP` and :class:`DF`
overloads ``+ − * /`` against floats and other pairs, which is exactly the
arithmetic surface the :class:`FamilyFns` contract restricts families to.

Accuracy is pinned by tests (tests/test_utils.py::TestDF32): H_df32 agrees
with the host f64 library-path H to ≤1e-8 absolute across all fused
families, and the drift sampler's ``measure_h`` matches the f64 sampler's
to the same level on evolved states.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "DF",
    "FM_DF",
    "df_from_f64",
    "df_to_f64",
    "fused_measure_h",
]

_SPLITTER = 4097.0  # 2^12 + 1: Dekker split point for f32 (24-bit mantissa)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLITTER * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


class DF(NamedTuple):
    """An unevaluated f32 sum ``hi + lo`` with ``|lo| ≤ ulp(hi)/2``.

    A pytree (NamedTuple) so DF values ride jit/scan carries; arithmetic
    against Python floats and other DF values via operator overloads — the
    full surface the FamilyFns contract allows (``+ − * /``, unary ``−``).
    """

    hi: jax.Array
    lo: jax.Array

    # -- construction ---------------------------------------------------
    @staticmethod
    def exact(x):
        """An f32 array (or float) as an exact pair (lo = 0)."""
        x = jnp.asarray(x, jnp.float32)
        return DF(x, jnp.zeros_like(x))

    @staticmethod
    def const(v, like):
        """A Python float to a pair: hi = f32(v), lo = f32(v − hi).

        Captures doubles (masses, g·l coefficient products, wall βs) to DF
        accuracy regardless of x64 state (the float is a host value)."""
        import numpy as np

        hi = np.float32(v)
        lo = np.float32(float(v) - float(hi))
        return DF(jnp.full_like(like.hi, hi), jnp.full_like(like.hi, lo))

    # -- arithmetic ------------------------------------------------------
    # Python-float operands are checked for exact f32 representability AT
    # TRACE TIME: doubles that don't round-trip (reduced masses, suffix-sum
    # coefficient products, wall βs…) are split into DF constants so the
    # closed forms keep their full double-precision coefficients; exact
    # floats (1.0, 0.5, integer masses) take the cheap scalar kernels.
    def _lift(self, other):
        if not isinstance(other, (int, float)):
            return other  # jax array: an exact f32 value (internal use)
        import numpy as np

        f = float(other)
        if float(np.float32(f)) == f:
            return np.float32(f)  # host scalar: no tracer, exact in f32
        return DF.const(f, self)

    def __add__(self, other):
        if not isinstance(other, DF):
            other = self._lift(other)
            if not isinstance(other, DF):
                s, e = _two_sum(self.hi, other)
                e = e + self.lo
                return DF(*_quick_two_sum(s, e))
        s, e = _two_sum(self.hi, other.hi)
        e = e + (self.lo + other.lo)
        return DF(*_quick_two_sum(s, e))

    __radd__ = __add__

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __sub__(self, other):
        if isinstance(other, DF):
            return self + (-other)
        return self + (-float(other))

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        if not isinstance(other, DF):
            other = self._lift(other)
            if not isinstance(other, DF):
                p, e = _two_prod(self.hi, other)
                e = e + self.lo * other
                return DF(*_quick_two_sum(p, e))
        p, e = _two_prod(self.hi, other.hi)
        e = e + (self.hi * other.lo + self.lo * other.hi)
        return DF(*_quick_two_sum(p, e))

    __rmul__ = __mul__

    def __truediv__(self, other):
        if not isinstance(other, DF):
            o = self._lift(other)
            other = o if isinstance(o, DF) else DF(
                jnp.broadcast_to(o, self.hi.shape),
                jnp.zeros(self.hi.shape, jnp.float32),
            )
        # long division (QD div_dd): quotient refined by one remainder pass
        q1 = self.hi / other.hi
        r = self - other * q1
        q2 = r.hi / other.hi
        r = r - other * q2
        q3 = r.hi / other.hi
        q, e = _quick_two_sum(q1, q2)
        return DF(*_quick_two_sum(q, e + q3))

    def __rtruediv__(self, other):
        o = self._lift(other)
        if not isinstance(o, DF):
            o = DF(jnp.broadcast_to(o, self.hi.shape),
                   jnp.zeros(self.hi.shape, jnp.float32))
        return o / self


def df_from_f64(x):
    """An f64 array to a DF pair (requires x64 enabled)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def df_to_f64(a: DF):
    """The pair as one f64 value (requires x64 enabled)."""
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def _df_sqrt(a: DF) -> DF:
    """Newton step on 1/√: x(3 − a·x²)/2 refined once from the f32 seed —
    the standard QD sqrt, accurate to O(2⁻⁴⁸) for a > 0."""
    x = 1.0 / jnp.sqrt(a.hi)
    ax = a.hi * x
    # sqrt(a) ≈ ax + (a − ax²)·x/2
    axd = DF.exact(ax)
    diff = a - axd * axd
    return axd + DF.exact(diff.hi * (x * 0.5)) + DF.exact(diff.lo * (x * 0.5))


def _via_f64(fn):
    """Transcendental via one emulated-f64 evaluation (see module doc)."""

    def g(a: DF) -> DF:
        x = a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)
        return df_from_f64(fn(x))

    return g


def _fm_full_df(v, like):
    if isinstance(v, (int, float)):
        return DF.const(v, like)
    return v


import types as _types  # noqa: E402

#: DF-valued math namespace with the same surface as ``FM_JNP`` — hand it to
#: ``FusedForms.make`` and the family's closed forms evaluate in double-f32.
FM_DF = _types.SimpleNamespace(
    sin=_via_f64(jnp.sin),
    cos=_via_f64(jnp.cos),
    exp=_via_f64(jnp.exp),
    sqrt=_df_sqrt,
    full=_fm_full_df,
    zero=lambda like: DF(jnp.zeros_like(like.hi), jnp.zeros_like(like.hi)),
)


def _chol_solve_df(k_at, b, n):
    """DF Cholesky + solve on entry accessors (mirror of
    pallas_solve._chol_entries/_solve_entries in DF arithmetic)."""
    low = {}
    inv_diag = [None] * n
    for j in range(n):
        s = k_at(j, j)
        for k in range(j):
            ljk = low[(j, k)]
            s = s - ljk * ljk
        d = _df_sqrt(s)
        low[(j, j)] = d
        inv_d = 1.0 / d
        inv_diag[j] = inv_d
        for i in range(j + 1, n):
            s = k_at(i, j)
            for k in range(j):
                s = s - low[(i, k)] * low[(j, k)]
            low[(i, j)] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - low[(i, k)] * y[k]
        y[i] = s * inv_diag[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - low[(k, i)] * x[k]
        x[i] = s * inv_diag[i]
    return x


def fused_measure_h(system):
    """``measure_h(phase) -> (B,) f64`` evaluating the Hamiltonian in
    double-f32 from the system's fused-family closed forms.

    ``H = ½ pᵀ K(q)⁻¹ p + U(q)`` with K entries and U from
    ``system.fused_forms`` (which must declare ``FamilyFns.potential``),
    states promoted exactly (f32 → DF with lo = 0), the solve in DF
    Cholesky, and the result recombined to f64 (the drift comparison
    ``|h − h₀|`` then costs two f64 ops per member).

    Shared concrete parameters come in as host floats split to DF constants;
    swept/traced parameters come in through ``arrays_fn(float64)`` split to
    per-member DF columns — both at full double precision, so the
    measurement agrees with the f64 library-path H to ~1e-8 absolute
    (tested) rather than inheriting the f32 coefficient rounding.
    """
    forms_factory = getattr(system, "fused_forms", None)
    if forms_factory is None:
        raise ValueError(
            f"system {system.name!r} has no fused_forms family — the "
            f"double-f32 drift sampler needs closed forms; use "
            f"drift_dtype=jnp.float64 instead"
        )
    forms = forms_factory(system)
    n = forms.n

    if forms.consts is not None:
        at = tuple(
            (lambda i, t=t: forms.consts[t][i])
            for t in range(len(forms.coef_lens))
        )
        fam = forms.make(at, FM_DF)

        def columns_at(_b):
            return fam

    else:
        tables64 = None

        def columns_at(b):
            nonlocal tables64
            # materialize once per trace: f64 tables split into DF columns
            tables64 = forms.arrays_fn(jnp.float64)
            cols = []
            for t, ln in zip(tables64, forms.coef_lens):
                t2 = t.reshape((-1, ln))  # (1, ln) shared or (B, ln) swept
                cols.append(df_from_f64(t2))
            at = tuple(
                (lambda i, c=c: DF(c.hi[:, i], c.lo[:, i])) for c in cols
            )
            return forms.make(at, FM_DF)

    def measure_h(ph):
        q, p = ph.q, ph.p
        if q.ndim != 2 or q.shape[-1] != n:
            raise ValueError(
                f"df32 drift sampler needs (B, {n}) states, got "
                f"{tuple(q.shape)}"
            )
        fam = columns_at(q.shape[0])
        q_df = [DF.exact(q[:, i].astype(jnp.float32)) for i in range(n)]
        p_df = [DF.exact(p[:, i].astype(jnp.float32)) for i in range(n)]
        aux = fam.aux(q_df)
        if fam.potential is None:
            raise ValueError(
                f"family {forms.name!r} declares no closed-form potential — "
                f"required for the df32 drift sampler"
            )
        w = _chol_solve_df(fam.k_at(aux, q_df), p_df, n)
        ke = p_df[0] * w[0]
        for i in range(1, n):
            ke = ke + p_df[i] * w[i]
        h = ke * 0.5 + fam.potential(aux, q_df)
        return df_to_f64(h)

    return measure_h
