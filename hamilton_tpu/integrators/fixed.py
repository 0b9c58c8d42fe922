"""Fixed-step integrators: explicit RK and the symplectic family.

The reference has *no* fixed-step integrator — even ``stepHam`` runs the full
adaptive GSL solve over ``[0, dt]`` (``Numeric/Hamilton.hs:389-402``).  Fixed
steppers are the intentional TPU-first upgrade (SURVEY.md §3.4, §7): a
``lax.scan`` of a compiled step has no data-dependent control flow, vmaps
perfectly over ensembles, and the symplectic members give bounded long-horizon
energy drift where RK drifts secularly.

The Hamiltonian here is **non-separable** — ``H = ½ pᵀK(q)⁻¹p + U(q)`` with a
position-dependent mass matrix — so plain kick-drift-kick leapfrog is *not*
symplectic for general systems.  The symplectic members are therefore:

* ``leapfrog`` — generalized Störmer-Verlet (Hairer et al., *Geometric
  Numerical Integration*, VI.3): the semi-implicit two-half-step scheme,
  solved by fixed-point iteration; reduces to classic leapfrog when K is
  constant.  Order 2, symmetric, symplectic.
* ``midpoint`` / ``gauss4`` / ``gauss6`` — Gauss-Legendre collocation (orders
  2/4/6), symplectic and symmetric, solved by fixed-point iteration with a
  static iteration count (TPU-friendly: no data-dependent loops).
* ``tao2`` / ``tao4`` — Molei Tao's *explicit* symplectic integrator for
  non-separable Hamiltonians (PRE 94, 043303 (2016)): extended phase space
  ``(q, p, x, y)`` with an ω-binding, needing only ∂H evaluations — no
  implicit solves at all.  ``tao4`` is the Yoshida triple-jump composition.
* ``yoshida4`` — 4th-order triple-jump composition of ``leapfrog``.

plus non-symplectic ``rk4`` for reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from hamilton_tpu.mechanics import ham_eqs
from hamilton_tpu.state import Phase
from hamilton_tpu.system import System
from hamilton_tpu.integrators.tableaus import (
    GAUSS2,
    GAUSS4,
    GAUSS6,
    RK4,
    Tableau,
)

__all__ = ["Stepper", "make_stepper", "FIXED_METHODS"]


@dataclass(frozen=True)
class Stepper:
    """A fixed-step integrator as an (init, step, extract) triple.

    ``init`` maps a :class:`Phase` to the integrator's internal carry (for
    most methods the phase itself; Tao's method carries the extended state),
    ``step`` advances the carry by ``dt``, and ``extract`` projects the carry
    back to a :class:`Phase`.  All three are pure and jit/vmap/scan-safe.
    """

    init: Callable[[Phase], Any]
    step: Callable[[Any, jax.Array], Any]
    extract: Callable[[Any], Phase]
    order: int
    symplectic: bool
    # dt-steps advanced per ``step`` call (>1 for fused multi-step kernels
    # that amortize per-dispatch launch overhead — ops/pallas_step.py);
    # evolution drivers divide their loop counts by this.
    substeps: int = 1


def _rhs(system: System):
    def rhs(phase: Phase) -> Phase:
        dq, dp = ham_eqs(system, phase)
        return Phase(dq, dp)

    return rhs


def _kahan_add(x, c, d):
    """Compensated accumulation: add increment ``d`` to ``(x, c)`` where ``c``
    carries the running rounding residual (Kahan/Neumaier).

    XLA does not re-associate floating point, so the cancellation pattern
    survives compilation.  Used by the ``compensated=True`` steppers: the
    integrator computes each step's *increment* exactly (O(dt·|y|) quantities
    with O(eps·dt·|y|) rounding), and the accumulation error stays O(eps)
    instead of random-walking as O(sqrt(N)·eps·|y|) — the standard technique
    for sub-1e-6 energy drift at f32 over 1e5-step horizons (cf. compensated
    leapfrog in N-body integrators)."""
    y = d + c
    t = x + y
    c_new = y - (t - x)
    return t, c_new


# ----------------------------------------------------------------------
# Explicit RK on phase space
# ----------------------------------------------------------------------


def _explicit_rk_stepper(system: System, tab: Tableau) -> Stepper:
    rhs = _rhs(system)

    def step(ph: Phase, dt) -> Phase:
        ks = []
        for i in range(tab.stages):
            qi, pi = ph.q, ph.p
            for j, aij in enumerate(tab.a[i]):
                if aij != 0.0:
                    qi = qi + dt * aij * ks[j].q
                    pi = pi + dt * aij * ks[j].p
            ks.append(rhs(Phase(qi, pi)))
        q1, p1 = ph.q, ph.p
        for bi, ki in zip(tab.b, ks):
            if bi != 0.0:
                q1 = q1 + dt * bi * ki.q
                p1 = p1 + dt * bi * ki.p
        return Phase(q1, p1)

    return Stepper(lambda p: p, step, lambda p: p, order=tab.order, symplectic=False)


# ----------------------------------------------------------------------
# Gauss-Legendre collocation (symplectic implicit RK), fixed-point solved
# ----------------------------------------------------------------------


def _gauss_stepper(
    system: System, tab: Tableau, iters: int, compensated: bool = False
) -> Stepper:
    rhs = _rhs(system)
    s = tab.stages
    # Folding the s stages into the batch axis keeps the ensemble batch
    # visible to the Pallas solve kernels — but it breaks the trailing
    # alignment between state batch axes and params batch axes, so with
    # BATCHED params the stages stay a leading axis instead (the mechanics
    # map params over the trailing ensemble axis and broadcast over stages).
    fold_stages = system.param_batch_ndim() == 0

    def step(ph: Phase, dt, comp: "Phase | None" = None):
        # Stage derivatives F_i, fixed-point iterated:
        #   F_i <- f(y + dt Σ_j a_ij F_j)
        # (+ the Kahan residual folded into the stage sums when compensating,
        # so the evaluation point carries the extended-precision state).
        # The iteration runs as a fori_loop (one ham_eqs instance in the
        # compiled graph, not iters·s copies) with the s stages folded into
        # the leading batch axis of one ham_eqs call — both a compile-time
        # and a vector-utilization win, and it keeps the ensemble batch axis
        # visible to the Pallas solve kernels (stage·batch fused).
        a_mat = jnp.asarray(tab.a, dtype=ph.q.dtype)  # (s, s)
        b_vec = jnp.asarray(tab.b, dtype=ph.q.dtype)  # (s,)
        f0 = rhs(ph)
        fq0 = jnp.broadcast_to(f0.q, (s,) + f0.q.shape)
        fp0 = jnp.broadcast_to(f0.p, (s,) + f0.p.shape)
        batch_shape = ph.q.shape[:-1]  # ensemble axes, possibly ()
        n = ph.q.shape[-1]

        def stage_combine(mat, fs):
            # (s', s) × (s, ..., n) → (s', ..., n)
            return jnp.tensordot(mat, fs, axes=(-1, 0))

        del comp  # folding the residual into the stage sums measured neutral

        def body(fs):
            fq, fp = fs
            qi = ph.q + dt * stage_combine(a_mat, fq)  # (s, ..., n)
            pi = ph.p + dt * stage_combine(a_mat, fp)
            if not fold_stages:
                dq, dp = ham_eqs(system, Phase(qi, pi))
                return dq, dp
            # fold stages into the batch: (s, ..., n) → (s·B, n)
            qf = qi.reshape((-1, n))
            pf = pi.reshape((-1, n))
            dq, dp = ham_eqs(system, Phase(qf, pf))
            return dq.reshape(qi.shape), dp.reshape(pi.shape)

        # The fixed-point iteration is UNROLLED (static small count): a
        # fori_loop here nests inside the evolution's outer scan/fori, and
        # nested while-loops de-optimize badly on TPU (measured 11× per-step
        # regression for the whole stepper).  The body is compact (one
        # batched ham_eqs), so iters-many copies keep the HLO small.
        fs = (fq0, fp0)
        for _ in range(iters):
            fs = body(fs)
        fq, fp = fs
        del batch_shape
        # increment form: Δ = dt·Σ b_i F_i (O(dt·|y|) with O(eps·dt·|y|)
        # rounding) — what the compensated path accumulates
        dq_inc = dt * stage_combine(b_vec[None, :], fq)[0]
        dp_inc = dt * stage_combine(b_vec[None, :], fp)[0]
        return dq_inc, dp_inc

    def plain_step(ph: Phase, dt) -> Phase:
        dq_inc, dp_inc = step(ph, dt)
        return Phase(ph.q + dq_inc, ph.p + dp_inc)

    if not compensated:
        return Stepper(
            lambda p: p, plain_step, lambda p: p, order=tab.order, symplectic=True
        )

    def comp_init(ph: Phase):
        return (ph, Phase(jnp.zeros_like(ph.q), jnp.zeros_like(ph.p)))

    def comp_step(carry, dt):
        ph, c = carry
        dq_inc, dp_inc = step(ph, dt)
        q1, cq = _kahan_add(ph.q, c.q, dq_inc)
        p1, cp = _kahan_add(ph.p, c.p, dp_inc)
        return (Phase(q1, p1), Phase(cq, cp))

    return Stepper(
        comp_init, comp_step, lambda carry: carry[0],
        order=tab.order, symplectic=True,
    )


# ----------------------------------------------------------------------
# Generalized Störmer-Verlet ("leapfrog") for non-separable H
# ----------------------------------------------------------------------


def _leapfrog_stepper(
    system: System, iters, compensated: bool = False
) -> Stepper:
    """Generalized Störmer-Verlet with **factor caching**: the p½ fixed-point
    loop holds q = q₀, so J/Cholesky(K)/∇U are factorized once (`QFactor`)
    and each iteration costs only a pair of triangular substitutions plus one
    VJP sweep.  The end-of-step factorization at q₁ doubles as the next
    step's q₀ factor, so the carry is ``(Phase, QFactor)`` — one
    factorization per q-loop iteration plus one per step, total, versus the
    naive scheme's 2·iters + 2 full dynamics evaluations."""

    from hamilton_tpu.mechanics import (
        dhdp_factored,
        dhdq_factored,
        q_factor,
    )

    from hamilton_tpu.mechanics import velocities as _velocities

    # iters: int applies to both fixed-point loops; an (iters_p, iters_q)
    # pair splits them.  The p½-loop's iterations are cheap (a cached-factor
    # substitution + a VJP sweep — no Jacobian materialization) while each
    # q-loop iteration pays a fresh form-K+factor+solve, so the ensemble hot
    # loop benefits from spending iterations asymmetrically.
    iters_p, iters_q = iters if isinstance(iters, tuple) else (iters, iters)
    if iters_p < 1:
        raise ValueError(f"leapfrog needs iters_p >= 1, got {iters_p}")
    if iters_q < 0:
        raise ValueError(
            f"iters_q must be >= 0 (0 selects the Gauss-Seidel predictor-"
            f"factor mode), got {iters_q}"
        )

    def hp_fresh(q, p):
        """q̇ at a fresh q (inside the q-loop; needs its own factorization
        but not ∂H/∂q, so skip the ∇U/VJP work).  ``velocities`` is
        batch-aware and Pallas-routed."""
        return _velocities(system, Phase(q, p))

    def increments(ph: Phase, fac0, warm, dt):
        """One generalized-Verlet step in increment form: returns
        ``(Δq, Δp, fac1, warm')`` with the deltas computed as pure O(dt)
        sums (the compensated path's accumulation quantities).

        ``warm = (a_est, vdot_est)`` warm-starts the two fixed-point loops
        from the previous step's converged force/velocity-derivative
        estimates (both smooth physical quantities, so the dt-scaling stays
        correct across composition substeps with different — even negative —
        dt, as in yoshida4).  Zeros reduce exactly to the cold start; the
        fixed *point* is unchanged either way, only the residual after the
        static ``iters`` shrinks (~one extra contraction factor), which is
        what lets the ensemble hot loop run iters=2 at cold-iters=3 accuracy
        (measured: docs/design.md "Round-2 additions")."""
        # Fixed-point iterations are UNROLLED (see the gauss stepper note:
        # nested while-loops inside the evolution's outer loop de-optimize
        # ~11× on TPU; each unrolled body is just a solve + a VJP sweep).
        q0, p0 = ph.q, ph.p
        a_est, vdot_est = warm
        half = dt / 2
        # p½ = p0 − h/2 · A,  A = H_q(q0, p½)   (implicit; cached factor)
        ph_half = p0 - half * a_est
        a_last = a_est
        for _ in range(iters_p):
            a_last = dhdq_factored(system, fac0, q0, ph_half)
            ph_half = p0 - half * a_last
        # q1 = q0 + h/2 · (v0 + v1),  v = H_p   (implicit in q1)
        v0 = dhdp_factored(fac0, ph_half)
        v_last = v0
        q1 = q0 + dt * v0 + (dt * half) * vdot_est
        for _ in range(iters_q):
            v_last = hp_fresh(q1, ph_half)
            q1 = q0 + half * (v0 + v_last)
        if iters_q == 0:
            # Gauss-Seidel mode: factorize ONCE at the warm predictor (whose
            # error is already O(dt³)), solve v there, and take the q-update
            # from that factor — one Jacobian materialization per step.  The
            # end-of-step factor is then stale by the final O(dt³·λ) update;
            # all consumers (b_term here, the next step's p-loop) see a
            # consistently-stale factor, which perturbs the map at an order
            # below the method's own O(dt³) local error (drift measured
            # converged — docs/design.md "Round-2 hot-loop reductions").
            fac1 = q_factor(system, q1)
            v_last = dhdp_factored(fac1, ph_half)
            q1 = q0 + half * (v0 + v_last)
        else:
            # exact mode: factor at the converged q1
            fac1 = q_factor(system, q1)
        dq_inc = half * (v0 + v_last)
        # p1 = p½ − h/2 · B,  B = H_q(q1, p½); q1 factor carries to next step
        b_term = dhdq_factored(system, fac1, q1, ph_half)
        dp_inc = -half * (a_last + b_term)
        warm1 = (b_term, (v_last - v0) / dt)
        return dq_inc, dp_inc, fac1, warm1

    def warm0(ph: Phase):
        return (jnp.zeros_like(ph.p), jnp.zeros_like(ph.q))

    def init(ph: Phase):
        return (ph, q_factor(system, ph.q), warm0(ph))

    def step(carry, dt):
        ph, fac0, warm = carry
        dq_inc, dp_inc, fac1, warm1 = increments(ph, fac0, warm, dt)
        return (Phase(ph.q + dq_inc, ph.p + dp_inc), fac1, warm1)

    if not compensated:
        return Stepper(init, step, lambda c: c[0], order=2, symplectic=True)

    def comp_init(ph: Phase):
        return (ph, q_factor(system, ph.q), warm0(ph),
                Phase(jnp.zeros_like(ph.q), jnp.zeros_like(ph.p)))

    def comp_step(carry, dt):
        ph, fac0, warm, c = carry
        dq_inc, dp_inc, fac1, warm1 = increments(ph, fac0, warm, dt)
        q1, cq = _kahan_add(ph.q, c.q, dq_inc)
        p1, cp = _kahan_add(ph.p, c.p, dp_inc)
        return (Phase(q1, p1), fac1, warm1, Phase(cq, cp))

    return Stepper(comp_init, comp_step, lambda c: c[0], order=2, symplectic=True)


# ----------------------------------------------------------------------
# Tao's explicit symplectic integrator for non-separable H (PRE 2016)
# ----------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _TaoState:
    q: jax.Array
    p: jax.Array
    x: jax.Array
    y: jax.Array


def _tao_flows(system: System, omega: float):
    def hq(q, p):
        _, dp = ham_eqs(system, Phase(q, p))
        return -dp

    def hp(q, p):
        dq, _ = ham_eqs(system, Phase(q, p))
        return dq

    def phi_a(st: _TaoState, d) -> _TaoState:
        # H_A = H(q, y): p ← p − δ H_q(q, y); x ← x + δ H_p(q, y)
        dq, dp = ham_eqs(system, Phase(st.q, st.y))
        return _TaoState(st.q, st.p + d * dp, st.x + d * dq, st.y)

    def phi_b(st: _TaoState, d) -> _TaoState:
        # H_B = H(x, p): q ← q + δ H_p(x, p); y ← y − δ H_q(x, p)
        dq, dp = ham_eqs(system, Phase(st.x, st.p))
        return _TaoState(st.q + d * dq, st.p, st.x, st.y + d * dp)

    def phi_c(st: _TaoState, d) -> _TaoState:
        # ω-binding rotation of (q−x, p−y), exact linear flow.
        ang = 2.0 * omega * d
        cth, sth = jnp.cos(ang), jnp.sin(ang)
        dq, dp = st.q - st.x, st.p - st.y
        sq, sp = st.q + st.x, st.p + st.y
        rq = cth * dq + sth * dp
        rp = -sth * dq + cth * dp
        return _TaoState(
            0.5 * (sq + rq), 0.5 * (sp + rp), 0.5 * (sq - rq), 0.5 * (sp - rp)
        )

    return phi_a, phi_b, phi_c


def _tao2_step(system: System, omega: float):
    phi_a, phi_b, phi_c = _tao_flows(system, omega)

    def step(st: _TaoState, dt) -> _TaoState:
        h = dt / 2
        st = phi_a(st, h)
        st = phi_b(st, h)
        st = phi_c(st, dt)
        st = phi_b(st, h)
        st = phi_a(st, h)
        return st

    return step


def _tao_stepper(system: System, omega: float, order: int) -> Stepper:
    base = _tao2_step(system, omega)
    if order == 2:
        step = base
    elif order == 4:
        step = _triple_jump(base, 2)
    else:
        raise ValueError(f"tao integrator supports order 2 or 4, got {order}")

    return Stepper(
        init=lambda ph: _TaoState(ph.q, ph.p, ph.q, ph.p),
        step=step,
        extract=lambda st: Phase(0.5 * (st.q + st.x), 0.5 * (st.p + st.y)),
        order=order,
        symplectic=True,
    )


def _triple_jump(step, base_order: int):
    """Yoshida/Suzuki triple-jump: raise a symmetric method's order by 2."""
    gamma = 2.0 ** (1.0 / (base_order + 1))
    w1 = 1.0 / (2.0 - gamma)
    w0 = -gamma / (2.0 - gamma)

    def composed(state, dt):
        state = step(state, w1 * dt)
        state = step(state, w0 * dt)
        state = step(state, w1 * dt)
        return state

    return composed


def _yoshida4_stepper(system: System, iters: int) -> Stepper:
    lf = _leapfrog_stepper(system, iters)
    return Stepper(
        lf.init, _triple_jump(lf.step, 2), lf.extract, order=4, symplectic=True
    )


# ----------------------------------------------------------------------
# Registry
# ----------------------------------------------------------------------

FIXED_METHODS = (
    "rk4",
    "leapfrog",
    "leapfrog_fused",
    "midpoint",
    "gauss4",
    "gauss6",
    "yoshida4",
    "yoshida4_fused",
    "suzuki4_fused",
    "tao2",
    "tao4",
)

_FUSED_METHODS = ("leapfrog_fused", "yoshida4_fused", "suzuki4_fused")


def _fused_factory(system: System):
    """The system's fused-stepper factory: an explicit ``pallas_step``
    override wins; otherwise one is derived from the declarative
    ``fused_forms`` family contract (ops/pallas_step.py)."""
    if system.pallas_step is not None:
        return system.pallas_step
    if getattr(system, "fused_forms", None) is not None:
        from hamilton_tpu.ops.pallas_step import fused_stepper

        def factory(sys, **kw):
            return fused_stepper(sys.fused_forms(sys), **kw)

        return factory
    return None


def make_stepper(
    system: System,
    method: str = "gauss4",
    *,
    iters=6,
    omega: float = 20.0,
    compensated: bool = False,
    steps_per_call: int = 1,
    group_unroll: int = 1,
) -> Stepper:
    """Build a fixed-step :class:`Stepper` for ``system``.

    Args:
      method: one of :data:`FIXED_METHODS`.
      iters: fixed-point iteration count for the implicit members (static —
        compiled into the trace; ~5-8 suffices for typical ``|dt·∂²H| ≪ 1``).
        For ``leapfrog``/``yoshida4`` an ``(iters_p, iters_q)`` pair splits
        the momentum- and position-loop counts (the q-loop is the expensive
        one: each iteration re-factorizes the mass matrix).
      omega: binding frequency for Tao's method (larger tracks the physical
        trajectory more tightly but demands smaller ``dt``; ω·dt ≲ 1).
      compensated: Kahan-accumulate step increments (leapfrog/gauss family
        only) — keeps f32 long-horizon energy drift at the per-step-increment
        level instead of an O(√N·eps) random walk; the low-precision path to
        the <1e-6 drift target on hardware without fast f64.
      steps_per_call: for ``leapfrog_fused`` only — dt-steps executed inside
        one kernel dispatch (amortizes the per-dispatch launch overhead; the
        returned stepper reports it as ``.substeps``).
      group_unroll: fused methods only — 1024-member tile groups processed
        per kernel instance (independent register streams that hide the
        latency of sequential arithmetic chains; built for the O(n)
        semiseparable chain solver).  Batch must be a multiple of
        ``1024·group_unroll``.
    """
    if steps_per_call != 1 and method not in _FUSED_METHODS:
        raise ValueError(
            f"steps_per_call applies to the fused kernel methods, "
            f"not {method!r}"
        )
    if group_unroll != 1 and method not in _FUSED_METHODS:
        raise ValueError(
            f"group_unroll applies to the fused kernel methods, "
            f"not {method!r}"
        )
    if isinstance(iters, tuple) and method not in (
        "leapfrog", "yoshida4", *_FUSED_METHODS
    ):
        raise ValueError(
            f"split (iters_p, iters_q) counts apply to leapfrog/yoshida4, "
            f"not {method!r}"
        )
    if method == "rk4":
        stepper = _explicit_rk_stepper(system, RK4)
    elif method == "leapfrog":
        return _leapfrog_stepper(system, iters, compensated)
    elif method in _FUSED_METHODS:
        # fused whole-step Pallas kernel (ops/pallas_step.py), built from
        # the system's declarative closed-form family contract
        # (System.fused_forms) or a fully custom System.pallas_step factory.
        # The order-4 members run the Yoshida triple jump / Suzuki 5-stage
        # composition INSIDE the kernel (the warm-start quantities are
        # physical, so their dt-scaling survives the sign-alternating
        # substeps — same argument as library yoshida4); both compose with
        # steps_per_call and the in-block factor carry.
        factory = _fused_factory(system)
        if factory is None:
            raise ValueError(
                f"system {system.name!r} carries no fused-kernel closed "
                f"forms (System.fused_forms / System.pallas_step); use the "
                f"library leapfrog/yoshida4 methods"
            )
        from hamilton_tpu.ops.pallas_step import (
            SUZUKI4_COMPOSITION,
            YOSHIDA4_COMPOSITION,
        )

        composition = {
            "leapfrog_fused": (1.0,),
            "yoshida4_fused": YOSHIDA4_COMPOSITION,
            "suzuki4_fused": SUZUKI4_COMPOSITION,
        }[method]
        return factory(
            system, iters=iters, compensated=compensated,
            steps_per_call=steps_per_call, composition=composition,
            group_unroll=group_unroll,
        )
    elif method == "midpoint":
        return _gauss_stepper(system, GAUSS2, iters, compensated)
    elif method == "gauss4":
        return _gauss_stepper(system, GAUSS4, iters, compensated)
    elif method == "gauss6":
        return _gauss_stepper(system, GAUSS6, iters, compensated)
    elif method == "yoshida4":
        stepper = _yoshida4_stepper(system, iters)
    elif method == "tao2":
        stepper = _tao_stepper(system, omega, 2)
    elif method == "tao4":
        stepper = _tao_stepper(system, omega, 4)
    else:
        raise ValueError(
            f"unknown fixed-step method {method!r}; choose from {FIXED_METHODS}"
        )
    if compensated:
        raise ValueError(
            f"compensated summation is supported for the leapfrog/gauss "
            f"family, not {method!r}"
        )
    return stepper
