"""Oracle-independent parity ground truth (VERDICT r2 item 2).

The GSL-parity evidence elsewhere is a triangle between two in-house
implementations of the same reading of GSL's control laws
(``integrators/adaptive.py`` ↔ ``native/hamode.cpp``) — agreement cannot
catch a *common-mode* misreading of ``gsl_odeiv2_evolve_apply``
(``/root/reference/src/Numeric/Hamilton.hs:443-448`` is the behavior to
match).  This module pins the adaptive driver to an INDEPENDENT oracle:

* **Ground truth**: f64 Gauss-Legendre 6th-order collocation at tiny fixed
  dt — a different integrator family (implicit symplectic collocation vs
  embedded explicit RK), sharing no step-control code with the adaptive
  path.  Its own convergence is verified by Richardson self-consistency
  (halving dt changes the endpoint by ≪ the assertion tolerance).
* **Assertion**: the GSL-semantics adaptive driver (``evolve_ham`` with the
  reference's eps = 1.49012e-08, h0 = Δt/100 defaults) lands within the
  1e-6 north-star of the oracle for all six reference example systems over
  the README horizon ``t ∈ [0, 1]`` (``README.md:141``).
* **Order of convergence**: every fixed-step method's empirical global
  order matches its nominal order, and the embedded rkf45/dopri5 advances
  propagate at their design orders — a misimplemented tableau or control
  law cannot pass these.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamilton_tpu.integrators.adaptive import embedded_rk_step
from hamilton_tpu.integrators.evolve import evolve_ham, evolve_ham_fixed
from hamilton_tpu.integrators.fixed import make_stepper
from hamilton_tpu.integrators.tableaus import DOPRI5, RKF45
from hamilton_tpu.mechanics import ham_rhs, to_phase
from hamilton_tpu.models import (
    bezier,
    double_pendulum,
    pendulum,
    room,
    spring,
    two_body,
)
from hamilton_tpu.state import Phase

EXAMPLES = {
    "pendulum": lambda: pendulum(theta0=0.5, omega0=0.5),
    "double_pendulum": lambda: double_pendulum(),
    "room": lambda: room(),
    "two_body": lambda: two_body(),
    "spring": lambda: spring(),
    "bezier": lambda: bezier(),
}


def _ground_truth(system, ph0, t_grid, dt):
    """f64 gauss6 fixed-step trajectory emitted on ``t_grid`` (must be a
    uniform grid whose spacing is an integer multiple of ``dt``)."""
    spacing = float(t_grid[1] - t_grid[0])
    emit_every = int(round(spacing / dt))
    assert abs(emit_every * dt - spacing) < 1e-12
    n_steps = emit_every * (len(t_grid) - 1)
    return evolve_ham_fixed(
        system, ph0, dt, n_steps, method="gauss6", iters=10,
        emit_every=emit_every,
    )


class TestAdaptiveVsGroundTruth:
    """The six reference examples over t ∈ [0, 1] (README.md:141 horizon)."""

    @pytest.mark.parametrize("name", sorted(EXAMPLES))
    def test_adaptive_matches_gauss6_oracle(self, name):
        ex = EXAMPLES[name]()
        ph0 = ex.init_phase.astype(jnp.float64)
        ts = jnp.arange(0.0, 1.05, 0.1, dtype=jnp.float64)

        truth = _ground_truth(ex.system, ph0, ts, dt=1e-4)
        # Richardson self-consistency: the oracle at 2× the dt must agree
        # far below the assertion tolerance, or it is not converged enough
        # to BE an oracle.
        truth_coarse = _ground_truth(ex.system, ph0, ts, dt=2e-4)
        self_err = float(jnp.max(jnp.abs(truth.q - truth_coarse.q)))
        assert self_err < 1e-10, f"oracle not converged: {self_err:.2e}"

        adaptive = evolve_ham(ex.system, ph0, ts)  # GSL defaults
        err_q = float(jnp.max(jnp.abs(adaptive.q - truth.q)))
        err_p = float(jnp.max(jnp.abs(adaptive.p - truth.p)))
        # north-star: reference-semantics trajectories to 1e-6
        assert err_q < 1e-6, f"{name}: q error vs oracle {err_q:.2e}"
        assert err_p < 1e-6, f"{name}: p error vs oracle {err_p:.2e}"

    def test_adaptive_dopri5_also_within_oracle(self):
        """A second, independent adaptive tableau must land on the same
        trajectories — catches tableau-specific transcription errors."""
        ex = EXAMPLES["double_pendulum"]()
        ph0 = ex.init_phase.astype(jnp.float64)
        ts = jnp.arange(0.0, 1.05, 0.1, dtype=jnp.float64)
        truth = _ground_truth(ex.system, ph0, ts, dt=1e-4)
        out = evolve_ham(ex.system, ph0, ts, method="dopri5")
        assert float(jnp.max(jnp.abs(out.q - truth.q))) < 1e-6


def _endpoint(system, ph0, dt, n_steps, method, **kw):
    stepper = make_stepper(system, method, **kw)

    @jax.jit
    def run(ph):
        c0 = stepper.init(ph)
        c = jax.lax.fori_loop(
            0, n_steps, lambda i, c: stepper.step(c, jnp.float64(dt)), c0
        )
        return stepper.extract(c)

    return run(ph0)


class TestOrderOfConvergence:
    """Empirical global order ≈ nominal order over a fixed interval (single
    pendulum at moderate amplitude: smooth, non-chaotic, nonlinear)."""

    @pytest.fixture(scope="class")
    def problem(self):
        ex = pendulum(theta0=1.0, omega0=0.3)
        ph0 = ex.init_phase.astype(jnp.float64)
        # reference endpoint at t = 0.8 from the tiny-dt gauss6 oracle
        truth = evolve_ham_fixed(
            ex.system, ph0, 1e-4, 8000, method="gauss6", iters=10,
            emit_every=8000,
        )
        return ex.system, ph0, Phase(truth.q[-1], truth.p[-1])

    @pytest.mark.parametrize(
        "method,order,kw",
        [
            ("rk4", 4, dict()),
            ("leapfrog", 2, dict(iters=(8, 6))),
            ("yoshida4", 4, dict(iters=(8, 6))),
            ("midpoint", 2, dict(iters=10)),
            ("gauss4", 4, dict(iters=12)),
            ("tao2", 2, dict(omega=50.0)),
        ],
    )
    def test_fixed_step_order(self, problem, method, order, kw):
        system, ph0, ref = problem
        t_end, dts = 0.8, (0.02, 0.01)
        errs = []
        for dt in dts:
            out = _endpoint(system, ph0, dt, int(round(t_end / dt)), method,
                            **kw)
            errs.append(float(jnp.max(jnp.abs(out.q - ref.q))))
        observed = np.log2(errs[0] / errs[1])
        assert observed > order - 0.5, (
            f"{method}: observed order {observed:.2f} < nominal {order}"
        )

    @pytest.mark.parametrize(
        "tab,min_order", [(RKF45, 4), (DOPRI5, 5)]
    )
    def test_embedded_advance_order(self, problem, tab, min_order):
        """The embedded tableaus' *advance* solutions propagate at their
        design order (rkf45 advances the 4th-order solution, GSL-style;
        dopri5 the 5th) — a transposed/miscopied tableau row fails this."""
        system, ph0, ref = problem
        rhs = ham_rhs(system)
        step = embedded_rk_step(rhs, tab)
        t_end, dts = 0.8, (0.02, 0.01)
        errs = []
        for dt in dts:
            n_steps = int(round(t_end / dt))
            y = jax.jit(
                lambda y0: jax.lax.fori_loop(
                    0, n_steps, lambda i, y: step(y, jnp.float64(dt))[0], y0
                )
            )(ph0.flatten())
            q = Phase.unflatten(y).q
            errs.append(float(jnp.max(jnp.abs(q - ref.q))))
        observed = np.log2(errs[0] / errs[1])
        assert observed > min_order - 0.5, (
            f"observed order {observed:.2f} < nominal {min_order}"
        )

    def test_error_estimate_scales_one_order_higher(self):
        """The embedded error estimate must scale as O(h^{p+1}) — the
        property the GSL step controller relies on."""
        ex = pendulum(theta0=1.0, omega0=0.3)
        ph0 = ex.init_phase.astype(jnp.float64)
        rhs = ham_rhs(ex.system)
        step = embedded_rk_step(rhs, RKF45)
        y0 = ph0.flatten()
        errs = []
        for h in (0.02, 0.01):
            _, yerr = step(y0, jnp.float64(h))
            errs.append(float(jnp.max(jnp.abs(yerr))))
        observed = np.log2(errs[0] / errs[1])
        assert observed > 4.5  # local error estimate ~ O(h^5)


class TestSymplecticity:
    """The symplectic members' step maps must satisfy (dPhi)^T J (dPhi) = J
    (the defining structural property; RK4 must fail it) — computed with
    jax.jacfwd through one step on the double pendulum."""

    @pytest.mark.parametrize(
        "method,kw,symplectic",
        [
            ("leapfrog", dict(iters=(12, 10)), True),
            ("gauss4", dict(iters=16), True),
            ("rk4", dict(), False),
        ],
    )
    def test_step_jacobian_preserves_symplectic_form(self, method, kw,
                                                     symplectic):
        ex = double_pendulum()
        system = ex.system
        ph0 = ex.init_phase.astype(jnp.float64)
        n = 2
        dt = 0.05  # large enough that RK4's violation is visible

        stepper = make_stepper(system, method, **kw)

        def step_map(z):
            ph = Phase(z[:n], z[n:])
            c = stepper.init(ph)
            c = stepper.step(c, jnp.float64(dt))
            out = stepper.extract(c)
            return jnp.concatenate([out.q, out.p])

        z0 = jnp.concatenate([ph0.q, ph0.p])
        dphi = jax.jacfwd(step_map)(z0)
        jmat = jnp.block([
            [jnp.zeros((n, n)), jnp.eye(n)],
            [-jnp.eye(n), jnp.zeros((n, n))],
        ])
        resid = float(jnp.max(jnp.abs(dphi.T @ jmat @ dphi - jmat)))
        if symplectic:
            # residual floor set by the finite fixed-point iteration counts
            assert resid < 1e-8, f"{method}: symplectic residual {resid:.2e}"
        else:
            assert resid > 1e-8  # RK4 is not symplectic

    def test_tao2_symplectic_in_extended_phase_space(self):
        """Tao's method is symplectic in the EXTENDED space (q, x; p, y) —
        the (q, p) projection (the averaging in extract) is not, which is
        expected and documented (PRE 94, 043303 (2016)).  Verify the
        extended step map preserves the canonical form with coordinates
        ordered (q, x) positions, (p, y) momenta."""
        from hamilton_tpu.integrators.fixed import _TaoState

        ex = double_pendulum()
        ph0 = ex.init_phase.astype(jnp.float64)
        n = 2
        dt = 0.05
        stepper = make_stepper(ex.system, "tao2", omega=100.0)

        def step_map(z):
            st = _TaoState(q=z[0:n], x=z[n:2 * n],
                           p=z[2 * n:3 * n], y=z[3 * n:4 * n])
            st = stepper.step(st, jnp.float64(dt))
            return jnp.concatenate([st.q, st.x, st.p, st.y])

        # a general extended point: copies slightly separated
        z0 = jnp.concatenate([
            ph0.q, ph0.q + 1e-3, ph0.p, ph0.p - 1e-3,
        ])
        dphi = jax.jacfwd(step_map)(z0)
        eye = jnp.eye(2 * n)
        zero = jnp.zeros((2 * n, 2 * n))
        jmat = jnp.block([[zero, eye], [-eye, zero]])
        resid = float(jnp.max(jnp.abs(dphi.T @ jmat @ dphi - jmat)))
        assert resid < 1e-12, f"tao2 extended-space residual {resid:.2e}"
