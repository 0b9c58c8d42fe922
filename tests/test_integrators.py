"""Integrator tests: convergence order, energy conservation, API semantics.

Covers SURVEY.md §4 items (a) energy conservation over long horizons,
(d) trajectory parity (vs a tight-tolerance self-oracle here; GSL-native
parity lives in test_native.py), (f) closed-form dynamics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamilton_tpu import (
    Config,
    Phase,
    evolve_ham,
    evolve_ham_c,
    evolve_ham_c_list,
    evolve_ham_fixed,
    evolve_ham_list,
    hamiltonian,
    mk_system_cart,
    step_ham,
    step_ham_c,
    to_phase,
    from_phase,
)
from hamilton_tpu.integrators.fixed import FIXED_METHODS, make_stepper
from hamilton_tpu.models import double_pendulum, pendulum, two_body

DP = double_pendulum()
PEND = pendulum(theta0=0.1, omega0=0.0)


def ref_trajectory(system, phase0, ts):
    """High-accuracy oracle: adaptive dopri5 at very tight tolerance."""
    return evolve_ham(
        system, phase0, ts, eps_abs=1e-13, eps_rel=1e-13, method="dopri5"
    )


class TestEvolveSemantics:
    def test_evolve_ham_first_output_is_initial(self):
        ph0 = DP.init_phase
        out = evolve_ham(DP.system, ph0, jnp.linspace(0.0, 0.5, 6))
        np.testing.assert_allclose(np.asarray(out.q[0]), np.asarray(ph0.q))
        np.testing.assert_allclose(np.asarray(out.p[0]), np.asarray(ph0.p))

    def test_evolve_ham_requires_two_times(self):
        with pytest.raises(ValueError):
            evolve_ham(DP.system, DP.init_phase, jnp.array([0.5]))

    def test_evolve_ham_list_empty(self):
        assert evolve_ham_list(DP.system, DP.init_phase, []) == []

    def test_evolve_ham_list_singleton_quirk(self):
        """[x] pads to [0, x] and returns only the endpoint (Hamilton.hs:427-429)."""
        single = evolve_ham_list(DP.system, DP.init_phase, [0.3])
        assert len(single) == 1
        pair = evolve_ham(DP.system, DP.init_phase, jnp.array([0.0, 0.3]))
        np.testing.assert_allclose(
            np.asarray(single[0].q), np.asarray(pair.q[1]), rtol=1e-12
        )

    def test_evolve_ham_list_matches_evolve_ham(self):
        ts = [0.0, 0.1, 0.2, 0.3]
        lst = evolve_ham_list(DP.system, DP.init_phase, ts)
        vec = evolve_ham(DP.system, DP.init_phase, jnp.asarray(ts))
        assert len(lst) == 4
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(lst[i].q), np.asarray(vec.q[i]), rtol=1e-12
            )

    def test_step_ham_equals_evolve_endpoint(self):
        """stepHam dt = evolveHam over (0, dt) index 1 (Hamilton.hs:400-402)."""
        stepped = step_ham(DP.system, DP.init_phase, 0.25)
        pair = evolve_ham(DP.system, DP.init_phase, jnp.array([0.0, 0.25]))
        np.testing.assert_allclose(
            np.asarray(stepped.q), np.asarray(pair.q[1]), rtol=1e-12
        )

    def test_iterate_ham_streaming(self):
        """iterate_ham ≡ the reference README's lazy
        ``iterate (stepHam dt s) ph0`` stream (README.md:147-151): starts at
        ph0, each element one step_ham advance."""
        from itertools import islice

        from hamilton_tpu import iterate_ham

        stream = list(islice(iterate_ham(DP.system, DP.init_phase, 0.1), 4))
        np.testing.assert_array_equal(np.asarray(stream[0].q),
                                      np.asarray(DP.init_phase.q))
        ph = DP.init_phase
        for k in (1, 2, 3):
            ph = step_ham(DP.system, ph, 0.1)
            np.testing.assert_allclose(np.asarray(stream[k].q),
                                       np.asarray(ph.q), rtol=1e-12)

    def test_config_space_wrappers(self):
        """C-variants = fromPhase ∘ phase-op ∘ toPhase (Hamilton.hs:470-515)."""
        c0 = DP.init_config
        c1 = step_ham_c(DP.system, c0, 0.2)
        ph1 = step_ham(DP.system, to_phase(DP.system, c0), 0.2)
        expect = from_phase(DP.system, ph1)
        np.testing.assert_allclose(np.asarray(c1.q), np.asarray(expect.q), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(c1.v), np.asarray(expect.v), rtol=1e-12)

        ts = jnp.array([0.0, 0.1, 0.2])
        cs = evolve_ham_c(DP.system, c0, ts)
        assert cs.q.shape == (3, 2)
        cs_list = evolve_ham_c_list(DP.system, c0, [0.0, 0.1, 0.2])
        np.testing.assert_allclose(
            np.asarray(cs_list[2].q), np.asarray(cs.q[2]), rtol=1e-12
        )

    def test_jit_evolve(self):
        fn = jax.jit(
            lambda ph: evolve_ham(DP.system, ph, jnp.array([0.0, 0.1, 0.2]))
        )
        out = fn(DP.init_phase)
        assert out.q.shape == (3, 2)
        out2 = evolve_ham(DP.system, DP.init_phase, jnp.array([0.0, 0.1, 0.2]))
        np.testing.assert_allclose(np.asarray(out.q), np.asarray(out2.q), rtol=1e-12)


class TestAccuracy:
    def test_rkf45_matches_tight_oracle_double_pendulum(self):
        """README.md:124-143 setup over [0, 0.1 .. 1]: default-tolerance RKF45
        must track a 1e-13-tolerance oracle to well under 1e-6."""
        ph0 = to_phase(DP.system, Config(jnp.array([1.0, 0.0]), jnp.array([0.0, 0.5])))
        ts = jnp.arange(0.0, 1.05, 0.1)
        got = evolve_ham(DP.system, ph0, ts, method="rkf45")
        ref = ref_trajectory(DP.system, ph0, ts)
        np.testing.assert_allclose(
            np.asarray(got.q), np.asarray(ref.q), atol=5e-7
        )

    def test_small_angle_pendulum_period(self):
        """SURVEY §4 (f): small-angle period T = 2π/√g with U = y, l = 1."""
        g = 1.0  # pendulum example has U = y → effective g = 1 for ml²=1
        amp = 1e-3
        ex = pendulum(theta0=amp, omega0=0.0)
        period = 2 * np.pi / np.sqrt(g)
        ts = jnp.array([0.0, period])
        out = evolve_ham(ex.system, ex.init_phase, ts)
        # after one period the angle returns to amp (to O(amp^3) anharmonicity)
        np.testing.assert_allclose(float(out.q[1, 0]), amp, rtol=1e-3)

    def test_kepler_orbit_closes(self):
        """SURVEY §4 (f): bound two-body orbit returns to its initial state
        after one radial period (Kepler orbits close)."""
        ex = two_body(m1=5.0, m2=0.5, omega0=0.5)
        ph0 = ex.init_phase
        h0 = float(hamiltonian(ex.system, ph0))
        assert h0 < 0, "test setup must be a bound orbit"
        # semimajor axis & period from vis-viva: E = −G m1 m2 / (2a), G=1
        mu = (5.0 + 0.5)  # G(m1+m2) with G=1
        m1, m2 = 5.0, 0.5
        a = -(m1 * m2) / (2 * h0)
        period = 2 * np.pi * np.sqrt(a**3 / mu)
        out = evolve_ham(ex.system, ph0, jnp.array([0.0, period]), method="dopri5",
                         eps_abs=1e-12, eps_rel=1e-12)
        np.testing.assert_allclose(float(out.q[1, 0]), float(ph0.q[0]), rtol=1e-5)

    @pytest.mark.parametrize("method,order", [("rk4", 4), ("midpoint", 2),
                                              ("gauss4", 4), ("leapfrog", 2),
                                              ("yoshida4", 4), ("tao2", 2)])
    def test_fixed_step_convergence_order(self, method, order):
        """Each fixed-step method converges at its nominal order on the
        double pendulum (non-separable H — the hard case)."""
        ph0 = DP.init_phase
        t_end = 0.4
        ref = ref_trajectory(DP.system, ph0, jnp.array([0.0, t_end]))
        ref_q = np.asarray(ref.q[1])
        errs = []
        for n in (30, 60):
            out = evolve_ham_fixed(
                DP.system, ph0, t_end / n, n, method=method, emit_every=n,
                iters=5, omega=50.0,
            )
            errs.append(np.max(np.abs(np.asarray(out.q[-1]) - ref_q)))
        rate = np.log2(errs[0] / errs[1])
        assert rate > order - 0.55, f"{method}: observed rate {rate:.2f}, errs {errs}"


class TestEnergyConservation:
    @pytest.mark.parametrize("method", ["leapfrog", "midpoint", "gauss4", "gauss6",
                                        "yoshida4", "tao4"])
    def test_symplectic_bounded_drift_double_pendulum(self, method):
        """Symplectic members keep |ΔH/H₀| bounded and small over a long
        horizon on the chaotic double pendulum."""
        ph0 = DP.init_phase
        h0 = float(hamiltonian(DP.system, ph0))
        n, dt = 2000, 0.005  # t = 10
        out = evolve_ham_fixed(
            DP.system, ph0, dt, n, method=method, emit_every=100, iters=8, omega=40.0
        )
        hs = jax.vmap(lambda q, p: hamiltonian(DP.system, Phase(q, p)))(out.q, out.p)
        drift = np.max(np.abs((np.asarray(hs) - h0) / h0))
        # order-2 members at dt=5e-3: drift ~ O(dt²·C); yoshida4/tao4 are
        # order 4 with large error constants; gauss members are the tightest
        limit = {"leapfrog": 2e-3, "midpoint": 2e-3, "tao4": 2e-3,
                 "yoshida4": 5e-5, "gauss4": 5e-6, "gauss6": 5e-8}[method]
        assert drift < limit, f"{method}: drift {drift:.2e}"

    def test_gauss4_drift_tiny_at_small_dt(self):
        """The headline-metric regime: gauss4 at dt=1e-3 over 10⁴ steps keeps
        drift far below 1e-6 (the 10⁵-step version runs in the benchmark)."""
        ph0 = DP.init_phase
        h0 = float(hamiltonian(DP.system, ph0))
        out = evolve_ham_fixed(
            DP.system, ph0, 1e-3, 10_000, method="gauss4", emit_every=1000, iters=6
        )
        hs = jax.vmap(lambda q, p: hamiltonian(DP.system, Phase(q, p)))(out.q, out.p)
        drift = np.max(np.abs((np.asarray(hs) - h0) / h0))
        assert drift < 1e-9, f"gauss4 drift {drift:.2e}"

    def test_rk4_drifts_more_than_gauss4(self):
        """Sanity: the non-symplectic member drifts secularly; the symplectic
        one doesn't (the reason the TPU path defaults to gauss4)."""
        ph0 = DP.init_phase
        h0 = float(hamiltonian(DP.system, ph0))

        def drift_of(method):
            out = evolve_ham_fixed(
                DP.system, ph0, 0.01, 2000, method=method, emit_every=2000, iters=8
            )
            h = float(hamiltonian(DP.system, Phase(out.q[-1], out.p[-1])))
            return abs((h - h0) / h0)

        assert drift_of("gauss4") < drift_of("rk4") + 1e-12


class TestStepperRegistry:
    def test_all_methods_construct_and_step(self):
        from jax.experimental.pallas import tpu as pltpu

        ph0 = PEND.init_phase
        for method in FIXED_METHODS:
            if method.endswith("_fused"):
                # fused kernel methods need register-tile batches and run
                # under the interpreter on CPU (depth in test_pallas_step)
                st = make_stepper(PEND.system, method, iters=(2, 1))
                ph_b = Phase(jnp.tile(ph0.q, (1024, 1)),
                             jnp.tile(ph0.p, (1024, 1)))
                with pltpu.force_tpu_interpret_mode():
                    carry = st.init(ph_b)
                    carry = st.step(carry, jnp.asarray(0.01))
                    out = st.extract(carry)
                assert out.q.shape == ph_b.q.shape
                assert np.all(np.isfinite(np.asarray(out.q)))
                continue
            st = make_stepper(PEND.system, method, iters=4, omega=10.0)
            carry = st.init(ph0)
            carry = st.step(carry, jnp.asarray(0.01))
            out = st.extract(carry)
            assert out.q.shape == ph0.q.shape
            assert np.all(np.isfinite(np.asarray(out.q)))

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            make_stepper(PEND.system, "nope")

    def test_split_iteration_counts(self):
        """(iters_p, iters_q) splits the leapfrog loops; the warm-started
        split counts must land within the converged step's accuracy (the
        ensemble hot-loop configuration — docs/design.md)."""
        from hamilton_tpu.integrators.evolve import evolve_ham_fixed

        ph0 = DP.init_phase

        def run(iters, n=200):
            out = evolve_ham_fixed(
                DP.system, ph0, 1e-3, n, method="leapfrog", iters=iters,
                emit_every=n,
            )
            return out.q[-1]

        ref = run((8, 8))
        out = run((2, 1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-9)
        # Gauss-Seidel mode (factor once at the warm predictor) must stay
        # within the same envelope
        out0 = run((2, 0))
        np.testing.assert_allclose(np.asarray(out0), np.asarray(ref),
                                   rtol=0, atol=1e-8)
        # split counts are a leapfrog/yoshida4-only concept
        with pytest.raises(ValueError):
            make_stepper(DP.system, "gauss4", iters=(2, 1))


class TestBatchedAdaptive:
    def test_batched_evolve_shared_step(self):
        """Adaptive evolve on a batched Phase: one shared step size
        controlled by the worst member (the SURVEY §7 batched-adaptive
        mitigation); per-member results still track per-member solves to
        solver accuracy on a short horizon."""
        ph0 = DP.init_phase
        b = 3
        q = jnp.stack([ph0.q + 0.001 * i for i in range(b)])
        p = jnp.tile(ph0.p, (b, 1))
        batched = evolve_ham(DP.system, Phase(q, p), jnp.array([0.0, 0.3]))
        assert batched.q.shape == (2, b, 2)
        for i in range(b):
            single = evolve_ham(DP.system, Phase(q[i], p[i]), jnp.array([0.0, 0.3]))
            np.testing.assert_allclose(
                np.asarray(batched.q[1, i]), np.asarray(single.q[1]), atol=1e-6
            )

    def test_batched_evolve_per_member(self):
        """batch_mode='per_member': an N-member batch is STEP-FOR-STEP
        identical to N single runs (the reference's per-trajectory adaptive
        behavior, Hamilton.hs:445-448) — bitwise-level equivalence, not just
        solver-accuracy agreement."""
        ph0 = DP.init_phase
        b = 3
        q = jnp.stack([ph0.q + 0.05 * i for i in range(b)])
        p = jnp.tile(ph0.p, (b, 1))
        ts = jnp.array([0.0, 0.2, 0.5, 1.0])
        batched = evolve_ham(
            DP.system, Phase(q, p), ts, batch_mode="per_member"
        )
        assert batched.q.shape == (len(ts), b, 2)
        for i in range(b):
            single = evolve_ham(DP.system, Phase(q[i], p[i]), ts)
            np.testing.assert_allclose(
                np.asarray(batched.q[:, i]), np.asarray(single.q),
                rtol=1e-12, atol=1e-12,
            )
            np.testing.assert_allclose(
                np.asarray(batched.p[:, i]), np.asarray(single.p),
                rtol=1e-12, atol=1e-12,
            )

    def test_shared_vs_per_member_controllers_differ(self):
        """The two batched controllers are genuinely different: lock-step
        shared stepping is controlled by the worst member, so with
        heterogeneous members its trajectory differs (at solver-error level)
        from the per-member one."""
        ph0 = DP.init_phase
        q = jnp.stack([ph0.q, ph0.q + 0.4])
        p = jnp.stack([ph0.p, ph0.p + 0.3])
        ts = jnp.array([0.0, 1.0])
        shared = evolve_ham(DP.system, Phase(q, p), ts, batch_mode="shared")
        per = evolve_ham(DP.system, Phase(q, p), ts, batch_mode="per_member")
        assert float(jnp.max(jnp.abs(shared.q - per.q))) > 0.0


class TestCompensated:
    def test_compensated_f32_drift_much_smaller(self):
        """Kahan-compensated f32 integration cuts long-horizon drift ~30×
        (the low-precision route to the <1e-6 drift target)."""
        from hamilton_tpu.ensemble import evolve_ensemble_final

        sys32 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), DP.system
        )
        ph32 = Phase(DP.init_phase.q.astype(jnp.float32)[None],
                     DP.init_phase.p.astype(jnp.float32)[None])
        drifts = {}
        for comp in (False, True):
            _, drift = evolve_ensemble_final(
                sys32, ph32, 1e-3, 20_000, method="gauss4", iters=6,
                drift_every=1000, compensated=comp, drift_dtype=jnp.float64,
            )
            drifts[comp] = float(jnp.max(drift))
        assert drifts[True] < drifts[False] / 5
        assert drifts[True] < 3e-6

    def test_compensated_matches_plain_in_f64(self):
        """At f64 the compensation is a no-op to ~1e-12."""
        plain = evolve_ham_fixed(DP.system, DP.init_phase, 1e-2, 100,
                                 method="gauss4", emit_every=100)
        comp = evolve_ham_fixed(DP.system, DP.init_phase, 1e-2, 100,
                                method="gauss4", emit_every=100,
                                compensated=True)
        np.testing.assert_allclose(np.asarray(comp.q[-1]),
                                   np.asarray(plain.q[-1]), rtol=1e-12)

    def test_compensated_leapfrog_runs(self):
        out = evolve_ham_fixed(DP.system, DP.init_phase, 1e-2, 50,
                               method="leapfrog", emit_every=50,
                               compensated=True)
        assert np.all(np.isfinite(np.asarray(out.q)))

    def test_compensated_unsupported_method_raises(self):
        from hamilton_tpu.integrators.fixed import make_stepper

        with pytest.raises(ValueError, match="compensated"):
            make_stepper(DP.system, "rk4", compensated=True)


class TestAdaptiveController:
    def test_stiff_start_triggers_rejections(self):
        """A deliberately huge initial step must be rejected and shrunk —
        exercising the GSL reject/retry branch (control law: rmax > 1.1 →
        h *= clip(0.9·rmax^(-1/5), 0.2, 1))."""
        from hamilton_tpu.integrators.adaptive import gsl_evolve_to
        from hamilton_tpu.mechanics import ham_rhs

        rhs = ham_rhs(DP.system)
        y0 = DP.init_phase.flatten()
        y1, h_next = gsl_evolve_to(rhs, y0, 0.0, 1.0, 1.0)  # h0 = full span
        ref = ref_trajectory(DP.system, DP.init_phase, jnp.array([0.0, 1.0]))
        np.testing.assert_allclose(
            np.asarray(Phase.unflatten(y1).q), np.asarray(ref.q[1]), atol=5e-6
        )
        assert float(h_next) < 1.0  # the controller had to shrink

    def test_suggested_step_carries_across_intervals(self):
        """GSL driver semantics: h is not reset between output times, so a
        two-interval evolve equals two chained single-interval evolves."""
        from hamilton_tpu.integrators.adaptive import gsl_evolve_to
        from hamilton_tpu.mechanics import ham_rhs

        rhs = ham_rhs(DP.system)
        y0 = DP.init_phase.flatten()
        h0 = 0.1 / 100.0
        ya, ha = gsl_evolve_to(rhs, y0, 0.0, 0.1, h0)
        yb, _ = gsl_evolve_to(rhs, ya, 0.1, 0.2, ha)
        out = evolve_ham(DP.system, DP.init_phase, jnp.array([0.0, 0.1, 0.2]))
        np.testing.assert_allclose(
            np.asarray(Phase.unflatten(yb).q), np.asarray(out.q[2]), rtol=1e-12
        )

    def test_tight_vs_loose_tolerance_step_counts(self):
        """Tighter tolerance → more steps (controller actually controls)."""
        from hamilton_tpu.integrators.adaptive import (
            _EvolveState, gsl_evolve_to)
        from hamilton_tpu.mechanics import ham_rhs
        import jax as _jax

        rhs = ham_rhs(DP.system)
        y0 = DP.init_phase.flatten()

        # count steps by instrumenting through the public API result h:
        # instead compare endpoint accuracy directly
        loose, _ = gsl_evolve_to(rhs, y0, 0.0, 0.5, 0.005,
                                 eps_abs=1e-4, eps_rel=1e-4)
        tight, _ = gsl_evolve_to(rhs, y0, 0.0, 0.5, 0.005,
                                 eps_abs=1e-12, eps_rel=1e-12)
        ref = ref_trajectory(DP.system, DP.init_phase, jnp.array([0.0, 0.5]))
        ref_y = np.concatenate([np.asarray(ref.q[1]), np.asarray(ref.p[1])])
        err_loose = np.max(np.abs(np.asarray(loose) - ref_y))
        err_tight = np.max(np.abs(np.asarray(tight) - ref_y))
        assert err_tight < err_loose / 10


class TestEvolveOptions:
    def test_h0_override(self):
        """A custom initial step converges to the same answer (control takes
        over after the first steps)."""
        ph0 = DP.init_phase
        a = evolve_ham(DP.system, ph0, jnp.array([0.0, 0.4]))
        b = evolve_ham(DP.system, ph0, jnp.array([0.0, 0.4]), h0=1e-5)
        np.testing.assert_allclose(np.asarray(a.q[1]), np.asarray(b.q[1]), atol=1e-7)

    def test_step_ham_method_passthrough(self):
        a = step_ham(DP.system, DP.init_phase, 0.2, method="dopri5")
        b = step_ham(DP.system, DP.init_phase, 0.2, method="rkf45")
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q), atol=1e-6)

    def test_nonuniform_output_times(self):
        ts = jnp.array([0.0, 0.05, 0.3, 0.35, 0.9])
        out = evolve_ham(DP.system, DP.init_phase, ts)
        assert out.q.shape == (5, 2)
        # cross-check the last point against a uniform-grid evolve
        ref = evolve_ham(DP.system, DP.init_phase, jnp.array([0.0, 0.45, 0.9]))
        np.testing.assert_allclose(np.asarray(out.q[-1]), np.asarray(ref.q[-1]),
                                   atol=1e-7)


class TestControllerSaturation:
    """The max_steps progress guard is now observable (VERDICT r3 item 6
    housekeeping): gsl_evolve_to/evolve_ham expose saturation instead of
    silently returning a state short of the requested time."""

    def test_gsl_evolve_to_stats(self):
        from hamilton_tpu.integrators.adaptive import gsl_evolve_to

        rhs = lambda y: -y  # noqa: E731
        y0 = jnp.ones(2)
        y1, h1, st = gsl_evolve_to(rhs, y0, 0.0, 1.0, 0.01,
                                   return_stats=True)
        assert not bool(st["saturated"])
        assert int(st["n_steps"]) > 0
        np.testing.assert_allclose(np.asarray(y1), np.exp(-1.0), rtol=1e-7)
        # a max_steps too small to reach t1 must flag, not lie
        y2, _, st2 = gsl_evolve_to(rhs, y0, 0.0, 1.0, 1e-6, max_steps=3,
                                   return_stats=True)
        assert bool(st2["saturated"])
        assert int(st2["n_steps"]) == 3

    def test_evolve_ham_stats(self):
        from hamilton_tpu.models import pendulum

        ex = pendulum()
        ts = jnp.linspace(0.0, 1.0, 5)
        out = evolve_ham(ex.system, ex.init_phase, ts, return_stats=True)
        traj, st = out
        assert traj.q.shape[0] == 5
        assert not bool(st["saturated"])
        assert int(st["max_interval_steps"]) >= 1
        # batched per-member mode aggregates over members too
        ph_b = Phase(jnp.stack([ex.init_phase.q, ex.init_phase.q + 0.1]),
                     jnp.stack([ex.init_phase.p, ex.init_phase.p]))
        traj_b, st_b = evolve_ham(ex.system, ph_b, ts,
                                  batch_mode="per_member",
                                  return_stats=True)
        assert traj_b.q.shape[:2] == (5, 2)
        assert st_b["saturated"].shape == ()

    def test_wrappers_pass_stats_through(self):
        from hamilton_tpu.integrators.evolve import (
            evolve_ham_c, evolve_ham_list, step_ham,
        )
        from hamilton_tpu.models import pendulum

        ex = pendulum()
        ph, st = step_ham(ex.system, ex.init_phase, 0.1, return_stats=True)
        assert ph.q.shape == (1,) and not bool(st["saturated"])
        phases, st2 = evolve_ham_list(ex.system, ex.init_phase, [0.3],
                                      return_stats=True)
        assert len(phases) == 1 and not bool(st2["saturated"])
        cfg, st3 = evolve_ham_c(ex.system, ex.init_config,
                                jnp.asarray([0.0, 0.2]), return_stats=True)
        assert cfg.q.shape[0] == 2 and not bool(st3["saturated"])
