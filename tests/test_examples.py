"""Example-system tests: construction, dimensions, dynamics sanity.

The reference treats its demos as the de-facto integration suite (SURVEY.md
§4); here each gets automated checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamilton_tpu import (
    Config,
    Phase,
    evolve_ham,
    evolve_ham_fixed,
    hamiltonian,
    step_ham,
    to_phase,
    underlying_pos,
)
from hamilton_tpu.models import (
    REGISTRY,
    bezier,
    bezier_curve,
    chain,
    double_pendulum,
    get_example,
    pendulum,
    room,
    spring,
    two_body,
)

ALL_NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_example_constructs_and_draws(name):
    ex = get_example(name)
    assert len(ex.coord_names) == ex.n
    assert ex.system.m == ex.m
    ph0 = ex.init_phase
    assert ph0.q.shape == (ex.n,)
    pts = ex.draw(underlying_pos(ex.system, ph0.q))
    for pt in pts:
        assert np.asarray(pt).shape == (2,)
        assert np.all(np.isfinite(np.asarray(pt)))


@pytest.mark.parametrize("name", ALL_NAMES)
def test_example_steps_and_conserves_energy_short(name):
    """One adaptive step; H conserved to solver tolerance."""
    ex = get_example(name)
    ph0 = ex.init_phase
    h0 = float(hamiltonian(ex.system, ph0))
    ph1 = step_ham(ex.system, ph0, 0.1)
    h1 = float(hamiltonian(ex.system, ph1))
    assert np.isfinite(h1)
    assert abs(h1 - h0) < 1e-6 * max(abs(h0), 1.0)


def test_example_dims_match_reference():
    """System (m, n) pairs from app/Examples.hs:61-183."""
    expect = {
        "pend": (2, 1),
        "doublepend": (4, 2),
        "room": (2, 2),
        "twobody": (4, 2),
        "spring": (3, 3),
        "bezier": (2, 1),
        "chain": (40, 20),
        "ellipse": (2, 1),
    }
    for name, (m, n) in expect.items():
        ex = get_example(name)
        assert (ex.m, ex.n) == (m, n), name


class TestPendulum:
    def test_equilibrium_is_fixed_point(self):
        """At θ=0, ω=0 the pendulum stays put."""
        ex = pendulum(theta0=0.0, omega0=0.0)
        ph1 = step_ham(ex.system, ex.init_phase, 0.5)
        np.testing.assert_allclose(np.asarray(ph1.q), [0.0], atol=1e-10)

    def test_draw_single_point(self):
        ex = pendulum()
        pts = ex.draw(underlying_pos(ex.system, jnp.array([0.3])))
        assert len(pts) == 1


class TestDoublePendulum:
    def test_reference_defaults(self):
        """Defaults m1=m2=1, q0=(π/2, 0), q̇0=0 (app/Examples.hs:94,196)."""
        ex = double_pendulum()
        np.testing.assert_allclose(
            np.asarray(ex.init_config.q), [np.pi / 2, 0.0], rtol=1e-12
        )
        np.testing.assert_allclose(np.asarray(ex.init_config.v), [0.0, 0.0])

    def test_draw_two_points(self):
        ex = double_pendulum()
        pts = ex.draw(underlying_pos(ex.system, ex.init_config.q))
        assert len(pts) == 2
        # at q=(π/2, 0): bob1 at (1, 1), bob2 at (1, 1) + (0, -1/2)... coords:
        # x2 = sin θ1 + sin θ2/2 = 1, y2 = 1 − cos θ1 − cos θ2/2 = 0.5
        np.testing.assert_allclose(np.asarray(pts[0]), [1.0, 1.0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(pts[1]), [1.0, 0.5], atol=1e-12)

    def test_mass_parameter_affects_dynamics(self):
        ex1 = double_pendulum(1.0, 1.0)
        ex2 = double_pendulum(1.0, 3.0)
        p1 = step_ham(ex1.system, ex1.init_phase, 0.3)
        p2 = step_ham(ex2.system, ex2.init_phase, 0.3)
        assert not np.allclose(np.asarray(p1.q), np.asarray(p2.q))


class TestRoom:
    def test_walls_confine(self):
        """Long trajectory stays (softly) inside the room box."""
        ex = room(theta=np.pi / 4)
        out = evolve_ham_fixed(ex.system, ex.init_phase, 0.005, 2000,
                               method="gauss4", emit_every=100)
        q = np.asarray(out.q)
        assert np.all(np.abs(q[:, 0]) < 2.5)
        assert np.all(np.abs(q[:, 1]) < 1.5)


class TestTwoBody:
    def test_angular_momentum_conserved(self):
        """θ is cyclic → p_θ exactly conserved by the dynamics."""
        ex = two_body()
        ph0 = ex.init_phase
        out = evolve_ham(ex.system, ph0, jnp.linspace(0.0, 5.0, 11))
        p_theta = np.asarray(out.p[:, 1])
        np.testing.assert_allclose(p_theta, p_theta[0], rtol=1e-7)

    def test_round_trip_baseline_config(self):
        """BASELINE configs[2]: toPhase/fromPhase round-trip on Kepler."""
        from hamilton_tpu import from_phase

        ex = two_body()
        c0 = ex.init_config
        c1 = from_phase(ex.system, to_phase(ex.system, c0))
        np.testing.assert_allclose(np.asarray(c1.v), np.asarray(c0.v), rtol=1e-10)


class TestSpring:
    def test_rail_confines_block(self):
        ex = spring()
        out = evolve_ham_fixed(ex.system, ex.init_phase, 0.002, 2500,
                               method="gauss4", emit_every=250)
        r = np.asarray(out.q[:, 0])
        assert np.all(np.abs(r) < 2.0)


class TestBezier:
    def test_curve_endpoints_hit_control_points(self):
        pts = ((0.0, 0.0), (1.0, 2.0), (3.0, 1.0))
        np.testing.assert_allclose(
            np.asarray(bezier_curve(pts, 0.0)), [0.0, 0.0], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(bezier_curve(pts, 1.0)), [3.0, 1.0], atol=1e-12
        )

    def test_linear_bezier_is_line(self):
        pts = ((0.0, 0.0), (2.0, 2.0))
        np.testing.assert_allclose(
            np.asarray(bezier_curve(pts, 0.25)), [0.5, 0.5], rtol=1e-12
        )

    def test_bead_stays_on_parameter_range(self):
        ex = bezier()
        out = evolve_ham_fixed(ex.system, ex.init_phase, 0.005, 2000,
                               method="gauss4", emit_every=100)
        t = np.asarray(out.q[:, 0])
        assert np.all(t > -0.5) and np.all(t < 1.5)

    def test_requires_points(self):
        with pytest.raises(ValueError):
            bezier(points=())


class TestChain:
    def test_small_chain_energy_conservation(self):
        ex = chain(n_links=5, theta0=0.3)
        ph0 = ex.init_phase
        h0 = float(hamiltonian(ex.system, ph0))
        out = evolve_ham_fixed(ex.system, ph0, 0.002, 1000,
                               method="gauss4", emit_every=500, iters=8)
        h = float(hamiltonian(ex.system, Phase(out.q[-1], out.p[-1])))
        assert abs((h - h0) / h0) < 1e-8

    def test_analytic_jacobian_matches_ad(self):
        """The chain's closed-form jacobian_fn must equal jacfwd(coords)
        exactly (it replaces the AD derivation on the hot path)."""
        import jax

        for n_links, ll in ((3, 1.0), (20, 0.7)):
            ex = chain(n_links=n_links, link_length=ll)
            rng = np.random.default_rng(7)
            for _ in range(3):
                q = jnp.asarray(rng.uniform(-2, 2, n_links))
                j_ad = jax.jacfwd(ex.system.coords_bound())(q)
                j_cf = ex.system.jacobian(q)
                np.testing.assert_allclose(
                    np.asarray(j_cf), np.asarray(j_ad), rtol=0, atol=1e-13
                )

    def test_analytic_mass_matrix_matches_jtmj(self):
        """K(q) = l²·cos(θi−θj)·S_max(i,j) must equal JᵀMJ from AD (it
        replaces the whole Jacobian pipeline on the hot path)."""
        import jax

        from hamilton_tpu.mechanics import mass_matrix

        for kwargs in (
            dict(n_links=3),
            dict(n_links=20, link_length=0.7),
            dict(n_links=4, masses=[2.0, 1.0, 0.5, 3.0]),
        ):
            ex = chain(**kwargs)
            rng = np.random.default_rng(11)
            q = jnp.asarray(rng.uniform(-2, 2, ex.n))
            j = jax.jacfwd(ex.system.coords_bound())(q)
            k_ref = j.T @ (ex.system.inertia[:, None] * j)
            k_cf = mass_matrix(ex.system, q)
            np.testing.assert_allclose(
                np.asarray(k_cf), np.asarray(k_ref), rtol=1e-12, atol=1e-12
            )

    def test_dtdq_fn_override_matches_ad_sweep(self):
        """A ``dtdq_fn`` override must slot into the dynamics exactly where
        the AD sweep sits.  Bead-on-a-parabola: coords q ↦ (q, q²) with unit
        masses gives K = 1 + 4q², T = ½w²(1+4q²), ∂T/∂q = 4·q·w² — a clean
        closed form (chain itself ships none: its closed forms measured
        slower than the AD sweep; see models/chain.py)."""
        from hamilton_tpu import mechanics as M
        from hamilton_tpu.state import Phase
        from hamilton_tpu.system import mk_system

        def coords(q):
            return jnp.concatenate([q, q * q])

        def potential(q):
            return jnp.sum(q * q)

        plain = mk_system(jnp.ones(2), coords, potential, n=1)
        override = mk_system(
            jnp.ones(2), coords, potential, n=1,
            dtdq_fn=lambda q, w: 4.0 * q * w * w,
        )
        rng = np.random.default_rng(7)
        ph = Phase(jnp.asarray(rng.uniform(-2, 2, (6, 1))),
                   jnp.asarray(rng.uniform(-1, 1, (6, 1))))
        for a, b in zip(M.ham_eqs(override, ph), M.ham_eqs(plain, ph)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-12
            )

    def test_dtdq_fn_shape_validated(self):
        from hamilton_tpu.system import mk_system

        with np.testing.assert_raises(ValueError):
            mk_system(
                jnp.ones(2), lambda q: q, lambda q: jnp.sum(q), n=2,
                dtdq_fn=lambda q, w: jnp.zeros(3),
            )

    def test_analytic_dynamics_match_ad_dynamics(self):
        """ham_eqs through the analytic K path ≡ through the AD/Jacobian
        path (the override must not change the physics)."""
        from hamilton_tpu.mechanics import ham_eqs
        from hamilton_tpu.system import mk_system_cart

        ex = chain(n_links=6, link_length=0.8)
        plain = mk_system_cart(
            ex.system.inertia, ex.system.coords_bound(),
            lambda xs: 5.0 * jnp.sum(xs[6:]), n=6,
        )
        # same potential form as chain's default (unit masses)
        rng = np.random.default_rng(3)
        ph = Phase(jnp.asarray(rng.uniform(-1, 1, (4, 6))),
                   jnp.asarray(rng.uniform(-1, 1, (4, 6))))
        dq_a, dp_a = ham_eqs(ex.system, ph)
        dq_b, dp_b = ham_eqs(plain, ph)
        np.testing.assert_allclose(np.asarray(dq_a), np.asarray(dq_b),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(dp_a), np.asarray(dp_b),
                                   rtol=1e-10, atol=1e-10)

    def test_jacobian_fn_shape_validated(self):
        from hamilton_tpu.system import mk_system

        with pytest.raises(ValueError, match="jacobian_fn"):
            mk_system(
                jnp.ones(2),
                lambda q: jnp.concatenate([q, q])[:2],
                lambda q: jnp.sum(q),
                n=2,
                jacobian_fn=lambda q: jnp.eye(3),  # wrong shape
            )

    def test_20_link_stress_config_steps(self):
        """BASELINE configs[3]: System 40 20 — one fixed step runs finite."""
        ex = chain(n_links=20)
        assert (ex.m, ex.n) == (40, 20)
        out = evolve_ham_fixed(ex.system, ex.init_phase, 0.001, 10,
                               method="gauss4", emit_every=10)
        assert np.all(np.isfinite(np.asarray(out.q)))

    def test_chain2_matches_equal_length_double_pendulum(self):
        """chain(2) with unit lengths is the double pendulum with an
        equal-length second arm; cross-check hamEqs via a custom system."""
        from hamilton_tpu import ham_eqs, mk_system_cart

        ex = chain(n_links=2, theta0=0.4)

        def coords(q):
            t1, t2 = q[0], q[1]
            return jnp.stack([
                jnp.sin(t1), 1 - jnp.cos(t1),
                jnp.sin(t1) + jnp.sin(t2), 2 - jnp.cos(t1) - jnp.cos(t2),
            ])

        sys2 = mk_system_cart(
            jnp.array([1.0, 1.0, 1.0, 1.0]), coords,
            lambda x: 5.0 * (x[1] + x[3]), n=2,
        )
        ph = Phase(jnp.array([0.4, 0.4]), jnp.array([0.1, -0.2]))
        dq_a, dp_a = ham_eqs(ex.system, ph)
        dq_b, dp_b = ham_eqs(sys2, ph)
        # chain's y_i uses Σ(1−cos) (offset differs by a constant → same dynamics)
        np.testing.assert_allclose(np.asarray(dq_a), np.asarray(dq_b), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(dp_a), np.asarray(dp_b), rtol=1e-10)


def test_get_example_unknown():
    with pytest.raises(KeyError):
        get_example("warp_drive")


class TestEllipse:
    def test_circle_reduces_to_pendulum_dynamics(self):
        """a = b = 1, g matched: bead-on-circle ≡ pendulum (System 2 1)."""
        from hamilton_tpu import ham_eqs
        from hamilton_tpu.models import ellipse

        exE = ellipse(a=1.0, b=1.0, gravity=1.0, theta0=0.5)
        exP = pendulum(theta0=0.5, omega0=0.0)
        ph = Phase(jnp.array([0.5]), jnp.array([0.3]))
        de = ham_eqs(exE.system, ph)
        dp = ham_eqs(exP.system, ph)
        np.testing.assert_allclose(np.asarray(de[0]), np.asarray(dp[0]), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(de[1]), np.asarray(dp[1]), rtol=1e-10)

    def test_energy_conserved(self):
        from hamilton_tpu.models import ellipse

        ex = ellipse()
        traj = evolve_ham_fixed(ex.system, ex.init_phase, 0.002, 2000,
                                method="gauss4", emit_every=200)
        from hamilton_tpu.utils import energy_drift

        assert float(energy_drift(ex.system, traj)) < 1e-8


class TestEnsembleSweepExample:
    def test_sweep_example_runs(self):
        import subprocess, sys, json as _json

        out = subprocess.run(
            [sys.executable, "examples/ensemble_sweep.py", "--batch", "16",
             "--steps", "200", "--cpu", "--json"],
            capture_output=True, text=True, timeout=300,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        data = _json.loads(out.stdout.strip().splitlines()[-1])
        assert data["batch"] == 16
        assert data["max_energy_drift"] < 1e-3


class TestSphericalPendulum:
    def test_dims_3d(self):
        from hamilton_tpu.models import spherical_pendulum

        ex = spherical_pendulum()
        assert (ex.m, ex.n) == (3, 2)

    def test_azimuthal_momentum_conserved(self):
        """φ is cyclic → p_φ (z angular momentum) exactly conserved."""
        from hamilton_tpu.models import spherical_pendulum

        ex = spherical_pendulum()
        out = evolve_ham(ex.system, ex.init_phase, jnp.linspace(0.0, 3.0, 7))
        p_phi = np.asarray(out.p[:, 1])
        np.testing.assert_allclose(p_phi, p_phi[0], rtol=1e-7)

    def test_momentum_closed_form(self):
        """p_φ = m sin²θ φ̇ at the initial state."""
        from hamilton_tpu.models import spherical_pendulum

        ex = spherical_pendulum(mass=2.0, theta0=1.0, phi_dot0=0.7)
        p_phi = float(ex.init_phase.p[1])
        np.testing.assert_allclose(p_phi, 2.0 * np.sin(1.0) ** 2 * 0.7, rtol=1e-10)

    def test_conical_orbit_stays_between_turning_points(self):
        from hamilton_tpu.models import spherical_pendulum

        ex = spherical_pendulum()
        traj = evolve_ham_fixed(ex.system, ex.init_phase, 0.005, 1000,
                                method="gauss4", emit_every=100)
        th = np.asarray(traj.q[:, 0])
        assert np.all(th > 0.05) and np.all(th < np.pi - 0.05)


class TestFreeParticle:
    def test_straight_line_motion(self):
        """SURVEY §4 (f): identity coords, U = 0 → uniform straight motion."""
        from hamilton_tpu import Config, mk_system, to_phase

        s = mk_system(jnp.array([1.0, 1.0]), lambda q: q, lambda q: 0.0, n=2)
        c0 = Config(jnp.array([0.0, 0.0]), jnp.array([0.3, -0.4]))
        out = evolve_ham(s, to_phase(s, c0), jnp.array([0.0, 1.0, 2.0]))
        np.testing.assert_allclose(
            np.asarray(out.q[2]), [0.6, -0.8], atol=1e-9
        )


def _load_example(name):
    """Import an examples/ script as a module (they are not packaged)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "examples", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestExampleScripts:
    @pytest.mark.slow
    def test_recovers_masses_library_path(self):
        """examples/fit_masses.py end-to-end (library leapfrog, CPU): the
        trajectory-misfit gradient through the symplectic scan recovers the
        hidden per-link masses.  Exercises reverse-mode through evolution —
        the capability the reference's construction-time-only AD lacks."""
        pytest.importorskip("optax")
        # rc 0 asserts max |m - m_true| < 0.05 after the fit
        assert _load_example("fit_masses").main(
            ["--iters", "60", "--steps", "120"]) == 0

    def test_hmc_example(self):
        """examples/hmc.py: B parallel HMC chains as one framework ensemble
        (identity-coords Cartesian system, batch-native leapfrog, jitted
        scan).  rc 0 asserts healthy acceptance AND the pooled sample
        covariance matches the analytic Σ entrywise — a statistical
        end-to-end check of H(q,p) and the symplectic stepper."""
        assert _load_example("hmc").main(
            ["--chains", "32", "--iters", "200", "--warmup", "50"]) == 0

    def test_chaos_scan_example(self):
        """examples/chaos_scan.py: the (IC × m₂) sweep ensemble runs on the
        native batched path and the Lyapunov map shows the double pendulum's
        regular→chaotic transition with angle (rc 0 asserts mean λ at large
        angles exceeds small angles)."""
        assert _load_example("chaos_scan").main(
            ["--cols", "24", "--rows", "8", "--steps", "2000"]) == 0

    @pytest.mark.slow
    def test_elastic_pendulum_example(self):
        """examples/elastic_pendulum.py: a USER-DEFINED system (not in the
        model zoo) joins the fused-kernel family through the public
        ``FusedForms`` interface.  rc 0 asserts (a) fused ≡ library parity
        at 1e-11 in interpreter mode and (b) the swept-k ensemble's swing
        amplification peaks at the autoparametric 2:1 resonance
        k_res = 3mg/l₀."""
        assert _load_example("elastic_pendulum").main(
            ["--sweep", "24", "--steps", "6000"]) == 0

    def test_user_fused_family_param_sweep_parity(self):
        """Per-member (k, l₀) sweeps ride the USER-declared FusedForms as
        runtime coefficient tiles — fused ≡ library with batched params,
        the same contract the in-zoo families are held to
        (tests/test_pallas_step.py)."""
        from jax.experimental.pallas import tpu as pltpu

        from hamilton_tpu.integrators.fixed import make_stepper

        b = 1024
        rng = np.random.default_rng(7)
        base = _load_example("elastic_pendulum").make_system()
        sysb = base.replace_params({
            "mass": jnp.asarray(0.5 + rng.random(b)),
            "gravity": jnp.full((b,), 9.8),
            "spring_k": jnp.asarray(15.0 + 30.0 * rng.random(b)),
            "rest_length": jnp.asarray(0.8 + 0.4 * rng.random(b)),
        })
        ph = Phase(
            jnp.asarray(np.stack([0.3 + 0.02 * rng.standard_normal(b),
                                  1.0 + 0.1 * rng.standard_normal(b)],
                                 axis=-1)),
            jnp.asarray(0.05 * rng.standard_normal((b, 2))),
        )
        dt = jnp.float64(1e-3)
        lib = make_stepper(sysb, "leapfrog", iters=(3, 2))
        fus = make_stepper(sysb, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.step(lib.init(ph), dt)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.step(fus.init(ph), dt)
            a, b_ = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b_.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b_.p),
                                   rtol=0, atol=1e-12)
