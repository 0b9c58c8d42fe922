"""Core mechanics tests: AD vs closed-form, conversions, energies.

Covers SURVEY.md §4 items (b) toPhase∘fromPhase round-trips and (c) AD-derived
J/∂J/∇U vs closed-form derivatives for analytic examples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamilton_tpu import (
    Config,
    Phase,
    from_phase,
    ham_eqs,
    hamiltonian,
    ke_c,
    ke_p,
    lagrangian,
    mass_matrix,
    mk_system,
    mk_system_cart,
    momenta,
    pe,
    to_phase,
    underlying_pos,
    velocities,
)


def simple_pendulum(g=5.0):
    """Reference single pendulum (app/Examples.hs:61-73): coords
    (sin θ, 0.5 − cos θ), masses (1, 1), U = g·y."""
    return mk_system_cart(
        jnp.array([1.0, 1.0]),
        lambda q: jnp.array([jnp.sin(q[0]), 0.5 - jnp.cos(q[0])]),
        lambda x: g * x[1],
        n=1,
        name="pendulum",
    )


def polar_system():
    """2D point mass in polar coordinates — all closed forms known."""
    return mk_system(
        jnp.array([1.0, 1.0]),
        lambda q: jnp.array([q[0] * jnp.cos(q[1]), q[0] * jnp.sin(q[1])]),
        lambda q: 0.0,
        n=2,
        name="polar",
    )


class TestADDerivatives:
    def test_pendulum_jacobian_closed_form(self):
        s = simple_pendulum()
        th = 0.7
        j = s.jacobian(jnp.array([th]))
        np.testing.assert_allclose(
            np.asarray(j), [[np.cos(th)], [np.sin(th)]], rtol=1e-12
        )

    def test_pendulum_hessian_closed_form(self):
        s = simple_pendulum()
        th = 0.7
        h = s.hessian(jnp.array([th]))
        np.testing.assert_allclose(
            np.asarray(h).reshape(2), [-np.sin(th), np.cos(th)], rtol=1e-12
        )

    def test_polar_jacobian(self):
        s = polar_system()
        r, th = 1.3, 0.4
        j = np.asarray(s.jacobian(jnp.array([r, th])))
        expect = [
            [np.cos(th), -r * np.sin(th)],
            [np.sin(th), r * np.cos(th)],
        ]
        np.testing.assert_allclose(j, expect, rtol=1e-12)

    def test_potential_grad(self):
        s = simple_pendulum(g=5.0)
        th = 0.3
        gu = s.potential_grad(jnp.array([th]))
        # U(θ) = 5(0.5 − cos θ) → dU/dθ = 5 sin θ
        np.testing.assert_allclose(np.asarray(gu), [5 * np.sin(th)], rtol=1e-12)

    def test_mass_matrix_polar(self):
        s = polar_system()
        r, th = 1.7, 2.1
        k = np.asarray(mass_matrix(s, jnp.array([r, th])))
        # K = diag(1, r²) for unit mass in polar coords
        np.testing.assert_allclose(k, np.diag([1.0, r**2]), atol=1e-12)


class TestConversions:
    def test_round_trip_config(self):
        s = polar_system()
        c0 = Config(jnp.array([1.5, 0.3]), jnp.array([0.2, -0.4]))
        c1 = from_phase(s, to_phase(s, c0))
        np.testing.assert_allclose(np.asarray(c1.q), np.asarray(c0.q), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(c1.v), np.asarray(c0.v), rtol=1e-12)

    def test_round_trip_phase(self):
        s = simple_pendulum()
        ph0 = Phase(jnp.array([0.8]), jnp.array([0.33]))
        ph1 = to_phase(s, from_phase(s, ph0))
        np.testing.assert_allclose(np.asarray(ph1.p), np.asarray(ph0.p), rtol=1e-12)

    def test_momenta_polar_closed_form(self):
        s = polar_system()
        r, th, vr, vth = 2.0, 0.5, 0.3, -0.7
        p = np.asarray(momenta(s, Config(jnp.array([r, th]), jnp.array([vr, vth]))))
        # p_r = m vr;  p_θ = m r² ω
        np.testing.assert_allclose(p, [vr, r**2 * vth], rtol=1e-12)

    def test_velocities_inverse_of_momenta(self):
        s = polar_system()
        c = Config(jnp.array([1.1, 0.2]), jnp.array([0.5, 1.5]))
        v = velocities(s, to_phase(s, c))
        np.testing.assert_allclose(np.asarray(v), np.asarray(c.v), rtol=1e-12)


class TestEnergies:
    def test_ke_consistency(self):
        s = polar_system()
        c = Config(jnp.array([1.4, 0.6]), jnp.array([0.3, 0.9]))
        ph = to_phase(s, c)
        np.testing.assert_allclose(float(ke_c(s, c)), float(ke_p(s, ph)), rtol=1e-12)
        # closed form: ½(vr² + r²ω²)
        expect = 0.5 * (0.3**2 + 1.4**2 * 0.9**2)
        np.testing.assert_allclose(float(ke_c(s, c)), expect, rtol=1e-12)

    def test_lagrangian_hamiltonian(self):
        s = simple_pendulum(g=5.0)
        c = Config(jnp.array([0.4]), jnp.array([1.2]))
        ph = to_phase(s, c)
        t = float(ke_c(s, c))
        u = float(pe(s, c.q))
        np.testing.assert_allclose(float(lagrangian(s, c)), t - u, rtol=1e-12)
        np.testing.assert_allclose(float(hamiltonian(s, ph)), t + u, rtol=1e-12)


class TestHamEqs:
    def test_pendulum_ham_eqs_closed_form(self):
        """Pendulum: H = p²/2 + g(0.5−cos θ) → q̇ = p, ṗ = −g sin θ."""
        g = 5.0
        s = simple_pendulum(g=g)
        th, p = 0.6, 0.9
        dq, dp = ham_eqs(s, Phase(jnp.array([th]), jnp.array([p])))
        np.testing.assert_allclose(np.asarray(dq), [p], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(dp), [-g * np.sin(th)], rtol=1e-10)

    def test_ham_eqs_vs_autodiff_hamiltonian(self):
        """hamEqs must equal (∂H/∂p, −∂H/∂q) of the scalar hamiltonian."""
        s = polar_with_potential()
        q = jnp.array([1.2, 0.7])
        p = jnp.array([0.4, -0.2])
        dq, dp = ham_eqs(s, Phase(q, p))
        h = lambda qq, pp: hamiltonian(s, Phase(qq, pp))
        dhdq = jax.grad(h, argnums=0)(q, p)
        dhdp = jax.grad(h, argnums=1)(q, p)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dhdp), rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(dp), -np.asarray(dhdq), rtol=1e-10, atol=1e-12)

    def test_ham_eqs_vmap_equals_loop(self):
        """SURVEY §4 (e): vmap-batch ≡ per-member loop."""
        s = polar_with_potential()
        qs = jnp.array([[1.0, 0.1], [1.5, 0.9], [0.8, -0.4]])
        ps = jnp.array([[0.2, 0.0], [-0.1, 0.3], [0.5, 0.5]])
        batched = jax.vmap(lambda q, p: ham_eqs(s, Phase(q, p)))(qs, ps)
        for i in range(3):
            one = ham_eqs(s, Phase(qs[i], ps[i]))
            np.testing.assert_allclose(
                np.asarray(batched[0][i]), np.asarray(one[0]), rtol=1e-12, atol=1e-15
            )
            np.testing.assert_allclose(
                np.asarray(batched[1][i]), np.asarray(one[1]), rtol=1e-12, atol=1e-15
            )


def polar_with_potential():
    return mk_system(
        jnp.array([1.0, 1.0]),
        lambda q: jnp.array([q[0] * jnp.cos(q[1]), q[0] * jnp.sin(q[1])]),
        lambda q: -1.0 / q[0] + 0.1 * q[0] ** 2,
        n=2,
        name="polar_u",
    )


class TestUnderlyingPos:
    def test_underlying_pos(self):
        s = simple_pendulum()
        x = underlying_pos(s, jnp.array([np.pi / 2]))
        np.testing.assert_allclose(np.asarray(x), [1.0, 0.5], atol=1e-12)

    def test_underlying_pos_batched(self):
        s = simple_pendulum()
        qs = jnp.array([[0.0], [np.pi / 2]])
        x = underlying_pos(s, qs)
        assert x.shape == (2, 2)
        np.testing.assert_allclose(np.asarray(x[0]), [0.0, -0.5], atol=1e-12)


class TestStateValidation:
    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            Config(jnp.zeros(2), jnp.zeros(3))
        with pytest.raises(ValueError):
            Phase(jnp.zeros((4, 2)), jnp.zeros((3, 2)))

    def test_flatten_unflatten(self):
        ph = Phase(jnp.array([1.0, 2.0]), jnp.array([3.0, 4.0]))
        y = ph.flatten()
        np.testing.assert_allclose(np.asarray(y), [1, 2, 3, 4])
        ph2 = Phase.unflatten(y)
        np.testing.assert_allclose(np.asarray(ph2.q), [1, 2])
        np.testing.assert_allclose(np.asarray(ph2.p), [3, 4])


class TestSystemValidation:
    def test_wrong_output_dim_raises(self):
        with pytest.raises(ValueError, match="coords must map"):
            mk_system(
                jnp.ones(3),
                lambda q: jnp.stack([q[0], q[0]]),  # maps to m=2, inertia says 3
                lambda q: 0.0,
                n=1,
            )

    def test_nonscalar_potential_raises(self):
        with pytest.raises(ValueError, match="potential must return a scalar"):
            mk_system(jnp.ones(2), lambda q: q, lambda q: q, n=2)

    def test_broken_coords_raises(self):
        with pytest.raises(ValueError, match="failed shape tracing"):
            mk_system(
                jnp.ones(2), lambda q: q @ jnp.ones((3, 3)), lambda q: 0.0, n=2
            )

    def test_no_n_skips_validation(self):
        # lazy construction (the reference behavior) still available
        s = mk_system(jnp.ones(2), lambda q: q, lambda q: 0.0)
        assert s.n is None
