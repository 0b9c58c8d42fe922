"""Native-engine tests: the GSL-semantics parity triangle.

Three independent implementations of the same integrator + control laws:
(1) the JAX driver (integrators/adaptive.py), (2) the native C++ engine with
a *generic callback* RHS, (3) the native engine with a *hand-derived analytic*
double-pendulum RHS.  Pairwise agreement to ~1e-9 on the chaotic baseline
config is strong evidence all three faithfully implement GSL's rkf45
(SURVEY.md §4 item (d): trajectory parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamilton_tpu import Config, Phase, evolve_ham, to_phase
from hamilton_tpu.mechanics import ham_rhs
from hamilton_tpu import native
from hamilton_tpu.models import double_pendulum

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

DP = double_pendulum()


def _phase0():
    # README.md:124-143 variant: q0=(1,0), v0=(0,0.5)
    return to_phase(DP.system, Config(jnp.array([1.0, 0.0]), jnp.array([0.0, 0.5])))


TS = np.arange(0.0, 1.05, 0.1)


class TestParityTriangle:
    def test_jax_vs_native_callback(self):
        """JAX adaptive driver ≡ native engine driving the same JAX RHS."""
        ph0 = _phase0()
        jax_out = evolve_ham(DP.system, ph0, jnp.asarray(TS), method="rkf45")
        rhs = jax.jit(ham_rhs(DP.system))
        nat_out, stats = native.rkf45_evolve_times(
            lambda y: np.asarray(rhs(jnp.asarray(y))),
            np.asarray(ph0.flatten()),
            TS,
        )
        np.testing.assert_allclose(
            np.asarray(jax_out.q), nat_out[:, :2], atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(jax_out.p), nat_out[:, 2:], atol=1e-9
        )
        assert stats["n_steps"] > 10

    def test_native_analytic_vs_native_callback(self):
        """Hand-derived C++ RHS ≡ AD-derived JAX RHS under the same engine."""
        ph0 = _phase0()
        y0 = np.asarray(ph0.flatten())
        rhs = jax.jit(ham_rhs(DP.system))
        cb_out, _ = native.rkf45_evolve_times(
            lambda y: np.asarray(rhs(jnp.asarray(y))), y0, TS
        )
        an_out, _ = native.double_pendulum_evolve(1.0, 1.0, y0, TS)
        np.testing.assert_allclose(cb_out, an_out, atol=1e-9)

    def test_jax_vs_native_analytic_longer_horizon(self):
        """The full triangle over t ∈ [0, 2] (chaos growing, still bounded)."""
        ph0 = _phase0()
        ts = np.arange(0.0, 2.05, 0.1)
        jax_out = evolve_ham(DP.system, ph0, jnp.asarray(ts), method="rkf45")
        an_out, _ = native.double_pendulum_evolve(
            1.0, 1.0, np.asarray(ph0.flatten()), ts
        )
        np.testing.assert_allclose(np.asarray(jax_out.q), an_out[:, :2], atol=1e-6)

    def test_masses_propagate(self):
        ex = double_pendulum(2.0, 0.7)
        ph0 = ex.init_phase
        ts = np.array([0.0, 0.3])
        jax_out = evolve_ham(ex.system, ph0, jnp.asarray(ts))
        an_out, _ = native.double_pendulum_evolve(
            2.0, 0.7, np.asarray(ph0.flatten()), ts
        )
        np.testing.assert_allclose(np.asarray(jax_out.q[1]), an_out[1, :2], atol=1e-8)


class TestNativeEngine:
    def test_energy_conserved_native(self):
        ph0 = _phase0()
        out, _ = native.double_pendulum_evolve(
            1.0, 1.0, np.asarray(ph0.flatten()), np.linspace(0, 5, 51)
        )
        from hamilton_tpu import hamiltonian

        hs = [
            float(hamiltonian(DP.system, Phase(jnp.asarray(row[:2]), jnp.asarray(row[2:]))))
            for row in out
        ]
        h0 = hs[0]
        # ~250 adaptive steps at eps=1.49e-8 → accumulated drift O(steps·eps)
        assert max(abs(h - h0) for h in hs) / abs(h0) < 1e-6

    def test_harmonic_oscillator_callback_exact(self):
        """ẏ = (v, −y): solution cos(t) to solver tolerance."""
        out, _ = native.rkf45_evolve_times(
            lambda y: np.array([y[1], -y[0]]),
            np.array([1.0, 0.0]),
            np.linspace(0.0, 2 * np.pi, 11),
        )
        np.testing.assert_allclose(out[-1], [1.0, 0.0], atol=1e-7)

    def test_fixed_steps_run(self):
        y = native.double_pendulum_fixed_steps(
            1.0, 1.0, 1e-3, 1000, np.array([1.0, 0.0, 0.0, 0.5])
        )
        assert np.all(np.isfinite(y))

    def test_too_few_times_rejected(self):
        with pytest.raises(RuntimeError):
            native.rkf45_evolve_times(
                lambda y: -y, np.array([1.0]), np.array([0.0])
            )


class TestNativeChain:
    def test_chain_analytic_vs_jax_ad(self):
        """The hand-derived closed-form chain dynamics (C++) must match the
        AD-derived JAX chain over an adaptive evolve — cross-validates the
        AD pipeline and the analytic derivation simultaneously."""
        from hamilton_tpu.models import chain

        n = 5
        ex = chain(n_links=n, theta0=0.5)
        ph0 = ex.init_phase
        ts = np.linspace(0.0, 1.0, 11)
        jax_out = evolve_ham(ex.system, ph0, jnp.asarray(ts), method="rkf45")
        nat_out, stats = native.chain_evolve(
            np.ones(n), np.asarray(ph0.flatten()), ts,
        )
        np.testing.assert_allclose(
            np.asarray(jax_out.q), nat_out[:, :n], atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(jax_out.p), nat_out[:, n:], atol=1e-8
        )
        assert stats["n_steps"] > 5

    def test_chain_ensemble_openmp_runner(self):
        """Native multi-member stepping: every member of a replicated
        ensemble lands on the single-trajectory result."""
        n, members = 4, 8
        q0 = np.full(n, 0.3)
        y0 = np.concatenate([q0, np.zeros(n)])
        states = np.tile(y0, (members, 1))
        out = native.chain_ensemble_fixed_steps(
            np.ones(n), states, 1e-3, 500
        )
        assert out.shape == (members, 2 * n)
        assert np.all(np.isfinite(out))
        for m in range(1, members):
            np.testing.assert_array_equal(out[m], out[0])

    def test_chain_varied_masses(self):
        from hamilton_tpu.models import chain

        n = 3
        masses = [2.0, 1.0, 0.5]
        ex = chain(n_links=n, masses=masses, theta0=0.4)
        ts = np.array([0.0, 0.5])
        jax_out = evolve_ham(ex.system, ex.init_phase, jnp.asarray(ts))
        nat_out, _ = native.chain_evolve(
            np.asarray(masses), np.asarray(ex.init_phase.flatten()), ts
        )
        np.testing.assert_allclose(np.asarray(jax_out.q[1]), nat_out[1, :n], atol=1e-8)
