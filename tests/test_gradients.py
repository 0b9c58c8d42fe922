"""Differentiable-simulation tests: gradients through trajectories.

A capability the reference cannot express at all (its AD stops at system
construction): reverse-mode differentiation through whole evolutions —
through the scan, the implicit fixed-point iterations, the small-SPD solves,
and the VJP-of-JVP dynamics contraction — enabling trajectory optimization,
parameter fitting, and sensitivity analysis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamilton_tpu import (
    Config,
    Phase,
    evolve_ham_fixed,
    hamiltonian,
    mk_system_cart,
    to_phase,
)
from hamilton_tpu.models import double_pendulum, pendulum

DP = double_pendulum()


def _final_q0(ph0: Phase, **kw) -> jax.Array:
    kw.setdefault("iters", 3)
    out = evolve_ham_fixed(DP.system, ph0, 0.01, 30, emit_every=30, **kw)
    return out.q[-1, 0]


class TestGradThroughTrajectory:
    def test_grad_wrt_initial_momentum_matches_fd(self):
        ph0 = DP.init_phase
        g = jax.grad(lambda p: _final_q0(Phase(ph0.q, p)))(ph0.p)
        # central finite difference on p[0]
        eps = 1e-6
        e0 = jnp.zeros_like(ph0.p).at[0].set(eps)
        fd = (_final_q0(Phase(ph0.q, ph0.p + e0)) - _final_q0(Phase(ph0.q, ph0.p - e0))) / (
            2 * eps
        )
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=1e-5)

    @pytest.mark.parametrize("method", ["gauss4", "leapfrog", "rk4", "tao2"])
    def test_grad_finite_all_methods(self, method):
        ph0 = DP.init_phase
        g = jax.grad(lambda q: _final_q0(Phase(q, ph0.p), method=method))(ph0.q)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)

    @pytest.mark.slow
    def test_remat_matches_no_remat(self):
        ph0 = DP.init_phase
        g1 = jax.grad(lambda q: _final_q0(Phase(q, ph0.p)))(ph0.q)
        g2 = jax.grad(lambda q: _final_q0(Phase(q, ph0.p), remat=True))(ph0.q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-10)

    def test_grad_wrt_params(self):
        """Sensitivity to physical parameters through the ``params`` pytree
        leaf: mass edits flow through the potential, the mass matrix, AND
        the derived inertia (inertia_fn), all differentiably."""

        def loss(m2):
            sysm = DP.system.replace_params(
                {"m1": jnp.asarray(1.0), "m2": m2}
            )
            ph0 = to_phase(sysm, DP.init_config)
            out = evolve_ham_fixed(sysm, ph0, 0.01, 30, emit_every=30, iters=3)
            return jnp.sum(out.q[-1] ** 2)

        g = jax.grad(loss)(jnp.asarray(1.0))
        assert np.isfinite(float(g)) and float(g) != 0.0
        eps = 1e-6
        fd = (loss(jnp.asarray(1.0 + eps)) - loss(jnp.asarray(1.0 - eps))) / (
            2 * eps
        )
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)

    def test_tiny_shooting_optimization(self):
        """Fit an initial angular velocity so the pendulum reaches a target
        angle — a 10-iteration gradient-descent shooting problem."""
        ex = pendulum(theta0=0.0, omega0=0.5)
        target = 0.6

        def loss(omega0):
            ph0 = to_phase(ex.system, Config(jnp.array([0.0]), jnp.stack([omega0])))
            out = evolve_ham_fixed(ex.system, ph0, 0.02, 25, emit_every=25, iters=3)
            return (out.q[-1, 0] - target) ** 2

        omega = jnp.asarray(0.5)
        lg = jax.jit(jax.value_and_grad(loss))
        l0 = float(lg(omega)[0])
        for _ in range(10):
            val, g = lg(omega)
            omega = omega - 0.5 * g
        assert float(lg(omega)[0]) < l0 * 0.05

    def test_grad_through_batched_evolution(self):
        """Gradients flow through the native-batch ensemble path too."""
        b = 4
        ph0 = Phase(jnp.tile(DP.init_phase.q, (b, 1)), jnp.tile(DP.init_phase.p, (b, 1)))

        def loss(q0):
            out = evolve_ham_fixed(DP.system, Phase(q0, ph0.p), 0.01, 20, emit_every=20, iters=3)
            return jnp.sum(out.q[-1] ** 2)

        g = jax.grad(loss)(ph0.q)
        assert g.shape == (b, 2)
        assert np.all(np.isfinite(np.asarray(g)))
