"""Pallas kernel tests.

Kernel-vs-reference equality runs in interpreter mode on CPU (so CI always
exercises the kernel code path); the real-TPU run happens in the benchmark.
Batch-aware mechanics (the layer that routes to the kernels) are checked
against the vmapped unbatched path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hamilton_tpu.ops.linalg import spd_solve
from hamilton_tpu.ops import pallas_solve as ps


def _random_spd(rng, b, n, dtype=np.float32):
    a = rng.normal(size=(b, n, n)).astype(dtype)
    return np.einsum("bij,bkj->bik", a, a) + n * np.eye(n, dtype=dtype)


class TestPallasKernelsInterpret:
    """Interpreter-mode equality (runs anywhere)."""

    @pytest.mark.parametrize("n", [3, 8, 20])
    def test_fused_solve_matches_numpy(self, rng, n):
        b = 1024
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            x = np.asarray(ps.spd_solve_pallas(jnp.asarray(k), jnp.asarray(vec)))
        expect = np.stack([np.linalg.solve(k[i], vec[i]) for i in range(4)])
        np.testing.assert_allclose(x[:4], expect, rtol=2e-4, atol=2e-4)

    def test_padding_path(self, rng):
        n, b = 5, 1100  # not a multiple of 1024
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            x = np.asarray(ps.spd_solve_pallas(jnp.asarray(k), jnp.asarray(vec)))
        assert x.shape == (b, n)
        expect = np.linalg.solve(k[-1], vec[-1])
        np.testing.assert_allclose(x[-1], expect, rtol=2e-4, atol=2e-4)

    def test_chol_then_solve_matches_fused(self, rng):
        n, b = 6, 1024
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            low = ps.cholesky_pallas(jnp.asarray(k))
            x1 = np.asarray(ps.cho_solve_pallas(low, jnp.asarray(vec)))
            x2 = np.asarray(ps.spd_solve_pallas(jnp.asarray(k), jnp.asarray(vec)))
        np.testing.assert_allclose(x1, x2, rtol=1e-5, atol=1e-5)
        lo = np.asarray(low)
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", lo, lo)[:4], k[:4], rtol=2e-4, atol=2e-4
        )

    def test_custom_vjp_adjoint(self, rng):
        """d/dK and d/db of the solve match the finite-difference-free
        analytic adjoint through the masked fallback."""
        n, b = 4, 1024
        k = jnp.asarray(_random_spd(rng, b, n, np.float64).astype(np.float32))
        vec = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(lambda kk, bb: jnp.sum(ps.spd_solve_pallas(kk, bb) ** 2),
                          argnums=(0, 1))(k, vec)
        g2 = jax.grad(
            lambda kk, bb: jnp.sum(jax.vmap(spd_solve)(kk, bb) ** 2), argnums=(0, 1)
        )(k, vec)
        # pallas adjoint returns the one-sided dK (−K⁻¹g xᵀ); the fallback AD
        # distributes symmetrically — contract both against a symmetric probe
        sym = lambda m: (m + jnp.swapaxes(m, -1, -2)) / 2
        np.testing.assert_allclose(
            np.asarray(sym(g1[0])), np.asarray(sym(g2[0])), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=2e-3, atol=2e-3)


class TestBatchAwareMechanics:
    """Native-batch mechanics ≡ vmapped unbatched mechanics."""

    def test_ham_eqs_batched_equals_vmap(self):
        from hamilton_tpu import Phase, ham_eqs
        from hamilton_tpu.models import chain

        ex = chain(n_links=6)
        b = 16
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(b, 6)) * 0.3)
        p = jnp.asarray(rng.normal(size=(b, 6)) * 0.2)
        dq_b, dp_b = ham_eqs(ex.system, Phase(q, p))
        dq_v, dp_v = jax.vmap(lambda qq, pp: ham_eqs(ex.system, Phase(qq, pp)))(q, p)
        np.testing.assert_allclose(np.asarray(dq_b), np.asarray(dq_v), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(dp_b), np.asarray(dp_v), rtol=1e-9)

    def test_energies_batched(self):
        from hamilton_tpu import Phase, hamiltonian
        from hamilton_tpu.models import double_pendulum

        ex = double_pendulum()
        ph = ex.init_phase
        batched = Phase(jnp.tile(ph.q, (3, 1)), jnp.tile(ph.p, (3, 1)))
        h_b = hamiltonian(ex.system, batched)
        assert h_b.shape == (3,)
        np.testing.assert_allclose(
            np.asarray(h_b), float(hamiltonian(ex.system, ph)), rtol=1e-12
        )

    def test_velocities_momenta_batched_round_trip(self):
        from hamilton_tpu import Config, from_phase, to_phase
        from hamilton_tpu.models import two_body

        ex = two_body()
        c = Config(
            jnp.asarray([[2.0, 0.0], [1.5, 0.3]]),
            jnp.asarray([[0.0, 0.5], [0.1, 0.4]]),
        )
        c2 = from_phase(ex.system, to_phase(ex.system, c))
        np.testing.assert_allclose(np.asarray(c2.v), np.asarray(c.v), rtol=1e-10)

    def test_batched_stepper_equals_per_member(self):
        from hamilton_tpu import Phase
        from hamilton_tpu.integrators.fixed import make_stepper
        from hamilton_tpu.models import chain

        ex = chain(n_links=4)
        st = make_stepper(ex.system, "gauss4", iters=3)
        b = 3
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(b, 4)) * 0.3)
        p = jnp.asarray(rng.normal(size=(b, 4)) * 0.2)
        dt = jnp.asarray(0.01)
        out_b = st.extract(st.step(st.init(Phase(q, p)), dt))
        for i in range(b):
            out_i = st.extract(st.step(st.init(Phase(q[i], p[i])), dt))
            np.testing.assert_allclose(
                np.asarray(out_b.q[i]), np.asarray(out_i.q), rtol=1e-9, atol=1e-12
            )
