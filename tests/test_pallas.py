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
        # full-batch comparison: every member, not a row sample
        expect = np.linalg.solve(k.astype(np.float64), vec.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(x, expect, rtol=5e-4, atol=5e-4)

    def test_padding_path(self, rng):
        n, b = 5, 1100  # not a multiple of 1024
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            x = np.asarray(ps.spd_solve_pallas(jnp.asarray(k), jnp.asarray(vec)))
        assert x.shape == (b, n)
        expect = np.linalg.solve(k.astype(np.float64), vec.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(x, expect, rtol=5e-4, atol=5e-4)

    def test_bf16_path(self, rng):
        n, b = 4, 1024
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            x = ps.spd_solve_pallas(
                jnp.asarray(k, jnp.bfloat16), jnp.asarray(vec, jnp.bfloat16)
            )
        assert x.dtype == jnp.bfloat16
        expect = np.linalg.solve(k.astype(np.float64), vec.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(
            np.asarray(x, np.float32), expect, rtol=5e-2, atol=5e-2
        )

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


class TestFactorSolveVJP:
    """custom_vjp coverage for the factor/solve kernels (member-major and
    batch-minor): gradients must flow through the factor-cached steppers on
    TPU, where the Pallas route replaces the masked fallback."""

    def test_cholesky_then_solve_grad_matches_masked(self, rng):
        from hamilton_tpu.ops.linalg import _masked_cho_solve, _masked_cholesky

        n, b = 4, 1024
        k = jnp.asarray(_random_spd(rng, b, n, np.float64).astype(np.float32))
        vec = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))

        def loss_pallas(kk, bb):
            low = ps.cholesky_pallas(kk)
            return jnp.sum(ps.cho_solve_pallas(low, bb) ** 2)

        def loss_masked(kk, bb):
            return jnp.sum(_masked_cho_solve(_masked_cholesky(kk), bb) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_pallas, argnums=(0, 1))(k, vec)
        g2 = jax.grad(loss_masked, argnums=(0, 1))(k, vec)
        # the solve adjoint puts dK in one-sided form; compare symmetrized
        sym = lambda m: (m + jnp.swapaxes(m, -1, -2)) / 2
        np.testing.assert_allclose(
            np.asarray(sym(g1[0])), np.asarray(sym(g2[0])), rtol=3e-3, atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(g1[1]), np.asarray(g2[1]), rtol=3e-3, atol=3e-3
        )

    def test_bt_forward_matches_member_major(self, rng):
        n, b = 5, 2048
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        k_t = jnp.asarray(np.moveaxis(k, 0, -1))  # (n, n, B)
        b_t = jnp.asarray(vec.T)  # (n, B)
        with pltpu.force_tpu_interpret_mode():
            x_bt = np.asarray(ps.spd_solve_bt(k_t, b_t))
            l_bt = np.asarray(ps.cholesky_bt(k_t))
            x_cs = np.asarray(ps.cho_solve_bt(jnp.asarray(l_bt), b_t))
            x_mm = np.asarray(ps.spd_solve_pallas(jnp.asarray(k), jnp.asarray(vec)))
        np.testing.assert_allclose(x_bt.T, x_mm, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(x_cs.T, x_mm, rtol=1e-5, atol=1e-5)
        # factor reproduces K (full batch)
        kk = np.einsum("ikb,jkb->ijb", l_bt, l_bt)
        np.testing.assert_allclose(
            np.moveaxis(kk, -1, 0), k, rtol=2e-4, atol=2e-4
        )

    def test_bt_padding(self, rng):
        n, b = 4, 1500  # not a TILE_B multiple
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        k_t = jnp.asarray(np.moveaxis(k, 0, -1))
        b_t = jnp.asarray(vec.T)
        with pltpu.force_tpu_interpret_mode():
            x = np.asarray(ps.spd_solve_bt(k_t, b_t))
        expect = np.linalg.solve(k.astype(np.float64), vec.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(x.T, expect, rtol=5e-4, atol=5e-4)

    def test_bt_grads_match_member_major(self, rng):
        from hamilton_tpu.ops.linalg import _masked_cho_solve, _masked_cholesky

        n, b = 3, 1024
        k = _random_spd(rng, b, n, np.float64).astype(np.float32)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        k_t = jnp.asarray(np.moveaxis(k, 0, -1))
        b_t = jnp.asarray(vec.T)

        def loss_bt(kk_t, bb_t):
            low = ps.cholesky_bt(kk_t)
            return jnp.sum(ps.cho_solve_bt(low, bb_t) ** 2)

        def loss_fused_bt(kk_t, bb_t):
            return jnp.sum(ps.spd_solve_bt(kk_t, bb_t) ** 2)

        def loss_masked(kk, bb):
            return jnp.sum(_masked_cho_solve(_masked_cholesky(kk), bb) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_bt = jax.grad(loss_bt, argnums=(0, 1))(k_t, b_t)
            g_f = jax.grad(loss_fused_bt, argnums=(0, 1))(k_t, b_t)
        g_m = jax.grad(loss_masked, argnums=(0, 1))(jnp.asarray(k), jnp.asarray(vec))
        sym_bt = lambda m: (m + jnp.swapaxes(m, 0, 1)) / 2
        sym = lambda m: (m + jnp.swapaxes(m, -1, -2)) / 2
        for g in (g_bt, g_f):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(sym_bt(g[0])), -1, 0),
                np.asarray(sym(g_m[0])), rtol=3e-3, atol=3e-3,
            )
            np.testing.assert_allclose(
                np.asarray(g[1]).T, np.asarray(g_m[1]), rtol=3e-3, atol=3e-3
            )


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


class TestTileResidentHotPath:
    """The tile-layout entry points and the mechanics routing that keeps
    K/L in register-tile layout across the step (the relayout fix measured
    in scripts/perf_trace.py)."""

    def test_tile_entry_points_match_member_major(self, rng):
        n, b = 6, 2048
        k = _random_spd(rng, b, n)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        kd, vd = jnp.asarray(k), jnp.asarray(vec)
        with pltpu.force_tpu_interpret_mode():
            kt = ps._to_tiles(kd, 2)
            bt = ps.to_vec_tiles(vd)
            x_t = ps.from_vec_tiles(ps.spd_solve_tiles(kt, bt))
            l_t = ps.cholesky_tiles(kt)
            x_cs = ps.from_vec_tiles(ps.cho_solve_tiles(l_t, bt))
            x_mm = ps.spd_solve_pallas(kd, vd)
            l_mm = ps.cholesky_pallas(kd)
        np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_mm),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x_cs), np.asarray(x_mm),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ps._from_tiles(l_t, (n, n))), np.asarray(l_mm),
            rtol=1e-6, atol=1e-6,
        )

    def test_k_tiles_from_jacobian(self, rng):
        b, m, n = 1024, 8, 4
        j = rng.normal(size=(b, m, n)).astype(np.float32)
        inertia = rng.uniform(1.0, 2.0, size=(m,)).astype(np.float32)
        kt = ps.k_tiles_from_jacobian(jnp.asarray(j), jnp.asarray(inertia))
        k_ref = np.einsum("bmi,m,bmj->bij", j, inertia, j)
        np.testing.assert_allclose(
            np.asarray(ps._from_tiles(kt, (n, n))), k_ref, rtol=1e-5, atol=1e-5
        )

    def test_tile_grads_match_dense(self, rng):
        from hamilton_tpu.ops.linalg import _masked_cho_solve, _masked_cholesky

        n, b = 4, 1024
        k = _random_spd(rng, b, n, np.float64).astype(np.float32)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        kd, vd = jnp.asarray(k), jnp.asarray(vec)

        def loss_tiles(kk, bb):
            kt = ps._to_tiles(kk, 2)
            bt = ps.to_vec_tiles(bb)
            lt = ps.cholesky_tiles(kt)
            x = ps.from_vec_tiles(ps.cho_solve_tiles(lt, bt))
            y = ps.from_vec_tiles(ps.spd_solve_tiles(kt, bt))
            return jnp.sum(x ** 2) + jnp.sum(y ** 2)

        def loss_dense(kk, bb):
            x = _masked_cho_solve(_masked_cholesky(kk), bb)
            return 2 * jnp.sum(x ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_tiles, argnums=(0, 1))(kd, vd)
        g2 = jax.grad(loss_dense, argnums=(0, 1))(kd, vd)
        sym = lambda mmat: (mmat + jnp.swapaxes(mmat, -1, -2)) / 2
        np.testing.assert_allclose(
            np.asarray(sym(g1[0])), np.asarray(sym(g2[0])), rtol=3e-3, atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(g1[1]), np.asarray(g2[1]), rtol=3e-3, atol=3e-3
        )

    def test_mechanics_route_through_tiles(self, rng, monkeypatch):
        """With the force flag under the interpreter, ham_eqs/velocities/
        q_factor route through the tile path and must match the dense path
        run on the same inputs."""
        from hamilton_tpu import Phase, ham_eqs
        from hamilton_tpu.mechanics import (
            dhdp_factored,
            dhdq_factored,
            q_factor,
            velocities,
        )
        from hamilton_tpu.models import chain

        ex = chain(n_links=6)
        system = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ex.system
        )
        b = 1024
        q = jnp.asarray(rng.normal(size=(b, 6)).astype(np.float32) * 0.3)
        p = jnp.asarray(rng.normal(size=(b, 6)).astype(np.float32) * 0.2)
        ph = Phase(q, p)

        dense = {}
        dense["he"] = ham_eqs(system, ph)
        dense["vel"] = velocities(system, ph)
        fac_d = q_factor(system, q)
        assert fac_d.chol.ndim == 3
        dense["dhdp"] = dhdp_factored(fac_d, p)
        dense["dhdq"] = dhdq_factored(system, fac_d, q, p)

        monkeypatch.setenv("HAMILTON_FORCE_PALLAS", "1")
        with pltpu.force_tpu_interpret_mode():
            he = ham_eqs(system, ph)
            vel = velocities(system, ph)
            fac_t = q_factor(system, q)
            assert fac_t.chol.ndim == 4  # tile-resident factor
            dhdp = dhdp_factored(fac_t, p)
            dhdq = dhdq_factored(system, fac_t, q, p)

        np.testing.assert_allclose(np.asarray(he[0]), np.asarray(dense["he"][0]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(he[1]), np.asarray(dense["he"][1]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(dense["vel"]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dhdp), np.asarray(dense["dhdp"]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dhdq), np.asarray(dense["dhdq"]),
                                   rtol=2e-4, atol=2e-5)

    def test_leapfrog_step_through_tiles(self, rng, monkeypatch):
        """A full factor-cached leapfrog step on the tile path ≡ dense."""
        from hamilton_tpu import Phase
        from hamilton_tpu.integrators.fixed import make_stepper
        from hamilton_tpu.models import chain

        ex = chain(n_links=4)
        system = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ex.system
        )
        b = 1024
        q = jnp.asarray(rng.normal(size=(b, 4)).astype(np.float32) * 0.3)
        p = jnp.asarray(rng.normal(size=(b, 4)).astype(np.float32) * 0.2)
        st = make_stepper(system, "leapfrog", iters=3)
        dt = jnp.float32(1e-2)

        out_d = st.extract(st.step(st.init(Phase(q, p)), dt))
        monkeypatch.setenv("HAMILTON_FORCE_PALLAS", "1")
        with pltpu.force_tpu_interpret_mode():
            out_t = st.extract(st.step(st.init(Phase(q, p)), dt))
        np.testing.assert_allclose(np.asarray(out_t.q), np.asarray(out_d.q),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_t.p), np.asarray(out_d.p),
                                   rtol=2e-4, atol=2e-5)


class TestJacFusedKernels:
    """Fused form-K(+factor)(+solve) kernels taking √M·J tiles: remove the
    XLA-side K contraction (bf16 convolution on TPU) from the hot loop."""

    def test_jac_solve_matches_dense(self, rng):
        b, m, n = 1024, 8, 4
        j = rng.normal(size=(b, m, n)).astype(np.float32)
        inertia = rng.uniform(1.0, 2.0, size=(m,)).astype(np.float32)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        k = np.einsum("bmi,m,bmj->bij", j, inertia, j) + 0.0
        k += 0.5 * np.eye(n, dtype=np.float32)  # well-conditioned
        # add the regularization through J?  keep K consistent: test pure JᵀMJ
        k = np.einsum("bmi,m,bmj->bij", j, inertia, j)
        with pltpu.force_tpu_interpret_mode():
            jt = ps.jac_tiles(jnp.asarray(j), jnp.asarray(inertia))
            x = ps.from_vec_tiles(
                ps.spd_solve_jac_tiles(jt, ps.to_vec_tiles(jnp.asarray(vec)), n, m)
            )
            lt = ps.cholesky_jac_tiles(jt, n, m)
            x2 = ps.from_vec_tiles(
                ps.cho_solve_tiles(lt, ps.to_vec_tiles(jnp.asarray(vec)))
            )
        expect = np.linalg.solve(
            k.astype(np.float64), vec.astype(np.float64)[..., None]
        )[..., 0]
        np.testing.assert_allclose(np.asarray(x), expect, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(x2), expect, rtol=2e-3, atol=2e-3)

    def test_jac_solve_grads(self, rng):
        from hamilton_tpu.ops.linalg import _masked_cho_solve, _masked_cholesky

        b, m, n = 1024, 6, 3
        j = rng.normal(size=(b, m, n)).astype(np.float32)
        inertia = np.ones(m, dtype=np.float32)
        vec = rng.normal(size=(b, n)).astype(np.float32)
        jd, vd = jnp.asarray(j), jnp.asarray(vec)
        iner = jnp.asarray(inertia)

        def loss_fused(jj, bb):
            jt = ps.jac_tiles(jj, iner)
            x = ps.from_vec_tiles(
                ps.spd_solve_jac_tiles(jt, ps.to_vec_tiles(bb), n, m)
            )
            lt = ps.cholesky_jac_tiles(jt, n, m)
            y = ps.from_vec_tiles(ps.cho_solve_tiles(lt, ps.to_vec_tiles(bb)))
            return jnp.sum(x ** 2) + jnp.sum(y ** 2)

        def loss_dense(jj, bb):
            k = jnp.einsum("bmi,m,bmj->bij", jj, iner, jj)
            x = _masked_cho_solve(_masked_cholesky(k), bb)
            return 2 * jnp.sum(x ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused, argnums=(0, 1))(jd, vd)
        g2 = jax.grad(loss_dense, argnums=(0, 1))(jd, vd)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=5e-3, atol=5e-3)
