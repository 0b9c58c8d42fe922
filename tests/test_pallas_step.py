"""Fused whole-step serial-chain kernel (ops/pallas_step.py).

Parity runs in Pallas interpreter mode on CPU against the library leapfrog
(the AD/generic path is the correctness reference): with enough fixed-point
iterations both sides converge to the same map, so trajectories agree to
~1e-12 in f64.  Real-TPU exercise happens via the benchmark pipeline and the
opt-in HAMILTON_TEST_TPU smoke tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hamilton_tpu.models import chain
from hamilton_tpu.state import Phase
from hamilton_tpu.integrators.fixed import make_stepper

B = 1024  # one register tile of members


@pytest.fixture
def ph4():
    rng = np.random.default_rng(0)
    return Phase(
        jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4))),
        jnp.asarray(0.01 * rng.standard_normal((B, 4))),
    )


class TestFusedStep:
    def test_matches_library_leapfrog(self, ph4):
        """Converged fused step ≡ converged library step (exact mode)."""
        ex = chain(n_links=4)
        dt = jnp.float64(1e-3)
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 2))
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.init(ph4)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph4)
            for _ in range(2):
                c_lib = lib.step(c_lib, dt)
                c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-12)

    def test_nonuniform_masses(self):
        ex = chain(n_links=3, masses=[2.0, 0.5, 1.5], link_length=0.7)
        rng = np.random.default_rng(1)
        ph = Phase(jnp.asarray(0.3 + 0.01 * rng.standard_normal((B, 3))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 3))))
        dt = jnp.float64(1e-3)
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 2))
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.step(lib.init(ph), dt)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.step(fus.init(ph), dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-13)

    def test_per_member_params_sweep_matches_library(self):
        """Runtime-operand mode: batched ``params`` (an IC × mass-grid
        ensemble) route per-member coefficient tiles into the kernel; every
        member must match the library leapfrog evolving the same swept
        system (which itself matches freshly built per-member systems —
        tests/test_ensemble.py)."""
        rng = np.random.default_rng(5)
        ex = chain(n_links=4)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 4))))
        sysb = ex.system.replace_params({
            "masses": jnp.asarray(0.5 + rng.random((B, 4))),
            "lengths": jnp.broadcast_to(ex.system.params["lengths"], (B, 4)),
            "gravity": jnp.asarray(4.0 + rng.random(B)),
        })
        dt = jnp.float64(1e-3)
        lib = make_stepper(sysb, "leapfrog", iters=(3, 2))
        fus = make_stepper(sysb, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.init(ph)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph)
            assert len(c_fus) == 6  # state + (cm, gu) coefficient tiles
            for _ in range(2):
                c_lib = lib.step(c_lib, dt)
                c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-13)

    def test_size1_param_batch_rejected(self):
        """A size-1 leading params batch against a larger state batch must
        raise at init: the library path (the correctness reference) vmaps
        members pairwise and rejects size-1 broadcasting, so the fused path
        accepting it would silently break fused≡library parity."""
        rng = np.random.default_rng(3)
        ex = chain(n_links=4)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4))),
                   jnp.zeros((B, 4)))
        sysb = ex.system.replace_params({
            "masses": jnp.ones((1, 4)),
            "lengths": jnp.ones((1, 4)),
            "gravity": jnp.full((1,), 5.0),
        })
        fus = make_stepper(sysb, "leapfrog_fused", iters=(2, 1))
        with pytest.raises(ValueError, match="equal to the state batch"):
            with pltpu.force_tpu_interpret_mode():
                fus.init(ph)

    def test_shared_params_bake_static_mode(self):
        """Concrete unbatched params keep the immediate-constant kernel (the
        headline mode): the carry stays 4 state tiles, no coefficient
        operands."""
        ex = chain(n_links=4)
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(2, 1))
        rng = np.random.default_rng(0)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 4))))
        with pltpu.force_tpu_interpret_mode():
            c = fus.init(ph)
        assert len(c) == 4

    def test_shared_traced_params_single_group_tiles(self):
        """Traced-but-unbatched params (shared physics, e.g. under jit with
        the system as an argument) use ONE coefficient tile group reused by
        every grid step — not B-fold per-member copies — and still match the
        library leapfrog on a multi-group batch."""
        rng = np.random.default_rng(11)
        b2 = 2 * B  # two tile groups: exercises the block-0-reuse index map
        ex = chain(n_links=4)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((b2, 4))),
                   jnp.asarray(0.01 * rng.standard_normal((b2, 4))))
        dt = jnp.float64(1e-3)

        def run_fused(masses):
            sysb = ex.system.replace_params({
                "masses": masses,
                "lengths": ex.system.params["lengths"],
                "gravity": ex.system.params["gravity"],
            })
            fus = make_stepper(sysb, "leapfrog_fused", iters=(3, 2))
            c = fus.init(ph)
            # state tiles carry both groups; the coefficient tiles carry one
            assert c[0].shape[0] == 2 and c[-2].shape[0] == 1
            assert c[-1].shape[0] == 1
            for _ in range(2):
                c = fus.step(c, dt)
            return fus.extract(c)

        masses = jnp.asarray([1.0, 0.7, 1.3, 0.9])
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(run_fused)(masses)
        lib = make_stepper(
            ex.system.replace_params({
                "masses": masses,
                "lengths": ex.system.params["lengths"],
                "gravity": ex.system.params["gravity"],
            }),
            "leapfrog", iters=(3, 2),
        )
        c_lib = lib.init(ph)
        for _ in range(2):
            c_lib = lib.step(c_lib, dt)
        ref = lib.extract(c_lib)
        np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                                   rtol=0, atol=1e-13)

    @pytest.mark.parametrize("model", ["pendulum", "double_pendulum"])
    def test_family_members_match_library(self, model):
        """Pendulum and double pendulum are the n=1 / n=2 members of the
        serial-chain family — their attached fused kernels must reproduce
        the library dynamics (incl. the DP's non-uniform lengths/masses)."""
        from hamilton_tpu.models import double_pendulum, pendulum

        ex = (pendulum() if model == "pendulum"
              else double_pendulum(m1=2.0, m2=0.7))
        n = ex.n
        rng = np.random.default_rng(3)
        ph = Phase(jnp.asarray(0.4 + 0.05 * rng.standard_normal((B, n))),
                   jnp.asarray(0.05 * rng.standard_normal((B, n))))
        dt = jnp.float64(1e-3)
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 2))
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.init(ph)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph)
            for _ in range(2):
                c_lib = lib.step(c_lib, dt)
                c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-12)

    def test_multi_step_in_kernel_bitwise(self, ph4):
        """steps_per_call=S ≡ S separate calls: bitwise in plain exact mode
        (the in-block carried factor is computed at exactly the next q₀).
        In Kahan mode the carried factor sees the pre-compensation q₁ while
        a fresh call factors at the compensated q — an O(eps·|q|)
        discrepancy, so equality there is to rounding, not bitwise."""
        ex = chain(n_links=4)
        dt = jnp.float64(1e-3)
        for compensated in (False, True):
            one = make_stepper(ex.system, "leapfrog_fused", iters=(3, 1),
                               compensated=compensated)
            multi = make_stepper(ex.system, "leapfrog_fused", iters=(3, 1),
                                 compensated=compensated, steps_per_call=3)
            assert multi.substeps == 3
            with pltpu.force_tpu_interpret_mode():
                c1 = one.init(ph4)
                for _ in range(3):
                    c1 = one.step(c1, dt)
                c3 = multi.step(multi.init(ph4), dt)
                a, b = one.extract(c1), multi.extract(c3)
            if compensated:
                np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                           rtol=0, atol=1e-13)
                np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                           rtol=0, atol=1e-13)
            else:
                np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
                np.testing.assert_array_equal(np.asarray(a.p), np.asarray(b.p))

    def test_gauss_seidel_mode_runs_and_drift_bounded(self, ph4):
        """iters_q=0 (predictor-factor placement) stays near the exact map
        at O(dt³) and keeps energy drift small over a short horizon."""
        from hamilton_tpu.mechanics import hamiltonian

        ex = chain(n_links=4)
        dt = jnp.float64(1e-3)
        gs = make_stepper(ex.system, "leapfrog_fused", iters=(2, 0))

        @jax.jit
        def run50(c):  # one trace of the kernel, not 50 (interpreter cost)
            return jax.lax.fori_loop(0, 50, lambda i, cc: gs.step(cc, dt), c)

        with pltpu.force_tpu_interpret_mode():
            out = gs.extract(run50(gs.init(ph4)))
        h0 = hamiltonian(ex.system, ph4)
        h1 = hamiltonian(ex.system, out)
        drift = float(jnp.max(jnp.abs((h1 - h0) / h0)))
        assert drift < 1e-7, drift  # measured 1.2e-8 (cold-start residual)

    def test_ensemble_driver_integration(self, ph4):
        """evolve_ensemble_final with method='leapfrog_fused' + substeps>1:
        same final state and drift as the substeps=1 run."""
        from hamilton_tpu.ensemble import evolve_ensemble_final

        ex = chain(n_links=4)
        with pltpu.force_tpu_interpret_mode():
            f1, d1 = evolve_ensemble_final(
                ex.system, ph4, 1e-3, 20, method="leapfrog_fused",
                iters=(3, 1), drift_every=10, compensated=True,
            )
            f2, d2 = evolve_ensemble_final(
                ex.system, ph4, 1e-3, 20, method="leapfrog_fused",
                iters=(3, 1), drift_every=10, compensated=True,
                steps_per_call=10,
            )
        # Kahan mode: in-block factor carry differs from fresh factors by
        # the O(eps) compensation residual (see the bitwise test above)
        np.testing.assert_allclose(np.asarray(f1.q), np.asarray(f2.q),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=0, atol=1e-13)

    @pytest.mark.slow
    def test_trajectory_driver_steps_per_call(self, ph4):
        """evolve_ensemble (trajectory emission) runs fused multi-step
        blocks between emissions: steps_per_call=5 with emit_every=10 ≡ the
        single-step run (exact mode → bitwise), and non-dividing emission
        raises."""
        import pytest

        from hamilton_tpu.ensemble import evolve_ensemble

        ex = chain(n_links=4)
        with pltpu.force_tpu_interpret_mode():
            t1 = evolve_ensemble(ex.system, ph4, 1e-3, 20,
                                 method="leapfrog_fused", iters=(3, 1),
                                 emit_every=10)
            t2 = evolve_ensemble(ex.system, ph4, 1e-3, 20,
                                 method="leapfrog_fused", iters=(3, 1),
                                 emit_every=10, steps_per_call=5)
        np.testing.assert_array_equal(np.asarray(t1.q), np.asarray(t2.q))
        np.testing.assert_array_equal(np.asarray(t1.p), np.asarray(t2.p))
        with pytest.raises(ValueError, match="kernel-call boundaries"):
            evolve_ensemble(ex.system, ph4, 1e-3, 20,
                            method="leapfrog_fused", iters=(3, 1),
                            emit_every=10, steps_per_call=4)

    @pytest.mark.slow
    def test_yoshida4_fused_matches_library(self, ph4):
        """Triple-jump composition of the fused step ≡ library yoshida4.

        Both paths execute the same exact-mode iteration schedule, so they
        agree to machine epsilon at ANY iteration count (measured 1e-16 at
        (4,2)); small counts + 2 steps keep the interpreter cost at ~40 s
        instead of the 162 s the converged (6,4)×3 config took."""
        ex = chain(n_links=4)
        dt = jnp.float64(2e-3)
        lib = make_stepper(ex.system, "yoshida4", iters=(4, 2))
        fus = make_stepper(ex.system, "yoshida4_fused", iters=(4, 2))
        assert fus.order == 4 and fus.symplectic
        c_lib = lib.init(ph4)
        for _ in range(2):
            c_lib = lib.step(c_lib, dt)
        a = lib.extract(c_lib)

        @jax.jit
        def run2(c):  # one interpreter trace of the composed kernel
            return jax.lax.fori_loop(0, 2, lambda i, cc: fus.step(cc, dt), c)

        with pltpu.force_tpu_interpret_mode():
            b = fus.extract(run2(fus.init(ph4)))
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-11)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-11)
        # composition runs in-kernel, so it stacks with multi-step blocks:
        # exact mode stays bitwise vs single calls
        multi = make_stepper(ex.system, "yoshida4_fused", iters=(4, 2),
                             steps_per_call=2)
        with pltpu.force_tpu_interpret_mode():
            cm = multi.step(multi.init(ph4), dt)
            m = multi.extract(cm)
        np.testing.assert_array_equal(np.asarray(m.q), np.asarray(b.q))

    def test_sharded_fused_ensemble(self, devices8):
        """The fused kernel composes with shard_map: 8-way ensemble
        sharding over the virtual CPU mesh, each shard holding one register
        tile, ≡ the unsharded run."""
        from hamilton_tpu.ensemble import (
            evolve_ensemble_final,
            evolve_ensemble_sharded,
        )
        from hamilton_tpu.parallel import ensemble_mesh

        ex = chain(n_links=3)
        rng = np.random.default_rng(5)
        nb = 8 * 1024
        ph = Phase(jnp.asarray(0.4 + 0.01 * rng.standard_normal((nb, 3))),
                   jnp.asarray(0.01 * rng.standard_normal((nb, 3))))
        mesh = ensemble_mesh(jax.devices()[:8])
        with pltpu.force_tpu_interpret_mode():
            f_sh, d_sh = evolve_ensemble_sharded(
                ex.system, ph, 1e-3, 10, mesh=mesh, method="leapfrog_fused",
                iters=(3, 1), drift_every=10, reduce_stats="max",
            )
            f_un, d_un = evolve_ensemble_final(
                ex.system, ph, 1e-3, 10, method="leapfrog_fused",
                iters=(3, 1), drift_every=10,
            )
        np.testing.assert_allclose(np.asarray(f_sh.q), np.asarray(f_un.q),
                                   rtol=0, atol=1e-14)
        np.testing.assert_allclose(float(d_sh), float(jnp.max(d_un)),
                                   rtol=1e-12, atol=0)

    def test_trajectory_emission_with_fused(self, ph4):
        """evolve_ham_fixed's cond-guarded emission works over the fused
        carry (emitted states ≡ the library trajectory)."""
        from hamilton_tpu.integrators.evolve import evolve_ham_fixed

        ex = chain(n_links=4)
        with pltpu.force_tpu_interpret_mode():
            traj_f = evolve_ham_fixed(
                ex.system, ph4, 1e-3, 4, method="leapfrog_fused",
                iters=(6, 4), emit_every=2,
            )
        traj_l = evolve_ham_fixed(
            ex.system, ph4, 1e-3, 4, method="leapfrog",
            iters=(6, 4), emit_every=2,
        )
        assert traj_f.q.shape == (3, B, 4)
        np.testing.assert_allclose(np.asarray(traj_f.q),
                                   np.asarray(traj_l.q), rtol=0, atol=1e-12)

    def test_validation_errors(self, ph4):
        ex = chain(n_links=4)
        st = make_stepper(ex.system, "leapfrog_fused", iters=(3, 1))
        with pytest.raises(ValueError, match="multiple of 1024"):
            st.init(Phase(ph4.q[:100], ph4.p[:100]))
        with pytest.raises(ValueError, match="needs"):
            st.init(Phase(ph4.q[:, :3], ph4.p[:, :3]))
        with pytest.raises(ValueError, match="iters_p"):
            make_stepper(ex.system, "leapfrog_fused", iters=(0, 1))
        # systems without the closed forms refuse the method: a SINGLE
        # control point has B' ≡ 0 (K singular on every path), so k=1
        # Bézier is the one zoo member that stays tile-path-only
        from hamilton_tpu.models import bezier

        bz = bezier(points=[(0.0, 0.0)])
        assert bz.system.pallas_step is None
        assert bz.system.fused_forms is None
        with pytest.raises(ValueError, match="no fused-kernel closed forms"):
            make_stepper(bz.system, "leapfrog_fused")
        with pytest.raises(ValueError, match="steps_per_call"):
            make_stepper(ex.system, "leapfrog", steps_per_call=4)

    def test_chunked_exact_resume_with_fused_carry(self, ph4):
        """The fused tile carry checkpoints/resumes bitwise through the
        chunked driver's carry handoff."""
        from hamilton_tpu.ensemble import evolve_ensemble_chunked

        ex = chain(n_links=4)
        common = dict(method="leapfrog_fused", iters=(2, 1),
                      compensated=True, drift_every=10, steps_per_call=10)
        with pltpu.force_tpu_interpret_mode():
            f_full, d_full = evolve_ensemble_chunked(
                ex.system, ph4, 1e-3, 40, chunk_steps=20, **common
            )
            saved = {}
            evolve_ensemble_chunked(
                ex.system, ph4, 1e-3, 20, chunk_steps=20, **common,
                carry_callback=lambda ci, c, d, o: saved.update(carry=c, drift=d),
            )
            f_res, d_res = evolve_ensemble_chunked(
                ex.system, ph4, 1e-3, 20, chunk_steps=20, **common,
                initial_carry=saved["carry"], initial_drift=saved["drift"],
            )
        np.testing.assert_array_equal(np.asarray(f_full.q), np.asarray(f_res.q))
        np.testing.assert_array_equal(np.asarray(d_full), np.asarray(d_res))

    def test_grad_matches_library_leapfrog(self, ph4):
        """jax.grad through the fused kernel (exact-replay custom VJP) must
        match the gradient of the library leapfrog computing the same map —
        including through multi-step in-kernel blocks (the factor-carry
        path)."""
        ex = chain(n_links=4)
        dt = 1e-3
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(3, 1),
                           steps_per_call=2)
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 1))

        def loss_fused(q0, p0):
            c = fus.init(Phase(q0, p0))
            c = fus.step(c, dt)  # 2 dt-steps inside one kernel call
            ph = fus.extract(c)
            return jnp.sum(ph.q ** 2) + jnp.sum(ph.p * ph.q)

        def loss_lib(q0, p0):
            c = lib.init(Phase(q0, p0))
            for _ in range(2):
                c = lib.step(c, dt)
            ph = lib.extract(c)
            return jnp.sum(ph.q ** 2) + jnp.sum(ph.p * ph.q)

        with pltpu.force_tpu_interpret_mode():
            gq_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(ph4.q, ph4.p)
        gq_l, gp_l = jax.grad(loss_lib, argnums=(0, 1))(ph4.q, ph4.p)
        np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_l),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_l),
                                   rtol=1e-9, atol=1e-12)

    @pytest.mark.slow
    def test_grad_yoshida4_fused(self, ph4):
        """The 4th-order composition differentiates through the same replay
        (sign-alternating substeps included)."""
        ex = chain(n_links=4)
        fus = make_stepper(ex.system, "yoshida4_fused", iters=(3, 1))
        lib = make_stepper(ex.system, "yoshida4", iters=(3, 1))
        dt = 1e-3

        def loss(st):
            def f(q0):
                c = st.init(Phase(q0, ph4.p))
                c = st.step(c, dt)
                return jnp.sum(st.extract(c).q ** 2)

            return f

        with pltpu.force_tpu_interpret_mode():
            g_f = jax.grad(loss(fus))(ph4.q)
        g_l = jax.grad(loss(lib))(ph4.q)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_l),
                                   rtol=1e-8, atol=1e-11)

    def test_grad_wrt_masses_through_fused(self, ph4):
        """Gradients w.r.t. the physics parameters flow through the fused
        kernel's runtime coefficient tiles (finite-difference checked)."""
        ex = chain(n_links=4)

        def loss(masses):
            sysb = ex.system.replace_params({
                "masses": masses,
                "lengths": ex.system.params["lengths"],
                "gravity": ex.system.params["gravity"],
            })
            st = make_stepper(sysb, "leapfrog_fused", iters=(3, 1))
            c = st.init(ph4)
            c = st.step(c, 1e-3)
            return jnp.sum(st.extract(c).q ** 2)

        m0 = jnp.ones(4)
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss)(m0)
            eps = 1e-5
            e = jnp.zeros(4).at[1].set(eps)
            fd = (loss(m0 + e) - loss(m0 - e)) / (2 * eps)
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(float(g[1]), float(fd), rtol=5e-3)

    def test_substeps_must_divide(self, ph4):
        from hamilton_tpu.ensemble import evolve_ensemble_final

        ex = chain(n_links=4)
        with pytest.raises(ValueError, match="substeps"):
            evolve_ensemble_final(
                ex.system, ph4, 1e-3, 45, method="leapfrog_fused",
                iters=(3, 1), drift_every=45, steps_per_call=10,
            )


class TestFusedFamilies:
    """The non-chain model families on the declarative FusedForms contract
    (each defined alongside its model in hamilton_tpu/models/*.py): the
    fused kernel must reproduce the library leapfrog (the AD path) exactly,
    and the closed-form potential must equal the library ``pe`` — these are
    the docs/api.md "Joining the fused family" reference implementations."""

    CASES = {
        # model name → (example factory, IC center, IC spread)
        "spherical": (lambda: None, [1.0, 0.3], 0.05),
        "two_body": (lambda: None, [2.0, 0.1], 0.05),
        "spring": (lambda: None, [0.2, 0.1, 0.3], 0.05),
        "room": (lambda: None, [-1.0, 0.25], 0.05),
        "ellipse": (lambda: None, [2.0], 0.05),
        "bezier": (lambda: None, [0.5], 0.1),
        "bezier_lin": (lambda: None, [0.5], 0.1),
    }

    @staticmethod
    def _example(name):
        from hamilton_tpu.models import (
            bezier, ellipse, room, spherical_pendulum, spring, two_body,
        )

        return {
            "spherical": spherical_pendulum,
            "two_body": two_body,
            "spring": spring,
            "room": room,
            "ellipse": ellipse,
            "bezier": bezier,
            # degree-1 curve: the deg<2 branch (B'' ≡ 0) of the family
            "bezier_lin": lambda: bezier([(-1.0, -1.0), (1.0, 1.0)]),
        }[name]()

    def _phase(self, name, seed=7):
        _, q0, scale = self.CASES[name]
        n = len(q0)
        rng = np.random.default_rng(seed)
        return Phase(
            jnp.asarray(np.array(q0) + scale * rng.standard_normal((B, n))),
            jnp.asarray(scale * rng.standard_normal((B, n))),
        )

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_matches_library(self, name):
        ex = self._example(name)
        ph = self._phase(name)
        dt = jnp.float64(1e-3)
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 2))
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.init(ph)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph)
            for _ in range(2):
                c_lib = lib.step(c_lib, dt)
                c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-13)

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_closed_form_potential(self, name):
        """FamilyFns.potential ≡ library pe (powers the double-f32 drift
        sampler, which must measure the SAME Hamiltonian the library does)."""
        from hamilton_tpu.mechanics import pe
        from hamilton_tpu.ops.pallas_step import FM_JNP

        ex = self._example(name)
        ph = self._phase(name)
        forms = ex.system.fused_forms(ex.system)
        fam = forms.make(forms.const_accessors(), FM_JNP)
        cols = [ph.q[:, i] for i in range(forms.n)]
        u_forms = fam.potential(fam.aux(cols), cols)
        u_lib = pe(ex.system, ph.q)
        np.testing.assert_allclose(np.asarray(u_forms), np.asarray(u_lib),
                                   rtol=0, atol=1e-13)

    def test_two_body_sweep_matches_library(self):
        """Per-member (m1, m2) grids ride the runtime coefficient tiles of
        the two_body family exactly as the chain family's sweeps do."""
        rng = np.random.default_rng(9)
        ex = self._example("two_body")
        sysb = ex.system.replace_params({
            "m1": jnp.asarray(4.0 + rng.random(B)),
            "m2": jnp.asarray(0.3 + 0.3 * rng.random(B)),
        })
        ph = self._phase("two_body")
        dt = jnp.float64(1e-3)
        lib = make_stepper(sysb, "leapfrog", iters=(3, 2))
        fus = make_stepper(sysb, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.init(ph)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph)
            for _ in range(2):
                c_lib = lib.step(c_lib, dt)
                c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-13)

    def test_spherical_conserves_azimuthal_momentum(self):
        """p_φ is exactly conserved by the spherical closed forms: the fused
        dhdq has a structural zero in the φ row, so the kernel preserves it
        to the last bit over a multi-step block."""
        ex = self._example("spherical")
        ph = self._phase("spherical")
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(2, 1),
                           steps_per_call=5)
        with pltpu.force_tpu_interpret_mode():
            c = fus.step(fus.init(ph), jnp.float64(1e-3))
            out = fus.extract(c)
        np.testing.assert_array_equal(np.asarray(out.p[:, 1]),
                                      np.asarray(ph.p[:, 1]))


class TestSuzuki4:
    @pytest.mark.slow
    def test_suzuki4_fused_matches_library_composition(self, ph4):
        """The Suzuki 5-stage composition through the fused kernel ≡ the
        same composition of library leapfrog substeps (both in the exact
        iteration placement) — and it reports order 4."""
        from hamilton_tpu.ops.pallas_step import SUZUKI4_COMPOSITION

        ex = chain(n_links=4)
        dt = jnp.float64(2e-3)
        fus = make_stepper(ex.system, "suzuki4_fused", iters=(3, 2))
        assert fus.order == 4 and fus.symplectic
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 2))
        c_lib = lib.init(ph4)
        for w in SUZUKI4_COMPOSITION:
            c_lib = lib.step(c_lib, w * dt)
        a = lib.extract(c_lib)

        with pltpu.force_tpu_interpret_mode():
            b = fus.extract(fus.step(fus.init(ph4), dt))
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-12)

    def test_suzuki4_order(self):
        """Global error scales ~dt⁴: quartering the error when halving dt
        (single member, short horizon, library-side composition is already
        order-verified — this pins the fused wiring end to end)."""
        from hamilton_tpu.mechanics import hamiltonian

        ex = chain(n_links=2)
        rng = np.random.default_rng(2)
        ph = Phase(jnp.asarray(0.6 + 0.01 * rng.standard_normal((1024, 2))),
                   jnp.asarray(0.01 * rng.standard_normal((1024, 2))))
        h0 = hamiltonian(ex.system, ph)

        def drift_at(dt, n):
            st = make_stepper(ex.system, "suzuki4_fused", iters=(4, 3))
            with pltpu.force_tpu_interpret_mode():
                @jax.jit
                def run(c):
                    return jax.lax.fori_loop(
                        0, n, lambda i, cc: st.step(cc, jnp.float64(dt)), c
                    )

                out = st.extract(run(st.init(ph)))
            h1 = hamiltonian(ex.system, out)
            return float(jnp.max(jnp.abs((h1 - h0) / h0)))

        d1 = drift_at(4e-2, 8)
        d2 = drift_at(2e-2, 16)
        # order-4 energy error: ratio ~16; allow slack for the small sample
        assert d1 / d2 > 8.0, (d1, d2)


class TestSemiseparableChain:
    """O(n) semiseparable chain solver (``serial_chain_forms_on`` +
    ``FamilyFns.factor_solve``): the chain's mass matrix K_ij =
    S_max(i,j)·(u_i·u_j) is order-2 semiseparable, so factor/solve/∂H∂q
    all run in O(n).  Same fixed points as the dense family — parity to
    f64 rounding."""

    def _forms(self, n, seed=0, batched=None):
        from hamilton_tpu.ops.pallas_step import (
            serial_chain_forms, serial_chain_forms_on,
        )

        rng = np.random.default_rng(seed)
        if batched is None:
            m = list(0.3 + rng.random(n))
            l = list(0.4 + rng.random(n))
            g = 5.0
        else:
            m = jnp.asarray(0.3 + rng.random((batched, n)))
            l = jnp.asarray(0.4 + rng.random((batched, n)))
            g = jnp.asarray(4.0 + rng.random(batched))
        return serial_chain_forms(m, l, g), serial_chain_forms_on(m, l, g)

    def test_forms_math_matches_dense(self):
        """Library-level (pure jnp columns, f64): K entries identical,
        O(n) solve ≡ dense numpy solve, O(n) ∂H/∂q ≡ the dense 4n²
        dot-product form, potential identical — at n=20."""
        from hamilton_tpu.ops.pallas_step import FM_JNP

        n, B = 20, 64
        fd, fo = self._forms(n)
        famd = fd.make(fd.const_accessors(), FM_JNP)
        famo = fo.make(fo.const_accessors(), FM_JNP)
        rng = np.random.default_rng(1)
        q = [jnp.asarray(rng.uniform(-3, 3, B)) for _ in range(n)]
        w = [jnp.asarray(rng.standard_normal(B)) for _ in range(n)]
        b = [jnp.asarray(rng.standard_normal(B)) for _ in range(n)]
        auxd, auxo = famd.aux(q), famo.aux(q)
        kd, ko = famd.k_at(auxd, q), famo.k_at(auxo, q)
        for i in range(n):
            for j in range(i + 1):
                np.testing.assert_allclose(
                    np.asarray(kd(i, j)), np.asarray(ko(i, j)),
                    rtol=0, atol=1e-14,
                )
        fac = famo.factor_solve[0](auxo, q)
        x = famo.factor_solve[1](fac, b)
        K = np.zeros((B, n, n))
        for i in range(n):
            for j in range(n):
                K[:, i, j] = np.asarray(kd(max(i, j), min(i, j)))
        bmat = np.stack([np.asarray(bi) for bi in b], -1)[..., None]
        xref = np.linalg.solve(K, bmat)[..., 0]
        xon = np.stack([np.asarray(xi) for xi in x], -1)
        np.testing.assert_allclose(xon, xref, rtol=0, atol=1e-11)
        dd, do = famd.dhdq(auxd, q, w), famo.dhdq(auxo, q, w)
        scale = max(float(jnp.max(jnp.abs(dd[i]))) for i in range(n))
        for i in range(n):
            np.testing.assert_allclose(
                np.asarray(dd[i]), np.asarray(do[i]),
                rtol=0, atol=1e-12 * scale,
            )
        np.testing.assert_allclose(
            np.asarray(famd.potential(auxd, q)),
            np.asarray(famo.potential(auxo, q)), rtol=0, atol=1e-13,
        )

    def test_fused_matches_library(self):
        """Kernel path (interpreter, f64): semiseparable fused ≡ library
        leapfrog at 1e-12 over 2 steps."""
        ex = chain(n_links=5, fused_solver="semiseparable")
        rng = np.random.default_rng(2)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 5))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 5))))
        dt = jnp.float64(1e-3)
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 2))
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.init(ph)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph)
            for _ in range(2):
                c_lib = lib.step(c_lib, dt)
                c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-12)

    def test_param_sweep_matches_library(self):
        """Runtime-operand mode: per-member (m, l, g) sweeps ride the 3n
        coefficient table (vs the dense family's n²+n)."""
        rng = np.random.default_rng(5)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 4))))
        pb = {
            "masses": jnp.asarray(0.5 + rng.random((B, 4))),
            "lengths": jnp.asarray(0.5 + rng.random((B, 4))),
            "gravity": jnp.asarray(4.0 + rng.random(B)),
        }
        sysd = chain(n_links=4).system.replace_params(pb)
        syso = chain(
            n_links=4, fused_solver="semiseparable"
        ).system.replace_params(pb)
        dt = jnp.float64(1e-3)
        lib = make_stepper(sysd, "leapfrog", iters=(3, 2))
        fus = make_stepper(syso, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.step(lib.init(ph), dt)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph)
            assert len(c_fus) == 5  # 4 state tiles + ONE (3n) coef group
            c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-12)

    def test_factor_carry_block_bitwise(self):
        """steps_per_call blocks carry the (z, 1/d, u) factor entries in
        VMEM — block ≡ step-by-step bitwise (same guarantee the dense
        carry has)."""
        ex = chain(n_links=4, fused_solver="semiseparable")
        rng = np.random.default_rng(3)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 4))))
        dt = jnp.float64(1e-3)
        one = make_stepper(ex.system, "leapfrog_fused", iters=(3, 1),
                           steps_per_call=1)
        multi = make_stepper(ex.system, "leapfrog_fused", iters=(3, 1),
                             steps_per_call=5)
        with pltpu.force_tpu_interpret_mode():
            c1, cm = one.init(ph), multi.init(ph)
            for _ in range(5):
                c1 = one.step(c1, dt)
            cm = multi.step(cm, dt)
            a, b = one.extract(c1), multi.extract(cm)
        np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
        np.testing.assert_array_equal(np.asarray(a.p), np.asarray(b.p))

    @pytest.mark.slow
    def test_grad_matches_library(self):
        """The exact-replay VJP differentiates through the O(n) recursion
        (sqrt/div chains) — gradient ≡ library leapfrog gradient."""
        exd = chain(n_links=4)
        exo = chain(n_links=4, fused_solver="semiseparable")
        rng = np.random.default_rng(4)
        q0 = jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4)))
        p0 = jnp.asarray(0.01 * rng.standard_normal((B, 4)))
        dt = jnp.float64(1e-3)

        def loss(sys_, method, q):
            st = make_stepper(sys_, method, iters=(3, 1))
            c = st.init(Phase(q, p0))
            for _ in range(2):
                c = st.step(c, dt)
            f = st.extract(c)
            return jnp.sum(f.q ** 2 + f.p ** 2)

        gl = jax.grad(lambda q: loss(exd.system, "leapfrog", q))(q0)
        with pltpu.force_tpu_interpret_mode():
            gf = jax.grad(
                lambda q: loss(exo.system, "leapfrog_fused", q)
            )(q0)
        np.testing.assert_allclose(np.asarray(gl), np.asarray(gf),
                                   rtol=0, atol=1e-12)

    def test_df32_h_measure_matches_dense_forms(self):
        """The double-f32 drift sampler reads the semiseparable family's
        k_at/potential — H agrees with the dense family's df32 measure to
        pair roundoff on the same f32 state."""
        from hamilton_tpu.ops.df32 import fused_measure_h

        rng = np.random.default_rng(6)
        q = jnp.asarray(
            0.5 + 0.01 * rng.standard_normal((64, 4)), jnp.float32
        )
        p = jnp.asarray(
            0.01 * rng.standard_normal((64, 4)), jnp.float32
        )
        ph = Phase(q, p)
        hd = fused_measure_h(chain(n_links=4).system)(ph)
        ho = fused_measure_h(
            chain(n_links=4, fused_solver="semiseparable").system
        )(ph)
        np.testing.assert_allclose(np.asarray(hd), np.asarray(ho),
                                   rtol=0, atol=1e-10)


class TestLinvSolver:
    """``fused_solver="linv"`` (``serial_chain_forms_linv``): the
    semiseparable factorization plus an explicit L⁻¹ materialization, so
    solves are log-depth triangular mat-vecs.  Same fixed points as the
    dense/semiseparable families — parity to f64 rounding."""

    def test_solve_matches_numpy(self):
        """Library-level (pure jnp columns, f64) at n=20: the two-mat-vec
        solve ≡ dense numpy solve on the chain's mass matrix."""
        from hamilton_tpu.ops.pallas_step import (
            FM_JNP, serial_chain_forms, serial_chain_forms_linv,
        )

        n, b = 20, 64
        rng = np.random.default_rng(11)
        m = list(0.3 + rng.random(n))
        l = list(0.4 + rng.random(n))
        fd = serial_chain_forms(m, l, 5.0)
        fl = serial_chain_forms_linv(m, l, 5.0)
        famd = fd.make(fd.const_accessors(), FM_JNP)
        faml = fl.make(fl.const_accessors(), FM_JNP)
        q = [jnp.asarray(rng.uniform(-3, 3, b)) for _ in range(n)]
        rhs = [jnp.asarray(rng.standard_normal(b)) for _ in range(n)]
        auxd, auxl = famd.aux(q), faml.aux(q)
        kd = famd.k_at(auxd, q)
        fac = faml.factor_solve[0](auxl, q)
        assert len(fac) == n * (n + 1) // 2
        x = faml.factor_solve[1](fac, rhs)
        k_mat = np.zeros((b, n, n))
        for i in range(n):
            for j in range(n):
                k_mat[:, i, j] = np.asarray(kd(max(i, j), min(i, j)))
        bmat = np.stack([np.asarray(r) for r in rhs], -1)[..., None]
        xref = np.linalg.solve(k_mat, bmat)[..., 0]
        xon = np.stack([np.asarray(xi) for xi in x], -1)
        np.testing.assert_allclose(xon, xref, rtol=0, atol=1e-11)

    @pytest.mark.slow
    def test_fused_matches_library(self):
        """Kernel path (interpreter, f64): linv fused ≡ library leapfrog
        at 1e-12 over 2 steps, including the steps_per_call factor carry
        (the carried entries are the L⁻¹ columns)."""
        ex = chain(n_links=5, fused_solver="linv")
        rng = np.random.default_rng(12)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 5))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 5))))
        dt = jnp.float64(1e-3)
        lib = make_stepper(ex.system, "leapfrog", iters=(3, 2))
        fus = make_stepper(ex.system, "leapfrog_fused", iters=(3, 2),
                           steps_per_call=2)
        c_lib = lib.init(ph)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.init(ph)
            for _ in range(2):
                c_lib = lib.step(c_lib, dt)
                c_lib = lib.step(c_lib, dt)
                c_fus = fus.step(c_fus, dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-12)

    @pytest.mark.slow
    def test_param_sweep_matches_library(self):
        """Runtime-operand mode: per-member (m, l, g) sweeps ride the
        same 3n coefficient table as the semiseparable family."""
        rng = np.random.default_rng(13)
        ph = Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((B, 4))),
                   jnp.asarray(0.01 * rng.standard_normal((B, 4))))
        pb = {
            "masses": jnp.asarray(0.5 + rng.random((B, 4))),
            "lengths": jnp.asarray(0.5 + rng.random((B, 4))),
            "gravity": jnp.asarray(4.0 + rng.random(B)),
        }
        sysd = chain(n_links=4).system.replace_params(pb)
        sysl = chain(n_links=4, fused_solver="linv").system.replace_params(pb)
        dt = jnp.float64(1e-3)
        lib = make_stepper(sysd, "leapfrog", iters=(3, 2))
        fus = make_stepper(sysl, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.step(lib.init(ph), dt)
        with pltpu.force_tpu_interpret_mode():
            c_fus = fus.step(fus.init(ph), dt)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p),
                                   rtol=0, atol=1e-12)


class TestGroupUnroll:
    """``group_unroll``: multiple 1024-member tile groups per kernel
    instance — independent register streams hiding sequential-chain
    latency.  Per-lane arithmetic is untouched, so results are BITWISE
    identical to group_unroll=1 for every solver and mode."""

    def _ph(self, b, n=4, seed=0):
        rng = np.random.default_rng(seed)
        return Phase(jnp.asarray(0.5 + 0.01 * rng.standard_normal((b, n))),
                     jnp.asarray(0.01 * rng.standard_normal((b, n))))

    @pytest.mark.parametrize("solver", ["dense", "semiseparable", "linv",
                                        "mobius"])
    def test_bitwise_vs_unit(self, solver):
        ex = chain(n_links=4, fused_solver=solver)
        ph = self._ph(2048)
        dt = jnp.float64(1e-3)
        s1 = make_stepper(ex.system, "leapfrog_fused", iters=(2, 0),
                          steps_per_call=2, compensated=True)
        s2 = make_stepper(ex.system, "leapfrog_fused", iters=(2, 0),
                          steps_per_call=2, compensated=True,
                          group_unroll=2)
        with pltpu.force_tpu_interpret_mode():
            c1, c2 = s1.init(ph), s2.init(ph)
            c1, c2 = s1.step(c1, dt), s2.step(c2, dt)
            a, b = s1.extract(c1), s2.extract(c2)
        np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
        np.testing.assert_array_equal(np.asarray(a.p), np.asarray(b.p))

    def test_param_sweep_bitwise(self):
        rng = np.random.default_rng(1)
        b = 2048
        pb = {
            "masses": jnp.asarray(0.5 + rng.random((b, 4))),
            "lengths": jnp.asarray(0.5 + rng.random((b, 4))),
            "gravity": jnp.asarray(4.0 + rng.random(b)),
        }
        sysb = chain(
            n_links=4, fused_solver="semiseparable"
        ).system.replace_params(pb)
        ph = self._ph(b, seed=2)
        dt = jnp.float64(1e-3)
        s1 = make_stepper(sysb, "leapfrog_fused", iters=(2, 1))
        s2 = make_stepper(sysb, "leapfrog_fused", iters=(2, 1),
                          group_unroll=2)
        with pltpu.force_tpu_interpret_mode():
            c1, c2 = s1.init(ph), s2.init(ph)
            c1, c2 = s1.step(c1, dt), s2.step(c2, dt)
            a, b_ = s1.extract(c1), s2.extract(c2)
        np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b_.q))
        np.testing.assert_array_equal(np.asarray(a.p), np.asarray(b_.p))

    def test_validation(self):
        ex = chain(n_links=4)
        st = make_stepper(ex.system, "leapfrog_fused", group_unroll=2)
        with pytest.raises(ValueError, match="multiple of"):
            st.init(self._ph(1024))  # not a multiple of 1024·2
        with pytest.raises(ValueError, match="group_unroll"):
            make_stepper(ex.system, "leapfrog", group_unroll=2)


class TestMobiusSolver:
    """``serial_chain_forms_mobius``: the semiseparable factorization with
    its Riccati recursion collapsed to a scalar Möbius chain (homogeneous
    (p, q) pair — division/sqrt-free critical path).  Same factor in real
    arithmetic; entries/solves match the base family to f64 rounding."""

    def test_factor_matches_semiseparable(self):
        from hamilton_tpu.ops.pallas_step import (
            FM_JNP, serial_chain_forms_mobius, serial_chain_forms_on,
        )

        n, Bn = 20, 16
        rng = np.random.default_rng(7)
        m = list(0.3 + rng.random(n))
        l = list(0.4 + rng.random(n))
        fon = serial_chain_forms_on(m, l, 5.0)
        fmb = serial_chain_forms_mobius(m, l, 5.0)
        fam_on = fon.make(fon.const_accessors(), FM_JNP)
        fam_mb = fmb.make(fmb.const_accessors(), FM_JNP)
        q = [jnp.asarray(rng.uniform(-3, 3, Bn)) for _ in range(n)]
        b = [jnp.asarray(rng.standard_normal(Bn)) for _ in range(n)]
        aux_on, aux_mb = fam_on.aux(q), fam_mb.aux(q)
        ent_on = fam_on.factor_solve[0](aux_on, q)
        ent_mb = fam_mb.factor_solve[0](aux_mb, q)
        assert len(ent_on) == len(ent_mb) == 5 * n
        for a, bb in zip(ent_on, ent_mb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=0, atol=1e-12)
        x_on = fam_on.factor_solve[1](ent_on, b)
        x_mb = fam_mb.factor_solve[1](ent_mb, b)
        for a, bb in zip(x_on, x_mb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=0, atol=1e-11)

    def test_sweep_kernel_matches_semiseparable(self):
        """Runtime-operand (batched params) mode through the KERNEL: the
        mobius factor's tile arithmetic on per-member coefficient blocks
        must match the semiseparable solver exactly (the broadcast-
        sensitive path; minimal config to stay in the default tier)."""
        rng = np.random.default_rng(9)
        b, n = B, 2
        ph = Phase(jnp.asarray(0.4 + 0.01 * rng.standard_normal((b, n)),
                               jnp.float32),
                   jnp.asarray(0.01 * rng.standard_normal((b, n)),
                               jnp.float32))
        masses = jnp.asarray(0.5 + rng.random((b, n)), jnp.float32)
        grav = jnp.asarray(4.0 + rng.random(b), jnp.float32)
        outs = {}
        for solver in ("semiseparable", "mobius"):
            sysb = chain(n_links=n, fused_solver=solver).system
            sysb = sysb.replace_params({
                "masses": masses,
                "lengths": jnp.broadcast_to(
                    sysb.params["lengths"].astype(jnp.float32), (b, n)
                ),
                "gravity": grav,
            })
            fus = make_stepper(sysb, "leapfrog_fused", iters=(1, 1))
            with pltpu.force_tpu_interpret_mode():
                c = fus.step(fus.init(ph), jnp.float32(1e-3))
                outs[solver] = fus.extract(c)
        np.testing.assert_array_equal(
            np.asarray(outs["mobius"].q), np.asarray(outs["semiseparable"].q)
        )
        np.testing.assert_array_equal(
            np.asarray(outs["mobius"].p), np.asarray(outs["semiseparable"].p)
        )

    def test_sweep_table_layout(self):
        """The 5n coefficient table (l, S, g·l·S, m, 1/m) materializes for
        batched params and its 3n prefix matches the base family's."""
        from hamilton_tpu.ops.pallas_step import (
            serial_chain_forms_mobius, serial_chain_forms_on,
        )

        rng = np.random.default_rng(8)
        m = jnp.asarray(0.5 + rng.random((6, 4)))
        l = jnp.asarray(0.5 + rng.random((6, 4)))
        g = jnp.asarray(4.0 + rng.random(6))
        fon = serial_chain_forms_on(m, l, g)
        fmb = serial_chain_forms_mobius(m, l, g)
        assert fmb.consts is None and fmb.coef_lens == (20,)
        (t_on,) = fon.arrays_fn(jnp.float64)
        (t_mb,) = fmb.arrays_fn(jnp.float64)
        np.testing.assert_allclose(np.asarray(t_mb[..., :12]),
                                   np.asarray(t_on), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(t_mb[..., 12:16]),
                                   np.asarray(m), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(t_mb[..., 16:]),
                                   np.asarray(1.0 / m), rtol=0, atol=1e-16)


class TestAuxShift:
    """First-order within-step aux re-evaluation (``FamilyFns.aux_shift``):
    f32 kernels replace refinement transcendentals with mul/adds; f64
    kernels keep fresh evaluations (the shift's dq²/2 truncation is below
    f32 resolution but visible at f64 — the dtype gate in ``increments``)."""

    def test_trig_shift_first_order_exact(self):
        from hamilton_tpu.ops.pallas_step import _trig_aux_shift

        n = 5
        rng = np.random.default_rng(3)
        q = rng.uniform(-3, 3, n)
        dq = 1e-6 * rng.uniform(-1.0, 1.0, n)
        aux = tuple(jnp.asarray(np.sin(q[i])) for i in range(n)) + tuple(
            jnp.asarray(np.cos(q[i])) for i in range(n)
        )
        shifted = _trig_aux_shift(n)(aux, [jnp.asarray(d) for d in dq])
        for i in range(n):
            # first-order truncation: |err| <= dq²/2 = 5e-13 at |dq|<=1e-6
            assert abs(float(shifted[i]) - np.sin(q[i] + dq[i])) < 1e-12
            assert abs(float(shifted[n + i]) - np.cos(q[i] + dq[i])) < 1e-12

    def test_dtype_gate_in_kernel_costs(self):
        """The f32 kernel's jaxpr carries ~one fresh aux eval per step at
        (2,0) (61 transcendentals at chain-20); the f64 kernel keeps two
        (101) — the gate, measured where it matters."""
        from hamilton_tpu.models import chain
        from hamilton_tpu.utils.roofline import fused_step_cost

        ex = chain(n_links=20, fused_solver="semiseparable")
        sys32 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ex.system
        )
        c32 = fused_step_cost(sys32, iters=(2, 0), steps_per_call=50)
        c64 = fused_step_cost(ex.system, iters=(2, 0), steps_per_call=50,
                              dtype=jnp.float64)
        assert c32["transcendentals_per_member_step"] < 70
        assert c64["transcendentals_per_member_step"] > 90
