"""Ensemble and sharding tests on the virtual 8-device CPU mesh.

Covers SURVEY.md §4 (e) vmap ≡ loop at the trajectory level, plus the
mesh-sharded path the driver's multichip dry-run exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamilton_tpu import (
    Phase,
    evolve_ensemble,
    evolve_ensemble_sharded,
    evolve_ham_fixed,
    hamiltonian,
)
from hamilton_tpu.ensemble import evolve_ensemble_final
from hamilton_tpu.models import double_pendulum
from hamilton_tpu.parallel import ensemble_mesh, shard_phase

DP = double_pendulum()


def make_batch(b=16):
    ph0 = DP.init_phase
    deltas = jnp.linspace(-0.01, 0.01, b)[:, None] * jnp.array([1.0, 0.0])
    return Phase(ph0.q[None, :] + deltas, jnp.tile(ph0.p, (b, 1)))


class TestEnsemble:
    def test_vmap_equals_loop(self):
        batch = make_batch(4)
        traj = evolve_ensemble(DP.system, batch, 0.01, 50, method="gauss4",
                               emit_every=10)
        assert traj.q.shape == (6, 4, 2)  # (time incl init, batch, n)
        for i in range(4):
            single = evolve_ham_fixed(
                DP.system, Phase(batch.q[i], batch.p[i]), 0.01, 50,
                method="gauss4", emit_every=10,
            )
            np.testing.assert_allclose(
                np.asarray(traj.q[:, i]), np.asarray(single.q), rtol=1e-10, atol=1e-12
            )

    def test_final_matches_trajectory_endpoint(self):
        batch = make_batch(8)
        traj = evolve_ensemble(DP.system, batch, 0.01, 100, emit_every=100)
        final, drift = evolve_ensemble_final(
            DP.system, batch, 0.01, 100, drift_every=50
        )
        np.testing.assert_allclose(
            np.asarray(final.q), np.asarray(traj.q[-1]), rtol=1e-10, atol=1e-12
        )
        assert drift.shape == (8,)
        assert np.all(np.asarray(drift) < 1e-6)

    def test_params_mass_sweep_native_path(self):
        """First-class parameter sweep: batch the ``params`` leaves and
        evolve on the native-batch path; every member must match a freshly
        constructed per-member system evolved alone."""
        from hamilton_tpu.models import double_pendulum as dpf

        b = 5
        m2s = jnp.linspace(0.5, 2.0, b)
        base = dpf()
        sysb = base.system.replace_params({
            "m1": jnp.ones(b), "m2": m2s,
        })
        ph0 = base.init_phase
        ph = Phase(jnp.tile(ph0.q, (b, 1)), jnp.tile(ph0.p, (b, 1)))
        traj = evolve_ensemble(sysb, ph, 0.01, 20, method="gauss4",
                               emit_every=20)
        assert traj.q.shape == (2, b, 2)
        for i in range(b):
            ex_i = dpf(1.0, float(m2s[i]))
            out_i = evolve_ham_fixed(
                ex_i.system, Phase(ph0.q, ph0.p), 0.01, 20,
                method="gauss4", emit_every=20,
            )
            np.testing.assert_allclose(
                np.asarray(traj.q[-1, i]), np.asarray(out_i.q[-1]),
                rtol=1e-12, atol=1e-13,
            )
        # different masses → different dynamics
        assert not np.allclose(
            np.asarray(traj.q[-1, 0]), np.asarray(traj.q[-1, -1])
        )

    def test_params_sweep_energy_per_member(self):
        """Per-member Hamiltonians of a swept ensemble track each member's
        own physics (the silent-wrong-physics hazard of closure-baked
        parameters, now structurally impossible for bundled models)."""
        from hamilton_tpu.models import double_pendulum as dpf

        b = 3
        m2s = jnp.array([0.5, 1.0, 2.0])
        base = dpf()
        sysb = base.system.replace_params({"m1": jnp.ones(b), "m2": m2s})
        ph0 = base.init_phase
        ph = Phase(jnp.tile(ph0.q, (b, 1)), jnp.tile(ph0.p, (b, 1)))
        h = hamiltonian(sysb, ph)
        for i in range(b):
            h_i = hamiltonian(dpf(1.0, float(m2s[i])).system, ph0)
            np.testing.assert_allclose(float(h[i]), float(h_i), rtol=1e-12)

    def test_system_batched_legacy_inertia_sweep(self):
        """The legacy explicit-vmap path (system_batched=True) still works
        for hand-built systems whose variation lives in the inertia leaf."""
        from hamilton_tpu import mk_system

        b = 4
        scales = jnp.linspace(1.0, 2.0, b)
        inertias = scales[:, None] * jnp.ones((1, 2))

        # mass-scaled free particle in a quadratic well: no params pytree,
        # the potential is mass-independent so the inertia leaf is the only
        # swept quantity (the legacy-sweep contract)
        sys0 = mk_system(
            jnp.ones(2), lambda q: q, lambda q: 0.5 * jnp.sum(q**2), n=2,
        )
        sysb = jax.tree_util.tree_map(
            lambda leaf: inertias if leaf.shape == (2,) else leaf, sys0
        )
        ph = Phase(jnp.tile(jnp.array([1.0, 0.0]), (b, 1)),
                   jnp.tile(jnp.array([0.0, 1.0]), (b, 1)))
        traj = evolve_ensemble(sysb, ph, 0.01, 20, method="gauss4",
                               emit_every=20, system_batched=True)
        assert traj.q.shape == (2, b, 2)  # (time incl init, batch, n)
        # heavier members move slower under the same momenta
        assert float(traj.q[-1, 0, 1]) > float(traj.q[-1, -1, 1])


class TestSharded:
    @pytest.mark.slow
    def test_sharded_params_sweep_matches_unsharded(self, devices8):
        """Batched params shard along the ensemble mesh axis: the sharded
        sweep must equal the unsharded sweep bitwise-closely."""
        from hamilton_tpu.models import double_pendulum as dpf

        b = 16
        base = dpf()
        sysb = base.system.replace_params({
            "m1": jnp.ones(b),
            "m2": jnp.linspace(0.5, 2.0, b),
        })
        batch = make_batch(b)
        mesh = ensemble_mesh(devices8)
        final_s, drift_s = evolve_ensemble_sharded(
            sysb, batch, 0.01, 50, mesh=mesh, drift_every=50
        )
        final_u, drift_u = evolve_ensemble_final(
            sysb, batch, 0.01, 50, drift_every=50
        )
        np.testing.assert_allclose(
            np.asarray(final_s.q), np.asarray(final_u.q),
            rtol=1e-12, atol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(drift_s), np.asarray(drift_u), rtol=1e-6, atol=1e-12
        )

    def test_sharded_matches_unsharded(self, devices8):
        mesh = ensemble_mesh(devices8)
        batch = make_batch(16)
        final_s, drift_s = evolve_ensemble_sharded(
            DP.system, batch, 0.01, 100, mesh=mesh, drift_every=50
        )
        final_u, drift_u = evolve_ensemble_final(
            DP.system, batch, 0.01, 100, drift_every=50
        )
        np.testing.assert_allclose(
            np.asarray(final_s.q), np.asarray(final_u.q), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(drift_s), np.asarray(drift_u), rtol=1e-9, atol=1e-15
        )

    def test_sharded_trajectory(self, devices8):
        mesh = ensemble_mesh(devices8)
        batch = make_batch(8)
        traj = evolve_ensemble_sharded(
            DP.system, batch, 0.01, 40, mesh=mesh, emit_every=20
        )
        assert traj.q.shape == (3, 8, 2)

    def test_bad_batch_divisibility(self, devices8):
        mesh = ensemble_mesh(devices8)
        batch = make_batch(12)  # not divisible by 8
        with pytest.raises(ValueError):
            evolve_ensemble_sharded(DP.system, batch, 0.01, 10, mesh=mesh)

    def test_gspmd_auto_sharding(self, devices8):
        """The pjit path: device_put with NamedSharding + plain jit."""
        mesh = ensemble_mesh(devices8)
        batch = shard_phase(make_batch(16), mesh)

        @jax.jit
        def run(ph):
            final, drift = evolve_ensemble_final(
                DP.system, ph, 0.01, 50, drift_every=50
            )
            return final, jnp.max(drift)

        final, maxdrift = run(batch)
        assert final.q.shape == (16, 2)
        assert float(maxdrift) < 1e-6

    def test_2d_param_mesh(self, devices8):
        """2-D mesh: ensemble × param axes (4 × 2)."""
        mesh = ensemble_mesh(devices8, param_axis=2)
        assert mesh.shape["ensemble"] == 4 and mesh.shape["param"] == 2


class Test2DBatchGrid:
    def test_2d_ic_param_grid_gspmd(self, devices8):
        """A 2-D batch grid (IC sweep × phase-offset sweep) sharded over the
        2-D ensemble×param mesh via GSPMD: mechanics handle arbitrary
        leading batch axes end to end."""
        from hamilton_tpu.parallel import ensemble_mesh, shard_phase

        mesh = ensemble_mesh(devices8, param_axis=2)  # 4 × 2
        b1, b2 = 8, 4
        base = DP.init_phase
        dq = jnp.linspace(-0.01, 0.01, b1)[:, None, None] * jnp.array([1.0, 0.0])
        dp = jnp.linspace(0.0, 0.05, b2)[None, :, None] * jnp.array([0.0, 1.0])
        ph = Phase(
            jnp.broadcast_to(base.q, (b1, b2, 2)) + dq,
            jnp.broadcast_to(base.p, (b1, b2, 2)) + dp,
        )
        ph = shard_phase(ph, mesh, batch_ndim=2)

        @jax.jit
        def run(p):
            final, drift = evolve_ensemble_final(
                DP.system, p, 0.01, 100, method="gauss4", drift_every=50
            )
            return final, drift

        final, drift = run(ph)
        assert final.q.shape == (b1, b2, 2)
        assert drift.shape == (b1, b2)
        assert float(jnp.max(drift)) < 1e-6
        # spot-check one member against an unbatched run
        single = evolve_ham_fixed(
            DP.system, Phase(ph.q[3, 1], ph.p[3, 1]), 0.01, 100, emit_every=100
        )
        np.testing.assert_allclose(
            np.asarray(final.q[3, 1]), np.asarray(single.q[-1]), rtol=1e-9
        )


class TestDistributedHooks:
    """Multi-host runtime wrappers (SURVEY §5 distributed row).  This test
    environment is single-process, so only the graceful-degradation paths
    run; the multi-process path is the same mesh/shard_map code over the
    global device set."""

    def test_init_distributed_single_process_is_noop(self):
        from hamilton_tpu.parallel import init_distributed, is_distributed

        # jax is already initialized here (and no cluster env exists), so
        # auto-detection must degrade to single-process mode, not raise
        assert init_distributed() in (False, True)
        assert not is_distributed()

    def test_init_distributed_explicit_bad_coordinator_raises(self):
        import pytest

        from hamilton_tpu.parallel import init_distributed

        with pytest.raises(Exception):
            init_distributed(
                coordinator_address="127.0.0.1:1", num_processes=2, process_id=0
            )

    def test_global_mesh_and_local_slice(self, devices8):
        from hamilton_tpu.parallel import global_ensemble_mesh, local_batch_slice

        mesh = global_ensemble_mesh(param_axis=2)
        assert mesh.shape["ensemble"] * mesh.shape["param"] == len(jax.devices())
        sl = local_batch_slice(64)
        assert (sl.stop - sl.start) * jax.process_count() == 64

    @pytest.mark.slow
    def test_sharded_evolution_over_global_mesh(self, devices8):
        from hamilton_tpu.ensemble import evolve_ensemble_sharded
        from hamilton_tpu.models import chain
        from hamilton_tpu.parallel import global_ensemble_mesh, shard_phase

        ex = chain(n_links=3)
        mesh = global_ensemble_mesh()
        b = 16
        ph = Phase(
            jnp.tile(ex.init_phase.q, (b, 1)), jnp.tile(ex.init_phase.p, (b, 1))
        )
        ph = shard_phase(ph, mesh)
        final, drift = evolve_ensemble_sharded(
            ex.system, ph, 1e-3, 4, mesh=mesh, method="leapfrog", iters=3,
            drift_every=4, reduce_stats="max",
        )
        assert final.q.shape == (b, 3)
        assert float(drift) < 1e-6


class TestChunked:
    """Chunked long-horizon driver: identical to the one-dispatch driver to
    ~1 ULP (the carry incl. Kahan compensation and the cached QFactor
    survives the dispatch cut; XLA fusion at the boundary may change final
    roundings)."""

    @pytest.mark.parametrize("method,comp", [
        ("gauss4", False), ("leapfrog", True)
    ])
    def test_chunked_equals_one_dispatch(self, method, comp):
        from hamilton_tpu.ensemble import evolve_ensemble_chunked

        ph = make_batch(4)
        kw = dict(method=method, iters=4, drift_every=5, compensated=comp)
        f1, d1 = evolve_ensemble_final(DP.system, ph, 1e-3, 40, **kw)
        f2, d2 = evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 40, chunk_steps=10, **kw
        )
        np.testing.assert_allclose(
            np.asarray(f1.q), np.asarray(f2.q), rtol=5e-15, atol=1e-18
        )
        np.testing.assert_allclose(
            np.asarray(f1.p), np.asarray(f2.p), rtol=5e-15, atol=1e-18
        )
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), rtol=5e-12, atol=1e-16
        )

    def test_chunked_callback_and_validation(self):
        from hamilton_tpu.ensemble import evolve_ensemble_chunked

        ph = make_batch(2)
        seen = []
        evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 20, chunk_steps=5, method="leapfrog",
            iters=3, drift_every=5,
            callback=lambda ci, phase, drift: seen.append(
                (ci, phase.q.shape, float(jnp.max(drift)))
            ),
        )
        assert [s[0] for s in seen] == [0, 1, 2, 3]
        assert all(s[1] == (2, 2) for s in seen)
        # running max is monotone across chunks
        assert seen[0][2] <= seen[-1][2] + 1e-18
        with pytest.raises(ValueError):
            evolve_ensemble_chunked(DP.system, ph, 1e-3, 20, chunk_steps=7)
        with pytest.raises(ValueError):
            evolve_ensemble_chunked(
                DP.system, ph, 1e-3, 20, chunk_steps=10, drift_every=4
            )

    def test_chunked_exact_resume_via_carry(self):
        """carry_callback + initial_carry/initial_drift resume a chunked
        run bitwise (a Phase alone loses the Kahan residuals and warm
        state — the raw carry is the full checkpointable state)."""
        from hamilton_tpu.ensemble import evolve_ensemble_chunked

        ph = make_batch(4)
        common = dict(
            method="leapfrog", iters=(2, 0), compensated=True,
            drift_every=5,
        )
        f_full, d_full = evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 40, chunk_steps=10, **common
        )
        saved = {}
        evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 20, chunk_steps=10, **common,
            carry_callback=lambda ci, carry, drift, obs: saved.update(
                carry=carry, drift=drift
            ),
        )
        f_res, d_res = evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 20, chunk_steps=10, **common,
            initial_carry=saved["carry"], initial_drift=saved["drift"],
        )
        np.testing.assert_array_equal(np.asarray(f_full.q), np.asarray(f_res.q))
        np.testing.assert_array_equal(np.asarray(f_full.p), np.asarray(f_res.p))
        np.testing.assert_array_equal(np.asarray(d_full), np.asarray(d_res))

    def test_chunked_legacy_3arg_carry_callback(self):
        """Round-3 carry callbacks took (ci, carry, drift); they keep
        working for one release — the chunked driver detects the arity and
        omits the round-4 observable argument (ADVICE r4)."""
        from hamilton_tpu.ensemble import evolve_ensemble_chunked

        ph = make_batch(4)
        seen = []

        def legacy_cb(ci, carry, drift):
            seen.append(ci)

        evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 20, chunk_steps=10, method="leapfrog",
            iters=(2, 0), drift_every=5, carry_callback=legacy_cb,
        )
        assert seen == [0, 1]

    def test_chunked_resume_preserves_observable(self):
        """The streaming-observable accumulator is checkpointable state:
        ``carry_callback`` receives it (4th argument) and ``initial_obs``
        restores it, so a mid-run resume reproduces the uninterrupted
        run's observable bitwise — without this, a resumed run would
        silently restart the reduction from the resume point."""
        from hamilton_tpu.ensemble import evolve_ensemble_chunked
        from hamilton_tpu.utils import RunningExtrema

        ph = make_batch(4)
        swing = RunningExtrema(lambda p: jnp.abs(p.q[..., 0]))
        common = dict(method="leapfrog", iters=(2, 0), compensated=True,
                      drift_every=5, observable=swing, obs_every=5)
        f_full, d_full, o_full = evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 40, chunk_steps=10, **common
        )
        saved = {}
        evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 20, chunk_steps=10, **common,
            carry_callback=lambda ci, c, d, o: saved.update(
                carry=c, drift=d, obs=o
            ),
        )
        f_res, d_res, o_res = evolve_ensemble_chunked(
            DP.system, ph, 1e-3, 20, chunk_steps=10, **common,
            initial_carry=saved["carry"], initial_drift=saved["drift"],
            initial_obs=saved["obs"],
        )
        np.testing.assert_array_equal(np.asarray(f_full.q), np.asarray(f_res.q))
        np.testing.assert_array_equal(np.asarray(d_full), np.asarray(d_res))
        for key in ("min", "max"):
            np.testing.assert_array_equal(
                np.asarray(o_full[key]), np.asarray(o_res[key])
            )


class TestStreamingObservables:
    """In-loop user reductions (VERDICT r3 item 5): the drift sampler
    generalized to a cond-guarded hook accumulating in the loop carry —
    full horizons with no trajectory emission."""

    def _paired(self, b=64, chaotic=False, seed=0):
        from hamilton_tpu.utils import LyapunovPairs

        rng = np.random.default_rng(seed)
        base = np.pi / 2 if chaotic else 0.05
        scale = 0.02 if chaotic else 0.001
        q0 = np.stack([base + scale * rng.standard_normal(b),
                       scale * rng.standard_normal(b)], 1)
        ph = Phase(jnp.asarray(q0), jnp.zeros((b, 2)))
        return LyapunovPairs(d0=1e-7), LyapunovPairs.pair_ensemble(ph, 1e-7)

    @pytest.mark.slow
    def test_lyapunov_separates_chaotic_from_regular(self):
        """Benettin pairs in-loop: chaotic double-pendulum ICs measure
        λ ≈ 0.5–0.9, regular small-angle ICs λ ≈ 0 — with renormalization
        every 200 steps the estimate survives horizons where the emitted-
        trajectory estimator would long have saturated."""
        ex = double_pendulum()
        lp, paired = self._paired(chaotic=True)
        n_steps, dt = 20_000, 5e-3
        _, _, obs = evolve_ensemble_final(
            ex.system, paired, dt, n_steps, method="gauss4", iters=6,
            drift_every=1000, observable=lp, obs_every=200,
        )
        lam = lp.lyapunov(obs, n_steps * dt)
        assert 0.3 < float(jnp.mean(lam)) < 1.2
        assert int(obs["n_renorms"]) == n_steps // 200

        lp2, paired_r = self._paired(chaotic=False)
        _, _, obs_r = evolve_ensemble_final(
            ex.system, paired_r, dt, n_steps, method="gauss4", iters=6,
            drift_every=1000, observable=lp2, obs_every=200,
        )
        assert float(jnp.mean(lp2.lyapunov(obs_r, n_steps * dt))) < 0.05

    def test_chunked_matches_one_dispatch_regular(self):
        """Chunked ≡ one-dispatch for the observable accumulator on a
        regular (non-chaotic) config; chaotic configs amplify the
        documented ~1-ULP dispatch-boundary difference (see the
        LyapunovPairs docstring), so the tight check lives on λ ≈ 0."""
        from hamilton_tpu.ensemble import evolve_ensemble_chunked

        ex = double_pendulum()
        lp, paired = self._paired(chaotic=False)
        _, _, o1 = evolve_ensemble_final(
            ex.system, paired, 5e-3, 4000, method="gauss4", iters=6,
            drift_every=1000, observable=lp, obs_every=200,
        )
        _, _, o2 = evolve_ensemble_chunked(
            ex.system, paired, 5e-3, 4000, chunk_steps=2000,
            method="gauss4", iters=6, drift_every=1000,
            observable=lp, obs_every=200,
        )
        np.testing.assert_allclose(
            np.asarray(o1["sum_log"]), np.asarray(o2["sum_log"]),
            rtol=0, atol=1e-7,
        )

    @pytest.mark.slow
    def test_sharded_matches_unsharded(self, devices8):
        """Interleaved pairs keep both members on one shard (even shard
        size), so the transforming observable runs unchanged under
        shard_map."""
        from hamilton_tpu.ensemble import evolve_ensemble_sharded

        ex = double_pendulum()
        lp, paired = self._paired(chaotic=False)
        mesh = ensemble_mesh(devices8, param_axis=1)
        _, _, o_un = evolve_ensemble_final(
            ex.system, paired, 5e-3, 2000, method="gauss4", iters=6,
            drift_every=1000, observable=lp, obs_every=200,
        )
        _, _, o_sh = evolve_ensemble_sharded(
            ex.system, paired, 5e-3, 2000, mesh=mesh, method="gauss4",
            iters=6, drift_every=1000, observable=lp, obs_every=200,
        )
        np.testing.assert_allclose(
            np.asarray(o_un["sum_log"]), np.asarray(o_sh["sum_log"]),
            rtol=0, atol=1e-7,
        )
        assert int(o_sh["n_renorms"]) == int(o_un["n_renorms"])

    def test_fused_stepper_with_transforming_observable(self):
        """The fused kernel composes with a state-transforming observable:
        the driver re-inits the tile carry from the renormalized phase at
        each sample; trajectories match the library path."""
        from jax.experimental.pallas import tpu as pltpu

        from hamilton_tpu.models import chain
        from hamilton_tpu.utils import LyapunovPairs

        rng = np.random.default_rng(1)
        ex = chain(n_links=4)
        lp = LyapunovPairs(d0=1e-7)
        q0 = 0.5 + 0.01 * rng.standard_normal((512, 4))
        ph = LyapunovPairs.pair_ensemble(
            Phase(jnp.asarray(q0), jnp.zeros((512, 4))), 1e-7
        )
        with pltpu.force_tpu_interpret_mode():
            _, _, o_f = evolve_ensemble_final(
                ex.system, ph, 1e-3, 40, method="leapfrog_fused",
                iters=(3, 1), drift_every=20, observable=lp, obs_every=20,
                steps_per_call=10,
            )
        _, _, o_l = evolve_ensemble_final(
            ex.system, ph, 1e-3, 40, method="leapfrog", iters=(3, 1),
            drift_every=20, observable=lp, obs_every=20,
        )
        np.testing.assert_allclose(
            np.asarray(o_f["sum_log"]), np.asarray(o_l["sum_log"]),
            rtol=0, atol=1e-8,
        )

    def test_running_extrema(self):
        """Observe-only hook: streaming min/max without state edits."""
        from hamilton_tpu.utils import RunningExtrema

        ex = double_pendulum()
        rng = np.random.default_rng(2)
        q0 = np.stack([0.3 + 0.01 * rng.standard_normal(32),
                       0.01 * rng.standard_normal(32)], 1)
        ph = Phase(jnp.asarray(q0), jnp.zeros((32, 2)))
        obs = RunningExtrema(lambda p: p.q[:, 0])
        final, _, state = evolve_ensemble_final(
            ex.system, ph, 5e-3, 2000, method="gauss4", iters=6,
            drift_every=1000, observable=obs, obs_every=10,
        )
        assert float(jnp.max(state["max"])) <= 0.35
        assert float(jnp.min(state["min"])) >= -0.35
        assert jnp.all(state["min"] <= state["max"])

    def test_obs_every_validation(self):
        ex = double_pendulum()
        lp, paired = self._paired()
        with pytest.raises(ValueError, match="obs_every"):
            evolve_ensemble_final(
                ex.system, paired, 5e-3, 100, method="gauss4",
                drift_every=100, observable=lp,
            )
