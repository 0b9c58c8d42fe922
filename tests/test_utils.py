"""Tests for the auxiliary subsystems: observables, checkpoint, diagnostics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamilton_tpu import Phase, evolve_ham_fixed, hamiltonian
from hamilton_tpu.models import double_pendulum
from hamilton_tpu.utils import (
    benchmark_fn,
    check_finite_phase,
    energies,
    energy_drift,
    load_checkpoint,
    lyapunov_estimate,
    save_checkpoint,
)
from hamilton_tpu.utils.diagnostics import energy_sentinel

DP = double_pendulum()


class TestObservables:
    def test_energies_match_scalar_api(self):
        ph = DP.init_phase
        e = energies(DP.system, ph)
        np.testing.assert_allclose(
            float(e["h"]), float(hamiltonian(DP.system, ph)), rtol=1e-12
        )
        np.testing.assert_allclose(
            float(e["ke"] + e["pe"]), float(e["h"]), rtol=1e-12
        )

    def test_energies_batched_shapes(self):
        traj = evolve_ham_fixed(DP.system, DP.init_phase, 0.01, 20, emit_every=10)
        e = energies(DP.system, traj)
        assert e["h"].shape == (3,)

    def test_energy_drift_zero_on_constant(self):
        traj = Phase(
            jnp.tile(DP.init_phase.q, (5, 1)), jnp.tile(DP.init_phase.p, (5, 1))
        )
        assert float(energy_drift(DP.system, traj)) == 0.0

    def test_energy_drift_small_for_symplectic(self):
        traj = evolve_ham_fixed(
            DP.system, DP.init_phase, 0.005, 400, method="gauss4", emit_every=40
        )
        assert float(energy_drift(DP.system, traj)) < 1e-8

    def test_lyapunov_positive_for_chaotic_double_pendulum(self):
        ph0 = DP.init_phase
        ph0b = Phase(ph0.q + jnp.array([1e-8, 0.0]), ph0.p)
        kw = dict(dt=0.01, n_steps=1500, method="gauss4", emit_every=50)
        ta = evolve_ham_fixed(DP.system, ph0, **kw)
        tb = evolve_ham_fixed(DP.system, ph0b, **kw)
        lam = float(lyapunov_estimate(DP.system, ta, tb, 0.5))
        assert lam > 0.1, f"chaotic system should have λ > 0, got {lam}"


class TestCheckpoint:
    def test_round_trip_bitwise(self, tmp_path):
        traj = evolve_ham_fixed(DP.system, DP.init_phase, 0.01, 10, emit_every=10)
        ph = Phase(traj.q[-1], traj.p[-1])
        path = os.path.join(tmp_path, "ckpt.npz")
        save_checkpoint(path, ph, step=10, extra={"dt": 0.01})
        loaded, step, extra = load_checkpoint(path)
        assert step == 10 and extra == {"dt": 0.01}
        assert np.asarray(loaded.q).tobytes() == np.asarray(ph.q).tobytes()
        assert np.asarray(loaded.p).tobytes() == np.asarray(ph.p).tobytes()

    def test_resume_equals_straight_run(self, tmp_path):
        """Bitwise resume: run 20 = run 10, checkpoint, run 10 more."""
        straight = evolve_ham_fixed(DP.system, DP.init_phase, 0.01, 20, emit_every=20)
        half = evolve_ham_fixed(DP.system, DP.init_phase, 0.01, 10, emit_every=10)
        path = os.path.join(tmp_path, "half.npz")
        save_checkpoint(path, Phase(half.q[-1], half.p[-1]), step=10)
        mid, step, _ = load_checkpoint(path)
        rest = evolve_ham_fixed(DP.system, mid, 0.01, 10, emit_every=10)
        assert (
            np.asarray(rest.q[-1]).tobytes() == np.asarray(straight.q[-1]).tobytes()
        )

    def test_arbitrary_pytree_with_like(self, tmp_path):
        state = {"a": jnp.arange(3.0), "b": (jnp.ones(2), jnp.zeros(1))}
        path = os.path.join(tmp_path, "tree.npz")
        save_checkpoint(path, state)
        loaded, _, _ = load_checkpoint(path, like=state)
        assert set(loaded) == {"a", "b"}
        np.testing.assert_array_equal(np.asarray(loaded["a"]), [0, 1, 2])


class TestDiagnostics:
    def test_check_finite(self):
        assert bool(check_finite_phase(DP.init_phase))
        bad = Phase(jnp.array([jnp.nan, 0.0]), jnp.zeros(2))
        assert not bool(check_finite_phase(bad))

    def test_energy_sentinel(self):
        ph = DP.init_phase
        h0 = hamiltonian(DP.system, ph)
        assert bool(energy_sentinel(DP.system, ph, h0))
        blown = Phase(ph.q, ph.p + 1e6)
        assert not bool(energy_sentinel(DP.system, blown, h0))

    def test_nan_guard_reports_under_jit(self):
        """A deliberately-divergent jitted run must actually raise: the error
        is carried as a checkify value and thrown on the host (a raise inside
        compiled code would be swallowed on TPU)."""
        from jax.experimental import checkify

        from hamilton_tpu.utils.diagnostics import checked, nan_guard

        def poison(ph: Phase, bad) -> Phase:
            out = Phase(ph.q / bad, ph.p)  # bad=0 → inf
            return nan_guard(out, where="test-step")

        run = checked(jax.jit(poison))
        ok = run(DP.init_phase, jnp.asarray(2.0))
        assert bool(check_finite_phase(ok))
        with pytest.raises(checkify.JaxRuntimeError, match="test-step"):
            run(DP.init_phase, jnp.asarray(0.0))

    def test_nan_guard_reports_inside_loop(self):
        """The guard must survive a fori_loop hot loop (checkify
        functionalizes the loop) and report mid-horizon divergence."""
        from jax.experimental import checkify

        from hamilton_tpu.utils.diagnostics import checked, nan_guard

        def evolve(ph: Phase, scale) -> Phase:
            def body(i, p):
                p = Phase(p.q * scale, p.p)  # scale>1 → overflow eventually
                return nan_guard(p, where="loop")

            return jax.lax.fori_loop(0, 50, body, ph)

        run = checked(jax.jit(evolve))
        run(DP.init_phase, jnp.asarray(1.0))  # finite: no raise
        with pytest.raises(checkify.JaxRuntimeError, match="loop"):
            run(
                Phase(jnp.full(2, 1e30), jnp.zeros(2)),
                jnp.asarray(1e30),
            )


class TestProfiling:
    def test_benchmark_fn(self):
        fn = jax.jit(lambda: jnp.sum(jnp.arange(100.0)))
        res = benchmark_fn(fn, runs=2)
        assert res.min_s >= 0 and res.runs == 2
        assert "compile" in str(res)


class TestPoincare:
    def test_pendulum_crossings_at_half_period(self):
        """Small-angle pendulum crosses θ=0 upward once per period, with
        crossing interval ≈ 2π (g=1, l=1)."""
        from hamilton_tpu.models import pendulum
        from hamilton_tpu.utils import coordinate_section, poincare_section

        ex = pendulum(theta0=0.01, omega0=0.0)
        dt, emit = 0.01, 2
        traj = evolve_ham_fixed(ex.system, ex.init_phase, dt, 2000,
                                method="gauss4", emit_every=emit)
        pts, valid = poincare_section(
            traj, coordinate_section(0, 0.0, +1), max_crossings=5
        )
        n_valid = int(np.sum(np.asarray(valid)))
        assert n_valid >= 3
        # interpolated crossing q should be ~0
        assert abs(float(pts.q[0, 0])) < 1e-6
        # momentum at upward crossing ~ max momentum (θ=0 is the bottom)
        assert float(pts.p[0, 0]) > 0

    def test_batched_sections(self):
        from hamilton_tpu.models import pendulum
        from hamilton_tpu.utils import coordinate_section, poincare_section

        ex = pendulum(theta0=0.3, omega0=0.0)
        b = 3
        ph = Phase(
            jnp.stack([ex.init_phase.q * (1 + 0.1 * i) for i in range(b)]),
            jnp.tile(ex.init_phase.p, (b, 1)),
        )
        traj = evolve_ham_fixed(ex.system, ph, 0.01, 1500,
                                method="gauss4", emit_every=3)
        pts, valid = poincare_section(
            traj, coordinate_section(0), max_crossings=4
        )
        assert pts.q.shape == (4, b, 1)
        assert valid.shape == (4, b)
        assert np.all(np.sum(np.asarray(valid), axis=0) >= 1)


class TestOrbaxCheckpoint:
    def test_orbax_round_trip_phase(self, tmp_path):
        from hamilton_tpu.utils.checkpoint import load_orbax, save_orbax

        ph = Phase(jnp.arange(6.0).reshape(3, 2), jnp.ones((3, 2)))
        path = os.path.join(tmp_path, "orbax_ck")
        save_orbax(path, {"phase": ph, "step": jnp.asarray(7)})
        out = load_orbax(path, like={"phase": ph, "step": jnp.asarray(0)})
        assert isinstance(out["phase"], Phase)
        np.testing.assert_array_equal(np.asarray(out["phase"].q), np.asarray(ph.q))
        assert int(out["step"]) == 7


class TestDF32:
    """Double-f32 drift-sampler arithmetic (ops/df32.py)."""

    def test_df_arithmetic_vs_f64(self):
        from hamilton_tpu.ops.df32 import DF, FM_DF, df_to_f64

        rng = np.random.default_rng(0)
        a = DF.exact(jnp.asarray(rng.standard_normal(512) * 10,
                                 jnp.float32))
        b = DF.exact(jnp.asarray(rng.standard_normal(512) * 3 + 5.0,
                                 jnp.float32))
        a64 = np.asarray(a.hi, np.float64)
        b64 = np.asarray(b.hi, np.float64)
        for got, want in [
            (a + b, a64 + b64),
            (a * b, a64 * b64),
            (a / b, a64 / b64),
            (a - 0.1 * b, a64 - 0.1 * b64),  # non-f32 float coefficient
            (FM_DF.sqrt(DF.exact(jnp.abs(a.hi))), np.sqrt(np.abs(a64))),
            (FM_DF.sin(a), np.sin(a64)),
            (FM_DF.exp(b * 0.1), np.exp(b64 * 0.1)),
        ]:
            rel = np.max(np.abs(
                (np.asarray(df_to_f64(got)) - want)
                / np.maximum(np.abs(want), 1e-30)
            ))
            assert rel < 1e-13, rel

    def test_float_coefficient_splitting(self):
        """Python-float coefficients that aren't f32-representable (reduced
        masses, suffix-sum products) must enter at full double precision —
        the bug class this guards: f32-rounding μ = 5/11 loses 2^-25."""
        from hamilton_tpu.ops.df32 import DF, df_to_f64

        mu = 5.0 / 11.0
        x = DF.exact(jnp.full((8,), 3.0, jnp.float32))
        got = np.asarray(df_to_f64(mu * x))
        np.testing.assert_allclose(got, mu * 3.0, rtol=1e-14)

    @pytest.mark.parametrize("model", ["chain", "two_body", "spring"])
    def test_measure_h_matches_f64_library(self, model):
        """H in double-f32 from the closed forms ≡ the f64 library-path
        Hamiltonian to ≤1e-8 absolute (VERDICT r3 item 2 acceptance)."""
        from hamilton_tpu.models import chain, spring, two_body
        from hamilton_tpu.ops.df32 import fused_measure_h

        ex, q0 = {
            "chain": (lambda: chain(n_links=20), [0.5] * 20),
            "two_body": (two_body, [2.0, 0.1]),
            "spring": (spring, [0.2, 0.1, 0.3]),
        }[model]
        ex = ex()
        n = len(q0)
        rng = np.random.default_rng(3)
        q = (np.array(q0) + 0.05 * rng.standard_normal((512, n))).astype(
            np.float32
        )
        p = (0.3 * rng.standard_normal((512, n))).astype(np.float32)
        ph = Phase(jnp.asarray(q), jnp.asarray(p))
        h_df = fused_measure_h(ex.system)(ph)
        sys64 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64), ex.system
        )
        h_64 = hamiltonian(sys64, ph.astype(jnp.float64))
        assert float(jnp.max(jnp.abs(h_df - h_64))) < 1e-8

    def test_measure_h_swept_params(self):
        """Per-member parameter tables split from their f64 values: the df32
        measurement of a swept ensemble matches the f64 library H."""
        from hamilton_tpu.models import chain
        from hamilton_tpu.ops.df32 import fused_measure_h

        rng = np.random.default_rng(4)
        b = 512
        ex = chain(n_links=4)
        sysb = ex.system.replace_params({
            "masses": jnp.asarray(0.5 + rng.random((b, 4))),
            "lengths": jnp.broadcast_to(ex.system.params["lengths"], (b, 4)),
            "gravity": jnp.asarray(4.0 + rng.random(b)),
        })
        q = (0.5 + 0.05 * rng.standard_normal((b, 4))).astype(np.float32)
        p = (0.3 * rng.standard_normal((b, 4))).astype(np.float32)
        ph = Phase(jnp.asarray(q), jnp.asarray(p))
        h_df = fused_measure_h(sysb)(ph)
        sys64 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), sysb)
        h_64 = hamiltonian(sys64, ph.astype(jnp.float64))
        assert float(jnp.max(jnp.abs(h_df - h_64))) < 1e-8

    def test_drift_sampler_end_to_end(self):
        """evolve_ensemble_final(drift_dtype=\"df32\") ≡ the f64 sampler on
        an evolved ensemble (same cadence, same states) to ~1e-10."""
        from hamilton_tpu.ensemble import evolve_ensemble_final
        from hamilton_tpu.models import chain

        rng = np.random.default_rng(5)
        b = 1024
        ex = chain(n_links=4)
        ph = Phase(
            jnp.asarray((0.5 + 0.01 * rng.standard_normal((b, 4))).astype(
                np.float32
            )),
            jnp.asarray((0.01 * rng.standard_normal((b, 4))).astype(
                np.float32
            )),
        )
        _, d64 = evolve_ensemble_final(
            ex.system, ph, 1e-3, 200, method="leapfrog", iters=(3, 1),
            compensated=True, drift_every=100, drift_dtype=jnp.float64,
        )
        _, ddf = evolve_ensemble_final(
            ex.system, ph, 1e-3, 200, method="leapfrog", iters=(3, 1),
            compensated=True, drift_every=100, drift_dtype="df32",
        )
        assert float(jnp.max(jnp.abs(d64 - ddf))) < 1e-9

    def test_unknown_drift_dtype_and_missing_forms(self):
        from hamilton_tpu.ensemble import evolve_ensemble_final
        from hamilton_tpu.models import bezier
        from hamilton_tpu.ops.df32 import fused_measure_h

        ex = double_pendulum()
        ph = Phase(jnp.zeros((8, 2)), jnp.zeros((8, 2)))
        with pytest.raises(ValueError, match="unknown drift_dtype"):
            evolve_ensemble_final(ex.system, ph, 1e-3, 10,
                                  drift_dtype="f128", drift_every=10)
        # a k=1 bezier (single control point) is genuinely forms-less —
        # the default bezier gained fused_forms in round 4
        with pytest.raises(ValueError, match="no fused_forms"):
            fused_measure_h(bezier(points=[(0.0, 0.0)]).system)


class TestRoofline:
    """Static side of the roofline accounting (utils/roofline.py); the
    speed-of-light probes are TPU-only (exercised via bench)."""

    def test_fused_step_cost_counts(self):
        from hamilton_tpu.models import chain
        from hamilton_tpu.utils.roofline import fused_step_cost

        ex = chain(n_links=20)
        sys32 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ex.system
        )
        c1 = fused_step_cost(sys32, iters=(2, 1), steps_per_call=1)
        c50 = fused_step_cost(sys32, iters=(2, 1), steps_per_call=50)
        # the factor carry makes blocked steps cheaper than single steps
        assert c50["flops_per_member_step"] < c1["flops_per_member_step"]
        # chain-20 at (2,1): K form ~n², chol ~n³/3, solves ~4n² → O(1e4)
        assert 10_000 < c50["flops_per_member_step"] < 25_000
        # ~2n transcendentals per FRESH aux evaluation; the within-step
        # re-evaluations ride the first-order aux_shift (round 5), leaving
        # ~2 fresh evals/step at (2,1)
        assert 60 < c50["transcendentals_per_member_step"] < 120
        assert c50["unknown_ops_per_member_step"] == 0
        # HBM model: 6 state vectors × 20 coords × 4 B × 2 dirs / 50 steps
        assert abs(c50["bytes_per_member_step"] - 19.2) < 1e-9

    def test_count_ops_scan_multiplier(self):
        from hamilton_tpu.utils.roofline import count_ops

        def f(x):
            def body(c, _):
                return c * 2.0 + 1.0, None

            out, _ = jax.lax.scan(body, x, None, length=7)
            return out

        j = jax.make_jaxpr(f)(jnp.ones((8,), jnp.float32))
        c = count_ops(j)
        assert c["flops"] == 7 * 2 * 8  # 2 ops × 8 elements × 7 iterations


class TestPoincareStreaming:
    """In-loop Poincaré accumulation (utils.PoincareSections) ≡ the post-hoc
    extractor on the emitted trajectory of the same run, with explicit
    overflow accounting instead of silent truncation."""

    def _run(self, max_crossings, n_steps=8000):
        from hamilton_tpu import evolve_ham_fixed
        from hamilton_tpu.ensemble import evolve_ensemble_final
        from hamilton_tpu.models import pendulum
        from hamilton_tpu.utils import PoincareSections, coordinate_section

        ex = pendulum()
        rng = np.random.default_rng(6)
        b = 8
        ph = Phase(jnp.asarray(1.0 + 0.1 * rng.standard_normal((b, 1))),
                   jnp.asarray(0.1 * rng.standard_normal((b, 1))))
        section = coordinate_section(0, 0.0, +1)
        obs = PoincareSections(lambda p: section(p), max_crossings)
        final, _, state = evolve_ensemble_final(
            ex.system, ph, 5e-3, n_steps, method="gauss4", iters=6,
            drift_every=n_steps, observable=obs, obs_every=1,
        )
        traj = evolve_ham_fixed(ex.system, ph, 5e-3, n_steps,
                                method="gauss4", iters=6, emit_every=1)
        return ex, obs, state, traj, section

    def test_matches_post_hoc_extractor(self):
        from hamilton_tpu.utils import PoincareSections, poincare_section

        ex, obs, state, traj, section = self._run(max_crossings=8)
        pts, valid = PoincareSections.points(state)
        ref_pts, ref_valid = poincare_section(traj, section, max_crossings=8)
        np.testing.assert_array_equal(np.asarray(valid),
                                      np.asarray(ref_valid))
        np.testing.assert_allclose(
            np.asarray(pts.q)[np.asarray(valid)],
            np.asarray(ref_pts.q)[np.asarray(ref_valid)],
            rtol=0, atol=1e-12,
        )
        assert int(jnp.max(state["overflow"])) == 0
        assert int(jnp.min(state["count"])) >= 2

    def test_overflow_is_counted_not_silent(self):
        from hamilton_tpu.utils import PoincareSections

        ex, obs, state, traj, section = self._run(max_crossings=1)
        # t = 40 covers ~6 pendulum periods: several upward crossings each
        assert int(jnp.min(state["overflow"])) >= 1
        pts, valid = PoincareSections.points(state)
        assert bool(jnp.all(valid[0]))  # first slot kept
