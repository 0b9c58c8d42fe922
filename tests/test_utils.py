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
