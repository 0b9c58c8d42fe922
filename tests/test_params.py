"""System.params protocol: validation, batching rules, guard rails.

The sweep *correctness* tests live in tests/test_ensemble.py (native-path
per-member parity) and tests/test_pallas_step.py (fused runtime-operand
mode); this module covers the protocol's edges — the error paths that turn
round-2's silent-wrong-physics hazards into loud failures.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamilton_tpu.mechanics import hamiltonian, momenta, to_phase
from hamilton_tpu.models import chain, double_pendulum
from hamilton_tpu.state import Config, Phase
from hamilton_tpu.system import mk_system, mk_system_cart


class TestConstruction:
    def test_inertia_fn_requires_params(self):
        with pytest.raises(ValueError, match="params"):
            mk_system(None, lambda q: q, lambda q: 0.0, n=2,
                      inertia_fn=lambda p: jnp.ones(2))

    def test_missing_inertia_raises_descriptive_error(self):
        # forgetting inertia_fn while passing inertia=None must name the
        # fix, not surface jnp.asarray(None)'s opaque TypeError
        with pytest.raises(ValueError, match="inertia_fn"):
            mk_system(None, lambda q: q, lambda q: 0.0, n=2)

    def test_inertia_and_inertia_fn_mutually_exclusive(self):
        with pytest.raises(ValueError, match="not both"):
            mk_system(jnp.ones(2), lambda q, p: q, lambda q, p: 0.0, n=2,
                      params={"m": jnp.asarray(1.0)},
                      inertia_fn=lambda p: jnp.ones(2))

    def test_params_fns_validated_with_params(self):
        # coords that uses params must shape-trace during construction
        sys_ = mk_system(
            None, lambda q, p: p["scale"] * q, lambda q, p: jnp.sum(q), n=2,
            params={"scale": jnp.asarray(2.0)},
            inertia_fn=lambda p: jnp.ones(2),
        )
        assert sys_.m == 2

    def test_derived_inertia_tracks_params(self):
        ex = chain(n_links=3, masses=[2.0, 1.0, 0.5])
        np.testing.assert_allclose(
            np.asarray(ex.system.inertia),
            [2.0, 1.0, 0.5, 2.0, 1.0, 0.5],
        )
        swept = ex.system.replace_params(
            {**ex.system.params, "masses": jnp.array([1.0, 1.0, 1.0])}
        )
        np.testing.assert_allclose(np.asarray(swept.inertia), np.ones(6))


class TestBatchingRules:
    def test_inconsistent_leaf_batching_raises(self):
        """Inconsistency introduced through raw pytree surgery (bypassing
        replace_params' eager check) still raises at first use."""
        ex = double_pendulum()
        children, aux = ex.system.tree_flatten()
        bad_params = dict(children[1])
        bad_params["m1"] = jnp.ones(4)  # m2 stays unbatched
        bad = type(ex.system).tree_unflatten(aux, (children[0], bad_params))
        with pytest.raises(ValueError, match="inconsistent"):
            bad.param_batch_ndim()

    def test_replace_params_validates_eagerly(self):
        ex = double_pendulum()
        with pytest.raises(ValueError, match="inconsistent"):
            ex.system.replace_params(
                {"m1": jnp.ones((4, 2)), "m2": jnp.ones(4)}
            )

    def test_replace_params_rejects_structure_change(self):
        """A params pytree missing construction-time leaves (or carrying
        extra ones) must be rejected loudly — zipping a truncated leaf list
        against the stored base ndims would otherwise fabricate a bogus
        batch ndim (e.g. an unbatched single-leaf dict 'passing' as a
        1-axis sweep)."""
        ex = double_pendulum()
        with pytest.raises(ValueError, match="structure"):
            ex.system.replace_params({"m1": jnp.ones((5, 2))})  # m2 missing
        with pytest.raises(ValueError, match="structure"):
            ex.system.replace_params({"m1": jnp.ones(2)})  # unbatched, m2 missing
        with pytest.raises(ValueError, match="structure"):
            ex.system.replace_params(
                {"m1": jnp.ones(2), "m2": jnp.ones(2), "extra": jnp.ones(2)}
            )

    def test_leaf_count_change_via_pytree_surgery_raises(self):
        """Structure edits that bypass replace_params still fail at first
        param_batch_ndim() use instead of silently mis-zipping."""
        ex = double_pendulum()
        children, aux = ex.system.tree_flatten()
        bad = type(ex.system).tree_unflatten(
            aux, (children[0], {"m1": jnp.ones((5, 2))})
        )
        with pytest.raises(ValueError, match="leaf count"):
            bad.param_batch_ndim()

    def test_params_axes_tree_marks_positionally(self):
        """params_axes_tree marks params leaves (not the inertia leaf) even
        when the SAME array object is passed as both the inertia and a
        params leaf — id()-based marking would mislabel the alias."""
        from hamilton_tpu.integrators.evolve import evolve_ham

        m = jnp.ones(2)
        sys_alias = mk_system(
            m,
            lambda q, p: q * p["m"],
            lambda q, p: 0.5 * jnp.sum(q**2),
            n=2,
            params={"m": m},
        )
        axes = sys_alias.params_axes_tree(0, None)
        leaves, _ = jax.tree_util.tree_flatten(sys_alias)
        marks = jax.tree_util.tree_leaves(
            axes, is_leaf=lambda x: x is None
        )
        # flatten order is (inertia, params): inertia unmarked, params marked
        assert len(leaves) == 2
        assert marks == [None, 0]
        # and the per-member adaptive path accepts the aliased system
        b = 3
        sysb = sys_alias.replace_params({"m": jnp.ones((b, 2))})
        ph = Phase(jnp.tile(jnp.asarray([0.3, -0.2]), (b, 1)),
                   jnp.tile(jnp.asarray([0.1, 0.4]), (b, 1)))
        out = evolve_ham(sysb, ph, jnp.linspace(0.0, 0.2, 3),
                         batch_mode="per_member")
        assert out.q.shape == (3, b, 2)
        assert bool(jnp.all(jnp.isfinite(out.q)))

    def test_member_level_call_on_batched_params_raises(self):
        """System.jacobian / potential_grad on a batched-params system must
        refuse rather than silently bind the whole batch to one member."""
        ex = double_pendulum()
        sysb = ex.system.replace_params({"m1": jnp.ones(3), "m2": jnp.ones(3)})
        with pytest.raises(ValueError, match="batched params"):
            sysb.potential_grad(jnp.zeros(2))

    def test_params_batch_must_not_exceed_state_batch(self):
        ex = double_pendulum()
        sysb = ex.system.replace_params({"m1": jnp.ones(3), "m2": jnp.ones(3)})
        with pytest.raises(ValueError, match="trailing"):
            hamiltonian(sysb, Phase(jnp.zeros(2), jnp.zeros(2)))

    def test_trailing_alignment_time_axis(self):
        """(T, B, n) states evaluate (B,)-batched params across the leading
        time axis."""
        b = 3
        ex = double_pendulum()
        sysb = ex.system.replace_params(
            {"m1": jnp.ones(b), "m2": jnp.linspace(0.5, 2.0, b)}
        )
        q = jnp.tile(ex.init_phase.q, (5, b, 1))
        p = jnp.tile(ex.init_phase.p, (5, b, 1))
        h = hamiltonian(sysb, Phase(q, p))
        assert h.shape == (5, b)
        for i in range(b):
            h_i = hamiltonian(double_pendulum(1.0, float(sysb.params["m2"][i])).system,
                              ex.init_phase)
            np.testing.assert_allclose(np.asarray(h[:, i]), float(h_i),
                                       rtol=1e-12)

    def test_vmap_over_system_params(self):
        """vmapping a function of (System, Phase) over the params leaves is
        equivalent to the native batched-params path."""
        b = 4
        ex = double_pendulum()
        m2s = jnp.linspace(0.5, 2.0, b)
        sysb = ex.system.replace_params({"m1": jnp.ones(b), "m2": m2s})
        ph = Phase(jnp.tile(ex.init_phase.q, (b, 1)),
                   jnp.tile(ex.init_phase.p, (b, 1)))
        native = hamiltonian(sysb, ph)
        sys_axes = jax.tree_util.tree_map(lambda _: 0, sysb)
        vmapped = jax.vmap(hamiltonian, in_axes=(sys_axes, 0))(sysb, ph)
        np.testing.assert_allclose(np.asarray(native), np.asarray(vmapped),
                                   rtol=1e-12)


class TestLegacyClosureSystems:
    def test_legacy_systems_unchanged(self):
        """No-params systems keep the single-argument call protocol."""
        sys_ = mk_system_cart(
            jnp.ones(2), lambda q: q, lambda x: jnp.sum(x**2), n=2,
        )
        c = Config(jnp.array([1.0, 2.0]), jnp.array([0.1, 0.2]))
        ph = to_phase(sys_, c)
        np.testing.assert_allclose(np.asarray(ph.p), [0.1, 0.2])
        np.testing.assert_allclose(
            np.asarray(momenta(sys_, c)), np.asarray(ph.p)
        )

    def test_bundled_models_have_no_inertia_leaf(self):
        """Bundled parameterized models derive inertia from params — there
        is no inertia leaf to tree-map out of sync."""
        for ex in (chain(n_links=3), double_pendulum()):
            children, _aux = ex.system.tree_flatten()
            assert children[0] is None  # inertia derived, not stored


class TestAdaptiveSweeps:
    def test_per_member_adaptive_sweep_matches_independent_runs(self):
        """evolve_ham(batch_mode='per_member') with batched params: each
        member carries its own controller AND its own physics — step-for-
        step identical to independent single runs on fresh systems."""
        from hamilton_tpu.integrators.evolve import evolve_ham

        b = 3
        ex = double_pendulum()
        m2s = (0.5, 1.0, 2.0)
        sysb = ex.system.replace_params(
            {"m1": jnp.ones(b), "m2": jnp.asarray(m2s)}
        )
        ph = Phase(jnp.tile(ex.init_phase.q, (b, 1)),
                   jnp.tile(ex.init_phase.p, (b, 1)))
        ts = jnp.linspace(0.0, 0.4, 5)
        out = evolve_ham(sysb, ph, ts, batch_mode="per_member")
        for i, m2 in enumerate(m2s):
            ref = evolve_ham(double_pendulum(1.0, m2).system,
                             ex.init_phase, ts)
            np.testing.assert_allclose(
                np.asarray(out.q[:, i]), np.asarray(ref.q),
                rtol=0, atol=1e-13,
            )

    def test_shared_adaptive_sweep_runs(self):
        """Shared lock-step controller over a swept batch (worst-member
        error norm) stays finite and close to the per-member physics."""
        from hamilton_tpu.integrators.evolve import evolve_ham

        b = 3
        ex = double_pendulum()
        sysb = ex.system.replace_params(
            {"m1": jnp.ones(b), "m2": jnp.linspace(0.5, 2.0, b)}
        )
        ph = Phase(jnp.tile(ex.init_phase.q, (b, 1)),
                   jnp.tile(ex.init_phase.p, (b, 1)))
        out = evolve_ham(sysb, ph, jnp.linspace(0.0, 0.4, 5))
        assert out.q.shape == (5, b, 2)
        assert bool(jnp.all(jnp.isfinite(out.q)))


class TestMixedDtype:
    """f64-stored params (an x64 build) driving an f32 state must compute
    in the state dtype — not crash (the _dtdq VJP cotangent requires an
    exact dtype match) and not silently promote the hot loop to f64."""

    def test_f32_evolution_of_x64_built_model(self):
        from hamilton_tpu.integrators.evolve import evolve_ham_fixed
        from hamilton_tpu.mechanics import ham_eqs

        ex = chain(n_links=4)  # params stored f64 under the x64 test env
        assert ex.system.params["masses"].dtype == jnp.float64
        b = 8
        rng = np.random.default_rng(0)
        ph = Phase(
            jnp.asarray(
                np.asarray(ex.init_phase.q, np.float32)
                + 0.01 * rng.standard_normal((b, 4), ).astype(np.float32)
            ),
            jnp.zeros((b, 4), jnp.float32),
        )
        dq, dp = ham_eqs(ex.system, ph)  # crashed in _dtdq before the fix
        assert dq.dtype == jnp.float32 and dp.dtype == jnp.float32
        out = evolve_ham_fixed(ex.system, ph, 1e-3, 3, method="leapfrog",
                               iters=(2, 1))
        assert out.q.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(out.q)))

    def test_momenta_dtype_follows_state(self):
        ex = chain(n_links=4)
        v = jnp.ones((4,), jnp.float32) * 0.1
        q = ex.init_phase.q.astype(jnp.float32)
        p = momenta(ex.system, Config(q, v))
        assert p.dtype == jnp.float32
