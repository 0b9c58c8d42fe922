"""Opt-in real-hardware smoke tests.

Run with ``HAMILTON_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py`` on
a machine with a real accelerator: conftest then skips its CPU forcing, and
these exercise one Pallas solve and one short ensemble dispatch on the
actual device (the CPU suite runs the kernels only under the interpreter —
and cannot see accelerator-side precision traps, docs/design.md "Precision
on TPU").

Serialize with any other TPU user of this environment (parallel processes
can fault the relay), and expect ~1-5 min of remote-compile latency.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("HAMILTON_TEST_TPU"),
    reason="real-TPU smoke tests are opt-in (HAMILTON_TEST_TPU=1)",
)


@pytest.fixture(scope="module")
def tpu():
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        pytest.skip("no accelerator available")
    return dev


def test_pallas_solve_on_device(tpu, rng):
    from hamilton_tpu.ops import pallas_solve as ps

    b, n = 2048, 6
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    k = jnp.asarray(np.einsum("bij,bkj->bik", a, a) + n * np.eye(n, dtype=np.float32))
    vec = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    x = jax.jit(ps.spd_solve_pallas)(k, vec)
    resid = np.einsum("bij,bj->bi", np.asarray(k), np.asarray(x)) - np.asarray(vec)
    assert np.max(np.abs(resid)) < 1e-3  # f32 at condition ~n


def test_fused_jac_kernel_on_device(tpu, rng):
    from hamilton_tpu.ops import pallas_solve as ps

    b, m, n = 1024, 8, 4
    j = rng.normal(size=(b, m, n)).astype(np.float32)
    inertia = np.ones(m, dtype=np.float32)
    vec = rng.normal(size=(b, n)).astype(np.float32)
    jt = ps.jac_tiles(jnp.asarray(j), jnp.asarray(inertia))
    x = ps.from_vec_tiles(
        jax.jit(lambda jt, bt: ps.spd_solve_jac_tiles(jt, bt, n, m))(
            jt, ps.to_vec_tiles(jnp.asarray(vec))
        )
    )
    k = np.einsum("bmi,bmj->bij", j, j)
    expect = np.linalg.solve(k.astype(np.float64), vec.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), expect, rtol=2e-2, atol=2e-2)


def test_ensemble_dispatch_on_device(tpu):
    """100-step chain ensemble on the real chip: finite, energy-sane, and
    running through the tile-resident kernel path (batch is a TILE_B
    multiple)."""
    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=8)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    b = 2048
    ph = Phase(
        jnp.tile(ex.init_phase.q.astype(jnp.float32), (b, 1)),
        jnp.tile(ex.init_phase.p.astype(jnp.float32), (b, 1)),
    )
    final, drift = jax.jit(
        lambda ph: evolve_ensemble_final(
            system, ph, 1e-3, 100, method="leapfrog", iters=3, drift_every=50
        )
    )(ph)
    assert bool(jnp.all(jnp.isfinite(final.q)))
    # f32-exact kernels on device: drift at 100 steps is tiny
    assert float(jnp.max(drift)) < 1e-5


def test_fused_step_kernel_on_device(tpu):
    """The fused whole-step kernel on the real chip: 200 steps in 50-step
    blocks with the in-VMEM factor carry, compared against the library
    leapfrog on-device (same physics, both f32)."""
    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=8)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    b = 2048
    ph = Phase(
        jnp.tile(ex.init_phase.q.astype(jnp.float32), (b, 1)),
        jnp.tile(ex.init_phase.p.astype(jnp.float32), (b, 1)),
    )
    fused, drift_f = jax.jit(
        lambda ph: evolve_ensemble_final(
            system, ph, 1e-3, 200, method="leapfrog_fused", iters=(3, 1),
            drift_every=50, steps_per_call=50,
        )
    )(ph)
    lib, _ = jax.jit(
        lambda ph: evolve_ensemble_final(
            system, ph, 1e-3, 200, method="leapfrog", iters=(3, 1),
            drift_every=50,
        )
    )(ph)
    assert float(jnp.max(drift_f)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(fused.q), np.asarray(lib.q), rtol=0, atol=5e-4
    )


def test_fused_params_sweep_on_device(tpu):
    """Runtime-operand mode on the real chip: per-member masses through the
    fused kernel's coefficient tiles, compared against the library leapfrog
    evolving the same swept system on-device."""
    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    rng = np.random.default_rng(9)
    ex = chain(n_links=8)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    b = 2048
    sysb = system.replace_params({
        "masses": jnp.asarray(0.5 + rng.random((b, 8)), dtype=jnp.float32),
        "lengths": jnp.broadcast_to(system.params["lengths"], (b, 8)),
        "gravity": jnp.asarray(4.0 + rng.random(b), dtype=jnp.float32),
    })
    ph = Phase(
        jnp.tile(ex.init_phase.q.astype(jnp.float32), (b, 1)),
        jnp.tile(ex.init_phase.p.astype(jnp.float32), (b, 1)),
    )
    fused, drift_f = jax.jit(
        lambda ph: evolve_ensemble_final(
            sysb, ph, 1e-3, 100, method="leapfrog_fused", iters=(3, 1),
            drift_every=50, steps_per_call=50,
        )
    )(ph)
    lib, _ = jax.jit(
        lambda ph: evolve_ensemble_final(
            sysb, ph, 1e-3, 100, method="leapfrog", iters=(3, 1),
            drift_every=50,
        )
    )(ph)
    assert float(jnp.max(drift_f)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(fused.q), np.asarray(lib.q), rtol=0, atol=5e-4
    )


def test_fused_gradient_on_device(tpu):
    """jax.grad through the fused kernel on the real chip: the primal runs
    the Mosaic kernel, the backward pass compiles the exact-replay VJP for
    the same device; gradient parity vs the library leapfrog on-device."""
    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=4)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    b = 1024
    q0 = jnp.tile(ex.init_phase.q.astype(jnp.float32), (b, 1))
    p0 = jnp.tile(ex.init_phase.p.astype(jnp.float32), (b, 1))
    fus = make_stepper(system, "leapfrog_fused", iters=(3, 1),
                       steps_per_call=3)
    lib = make_stepper(system, "leapfrog", iters=(3, 1))

    def loss_fused(q, p):
        c = fus.init(Phase(q, p))
        c = fus.step(c, 1e-3)
        ph = fus.extract(c)
        return jnp.sum(ph.q ** 2)

    def loss_lib(q, p):
        c = lib.init(Phase(q, p))
        for _ in range(3):
            c = lib.step(c, 1e-3)
        ph = lib.extract(c)
        return jnp.sum(ph.q ** 2)

    gq_f = jax.jit(jax.grad(loss_fused))(q0, p0)
    gq_l = jax.jit(jax.grad(loss_lib))(q0, p0)
    assert bool(jnp.all(jnp.isfinite(gq_f)))
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_l),
                               rtol=5e-3, atol=1e-5)


def test_fused_shared_traced_params_on_device(tpu):
    """Shared-traced params on the real chip: a system passed as a traced
    jit argument routes ONE coefficient tile group whose block-index map
    reuses block 0 for every grid step (b=2048 → two state groups, so the
    reuse map is genuinely exercised by Mosaic, not just the interpreter).
    Parity vs the immediate-constant static mode, plus a finite gradient
    w.r.t. the shared masses."""
    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    rng = np.random.default_rng(13)
    ex = chain(n_links=4)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    b = 2048
    ph = Phase(
        jnp.asarray(0.5 + 0.01 * rng.standard_normal((b, 4)),
                    dtype=jnp.float32),
        jnp.asarray(0.01 * rng.standard_normal((b, 4)), dtype=jnp.float32),
    )
    masses = jnp.asarray([1.0, 0.7, 1.3, 0.9], dtype=jnp.float32)

    def run(m):
        sysb = system.replace_params({
            "masses": m,
            "lengths": system.params["lengths"],
            "gravity": system.params["gravity"],
        })
        st = make_stepper(sysb, "leapfrog_fused", iters=(3, 1),
                          steps_per_call=5)
        c = st.init(ph)
        assert c[-2].shape[0] == 1 and c[-1].shape[0] == 1
        c = st.step(c, 1e-3)
        return st.extract(c)

    out = jax.jit(run)(masses)  # masses traced → runtime single-group mode
    # static mode: the same masses concrete → immediate-constant kernel
    sys_static = system.replace_params({
        "masses": masses,
        "lengths": system.params["lengths"],
        "gravity": system.params["gravity"],
    })
    st_s = make_stepper(sys_static, "leapfrog_fused", iters=(3, 1),
                        steps_per_call=5)
    c_s = st_s.init(ph)
    assert len(c_s) == 4  # no coefficient operands in static mode
    ref = st_s.extract(st_s.step(c_s, 1e-3))
    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               rtol=0, atol=5e-5)

    g = jax.jit(jax.grad(lambda m: jnp.sum(run(m).q ** 2)))(masses)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_trajectory_driver_fused_blocks_on_device(tpu):
    """evolve_ensemble with fused multi-step blocks between emissions
    (steps_per_call > 1) on the real chip ≡ the single-step-per-call run."""
    from hamilton_tpu.ensemble import evolve_ensemble
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    rng_ = np.random.default_rng(7)
    ex = chain(n_links=4)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    b = 1024
    ph = Phase(
        jnp.asarray(0.5 + 0.01 * rng_.standard_normal((b, 4)), jnp.float32),
        jnp.asarray(0.01 * rng_.standard_normal((b, 4)), jnp.float32),
    )

    def run(spc):
        return evolve_ensemble(system, ph, 1e-3, 20,
                               method="leapfrog_fused", iters=(3, 1),
                               emit_every=10, steps_per_call=spc)

    t1, t2 = run(1), run(10)
    assert t1.q.shape == (3, b, 4)
    np.testing.assert_array_equal(np.asarray(t1.q), np.asarray(t2.q))
    np.testing.assert_array_equal(np.asarray(t1.p), np.asarray(t2.p))


def test_user_fused_family_on_device(tpu):
    """A USER-DEFINED FusedForms family (examples/elastic_pendulum.py — not
    in the model zoo) on the real chip, in runtime-operand mode with a
    per-member spring-constant sweep, compared against the library leapfrog
    evolving the same swept system on-device."""
    import importlib.util
    import os as _os

    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.state import Phase

    path = _os.path.join(_os.path.dirname(__file__), _os.pardir,
                         "examples", "elastic_pendulum.py")
    spec = importlib.util.spec_from_file_location("elastic_pendulum", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng_ = np.random.default_rng(11)
    b = 1024
    base = mod.make_system()
    system = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), base
    )
    sysb = system.replace_params({
        "mass": jnp.full((b,), 1.0, jnp.float32),
        "gravity": jnp.full((b,), 9.8, jnp.float32),
        "spring_k": jnp.asarray(15.0 + 30.0 * rng_.random(b), jnp.float32),
        "rest_length": jnp.full((b,), 1.0, jnp.float32),
    })
    ph = Phase(
        jnp.asarray(np.stack([0.3 + 0.02 * rng_.standard_normal(b),
                              1.1 + 0.05 * rng_.standard_normal(b)],
                             axis=-1), jnp.float32),
        jnp.asarray(0.05 * rng_.standard_normal((b, 2)), jnp.float32),
    )
    fused, drift_f = jax.jit(
        lambda ph: evolve_ensemble_final(
            sysb, ph, 1e-3, 100, method="leapfrog_fused", iters=(3, 1),
            drift_every=50, steps_per_call=50,
        )
    )(ph)
    lib, _ = jax.jit(
        lambda ph: evolve_ensemble_final(
            sysb, ph, 1e-3, 100, method="leapfrog", iters=(3, 1),
            drift_every=50,
        )
    )(ph)
    assert float(jnp.max(drift_f)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(fused.q), np.asarray(lib.q), rtol=0, atol=5e-4
    )
