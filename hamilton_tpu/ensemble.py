"""Ensemble evolution: vmapped and mesh-sharded trajectory batches.

This is the north-star capability the reference lacks entirely (SURVEY.md
§2.4: ``evolveHam`` takes one ``Phase n``, ``Numeric/Hamilton.hs:438-440``):
evolve *thousands* of initial conditions / parameter variations at once so the
per-step tiny-dense algebra saturates the MXU as batched blocks, and shard the
ensemble axis over a TPU mesh.

Three entry points:

* :func:`evolve_ensemble` — ``vmap`` over the batch axis (single device);
* :func:`evolve_ensemble_sharded` — ``jax.shard_map`` over an explicit mesh,
  each device vmapping its local shard (collectives only if the caller
  reduces the result);
* :func:`evolve_ensemble_final` — no trajectory materialization, returning
  only the final state (+ optional running energy-drift maximum); the
  benchmark hot path for 10⁵-step horizons where emitting every state would
  be HBM-bound.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hamilton_tpu.integrators.evolve import evolve_ham_fixed
from hamilton_tpu.integrators.fixed import make_stepper
from hamilton_tpu.mechanics import hamiltonian
from hamilton_tpu.state import Phase
from hamilton_tpu.system import System

__all__ = [
    "evolve_ensemble",
    "evolve_ensemble_sharded",
    "evolve_ensemble_final",
    "evolve_ensemble_chunked",
]


def _callback_wants_obs(cb) -> bool:
    """True when ``cb`` can accept the round-4 ``(ci, carry, drift, obs)``
    carry-callback signature; False for the legacy round-3 3-arg form.
    Unintrospectable callables (C extensions) get the current 4-arg call."""
    import inspect

    try:
        sig = inspect.signature(cb)
    except (TypeError, ValueError):
        return True
    try:
        sig.bind(0, None, None, None)
        return True
    except TypeError:
        return False


def evolve_ensemble(
    system: System,
    phase0: Phase,
    dt: float,
    n_steps: int,
    *,
    method: str = "gauss4",
    emit_every: int = 1,
    iters: int = 6,
    omega: float = 20.0,
    system_batched: bool = False,
    compensated: bool = False,
    steps_per_call: int = 1,
    group_unroll: int = 1,
) -> Phase:
    """Evolve a batch of initial conditions with a fixed-step integrator.

    ``phase0`` carries one leading batch axis; the result has axes
    ``(time, batch, n)``.

    **Parameter sweeps**: a system whose ``params`` leaves carry a leading
    batch axis matching the phase batch (:meth:`System.replace_params`)
    evolves with per-member physics on the SAME native-batch hot path as a
    shared system — the mechanics pair the params member-wise with the
    trailing state batch axis, the tile-resident Pallas solves still engage,
    and the fused kernel takes per-member coefficient tiles.  This is the
    (IC × parameter)-grid workhorse; no flag needed.

    ``system_batched=True`` is the legacy explicit-vmap path for systems
    whose per-member variation lives in the *inertia leaf* rather than
    ``params`` (e.g. hand-built systems without a params pytree): the whole
    evolution is vmapped over the system's leaves, so the dynamics trace
    unbatched and the tile kernels cannot engage (slow; fine for moderate
    sweep sizes).  Do NOT use it for bundled params-carrying models — batch
    their ``params`` instead.
    """
    if system_batched:
        fn = partial(
            evolve_ham_fixed, dt=dt, n_steps=n_steps, method=method,
            emit_every=emit_every, iters=iters, omega=omega,
            compensated=compensated, steps_per_call=steps_per_call,
            group_unroll=group_unroll,
        )
        sys_axes = jax.tree_util.tree_map(lambda _: 0, system)
        out = jax.vmap(fn, in_axes=(sys_axes, 0))(system, phase0)
        return Phase(jnp.swapaxes(out.q, 0, 1), jnp.swapaxes(out.p, 0, 1))
    # shared system OR batched-params sweep: the batch axis stays native, so
    # the mechanics route the per-step SPD solves to the Pallas ensemble
    # kernels on TPU (with per-member params aligned member-wise)
    return evolve_ham_fixed(
        system, phase0, dt, n_steps, method=method, emit_every=emit_every,
        iters=iters, omega=omega, compensated=compensated,
        steps_per_call=steps_per_call, group_unroll=group_unroll,
    )


def _drift_measure(system: System, phase0: Phase, drift_dtype):
    """The energy-drift measurement closure: ``(measure_h, h0, h_scale)``.

    ``drift_dtype`` (e.g. ``jnp.float64``, requires x64 enabled) evaluates
    the energy *measurement* at higher precision than the trajectory — at
    f32 the H-evaluation's own rounding (~1e-6 relative) otherwise masks the
    true drift of a compensated integration.

    ``drift_dtype="df32"`` selects the double-f32 sampler
    (:func:`hamilton_tpu.ops.df32.fused_measure_h`): the same precision
    class as f64 for this purpose (~2⁻⁴⁹ pair roundoff vs a ~1e-7-level
    measurement) at f32 VPU cost, evaluated from the system's fused-family
    closed forms.  Requires ``system.fused_forms`` with a declared
    potential; x64 must be enabled (for the transcendental splits and the
    f64 recombination).
    """
    if isinstance(drift_dtype, str):
        if drift_dtype != "df32":
            raise ValueError(f"unknown drift_dtype {drift_dtype!r}")
        from hamilton_tpu.ops.df32 import fused_measure_h

        measure_h = fused_measure_h(system)
    elif drift_dtype is not None:
        h_system = jax.tree_util.tree_map(
            lambda a: a.astype(drift_dtype), system
        )

        def measure_h(ph):
            return hamiltonian(h_system, ph.astype(drift_dtype))

    else:
        def measure_h(ph):
            return hamiltonian(system, ph)

    h0 = measure_h(phase0)
    h_scale = jnp.maximum(jnp.abs(h0), 1.0)
    return measure_h, h0, h_scale


def _final_loop_body(stepper, dt, measure_h, h0, h_scale, drift_every,
                     track_drift, observable=None, obs_every=None,
                     step_offset=0):
    """The flat hot-loop body shared by the one-dispatch and chunked drivers.

    ONE flat loop (nested scan-of-fori de-optimizes ~5-11× on TPU); the
    drift sample is a cond-guarded computation every ``drift_every`` steps.
    Loop iteration ``i`` advances ``stepper.substeps`` dt-steps (1 for the
    library steppers; >1 for the fused multi-step kernel), so the drift
    cadence is counted in dt-steps.

    ``observable`` generalizes the drift sampler into a user hook (VERDICT
    r3 item 5): every ``obs_every`` dt-steps a cond-guarded
    ``observable.update(obs_state, phase, step)`` runs in-loop — streaming
    reductions (running extrema, Lyapunov sums, Poincaré hit counts) over
    full horizons with NO trajectory emission.  Observables declaring
    ``transforms_state = True`` (e.g. Benettin renormalization) also return
    a replacement :class:`Phase`; the driver re-inits the stepper carry
    from it (the Kahan compensation and warm starts restart — an O(eps)
    effect at the sample cadence, and the renormalization itself is an
    intentional state edit far above that level).  ``step_offset`` keeps
    the global dt-step index correct across chunk boundaries.
    """
    sub = stepper.substeps

    def body(i, state):
        carry, drift, obs = state
        carry = stepper.step(carry, dt)
        step = step_offset + (i + 1) * sub
        if track_drift:
            def sample(d):
                h = measure_h(stepper.extract(carry))
                return jnp.maximum(d, jnp.abs(h - h0) / h_scale)

            drift = jax.lax.cond(
                step % drift_every == 0, sample, lambda d: d, drift
            )
        if observable is not None:
            transforms = getattr(observable, "transforms_state", False)

            def do_obs(args):
                carry_in, obs_in = args
                ph = stepper.extract(carry_in)
                if transforms:
                    obs_out, ph2 = observable.update(obs_in, ph, step)
                    return stepper.init(ph2), obs_out
                obs_out = observable.update(obs_in, ph, step)
                return carry_in, obs_out

            carry, obs = jax.lax.cond(
                step % obs_every == 0, do_obs, lambda a: a, (carry, obs)
            )
        return (carry, drift, obs)

    return body


def _check_substeps(stepper, n_steps, drift_every, track_drift):
    sub = stepper.substeps
    if n_steps % sub != 0:
        raise ValueError(
            f"{n_steps=} not divisible by the stepper's substeps ({sub})"
        )
    if track_drift and drift_every % sub != 0:
        raise ValueError(
            f"{drift_every=} not divisible by the stepper's substeps ({sub})"
        )
    return sub


def evolve_ensemble_final(
    system: System,
    phase0: Phase,
    dt: float,
    n_steps: int,
    *,
    method: str = "gauss4",
    iters: int = 6,
    omega: float = 20.0,
    track_drift: bool = True,
    drift_every: int = 100,
    compensated: bool = False,
    drift_dtype=None,
    steps_per_call: int = 1,
    group_unroll: int = 1,
    observable=None,
    obs_every: Optional[int] = None,
):
    """Evolve a batch to its final state without materializing trajectories.

    Returns ``(final_phase, max_drift)`` where ``max_drift`` is the running
    per-member maximum of ``|H(t) − H(0)| / max(|H(0)|, 1)`` sampled every
    ``drift_every`` steps (the BASELINE.md ``max |ΔH/H₀|`` metric), or None
    when ``track_drift=False``.

    See :func:`_drift_measure` for ``drift_dtype``.  This runs the whole
    horizon as ONE device dispatch — for horizons long enough to risk
    dispatch-length limits (or when host-side progress/checkpointing is
    wanted), use :func:`evolve_ensemble_chunked`.

    ``observable`` (with ``obs_every``) streams a user reduction through
    the loop carry — see :mod:`hamilton_tpu.utils.observables`
    (:class:`StreamingObservable` protocol, ``LyapunovPairs``) and
    ``_final_loop_body``.  When given, returns
    ``(final_phase, max_drift, obs_state)``.
    """
    if n_steps % drift_every != 0:
        raise ValueError(f"{n_steps=} not divisible by {drift_every=}")
    stepper = make_stepper(
        system, method, iters=iters, omega=omega, compensated=compensated,
        steps_per_call=steps_per_call, group_unroll=group_unroll,
    )
    sub = _check_substeps(stepper, n_steps, drift_every, track_drift)
    if observable is not None:
        if obs_every is None or obs_every % sub != 0:
            raise ValueError(
                f"observable needs obs_every set to a multiple of the "
                f"stepper's substeps ({sub}); got {obs_every}"
            )
    dt = jnp.asarray(dt, phase0.q.dtype)
    carry0 = stepper.init(phase0)  # batch-native: mechanics are batch-aware
    measure_h, h0, h_scale = _drift_measure(system, phase0, drift_dtype)
    body = _final_loop_body(
        stepper, dt, measure_h, h0, h_scale, drift_every, track_drift,
        observable=observable, obs_every=obs_every,
    )
    obs0 = observable.init(phase0) if observable is not None else 0
    carry, drift, obs = jax.lax.fori_loop(
        0, n_steps // sub, body, (carry0, jnp.zeros_like(h0), obs0)
    )
    final = stepper.extract(carry)
    drift = drift if track_drift else None
    if observable is not None:
        return final, drift, obs
    return final, drift


def evolve_ensemble_chunked(
    system: System,
    phase0: Phase,
    dt: float,
    n_steps: int,
    *,
    chunk_steps: int,
    method: str = "gauss4",
    iters: int = 6,
    omega: float = 20.0,
    track_drift: bool = True,
    drift_every: int = 100,
    compensated: bool = False,
    drift_dtype=None,
    callback=None,
    steps_per_call: int = 1,
    group_unroll: int = 1,
    carry_callback=None,
    initial_carry=None,
    initial_drift: Optional[jax.Array] = None,
    observable=None,
    obs_every: Optional[int] = None,
    initial_obs=None,
):
    """Like :func:`evolve_ensemble_final`, but the horizon is executed as
    ``n_steps // chunk_steps`` separate device dispatches of one compiled
    chunk graph.

    Semantically identical to the one-dispatch driver: the integrator carry —
    including the Kahan compensation state and cached ``QFactor`` — crosses
    chunk boundaries intact, so only the dispatch granularity changes.  (XLA
    may fuse ops differently at the dispatch boundary, so results can differ
    from the one-dispatch driver by ~1 ULP.)
    Use for 10⁵-step-scale horizons where a single very long dispatch risks
    device-runtime limits, and for host-side progress reporting or
    checkpointing between chunks.

    ``callback(chunk_index, phase, drift)``, if given, runs on the host after
    each chunk (it blocks on the chunk's results; return value ignored).
    ``chunk_steps`` must divide ``n_steps`` and be a multiple of
    ``drift_every`` (so drift sampling stays globally aligned).

    **Exact resume:** a :class:`Phase` alone cannot bitwise-resume a run —
    the integrator carry also holds the Kahan compensation residuals, the
    warm-start estimates, and any cached factor.  ``carry_callback(ci,
    carry, drift, obs)`` receives the RAW carry after each chunk (a pytree
    of arrays — checkpoint it with :mod:`hamilton_tpu.utils.checkpoint`)
    plus the streaming-observable state (``0`` when no ``observable`` is
    set), and ``initial_carry``/``initial_drift``/``initial_obs`` restart
    from one: the continuation — including the observable accumulator — is
    bitwise identical to the uninterrupted run (tested).  ``phase0`` is
    still required for the drift reference H₀ (pass the ORIGINAL run's
    initial phase, not the resume point).
    """
    if n_steps % chunk_steps != 0:
        raise ValueError(f"{n_steps=} not divisible by {chunk_steps=}")
    if track_drift and chunk_steps % drift_every != 0:
        raise ValueError(f"{chunk_steps=} not divisible by {drift_every=}")
    stepper = make_stepper(
        system, method, iters=iters, omega=omega, compensated=compensated,
        steps_per_call=steps_per_call, group_unroll=group_unroll,
    )
    sub = _check_substeps(stepper, chunk_steps, drift_every, track_drift)
    if observable is not None:
        if obs_every is None or obs_every % sub != 0:
            raise ValueError(
                f"observable needs obs_every set to a multiple of the "
                f"stepper's substeps ({sub}); got {obs_every}"
            )
        if chunk_steps % obs_every != 0:
            raise ValueError(
                f"{chunk_steps=} not divisible by {obs_every=} (observable "
                f"sampling must stay globally aligned across chunks)"
            )
    dt = jnp.asarray(dt, phase0.q.dtype)
    carry0 = stepper.init(phase0)
    measure_h, h0, h_scale = _drift_measure(system, phase0, drift_dtype)

    def make_chunk_body(step_offset):
        # step indices are chunk-aligned multiples of chunk_steps, and both
        # drift_every and obs_every divide chunk_steps, so a single body
        # with offset 0 is correct for every chunk — the offset argument
        # exists for clarity and future non-aligned cadences
        return _final_loop_body(
            stepper, dt, measure_h, h0, h_scale, drift_every, track_drift,
            observable=observable, obs_every=obs_every,
            step_offset=step_offset,
        )

    body = make_chunk_body(0)

    @jax.jit
    def chunk(carry, drift, obs):
        return jax.lax.fori_loop(
            0, chunk_steps // sub, body, (carry, drift, obs)
        )

    carry = carry0 if initial_carry is None else initial_carry
    drift = jnp.zeros_like(h0) if initial_drift is None else initial_drift
    if observable is not None:
        obs = observable.init(phase0) if initial_obs is None else initial_obs
    else:
        obs = 0 if initial_obs is None else initial_obs
    cb_wants_obs = (carry_callback is not None
                    and _callback_wants_obs(carry_callback))
    for ci in range(n_steps // chunk_steps):
        carry, drift, obs = chunk(carry, drift, obs)
        if callback is not None:
            jax.block_until_ready(drift)
            callback(ci, stepper.extract(carry), drift)
        if carry_callback is not None:
            jax.block_until_ready(drift)
            if cb_wants_obs:
                carry_callback(ci, carry, drift, obs)
            else:
                # round-3 interface took (ci, carry, drift); support 3-arg
                # callbacks without the round-4 observable state for one
                # release (deprecation path, see CHANGELOG)
                carry_callback(ci, carry, drift)
    final = stepper.extract(carry)
    drift = drift if track_drift else None
    if observable is not None:
        return final, drift, obs
    return final, drift


def evolve_ensemble_sharded(
    system: System,
    phase0: Phase,
    dt: float,
    n_steps: int,
    *,
    mesh: Mesh,
    axis: str = "ensemble",
    method: str = "gauss4",
    emit_every: Optional[int] = None,
    iters: int = 6,
    omega: float = 20.0,
    track_drift: bool = True,
    drift_every: int = 100,
    reduce_stats: Optional[str] = None,
    compensated: bool = False,
    steps_per_call: int = 1,
    group_unroll: int = 1,
    observable=None,
    obs_every: Optional[int] = None,
):
    """Mesh-sharded ensemble evolution via ``jax.shard_map``.

    The batch axis of ``phase0`` is split over ``mesh`` axis ``axis``; each
    device runs the batch-native stepper on its local shard — embarrassingly
    parallel, zero collectives in the hot loop.  The ICI is touched only for
    the final statistics: with ``reduce_stats`` set to ``"max"`` or
    ``"mean"``, the per-member drift is reduced across shards with an
    explicit XLA collective (``lax.pmax``/``lax.pmean`` over the mesh axis)
    and returned as a replicated scalar.

    With ``emit_every`` set, returns the emitted trajectory
    ``Phase[(time, batch, n)]``; otherwise returns
    ``(final_phase, drift)`` as :func:`evolve_ensemble_final` (``drift`` a
    scalar when ``reduce_stats`` is set, else per-member).

    The batch size must be divisible by the mesh axis size.

    **Batched params** (parameter sweeps): when the system's ``params``
    leaves carry a leading batch axis (``System.replace_params``), that axis
    is sharded over the same mesh axis as the phase batch — each device gets
    its members' parameters; everything else about the system is replicated.
    """
    n_shards = mesh.shape[axis]
    batch = phase0.q.shape[0]
    if batch % n_shards != 0:
        raise ValueError(f"batch {batch} not divisible by mesh axis {axis}={n_shards}")
    pb = system.param_batch_ndim()
    if pb == 0:
        system_spec = P()
    elif pb == 1:
        # per-leaf spec pytree with the System's own structure: params
        # leaves shard their leading (member) axis along the ensemble mesh
        # axis; the inertia leaf (if any) stays replicated
        system_spec = system.params_axes_tree(P(axis), P())
    else:
        raise ValueError(
            f"sharded parameter sweeps support one params batch axis, "
            f"got {pb}"
        )

    if emit_every is not None:

        def local_traj(sys_local, ph_local):
            return evolve_ensemble(
                sys_local, ph_local, dt, n_steps,
                method=method, emit_every=emit_every, iters=iters, omega=omega,
                compensated=compensated, steps_per_call=steps_per_call,
                group_unroll=group_unroll,
            )

        return jax.shard_map(
            local_traj,
            mesh=mesh,
            in_specs=(system_spec, P(axis)),
            out_specs=P(None, axis),
        )(system, phase0)

    def local_final(sys_local, ph_local):
        out = evolve_ensemble_final(
            sys_local, ph_local, dt, n_steps,
            method=method, iters=iters, omega=omega,
            track_drift=track_drift, drift_every=drift_every,
            compensated=compensated, steps_per_call=steps_per_call,
            group_unroll=group_unroll,
            observable=observable, obs_every=obs_every,
        )
        final, drift = out[0], out[1]
        obs = out[2] if observable is not None else 0
        if drift is None:
            drift = jnp.zeros_like(ph_local.q[..., 0])
        if reduce_stats == "max":
            drift = jax.lax.pmax(jnp.max(drift), axis)
        elif reduce_stats == "mean":
            drift = jax.lax.pmean(jnp.mean(drift), axis)
        elif reduce_stats is not None:
            raise ValueError(f"unknown {reduce_stats=}; use 'max' or 'mean'")
        return final, drift, obs

    drift_spec = P() if reduce_stats else P(axis)
    if observable is not None:
        # per-member accumulator leaves shard with the ensemble; an
        # observable with mixed (per-member + replicated-scalar) state
        # declares its own specs via shard_specs(axis)
        if hasattr(observable, "shard_specs"):
            obs_spec = observable.shard_specs(axis)
        else:
            obs_spec = jax.tree_util.tree_map(
                lambda _: P(axis), observable.init(phase0)
            )
    else:
        obs_spec = P()
    final, drift, obs = jax.shard_map(
        local_final,
        mesh=mesh,
        in_specs=(system_spec, P(axis)),
        out_specs=(P(axis), drift_spec, obs_spec),
    )(system, phase0)
    drift = drift if track_drift else None
    if observable is not None:
        return final, drift, obs
    return final, drift
