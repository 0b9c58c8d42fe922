"""Simulation drivers: the public ``stepHam``/``evolveHam`` API surface.

TPU-native analog of the reference's L3 layer (``Numeric/Hamilton.hs:389-515``):

* :func:`evolve_ham` — adaptive evolution to a vector of output times, GSL
  RKF45 semantics by default (``evolveHam``, ``:433-462``);
* :func:`evolve_ham_list` — list-in/list-out convenience incl. the
  singleton-times ``[x] -> [0, x]`` quirk (``evolveHam'``, ``:409-429``);
* :func:`step_ham` — single-timestep convenience (``stepHam``, ``:389-402``;
  note that like the reference it runs the full adaptive solve over
  ``[0, dt]`` with initial step ``dt/100``);
* :func:`step_ham_c` / :func:`evolve_ham_c` / :func:`evolve_ham_c_list` —
  configuration-space wrappers (``:470-515``); the simulation itself always
  runs in phase space (doc note ``:464-469``);
* :func:`evolve_ham_fixed` — the TPU-first fixed-step path (no reference
  analog): one flat compiled loop over a symplectic stepper with chunked
  emission, the workhorse for ensembles and long horizons.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from hamilton_tpu.integrators.adaptive import GSL_EPS_DEFAULT, gsl_evolve_to
from hamilton_tpu.integrators.fixed import make_stepper
from hamilton_tpu.mechanics import from_phase, ham_rhs, to_phase
from hamilton_tpu.state import Config, Phase
from hamilton_tpu.system import System

__all__ = [
    "step_ham",
    "evolve_ham",
    "evolve_ham_list",
    "evolve_ham_fixed",
    "step_ham_c",
    "evolve_ham_c",
    "evolve_ham_c_list",
]


def evolve_ham(
    system: System,
    phase0: Phase,
    ts,
    *,
    eps_abs: float = GSL_EPS_DEFAULT,
    eps_rel: float = GSL_EPS_DEFAULT,
    h0: Optional[float] = None,
    method: str = "rkf45",
    batch_mode: str = "shared",
    return_stats: bool = False,
):
    """Evolve through phase space, emitting the state at each time in ``ts``.

    Analog of reference ``evolveHam`` (``Numeric/Hamilton.hs:433-462``): the
    output has leading axis ``len(ts)`` with ``out[0] == phase0`` (the state
    at ``ts[0]``), the default initial step is ``hi = (ts[1]-ts[0])/100``
    (``:447``) and the default tolerances are GSL's ``1.49012e-08`` (``:448``).
    ``len(ts) >= 2`` is required, mirroring the reference's ``2 <= s``
    constraint (``:435``) — use :func:`evolve_ham_list` for looser semantics.

    The suggested step size carries across output intervals exactly as GSL's
    driver does, so multi-interval trajectories are step-for-step comparable
    with the reference.

    ``batch_mode`` selects the step controller for *batched* states
    (``phase0.q`` with leading axes):

    * ``"shared"`` (default) — one controller for the whole batch, with the
      error norm maximized over all members: every member takes identical
      steps, so the whole batch stays one SIMD computation (lock-step; the
      TPU-friendly choice, but tolerances are enforced on the worst member
      and the trajectory is *not* step-for-step identical to single runs);
    * ``"per_member"`` — each member carries its own controller
      (``vmap``-ed driver): step-for-step equivalent to N independent single
      runs — exactly the reference's per-trajectory adaptive behavior
      (``Numeric/Hamilton.hs:445-448``) — at the cost of wavefront execution
      (the compiled loop runs until the slowest member finishes its
      interval; finished members mask).

    ``return_stats=True`` returns ``(trajectory, stats)`` with aggregate
    controller diagnostics: ``saturated`` — True if ANY interval (of any
    member) exhausted the controller's ``max_steps`` progress guard before
    reaching its endpoint (that interval's output sits short of its
    requested time); ``max_interval_steps`` / ``total_failed`` attempt
    counters.  Off by default: the counters ride the adaptive loop carry
    either way, so the flag only changes the return shape.
    """
    ts = jnp.asarray(ts)
    if ts.ndim != 1 or ts.shape[0] < 2:
        raise ValueError(
            f"evolve_ham requires at least 2 output times (got shape {ts.shape}); "
            "this mirrors the reference's `2 <= s` constraint (Hamilton.hs:435)"
        )
    if batch_mode not in ("shared", "per_member"):
        raise ValueError(
            f"unknown {batch_mode=}; use 'shared' or 'per_member'"
        )
    y0 = phase0.flatten()
    ts = ts.astype(y0.dtype)
    h_init = (ts[1] - ts[0]) / 100.0 if h0 is None else jnp.asarray(h0, y0.dtype)

    def run(sys_, y_start):
        rhs = ham_rhs(sys_)

        def interval(carry, t_pair):
            y, h = carry
            t_lo, t_hi = t_pair
            y1, h1, st = gsl_evolve_to(
                rhs, y, t_lo, t_hi, h,
                eps_abs=eps_abs, eps_rel=eps_rel, method=method,
                return_stats=True,
            )
            return (y1, h1), (y1, st)

        (_, _), (ys, sts) = jax.lax.scan(
            interval, (y_start, h_init), (ts[:-1], ts[1:])
        )
        stats = {
            "saturated": jnp.any(sts["saturated"]),
            "max_interval_steps": jnp.max(sts["n_steps"]),
            "total_failed": jnp.sum(sts["n_failed"]),
        }
        return jnp.concatenate([y_start[None], ys], axis=0), stats

    if batch_mode == "per_member" and y0.ndim > 1:
        # Each member gets its own controller AND (for batched params) its
        # own physics: the params-mapped vmaps are innermost so the params
        # batch axes pair with the trailing state batch axes, like
        # everything params-batched (mechanics._map_member).
        pb = system.param_batch_ndim()
        if pb > y0.ndim - 1:
            raise ValueError(
                f"params carry {pb} batch axes but the state has only "
                f"{y0.ndim - 1}"
            )
        sys_axes = system.params_axes_tree(0, None)
        vrun = run
        for _ in range(pb):
            vrun = jax.vmap(vrun, in_axes=(sys_axes, 0))
        for _ in range(y0.ndim - 1 - pb):
            vrun = jax.vmap(vrun, in_axes=(None, 0))
        ys, stats = vrun(system, y0)
        ys = jnp.moveaxis(ys, -2, 0)  # time axis to the front
    else:
        ys, stats = run(system, y0)
    if return_stats:
        # aggregate over any batch axes the vmapped runs added
        stats = {
            "saturated": jnp.any(stats["saturated"]),
            "max_interval_steps": jnp.max(stats["max_interval_steps"]),
            "total_failed": jnp.sum(stats["total_failed"]),
        }
        return Phase.unflatten(ys), stats
    return Phase.unflatten(ys)


def evolve_ham_list(
    system: System,
    phase0: Phase,
    ts: Sequence[float],
    **kwargs,
) -> List[Phase]:
    """List-based evolution with the reference's quirk semantics.

    Analog of ``evolveHam'`` (``Numeric/Hamilton.hs:409-429``): an empty time
    list returns ``[]``; a singleton ``[x]`` is padded to ``[0, x]`` and only
    the state at ``x`` is returned; otherwise identical to
    :func:`evolve_ham`.  Returns a Python list of unbatched :class:`Phase`.
    """
    ts = list(ts)
    if not ts:
        return []
    singleton = len(ts) == 1
    ts_eff = [0.0, ts[0]] if singleton else ts
    out = evolve_ham(system, phase0, jnp.asarray(ts_eff, dtype=phase0.q.dtype), **kwargs)
    stats = None
    if kwargs.get("return_stats"):
        out, stats = out
    phases = [Phase(out.q[i], out.p[i]) for i in range(len(ts_eff))]
    phases = phases[1:] if singleton else phases
    return (phases, stats) if stats is not None else phases


def step_ham(
    system: System,
    phase0: Phase,
    dt: float,
    **kwargs,
) -> Phase:
    """Advance one timestep ``dt`` through phase space.

    Analog of ``stepHam`` (``Numeric/Hamilton.hs:389-402``): runs the full
    adaptive solve over ``[0, dt]`` (initial step ``dt/100``) and returns the
    endpoint.  Argument order is pythonized — reference order is
    ``stepHam dt system phase``.
    """
    out = evolve_ham(
        system, phase0, jnp.asarray([0.0, dt], dtype=phase0.q.dtype), **kwargs
    )
    if kwargs.get("return_stats"):
        out, stats = out
        return Phase(out.q[1], out.p[1]), stats
    return Phase(out.q[1], out.p[1])


def iterate_ham(system: System, phase0: Phase, dt: float, **kwargs):
    """Infinite stream of states every ``dt``, starting with ``phase0``.

    Analog of the reference README's streaming idiom
    ``evolution = iterate (stepHam 0.1 doublePendulum) phase0``
    (``README.md:147-151``) as a Python generator — each element advances
    one :func:`step_ham` adaptive solve from the previous state.  For long
    dense horizons prefer :func:`evolve_ham_fixed` / the ensemble drivers
    (one compiled flat loop instead of one dispatch per step).
    """
    ph = phase0
    while True:
        yield ph
        ph = step_ham(system, ph, dt, **kwargs)


def evolve_ham_fixed(
    system: System,
    phase0: Phase,
    dt: float,
    n_steps: int,
    *,
    method: str = "gauss4",
    emit_every: int = 1,
    iters: int = 6,
    omega: float = 20.0,
    remat: bool = False,
    compensated: bool = False,
    steps_per_call: int = 1,
    group_unroll: int = 1,
) -> Phase:
    """Fixed-step evolution: ``n_steps`` steps of size ``dt``, emitting every
    ``emit_every``-th state (chunked emission for long horizons, SURVEY.md §5
    — implemented as one flat loop with cond-guarded buffer writes).

    ``steps_per_call`` (fused kernel methods only) executes that many
    dt-steps inside each kernel invocation, carrying the state and factor in
    VMEM across them — the fused hot-loop configuration; it must divide
    ``emit_every`` so emissions land on call boundaries.

    The TPU-first path with no reference analog: symplectic by default
    (``gauss4``) so long-horizon energy drift stays bounded.  Returns a
    :class:`Phase` whose leading axis has ``n_steps // emit_every + 1``
    entries (the initial state first).  States may carry leading batch axes
    (the ensemble path), and everything is differentiable — set
    ``remat=True`` to rematerialize each emission chunk in the backward pass
    (memory ∝ emitted states instead of all steps) when differentiating
    through long horizons.

    ``n_steps`` must be divisible by ``emit_every``.
    """
    if n_steps % emit_every != 0:
        raise ValueError(f"{n_steps=} not divisible by {emit_every=}")
    if emit_every % steps_per_call != 0:
        raise ValueError(
            f"{emit_every=} not divisible by {steps_per_call=} (emissions "
            f"must land on kernel-call boundaries)"
        )
    stepper = make_stepper(
        system, method, iters=iters, omega=omega, compensated=compensated,
        steps_per_call=steps_per_call, group_unroll=group_unroll,
    )
    dt = jnp.asarray(dt, phase0.q.dtype)
    carry0 = stepper.init(phase0)
    n_emit = n_steps // emit_every

    # ONE flat loop.  Nesting loops (scan-of-fori) de-optimizes the loop body
    # ~5-11× on TPU, so emission is done with a cond-guarded
    # dynamic_update_slice into a carried output buffer instead of an outer
    # scan over chunks.
    step_fn = (lambda c: stepper.step(c, dt))
    if remat:
        step_fn = jax.checkpoint(step_fn)

    # the `+ 0 * phase0` keeps the buffer's device-variance type aligned with
    # the state when running inside shard_map (cond branches must agree)
    out0 = Phase(
        jnp.zeros((n_emit,) + phase0.q.shape, phase0.q.dtype) + 0 * phase0.q[None],
        jnp.zeros((n_emit,) + phase0.p.shape, phase0.p.dtype) + 0 * phase0.p[None],
    )

    def body(i, state):
        carry, out = state
        carry = step_fn(carry)
        steps_done = (i + 1) * steps_per_call
        emit_slot = steps_done // emit_every - 1
        do_emit = (steps_done % emit_every) == 0
        zeros = (0,) * phase0.q.ndim

        def write(o):
            # extract INSIDE the cond branch: for the fused steppers it is
            # the tile→(B, n) relayout, which must run once per emission,
            # not on every non-emitting block (cf. the pallas_step design
            # note "extract is the only relayout")
            ph_now = stepper.extract(carry)
            return Phase(
                jax.lax.dynamic_update_slice(o.q, ph_now.q[None], (emit_slot,) + zeros),
                jax.lax.dynamic_update_slice(o.p, ph_now.p[None], (emit_slot,) + zeros),
            )

        out = jax.lax.cond(do_emit, write, lambda o: o, out)
        return (carry, out)

    _, emitted = jax.lax.fori_loop(
        0, n_steps // steps_per_call, body, (carry0, out0)
    )
    q = jnp.concatenate([phase0.q[None], emitted.q], axis=0)
    p = jnp.concatenate([phase0.p[None], emitted.p], axis=0)
    return Phase(q, p)


# ----------------------------------------------------------------------
# Configuration-space wrappers (reference Hamilton.hs:470-515)
# ----------------------------------------------------------------------


def step_ham_c(system: System, config0: Config, dt: float, **kwargs) -> Config:
    """``fromPhase ∘ stepHam ∘ toPhase`` (reference ``stepHamC``, ``:505-515``)."""
    out = step_ham(system, to_phase(system, config0), dt, **kwargs)
    if kwargs.get("return_stats"):
        ph, stats = out
        return from_phase(system, ph), stats
    return from_phase(system, out)


def evolve_ham_c(system: System, config0: Config, ts, **kwargs) -> Config:
    """Configuration-space ``evolveHam`` (reference ``evolveHamC``, ``:488-498``).

    Returns a batched :class:`Config` with leading time axis.
    """
    out = evolve_ham(system, to_phase(system, config0), ts, **kwargs)
    if kwargs.get("return_stats"):
        out, stats = out
        return from_phase(system, out), stats
    return from_phase(system, out)  # batch-aware over the leading time axis


def evolve_ham_c_list(
    system: System, config0: Config, ts: Sequence[float], **kwargs
) -> List[Config]:
    """Configuration-space ``evolveHam'`` (reference ``evolveHamC'``, ``:470-480``)."""
    out = evolve_ham_list(system, to_phase(system, config0), ts, **kwargs)
    if kwargs.get("return_stats") and isinstance(out, tuple):
        phases, stats = out
        return [from_phase(system, ph) for ph in phases], stats
    return [from_phase(system, ph) for ph in out]
