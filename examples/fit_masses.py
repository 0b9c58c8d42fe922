#!/usr/bin/env python
"""Differentiable simulation: recover chain masses from an observed trajectory.

A capability the reference cannot express at all — its AD (the `ad` package,
``Numeric/Hamilton.hs:217-225``) stops at system construction, so nothing
upstream can differentiate *through* an evolution.  Here the whole pipeline
is reverse-differentiable: gradients flow through the symplectic scan, the
implicit fixed-point iterations, and the SPD solves, back to the physics
parameters in ``System.params``.

The demo hides the true per-link masses of a 4-link pendulum chain, observes
a short trajectory, and recovers the masses by gradient descent on the
trajectory misfit:

    m* = argmin_m  mean ||q_sim(m; t_k) - q_obs(t_k)||²

Identifiability note (real physics, found by this very fit): a chain
released FROM REST has q-trajectories exactly invariant under uniform mass
scaling m -> c·m — both K = JᵀMJ and the gravity potential scale by c, and
the rescaled momenta c·p stay zero at t=0 — so only mass *ratios* are
observable and Adam happily drives the loss to machine zero at c·m_true.
The demo therefore starts with a nonzero initial momentum, which pins the
scale (the observed p₀ would have to scale with c, but it is fixed data).

Usage:
    python examples/fit_masses.py                 # CPU, library leapfrog
    python examples/fit_masses.py --iters 400     # longer optimization
    python examples/fit_masses.py --fused         # fused Pallas kernel path
                                                  # (TPU; B=1024 tile batch,
                                                  # shared-traced params, fit
                                                  # on one block's final q,p)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# allow running straight from a checkout: examples/ sits next to hamilton_tpu/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200, help="Adam iterations")
    ap.add_argument("--steps", type=int, default=240, help="trajectory steps")
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument(
        "--fused", action="store_true",
        help="differentiate through the fused Pallas kernel (accelerator; "
        "runs a 1024-member tile batch with shared traced masses)",
    )
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    args = ap.parse_args(argv)

    import jax

    if args.cpu or not args.fused:
        # the library path is the natural single-trajectory CPU mode
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", not args.fused)

    import jax.numpy as jnp

    try:
        import optax
    except ImportError as e:  # optional dep: pip install hamilton-tpu[examples]
        raise SystemExit(
            "fit_masses needs optax for the Adam loop "
            "(pip install optax / hamilton-tpu[examples])"
        ) from e

    from hamilton_tpu.integrators.evolve import evolve_ham_fixed
    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    dtype = jnp.float32 if args.fused else jnp.float64
    ex = chain(n_links=4)
    system = jax.tree_util.tree_map(lambda a: a.astype(dtype), ex.system)
    true_masses = jnp.asarray([1.0, 0.7, 1.3, 0.9], dtype=dtype)

    # nonzero p0 breaks the uniform-mass-scaling gauge (see docstring)
    ph0 = Phase(
        ex.init_phase.q.astype(dtype),
        jnp.asarray([0.8, -0.3, 0.5, -0.2], dtype=dtype),
    )
    emit = max(args.steps // 12, 1)
    n_steps = (args.steps // emit) * emit

    def with_masses(m):
        return system.replace_params({
            "masses": m,
            "lengths": system.params["lengths"],
            "gravity": system.params["gravity"],
        })

    if args.fused:
        # Fused-kernel path: tile batch of identical members; masses stay a
        # traced (shared) vector, so the kernel runs in its single-group
        # runtime-operand mode and the custom VJP replays the exact block.
        # ONE multi-step kernel block, loss on the final (q, p) — 2n
        # constraints for n masses.  One Mosaic kernel instance per jit is
        # deliberate: every extra pallas_call instance in the graph is a
        # separate kernel compile, and remote-compile relays (this
        # environment) serialize them at 30 s-6 min EACH (docs/design.md
        # "Compile-latency realities"); the trajectory-style fit stays the
        # library path's job.
        b = 1024
        fused_steps = min(n_steps, 24)
        phb = Phase(jnp.tile(ph0.q, (b, 1)), jnp.tile(ph0.p, (b, 1)))

        def simulate(m):
            st = make_stepper(with_masses(m), "leapfrog_fused",
                              iters=(3, 1), steps_per_call=fused_steps)
            c = st.step(st.init(phb), jnp.asarray(args.dt, dtype))
            out = st.extract(c)
            return jnp.concatenate([out.q[0], out.p[0]])
    else:

        def simulate(m):
            out = evolve_ham_fixed(
                with_masses(m), ph0, args.dt, n_steps,
                method="leapfrog", iters=(3, 1), emit_every=emit,
            )
            return out.q[1:]

    from contextlib import nullcontext

    ctx = nullcontext()
    if args.fused and jax.default_backend() == "cpu":
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()

    with ctx:
        # jit so the true-mass forward traces its masses like the fit does
        # (fused mode: the SAME shared-traced kernel variant, one Mosaic
        # compile)
        q_obs = jax.lax.stop_gradient(jax.jit(simulate)(true_masses))

        def loss(m):
            return jnp.mean((simulate(m) - q_obs) ** 2)

        opt = optax.adam(args.lr)
        m0 = jnp.ones(4, dtype)  # uninformed initial guess

        @jax.jit
        def update(m, opt_state):
            val, g = jax.value_and_grad(loss)(m)
            upd, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(m, upd), opt_state, val

        m, opt_state = m0, opt.init(m0)
        t0 = time.perf_counter()
        for i in range(args.iters):
            m, opt_state, val = update(m, opt_state)
            if i % max(args.iters // 10, 1) == 0:
                print(f"iter {i:4d}  loss {float(val):.3e}  "
                      f"masses {[round(float(x), 4) for x in m]}")
        jax.block_until_ready(m)
        el = time.perf_counter() - t0

    err = jnp.max(jnp.abs(m - true_masses))
    print(f"\ntrue masses      {[float(x) for x in true_masses]}")
    print(f"recovered masses {[round(float(x), 4) for x in m]}")
    print(f"max |error| = {float(err):.2e}   ({args.iters} iters, {el:.1f}s)")
    return 0 if float(err) < 0.05 else 1


if __name__ == "__main__":
    raise SystemExit(main())
