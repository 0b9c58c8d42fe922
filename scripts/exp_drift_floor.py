#!/usr/bin/env python
"""Decompose the f32 compensated-leapfrog drift floor (docs/design.md
"Round-3 measurements": every converged config lands at ~6e-7 over 1e5
steps).

Hypothesis: the floor is dominated by the *snapshot representation* error of
the emitted f32 state — H evaluated at q_hi alone carries a bounded
O(eps·sensitivity) wiggle that ANY f32 representation of the true state has —
while the integrator's actual state (the Kahan pair q_hi + c) drifts far
less.  This script measures both on CPU:

  drift_hi   = max |H64(q_hi, p_hi)        - H0| / scale   (current metric)
  drift_pair = max |H64(q_hi+cq, p_hi+cp)  - H0| / scale   (compensated state)

with H64 the f64 Hamiltonian of the f64-cast system and H0 measured the same
way per metric at step 0.

    python scripts/exp_drift_floor.py [--steps 100000] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--links", type=int, default=20)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--iters", type=str, default="3,1")
    args = ap.parse_args()
    iters = tuple(int(s) for s in args.iters.split(","))

    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.mechanics import hamiltonian
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=args.links)
    sys32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), ex.system
    )
    sys64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64), ex.system
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(
        np.asarray(ex.init_phase.q, np.float32)
        + 0.01 * rng.standard_normal((args.batch, args.links)),
        jnp.float32,
    )
    p = jnp.asarray(
        0.01 * rng.standard_normal((args.batch, args.links)), jnp.float32
    )

    st = make_stepper(sys32, "leapfrog", iters=iters, compensated=True)

    @jax.jit
    def run_chunk(carry, dt):
        def body(_, c):
            return st.step(c, dt)

        return jax.lax.fori_loop(0, args.chunk, body, carry)

    @jax.jit
    def measure(carry):
        ph, _, _, c = carry
        hi = Phase(ph.q.astype(jnp.float64), ph.p.astype(jnp.float64))
        pair = Phase(
            hi.q + c.q.astype(jnp.float64), hi.p + c.p.astype(jnp.float64)
        )
        return hamiltonian(sys64, hi), hamiltonian(sys64, pair)

    carry = st.init(Phase(q, p))
    h_hi0, h_pair0 = measure(carry)
    scale = jnp.maximum(jnp.max(jnp.abs(h_pair0)), 1e-30)
    dt = jnp.float32(args.dt)

    max_hi = 0.0
    max_pair = 0.0
    t0 = time.perf_counter()
    n_chunks = args.steps // args.chunk
    for ci in range(n_chunks):
        carry = run_chunk(carry, dt)
        h_hi, h_pair = measure(carry)
        d_hi = float(jnp.max(jnp.abs(h_hi - h_hi0)) / scale)
        d_pair = float(jnp.max(jnp.abs(h_pair - h_pair0)) / scale)
        max_hi = max(max_hi, d_hi)
        max_pair = max(max_pair, d_pair)
        if (ci + 1) % max(1, n_chunks // 20) == 0:
            el = time.perf_counter() - t0
            print(
                f"step {(ci + 1) * args.chunk:>7d}  drift_hi {max_hi:.3e} "
                f"(now {d_hi:.3e})  drift_pair {max_pair:.3e} "
                f"(now {d_pair:.3e})  [{el:.0f}s]",
                flush=True,
            )

    print(
        f"FINAL steps={args.steps} iters={iters} batch={args.batch} "
        f"drift_hi={max_hi:.4e} drift_pair={max_pair:.4e} "
        f"ratio={max_hi / max(max_pair, 1e-30):.1f}x"
    )


if __name__ == "__main__":
    main()
