#!/usr/bin/env python
"""Can a 2nd-order force predictor buy back the second fixed-point
iteration?

The (2,0) schedule's two p-loop iterations cost ~2 solves + 2 dhdq of the
step's ~4 solves + 3 dhdq (≈40% of flops at chain-20 semiseparable).  The
warm start currently reuses the previous step's end force b (an O(dt)
estimate of this step's half-kick force).  Richardson extrapolation
``a_est = 2·b − b_prev`` is O(dt²) — one iteration then lands O(dt³·κ),
possibly converged at the drift level; zero iterations uses the
extrapolated force directly (no solve at q0 at all).

Host measurement, chain-20, B=32 f32+Kahan, dt=5e-4 × 2e5 steps (the full
t=100 horizon), f64 H sampling every 1000 steps.  Reference: library
(2,0) measures 3.6e-7 here.

Result (2026-08-19 run, recorded in docs/design.md round-5):
    plain   iters_p=2 (the headline schedule)   3.60e-7
    extrap  iters_p=1                           measured by this script
    extrap  iters_p=0                           measured by this script
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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--dt", type=float, default=5e-4)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args(argv)

    from hamilton_tpu.mechanics import (
        dhdp_factored, dhdq_factored, hamiltonian, q_factor,
    )
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=20)
    sys32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    sys64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), ex.system)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(
        np.asarray(ex.init_phase.q, np.float32)
        + 0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32)
    )
    p0 = jnp.zeros((args.batch, 20), jnp.float32)
    dt = jnp.float32(args.dt)
    half = dt / 2

    def run(extrap: bool, iters_p: int) -> float:
        def step(state):
            q, p, cq, cp, b_prev, b, vdot = state
            fac0 = q_factor(sys32, q)
            a_est = (2.0 * b - b_prev) if extrap else b
            ph_half = p - half * a_est
            a_last = a_est
            for _ in range(iters_p):
                a_last = dhdq_factored(sys32, fac0, q, ph_half)
                ph_half = p - half * a_last
            v0 = dhdp_factored(fac0, ph_half)
            q1 = q + dt * v0 + (dt * half) * vdot
            fac1 = q_factor(sys32, q1)
            v_last = dhdp_factored(fac1, ph_half)
            q1 = q + half * (v0 + v_last)
            b_new = dhdq_factored(sys32, fac1, q1, ph_half)
            dq = half * (v0 + v_last)
            dp = -half * (a_last + b_new)
            # Kahan
            yq = dq - cq
            tq = q + yq
            cq = (tq - q) - yq
            yp = dp - cp
            tp = p + yp
            cp = (tp - p) - yp
            return (tq, tp, cq, cp, b, b_new, (v_last - v0) / dt)

        @jax.jit
        def chunk(state):
            return jax.lax.fori_loop(0, 1000, lambda i, s: step(s), state)

        z = jnp.zeros_like(p0)
        state = (q0, p0, z, z, z, z, jnp.zeros_like(q0))
        h0 = hamiltonian(sys64, Phase(q0, p0).astype(jnp.float64))
        maxd = 0.0
        for _ in range(args.steps // 1000):
            state = chunk(state)
            h = hamiltonian(
                sys64, Phase(state[0], state[1]).astype(jnp.float64)
            )
            maxd = max(maxd, float(jnp.max(jnp.abs((h - h0) / h0))))
        return maxd

    for extrap, ip in ((False, 2), (True, 1), (True, 0)):
        t0 = time.perf_counter()
        d = run(extrap, ip)
        print(f"extrap={extrap} iters_p={ip}: max|dH/H0| = {d:.3e} "
              f"({time.perf_counter() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
