#!/usr/bin/env python
"""A/B the O(n) semiseparable chain solver against the dense in-register
Cholesky inside the fused whole-step kernel, at the headline config.

Both runs use the SAME measurement core as the bench headline
(`bench._timed_chunked_run`): chunked compensated evolve, steady-chunk
wall clock (chunk 0 excluded), df32 in-loop drift sampling.  Run on the
real TPU; serialize with other TPU users of this environment.

Usage:
    python scripts/probe_semiseparable.py                # headline config
    python scripts/probe_semiseparable.py --steps 30000  # quick look
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--chunk-steps", type=int, default=10_000)
    ap.add_argument("--drift-every", type=int, default=1000)
    ap.add_argument("--dt", type=float, default=5e-4)
    ap.add_argument("--iters", default="(2,0)")
    ap.add_argument("--steps-per-call", type=int, default=50)
    ap.add_argument("--group-unroll", type=int, default=1)
    ap.add_argument("--n-links", type=int, default=20)
    ap.add_argument("--solver", default="both",
                    choices=["both", "dense", "semiseparable", "linv",
                             "mobius"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _timed_chunked_run
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    iters = tuple(int(x) for x in args.iters.strip("()").split(","))
    print(f"device: {jax.devices()[0].platform}, B={args.batch}, "
          f"n={args.n_links}, steps={args.steps}, dt={args.dt}, "
          f"iters={iters}, spc={args.steps_per_call}, "
          f"group_unroll={args.group_unroll}")

    def build(solver):
        ex = chain(n_links=args.n_links, fused_solver=solver)
        system = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ex.system
        )
        rng = np.random.default_rng(0)
        q = jnp.asarray(
            0.5 + 0.01 * rng.standard_normal((args.batch, args.n_links)),
            jnp.float32,
        )
        p = jnp.asarray(
            0.01 * rng.standard_normal((args.batch, args.n_links)),
            jnp.float32,
        )
        return system, Phase(q, p)

    solvers = (["dense", "semiseparable"] if args.solver == "both"
               else [args.solver])
    results = {}
    for solver in solvers:
        system, ph = build(solver)
        with jax.enable_x64(True):
            r = _timed_chunked_run(
                args, system, ph, method="leapfrog_fused", iters=iters,
                dt=args.dt, n_steps=args.steps,
                chunk_steps=min(args.chunk_steps, args.steps),
                steps_per_call=args.steps_per_call,
            )
        results[solver] = r
        print(f"[{solver}] {r['member_steps_per_sec'] / 1e6:.1f}e6 "
              f"member-steps/s (steady {r['steady_chunks']} chunks, "
              f"first {r['first_chunk_s']}s), max drift {r['max_drift']:.3e}"
              f" ({r['drift_sampler']}, xval "
              f"{r.get('drift_sampler_xval', float('nan')):.2e})")

    if len(results) == 2:
        speedup = (results["semiseparable"]["member_steps_per_sec"]
                   / results["dense"]["member_steps_per_sec"])
        print(f"semiseparable / dense = {speedup:.3f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
