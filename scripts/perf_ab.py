#!/usr/bin/env python
"""A/B the leapfrog hot loop routings in ONE process (compile-service noise
makes cross-process comparisons unreliable): member-major per-call kernels
(HAMILTON_NO_TILES) vs tile-resident factors.

    python scripts/perf_ab.py [--inner 50] [--rounds 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--method", default="leapfrog")
    args = ap.parse_args()

    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=20)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.asarray(ex.init_phase.q, np.float32)
                    + 0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))
    p = jnp.asarray(0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))

    def build(no_tiles: bool):
        # routing is resolved at trace time from the env var
        if no_tiles:
            os.environ["HAMILTON_NO_TILES"] = "1"
        else:
            os.environ.pop("HAMILTON_NO_TILES", None)
        from hamilton_tpu.integrators.fixed import make_stepper

        st = make_stepper(system, args.method, iters=args.iters)

        @jax.jit
        def run(qq, pp):
            c0 = st.init(Phase(qq, pp))
            c = jax.lax.fori_loop(
                0, args.inner, lambda i, c: st.step(c, jnp.float32(1e-3)), c0
            )
            return st.extract(c).q

        t0 = time.perf_counter()
        jax.block_until_ready(run(q, p))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(run(q, p))  # warm past first-exec slowdown
        return run, compile_s

    run_a, ca = build(no_tiles=True)
    run_b, cb = build(no_tiles=False)
    times = {"member_major": [], "tile_resident": []}
    for _ in range(args.rounds):
        for name, fn in (("member_major", run_a), ("tile_resident", run_b)):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, p))
            times[name].append((time.perf_counter() - t0) / args.inner * 1e3)
    out = {
        "method": args.method, "iters": args.iters, "batch": args.batch,
        "compile_s": [round(ca, 1), round(cb, 1)],
    }
    for name, ts in times.items():
        out[name + "_ms"] = [round(t, 3) for t in ts]
        out[name + "_best_ms"] = round(min(ts), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
