#!/usr/bin/env python
"""A/B the library leapfrog vs the fused whole-step Pallas kernel in ONE
process (chain-20 ensemble, f32, real TPU).

    python scripts/perf_fused.py [--inner 100] [--rounds 3] [--batch 16384]
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
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--compensated", action="store_true")
    args = ap.parse_args()

    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase
    from hamilton_tpu.integrators.fixed import make_stepper

    ex = chain(n_links=20)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.asarray(ex.init_phase.q, np.float32)
                    + 0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))
    p = jnp.asarray(0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))

    variants = {
        "library_2_0": make_stepper(system, "leapfrog", iters=(2, 0),
                                    compensated=args.compensated),
        "fused_3_1": make_stepper(system, "leapfrog_fused", iters=(3, 1),
                                  compensated=args.compensated),
    }
    for s in (10, 50, 100):
        if args.inner % s == 0:
            variants[f"fused_3_1_s{s}"] = make_stepper(
                system, "leapfrog_fused", iters=(3, 1),
                compensated=args.compensated, steps_per_call=s,
            )
    runs = {}
    for name, st in variants.items():
        @jax.jit
        def run(qq, pp, st=st):
            c0 = st.init(Phase(qq, pp))
            c = jax.lax.fori_loop(
                0, args.inner // st.substeps,
                lambda i, c: st.step(c, jnp.float32(1e-3)), c0
            )
            return st.extract(c).q
        t0 = time.perf_counter()
        jax.block_until_ready(run(q, p))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(run(q, p))
        runs[name] = (run, compile_s)

    out = {"batch": args.batch, "inner": args.inner,
           "compensated": args.compensated,
           "platform": jax.devices()[0].platform,
           "compile_s": {k: round(c, 1) for k, (_, c) in runs.items()}}
    times = {k: [] for k in runs}
    for _ in range(args.rounds):
        for name, (fn, _) in runs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, p))
            times[name].append((time.perf_counter() - t0) / args.inner * 1e3)
    for name, ts in times.items():
        out[name + "_best_ms"] = round(min(ts), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
