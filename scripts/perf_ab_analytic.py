#!/usr/bin/env python
"""A/B the analytic-override hot loops in ONE process (compile-service noise
makes cross-process comparisons unreliable): the AD/Jacobian path vs the
analytic ``mass_matrix_fn`` path (and, when present, the analytic
``dtdq_fn`` path) on the chain-20 ensemble leapfrog.

    python scripts/perf_ab_analytic.py [--inner 50] [--rounds 3]
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
    ap.add_argument("--iters", default="2,0")
    ap.add_argument("--method", default="leapfrog")
    args = ap.parse_args()
    iters = (tuple(int(x) for x in args.iters.split(","))
             if "," in args.iters else int(args.iters))

    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase
    from hamilton_tpu.integrators.fixed import make_stepper

    ex = chain(n_links=20)
    full = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.asarray(ex.init_phase.q, np.float32)
                    + 0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))
    p = jnp.asarray(0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))

    def strip(system, **overrides):
        import copy

        s = copy.copy(system)
        for k, v in overrides.items():
            setattr(s, k, v)
        return s

    variants = {
        "ad_jacobian": strip(full, mass_matrix_fn=None,
                             **({"dtdq_fn": None} if hasattr(full, "dtdq_fn") else {})),
        "analytic_K": (strip(full, **({"dtdq_fn": None} if hasattr(full, "dtdq_fn") else {}))
                       if full.mass_matrix_fn is not None else None),
    }
    if getattr(full, "dtdq_fn", None) is not None:
        variants["analytic_K_dtdq"] = full
    variants = {k: v for k, v in variants.items() if v is not None}

    runs = {}
    for name, system in variants.items():
        st = make_stepper(system, args.method, iters=iters)

        @jax.jit
        def run(qq, pp, st=st):
            c0 = st.init(Phase(qq, pp))
            c = jax.lax.fori_loop(
                0, args.inner, lambda i, c: st.step(c, jnp.float32(1e-3)), c0
            )
            return st.extract(c).q

        t0 = time.perf_counter()
        jax.block_until_ready(run(q, p))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(run(q, p))  # warm past first-exec slowdown
        runs[name] = (run, compile_s)

    out = {"method": args.method, "iters": str(iters), "batch": args.batch,
           "platform": jax.devices()[0].platform,
           "compile_s": {k: round(c, 1) for k, (_, c) in runs.items()}}
    times = {k: [] for k in runs}
    for _ in range(args.rounds):
        for name, (fn, _) in runs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, p))
            times[name].append((time.perf_counter() - t0) / args.inner * 1e3)
    for name, ts in times.items():
        out[name + "_ms"] = [round(t, 3) for t in ts]
        out[name + "_best_ms"] = round(min(ts), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
