#!/usr/bin/env python
"""Measure, in ONE process on the real TPU, how matmul precision affects the
leapfrog hot loop: step time AND short-horizon energy drift (f64-measured).

TPU dots/convs default to bf16 inputs; the K = JᵀMJ contraction and the J·w
mat-vecs in the dynamics then carry ~1e-3 relative error, which the CPU test
suite (full f32/f64) never sees.  This quantifies the drift damage and the
cost of precision=float32.

    python scripts/perf_precision.py [--steps 5000] [--batch 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)  # for the f64 drift measurement

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=20)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.asarray(ex.init_phase.q, np.float32)
                    + 0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))
    p = jnp.asarray(0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))

    st = make_stepper(system, "leapfrog", iters=args.iters)

    def build(precision):
        # the precision context must be active while the function BODY is
        # traced, so it lives inside the jitted functions
        @jax.jit
        def run_speed(qq, pp):
            with jax.default_matmul_precision(precision):
                c0 = st.init(Phase(qq, pp))
                c = jax.lax.fori_loop(
                    0, args.inner, lambda i, c: st.step(c, jnp.float32(1e-3)), c0
                )
                return st.extract(c).q

        @jax.jit
        def run_drift(qq, pp):
            with jax.default_matmul_precision(precision):
                _, drift = evolve_ensemble_final(
                    system, Phase(qq, pp), 1e-3, args.steps,
                    method="leapfrog", iters=args.iters, compensated=True,
                    drift_every=1000, drift_dtype=jnp.float64,
                )
                return jnp.max(drift)

        jax.block_until_ready(run_speed(q, p))
        jax.block_until_ready(run_speed(q, p))  # warm
        return run_speed, run_drift

    runs = {prec: build(prec) for prec in
            ("bfloat16", "BF16_BF16_F32_X3", "float32")}
    out = {"steps": args.steps, "batch": args.batch, "iters": args.iters}
    for _ in range(2):
        for prec, (run_speed, _) in runs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(run_speed(q, p))
            dt_ms = (time.perf_counter() - t0) / args.inner * 1e3
            key = f"{prec}_step_ms"
            out[key] = min(out.get(key, 1e9), round(dt_ms, 3))
    for prec, (_, run_drift) in runs.items():
        t0 = time.perf_counter()
        d = float(run_drift(q, p))
        out[f"{prec}_drift_{args.steps}"] = d
        out[f"{prec}_drift_wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({prec: d}), flush=True)
    # CPU reference: same f32-compensated integration, full-f32 matmuls
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        qc, pc = q[:64], p[:64]

        @jax.jit
        def run_drift_cpu(qq, pp):
            _, drift = evolve_ensemble_final(
                system, Phase(qq, pp), 1e-3, args.steps,
                method="leapfrog", iters=args.iters, compensated=True,
                drift_every=1000, drift_dtype=jnp.float64,
            )
            return jnp.max(drift)

        out["cpu_f32_drift"] = float(run_drift_cpu(qc, pc))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
