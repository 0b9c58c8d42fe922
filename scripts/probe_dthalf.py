#!/usr/bin/env python
"""On-TPU probe: the dt-margin datapoint at the headline shape.

CPU mechanism study (scripts/exp_trig_correction.py, docs/design.md
round-3): the leapfrog drift level at dt=1e-3 is dt² truncation —
precision-independent (f64 increments measure the same) — so halving dt
cuts it ~4× while member-steps/s is unchanged.  This measures
leapfrog_fused at dt=5e-4 over 2e5 steps (the SAME physical horizon t=100
as the headline) at 16384×chain-20: throughput + on-device f64-sampled
drift.

    python scripts/probe_dthalf.py [--steps 200000] [--dt 5e-4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--dt", type=float, default=5e-4)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--chunk-steps", type=int, default=20_000)
    ap.add_argument("--drift-every", type=int, default=1000)
    ap.add_argument("--steps-per-call", type=int, default=50)
    args = ap.parse_args()

    import bench

    chunk_steps = min(args.chunk_steps, args.steps)
    n_steps = (args.steps // chunk_steps) * chunk_steps
    with jax.enable_x64(True):
        system, ph = bench._build(args.batch, jnp.float32)
        r = bench._timed_chunked_run(
            args, system, ph, method="leapfrog_fused", iters=(2, 1),
            dt=args.dt, n_steps=n_steps, chunk_steps=chunk_steps,
            steps_per_call=args.steps_per_call,
        )
    print(json.dumps({
        "dt": args.dt,
        "steps": n_steps,
        "member_steps_per_sec": r["member_steps_per_sec"],
        "max_energy_drift_f32comp": r["max_drift"],
        "first_chunk_s": r["first_chunk_s"],
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
