"""A/B the drift samplers on the real TPU at the headline shape.

Usage: python scripts/probe_df32.py [--steps 30000]  (600 s budget)
Round-3 anchors (docs/design.md): f64 dense sampling 157.5e6, no sampling
169.9e6 member-steps/s at 16384x chain-20, spc=50, drift_every=1000.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=30_000)
ap.add_argument("--chunk-steps", type=int, default=10_000)
ap.add_argument("--batch", type=int, default=16384)
args = ap.parse_args()

with jax.enable_x64(True):
    import bench
    system, ph = bench._build(args.batch, jnp.float32)
    from hamilton_tpu.ensemble import evolve_ensemble_chunked

    def run(drift_dtype, tag):
        wall = []
        t0 = [time.perf_counter()]

        def cb(ci, phase, drift):
            now = time.perf_counter()
            wall.append(now - t0[0])
            t0[0] = now

        final, drift = evolve_ensemble_chunked(
            system, ph, 1e-3, args.steps, chunk_steps=args.chunk_steps,
            method="leapfrog_fused", iters=(2, 1), compensated=True,
            drift_every=1000, drift_dtype=drift_dtype, callback=cb,
            steps_per_call=50,
        )
        jax.block_until_ready(final.q)
        steady = wall[1:]
        rate = args.batch * args.chunk_steps * len(steady) / sum(steady)
        print(f"{tag}: {rate/1e6:.1f}e6 member-steps/s  "
              f"first={wall[0]:.1f}s steady={sum(steady):.2f}s "
              f"max_drift={float(jnp.max(drift)):.3e}", flush=True)
        return rate

    r_df = run("df32", "df32 ")
    r_64 = run(jnp.float64, "f64  ")
    r_no = None
    print(f"df32/f64 speedup: {r_df/r_64:.3f}", flush=True)
