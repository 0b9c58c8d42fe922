"""Order-4 fused margin point: suzuki4_fused (2,1) vs yoshida4_fused (3,2).

Suzuki's 5-stage composition keeps every |w| <= 0.42 (the triple jump's
middle stage is |w0| = 1.70), so the per-substep fixed-point contraction is
~4x milder and the cheap (2,1) schedule may converge where the triple jump
needs (3,2).  Full-horizon drift + throughput at the headline shape.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=100_000)
ap.add_argument("--chunk-steps", type=int, default=10_000)
ap.add_argument("--batch", type=int, default=16384)
ap.add_argument("--methods", default="suzuki4_fused:2:1")
ap.add_argument("--dt", type=float, default=1e-3)
args = ap.parse_args()

with jax.enable_x64(True):
    import bench
    system, ph = bench._build(args.batch, jnp.float32)
    from hamilton_tpu.ensemble import evolve_ensemble_chunked

    for spec in args.methods.split(","):
        name, ip, iq = spec.split(":")
        wall, t0 = [], [time.perf_counter()]

        def cb(ci, phase, drift):
            now = time.perf_counter()
            wall.append(now - t0[0])
            t0[0] = now

        final, drift = evolve_ensemble_chunked(
            system, ph, args.dt, args.steps, chunk_steps=args.chunk_steps,
            method=name, iters=(int(ip), int(iq)), compensated=True,
            drift_every=1000, drift_dtype="df32", callback=cb,
            steps_per_call=50,
        )
        jax.block_until_ready(final.q)
        steady = wall[1:] if len(wall) > 1 else wall
        rate = args.batch * args.chunk_steps * len(steady) / sum(steady)
        print(f"{name}({ip},{iq}): {rate/1e6:.1f}e6 member-steps/s  "
              f"first={wall[0]:.0f}s steady={sum(steady):.1f}s  "
              f"max_drift={float(jnp.max(drift)):.3e}  steps={args.steps} dt={args.dt}",
              flush=True)
