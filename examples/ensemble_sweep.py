#!/usr/bin/env python
"""Ensemble sweep: Lyapunov/chaos statistics for the double pendulum.

BASELINE configs[4]: a large ensemble sweeping initial conditions (and
optionally the second mass), evolved with a symplectic integrator, producing
chaos statistics — the largest-Lyapunov-exponent estimate per member from
twin-trajectory separation, plus energy-drift bounds as the correctness
check.  Shards over every visible device when more than one is present.

Usage:
    python examples/ensemble_sweep.py --batch 16384 --steps 20000
    python examples/ensemble_sweep.py --batch 64 --steps 500 --cpu   # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow running straight from a checkout: examples/ sits next to hamilton_tpu/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--emit-every", type=int, default=None)
    ap.add_argument("--method", default="gauss4")
    ap.add_argument("--spread", type=float, default=0.2,
                    help="half-width of the θ₁ initial-condition sweep")
    ap.add_argument("--twin-eps", type=float, default=1e-4,
                    help="twin displacement (must be representable at the "
                    "working precision; 1e-4 suits f32)")
    ap.add_argument("--mass-grid", type=int, default=0,
                    help="also sweep the second bob mass m₂ over this many "
                    "values (crossed with the θ₁ sweep) via System.params — "
                    "an (IC × parameter) grid with per-member physics")
    ap.add_argument("--mass-range", type=float, nargs=2, default=(0.5, 2.0))
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hamilton_tpu import Phase, evolve_ensemble
    from hamilton_tpu.models import double_pendulum
    from hamilton_tpu.parallel import ensemble_mesh, shard_phase
    from hamilton_tpu.utils import energy_drift, lyapunov_estimate

    emit = args.emit_every or max(args.steps // 50, 1)
    if args.steps % emit:
        args.steps = (args.steps // emit) * emit

    ex = double_pendulum()
    b = args.batch
    system = ex.system
    m2_grid = None
    if args.mass_grid > 0:
        if b % args.mass_grid:
            raise SystemExit(
                f"--batch {b} must be divisible by --mass-grid {args.mass_grid}"
            )
        # (IC × mass) grid: member i gets mass m2_grid[i % G]; the params
        # leaves carry the member batch axis and every path — library,
        # tile-resident solves, fused kernel — evaluates per-member physics
        m2_grid = jnp.linspace(args.mass_range[0], args.mass_range[1],
                               args.mass_grid)
        m2 = jnp.tile(m2_grid, b // args.mass_grid)
        system = ex.system.replace_params({"m1": jnp.ones(b), "m2": m2})
    theta1 = jnp.linspace(-args.spread, args.spread, b) + ex.init_config.q[0]
    q0 = jnp.stack([theta1, jnp.zeros(b)], axis=-1)
    ph = Phase(q0, jnp.zeros_like(q0))
    # twin members displaced by eps in θ₁ for the separation-growth estimate
    ph_twin = Phase(q0.at[:, 0].add(args.twin_eps), jnp.zeros_like(q0))

    devs = jax.devices()
    if len(devs) > 1 and b % len(devs) == 0:
        mesh = ensemble_mesh(devs)
        ph = shard_phase(ph, mesh)
        ph_twin = shard_phase(ph_twin, mesh)

    run = jax.jit(
        lambda p: evolve_ensemble(
            system, p, args.dt, args.steps, method=args.method, emit_every=emit
        )
    )
    t0 = time.perf_counter()
    traj = run(ph)
    jax.block_until_ready(traj.q)
    elapsed = time.perf_counter() - t0
    traj_twin = run(ph_twin)
    jax.block_until_ready(traj_twin.q)

    lam = np.asarray(lyapunov_estimate(system, traj, traj_twin, args.dt * emit))
    drift = np.asarray(energy_drift(system, traj))

    out = {
        "batch": b,
        "steps": args.steps,
        "dt": args.dt,
        "method": args.method,
        "member_steps_per_sec": b * args.steps / elapsed,
        "lyapunov_mean": float(lam.mean()),
        "lyapunov_max": float(lam.max()),
        "chaotic_fraction": float((lam > 0.05).mean()),
        "max_energy_drift": float(drift.max()),
        "devices": len(devs),
    }
    if m2_grid is not None:
        # member i carries mass m2_grid[i % G] → (IC, mass) reshape
        lam_by_mass = lam.reshape(-1, args.mass_grid)
        out["mass_grid_m2"] = [float(m) for m in np.asarray(m2_grid)]
        out["chaotic_fraction_by_mass"] = [
            float(f) for f in (lam_by_mass > 0.05).mean(axis=0)
        ]
    if args.json:
        print(json.dumps(out))
        return 0
    print(f"double-pendulum ensemble sweep: {b} members × {args.steps} steps "
          f"({args.method}, dt={args.dt})")
    print(f"  throughput           {out['member_steps_per_sec']:.3e} member-steps/s "
          f"on {len(devs)} device(s)")
    print(f"  max |ΔH/H₀|          {out['max_energy_drift']:.3e}")
    print(f"  λ̂ (largest Lyapunov) mean {out['lyapunov_mean']:.3f}, "
          f"max {out['lyapunov_max']:.3f}")
    print(f"  chaotic fraction     {out['chaotic_fraction']:.1%}  (λ̂ > 0.05)")
    if m2_grid is not None:
        print("  chaotic fraction by m₂ (params sweep):")
        for m, f in zip(out["mass_grid_m2"], out["chaotic_fraction_by_mass"]):
            print(f"    m₂ = {m:5.2f}: {f:6.1%} " + "#" * int(30 * f))
    # coarse histogram of λ̂ across the IC sweep
    lo, hi = lam.min(), lam.max()
    if hi > lo:
        hist, edges = np.histogram(lam, bins=12)
        peak = hist.max()
        print("  λ̂ distribution over the θ₁ sweep:")
        for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
            bar = "#" * int(40 * h / peak)
            print(f"    [{e0:6.3f},{e1:6.3f}) {bar}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
