#!/usr/bin/env python
"""Chaos map of the double pendulum over an (angle × mass) parameter grid.

The capability showcase: an (IC × parameter) ensemble on the native hot
path.  Every grid cell is a double pendulum with its own initial angle θ₀
AND its own second-bob mass m₂ (a batched ``System.params`` sweep — the
per-member physics rides the same kernels as a shared system), evolved as
ONE ensemble, with the largest Lyapunov exponent measured by **streaming
Benettin pairs** (`utils.LyapunovPairs`): renormalized log-growth
accumulates inside the evolution loop, so no trajectory is emitted and the
scan runs at arbitrary horizons (the round-3 emitted-trajectory estimator
saturated once ‖Δz‖ reached attractor size, t ≈ 15).  The reference can
express none of this: its `System` is a closure record with baked masses
and its driver integrates one trajectory at a time
(``Numeric/Hamilton.hs:438-440``).

Output: an ASCII heat map (rows = m₂, cols = θ₀) of λ_max.  The lower rows
(light m₂) stay regular at small angles while the high-energy right side
goes chaotic — the classic double-pendulum transition, now as one batched
evaluation.

Usage:
    python examples/chaos_scan.py                    # CPU, 48×16 grid
    python examples/chaos_scan.py --cols 64 --rows 24
    python examples/chaos_scan.py --fused            # fused kernel (TPU),
                                                     # grid padded to 1024
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAMP = " .:-=+*#%@"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=48,
                    help="θ₀ grid points (default 48)")
    ap.add_argument("--rows", type=int, default=16,
                    help="m₂ grid points (default 16)")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--emit-every", type=int, default=40)
    ap.add_argument("--eps", type=float, default=None,
                    help="initial separation of the trajectory pairs "
                    "(default 1e-7, or 1e-4 in the f32 --fused mode where "
                    "1e-7 sits at the round-off floor)")
    ap.add_argument("--fused", action="store_true",
                    help="run the fused serial-chain kernel (accelerator; "
                    "f32, batch padded to a multiple of 1024)")
    args = ap.parse_args(argv)

    import jax

    if not args.fused:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", not args.fused)

    import jax.numpy as jnp

    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase
    from hamilton_tpu.utils.observables import LyapunovPairs

    dtype = jnp.float32 if args.fused else jnp.float64
    if args.eps is None:
        args.eps = 1e-4 if args.fused else 1e-7
    rows, cols = args.rows, args.cols
    b = rows * cols

    # the reference double pendulum as the n=2 serial-chain family member:
    # unit first arm, half-length second arm, gravity 5
    # (app/Examples.hs:75-94) — m2 becomes the swept parameter
    ex = chain(n_links=2, gravity=5.0)
    arm_lengths = jnp.asarray([1.0, 0.5], dtype)

    theta = jnp.linspace(0.15, jnp.pi - 0.15, cols, dtype=dtype)
    m2 = jnp.linspace(0.2, 3.0, rows, dtype=dtype)
    tg, mg = jnp.meshgrid(theta, m2)          # (rows, cols)
    tg, mg = tg.reshape(-1), mg.reshape(-1)   # (b,)

    # Streaming Benettin pairs (utils.LyapunovPairs): the λ estimate
    # accumulates INSIDE the evolution loop with periodic renormalization,
    # so no trajectory is ever emitted and the scan runs at FULL horizons
    # (1e5+ steps) where an emitted-pair estimator saturates after the
    # linear window (‖Δz‖ reaches attractor size in t ≈ ln(size/ε)/λ ≈ 15).
    pad = 0
    if args.fused:
        # fused kernel batches are register tiles of 1024 members; pad the
        # interleaved pair batch (2b) up — by PAIRS, so alignment holds —
        # and drop the padding after the run
        pad = (-2 * b) % 1024
        assert pad % 2 == 0
        method, iters = "leapfrog_fused", (3, 1)
    else:
        method, iters = "leapfrog", (3, 1)

    def interleave_params(x):
        """Per-pair parameters: each grid cell's params repeated for both
        pair members, then pair-padded."""
        out = jnp.repeat(x, 2, axis=0)
        if pad:
            out = jnp.concatenate(
                [out, jnp.broadcast_to(out[:1], (pad,) + x.shape[1:])]
            )
        return out

    q0 = jnp.stack([tg, jnp.zeros_like(tg)], axis=-1)       # (b, 2)
    ph0 = LyapunovPairs.pair_ensemble(
        Phase(q0, jnp.zeros_like(q0)), args.eps
    )
    if pad:
        ph0 = Phase(
            jnp.concatenate([ph0.q, jnp.broadcast_to(ph0.q[:1], (pad, 2))]),
            jnp.concatenate([ph0.p, jnp.broadcast_to(ph0.p[:1], (pad, 2))]),
        )

    sysb = ex.system.replace_params({
        "masses": interleave_params(jnp.stack([jnp.ones_like(mg), mg], axis=-1)),
        "lengths": interleave_params(jnp.broadcast_to(arm_lengths, (b, 2))),
        "gravity": interleave_params(jnp.full((b,), 5.0, dtype)),
    })

    from contextlib import nullcontext

    ctx = nullcontext()
    if args.fused and jax.default_backend() == "cpu":
        # no accelerator: run the kernel under the Pallas interpreter
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()

    lp = LyapunovPairs(d0=args.eps)
    t0 = time.perf_counter()
    with ctx:
        final, _, obs = evolve_ensemble_final(
            sysb, ph0, args.dt, args.steps,
            method=method, iters=iters, track_drift=False,
            drift_every=args.steps,
            observable=lp, obs_every=args.emit_every,
            # fused mode: run the whole inter-sample span inside one kernel
            # invocation, carrying state + factor in VMEM
            steps_per_call=args.emit_every if args.fused else 1,
        )
        jax.block_until_ready(obs["sum_log"])
    el = time.perf_counter() - t0

    lam = lp.lyapunov(obs, args.dt * args.steps)[:b].reshape(rows, cols)

    lam = jnp.nan_to_num(lam, nan=0.0)
    lo, hi = float(jnp.min(lam)), float(jnp.max(lam))
    # λ ≤ 0 means regular — blank it so one deeply-negative cell can't
    # compress the chaotic range's contrast
    span = max(hi, 1e-12)
    idx = jnp.clip((jnp.maximum(lam, 0.0) / span * (len(RAMP) - 1))
                   .astype(jnp.int32), 0, len(RAMP) - 1)

    total = 2 * b + pad
    print(f"λ_max over θ₀ ∈ [{float(theta[0]):.2f}, {float(theta[-1]):.2f}] "
          f"(→) × m₂ ∈ [{float(m2[0]):.2f}, {float(m2[-1]):.2f}] (↓)")
    print(f"{rows}×{cols} grid, {total}-member ensemble ({method}), "
          f"{args.steps} steps: {el:.1f}s")
    print(f"λ range [{lo:.3f}, {hi:.3f}]   ramp '{RAMP}'")
    for r in range(rows):
        row = "".join(RAMP[int(idx[r, c])] for c in range(cols))
        print(f"m₂={float(m2[r]):4.2f} |{row}|")

    # sanity for the test harness: the high-angle side must be more chaotic
    # than the small-angle side
    w = max(cols // 4, 1)
    left = float(jnp.mean(lam[:, :w]))
    right = float(jnp.mean(lam[:, -w:]))
    print(f"mean λ: small angles {left:.3f}, large angles {right:.3f}")
    return 0 if right > left and hi > 0.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
