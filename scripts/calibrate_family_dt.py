#!/usr/bin/env python
"""Per-family dt calibration for the <1e-6 full-horizon drift bound.

The headline drift level is dt² truncation — precision-independent
(docs/design.md round-3 "what sets the drift level";
scripts/exp_trig_correction.py) — so dt is the margin lever at fixed
member-steps/s.  The chain got that treatment in round 4 (dt=5e-4 → 3e-7 at
t=100); this script runs the SAME calibration for every other fused family
(VERDICT r4 item 3): f32+Kahan leapfrog at the bench's iteration placement,
full 1e5-step horizon, on the host CPU at a small batch (drift is a property
of integrator+dt+precision, not the chip; the library stepper shares the
kernel's fixed points so levels transfer — the bench's TPU fused runs are
the confirming measurement).

Usage:
    python scripts/calibrate_family_dt.py                 # all families
    python scripts/calibrate_family_dt.py --family twobody --dts 1e-3,5e-4
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# the bench's per-family IC jitter scales (bench.phase_families build_phase)
FAMILIES = {
    "spherical": ("spherical_pendulum", {}, 0.05),
    "twobody": ("two_body", {}, 0.02),
    "spring": ("spring", {}, 0.02),
    "room": ("room", {}, 0.05),
    "ellipse": ("ellipse", {}, 0.05),
    "bezier": ("bezier", {}, 0.05),
    "pendulum": ("pendulum", {}, 0.05),
}


def build_phase(ex, scale, batch, rng):
    from hamilton_tpu.state import Phase

    ph0 = ex.init_phase
    n = ph0.q.shape[-1]
    q = np.asarray(ph0.q, np.float32) + scale * rng.standard_normal(
        (batch, n)
    ).astype(np.float32)
    p = np.broadcast_to(np.asarray(ph0.p, np.float32), (batch, n))
    return Phase(jnp.asarray(q, jnp.float32), jnp.asarray(p.copy()))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="all")
    ap.add_argument("--dts", default="1e-3,5e-4,2.5e-4,1.25e-4")
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--target", type=float, default=1e-6)
    args = ap.parse_args(argv)

    from hamilton_tpu import models
    from hamilton_tpu.ensemble import evolve_ensemble_final

    dts = [float(x) for x in args.dts.split(",")]
    fams = list(FAMILIES) if args.family == "all" else [args.family]
    rng = np.random.default_rng(11)  # bench seed

    chosen = {}
    for fam in fams:
        ctor_name, kw, scale = FAMILIES[fam]
        ex = getattr(models, ctor_name)(**kw)
        sys32 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ex.system
        )
        ph = build_phase(ex, scale, args.batch, rng)
        for dt in dts:
            # keep the simulated horizon fixed at t = steps·1e-3 (the bench
            # horizon): smaller dt runs proportionally more steps
            n_steps = int(round(args.steps * (1e-3 / dt)))
            t0 = time.perf_counter()
            try:
                _, drift = evolve_ensemble_final(
                    sys32, ph, dt, n_steps, method="leapfrog", iters=(2, 0),
                    compensated=True, drift_every=1000,
                )
                d = float(jnp.max(drift))
            except Exception as e:  # noqa: BLE001
                print(f"{fam:10s} dt={dt:8.2e}  ERROR {type(e).__name__}: "
                      f"{e}"[:120])
                continue
            el = time.perf_counter() - t0
            mark = "OK " if d < args.target else "   "
            print(f"{fam:10s} dt={dt:8.2e} steps={n_steps:7d} "
                  f"max|dH/H0|={d:10.3e} {mark} ({el:.1f}s)")
            if fam not in chosen and d < args.target / 2:
                chosen[fam] = (dt, d)
    print("\nchosen (first dt with 2x margin):")
    for fam, (dt, d) in chosen.items():
        print(f"  {fam}: dt={dt:g}  drift={d:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
