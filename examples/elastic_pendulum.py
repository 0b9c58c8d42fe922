#!/usr/bin/env python
"""Elastic pendulum — a USER-DEFINED system joining the fused-kernel family.

The round-3 fused whole-step kernel became an *interface* in round 4
(``ops/pallas_step.FusedForms``); this script is the worked proof that a
user can put their own physics on it without touching the framework.  The
system here — a point mass on a massless spring, free to swing — is NOT in
``hamilton_tpu.models``; everything below goes through the public API:

1.  The *library* definition is four lines of ordinary JAX handed to
    :func:`hamilton_tpu.mk_system_cart` (coordinate map + Cartesian
    potential, exactly the reference's ``mkSystem'`` workflow,
    ``Numeric/Hamilton.hs:238-254``) — this is the AD-powered correctness
    reference and works on every integrator.
2.  The *fused* definition is one :class:`~hamilton_tpu.ops.pallas_step.
    FusedForms` factory (~40 lines) declaring the closed forms in tile
    arithmetic: the aux tuple, the SPD mass-matrix entries, ∂H/∂q, and the
    potential (which also powers the double-f32 drift sampler).  Attaching
    it via ``mk_system_cart(..., fused_forms=...)`` makes
    ``method="leapfrog_fused"`` (and the Suzuki/Yoshida compositions built
    on it) available on all ensemble drivers, with parameter sweeps riding
    the kernel as runtime coefficient tiles.

Closed forms, for q = (θ, r) with θ from the downward vertical and r the
spring length (pivot at the origin, z up):

    x = (r sinθ, −r cosθ)            K(q) = J^T M J = m · diag(r², 1)
    U  = −m·g·r·cosθ + ½k(r − l₀)²
    ∂H/∂θ = m·g·r·sinθ
    ∂H/∂r = k(r − l₀) − m·g·cosθ − m·r·w_θ²

The demo physics is the elastic pendulum's classic **autoparametric 2:1
resonance**: radial (spring) oscillation pumps the swing mode when
ω_spring = 2·ω_pendulum, i.e. k/m = 4g/l_eq with l_eq = l₀ + mg/k the
equilibrium length — which solves to the clean closed form

    k_res = 3·m·g/l₀.

The script sweeps k across the ensemble (one batched ``System.params``
sweep — per-member spring constants ride the same kernel), starts each
member in a pure radial oscillation with a 0.01-rad swing seed, streams the
running max |θ| through the evolution loop (``utils.RunningExtrema`` — no
trajectory is emitted), and checks that the amplification peaks at k_res.

Usage:
    python examples/elastic_pendulum.py              # CPU, library path
    python examples/elastic_pendulum.py --sweep 96   # finer k grid
    python examples/elastic_pendulum.py --fused      # fused kernel (TPU),
                                                     # sweep padded to 1024
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from contextlib import nullcontext

# allow running straight from a checkout: examples/ sits next to hamilton_tpu/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAMP = " .:-=+*#%@"


def make_system(mass=1.0, gravity=9.8, spring_k=30.0, rest_length=1.0):
    """Build the elastic-pendulum :class:`~hamilton_tpu.system.System`
    through the public constructor — library path AND fused family.

    All four physical parameters live in ``System.params`` so they are
    sweepable per member and differentiable.
    """
    import jax.numpy as jnp

    from hamilton_tpu import mk_system_cart

    ftype = jnp.result_type(float)
    params = {
        "mass": jnp.asarray(mass, dtype=ftype),
        "gravity": jnp.asarray(gravity, dtype=ftype),
        "spring_k": jnp.asarray(spring_k, dtype=ftype),
        "rest_length": jnp.asarray(rest_length, dtype=ftype),
    }

    def inertia_fn(p):
        return jnp.stack([p["mass"], p["mass"]])

    def coords(q, p):
        th, r = q[0], q[1]
        return jnp.stack([r * jnp.sin(th), -r * jnp.cos(th)])

    def potential_cart(x, p):
        stretch = jnp.sqrt(x[0] * x[0] + x[1] * x[1]) - p["rest_length"]
        return (
            (p["gravity"] * p["mass"]).astype(x.dtype) * x[1]
            + 0.5 * p["spring_k"].astype(x.dtype) * stretch * stretch
        )

    # ---- the fused-family contract: one declarative factory -----------
    # Coefficient table (one table, four entries): (m, g·m, k, l₀).
    # Products a form needs (g·m here) belong IN the table so the
    # double-f32 sampler splits them exactly at trace time (ops/df32.py).
    def fused_forms(system):
        from hamilton_tpu.ops.pallas_step import (
            FamilyFns, FusedForms, concrete_scalar,
        )

        p = system.params
        cs = [concrete_scalar(p[k_])
              for k_ in ("mass", "gravity", "spring_k", "rest_length")]
        consts = None
        if all(c is not None for c in cs):
            m_c, g_c, k_c, l_c = cs
            consts = ((m_c, g_c * m_c, k_c, l_c),)

        def arrays_fn(dtype):
            m_ = jnp.asarray(p["mass"]).astype(dtype)
            g_ = jnp.asarray(p["gravity"]).astype(dtype)
            k_ = jnp.asarray(p["spring_k"]).astype(dtype)
            l_ = jnp.asarray(p["rest_length"]).astype(dtype)
            return (jnp.stack([m_, g_ * m_, k_, l_], axis=-1),)

        def make(at, fm):
            mass = lambda: at[0](0)  # noqa: E731
            gm = lambda: at[0](1)    # noqa: E731  g·m
            kspr = lambda: at[0](2)  # noqa: E731
            l0 = lambda: at[0](3)    # noqa: E731

            def aux(q):
                return (fm.sin(q[0]), fm.cos(q[0]))

            def k_at(aux_v, q):
                s, _ = aux_v
                r = q[1]

                def at_(i, j):
                    if (i, j) == (0, 0):
                        return mass() * (r * r)
                    if (i, j) == (1, 1):
                        return fm.full(mass(), s)
                    return fm.zero(s)

                return at_

            def dhdq(aux_v, q, w):
                s, c = aux_v
                r = q[1]
                return [
                    gm() * (r * s),
                    kspr() * r - kspr() * l0() - gm() * c
                    - mass() * r * (w[0] * w[0]),
                ]

            def potential(aux_v, q):
                s, c = aux_v
                r = q[1]
                d = r - l0()
                return (kspr() * d) * d * 0.5 - gm() * (r * c)

            return FamilyFns(aux, k_at, dhdq, potential)

        return FusedForms(
            n=2, n_aux=2, coef_lens=(4,), consts=consts,
            arrays_fn=arrays_fn, make=make, name="elastic_pendulum",
        )

    return mk_system_cart(
        None,
        coords,
        potential_cart,
        n=2,
        name="elastic_pendulum",
        params=params,
        inertia_fn=inertia_fn,
        fused_forms=fused_forms,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", type=int, default=64,
                    help="spring-constant grid points (default 64)")
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--mass", type=float, default=1.0)
    ap.add_argument("--gravity", type=float, default=9.8)
    ap.add_argument("--rest-length", type=float, default=1.0)
    ap.add_argument("--amp", type=float, default=0.15,
                    help="initial radial stretch beyond equilibrium")
    ap.add_argument("--theta0", type=float, default=0.01,
                    help="swing seed angle (rad)")
    ap.add_argument("--fused", action="store_true",
                    help="run the fused Pallas kernel (accelerator; f32, "
                    "sweep padded to a multiple of 1024)")
    ap.add_argument("--skip-parity", action="store_true",
                    help="skip the interpreter-mode fused≡library check")
    args = ap.parse_args(argv)

    import jax

    if not args.fused:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", not args.fused)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from hamilton_tpu import to_phase
    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.state import Config, Phase
    from hamilton_tpu.utils.observables import RunningExtrema

    dtype = jnp.float32 if args.fused else jnp.float64
    m, g, l0 = args.mass, args.gravity, args.rest_length
    k_res = 3.0 * m * g / l0

    # ---- stage 1: fused ≡ library parity through the public API -------
    # The library step is AD-generic (jacfwd/Hessian machinery); the fused
    # step is the hand-declared closed forms above.  Agreement to ~1e-12
    # in f64 is the proof the FamilyFns are the same physics.
    if not args.skip_parity:
        sys_sh = make_system(m, g, spring_k=k_res, rest_length=l0)
        rng = np.random.default_rng(0)
        ph = Phase(
            jnp.asarray(
                np.stack([0.3 + 0.02 * rng.standard_normal(1024),
                          l0 + 0.1 * rng.standard_normal(1024)], axis=-1)),
            jnp.asarray(0.05 * rng.standard_normal((1024, 2))),
        )
        if not args.fused:
            ph = Phase(ph.q.astype(jnp.float64), ph.p.astype(jnp.float64))
        dt_par = jnp.asarray(1e-3, ph.q.dtype)
        lib = make_stepper(sys_sh, "leapfrog", iters=(3, 2))
        fus = make_stepper(sys_sh, "leapfrog_fused", iters=(3, 2))
        c_lib = lib.init(ph)
        t0 = time.perf_counter()
        ctx = (pltpu.force_tpu_interpret_mode() if not args.fused
               else nullcontext())
        with ctx:
            c_fus = fus.init(ph)
            for _ in range(2):
                c_lib = lib.step(c_lib, dt_par)
                c_fus = fus.step(c_fus, dt_par)
            a, b = lib.extract(c_lib), fus.extract(c_fus)
            err = max(float(jnp.max(jnp.abs(a.q - b.q))),
                      float(jnp.max(jnp.abs(a.p - b.p))))
        tol = 1e-11 if not args.fused else 2e-5
        mode = "interpreter" if not args.fused else "TPU"
        print(f"[parity] fused vs library ({mode}, B=1024, 2 steps): "
              f"max|Δ| = {err:.3e}  ({time.perf_counter() - t0:.1f}s)")
        if not (err < tol):
            print(f"[parity] FAILED: {err:.3e} >= {tol:.0e}")
            return 1

    # ---- stage 2: the resonance sweep as one batched ensemble ---------
    b = args.sweep
    if args.fused and b % 1024:
        b = ((b + 1023) // 1024) * 1024
        print(f"[sweep] fused mode pads the grid to B={b}")
    k_grid = jnp.linspace(0.35 * k_res, 2.0 * k_res, b, dtype=dtype)

    base = make_system(m, g, spring_k=float(k_grid[0]), rest_length=l0)
    sysb = base.replace_params({
        "mass": jnp.full((b,), m, dtype),
        "gravity": jnp.full((b,), g, dtype),
        "spring_k": k_grid,
        "rest_length": jnp.full((b,), l0, dtype),
    })

    # per-member equilibrium length l_eq = l₀ + mg/k; start stretched by
    # --amp with the 0.01-rad swing seed
    l_eq = l0 + m * g / k_grid
    q0 = jnp.stack([jnp.full((b,), args.theta0, dtype), l_eq + args.amp],
                   axis=-1)
    v0 = jnp.zeros((b, 2), dtype)
    ph0 = to_phase(sysb, Config(q0, v0))

    swing = RunningExtrema(lambda ph: jnp.abs(ph.q[..., 0]))
    method = "leapfrog_fused" if args.fused else "leapfrog"
    t0 = time.perf_counter()
    final, drift, obs = evolve_ensemble_final(
        sysb, ph0, args.dt, args.steps,
        method=method, iters=(2, 1) if args.fused else 3,
        drift_every=args.steps, observable=swing, obs_every=10,
    )
    amp = np.asarray(obs["max"], dtype=np.float64)
    wall = time.perf_counter() - t0
    print(f"[sweep] B={b} × {args.steps} steps (dt={args.dt}, {method}): "
          f"{wall:.1f}s, max |ΔH/H₀| = {float(jnp.max(drift)):.2e}")

    # ---- report --------------------------------------------------------
    k_np = np.asarray(k_grid, dtype=np.float64)
    i_pk = int(np.argmax(amp))
    k_pk = k_np[i_pk]
    med = float(np.median(amp))
    print(f"\nswing amplification max|θ| over k/k_res ∈ "
          f"[{k_np[0] / k_res:.2f}, {k_np[-1] / k_res:.2f}]  "
          f"(k_res = 3mg/l₀ = {k_res:.2f}):")
    lo = float(amp.min())
    hi = float(amp.max())
    cols = min(b, 72)
    idx = np.linspace(0, b - 1, cols).astype(int)
    line = "".join(
        RAMP[int((amp[i] - lo) / max(hi - lo, 1e-12) * (len(RAMP) - 1))]
        for i in idx
    )
    print(f"  k: {k_np[0]:6.2f} {line} {k_np[-1]:6.2f}")
    print(f"  peak max|θ| = {amp[i_pk]:.3f} rad at k = {k_pk:.2f} "
          f"(k/k_res = {k_pk / k_res:.3f}); median over sweep = {med:.3f}")

    ok = abs(k_pk / k_res - 1.0) < 0.25 and amp[i_pk] > 5.0 * args.theta0
    if not ok:
        print("[check] FAILED: resonance peak not where 2:1 theory puts it")
        return 1
    print("[check] autoparametric 2:1 resonance confirmed at k ≈ 3mg/l₀")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
