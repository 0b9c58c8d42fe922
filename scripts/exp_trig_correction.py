#!/usr/bin/env python
"""Which rounding source sets the f32 compensated-leapfrog drift floor?

Standalone closed-form planar-chain generalized Verlet (the fused kernel's
math on (B, n) arrays — pallas_step.py `make_increments`), stepped in three
modes over long horizons on CPU, drift measured in f64 at the pair state:

  v0: f32 arithmetic, Kahan state pair, trig at q_hi            (the kernel)
  v2: v0 + first-order carry correction of every trig pair:
        sin(q+c) ~= s + c*cos,  cos(q+c) ~= cos - c*s
      (the carry IS the state's low word, so this evaluates the dynamics at
      the true state to O(eps^2) *in the trig inputs only*)
  v3: increments computed entirely in f64 from the exact pair state,
      accumulated back into an exact two-float f32 pair (the mixed-state
      ceiling: what any f32-state scheme could at best achieve)
  v4: v2 + the p-side evaluation-point correction: the position flow the
      f32 solve RHS misses from the p low word, dq_corr = dt*K(q0)^-1 cp,
      Kahan-folded into q as a separate increment (one extra solve/step)

If v2 ~ v0 << v3-gap: the floor is distributed arithmetic rounding, not the
evaluation point, and is irreducible at f32 without double-float arithmetic.

    python scripts/exp_trig_correction.py [--steps 100000] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def chain_coeffs(n, dtype):
    # the bench config: hamilton_tpu.models.chain defaults
    masses = np.full(n, 1.0)
    lengths = np.full(n, 1.0)
    g = 5.0
    suff = np.cumsum(masses[::-1])[::-1]
    smax = np.minimum(suff[:, None], suff[None, :])
    cmat = lengths[:, None] * lengths[None, :] * smax
    gu = g * lengths * suff
    return jnp.asarray(cmat, dtype), jnp.asarray(gu, dtype)


def make_step(n, iters_p, iters_q, dtype, corrected, p_corrected=False):
    if iters_q < 1:
        # the kernel's iters_q=0 is the *predictor-factor* placement
        # (pallas_step.py:329-340), which this standalone does not model —
        # a (x,0) run here would measure an integrator nobody ships
        raise ValueError("exp_trig_correction models iters_q >= 1 only")
    cmat, gu = chain_coeffs(n, dtype)

    def trig(q, cq):
        s, c = jnp.sin(q), jnp.cos(q)
        if corrected and cq is not None:
            s, c = s + cq * c, c - cq * s
        return s, c

    def kmat(s, c):
        k = cmat * (c[:, :, None] * c[:, None, :] + s[:, :, None] * s[:, None, :])
        diag = jnp.broadcast_to(jnp.diag(cmat), s.shape)
        return k.at[
            :, jnp.arange(n), jnp.arange(n)
        ].set(diag)

    def solve(cho, rhs):
        return jax.scipy.linalg.cho_solve((cho, True), rhs[..., None])[..., 0]

    def dhdq(s, c, w):
        cw = cmat[None] * (c * w)[:, None, :]
        sw = cmat[None] * (s * w)[:, None, :]
        acc_c = jnp.sum(cw, axis=-1)
        acc_s = jnp.sum(sw, axis=-1)
        return gu[None] * s + w * (s * acc_c - c * acc_s)

    def increments(q0, p0, cq, cp, a_est, vdot_est, dt, half):
        s0, c0 = trig(q0, cq)
        cho0 = jnp.linalg.cholesky(kmat(s0, c0))
        ph = p0 - half * a_est
        a_last = a_est
        for _ in range(iters_p):
            w = solve(cho0, ph)
            a_last = dhdq(s0, c0, w)
            ph = p0 - half * a_last
        v0 = solve(cho0, ph)
        q1 = q0 + dt * v0 + (dt * half) * vdot_est
        v_last = v0
        for _ in range(iters_q):
            s1, c1 = trig(q1, cq)
            cho1 = jnp.linalg.cholesky(kmat(s1, c1))
            v_last = solve(cho1, ph)
            q1 = q0 + half * (v0 + v_last)
        s1, c1 = trig(q1, cq)
        cho1 = jnp.linalg.cholesky(kmat(s1, c1))
        w1 = solve(cho1, ph)
        b = dhdq(s1, c1, w1)
        dq = half * (v0 + v_last)
        dp = -half * (a_last + b)
        dq_corr = None
        if p_corrected and cp is not None:
            # first-order position-flow correction for the p low word the
            # f32 solve RHS cannot carry: v(p+cp) - v(p) = K(q0)^{-1} cp.
            # The result (~eps·|v|) is Kahan-folded into q separately so it
            # survives accumulation instead of rounding away against dq.
            dq_corr = dt * solve(cho0, cp)
        return dq, dp, b, (v_last - v0) / dt, dq_corr

    return increments


def hamiltonian64(n, q, p):
    cmat, gu = chain_coeffs(n, jnp.float64)
    s, c = jnp.sin(q), jnp.cos(q)
    k = cmat * (c[:, :, None] * c[:, None, :] + s[:, :, None] * s[:, None, :])
    diag = jnp.broadcast_to(jnp.diag(cmat), q.shape)
    k = k.at[:, jnp.arange(n), jnp.arange(n)].set(diag)
    v = jnp.linalg.solve(k, p[..., None])[..., 0]
    t = 0.5 * jnp.sum(p * v, axis=-1)
    # U = g·Σ m_i y_i = Σ_j gu_j·(1 − cos θ_j): keep the model's constant
    # offset so the |H0| normalization matches the bench's
    u = jnp.sum(gu[None] * (1.0 - jnp.cos(q)), axis=-1)
    return t + u


def kahan(x, c, d):
    y = d + c
    t = x + y
    return t, (x - t) + y


def run(mode, q0, p0, n, steps, chunk, dt, iters, composition=(1.0,)):
    iters_p, iters_q = iters
    f64 = mode == "v3"
    dtype = jnp.float64 if f64 else jnp.float32
    inc = make_step(
        n, iters_p, iters_q, dtype,
        corrected=mode in ("v2", "v4"),
        p_corrected=(mode == "v4"),
    )

    def step(state):
        q, cq, p, cp, a, vd = state
        for w in composition:
            dtc = dtype(w * dt)
            half = dtype(w * dt / 2)
            if f64:
                qe = q.astype(jnp.float64) + cq.astype(jnp.float64)
                pe = p.astype(jnp.float64) + cp.astype(jnp.float64)
                dq, dp, a, vd, _ = inc(qe, pe, None, None, a, vd, dtc, half)
                q1e, p1e = qe + dq, pe + dp
                q = q1e.astype(jnp.float32)
                p = p1e.astype(jnp.float32)
                cq = (q1e - q.astype(jnp.float64)).astype(jnp.float32)
                cp = (p1e - p.astype(jnp.float64)).astype(jnp.float32)
            else:
                dq, dp, a, vd, dq_corr = inc(q, p, cq, cp, a, vd, dtc, half)
                q, cq = kahan(q, cq, dq)
                p, cp = kahan(p, cp, dp)
                if dq_corr is not None:
                    q, cq = kahan(q, cq, dq_corr)
        return q, cq, p, cp, a, vd

    @jax.jit
    def run_chunk(state):
        return jax.lax.fori_loop(0, chunk, lambda _, s: step(s), state)

    @jax.jit
    def measure(state):
        q, cq, p, cp = state[:4]
        qe = q.astype(jnp.float64) + cq.astype(jnp.float64)
        pe = p.astype(jnp.float64) + cp.astype(jnp.float64)
        return hamiltonian64(n, qe, pe)

    if f64:
        a0 = jnp.zeros(p0.shape, jnp.float64)
        vd0 = jnp.zeros(q0.shape, jnp.float64)
    else:
        a0 = jnp.zeros_like(p0)
        vd0 = jnp.zeros_like(q0)
    state = (q0, jnp.zeros_like(q0), p0, jnp.zeros_like(p0), a0, vd0)
    h0 = measure(state)
    scale = float(jnp.max(jnp.abs(h0)))
    per_member = np.zeros(q0.shape[0])  # running per-member max drift
    t0 = time.perf_counter()
    n_chunks = steps // chunk
    for ci in range(n_chunks):
        state = run_chunk(state)
        d = np.asarray(jnp.abs(measure(state) - h0) / scale)
        per_member = np.maximum(per_member, d)
        if (ci + 1) % max(1, n_chunks // 10) == 0:
            print(
                f"  {mode} step {(ci + 1) * chunk:>7d} "
                f"max {per_member.max():.3e} med {np.median(per_member):.3e} "
                f"now {d.max():.3e} [{time.perf_counter() - t0:.0f}s]",
                flush=True,
            )
    return per_member.max(), float(np.median(per_member))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--links", type=int, default=20)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--iters", type=str, default="3,1")
    ap.add_argument("--modes", type=str, default="v0,v2,v3")
    ap.add_argument("--seed", type=int, default=0,
                    help="IC seed (run-to-run spread of the max/med "
                         "statistics is chaotic-trajectory noise)")
    ap.add_argument(
        "--composition", type=str, default="verlet",
        choices=["verlet", "yoshida4"],
    )
    args = ap.parse_args()
    iters = tuple(int(s) for s in args.iters.split(","))
    n = args.links
    if args.composition == "yoshida4":
        gamma = 2.0 ** (1.0 / 3.0)
        composition = (
            1.0 / (2.0 - gamma), -gamma / (2.0 - gamma), 1.0 / (2.0 - gamma),
        )
    else:
        composition = (1.0,)

    rng = np.random.default_rng(args.seed)
    base = np.full(n, 0.5)  # chain() theta0 default, at rest — bench ICs
    q0 = jnp.asarray(
        base + 0.01 * rng.standard_normal((args.batch, n)), jnp.float32
    )
    p0 = jnp.zeros((args.batch, n), jnp.float32)

    results = {}
    for mode in args.modes.split(","):
        print(f"mode {mode} ({args.composition}):", flush=True)
        results[mode] = run(
            mode, q0, p0, n, args.steps, args.chunk, args.dt, iters,
            composition=composition,
        )
    print(
        f"FINAL composition={args.composition} iters={iters} "
        f"batch={args.batch} steps={args.steps} seed={args.seed} "
        + " ".join(
            f"{k}_max={v[0]:.4e} {k}_med={v[1]:.4e}"
            for k, v in results.items()
        )
    )


if __name__ == "__main__":
    main()
