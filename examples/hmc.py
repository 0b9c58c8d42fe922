#!/usr/bin/env python
"""Hamiltonian Monte Carlo on the framework's symplectic hot path.

HMC (Duane et al.; Neal, "MCMC using Hamiltonian dynamics",
arxiv 1206.1901) IS Hamiltonian simulation: proposals integrate
H(q, p) = ½ pᵀK⁻¹p + U(q) with a leapfrog and accept with
min(1, exp(−ΔH)) — the acceptance rate is a direct function of the
integrator's energy error, i.e. exactly the max|ΔH/H₀| this library's
symplectic family is built to keep small.

This demo runs B parallel chains as ONE framework ensemble:

* the target density π(q) ∝ exp(−U(q)) becomes a Cartesian `System`
  (identity coordinate map, unit inertia, `U = ½ qᵀ P q` with the
  precision matrix P in ``System.params`` — so a tempered or swept target
  is one `replace_params` away);
* each MCMC iteration refreshes p ~ N(0, I) and integrates L leapfrog
  steps on the batch-native stepper (`make_stepper`, (B, n) states — for
  this separable H the generalized-Verlet fixed points are exact at
  iters=(1, 1), recovering textbook leapfrog);
* `hamiltonian(system, phase)` supplies ΔH for the Metropolis test, all
  inside one jitted `lax.scan` over iterations.

Validation (rc 0): sample covariance of the pooled post-warmup draws
matches the analytic Σ = P⁻¹ entrywise, and the acceptance rate sits in
the healthy band — on a 3-D correlated Gaussian both are exactly
computable.

Usage:
    python examples/hmc.py                       # CPU
    python examples/hmc.py --chains 256 --iters 500
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--leapfrog-steps", type=int, default=16)
    ap.add_argument("--dt", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cov-tol", type=float, default=0.2)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import hamilton_tpu as ht
    from hamilton_tpu.integrators import make_stepper
    from hamilton_tpu.state import Phase

    # -- target: 3-D zero-mean Gaussian with strong correlation ----------
    n = 3
    cov = np.array([
        [1.0, 0.8, 0.3],
        [0.8, 1.5, 0.5],
        [0.3, 0.5, 0.8],
    ])
    prec = np.linalg.inv(cov)

    def coords(q, params):
        return q

    def potential(x, params):
        p_mat = params["prec"].astype(x.dtype)
        return 0.5 * jnp.einsum("...i,ij,...j->...", x, p_mat, x)

    system = ht.mk_system_cart(
        jnp.ones(n), coords, potential, n=n, name="hmc-gaussian",
        params={"prec": jnp.asarray(prec)},
    )

    # identity coords + unit masses: K = I, H separable, so the (1,1)
    # generalized-Verlet fixed points are exact textbook leapfrog
    st = make_stepper(system, "leapfrog", iters=(1, 1))
    dt = args.dt
    L = args.leapfrog_steps
    B = args.chains

    def hmc_iter(carry, key):
        q = carry
        kp, ku = jax.random.split(key)
        p0 = jax.random.normal(kp, q.shape, q.dtype)  # K = I: p ~ N(0, I)
        ph0 = Phase(q, p0)
        h0 = ht.hamiltonian(system, ph0)
        sc = jax.lax.fori_loop(
            0, L, lambda _, c: st.step(c, dt), st.init(ph0)
        )
        ph1 = st.extract(sc)
        dh = ht.hamiltonian(system, ph1) - h0
        accept = jax.random.uniform(ku, dh.shape) < jnp.exp(-dh)
        q1 = jnp.where(accept[:, None], ph1.q, q)
        return q1, (q1, accept)

    @jax.jit
    def run(q0, key):
        keys = jax.random.split(key, args.iters)
        _, (qs, accepts) = jax.lax.scan(hmc_iter, q0, keys)
        return qs, accepts  # (iters, B, n), (iters, B)

    # split ONCE into disjoint init/scan streams: split(key, 1)[0] is
    # bit-identical to split(key, iters)[0], so seeding q0 from it would
    # re-consume iteration 0's key (correlated init and first refresh)
    init_key, scan_key = jax.random.split(jax.random.PRNGKey(args.seed))
    q0 = jax.random.normal(init_key, (B, n))
    qs, accepts = run(q0, scan_key)

    acc = float(jnp.mean(accepts[args.warmup:]))
    draws = np.asarray(qs[args.warmup:]).reshape(-1, n)
    mean = draws.mean(axis=0)
    sample_cov = np.cov(draws.T)
    cov_err = np.max(np.abs(sample_cov - cov))

    print(f"chains={B} iters={args.iters} L={L} dt={dt}")
    print(f"acceptance rate: {acc:.3f}")
    print(f"posterior mean:  {np.array2string(mean, precision=3)} (true 0)")
    print("sample cov vs true (max abs err "
          f"{cov_err:.3f}, tol {args.cov_tol}):")
    print(np.array2string(sample_cov, precision=3))

    ok = (0.6 <= acc <= 0.999) and cov_err < args.cov_tol and (
        np.max(np.abs(mean)) < 0.15
    )
    if not ok:
        print("FAIL: sampler statistics out of tolerance")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
