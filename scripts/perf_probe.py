#!/usr/bin/env python
"""TPU hot-loop breakdown probe (chain-20, 16384 members, f32).

Times each constituent of the leapfrog step in a *dependent* chain (fori_loop
of N serialized calls inside one jit), so per-call numbers include the real
dependent-dispatch latency the hot loop pays.  Run serially on the real TPU:

    python scripts/perf_probe.py [--inner 50] [--batch 16384] [--probe NAME]

Each probe compiles exactly one graph; the first execution is discarded
(first-run ~8x slowdown through this environment's relay) and the best of 3
timed runs is reported.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch, n_links=20, dtype=jnp.float32):
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=n_links)
    system = jax.tree_util.tree_map(lambda a: a.astype(dtype), ex.system)
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        np.asarray(ex.init_phase.q, dtype=np.float32)
        + 0.01 * rng.standard_normal((batch, n_links)).astype(np.float32)
    )
    p = jnp.asarray(
        0.01 * rng.standard_normal((batch, n_links)).astype(np.float32)
    )
    return system, Phase(q, p)


def timed(name, fn, *args, inner=1):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn_j(*args))
    compile_s = time.perf_counter() - t0
    jax.block_until_ready(fn_j(*args))  # first-exec warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / inner
    print(json.dumps({
        "probe": name, "per_call_ms": round(per * 1e3, 3),
        "total_s": round(best, 3), "inner": inner,
        "compile_s": round(compile_s, 1),
    }), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--probe", default="all")
    args = ap.parse_args()

    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.mechanics import _dtdq, mass_matrix, q_factor
    from hamilton_tpu.ops import pallas_solve as ps
    from hamilton_tpu.ops.linalg import (
        _masked_cho_solve,
        _masked_cholesky,
        _spd_solve_unrolled,
        _unrolled_cho_solve,
        _unrolled_cholesky,
    )
    from hamilton_tpu.state import Phase

    system, ph = build(args.batch)
    n = ph.q.shape[-1]
    inner = args.inner
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "batch": args.batch, "n": n}), flush=True)

    k_mat = jax.jit(lambda q: mass_matrix(system, q))(ph.q)
    k_mat = jax.block_until_ready(k_mat)
    low = jax.block_until_ready(jax.jit(ps.cholesky_pallas)(k_mat))
    vec = ph.p

    def chain_dep(fn):
        """fori_loop of `inner` dependent calls: x <- normalize(fn(x))."""
        def run(x0, *rest):
            def body(i, x):
                y = fn(x, *rest)
                return y / (1.0 + 1e-30 * jnp.sum(y))  # keep dependence, no-op
            return jax.lax.fori_loop(0, inner, body, x0)
        return run

    wanted = set(args.probe.split(","))
    want = lambda name: "all" in wanted or name in wanted

    if want("step_leapfrog"):
        st = make_stepper(system, "leapfrog", iters=3)
        def steps(phq, php):
            c0 = st.init(Phase(phq, php))
            def body(i, c):
                return st.step(c, jnp.float32(1e-3))
            c = jax.lax.fori_loop(0, inner, body, c0)
            out = st.extract(c)
            return out.q
        timed("step_leapfrog_i3", steps, ph.q, ph.p, inner=inner)

    if want("step_gauss4"):
        st = make_stepper(system, "gauss4", iters=4)
        def steps_g(phq, php):
            c0 = st.init(Phase(phq, php))
            def body(i, c):
                return st.step(c, jnp.float32(1e-3))
            c = jax.lax.fori_loop(0, inner, body, c0)
            return st.extract(c).q
        timed("step_gauss4_i4", steps_g, ph.q, ph.p, inner=inner)

    if want("spd_solve"):
        timed("spd_solve_pallas", chain_dep(lambda x: ps.spd_solve_pallas(k_mat, x)),
              vec, inner=inner)

    if want("cholesky"):
        # dependent chain on the matrix: perturb diag by last solution
        def chol_dep(x0):
            def body(i, km):
                l_ = ps.cholesky_pallas(km)
                return km + 1e-30 * l_
            return jax.lax.fori_loop(0, inner, body, x0)
        timed("cholesky_pallas", chol_dep, k_mat, inner=inner)

    if want("cho_solve"):
        timed("cho_solve_pallas", chain_dep(lambda x: ps.cho_solve_pallas(low, x)),
              vec, inner=inner)

    if want("cho_solve_masked"):
        timed("cho_solve_masked", chain_dep(lambda x: _masked_cho_solve(low, x)),
              vec, inner=inner)

    if want("cho_solve_unrolled"):
        lowd, inv_diag = _unrolled_cholesky(k_mat)
        def cs_unrolled(x):
            return _unrolled_cho_solve(lowd, inv_diag, x)
        timed("cho_solve_unrolled", chain_dep(cs_unrolled), vec, inner=inner)

    if want("mass_matrix"):
        def mm_dep(q0):
            def body(i, q):
                km = mass_matrix(system, q)
                return q + 1e-30 * km[..., 0]
            return jax.lax.fori_loop(0, inner, body, q0)
        timed("jac_plus_K_einsum", mm_dep, ph.q, inner=inner)

    if want("vjp_sweep"):
        def vjp_dep(w0):
            def body(i, w):
                d = _dtdq(system, ph.q, w)
                return w + 1e-30 * d
            return jax.lax.fori_loop(0, inner, body, w0)
        timed("jac_u_vjp_sweep", vjp_dep, vec, inner=inner)

    if want("k_path"):
        # current hot path: J (fixed point dependence) → K einsum → K tiles
        # → fused solve kernel
        from hamilton_tpu.ops.pallas_solve import (
            from_vec_tiles,
            k_tiles_from_jacobian,
            spd_solve_tiles,
            to_vec_tiles,
        )

        j0 = jax.jit(lambda q: jax.vmap(system.jacobian)(q))(ph.q)
        j0 = jax.block_until_ready(j0)

        def k_path(x0):
            def body(i, x):
                j_dep = j0 + 1e-30 * x[:, None, :]
                kt = k_tiles_from_jacobian(j_dep, system.inertia)
                return from_vec_tiles(spd_solve_tiles(kt, to_vec_tiles(x)))
            return jax.lax.fori_loop(0, inner, body, x0)
        timed("k_einsum_tiles_solve", k_path, vec, inner=inner)

    if want("jac_solve"):
        # candidate: J → √M·J tiles → fused form-K+factor+solve kernel
        from hamilton_tpu.ops.pallas_solve import (
            from_vec_tiles,
            jac_tiles,
            spd_solve_jac_tiles,
            to_vec_tiles,
        )

        j0 = jax.jit(lambda q: jax.vmap(system.jacobian)(q))(ph.q)
        j0 = jax.block_until_ready(j0)
        m = j0.shape[1]

        def jac_path(x0):
            def body(i, x):
                j_dep = j0 + 1e-30 * x[:, None, :]
                jt = jac_tiles(j_dep, system.inertia)
                xt = spd_solve_jac_tiles(jt, to_vec_tiles(x), n, m)
                return from_vec_tiles(xt)
            return jax.lax.fori_loop(0, inner, body, x0)
        timed("jac_tiles_fused_solve", jac_path, vec, inner=inner)

    if want("q_factor"):
        def qf_dep(q0):
            def body(i, q):
                f = q_factor(system, q)
                return q + 1e-30 * f.grad_u
            return jax.lax.fori_loop(0, inner, body, q0)
        timed("q_factor_full", qf_dep, ph.q, inner=inner)


if __name__ == "__main__":
    main()
