"""Ensemble-scale adaptive integration on TPU (VERDICT r3 item 3).

batch_mode="shared" (lock-step controller, error norm maximized over the
batch) at B=1024/16384 on the chain-20 t<=1 problem, in f64 (GSL-parity
eps) and f32 (physics-level eps 1e-6).  Round-3 anchors: single f64
trajectory 31.7 s on-device vs 2.6 s host; B=8 shared 21.6 s.
Timing: dependent warm run first (compile + relay first-exec), then a
timed run from a perturbed IC (identical re-dispatch is memoized through
the relay), synced by a host transfer.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=1024)
ap.add_argument("--dtype", default="f64", choices=["f64", "f32"])
ap.add_argument("--eps", type=float, default=None)
args = ap.parse_args()

with jax.enable_x64(True):
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase
    from hamilton_tpu.integrators.evolve import evolve_ham

    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    eps = args.eps if args.eps is not None else (
        1.49012e-08 if args.dtype == "f64" else 1e-6)
    ex = chain(n_links=20)
    system = jax.tree_util.tree_map(lambda a: a.astype(dtype), ex.system)
    rng = np.random.default_rng(0)
    q0 = np.asarray(ex.init_phase.q, np.float64)

    def build(seed):
        jit = 0.01 * rng.standard_normal((args.batch, 20)) + seed * 1e-6
        return Phase(jnp.asarray(q0 + jit, dtype),
                     jnp.zeros((args.batch, 20), dtype))

    ts = jnp.asarray([0.0, 1.0], dtype)

    def run(ph):
        t0 = time.perf_counter()
        out, st = evolve_ham(system, ph, ts, batch_mode="shared",
                             eps_abs=eps, eps_rel=eps, return_stats=True)
        s = float(out.q[-1, 0, 0])  # host transfer = real sync
        el = time.perf_counter() - t0
        return el, st, out

    el_warm, _, _ = run(build(0))
    el, st, out = run(build(1))
    print(f"B={args.batch} {args.dtype} eps={eps:.3g} shared: "
          f"wall={el:.2f}s (warm incl compile {el_warm:.0f}s)  "
          f"steps={int(st['max_interval_steps'])} "
          f"failed={int(st['total_failed'])} "
          f"saturated={bool(st['saturated'])}", flush=True)
    print(f"member-trajectories/s: {args.batch/el:.1f}  "
          f"(host single f64 reference: ~0.38/s from BENCH_r03 "
          f"adaptive_cpu_single_s=2.6)", flush=True)
