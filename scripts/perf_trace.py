#!/usr/bin/env python
"""Capture a jax.profiler trace of the leapfrog hot loop on the real TPU,
then print the per-op time breakdown from the trace's XLA op events.

    python scripts/perf_trace.py [--steps 30] [--batch 16384]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--method", default="leapfrog")
    ap.add_argument("--outdir", default="/tmp/jax_trace")
    args = ap.parse_args()

    from hamilton_tpu.integrators.fixed import make_stepper
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=20)
    system = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), ex.system)
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.asarray(ex.init_phase.q, np.float32)
                    + 0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))
    p = jnp.asarray(0.01 * rng.standard_normal((args.batch, 20)).astype(np.float32))

    st = make_stepper(system, args.method, iters=args.iters)

    @jax.jit
    def run(qq, pp):
        c0 = st.init(Phase(qq, pp))
        c = jax.lax.fori_loop(0, args.steps,
                              lambda i, c: st.step(c, jnp.float32(1e-3)), c0)
        return st.extract(c).q

    jax.block_until_ready(run(q, p))
    jax.block_until_ready(run(q, p))  # warm past first-exec slowdown
    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(run(q, p))

    # parse the trace proto (.xplane.pb) is painful; use the trace-event json
    time.sleep(1)
    files = glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("NO trace.json.gz produced; files:",
              glob.glob(os.path.join(args.outdir, "**", "*"), recursive=True))
        return
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)
    per_op = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e6  # us -> s
        args_d = ev.get("args") or {}
        # keep only device-side XLA op events
        if "run_id" in args_d or "correlation_id" in args_d or True:
            pid = ev.get("pid", 0)
            per_op[(pid, name)] += dur
    # heuristics: print the largest 60 buckets
    items = sorted(per_op.items(), key=lambda kv: -kv[1])[:60]
    for (pid, name), dur in items:
        print(f"{dur*1e3/args.steps:9.3f} ms/step  pid={pid}  {name[:110]}")
    # grouped by op-name prefix (strip trailing .N), device pids only
    groups = defaultdict(float)
    for (pid, name), dur in per_op.items():
        if name.startswith("$") or "(" in name or name.startswith("jit_"):
            continue
        groups[name.split(".")[0]] += dur
    print("--- grouped (device ops) ---")
    for name, dur in sorted(groups.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur*1e3/args.steps:9.3f} ms/step  {name}")
    # raw args of the heaviest copy/reshape/fusion events (shape metadata)
    print("--- heavy event metadata ---")
    seen = set()
    events = []
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        nm = ev.get("name", "")
        if not any(nm.startswith(p) for p in
                   ("copy", "reshape", "fusion", "convolution", "closed_call")):
            continue
        events.append(ev)
    events.sort(key=lambda e: -e.get("dur", 0))
    for ev in events:
        nm = ev["name"]
        if nm in seen:
            continue
        seen.add(nm)
        print(f"{ev.get('dur',0)/1e3:8.3f} ms  {nm}  args={json.dumps(ev.get('args', {}))[:400]}")
        if len(seen) >= 16:
            break


if __name__ == "__main__":
    main()
