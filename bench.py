#!/usr/bin/env python
"""Headline benchmark: ensemble throughput + long-horizon energy drift.

BASELINE.md targets: a 16k-member, 20-DOF (20-link chain, ``System 40 20``)
ensemble, 10⁵ steps, with ``max |ΔH/H₀| < 1e-6`` and >100× the throughput of
a single-CPU trajectory.  The metric is **member-steps/second** on the real
TPU, with ``vs_baseline`` the ratio against a single-trajectory CPU run of
the same physics (the reference's own operating point: one trajectory, one
CPU — SURVEY.md §2.4).

Prints exactly ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}``.

Phases (each independently fault-tolerant; f32 accelerator phases run
before the f64 attempts because a faulted f64 dispatch poisons the device):
  1. TPU f32 chain-20 ensemble over the FULL t=100 horizon (2e5 steps at
     dt=5e-4 — same simulated span as the round-3 1e-3×1e5 config, better
     drift AND throughput, docs/design.md round-4): the fused whole-step
     Pallas kernel (``leapfrog_fused`` (2,0) predictor-factor schedule,
     Kahan-compensated, 50-step in-VMEM factor-carry blocks;
     library-leapfrog fallback), executed as chunked dispatches — the
     headline throughput AND the on-TPU max|ΔH/H₀| (sampled every 1000
     steps during the same run in double-f32 over the closed forms,
     cross-validated vs f64).
  2. Roofline: exact jaxpr FLOP counts + VPU/HBM speed-of-light probes →
     ``fused_vpu_util`` / ``fused_hbm_util``.
  3. Margin datapoints: ``suzuki4_fused`` (2,0) — the measured order-4
     Pareto point — and the round-1..3 continuity anchor
     (``leapfrog_fused`` (2,1) at dt=1e-3 × 1e5 steps), both full-horizon
     with on-device drift.
  4. Parameter-sweep throughput: per-member masses/gravity through the
     fused kernel's runtime coefficient tiles (target: within ~2× of the
     shared-parameter headline), over the FULL horizon with its own drift
     datapoint (the runtime-operand mode is a distinct kernel variant).
  5. Fused-family datapoints: spherical + two-body through their
     ``FusedForms`` vs their generic tile path (the fused:tile ratio).
  6. Double-pendulum north-star config: 16k-member f32 throughput (fused
     kernel, library fallback) plus the FULL 1e5-step f64 gauss4 drift
     (cheap at n=2) on the host.
  7. Adaptive on-device: single + 8-member ``evolve_ham`` (shared and
     per-member controllers) in f64, timed vs the host CPU with parity —
     plus the ensemble-scale shared-controller datapoint (batched adaptive
     WINS at scale: B=16384 measured 450× host-serial in f64).
  8. Chain-20 f64 gauss4 drift over the FULL horizon (host fallback, B=4
     chunked ≈ 200 s; the accelerator is attempted first under a budget
     probe around its emulated f64).
  9. Single-trajectory CPU baselines: jax-CPU and the native C++ engine;
     vs_baseline uses the stronger of the two.

Note: first-compile latency through this environment's remote-compile
service is highly variable (30 s – 6 min for identical programs); the
phases each compile exactly one graph.

A hung accelerator backend (a wedged TPU tunnel) would stall the whole
bench at first device init — an outage the per-phase try/except cannot
catch.  ``main`` therefore probes the default backend in a subprocess
under a timeout first; if it is unresponsive the bench pins itself to the
host CPU at --quick shapes and reports ``accelerator_probe`` in extras, so
the driver always gets its one JSON line.
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import os
import subprocess
import sys
import time

# the experimental-platform WARNING would otherwise land in the driver's
# 2000-char stdout/stderr tail capture, eating the JSON line's budget
logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)
import warnings

# same reason: these two jnp-reduction warnings are ~900 bytes of stderr
warnings.filterwarnings(
    "ignore", message="Explicitly requested dtype float64"
)

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Output-line compaction.  The driver records only the LAST ~2000 characters
# of the bench's output and json-parses the JSON line it finds there —
# round 4's full-precision line outgrew that window and the official
# artifact lost the headline entirely (VERDICT r4 item 1b).  The contract:
#   * the FULL-precision record is written to BENCH_full.json next to this
#     script;
#   * stdout carries ONE compact line: floats at <=5 significant digits,
#     None values dropped, and the headline keys placed at the very END of
#     the line (a front-truncated tail then still ends with them);
#   * if the line still exceeds the budget, non-headline keys are dropped
#     in documented priority order (an ``omitted_keys`` count is emitted;
#     the dropped values remain in BENCH_full.json).
# tests/test_bench.py pins this behavior.
# ---------------------------------------------------------------------------

# never dropped; emitted LAST in this order (``vs_baseline`` ends the line)
PINNED_TAIL_KEYS = (
    "throughput_fused_solver",
    "throughput_group_unroll",
    "tpu_max_energy_drift_f32comp",
    "member_steps_per_sec",
    "metric",
    "value",
    "unit",
    "vs_baseline",
)

# drop-first classes (least important first).  Count/plumbing fields are
# matched by SUFFIX — a substring "_steps" test would also match every
# "*_member_steps_per_sec" rate (the round-5 bug this replaced).
DROP_CLASSES = (
    lambda k: "first_chunk_s" in k,
    lambda k: "elapsed_steady_s" in k,
    lambda k: "steady_chunks" in k,
    lambda k: "drift_sampler" in k,
    lambda k: "platform" in k,
    lambda k: "tile_member_steps" in k,  # the fused:tile RATIO survives
    lambda k: k.endswith("_steps") or k == "steps",
    lambda k: k.endswith("_batch") or k == "batch" or k.endswith("_b"),
    lambda k: k.endswith("_method") or k == "method",
    lambda k: k.endswith("_iters"),
    lambda k: k.endswith("_per_call"),
)

# never dropped while any unprotected key remains: the measured datapoints
# the round verdicts key on (rates, drifts, ratios, calibrated dts, notes)
PROTECTED_SUBSTRINGS = (
    "member_steps_per_sec",
    "single_steps_per_sec",
    "single_s",
    "traj_per_sec",
    "max_drift",
    "max_energy_drift",
    "_vs_",
    "_dt",
    "drift_note",
    "parity",
    "_error",
    "skipped",
    "clamped",
    "group_unroll",
    "fused_solver",
    "_util",
)
LINE_BUDGET = 1900  # the driver keeps the LAST ~2000 chars of output


def _round_sig(v, sig=5):
    if isinstance(v, float):
        if not math.isfinite(v):
            # bare NaN/Infinity is invalid JSON to strict parsers — a
            # diverged run must not cost the driver the whole artifact
            return str(v)
        if v == 0.0:
            return v
        return float(f"{v:.{sig}g}")
    return v


def compact_record(out, limit=LINE_BUDGET):
    """One json line <= ``limit`` chars: rounded floats, no Nones, headline
    keys pinned to the end, lowest-priority keys dropped if needed."""
    rec = {}
    for k, v in out.items():
        if v is None:
            continue
        if isinstance(v, str) and k.endswith("_error"):
            v = v[:90]  # full text lives in BENCH_full.json
        rec[k] = _round_sig(v)
    pinned = [k for k in PINNED_TAIL_KEYS if k in rec]
    rest = [k for k in rec if k not in PINNED_TAIL_KEYS]

    def drop_rank(k):
        # plumbing classes drop first; generic payload next; PROTECTED
        # datapoints only as a last resort (a DROP_CLASS match overrides
        # protection — e.g. tile rates despite containing
        # "member_steps_per_sec")
        for i, cls in enumerate(DROP_CLASSES):
            if cls(k):
                return (0, i)
        if any(p in k for p in PROTECTED_SUBSTRINGS):
            return (2, 0)
        return (1, 0)

    # within a rank, drop the longest entries first
    drop_order = sorted(
        rest, key=lambda k: (drop_rank(k), -len(json.dumps({k: rec[k]})))
    )
    omitted = 0
    while True:
        kept = [k for k in rest if k in rec]
        body = {k: rec[k] for k in kept}
        if omitted:
            body["omitted_keys"] = omitted
        body.update({k: rec[k] for k in pinned})
        line = json.dumps(body)
        if len(line) <= limit or not drop_order:
            return line
        del rec[drop_order.pop(0)]
        omitted += 1


def write_full_record(out, path=None):
    """Full-precision record to BENCH_full.json (next to this script)."""
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_full.json")
    try:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:  # pragma: no cover — never block the stdout line
        pass


def _host_pinned() -> bool:
    """True when this process is already pinned to the host cpu platform
    (the test suite's conftest, or a prior pin): there is no accelerator
    init to hang on, so the tunnel probe would be pure overhead."""
    return (getattr(jax.config, "jax_platforms", None) or "") == "cpu"


def _probe_accelerator(timeout_s: float = 600.0):
    """Return the default backend's platform string, or None if backend
    init is unresponsive.

    Runs in a SUBPROCESS so a hung init (e.g. a wedged TPU tunnel, observed
    blocking ``jax.devices()`` indefinitely) can be timed out without
    poisoning this process, which has not initialized its backends yet.
    """
    code = "import jax; print(jax.devices()[0].platform)"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    if proc.returncode != 0 or not proc.stdout.strip():
        return None
    return proc.stdout.strip().splitlines()[-1]


def _build(batch, dtype, n_links=20, fused_solver="dense"):
    from hamilton_tpu.models import chain
    from hamilton_tpu.state import Phase

    ex = chain(n_links=n_links, fused_solver=fused_solver)
    system = jax.tree_util.tree_map(lambda a: a.astype(dtype), ex.system)
    ph0 = ex.init_phase
    rng = np.random.default_rng(0)
    # spread initial conditions so members decorrelate (parameter-sweep shape)
    jitter = 0.01 * rng.standard_normal((batch, n_links)).astype(dtype)
    ph = Phase(
        jnp.asarray(np.asarray(ph0.q, dtype=dtype) + jitter),
        jnp.tile(jnp.asarray(ph0.p, dtype=dtype), (batch, 1)),
    )
    return system, ph


def _timed_chunked_run(args, system, ph, *, method, iters, dt, n_steps,
                       chunk_steps, steps_per_call, group_unroll=None):
    """One chunked compensated evolve with steady-chunk wall timing and
    on-device high-precision drift sampling — the shared measurement core
    of the throughput/margin/sweep phases (and scripts/probe_dthalf.py).

    The drift sampler prefers **double-f32** (``drift_dtype="df32"``,
    ops/df32.py: the system's closed forms in Dekker-pair arithmetic, ~2⁻⁴⁹
    pair roundoff at f32 VPU cost) over the round-3 emulated-f64 library
    evaluation, which measured ~8 ms/sample — the headline's last ~8%
    (docs/design.md round-3).  Systems without fused forms fall back to
    f64.  The df32 measurement is cross-validated against the f64 library
    H on the final state (``drift_sampler_xval`` — expect ≲1e-9; the two
    samplers agree because both read the SAME trajectory and the same
    parameter values).

    Chunk 0 pays compile + the relay's first-execution penalty and is
    excluded from the throughput (reported as ``first_chunk_s``) unless it
    is the only chunk.  Callers hold ``jax.enable_x64`` for the f64 anchor
    arithmetic either way.
    """
    from hamilton_tpu.ensemble import evolve_ensemble_chunked
    from hamilton_tpu.mechanics import hamiltonian

    drift_dtype = jnp.float64
    sampler = "f64"
    try:
        from hamilton_tpu.ops.df32 import fused_measure_h

        measure_df = fused_measure_h(system)  # raises if no closed forms
        drift_dtype = "df32"
        sampler = "df32"
    except ValueError:
        measure_df = None

    chunk_wall = []
    t_last = [time.perf_counter()]

    def on_chunk(ci, phase, drift):
        now = time.perf_counter()
        chunk_wall.append(now - t_last[0])
        t_last[0] = now

    if group_unroll is None:
        # group_unroll is a fused-kernel launch parameter; non-fused methods
        # reject it — the library fallback must not inherit the args default
        # (ADVICE r4 medium)
        group_unroll = (getattr(args, "group_unroll", 1)
                        if method.endswith("_fused") else 1)
    final, drift = evolve_ensemble_chunked(
        system, ph, dt, n_steps, chunk_steps=chunk_steps,
        method=method, iters=iters, compensated=True,
        drift_every=min(args.drift_every, chunk_steps),
        drift_dtype=drift_dtype, callback=on_chunk,
        steps_per_call=steps_per_call,
        group_unroll=group_unroll,
    )
    jax.block_until_ready(final.q)
    max_drift = float(jnp.max(drift))
    steady = chunk_wall[1:] if len(chunk_wall) > 1 else chunk_wall
    el = sum(steady)
    out = {
        # batch from the phase itself, not args.batch: callers may time a
        # differently-sized ensemble than the headline's
        "member_steps_per_sec": ph.q.shape[0] * chunk_steps * len(steady) / el,
        "max_drift": max_drift,
        "steps": n_steps,
        "first_chunk_s": round(chunk_wall[0], 1),
        "elapsed_steady_s": round(el, 3),
        "steady_chunks": len(steady),
        "drift_sampler": sampler,
    }
    if measure_df is not None:
        sys64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), system
        )
        h_df = measure_df(final)
        h_64 = hamiltonian(sys64, final.astype(jnp.float64))
        out["drift_sampler_xval"] = float(jnp.max(jnp.abs(h_df - h_64)))
    return out


def phase_throughput(args):
    """Headline: the FULL north-star horizon in one run — 16k members ×
    ``--steps`` (default 1e5) steps on the accelerator, executed as chunked
    dispatches (single very long dispatches can fault the relay), **with the
    energy drift measured on-device in f64 during the same run** (sampled
    every 1000 steps; trajectory stays f32, Kahan-compensated).

    The library pins its contractions to full f32 (the TPU default lowers
    dots to bf16 inputs, which breaks the 1e-6 drift bound — docs/design.md
    "Precision on TPU"), and the hot path forms K inside the Pallas kernel,
    so no precision override is needed here.  Throughput is reported from
    the steady-state chunks (chunk 0 pays compile + the relay's ~8×
    first-execution penalty and is excluded; its wall time is reported
    separately).  x64 is enabled only for the f64 drift measurement
    (measured free for the f32 hot loop).
    """
    chunk_steps = min(args.chunk_steps, args.steps)
    n_steps = (args.steps // chunk_steps) * chunk_steps

    def run(method, iters, spc):
        with jax.enable_x64(True):
            system, ph = _build(args.batch, jnp.float32,
                                fused_solver=args.fused_solver)
            return _timed_chunked_run(
                args, system, ph, method=method, iters=iters, dt=args.dt,
                n_steps=n_steps, chunk_steps=chunk_steps, steps_per_call=spc,
            )

    # headline path: the fused whole-step kernel (method="leapfrog_fused",
    # ops/pallas_step.py), multi-step blocks carrying the factor in VMEM —
    # falls back to the generic library leapfrog if the fused path is
    # unavailable for the config
    method, iters = args.method, args.iters
    spc = args.steps_per_call if method == "leapfrog_fused" else 1
    fallback_error = None
    try:
        r = run(method, iters, spc)
    except Exception as e:  # pragma: no cover
        fallback_error = f"{type(e).__name__}: {e}"[:200]
        method, iters, spc = "leapfrog", (2, 0), 1
        r = run(method, iters, spc)
    out = {
        "member_steps_per_sec": r["member_steps_per_sec"],
        "steps": n_steps,
        "batch": args.batch,
        "throughput_method": method,
        "throughput_iters": str(iters),
        "throughput_steps_per_call": spc,
        # solver/unroll reflect the run that was MEASURED: these two are
        # pinned tail keys that outlive the (droppable) throughput_method,
        # so on a library fallback they must not advertise the fused config
        "throughput_fused_solver": (
            args.fused_solver if method.endswith("_fused")
            else "library-fallback"
        ),
        "throughput_group_unroll": (
            args.group_unroll if method.endswith("_fused") else 1
        ),
        "elapsed_steady_s": r["elapsed_steady_s"],
        "steady_chunks": r["steady_chunks"],
        "chunk_steps": chunk_steps,
        "first_chunk_s": r["first_chunk_s"],
        "tpu_max_energy_drift_f32comp": r["max_drift"],
        "tpu_drift_steps": n_steps,
        "drift_sampler": r["drift_sampler"],
        "platform": jax.devices()[0].platform,
    }
    if "drift_sampler_xval" in r:
        out["drift_sampler_xval"] = r["drift_sampler_xval"]
    if fallback_error:
        out["fused_fallback_error"] = fallback_error
    return out


def phase_roofline(args, headline_rate):
    """Roofline/MFU accounting (VERDICT r3 item 4): how much of the chip the
    headline actually uses.

    Static side: the fused kernel's exact per-member-step FLOP count from
    its own jaxpr (``utils.roofline.fused_step_cost`` — the closed forms
    make this a count, not an estimate).  Measured side: elementwise-f32
    and HBM speed-of-light Pallas probes on the same device.  Combines
    them with the measured headline rate into ``fused_vpu_util`` /
    ``fused_hbm_util``.
    """
    from hamilton_tpu.utils.roofline import (
        fused_step_cost, hbm_peak_probe, vpu_peak_probe, vpu_trig_probe,
    )

    system, _ = _build(args.batch, jnp.float32,
                       fused_solver=args.fused_solver)
    cost = fused_step_cost(
        system, method="leapfrog_fused", iters=args.iters,
        steps_per_call=args.steps_per_call, compensated=True,
        batch=min(args.batch, 1024),
    )
    out = {
        "fused_flops_per_member_step": round(
            cost["flops_per_member_step"], 1
        ),
        "fused_transcendentals_per_member_step": round(
            cost["transcendentals_per_member_step"], 1
        ),
        "fused_bytes_per_member_step": round(
            cost["bytes_per_member_step"], 1
        ),
    }
    if jax.devices()[0].platform == "cpu":
        # the speed-of-light probes are Pallas kernels: no meaningful (or
        # compilable) CPU analog — report the static counts only
        out["roofline_probes"] = "skipped (cpu)"
        return out
    vpu = vpu_peak_probe()
    hbm = hbm_peak_probe()
    out["vpu_peak_probe_gflops"] = round(vpu / 1e9, 1)
    out["hbm_peak_probe_gbps"] = round(hbm / 1e9, 1)
    try:
        trig = vpu_trig_probe()
        out["vpu_trig_probe_gops"] = round(trig / 1e9, 2)
    except Exception as e:  # pragma: no cover
        trig = None
        out["trig_probe_error"] = f"{type(e).__name__}: {e}"[:120]
    if headline_rate:
        achieved = headline_rate * cost["flops_per_member_step"]
        out["fused_achieved_gflops"] = round(achieved / 1e9, 1)
        out["fused_vpu_util"] = round(achieved / vpu, 3)
        out["fused_hbm_util"] = round(
            headline_rate * cost["bytes_per_member_step"] / hbm, 4
        )
        if trig:
            # two-resource issue model: flops and transcendentals share
            # the VPU's issue slots serially, so occupancies ADD — this is
            # the honest utilization for a kernel whose ~61 sin/cos per
            # member-step each expand to ~15-20 VPU ops (round 5: the
            # flops-only fused_vpu_util understated the kernel's 0.54 as
            # "half idle" when the transcendental share fills most of the
            # rest)
            out["fused_issue_util"] = round(
                headline_rate * (
                    cost["flops_per_member_step"] / vpu
                    + cost["transcendentals_per_member_step"] / trig
                ), 3,
            )
    return out


def phase_margin(args):
    """Margin datapoints beyond the headline (VERDICT r2 item 4).

    What sets the ~6e-7 drift level was decomposed on host with a
    standalone closed-form stepper run in f32+Kahan vs f64-increments-on-
    an-exact-pair-state (scripts/exp_trig_correction.py; docs/design.md
    round-3 "what sets the drift level"): the headline leapfrog's level is
    **dt² truncation** — precision-independent (f64 increments measure the
    same 3.4e-7 at B=32), NOT an f32 rounding floor as the earlier journal
    claimed — while ``yoshida4_fused`` (3,2), whose truncation+residual is
    ~2e-9, exposes the true f32 rounding walk at ~2e-7/1e5 steps
    (trig-correction A/B shows it is increment-arithmetic rounding, with no
    cheap f32 repair).  Two datapoints follow:

    1. ``suzuki4_fused`` (2,0) at the headline shape and dt over the full
       horizon — the order-4 Pareto point (measured round-4: **3.17e-7 @
       48.9e6 member-steps/s**; Suzuki's small substep coefficients keep
       the cheap predictor-factor schedule converged where the triple
       jump's |w₀| ≈ 1.70 middle stage needs (3,2) — the y4(3,2) point was
       5.58e-7 @ 44.1e6, suzuki(2,1) 3.38e-7 @ 38.8e6, and suzuki(1,1)
       over-drifts at 1.91e-6.  A ≥1e8 order-4 fused point is NOT
       reachable by symmetric composition: even free fixed-point
       iterations cost ≥3 leapfrog-substeps ≈ 58e6 ceiling at the 174e6
       headline — the Pareto front is measured optimal here).
    2. **dt-margin**: since leapfrog is truncation-limited, dt=5e-4 over
       2e5 steps (the SAME physical horizon t=100, the same member-steps/s
       metric) cuts drift ~4× — the ≥5× under-bound datapoint at full
       headline throughput.  Host check: 9.1e-8 (f32) vs 8.7e-8 (f64) at
       B=32 — still truncation-limited, so the f32 walk stays below it.
    """
    def run(method, iters, dt, n_steps, chunk_steps, solver=None, gu=None):
        with jax.enable_x64(True):
            system, ph = _build(args.batch, jnp.float32,
                                fused_solver=solver or args.fused_solver)
            return _timed_chunked_run(
                args, system, ph, method=method, iters=iters, dt=dt,
                n_steps=n_steps, chunk_steps=chunk_steps,
                steps_per_call=args.steps_per_call, group_unroll=gu,
            )

    chunk_steps = min(args.chunk_steps, args.margin_steps)
    n_steps = (args.margin_steps // chunk_steps) * chunk_steps
    out = {}
    try:
        o4 = run("suzuki4_fused", (2, 0), 1e-3, n_steps, chunk_steps)
        out.update({
            "order4_method": "suzuki4_fused(2,0)",
            "order4_member_steps_per_sec": o4["member_steps_per_sec"],
            "order4_tpu_max_energy_drift_f32comp": o4["max_drift"],
            "order4_drift_steps": o4["steps"],
            "order4_first_chunk_s": o4["first_chunk_s"],
        })
    except Exception as e:  # pragma: no cover — phase stays fault-tolerant
        out["order4_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # round-1..3 continuity anchor: the exact-placement (2,1) schedule
        # at dt=1e-3 over 1e5 steps (the previous headline config).
        # group_unroll pinned to 1: the gu=1 rounds it anchors used that
        # launch geometry (ADVICE r4)
        anchor = run("leapfrog_fused", (2, 1), 1e-3, n_steps,
                     chunk_steps, solver="dense", gu=1)
        out.update({
            "anchor21_member_steps_per_sec": anchor["member_steps_per_sec"],
            "anchor21_tpu_max_energy_drift_f32comp": anchor["max_drift"],
            "anchor21_drift_steps": anchor["steps"],
            "anchor21_dt": 1e-3,
            "anchor21_first_chunk_s": anchor["first_chunk_s"],
        })
    except Exception as e:  # pragma: no cover — phase stays fault-tolerant
        out["anchor21_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def phase_sweep(args):
    """Parameter-sweep throughput (VERDICT r2 item 1 'done' criterion): the
    same 16k×chain-20 ensemble with PER-MEMBER masses/gravity — the fused
    kernel in runtime-operand mode (coefficient tiles computed at init and
    carried with the state).  Target: within ~2× of the shared-parameter
    headline throughput.

    Runs the FULL ``--sweep-steps`` horizon (default 1e5, like the
    headline): the runtime-operand mode is a numerically distinct kernel
    variant, and drift is only trustworthy at the target horizon
    (docs/design.md long-horizon caveat) — the extra chunks cost seconds,
    the compile dominates either way.
    """
    chunk_steps = min(args.chunk_steps, args.sweep_steps)
    n_steps = (args.sweep_steps // chunk_steps) * chunk_steps
    with jax.enable_x64(True):
        system, ph = _build(args.batch, jnp.float32,
                            fused_solver=args.fused_solver)
        rng = np.random.default_rng(7)
        n = ph.q.shape[1]
        sysb = system.replace_params({
            "masses": jnp.asarray(
                1.0 + 0.05 * rng.standard_normal((args.batch, n)),
                dtype=jnp.float32,
            ),
            "lengths": jnp.broadcast_to(
                system.params["lengths"].astype(jnp.float32), (args.batch, n)
            ),
            "gravity": jnp.asarray(
                5.0 + 0.1 * rng.standard_normal(args.batch), dtype=jnp.float32
            ),
        })
        r = _timed_chunked_run(
            args, sysb, ph, method="leapfrog_fused", iters=args.iters,
            dt=args.dt, n_steps=n_steps, chunk_steps=chunk_steps,
            steps_per_call=args.steps_per_call,
        )
    return {
        "sweep_member_steps_per_sec": r["member_steps_per_sec"],
        "sweep_max_energy_drift_f32comp": r["max_drift"],
        "sweep_steps": n_steps,
        "sweep_first_chunk_s": r["first_chunk_s"],
    }


# Per-family calibrated dt for the <1e-6 drift bound at the t=100 horizon
# (VERDICT r4 item 3): the drift level is dt² truncation (precision-
# independent, docs/design.md round-3), so each family gets the dt the
# full-horizon host calibration chose with ≥2× margin
# (scripts/calibrate_family_dt.py; measured values in docs/performance.md).
# The bench runs each family's fused kernel at ITS dt over the SAME t=100
# simulated horizon and reports the on-TPU drift.
FAMILY_DT = {
    "spherical": 2.5e-4,  # host 1e-3: 3.3e-6, 5e-4: 1.1e-6, 2.5e-4: 5.2e-7
    "twobody": 2.5e-4,    # f32 floor — see TWOBODY_DRIFT_NOTE
    "spring": 1e-3,       # host 1e-3: 4.6e-7 (already 2.2x margin)
    "room": 2.5e-4,       # host 1e-3: 5.1e-6, 2.5e-4: 5.7e-7
}

# Two-body Kepler does NOT reach <1e-6 in plain f32: the drift is
# precision-limited, not dt²-limited — the host calibration plateaus at
# ~1.5-1.7e-6 for dt ≤ 2.5e-4 (jittered/eccentric members; iteration
# schedule irrelevant), while the SAME config in f64 measures 3.7e-7
# (truncation) and a circular f32 ensemble holds 7.0e-7.  Eccentric
# members' pericenter passes amplify f32 state rounding of (r, p_r); the
# bound needs f64 or the adaptive path there (docs/performance.md).  The
# bench emits this note next to the datapoint so the >1e-6 value reads as
# the measured f32 floor, not a failed target.
TWOBODY_DRIFT_NOTE = "f32 floor (eccentric Kepler); f64@same dt: 3.7e-7"


def phase_families(args):
    """Non-chain fused-family datapoints: four families through their
    declarative ``FusedForms`` at the ensemble batch, each at its
    CALIBRATED dt (:data:`FAMILY_DT`) over the full t=100 horizon with
    on-device df32 drift — plus the fused:tile throughput ratio for
    spherical/two-body (the ~10× cliff the fused family removes for models
    outside the chain; the tile-path reference runs a short horizon since
    its per-step cost is what is being measured).
    """
    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.models import room, spherical_pendulum, spring, two_body
    from hamilton_tpu.state import Phase

    out = {}
    # the SAME simulated horizon as the chain phases (steps × dt; t=100 at
    # the defaults) — a hardcoded 1e-3 conversion would silently decouple
    # the family horizon from --steps/--dt overrides
    horizon_t = args.steps * args.dt
    rng = np.random.default_rng(11)

    def build_phase(ex, scale):
        # the example's own physical initial phase (two-body needs its
        # angular momentum — a zero-p ensemble falls into the 1/r pole),
        # jittered in q to decorrelate members
        ph0 = ex.init_phase
        n = ph0.q.shape[-1]
        q = np.asarray(ph0.q, np.float32) + scale * rng.standard_normal(
            (args.batch, n)
        ).astype(np.float32)
        p = np.broadcast_to(np.asarray(ph0.p, np.float32), (args.batch, n))
        return Phase(jnp.asarray(q, jnp.float32), jnp.asarray(p.copy()))

    def timed_run(system, ph, method, iters, dt, n_steps, spc):
        # dense drift sampling (every 1000 steps): a single end-of-run
        # sample under-reads the oscillating max by ~2.3× (journal); the
        # df32 sampler makes dense sampling ~free on the fused path
        de = min(1000, n_steps)
        de = max((de // spc) * spc, spc)
        with jax.enable_x64(True):
            final, drift = evolve_ensemble_final(
                system, ph, dt, n_steps, method=method, iters=iters,
                compensated=True, drift_every=de,
                drift_dtype="df32" if method == "leapfrog_fused" else None,
                steps_per_call=spc,
            )
            float(final.q[0, 0])  # host sync (relay: block_until_ready lies)
            ph2 = Phase(ph.q + 1e-6, ph.p)  # distinct value: no memoized hit
            t0 = time.perf_counter()
            final, drift = evolve_ensemble_final(
                system, ph2, dt, n_steps, method=method, iters=iters,
                compensated=True, drift_every=de,
                drift_dtype="df32" if method == "leapfrog_fused" else None,
                steps_per_call=spc,
            )
            float(final.q[0, 0])
            el = time.perf_counter() - t0
        rate = ph.q.shape[0] * n_steps / el
        return rate, (float(jnp.max(drift)) if drift is not None else None)

    for name, ex, scale, ratio in (
        ("spherical", spherical_pendulum(), 0.05, True),
        ("twobody", two_body(), 0.02, True),
        ("spring", spring(), 0.02, False),
        ("room", room(), 0.05, False),
    ):
        try:
            sys32 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), ex.system
            )
            ph = build_phase(ex, scale)
            dt = FAMILY_DT[name]
            steps_f = max(int(round(horizon_t / dt)), args.steps_per_call)
            steps_f = (steps_f // args.steps_per_call) * args.steps_per_call
            fused, drift = timed_run(sys32, ph, "leapfrog_fused", args.iters,
                                     dt, steps_f, args.steps_per_call)
            out[f"{name}_fused_member_steps_per_sec"] = fused
            out[f"{name}_dt"] = dt
            if drift is not None:
                out[f"{name}_fused_max_drift"] = drift
            if name == "twobody":
                # >1e-6 here is the measured f32 floor, not a failed
                # target — see FAMILY_DT/TWOBODY_DRIFT_NOTE above
                out["twobody_drift_note"] = TWOBODY_DRIFT_NOTE
            if ratio:
                steps_t = max(min(steps_f // 10, 2_000), 100)
                tile, _ = timed_run(sys32, ph, "leapfrog", args.iters, dt,
                                    steps_t, 1)
                out[f"{name}_tile_member_steps_per_sec"] = tile
                out[f"{name}_fused_vs_tile"] = round(fused / tile, 1)
        except Exception as e:  # pragma: no cover — per-family tolerance
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:120]
    return out


def phase_chain40(args):
    """SURVEY's stress config (``System 40 20`` — the 20-link chain doubled):
    does the O(n) semiseparable solver's edge over the dense O(n³) kernel
    scale with n, and where does VMEM top out (VERDICT r4 item 8)?

    Runs the fused kernel at 40 links, headline dt/schedule, over a short
    horizon (throughput is the point; the drift lever transfers — dt²
    truncation).  Reports semiseparable member-steps/s, the dense ratio,
    and the group_unroll actually used (u·n > 80 rides the raised
    scoped-VMEM cap, ops/pallas_step.py ``_call``)."""
    steps = min(args.steps, 20_000)
    chunk_steps = min(args.chunk_steps, steps)
    n_steps = (steps // chunk_steps) * chunk_steps
    out = {}

    # steps_per_call=10 at n=40: the unrolled whole-step program at spc=50
    # reaches ~7 MB of MLIR and the remote compile helper is OOM-killed
    # (SIGKILL); spc=10 keeps the program ~5x smaller while still
    # amortizing the factor carry (measured round 5: semiseparable u=1
    # spc=10 compiles in ~24 min and runs 168e6 member-steps/s at 2.0e-7
    # drift over 2e4 steps)
    spc = min(args.steps_per_call, 10)

    def run(solver, gu, spc_):
        with jax.enable_x64(True):
            system, ph = _build(args.batch, jnp.float32, n_links=40,
                                fused_solver=solver)
            return _timed_chunked_run(
                args, system, ph, method="leapfrog_fused", iters=args.iters,
                dt=args.dt, n_steps=n_steps, chunk_steps=chunk_steps,
                steps_per_call=spc_, group_unroll=gu,
            )

    semi = None
    attempted = False
    for gu in (2, 1):
        if args.batch % (1024 * gu):
            continue
        attempted = True
        try:
            semi = run("semiseparable", gu, spc)
            out["chain40_group_unroll"] = gu
            break
        except Exception as e:  # pragma: no cover
            out["chain40_semi_error"] = f"{type(e).__name__}: {e}"[:120]
    if not attempted:  # pragma: no cover — no silent gaps in the artifact
        out["chain40_skipped"] = (
            f"batch {args.batch} is not a multiple of 1024"
        )
        return out
    if semi is not None:
        out["chain40_semiseparable_member_steps_per_sec"] = (
            semi["member_steps_per_sec"]
        )
        out["chain40_max_drift"] = semi["max_drift"]
        out["chain40_steps"] = n_steps
        out.pop("chain40_semi_error", None)
    # the dense O(n³) kernel at n=40 unrolls ~11k multiply terms per
    # factor — expected to exceed the remote compile helper's memory even
    # at spc=1; a failure here is itself the datapoint (the structured
    # solver is the only practical fused kernel at 40 links)
    try:
        dense = run("dense", 1, 1)
        out["chain40_dense_member_steps_per_sec"] = (
            dense["member_steps_per_sec"]
        )
        if semi is not None:
            out["chain40_semi_vs_dense"] = round(
                semi["member_steps_per_sec"]
                / dense["member_steps_per_sec"], 2
            )
    except Exception as e:  # pragma: no cover
        out["chain40_dense_error"] = f"{type(e).__name__}: {e}"[:120]
    return out


def phase_adaptive(args):
    """Adaptive path on the accelerator (VERDICT r2 item 7): single and
    8-member ``evolve_ham`` (shared + per-member controllers) on-device in
    f64 (GSL's eps = 1.49e-08 is below f32 resolution, so f64 — emulated on
    TPU — is the only meaningful on-device mode), timed against the host CPU
    running the identical computation, with trajectory parity recorded.
    """
    from hamilton_tpu.integrators.evolve import evolve_ham
    from hamilton_tpu.state import Phase as _Phase

    out = {}
    ts = jnp.linspace(0.0, 1.0, 11)
    with jax.enable_x64(True):
        system, ph8 = _build(8, jnp.float64)
        single = _Phase(ph8.q[0], ph8.p[0])
        cpu = jax.devices("cpu")[0]

        def timed(tag, device, fn, *a, **kw):
            import contextlib

            ctx = (jax.default_device(device)
                   if device is not None else contextlib.nullcontext())
            with ctx:
                res = fn(*a, **kw)
                float(res.q.reshape(-1)[0])  # host transfer: the only real
                # sync through the relay (block_until_ready returns early)
                t0 = time.perf_counter()
                # perturb the IC so the re-dispatch can't be served memoized
                a2 = tuple(
                    _Phase(x.q + 1e-9, x.p) if isinstance(x, _Phase) else x
                    for x in a
                )
                res = fn(*a2, **kw)
                float(res.q.reshape(-1)[0])
                out[tag] = round(time.perf_counter() - t0, 4)
            return res

        ref = timed("adaptive_cpu_single_s", cpu, evolve_ham, system, single, ts)
        dev = timed("adaptive_tpu_single_s", None, evolve_ham, system, single, ts)
        out["adaptive_tpu_parity_vs_cpu"] = float(
            jnp.max(jnp.abs(dev.q - ref.q))
        )
        timed("adaptive_tpu_8shared_s", None, evolve_ham, system, ph8, ts,
              batch_mode="shared")
        timed("adaptive_tpu_8pm_s", None, evolve_ham, system, ph8, ts,
              batch_mode="per_member")
        # Ensemble SCALE (VERDICT r3 item 3): the lock-step shared controller
        # amortizes the batch — B=1024 f64 chain-20 over t≤1 measured 24.2 s
        # on the v5e (42 member-trajectories/s ≈ 110× the host's 0.38/s
        # single-trajectory rate; docs/design.md round-4).  The bench carries
        # a smaller B so the phase stays minutes, scaled by the same law.
        if jax.devices()[0].platform != "cpu":
            b_scale = max(256, min(args.batch // 16, 1024))
            system_s, ph_s = _build(b_scale, jnp.float64)
            timed("adaptive_tpu_batched_s", None, evolve_ham, system_s, ph_s,
                  jnp.asarray([0.0, 1.0], jnp.float64), batch_mode="shared")
            out["adaptive_tpu_batched_b"] = b_scale
            out["adaptive_batched_traj_per_sec"] = round(
                b_scale / out["adaptive_tpu_batched_s"], 2
            )
            if out.get("adaptive_cpu_single_s"):
                # batched wins when traj/s exceeds the host's 1/single_s
                out["adaptive_batched_vs_host_serial"] = round(
                    out["adaptive_batched_traj_per_sec"]
                    * out["adaptive_cpu_single_s"], 1
                )
            # ensemble-scale 16k datapoints (VERDICT r4 item 4): the
            # journal's strongest adaptive results (B=16384 shared
            # controller: 171.7 traj/s f64 = 450× host-serial; 791/s f32 at
            # eps=1e-6) lived only in prose — put them in the artifact.
            # Budget-guard by projecting from the measured b_scale rate;
            # scaling is SUBLINEAR in batch (r4 measured 4.1× better than
            # linear from B=1024 to 16384 — wider batches amortize the
            # lock-step controller), so project at /3 conservatively.
            b16 = max(args.batch, 4096)
            # "_members" (not "_b"): the compact line's endswith("_b")
            # drop-class must not remove the size that qualifies the
            # "16k"-named keys when --batch != 16384
            out["adaptive_batched16k_members"] = b16
            projected = out["adaptive_tpu_batched_s"] * (b16 / b_scale) / 3.0
            if projected < 480.0:
                try:
                    system16, ph16 = _build(b16, jnp.float64)
                    timed("adaptive_batched16k_f64_s", None, evolve_ham,
                          system16, ph16,
                          jnp.asarray([0.0, 1.0], jnp.float64),
                          batch_mode="shared")
                    out["adaptive_batched16k_f64_traj_per_sec"] = round(
                        b16 / out["adaptive_batched16k_f64_s"], 1
                    )
                    if out.get("adaptive_cpu_single_s"):
                        out["adaptive_batched16k_vs_host_serial"] = round(
                            out["adaptive_batched16k_f64_traj_per_sec"]
                            * out["adaptive_cpu_single_s"], 1
                        )
                except Exception as e:  # pragma: no cover
                    out["adaptive_16k_error"] = f"{type(e).__name__}: {e}"[:120]
                try:
                    # f32 mode: GSL's 1.49e-8 eps is below f32 resolution, so
                    # the meaningful f32 operating point is eps=1e-6
                    system32, ph32 = _build(b16, jnp.float32)
                    timed("adaptive_batched16k_f32_s", None, evolve_ham,
                          system32, ph32,
                          jnp.asarray([0.0, 1.0], jnp.float32),
                          batch_mode="shared", eps_abs=1e-6, eps_rel=1e-6)
                    out["adaptive_batched16k_f32_traj_per_sec"] = round(
                        b16 / out["adaptive_batched16k_f32_s"], 1
                    )
                except Exception as e:  # pragma: no cover
                    out["adaptive_16k_f32_error"] = (
                        f"{type(e).__name__}: {e}"[:120]
                    )
            else:
                out["adaptive_16k_skipped"] = (
                    f"projected {projected:.0f}s over budget"
                )
        out["adaptive_platform"] = jax.devices()[0].platform
    return out


def phase_drift(args):
    """f64 gauss4 drift over the full horizon.

    Energy drift is a property of the integrator + precision, not the chip;
    f64 is emulated/unsupported on some TPU backends (this environment's
    faults with a device error), so fall back to host CPU with a smaller
    ensemble when the accelerator can't run f64.
    """
    from hamilton_tpu.ensemble import evolve_ensemble_final

    import contextlib

    def run(batch, device, budget_s=None):
        ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
        with jax.enable_x64(True), ctx:
            system, ph = _build(batch, jnp.float64)

            def fn(p, n):
                return evolve_ensemble_final(
                    system, p, 1e-3, n, method="gauss4",
                    iters=6, track_drift=True, drift_every=1000,
                )[1]

            fn_j = jax.jit(fn, static_argnums=1)
            if budget_s is not None:
                # probe: f64 is emulated on some TPUs at ~140 ms/step — bail
                # to the fallback before committing to a multi-hour dispatch.
                # The probe itself must be tiny (200 steps ≈ 30 s worst case).
                probe = jax.jit(
                    lambda p: evolve_ensemble_final(
                        system, p, 1e-3, 200, method="gauss4",
                        iters=6, track_drift=True, drift_every=200,
                    )[1]
                )
                jax.block_until_ready(probe(ph))
                t0 = time.perf_counter()
                jax.block_until_ready(probe(ph))
                projected = (time.perf_counter() - t0) / 200 * args.drift_steps
                if projected > budget_s:
                    raise RuntimeError(
                        f"f64 on this device projects to {projected:.0f}s "
                        f"for {args.drift_steps} steps; over budget"
                    )
            drift = fn_j(ph, args.drift_steps)
            jax.block_until_ready(drift)
            return float(jnp.max(drift))

    # f64 on this TPU is emulated at ~140 ms/step for the chain-20 config —
    # the full 1e5-step horizon would take hours there, and very long single
    # dispatches can fault the relay.  Attempt the accelerator under a
    # budget probe; the standing path is the HOST fallback, which since
    # round 3 runs the FULL horizon (B=4 chunked f64 gauss4 measures ~500
    # steps/s on this host → ~200 s for 1e5 steps) instead of the round-2
    # 2e4-step cap-and-extrapolate.
    steps = min(args.drift_steps, 20_000)
    args_steps, args.drift_steps = args.drift_steps, steps
    try:
        try:
            value = run(args.drift_batch, None, budget_s=300.0)
            platform = jax.devices()[0].platform
            batch = args.drift_batch
        except Exception:
            args.drift_steps = args_steps
            steps = args.drift_steps
            batch = min(args.drift_batch, 4)
            value = _host_full_horizon_drift(args, batch)
            platform = "cpu-fallback"
    finally:
        args.drift_steps = args_steps
    return {
        "max_energy_drift": value,
        "drift_steps": steps,
        "drift_batch": batch,
        "drift_platform": platform,
    }


def _host_full_horizon_drift(args, batch):
    """Chain-20 f64 gauss4 drift over the FULL horizon on the host CPU,
    executed as chunked dispatches (the resumable driver)."""
    from hamilton_tpu.ensemble import evolve_ensemble_chunked

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        system, ph = _build(batch, jnp.float64)
        chunk = min(10_000, args.drift_steps)
        n_steps = (args.drift_steps // chunk) * chunk
        _, drift = evolve_ensemble_chunked(
            system, ph, 1e-3, n_steps, chunk_steps=chunk,
            method="gauss4", iters=6, drift_every=1000,
        )
        jax.block_until_ready(drift)
        return float(jnp.max(drift))


def phase_double_pendulum(args):
    """BASELINE north-star config: 16k-member double-pendulum ensemble.

    Throughput on the accelerator (f32, symplectic), plus the FULL
    1e5-step f64 gauss4 energy drift — the n=2 dynamics use the closed-form
    2×2 solve, so the full-horizon f64 run costs seconds on the host.
    """
    from hamilton_tpu.ensemble import evolve_ensemble_final
    from hamilton_tpu.models import double_pendulum
    from hamilton_tpu.state import Phase

    out = {}
    ex = double_pendulum()
    rng = np.random.default_rng(1)

    def build(batch, dtype):
        system = jax.tree_util.tree_map(lambda a: a.astype(dtype), ex.system)
        jitter = 0.01 * rng.standard_normal((batch, 2)).astype(dtype)
        ph = Phase(
            jnp.asarray(np.asarray(ex.init_phase.q, dtype=dtype) + jitter),
            jnp.tile(jnp.asarray(ex.init_phase.p, dtype=dtype), (batch, 1)),
        )
        return system, ph

    # throughput: 16k f32 on the default device (fused whole-step kernel,
    # library fallback — the DP is the n=2 serial-chain family member)
    system, ph = build(args.batch, jnp.float32)

    def make_run(method, iters, spc=1, gu=1):
        return jax.jit(
            lambda p, n: evolve_ensemble_final(
                system, p, 1e-3, n, method=method, iters=iters,
                track_drift=False, drift_every=n, steps_per_call=spc,
                group_unroll=gu,
            )[0],
            static_argnums=1,
        )

    n = 10_000  # dp steps are much cheaper than chain-20; 10k suffices
    try:
        gu = args.group_unroll if args.batch % (1024 * args.group_unroll) == 0 else 1
        run = make_run("leapfrog_fused", (2, 1), spc=50, gu=gu)
        jax.block_until_ready(run(ph, n))  # compile
        out["dp_method"] = "leapfrog_fused"
    except Exception as e:  # pragma: no cover
        out["dp_fused_fallback_error"] = f"{type(e).__name__}: {e}"[:160]
        run = make_run("leapfrog", 3)
        jax.block_until_ready(run(ph, n))
        out["dp_method"] = "leapfrog"
    jax.block_until_ready(run(ph, n))  # first-execution warmup (see above)
    # single 10k-step dispatches carry ~25 ms relay overhead + timing
    # jitter (r4 recorded 3.15e9, r5 1.92e9 on identical code) — time
    # three dispatches on DISTINCT operand values (identical re-dispatches
    # return memoized through the relay) and report the best
    best = None
    for rep in range(3):
        ph_r = Phase(ph.q + 1e-6 * (rep + 1), ph.p)
        t0 = time.perf_counter()
        res = run(ph_r, n)
        float(res.q[0, 0])  # host transfer: the only real sync (relay)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    out["dp_member_steps_per_sec"] = args.batch * n / best

    # full-horizon f64 drift on the host (north-star correctness bound)
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        system64, ph64 = build(64, jnp.float64)
        _, drift = jax.jit(
            lambda p: evolve_ensemble_final(
                system64, p, 1e-3, args.dp_drift_steps, method="gauss4",
                iters=6, drift_every=1000,
            )
        )(ph64)
        jax.block_until_ready(drift)
        out["dp_max_energy_drift_f64"] = float(jnp.max(drift))
        out["dp_drift_steps"] = args.dp_drift_steps
    return out


def phase_cpu_baseline(args):
    """Single-trajectory steps/sec on the host CPU — the reference's
    operating point (one trajectory, one CPU).  Two baselines are measured
    and the STRONGER one is used for ``vs_baseline``:

    * the jax-CPU path (AD-derived dynamics, like the reference's ad-package
      workflow), and
    * the native C++ engine with the hand-derived analytic chain RHS
      (``native/hamode.cpp``) — typically ~14× faster and the toughest
      honest single-CPU number.
    """
    from hamilton_tpu.ensemble import evolve_ensemble_final

    out = {}
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        system, ph = _build(1, jnp.float32)
        # single-trajectory: the generic library leapfrog (the fused kernel
        # is an ensemble path — it needs register-tile batches)
        run = jax.jit(
            lambda p, n: evolve_ensemble_final(
                system, p, 1e-3, n, method="leapfrog", iters=(2, 0),
                track_drift=False, drift_every=n,
            )[0],
            static_argnums=1,
        )
        jax.block_until_ready(run(ph, 100))
        n = 2000
        t0 = time.perf_counter()
        jax.block_until_ready(run(ph, n))
        el = time.perf_counter() - t0
    out["cpu_single_steps_per_sec"] = n / el
    try:
        from hamilton_tpu import native as native_mod

        if native_mod.available():
            y0 = np.concatenate([np.full(20, 0.5), np.zeros(20)])
            n_nat = 5000
            t0 = time.perf_counter()
            native_mod.chain_ensemble_fixed_steps(
                np.ones(20), y0[None, :], 1e-3, n_nat
            )
            el = time.perf_counter() - t0
            out["native_single_steps_per_sec"] = n_nat / el
    except Exception as e:  # pragma: no cover
        out["native_baseline_error"] = f"{type(e).__name__}: {e}"[:120]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--chunk-steps", type=int, default=10_000)
    ap.add_argument("--warm-steps", type=int, default=50)
    # density of the cond-guarded f64 H evaluations inside the hot loop;
    # ~8 ms each on-device, the headline's ~8% (docs/design.md round-3)
    ap.add_argument("--drift-every", type=int, default=1000)
    ap.add_argument("--drift-steps", type=int, default=100_000)
    ap.add_argument("--drift-batch", type=int, default=1024)
    ap.add_argument("--dp-drift-steps", type=int, default=100_000)
    # headline method: the fused whole-step Pallas kernel (exact warm-started
    # fixed points, 0.139 ms/step at 16384×20 vs 0.40 for the library path —
    # docs/design.md "Fused whole-step kernel"); phase_throughput falls back
    # to the library leapfrog if the fused path errors.
    ap.add_argument("--method", default="leapfrog_fused")

    def iters_arg(s):
        return tuple(int(x) for x in s.split(",")) if "," in s else int(s)

    # "2,1" for the fused kernel = warm-started exact iterations.  With the
    # in-block factor carry the exact mode is the right default: its carried
    # factor is computed at precisely the next q0 (zero staleness), holding
    # the FULL-horizon drift at 5.6e-7 @1e5 — while Gauss-Seidel "2,0",
    # whose carried factor is doubly stale under the carry, measured
    # 1.3e-6 @1e5 (over the bound; fine at 2e4) for only ~15% more speed.
    # The library fallback uses its own converged point "2,0" (no carry
    # there — docs/design.md "Round-2 hot-loop reductions").
    ap.add_argument("--iters", type=iters_arg, default=(2, 0))
    # 50 steps per fused-kernel dispatch: the in-kernel loop carries the
    # end-of-step factor/trig in VMEM, skipping the q0 factorization on all
    # but the first step of each block (0.114 -> 0.088 ms/step; drift
    # 3.7e-7 @2e4 — docs/design.md).  Must divide chunk_steps and
    # drift_every.
    ap.add_argument("--steps-per-call", type=int, default=50)
    ap.add_argument("--fused-solver", default="semiseparable",
                    choices=["dense", "semiseparable"],
                    help="fused-kernel linear algebra for the chain "
                    "phases: the O(n) semiseparable factorization "
                    "(headline) or the generic dense in-register Cholesky "
                    "(the round-1..3 arithmetic; the anchor21 datapoint "
                    "always uses it)")
    ap.add_argument("--group-unroll", type=int, default=4,
                    help="1024-member tile groups per fused-kernel "
                    "instance (bitwise-identical results; hides the "
                    "semiseparable recursion's latency)")
    # full-horizon yoshida4_fused margin datapoint + runtime-params sweep
    # throughput (both chunked, f64-sampled drift like the headline)
    ap.add_argument("--margin-steps", type=int, default=100_000)
    ap.add_argument("--sweep-steps", type=int, default=200_000)
    # headline dt: 5e-4 × 2e5 steps = the same t=100 horizon as the
    # round-3 1e-3×1e5 config, measured 214.6e6 member-steps/s @ 3.0e-7
    # drift with the (2,0) predictor-factor schedule (docs/design.md
    # round-4; at dt=1e-3 that schedule over-drifts, 1.31e-6)
    ap.add_argument("--dt", type=float, default=5e-4)
    ap.add_argument("--skip-margin", action="store_true")
    ap.add_argument("--skip-roofline", action="store_true")
    ap.add_argument("--skip-families", action="store_true")
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--skip-chain40", action="store_true")
    ap.add_argument("--skip-adaptive", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for smoke testing")
    ap.add_argument("--skip-drift", action="store_true")
    ap.add_argument("--skip-dp", action="store_true")
    args = ap.parse_args(argv)

    def shrink_to_quick():
        args.batch, args.steps = 4096, 1000
        args.chunk_steps = 500
        args.drift_steps, args.drift_batch = 5000, 256
        args.dp_drift_steps = 10_000
        args.margin_steps, args.sweep_steps = 1000, 1000
        # the n=40 kernel costs ~24 min of remote compile regardless of
        # step count — never part of a smoke run
        args.skip_chain40 = True

    if args.quick:
        shrink_to_quick()
    clamp_note = None
    if args.group_unroll > 1 and args.batch % (1024 * args.group_unroll):
        # fused group tiles are 1024 members; a batch that doesn't fill
        # group_unroll of them would fail every fused phase (ADVICE r4) —
        # clamp and note it rather than erroring the whole bench
        clamp_note = (f"{args.group_unroll}->1: batch {args.batch} not a "
                      f"multiple of {1024 * args.group_unroll}")
        args.group_unroll = 1
    # drift samples land on whole fused blocks: a --drift-every that is not
    # a multiple of --steps-per-call would make the fused phases raise and
    # phase_throughput silently fall back to the (~3× slower) library path,
    # reporting IT as the headline — reject up front instead
    if args.drift_every % args.steps_per_call:
        ap.error(
            f"--drift-every ({args.drift_every}) must be a multiple of "
            f"--steps-per-call ({args.steps_per_call})"
        )
    for name in ("chunk_steps", "steps"):
        if getattr(args, name) % args.steps_per_call:
            ap.error(
                f"--{name.replace('_', '-')} ({getattr(args, name)}) must "
                f"be a multiple of --steps-per-call "
                f"({args.steps_per_call}) — a non-multiple makes the fused "
                f"run raise and the headline silently fall back to the "
                f"library path"
            )

    extras = {"method": args.method}
    if clamp_note:
        extras["group_unroll_clamped"] = clamp_note
    platform = "cpu" if _host_pinned() else _probe_accelerator()
    if platform is None:
        # accelerator init hangs (wedged tunnel): pin THIS process to the
        # host before its first backend init and shrink to smoke shapes —
        # full accelerator shapes are hours on host, and the driver needs
        # its JSON line more than it needs an unreachable headline
        jax.config.update("jax_platforms", "cpu")
        extras["accelerator_probe"] = "unresponsive; bench pinned to cpu"
        shrink_to_quick()
        # On host the fused kernel only has interpret mode — MINUTES per
        # phase even at quick shapes (a host-pinned --quick run measured
        # >20 min end to end, round 5).  Every optional phase is an
        # accelerator datapoint anyway: run the library stepper for the
        # one headline number plus the host baseline and emit the line
        # well inside the driver's budget.
        args.method, args.group_unroll = "leapfrog", 1
        args.skip_roofline = args.skip_margin = args.skip_sweep = True
        args.skip_families = args.skip_adaptive = args.skip_drift = True
        args.skip_chain40 = args.skip_dp = True
    value = 0.0
    vs_baseline = 0.0
    try:
        extras.update(phase_throughput(args))
        value = extras["member_steps_per_sec"]
    except Exception as e:  # pragma: no cover
        extras["throughput_error"] = f"{type(e).__name__}: {e}"[:200]
    if not args.skip_roofline:
        try:
            extras.update(phase_roofline(args, value))
        except Exception as e:  # pragma: no cover
            extras["roofline_error"] = f"{type(e).__name__}: {e}"[:200]
    if not args.skip_margin:
        try:
            extras.update(phase_margin(args))
        except Exception as e:  # pragma: no cover
            extras["margin_error"] = f"{type(e).__name__}: {e}"[:200]
    if not args.skip_sweep:
        try:
            extras.update(phase_sweep(args))
            if value and extras.get("sweep_member_steps_per_sec"):
                extras["sweep_vs_headline"] = round(
                    extras["sweep_member_steps_per_sec"] / value, 3
                )
        except Exception as e:  # pragma: no cover
            extras["sweep_error"] = f"{type(e).__name__}: {e}"[:200]
    if not args.skip_families:
        try:
            extras.update(phase_families(args))
        except Exception as e:  # pragma: no cover
            extras["families_error"] = f"{type(e).__name__}: {e}"[:200]
    # order matters: a failed TPU-f64 attempt can leave the device faulted
    # for the rest of the process, so all f32 accelerator phases run before
    # the f64 attempts (adaptive is f64-on-device but small/short; it runs
    # after every f32 phase).
    if not args.skip_dp:
        try:
            extras.update(phase_double_pendulum(args))
        except Exception as e:  # pragma: no cover
            extras["dp_error"] = f"{type(e).__name__}: {e}"[:200]
    if not args.skip_adaptive:
        try:
            extras.update(phase_adaptive(args))
        except Exception as e:  # pragma: no cover
            extras["adaptive_error"] = f"{type(e).__name__}: {e}"[:200]
    if not args.skip_drift:
        try:
            extras.update(phase_drift(args))
        except Exception as e:  # pragma: no cover
            extras["drift_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        extras.update(phase_cpu_baseline(args))
        base = max(
            extras.get("cpu_single_steps_per_sec", 0.0),
            extras.get("native_single_steps_per_sec", 0.0),
        )
        if value and base:
            vs_baseline = value / base
    except Exception as e:  # pragma: no cover
        extras["baseline_error"] = f"{type(e).__name__}: {e}"[:200]
    # LAST among device phases: chain40's dense n=40 attempt is EXPECTED to
    # fail (compile-helper OOM) every full run, and a failed compile
    # process has been observed to wedge the relay — if that happens here,
    # every other datapoint is already in ``extras``
    if not args.skip_chain40:
        try:
            extras.update(phase_chain40(args))
        except Exception as e:  # pragma: no cover
            extras["chain40_error"] = f"{type(e).__name__}: {e}"[:200]

    out = {
        "metric": "chain20_ensemble_member_steps_per_sec",
        "value": round(value, 1),
        "unit": "member-steps/s",
        "vs_baseline": round(vs_baseline, 1),
        **{k: v for k, v in extras.items()},
    }
    write_full_record(out)
    print(compact_record(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
