"""Bench harness units: argument validation and the shared timing core.

bench.py is the driver-run artifact (one JSON line, BENCH_r*.json); these
tests cover the pieces that can break silently — the ``--drift-every``
parse-time guard (a non-multiple of ``--steps-per-call`` used to demote the
fused headline to the library fallback and report IT as the headline) and
``_timed_chunked_run``, the measurement core shared by the
throughput/margin/sweep phases and scripts/probe_dthalf.py.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


class TestArgValidation:
    def test_drift_every_must_align_with_steps_per_call(self, capsys):
        with pytest.raises(SystemExit):
            bench.main(["--drift-every", "10"])  # default spc=50
        assert "--steps-per-call" in capsys.readouterr().err

    def test_drift_every_multiple_passes_parse(self, monkeypatch, capsys):
        # stub every phase: this exercises parse-time validation + the
        # JSON-line assembly, not the device phases
        for name in ("phase_throughput", "phase_margin", "phase_sweep",
                     "phase_double_pendulum", "phase_adaptive",
                     "phase_drift", "phase_cpu_baseline"):
            monkeypatch.setattr(bench, name, lambda args: {})
        rc = bench.main(["--drift-every", "100", "--steps-per-call", "50"])
        assert rc == 0
        import json

        line = capsys.readouterr().out.strip().splitlines()[-1]
        out = json.loads(line)
        assert out["metric"] == "chain20_ensemble_member_steps_per_sec"
        assert "unit" in out and "vs_baseline" in out


class TestTimedChunkedRun:
    def test_library_method_small_batch(self):
        from hamilton_tpu.models import chain
        from hamilton_tpu.state import Phase

        class A:
            drift_every = 50
            batch = 8

        ex = chain(n_links=4)
        system = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), ex.system
        )
        rng = np.random.default_rng(0)
        q = jnp.asarray(
            np.asarray(ex.init_phase.q, np.float32)
            + 0.01 * rng.standard_normal((8, 4)),
            jnp.float32,
        )
        ph = Phase(q, jnp.zeros((8, 4), jnp.float32))
        r = bench._timed_chunked_run(
            A(), system, ph, method="leapfrog", iters=(2, 1), dt=1e-3,
            n_steps=100, chunk_steps=50, steps_per_call=1,
        )
        assert set(r) >= {
            "member_steps_per_sec", "max_drift", "steps", "first_chunk_s",
            "elapsed_steady_s", "steady_chunks", "drift_sampler",
        }
        # chain carries fused_forms → df32 sampler, cross-validated vs f64
        assert r["drift_sampler"] == "df32"
        assert r["drift_sampler_xval"] < 1e-8
        assert r["steps"] == 100
        assert r["steady_chunks"] == 1  # chunk 0 excluded when >1 chunk
        assert r["member_steps_per_sec"] > 0
        assert 0 <= r["max_drift"] < 1e-5


class TestAcceleratorProbe:
    """The wedged-tunnel watchdog: a hung accelerator init must degrade the
    bench to a host-pinned quick run, never hang it (the driver needs its
    one JSON line)."""

    def _stub_phases(self, monkeypatch, seen):
        for name in ("phase_throughput", "phase_margin", "phase_sweep",
                     "phase_double_pendulum", "phase_adaptive",
                     "phase_drift", "phase_cpu_baseline"):
            monkeypatch.setattr(bench, name,
                                lambda args, _s=seen: _s.append(args) or {})

    def test_probe_skipped_when_host_pinned(self, monkeypatch, capsys):
        # conftest pins jax_platforms="cpu" in-process, so main must not
        # spawn a probe subprocess at all (each would cost seconds-to-240s)
        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("probe must not run when host-pinned")

        monkeypatch.setattr(bench, "_probe_accelerator", boom)
        seen = []
        self._stub_phases(monkeypatch, seen)
        assert bench.main([]) == 0
        out = capsys.readouterr().out
        assert "accelerator_probe" not in out

    def test_unresponsive_probe_pins_cpu_and_shrinks(self, monkeypatch,
                                                     capsys):
        import json

        monkeypatch.setattr(bench, "_host_pinned", lambda: False)
        monkeypatch.setattr(bench, "_probe_accelerator", lambda *a: None)
        pinned = []
        monkeypatch.setattr(bench.jax.config, "update",
                            lambda *a: pinned.append(a))
        seen = []
        self._stub_phases(monkeypatch, seen)
        assert bench.main([]) == 0
        assert ("jax_platforms", "cpu") in pinned
        args = seen[0]
        assert (args.batch, args.steps) == (4096, 1000)  # quick shapes
        line = capsys.readouterr().out.strip().splitlines()[-1]
        assert "unresponsive" in json.loads(line)["accelerator_probe"]

    def test_probe_timeout_returns_none(self, monkeypatch):
        import subprocess as sp

        def fake_run(*a, **k):
            raise sp.TimeoutExpired(cmd="x", timeout=k.get("timeout", 0))

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        assert bench._probe_accelerator(timeout_s=0.01) is None

    def test_probe_parses_platform_line(self, monkeypatch):
        class R:
            returncode = 0
            stdout = "WARNING: some preamble\naxon\n"

        monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
        assert bench._probe_accelerator() == "axon"
