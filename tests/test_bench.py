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

    def test_drift_every_multiple_passes_parse(self, monkeypatch, capsys,
                                               tmp_path):
        # stub every phase: this exercises parse-time validation + the
        # JSON-line assembly, not the device phases
        for name in ("phase_throughput", "phase_margin", "phase_sweep",
                     "phase_families", "phase_chain40",
                     "phase_double_pendulum", "phase_adaptive",
                     "phase_drift", "phase_cpu_baseline"):
            monkeypatch.setattr(bench, name, lambda args: {})
        monkeypatch.setattr(bench, "write_full_record", lambda out: None)
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
                     "phase_families", "phase_chain40",
                     "phase_double_pendulum", "phase_adaptive",
                     "phase_drift", "phase_cpu_baseline"):
            monkeypatch.setattr(bench, name,
                                lambda args, _s=seen: _s.append(args) or {})
        # stub tests must not clobber a real full-precision bench record
        monkeypatch.setattr(bench, "write_full_record", lambda out: None)

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
        # host has no compiled fused kernel (interpret mode is minutes per
        # phase): the fallback must run the library stepper and drop every
        # optional phase so the JSON line lands inside the driver's budget
        assert args.method == "leapfrog"
        assert args.group_unroll == 1
        for f in ("roofline", "margin", "sweep", "families", "adaptive",
                  "drift", "chain40", "dp"):
            assert getattr(args, f"skip_{f}"), f
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


class TestCompactRecord:
    """The stdout JSON line must survive the driver's ~2000-char output-tail
    capture (BENCH_r04 was truncated at the front and parsed as null —
    VERDICT r4 item 1b).  Contract: <= LINE_BUDGET chars, json-clean,
    headline keys pinned to the very END of the line, full precision in
    BENCH_full.json."""

    def _full_record(self, n_extra=60):
        # full-precision floats at round-4 scale: 17-digit reprs were ~35%
        # of the overflow
        rec = {
            "metric": "chain20_ensemble_member_steps_per_sec",
            "value": 403153633.4953225,
            "unit": "member-steps/s",
            "vs_baseline": 14512.229019664325,
            "method": "leapfrog_fused",
            "member_steps_per_sec": 403153633.4953225,
            "throughput_fused_solver": "semiseparable",
            "throughput_group_unroll": 4,
            "tpu_max_energy_drift_f32comp": 5.512776345671945e-07,
            "roofline_error": "RuntimeError: " + "x" * 190,
            "families_error": "ValueError: " + "y" * 190,
            "first_chunk_s": 212.4,
            "anchor21_first_chunk_s": 33.217,
            "sweep_first_chunk_s": 41.90211,
            "drift_sampler": "df32",
            "none_key": None,
        }
        for i in range(n_extra):
            rec[f"extra_datapoint_{i:02d}_member_steps_per_sec"] = (
                3151787561.069793 / (i + 1)
            )
        return rec

    def test_line_fits_budget_and_parses(self):
        import json

        line = bench.compact_record(self._full_record())
        assert len(line) <= bench.LINE_BUDGET
        out = json.loads(line)
        for k in bench.PINNED_TAIL_KEYS:
            assert k in out, k
        # floats rounded to 5 significant digits
        assert out["value"] == 403150000.0
        assert out["tpu_max_energy_drift_f32comp"] == 5.5128e-07
        # Nones dropped; error strings truncated
        assert "none_key" not in out
        for k in ("roofline_error", "families_error"):
            if k in out:
                assert len(out[k]) <= 90

    def test_pinned_keys_end_the_line(self):
        line = bench.compact_record(self._full_record())
        # vs_baseline is the final key: a front-truncated tail still ends
        # with the full pinned block
        tail = line[-400:]
        for k in bench.PINNED_TAIL_KEYS:
            assert f'"{k}"' in tail, k
        assert line.rstrip("}").rstrip().endswith(
            str(bench._round_sig(self._full_record()["vs_baseline"]))
        )

    def test_survives_simulated_driver_tail(self):
        import json

        line = bench.compact_record(self._full_record())
        stdout = "WARNING: platform 'axon' is experimental\n" * 3 + line
        tail = stdout[-2000:]
        parsed = json.loads(tail.splitlines()[-1])
        assert parsed["member_steps_per_sec"] == 403150000.0

    def test_drop_order_prefers_low_value_keys(self):
        import json

        rec = self._full_record(n_extra=200)  # force dropping
        line = bench.compact_record(rec)
        assert len(line) <= bench.LINE_BUDGET
        out = json.loads(line)
        assert out["omitted_keys"] > 0
        # timing plumbing drops before datapoints
        assert "first_chunk_s" not in out
        assert "sweep_first_chunk_s" not in out
        for k in bench.PINNED_TAIL_KEYS:
            assert k in out, k

    def test_round_sig_edge_cases(self):
        import json

        assert bench._round_sig(0.0) == 0.0
        # non-finite floats become strings: bare NaN/Infinity is invalid
        # JSON to strict parsers and would cost the driver the artifact
        assert bench._round_sig(float("inf")) == "inf"
        assert bench._round_sig(float("nan")) == "nan"
        line = bench.compact_record({"metric": "m", "value": float("nan"),
                                     "unit": "u", "vs_baseline": 1.0})
        assert json.loads(line)["value"] == "nan"
        assert "NaN" not in line
        assert bench._round_sig(123456789.0) == 123460000.0
        assert bench._round_sig(1.2345678e-7) == 1.2346e-7
        assert bench._round_sig("string") == "string"
        assert bench._round_sig(42) == 42

    def test_write_full_record(self, tmp_path):
        import json

        rec = self._full_record()
        del rec["none_key"]
        path = tmp_path / "full.json"
        bench.write_full_record(rec, path=str(path))
        assert json.loads(path.read_text())["value"] == rec["value"]


class TestCompactRecordRealFixture:
    """Regression against the committed round-5 full record: every
    rate/drift/ratio/calibrated-dt datapoint must survive compaction (the
    first cut dropped sweep/chain40/family rates because a substring
    '_steps' drop-class also matched '*_member_steps_per_sec')."""

    def test_protected_datapoints_survive(self):
        import json

        path = os.path.join(REPO, "BENCH_full.json")
        if not os.path.exists(path):
            pytest.skip("no committed BENCH_full.json")
        full = json.load(open(path))
        line = bench.compact_record(full)
        assert len(line) <= bench.LINE_BUDGET
        d = json.loads(line)
        for k in full:
            protected = any(
                p in k for p in bench.PROTECTED_SUBSTRINGS
            ) and not any(cls(k) for cls in bench.DROP_CLASSES)
            if protected:
                assert k in d, f"protected datapoint dropped: {k}"
        # spot-check the verdict-relevant keys by name
        for k in ("sweep_member_steps_per_sec",
                  "chain40_semiseparable_member_steps_per_sec",
                  "chain40_semi_vs_dense",
                  "spherical_fused_max_drift", "spherical_dt",
                  "twobody_drift_note",
                  "dp_member_steps_per_sec",
                  "adaptive_batched_traj_per_sec",
                  "native_single_steps_per_sec"):
            if k in full:
                assert k in d, k
