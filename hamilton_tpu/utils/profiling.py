"""Benchmarking and profiling harness.

The reference has no profiling at all (SURVEY.md §5).  Here: a
``block_until_ready`` wall-clock harness that separates trace/compile time
from steady-state run time (the standard JAX benchmarking discipline), plus an
optional ``jax.profiler`` trace context for TPU work.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax

__all__ = ["BenchResult", "benchmark_fn", "profile_trace"]


@dataclass(frozen=True)
class BenchResult:
    compile_s: float
    mean_s: float
    min_s: float
    runs: int

    def __str__(self) -> str:
        return (
            f"compile {self.compile_s * 1e3:.1f} ms; "
            f"run mean {self.mean_s * 1e3:.3f} ms / min {self.min_s * 1e3:.3f} ms "
            f"over {self.runs} runs"
        )


def benchmark_fn(fn: Callable[[], Any], *, warmup: int = 1, runs: int = 5) -> BenchResult:
    """Time ``fn`` (which should return jax arrays): first call timed as
    compile, then ``runs`` timed calls with ``block_until_ready``."""
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn())
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return BenchResult(
        compile_s=compile_s,
        mean_s=sum(times) / len(times),
        min_s=min(times),
        runs=runs,
    )


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
