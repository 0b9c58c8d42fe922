"""Auxiliary subsystems (SURVEY.md §5): observables, checkpointing,
diagnostics (NaN/energy sentinels), and profiling."""

from hamilton_tpu.utils.observables import (
    LyapunovPairs,
    PoincareSections,
    RunningExtrema,
    energies,
    energy_drift,
    hamiltonian_trajectory,
    lyapunov_estimate,
)
from hamilton_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from hamilton_tpu.utils.diagnostics import check_finite_phase, checked, nan_guard
from hamilton_tpu.utils.poincare import coordinate_section, poincare_section
from hamilton_tpu.utils.profiling import benchmark_fn

__all__ = [
    "energies",
    "energy_drift",
    "hamiltonian_trajectory",
    "lyapunov_estimate",
    "save_checkpoint",
    "load_checkpoint",
    "check_finite_phase",
    "checked",
    "nan_guard",
    "benchmark_fn",
    "poincare_section",
    "coordinate_section",
    "LyapunovPairs",
    "RunningExtrema",
    "PoincareSections",
]
