"""ctypes bindings to the native C++ ODE engine (``native/hamode.cpp``).

The native engine is the rebuild's replacement for the reference's foreign
GSL dependency (SURVEY.md §2.3): a from-scratch C++ RKF45 with GSL
evolve/control semantics.  It serves as

* an **independent parity oracle** for the JAX adaptive driver
  (same control laws, separately implemented → agreement is strong evidence
  both match GSL);
* a fast native CPU path for single-trajectory stepping (the reference's own
  workload) — used by ``bench.py`` for the single-CPU baseline.

The library is built lazily with ``make`` on first use and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "load",
    "rkf45_evolve_times",
    "double_pendulum_evolve",
    "double_pendulum_fixed_steps",
    "GSL_EPS_DEFAULT",
]

GSL_EPS_DEFAULT = 1.49012e-08  # reference Hamilton.hs:448

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libhamode.so")

_RHS_FN = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double),
    ctypes.c_int,
    ctypes.c_void_p,
)


class _Stats(ctypes.Structure):
    _fields_ = [
        ("n_steps", ctypes.c_int64),
        ("n_rejected", ctypes.c_int64),
        ("h_final", ctypes.c_double),
    ]


_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_SO_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.ham_rkf45_evolve_times.restype = ctypes.c_int
    lib.ham_rkf45_evolve_times.argtypes = [
        _RHS_FN, ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.POINTER(_Stats),
    ]
    lib.ham_double_pendulum_evolve.restype = ctypes.c_int
    lib.ham_double_pendulum_evolve.argtypes = [
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(_Stats),
    ]
    lib.ham_double_pendulum_fixed_steps.restype = ctypes.c_int
    lib.ham_double_pendulum_fixed_steps.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.ham_chain_evolve.restype = ctypes.c_int
    lib.ham_chain_evolve.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(_Stats),
    ]
    lib.ham_chain_ensemble_fixed_steps.restype = ctypes.c_int
    lib.ham_chain_ensemble_fixed_steps.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def rkf45_evolve_times(
    rhs: Callable[[np.ndarray], np.ndarray],
    y0: np.ndarray,
    ts: np.ndarray,
    *,
    eps_abs: float = GSL_EPS_DEFAULT,
    eps_rel: float = GSL_EPS_DEFAULT,
    h0: float = -1.0,
) -> Tuple[np.ndarray, dict]:
    """Evolve an arbitrary Python RHS with the native engine.

    ``rhs(y) -> dydt`` is called back per RK stage (the exact C↔caller
    callback structure of the reference's GSL integration, SURVEY.md §3.3).
    Returns ``(out[n_ts, dim], stats)``.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native hamode library unavailable (g++/make failed?)")
    y0 = np.ascontiguousarray(y0, dtype=np.float64)
    ts = np.ascontiguousarray(ts, dtype=np.float64)
    dim = y0.shape[0]
    out = np.empty((ts.shape[0], dim), dtype=np.float64)

    @_RHS_FN
    def cb(y_ptr, dydt_ptr, d, _user):
        y = np.ctypeslib.as_array(y_ptr, shape=(d,))
        dydt = np.asarray(rhs(y), dtype=np.float64)
        ctypes.memmove(dydt_ptr, dydt.ctypes.data, d * 8)

    stats = _Stats()
    rc = lib.ham_rkf45_evolve_times(
        cb, None, dim, _dptr(ts), ts.shape[0], eps_abs, eps_rel, h0,
        _dptr(y0), _dptr(out), 10_000_000, ctypes.byref(stats),
    )
    if rc != 0:
        raise RuntimeError(f"native rkf45 failed with code {rc}")
    return out, {
        "n_steps": stats.n_steps,
        "n_rejected": stats.n_rejected,
        "h_final": stats.h_final,
    }


def double_pendulum_evolve(
    m1: float,
    m2: float,
    y0: np.ndarray,
    ts: np.ndarray,
    *,
    eps_abs: float = GSL_EPS_DEFAULT,
    eps_rel: float = GSL_EPS_DEFAULT,
    h0: float = -1.0,
) -> Tuple[np.ndarray, dict]:
    """Native analytic double pendulum (reference baseline config) — no
    Python in the hot loop."""
    lib = load()
    if lib is None:
        raise RuntimeError("native hamode library unavailable")
    y0 = np.ascontiguousarray(y0, dtype=np.float64)
    ts = np.ascontiguousarray(ts, dtype=np.float64)
    out = np.empty((ts.shape[0], 4), dtype=np.float64)
    stats = _Stats()
    rc = lib.ham_double_pendulum_evolve(
        m1, m2, _dptr(ts), ts.shape[0], eps_abs, eps_rel, h0, _dptr(y0),
        _dptr(out), ctypes.byref(stats),
    )
    if rc != 0:
        raise RuntimeError(f"native double-pendulum evolve failed: {rc}")
    return out, {
        "n_steps": stats.n_steps,
        "n_rejected": stats.n_rejected,
        "h_final": stats.h_final,
    }


def chain_evolve(
    masses,
    y0: np.ndarray,
    ts: np.ndarray,
    *,
    link_length: float = 1.0,
    gravity: float = 5.0,
    eps_abs: float = GSL_EPS_DEFAULT,
    eps_rel: float = GSL_EPS_DEFAULT,
    h0: float = -1.0,
) -> Tuple[np.ndarray, dict]:
    """Adaptive evolve of the analytic N-link chain (closed-form ``K``,
    ``∂T/∂q``, ``∇U`` — an independent oracle for the AD-derived
    ``models.chain`` dynamics).  ``y0`` is ``[q, p]`` of length 2n."""
    lib = load()
    if lib is None:
        raise RuntimeError("native hamode library unavailable")
    masses = np.ascontiguousarray(masses, dtype=np.float64)
    n = masses.shape[0]
    y0 = np.ascontiguousarray(y0, dtype=np.float64)
    ts = np.ascontiguousarray(ts, dtype=np.float64)
    out = np.empty((ts.shape[0], 2 * n), dtype=np.float64)
    stats = _Stats()
    rc = lib.ham_chain_evolve(
        n, _dptr(masses), link_length, gravity, _dptr(ts), ts.shape[0],
        eps_abs, eps_rel, h0, _dptr(y0), _dptr(out), ctypes.byref(stats),
    )
    if rc != 0:
        raise RuntimeError(f"native chain evolve failed: {rc}")
    return out, {
        "n_steps": stats.n_steps,
        "n_rejected": stats.n_rejected,
        "h_final": stats.h_final,
    }


def chain_ensemble_fixed_steps(
    masses,
    states: np.ndarray,
    h: float,
    n_steps: int,
    *,
    link_length: float = 1.0,
    gravity: float = 5.0,
) -> np.ndarray:
    """Native multi-core (OpenMP) ensemble stepping: ``states`` is
    ``(members, 2n)``, advanced in place by ``n_steps`` fixed-h RKF45 steps
    per member — the host-CPU counterpart of the TPU ensemble path."""
    lib = load()
    if lib is None:
        raise RuntimeError("native hamode library unavailable")
    masses = np.ascontiguousarray(masses, dtype=np.float64)
    out = np.ascontiguousarray(states, dtype=np.float64).copy()
    rc = lib.ham_chain_ensemble_fixed_steps(
        masses.shape[0], _dptr(masses), link_length, gravity, h,
        n_steps, out.shape[0], _dptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"native chain ensemble failed: {rc}")
    return out


def double_pendulum_fixed_steps(
    m1: float, m2: float, h: float, n_steps: int, y0: np.ndarray
) -> np.ndarray:
    """Fixed-h RKF45 stepping for throughput baselining (no error control)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native hamode library unavailable")
    y = np.ascontiguousarray(y0, dtype=np.float64).copy()
    rc = lib.ham_double_pendulum_fixed_steps(m1, m2, h, n_steps, _dptr(y))
    if rc != 0:
        raise RuntimeError(f"native fixed steps failed: {rc}")
    return y
