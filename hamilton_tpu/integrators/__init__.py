"""Time integrators: the TPU-native replacement for the reference's GSL engine.

The reference's entire time-integration engine is a single FFI call into GSL's
adaptive RKF45 (``odeSolveV RKf45 hi eps eps``, ``Numeric/Hamilton.hs:445``).
Here that becomes a family of jit-compiled integrators:

* :mod:`hamilton_tpu.integrators.adaptive` — embedded Runge-Kutta drivers with
  **GSL-matching step control** (same error weighting, same accept/reject and
  grow/shrink rules) for trajectory parity with the reference;
* :mod:`hamilton_tpu.integrators.fixed` — fixed-step steppers driven by
  ``lax.scan``: classic RK, and the **symplectic family** (generalized
  Störmer-Verlet leapfrog, implicit midpoint, Gauss-Legendre collocation,
  Yoshida composition, Tao's explicit method) that give the bounded
  energy-drift behavior the ensemble benchmarks demand;
* :mod:`hamilton_tpu.integrators.evolve` — the public ``step_ham`` /
  ``evolve_ham`` / ``evolve_ham_list`` API matching the reference driver layer
  (``Numeric/Hamilton.hs:389-515``).
"""

from hamilton_tpu.integrators.evolve import (
    evolve_ham,
    evolve_ham_c,
    evolve_ham_c_list,
    evolve_ham_fixed,
    evolve_ham_list,
    step_ham,
    step_ham_c,
)
from hamilton_tpu.integrators.fixed import FIXED_METHODS, make_stepper
from hamilton_tpu.integrators.adaptive import gsl_evolve_to, ADAPTIVE_METHODS

__all__ = [
    "step_ham",
    "evolve_ham",
    "evolve_ham_list",
    "evolve_ham_fixed",
    "step_ham_c",
    "evolve_ham_c",
    "evolve_ham_c_list",
    "make_stepper",
    "gsl_evolve_to",
    "FIXED_METHODS",
    "ADAPTIVE_METHODS",
]
