"""hamilton_tpu — TPU-native Hamiltonian mechanics in JAX.

A ground-up rebuild of the capabilities of ``mstksg/hamilton``
(``/root/reference/src/Numeric/Hamilton.hs``) as an idiomatic JAX/XLA/Pallas
framework: simulate classical-mechanics systems on arbitrary generalized
coordinates by stating only

1. a smooth coordinate map ``f : R^n -> R^m`` into Cartesian space,
2. an inertia vector ``M in R^m``, and
3. a potential-energy function ``U``,

after which automatic differentiation (``jax.jacfwd`` / ``jax.hessian`` /
``jax.grad``) derives the generalized mass matrix ``K = J^T M J`` and
Hamilton's equations, and jit-compiled integrators (symplectic fixed-step and
GSL-semantics adaptive RKF45) evolve the system through phase space.

Name mapping vs the reference (Numeric.Hamilton export list, Hamilton.hs:28-70):

==============  =======================================
reference       hamilton_tpu
==============  =======================================
``System``      :class:`System`
``mkSystem``    :func:`mk_system`
``mkSystem'``   :func:`mk_system_cart`
``underlyingPos``  :func:`underlying_pos`
``Config``      :class:`Config`
``Phase``       :class:`Phase`
``toPhase``     :func:`to_phase`
``fromPhase``   :func:`from_phase`
``momenta``     :func:`momenta`
``velocities``  :func:`velocities`
``keC``         :func:`ke_c`
``keP``         :func:`ke_p`
``pe``          :func:`pe`
``lagrangian``  :func:`lagrangian`
``hamiltonian`` :func:`hamiltonian`
``hamEqs``      :func:`ham_eqs`
``stepHam``     :func:`step_ham`
``iterate (stepHam dt s)`` :func:`iterate_ham` (generator)
``evolveHam``   :func:`evolve_ham`
``evolveHam'``  :func:`evolve_ham_list`
``stepHamC``    :func:`step_ham_c`
``evolveHamC``  :func:`evolve_ham_c`
``evolveHamC'`` :func:`evolve_ham_c_list`
==============  =======================================

Beyond reference parity, first-class TPU-scale extensions live in
:mod:`hamilton_tpu.ensemble` (vmapped + mesh-sharded ensembles),
:mod:`hamilton_tpu.integrators` (symplectic / implicit-RK family),
:mod:`hamilton_tpu.ops` (Pallas kernels), and :mod:`hamilton_tpu.utils`
(observables, checkpointing, profiling, diagnostics).
"""

from hamilton_tpu.state import Config, Phase
from hamilton_tpu.system import System, mk_system, mk_system_cart, underlying_pos
from hamilton_tpu.mechanics import (
    QFactor,
    dhdp_factored,
    dhdq_factored,
    ham_eqs,
    hamiltonian,
    ke_c,
    ke_p,
    lagrangian,
    mass_matrix,
    momenta,
    pe,
    q_factor,
    from_phase,
    to_phase,
    velocities,
)
from hamilton_tpu.integrators.evolve import (
    evolve_ham,
    evolve_ham_c,
    evolve_ham_c_list,
    evolve_ham_fixed,
    evolve_ham_list,
    step_ham,
    iterate_ham,
    step_ham_c,
)
from hamilton_tpu.ensemble import (
    evolve_ensemble,
    evolve_ensemble_chunked,
    evolve_ensemble_final,
    evolve_ensemble_sharded,
)
from hamilton_tpu import utils  # noqa: F401 — expose ht.utils.* (observables etc.)
from hamilton_tpu import models  # noqa: F401 — expose ht.models.* (construction is lazy; import is free)

__version__ = "0.3.0"

__all__ = [
    "Config",
    "Phase",
    "System",
    "mk_system",
    "mk_system_cart",
    "underlying_pos",
    "mass_matrix",
    "momenta",
    "velocities",
    "to_phase",
    "from_phase",
    "pe",
    "ke_c",
    "ke_p",
    "lagrangian",
    "hamiltonian",
    "ham_eqs",
    "step_ham",
    "iterate_ham",
    "evolve_ham",
    "evolve_ham_list",
    "evolve_ham_fixed",
    "step_ham_c",
    "evolve_ham_c",
    "evolve_ham_c_list",
    "evolve_ensemble",
    "evolve_ensemble_chunked",
    "evolve_ensemble_final",
    "evolve_ensemble_sharded",
    "QFactor",
    "q_factor",
    "dhdp_factored",
    "dhdq_factored",
    "__version__",
]
