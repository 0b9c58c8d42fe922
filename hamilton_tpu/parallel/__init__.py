"""Device-mesh and sharding utilities for ensemble-scale simulation.

The reference is strictly single-trajectory/single-process (SURVEY.md §2.4);
scale here comes from sharding the *ensemble axis* over a TPU mesh with XLA
collectives riding ICI.  This package holds the mesh plumbing.
"""

from hamilton_tpu.parallel.mesh import (
    ensemble_mesh,
    ensemble_sharding,
    replicated_sharding,
    shard_phase,
)

__all__ = [
    "ensemble_mesh",
    "ensemble_sharding",
    "replicated_sharding",
    "shard_phase",
]
