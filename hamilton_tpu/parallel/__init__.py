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
from hamilton_tpu.parallel.distributed import (
    global_ensemble_mesh,
    init_distributed,
    is_distributed,
    local_batch_slice,
)

__all__ = [
    "ensemble_mesh",
    "ensemble_sharding",
    "replicated_sharding",
    "shard_phase",
    "init_distributed",
    "is_distributed",
    "global_ensemble_mesh",
    "local_batch_slice",
]
