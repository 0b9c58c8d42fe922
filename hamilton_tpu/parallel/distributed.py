"""Multi-host distributed runtime hooks.

The reference has no distributed communication backend at all (SURVEY.md
§2.4: no NCCL/MPI/Gloo; one process, one thread).  The TPU-native analog is
``jax.distributed`` (SURVEY.md §5 "Distributed communication backend" row):
one Python process per host, each owning its local TPU chips, with XLA
collectives riding ICI/DCN.  This module is the thin runtime wrapper:

* :func:`init_distributed` — initialize (or no-op re-entry) the jax
  distributed service from explicit args or the TPU pod environment;
* :func:`global_ensemble_mesh` — the ensemble×param mesh over the *global*
  device set (all hosts), which the sharded ensemble API consumes as-is;
* :func:`local_batch_slice` — the per-process slice of a global batch, for
  feeding :func:`jax.make_array_from_process_local_data`-style pipelines.

Single-process usage degrades gracefully: ``init_distributed()`` with no
arguments in a non-pod environment is a no-op, and ``global_ensemble_mesh``
is then exactly :func:`hamilton_tpu.parallel.ensemble_mesh`.
"""

from __future__ import annotations

from typing import Optional

import jax

from hamilton_tpu.parallel.mesh import ensemble_mesh

__all__ = [
    "init_distributed",
    "is_distributed",
    "global_ensemble_mesh",
    "local_batch_slice",
]

_initialized = False


def is_distributed() -> bool:
    """True when the jax distributed service was initialized by
    :func:`init_distributed` (i.e. we are one process of several)."""
    return _initialized and jax.process_count() > 1


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Initialize the multi-host runtime.  Returns True if the distributed
    service was (or already had been) initialized, False when running
    single-process with no coordinator configured.

    With all arguments ``None``, jax auto-detects the pod environment (TPU
    metadata / cluster env vars); in a plain single-process environment that
    detection finds nothing and this call is a documented no-op, so library
    code can call it unconditionally.

    Must be called before any jax computation touches devices — the global
    device set is fixed at backend initialization.
    """
    global _initialized
    if _initialized:
        return True
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
        _initialized = True
        return True
    except Exception:
        if explicit:
            raise
        # auto-detection found no cluster: single-process mode
        return False


def global_ensemble_mesh(*, param_axis: int = 1) -> "jax.sharding.Mesh":
    """The ensemble×param mesh over the global (all-hosts) device set.

    After :func:`init_distributed`, ``jax.devices()`` enumerates every chip
    in the pod slice; the returned mesh spans them all, so
    :func:`hamilton_tpu.ensemble.evolve_ensemble_sharded` shards the ensemble
    across hosts with the same code as single-host — GSPMD inserts any
    cross-host collectives (they ride ICI within a slice).
    """
    return ensemble_mesh(jax.devices(), param_axis=param_axis)


def local_batch_slice(global_batch: int) -> slice:
    """The half-open member range this process owns under the canonical
    leading-axis ensemble sharding (equal contiguous blocks per process).

    Use to build each host's shard of the initial conditions before
    assembling a global array (``jax.make_array_from_process_local_data``).
    """
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n_proc}"
        )
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
