"""Mesh construction and sharding helpers.

The canonical layout (SURVEY.md §2.4, §7): a mesh whose primary axis is the
**ensemble** (data-parallel over trajectory members — the physics analog of
DP), optionally refined by a second **param** axis for parameter-sweep grids
(sweep over masses/ICs as a 2-D batch).  Per-member state is tiny (2n floats),
so nothing else is worth sharding; collectives are only needed for cross-shard
ensemble statistics (``psum``/``pmean``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hamilton_tpu.state import Phase

__all__ = ["ensemble_mesh", "ensemble_sharding", "replicated_sharding", "shard_phase"]


def ensemble_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    param_axis: int = 1,
    axis_names=("ensemble", "param"),
) -> Mesh:
    """Build a mesh over ``devices`` with an ensemble axis (and optionally a
    param-sweep axis of size ``param_axis``).

    With ``param_axis == 1`` this degenerates to the 1-D ensemble mesh that is
    the default for IC sweeps.
    """
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if n % param_axis != 0:
        raise ValueError(f"{n} devices not divisible by param_axis={param_axis}")
    arr = np.array(devices).reshape(n // param_axis, param_axis)
    return Mesh(arr, axis_names=axis_names)


def ensemble_sharding(mesh: Mesh, *, batch_ndim: int = 1) -> NamedSharding:
    """Sharding that splits the leading batch axis over the mesh's ensemble
    axis (and the second batch axis over the param axis for 2-D batches)."""
    names = list(mesh.axis_names)
    if batch_ndim == 1:
        # fold both mesh axes into the single batch axis
        spec = P(tuple(n for n in names if mesh.shape[n] > 1) or names[0])
    elif batch_ndim == 2:
        spec = P(names[0], names[1])
    else:
        raise ValueError(f"batch_ndim must be 1 or 2, got {batch_ndim}")
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_phase(phase: Phase, mesh: Mesh, *, batch_ndim: int = 1) -> Phase:
    """Place a batched :class:`Phase` with its ensemble axis sharded over the
    mesh.  XLA then partitions every downstream op over the ensemble with no
    further annotation (GSPMD)."""
    sh = ensemble_sharding(mesh, batch_ndim=batch_ndim)
    return jax.device_put(phase, sh)
