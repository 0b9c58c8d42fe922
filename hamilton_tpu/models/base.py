"""Shared example-system plumbing: the ``SysExample`` analog and helpers."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

from hamilton_tpu.mechanics import to_phase
from hamilton_tpu.state import Config, Phase
from hamilton_tpu.system import System

__all__ = ["Example", "logistic"]


@dataclass(frozen=True)
class Example:
    """A packaged demo system: the analog of the reference's existential
    ``SysExample`` wrapper (``app/Examples.hs:50-59``) — name, coordinate
    labels, the :class:`System`, a draw function mapping underlying Cartesian
    positions to 2-D points for plotting, and the initial state."""

    name: str
    coord_names: Tuple[str, ...]
    system: System
    draw: Callable[[jax.Array], List[jax.Array]]  # R^m -> [R^2]
    init_config: Config

    @property
    def init_phase(self) -> Phase:
        """Initial state in phase space (reference ``seInit`` is built as
        ``toPhase s c0`` in every example, e.g. ``app/Examples.hs:62``)."""
        return to_phase(self.system, self.init_config)

    @property
    def n(self) -> int:
        return self.init_config.q.shape[-1]

    @property
    def m(self) -> int:
        return self.system.m


def logistic(pos, ht, width):
    """Soft-wall helper: ``ht / (1 + exp(−β(x − pos)))`` with
    ``β = log(0.9/0.1)/width`` — the reference's smooth barrier used to model
    hard walls as potentials (``app/Examples.hs:601-605``)."""
    beta = jnp.log(0.9 / (1.0 - 0.9)) / width

    def f(x):
        return ht / (1.0 + jnp.exp(-(beta * (x - pos))))

    return f
