"""Configuration-space and phase-space state pytrees.

TPU-native analog of the reference ``Config``/``Phase`` records
(``Numeric/Hamilton.hs:103-145``).  Unlike the reference's type-level
``Config n`` / ``Phase n``, dimensions are runtime-checked and every field may
carry arbitrary *leading batch axes* — the whole point of the rebuild is that
states ``vmap``/``shard_map`` transparently over ensembles of initial
conditions (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ["Config", "Phase"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Config:
    """State in configuration space: positions ``q`` and velocities ``v``.

    Mirror of the reference ``Config`` record with fields ``cfgPositions`` /
    ``cfgVelocities`` (``Numeric/Hamilton.hs:103-115``).  The trailing axis is
    the ``n`` generalized coordinates; any leading axes are batch axes.
    """

    q: jax.Array
    v: jax.Array

    @property
    def positions(self) -> jax.Array:  # reference: cfgPositions
        return self.q

    @property
    def velocities(self) -> jax.Array:  # reference: cfgVelocities
        return self.v

    @property
    def n(self) -> int:
        """Number of generalized coordinates (the trailing axis size)."""
        return self.q.shape[-1]

    def astype(self, dtype) -> "Config":
        return Config(self.q.astype(dtype), self.v.astype(dtype))

    def __post_init__(self):
        q, v = self.q, self.v
        if hasattr(q, "shape") and hasattr(v, "shape") and q.shape != v.shape:
            raise ValueError(
                f"Config positions/velocities shape mismatch: {q.shape} vs {v.shape}"
            )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Phase:
    """State in phase space: positions ``q`` and conjugate momenta ``p``.

    Mirror of the reference ``Phase`` record with fields ``phsPositions`` /
    ``phsMomenta`` (``Numeric/Hamilton.hs:133-145``).  This is the working
    state of all simulation — integrators evolve ``Phase``, never ``Config``
    (``Numeric/Hamilton.hs:464-469``).
    """

    q: jax.Array
    p: jax.Array

    @property
    def positions(self) -> jax.Array:  # reference: phsPositions
        return self.q

    @property
    def momenta(self) -> jax.Array:  # reference: phsMomenta
        return self.p

    @property
    def n(self) -> int:
        """Number of generalized coordinates (the trailing axis size)."""
        return self.q.shape[-1]

    def astype(self, dtype) -> "Phase":
        return Phase(self.q.astype(dtype), self.p.astype(dtype))

    def flatten(self) -> jax.Array:
        """Pack into a flat ``(..., 2n)`` vector ``[q, p]``.

        Analog of the reference's ``fromPs`` (``Numeric/Hamilton.hs:457-458``),
        used at the integrator boundary.
        """
        return jnp.concatenate([self.q, self.p], axis=-1)

    @staticmethod
    def unflatten(y: jax.Array) -> "Phase":
        """Inverse of :meth:`flatten` (reference ``toPs``, ``Hamilton.hs:459-462``)."""
        n = y.shape[-1] // 2
        return Phase(y[..., :n], y[..., n:])

    def __post_init__(self):
        q, p = self.q, self.p
        if hasattr(q, "shape") and hasattr(p, "shape") and q.shape != p.shape:
            raise ValueError(
                f"Phase positions/momenta shape mismatch: {q.shape} vs {p.shape}"
            )

