"""Poincaré section extraction from trajectories.

Phase-space analysis utility beyond the reference's surface (its demo only
plots Cartesian positions): find the crossings of a trajectory through a
section plane ``g(q, p) = 0`` (by default a coordinate plane ``q[k] = c``
with positive velocity), with linear interpolation between emitted states.
Vectorized over ensembles; crossing counts are static-shaped (capped) so the
whole extraction jits.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from hamilton_tpu.state import Phase

__all__ = ["poincare_section", "coordinate_section"]


def coordinate_section(k: int, value: float = 0.0, direction: int = +1):
    """Section function for the plane ``q[k] = value`` crossed with sign
    ``direction`` (+1: increasing)."""

    def g(ph: Phase) -> jax.Array:
        s = ph.q[..., k] - value
        return s if direction >= 0 else -s

    return g


def poincare_section(
    traj: Phase,
    section: Callable[[Phase], jax.Array],
    *,
    max_crossings: int,
) -> Tuple[Phase, jax.Array]:
    """Extract up to ``max_crossings`` upward crossings of ``section`` from a
    trajectory with axes ``(time, ..., n)``.

    Returns ``(points, valid)`` where ``points`` is a :class:`Phase` with
    axes ``(max_crossings, ..., n)`` (linearly interpolated states at the
    crossings; unused slots hold zeros) and ``valid`` is a boolean mask of
    shape ``(max_crossings, ...)``.

    **Truncation contract:** ``max_crossings`` is a static cap (jit needs a
    static output shape), and crossings beyond it are SILENTLY DROPPED —
    the first ``max_crossings`` upward crossings are kept, later ones
    discarded per member.  A dense section is therefore truncated, not
    subsampled.  Detect it: a member whose mask is all-True
    (``valid.all(axis=0)``) may have overflowed — re-run with a larger cap
    (or shorter trajectory window) until its last slots stay False.  Size
    the cap generously: unused slots cost one zeroed state each, far
    cheaper than a re-run.
    """
    g = section(traj)  # (time, ...)
    before, after = g[:-1], g[1:]
    crossing = jnp.logical_and(before < 0, after >= 0)  # (time-1, ...)
    # fractional position of the zero within the interval
    frac = jnp.where(crossing, before / (before - after + 1e-300), 0.0)

    q0, q1 = traj.q[:-1], traj.q[1:]
    p0, p1 = traj.p[:-1], traj.p[1:]
    qx = q0 + frac[..., None] * (q1 - q0)
    px = p0 + frac[..., None] * (p1 - p0)

    # compact the first max_crossings crossings per member into static slots:
    # slot index = cumulative crossing count - 1
    order = jnp.cumsum(crossing.astype(jnp.int32), axis=0) - 1  # (time-1, ...)
    slot = jnp.where(crossing, order, max_crossings)  # park non-crossings
    slot = jnp.minimum(slot, max_crossings)  # overflow also parked

    batch_shape = crossing.shape[1:]
    n = traj.q.shape[-1]
    out_q = jnp.zeros((max_crossings + 1,) + batch_shape + (n,), traj.q.dtype)
    out_p = jnp.zeros_like(out_q)
    out_v = jnp.zeros((max_crossings + 1,) + batch_shape, bool)

    # scatter each interval's interpolated state into its crossing slot
    if batch_shape == ():
        out_q = out_q.at[slot].set(jnp.where(crossing[..., None], qx, 0.0))
        out_p = out_p.at[slot].set(jnp.where(crossing[..., None], px, 0.0))
        out_v = out_v.at[slot].set(crossing)
    else:
        out_q = _scatter_batched(out_q, slot, jnp.where(crossing[..., None], qx, 0.0))
        out_p = _scatter_batched(out_p, slot, jnp.where(crossing[..., None], px, 0.0))
        out_v = _scatter_batched(out_v, slot, crossing)

    points = Phase(out_q[:max_crossings], out_p[:max_crossings])
    return points, out_v[:max_crossings]


def _scatter_batched(out, slot, vals):
    """Scatter ``vals[(time, ...)]`` into ``out[(slots, ...)]`` per batch
    member, vmapping the trailing batch axes."""
    # move batch axes to front pairwise and vmap a 1-member scatter
    nb = slot.ndim - 1

    def one(o, s, v):
        return o.at[s].set(v)

    fn = one
    for _ in range(nb):
        fn = jax.vmap(fn, in_axes=(1, 1, 1), out_axes=1)
    return fn(out, slot, vals)
