"""Bead on a Bézier curve (reference ``bezier``, ``app/Examples.hs:164-183``).

A 1-DOF system whose single generalized coordinate is the curve parameter
``t``; the curve degree is set by the number of control points (the
reference's type-level point count, ``:166-168``).
"""

from __future__ import annotations

from math import comb
from typing import Sequence, Tuple

import jax.numpy as jnp

from hamilton_tpu.models.base import Example, logistic
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system

__all__ = ["bezier", "bezier_curve", "DEFAULT_POINTS"]

#: Reference CLI default control points (``app/Examples.hs:350``).
DEFAULT_POINTS: Tuple[Tuple[float, float], ...] = (
    (-1.0, -1.0),
    (-2.0, 1.0),
    (0.0, 1.0),
    (1.0, -1.0),
    (2.0, 1.0),
)


def bezier_curve(points, t):
    """Evaluate the Bernstein-basis Bézier curve at parameter ``t``.

    Analog of the reference ``bezierCurve`` (``app/Examples.hs:607-627``):
    ``B(t) = Σ_i C(n,i)·(1−t)^(n−i)·t^i·P_i`` with ``n = len(points)−1``.
    ``points`` is an ``(k, 2)`` array; binomials are static Python ints so the
    whole polynomial constant-folds under jit.
    """
    pts = jnp.asarray(points)
    n = pts.shape[0] - 1
    acc = jnp.zeros(pts.shape[1:], dtype=jnp.result_type(pts.dtype, jnp.asarray(t).dtype))
    for i in range(n + 1):
        acc = acc + comb(n, i) * (1.0 - t) ** (n - i) * t**i * pts[i]
    return acc


def bezier(points: Sequence[Tuple[float, float]] = DEFAULT_POINTS) -> Example:
    """Particle on a Bézier curve with parameter-clamp logistic walls at
    ``t = 0`` and ``t = 1`` (``app/Examples.hs:176-179``).  Initial state
    ``t = 0.5``, ``ṫ = 0.25`` (``:183``)."""
    pts = jnp.asarray(points, dtype=jnp.result_type(float))
    if pts.ndim != 2 or pts.shape[0] < 1 or pts.shape[1] != 2:
        raise ValueError(
            f"bezier requires a (k, 2) control-point array with k >= 1, "
            f"got shape {tuple(pts.shape)}"
        )
    left = logistic(0.0, 5.0, 0.05)
    right = logistic(1.0, 5.0, 0.05)
    # the control points are the model's physics parameters (the reference
    # takes them at the CLI, app/Examples.hs:344-350) — in the params pytree
    # they are sweepable/differentiable like every other parameter
    params = {"points": pts}

    def coords(q, p):
        return bezier_curve(p["points"].astype(q.dtype), q[0])

    def potential(q, p):
        t = q[0]
        return (1.0 - left(t)) + right(t)

    system = mk_system(
        jnp.array([1.0, 1.0]), coords, potential, n=1, name="bezier",
        params=params,
    )

    def draw(xs):
        return [xs]

    return Example(
        name="Bezier",
        coord_names=("t",),
        system=system,
        draw=draw,
        init_config=Config(jnp.array([0.5]), jnp.array([0.25])),
    )
