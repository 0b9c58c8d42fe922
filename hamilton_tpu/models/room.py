"""Ball in a room (reference ``room``, ``app/Examples.hs:96-116``).

Identity coordinate map; the walls are *soft constraints modeled purely via
the potential* (logistic barriers) — the reference's demonstration that hard
boundaries need no constraint solver.
"""

from __future__ import annotations

import jax.numpy as jnp

from hamilton_tpu.models.base import Example, logistic
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system

__all__ = ["room"]


def room(theta: float = jnp.pi / 4) -> Example:
    """Ball launched at angle ``theta`` (radians; CLI flag ``--angle`` in
    degrees, default 45, converted before the call — ``app/Examples.hs:392``).

    Potential (``:104-111``): gravity ``2y`` plus four logistic walls at
    ``y = ±1`` and ``x = ±2``.  Initial state ``q = (−1, 0.25)``,
    ``q̇ = (cos θ, sin θ)`` (``:116``).
    """
    bottom = logistic(-1.0, 10.0, 0.1)
    top = logistic(1.0, 10.0, 0.1)
    left = logistic(-2.0, 10.0, 0.1)
    right = logistic(2.0, 10.0, 0.1)

    def potential(q):
        x, y = q[0], q[1]
        return 2.0 * y + (1.0 - bottom(y)) + top(y) + (1.0 - left(x)) + right(x)

    system = mk_system(
        jnp.array([1.0, 1.0]),
        lambda q: q,
        potential,
        n=2,
        name="room",
    )

    def draw(xs):
        return [xs]

    return Example(
        name="Room",
        coord_names=("x", "y"),
        system=system,
        draw=draw,
        init_config=Config(
            jnp.array([-1.0, 0.25]), jnp.array([jnp.cos(theta), jnp.sin(theta)])
        ),
    )
