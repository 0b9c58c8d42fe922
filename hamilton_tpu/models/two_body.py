"""Two-body Kepler orbit (reference ``twoBody``, ``app/Examples.hs:118-142``).

Polar generalized coordinates ``(r, θ)`` about the center of mass; gravity
``U = −m₁m₂/r``.  Bodies orbit only if ``H < 0`` (reference CLI help,
``app/Examples.hs:216``).
"""

from __future__ import annotations

import jax.numpy as jnp

from hamilton_tpu.models.base import Example
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system

__all__ = ["two_body"]


def two_body(m1: float = 5.0, m2: float = 0.5, omega0: float = 0.5) -> Example:
    """Two gravitating bodies (CLI defaults m1=5, m2=0.5, ω0=0.5).

    Positions assume (0,0) is the center of mass (``app/Examples.hs:126-137``):
    ``r₁ = −(m₂/mT)·r``, ``r₂ = (m₁/mT)·r`` along ``(cos θ, sin θ)``.
    Initial state ``q = (2, 0)``, ``q̇ = (0, ω0)`` (``:142``).
    """
    ftype = jnp.result_type(float)
    params = {
        "m1": jnp.asarray(m1, dtype=ftype),
        "m2": jnp.asarray(m2, dtype=ftype),
    }

    def inertia_fn(p):
        return jnp.stack([p["m1"], p["m1"], p["m2"], p["m2"]])

    def coords(q, p):
        r, th = q[0], q[1]
        m_t = p["m1"] + p["m2"]
        r1 = r * (-(p["m2"] / m_t)).astype(q.dtype)
        r2 = r * (p["m1"] / m_t).astype(q.dtype)
        c, s = jnp.cos(th), jnp.sin(th)
        return jnp.stack([r1 * c, r1 * s, r2 * c, r2 * s])

    def potential(q, p):
        return -(p["m1"] * p["m2"]).astype(q.dtype) / q[0]

    system = mk_system(None, coords, potential, n=2, name="two_body",
                       params=params, inertia_fn=inertia_fn)

    def draw(xs):
        return [xs[0:2], xs[2:4]]

    return Example(
        name="Two-Body",
        coord_names=("r", "θ"),
        system=system,
        draw=draw,
        init_config=Config(jnp.array([2.0, 0.0]), jnp.array([0.0, omega0])),
    )
