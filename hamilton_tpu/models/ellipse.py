"""Bead on an ellipse — BASELINE configs[1] ("bead-on-ellipse 1-2 DOF
constrained systems").

A 1-DOF constrained system in the reference's style (constraint implicit in
the coordinate map, ``README.md:43-47``): the bead's generalized coordinate
is the ellipse parameter angle; gravity drives it.  With ``a == b`` this is
a circular pendulum re-parameterized.
"""

from __future__ import annotations

import jax.numpy as jnp

from hamilton_tpu.models.base import Example
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system_cart

__all__ = ["ellipse"]


def ellipse(
    a: float = 2.0,
    b: float = 1.0,
    mass: float = 1.0,
    gravity: float = 5.0,
    theta0: float = 2.0,
    omega0: float = 0.0,
) -> Example:
    """Bead of ``mass`` on an ellipse with semi-axes ``(a, b)``:
    coordinates ``(a·sin θ, b·(1 − cos θ))`` (θ measured from the bottom),
    potential ``U = g·m·y``."""

    ftype = jnp.result_type(float)
    params = {
        "a": jnp.asarray(a, dtype=ftype),
        "b": jnp.asarray(b, dtype=ftype),
        "mass": jnp.asarray(mass, dtype=ftype),
        "gravity": jnp.asarray(gravity, dtype=ftype),
    }

    def inertia_fn(p):
        return jnp.stack([p["mass"], p["mass"]])

    def coords(q, p):
        th = q[0]
        return jnp.stack([
            p["a"].astype(q.dtype) * jnp.sin(th),
            p["b"].astype(q.dtype) * (1.0 - jnp.cos(th)),
        ])

    system = mk_system_cart(
        None,
        coords,
        lambda x, p: (p["gravity"] * p["mass"]).astype(x.dtype) * x[1],
        n=1,
        name="ellipse",
        params=params,
        inertia_fn=inertia_fn,
    )

    def draw(xs):
        return [xs]

    return Example(
        name="Bead on ellipse",
        coord_names=("θ",),
        system=system,
        draw=draw,
        init_config=Config(jnp.array([theta0]), jnp.array([omega0])),
    )
