"""Spherical pendulum — a 3-D Cartesian system (no reference analog).

Every reference demo embeds in the plane; this model exercises the
``m ≠ 2k`` general case: ``System 3 2`` with coordinates on the unit sphere,

    f(θ, φ) = (sin θ cos φ, sin θ sin φ, 1 − cos θ),

θ from the downward vertical, φ azimuthal.  ``U = g·m·z``.  The azimuthal
momentum ``p_φ`` (the z-angular momentum) is exactly conserved — a clean
closed-form check on the general-m machinery.
"""

from __future__ import annotations

import jax.numpy as jnp

from hamilton_tpu.models.base import Example
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system_cart

__all__ = ["spherical_pendulum"]


def spherical_pendulum(
    mass: float = 1.0,
    gravity: float = 5.0,
    theta0: float = 1.0,
    phi_dot0: float = 1.0,
) -> Example:
    """Pendulum bob free to swing in 3-D on a unit rod.

    Defaults start at θ₀ = 1 rad with azimuthal rate ``phi_dot0`` — a
    precessing orbit between two polar circles.
    """

    ftype = jnp.result_type(float)
    params = {
        "mass": jnp.asarray(mass, dtype=ftype),
        "gravity": jnp.asarray(gravity, dtype=ftype),
    }

    def inertia_fn(p):
        return jnp.stack([p["mass"], p["mass"], p["mass"]])

    def coords(q, p):
        th, ph = q[0], q[1]
        s = jnp.sin(th)
        return jnp.stack([s * jnp.cos(ph), s * jnp.sin(ph), 1.0 - jnp.cos(th)])

    system = mk_system_cart(
        None,
        coords,
        lambda x, p: (p["gravity"] * p["mass"]).astype(x.dtype) * x[2],
        n=2,
        name="spherical_pendulum",
        params=params,
        inertia_fn=inertia_fn,
    )

    def draw(xs):
        # project onto the (x, z) plane for the 2-D terminal plotter
        return [jnp.stack([xs[0], xs[2]])]

    return Example(
        name="Spherical pendulum",
        coord_names=("θ", "φ"),
        system=system,
        draw=draw,
        init_config=Config(
            jnp.array([theta0, 0.0]), jnp.array([0.0, phi_dot0])
        ),
    )
