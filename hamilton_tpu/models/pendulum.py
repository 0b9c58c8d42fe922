"""Single pendulum (reference ``pendulum``, ``app/Examples.hs:61-73``)."""

from __future__ import annotations

import jax.numpy as jnp

from hamilton_tpu.models.base import Example
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system_cart

__all__ = ["pendulum"]


def pendulum(theta0: float = 0.0, omega0: float = 1.0) -> Example:
    """Pendulum bob at angle θ: ``System 2 1``, coordinates
    ``(sin θ, 0.5 − cos θ)``, unit masses, gravity potential ``U = y``.

    ``theta0``/``omega0`` are the initial angle (radians) and angular
    velocity (CLI flags ``--angle``/``--vel``; the reference CLI converts the
    angle from degrees before calling, ``app/Examples.hs:391``).
    """
    # fused whole-step kernel: the pendulum is the n=1 planar serial chain
    # (K = 1, ∇U = sin θ — the family potential differs from the model's by
    # the constant −0.5, which cancels in every H−H₀ drift measurement).
    # No physics params: the pendulum's constants are structural (unit mass,
    # unit length, unit gravity — reference app/Examples.hs:61-73).
    from hamilton_tpu.ops.pallas_step import serial_chain_forms

    system = mk_system_cart(
        jnp.array([1.0, 1.0]),
        lambda q: jnp.stack([jnp.sin(q[0]), 0.5 - jnp.cos(q[0])]),
        lambda x: x[1],
        n=1,
        name="pendulum",
        fused_forms=lambda system: serial_chain_forms([1.0], [1.0], 1.0),
    )

    def draw(xs):
        return [xs]

    return Example(
        name="Single pendulum",
        coord_names=("θ",),
        system=system,
        draw=draw,
        init_config=Config(jnp.array([theta0]), jnp.array([omega0])),
    )
