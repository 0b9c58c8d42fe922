"""Double pendulum (reference ``doublePendulum``, ``app/Examples.hs:75-94``).

This is the baseline configuration system (BASELINE.md): ``System 4 2`` with
the second arm half-length, the chaotic workhorse for the ensemble benchmark.
The bob masses live in ``System.params`` (the reference takes them as CLI
arguments, ``app/Examples.hs:196``), so mass sweeps are first-class — batch
the ``params`` leaves and every path (library, tile, fused kernel) evaluates
per-member masses.
"""

from __future__ import annotations

import jax.numpy as jnp

from hamilton_tpu.models.base import Example
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system_cart

__all__ = ["double_pendulum"]


def double_pendulum(m1: float = 1.0, m2: float = 1.0) -> Example:
    """Double pendulum with bob masses ``m1``, ``m2`` (CLI defaults 1, 1).

    Coordinates (``app/Examples.hs:82-88``)::

        (sin θ₁, 1 − cos θ₁, sin θ₁ + sin θ₂ / 2, 1 − cos θ₁ − cos θ₂ / 2)

    potential ``U = 5(m₁y₁ + m₂y₂)`` (``:89``); initial state ``q = (π/2, 0)``,
    ``q̇ = (0, 0)`` (``:94``).
    """
    ftype = jnp.result_type(float)
    params = {
        "m1": jnp.asarray(m1, dtype=ftype),
        "m2": jnp.asarray(m2, dtype=ftype),
    }

    def inertia_fn(p):
        return jnp.stack([p["m1"], p["m1"], p["m2"], p["m2"]])

    def coords(q, p):
        t1, t2 = q[0], q[1]
        return jnp.stack(
            [
                jnp.sin(t1),
                1.0 - jnp.cos(t1),
                jnp.sin(t1) + jnp.sin(t2) / 2.0,
                1.0 - jnp.cos(t1) - jnp.cos(t2) / 2.0,
            ]
        )

    def potential(x, p):
        return 5.0 * (p["m1"].astype(x.dtype) * x[1]
                      + p["m2"].astype(x.dtype) * x[3])

    # fused whole-step kernel: the double pendulum is the planar serial
    # chain with lengths (1, ½) and gravity 5 (the model's constant offset
    # in y₂ does not enter ∇U, so the chain closed forms apply verbatim:
    # K₁₁ = m₁+m₂, K₁₂ = ½cos(θ₁−θ₂)m₂, K₂₂ = ¼m₂; the family potential
    # differs from the model's by the state-independent 2.5·m₂, which
    # cancels in every H−H₀ drift measurement).  The contract reads the
    # LIVE system's params: concrete masses bake immediates, traced/batched
    # masses become per-member coefficient tiles (sweeps).
    from hamilton_tpu.ops.pallas_step import serial_chain_forms

    def fused_forms(system):
        p = system.params
        return serial_chain_forms(
            jnp.stack([jnp.asarray(p["m1"]), jnp.asarray(p["m2"])], axis=-1),
            [1.0, 0.5], 5.0,
        )

    system = mk_system_cart(None, coords, potential, n=2,
                            name="double_pendulum", fused_forms=fused_forms,
                            params=params, inertia_fn=inertia_fn)

    def draw(xs):
        return [xs[0:2], xs[2:4]]

    return Example(
        name="Double pendulum",
        coord_names=("θ1", "θ2"),
        system=system,
        draw=draw,
        init_config=Config(jnp.array([jnp.pi / 2, 0.0]), jnp.array([0.0, 0.0])),
    )
