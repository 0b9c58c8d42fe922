"""Spring hanging from a block on a rail (reference ``spring``,
``app/Examples.hs:144-162``)."""

from __future__ import annotations

import jax.numpy as jnp

from hamilton_tpu.models.base import Example, logistic
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system

__all__ = ["spring"]


def spring(
    m_block: float = 2.0,
    m_weight: float = 1.0,
    k: float = 10.0,
    x0: float = 0.1,
) -> Example:
    """Block (mass ``m_block``) on a rail with a spring (constant ``k``,
    initial displacement ``x0``) holding a weight (mass ``m_weight``).

    Generalized coordinates ``(r, x, θ)``: block rail position, spring
    displacement, swing angle.  Cartesian map (``app/Examples.hs:152``)::

        (r, r + (1+x)·sin θ, (1+x)·(−cos θ))

    masses ``(mB, mW, mW)`` (``:151``); potential (``:153-158``): spring
    ``k·x²/2`` + rail walls at ``r = ∓1.5`` + gravity ``mB·(1+x)(−cos θ)``.
    Initial state ``q = (0, x0, 0)``, ``q̇ = (1, 0, −0.5)`` (``:162``).
    """
    left = logistic(-1.5, 25.0, 0.1)
    right = logistic(1.5, 25.0, 0.1)
    ftype = jnp.result_type(float)
    params = {
        "m_block": jnp.asarray(m_block, dtype=ftype),
        "m_weight": jnp.asarray(m_weight, dtype=ftype),
        "k": jnp.asarray(k, dtype=ftype),
    }

    def inertia_fn(p):
        return jnp.stack([p["m_block"], p["m_weight"], p["m_weight"]])

    def coords(q, p):
        r, x, th = q[0], q[1], q[2]
        return jnp.stack([r, r + (1.0 + x) * jnp.sin(th), (1.0 + x) * (-jnp.cos(th))])

    def potential(q, p):
        r, x, th = q[0], q[1], q[2]
        return (
            p["k"].astype(q.dtype) * x**2 / 2.0
            + (1.0 - left(r))
            + right(r)
            + p["m_block"].astype(q.dtype) * ((1.0 + x) * (-jnp.cos(th)))
        )

    system = mk_system(None, coords, potential, n=3, name="spring",
                       params=params, inertia_fn=inertia_fn)

    def draw(xs):
        # block at (r, 1); weight at (0, 1) + (x_w, y_w)   (app/Examples.hs:160)
        return [jnp.stack([xs[0], jnp.ones_like(xs[0])]), jnp.stack([xs[1], 1.0 + xs[2]])]

    return Example(
        name="Spring hanging from block",
        coord_names=("r", "x", "θ"),
        system=system,
        draw=draw,
        init_config=Config(jnp.array([0.0, x0, 0.0]), jnp.array([1.0, 0.0, -0.5])),
    )
