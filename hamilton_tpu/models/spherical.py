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

    # fused whole-step kernel: the sphere map's mass matrix is DIAGONAL,
    # K = diag(m, m·sin²θ) (JᵀMJ of the unit-sphere embedding), with
    # ∂H/∂θ = g·m·sinθ − m·sinθ·cosθ·w_φ² and ∂H/∂φ = 0 (azimuthal
    # momentum conservation, exact in the closed forms).  U = g·m·(1−cosθ)
    # matches the model's Cartesian potential exactly.  Like the library
    # path, the forms are singular at the poles (sinθ = 0).
    def fused_forms(system):
        from hamilton_tpu.ops.pallas_step import (
            FamilyFns, FusedForms, concrete_scalar,
        )

        p = system.params
        m_c = concrete_scalar(p["mass"])
        g_c = concrete_scalar(p["gravity"])
        consts = None
        if m_c is not None and g_c is not None:
            consts = ((m_c, g_c * m_c),)

        def arrays_fn(dtype):
            m_ = jnp.asarray(p["mass"]).astype(dtype)
            g_ = jnp.asarray(p["gravity"]).astype(dtype)
            return (jnp.stack([m_, g_ * m_], axis=-1),)

        def make(at, fm):
            mass = lambda: at[0](0)  # noqa: E731
            gm = lambda: at[0](1)    # noqa: E731  g·m

            def aux(q):
                return (fm.sin(q[0]), fm.cos(q[0]))

            def k_at(aux_v, q):
                s, _ = aux_v

                def at_(i, j):
                    if (i, j) == (0, 0):
                        return fm.full(mass(), s)
                    if (i, j) == (1, 1):
                        return mass() * (s * s)
                    return fm.zero(s)

                return at_

            def dhdq(aux_v, q, w):
                s, c = aux_v
                return [
                    gm() * s - mass() * (s * c) * (w[1] * w[1]),
                    fm.zero(s),
                ]

            def potential(aux_v, q):
                _, c = aux_v
                return gm() * (1.0 - c)

            return FamilyFns(aux, k_at, dhdq, potential)

        return FusedForms(
            n=2, n_aux=2, coef_lens=(2,), consts=consts,
            arrays_fn=arrays_fn, make=make, name="spherical_pendulum",
        )

    system = mk_system_cart(
        None,
        coords,
        lambda x, p: (p["gravity"] * p["mass"]).astype(x.dtype) * x[2],
        n=2,
        name="spherical_pendulum",
        params=params,
        inertia_fn=inertia_fn,
        fused_forms=fused_forms,
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
