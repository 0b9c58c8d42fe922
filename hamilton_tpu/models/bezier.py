"""Bead on a Bézier curve (reference ``bezier``, ``app/Examples.hs:164-183``).

A 1-DOF system whose single generalized coordinate is the curve parameter
``t``; the curve degree is set by the number of control points (the
reference's type-level point count, ``:166-168``).
"""

from __future__ import annotations

from math import comb
from typing import Sequence, Tuple

import jax
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

    # fused whole-step kernel: with unit masses the 1×1 mass matrix is
    # K(t) = x'(t)² + y'(t)² and ∂T/∂t|_w = (x'x'' + y'y'')·w², with the
    # derivative curves B' = n·Σ C(n−1,i)(1−t)^{n−1−i}t^i·(P_{i+1}−P_i)
    # (degree-reduced Bernstein form — plain +/* tile arithmetic) and
    # B'' analogously.  ∇U is the parameter-clamp walls' logistic
    # derivative.  Coefficient table: the flattened first/second-derivative
    # control points (sweepable like the points themselves).  Requires
    # k ≥ 2 control points (k = 1 has B' ≡ 0: K is singular on every path).
    import math

    k_pts = int(pts.shape[0])
    _WB = math.log(9.0) / 0.05
    _WH = 5.0

    def fused_forms(system):
        from hamilton_tpu.ops.pallas_step import FamilyFns, FusedForms

        pp = system.params["points"]
        deg = k_pts - 1

        def deriv_tables(arr):
            """(…, k, 2) control points → flat (…, 2(k−1) [+ 2(k−2)])
            first/second-derivative control points."""
            d1 = deg * (arr[..., 1:, :] - arr[..., :-1, :])
            flat1 = d1.reshape(d1.shape[:-2] + (2 * deg,))
            if deg >= 2:
                d2 = (deg - 1) * (d1[..., 1:, :] - d1[..., :-1, :])
                flat2 = d2.reshape(d2.shape[:-2] + (2 * (deg - 1),))
                return jnp.concatenate([flat1, flat2], axis=-1)
            return flat1

        consts = None
        if not isinstance(pp, jax.core.Tracer) and pp.ndim == 2:
            try:
                import numpy as _np

                consts = (tuple(float(v) for v in
                                _np.asarray(deriv_tables(pp)).ravel()),)
            except Exception:
                consts = None

        table_len = 2 * deg + (2 * (deg - 1) if deg >= 2 else 0)

        def arrays_fn(dtype):
            return (deriv_tables(jnp.asarray(pp).astype(dtype)),)

        def make(at, fm):
            def bernstein(t, one_t, d, base):
                """Σ C(d,i)(1−t)^{d−i} t^i · (x_i, y_i) from table entries
                ``base + 2i`` / ``base + 2i + 1``."""
                # power lists built once per evaluation point
                tp = [None] * (d + 1)
                up = [None] * (d + 1)
                tp[0] = None  # t^0 ≡ 1 handled by omission
                cur = t
                for i in range(1, d + 1):
                    tp[i] = cur
                    cur = cur * t
                cur = one_t
                for i in range(1, d + 1):
                    up[i] = cur
                    cur = cur * one_t

                def term(i, off):
                    v = at[0](base + 2 * i + off)
                    c = float(comb(d, i))
                    if isinstance(v, (int, float)):
                        w = fm.full(c * v, t)  # value-typed from the start
                    else:
                        w = c * v
                    if i > 0:
                        w = w * tp[i]
                    if d - i > 0:
                        w = w * up[d - i]
                    return w

                x = term(0, 0)
                y = term(0, 1)
                for i in range(1, d + 1):
                    x = x + term(i, 0)
                    y = y + term(i, 1)
                return x, y

            def aux(q):
                t = q[0]
                one_t = 1.0 - t
                xp, yp = bernstein(t, one_t, deg - 1, 0)
                if deg >= 2:
                    xpp, ypp = bernstein(t, one_t, deg - 2, 2 * deg)
                else:
                    xpp, ypp = fm.zero(t), fm.zero(t)
                return (xp, yp, xpp, ypp)

            def k_at(aux_v, q):
                xp, yp, _, _ = aux_v
                return lambda i, j: xp * xp + yp * yp

            def sigma(z):
                return 1.0 / (1.0 + fm.exp(0.0 - z))

            def dhdq(aux_v, q, w):
                xp, yp, xpp, ypp = aux_v
                sl = sigma(_WB * q[0])
                sr = sigma(_WB * (q[0] - 1.0))
                hb = _WH * _WB
                du = hb * (sr * (1.0 - sr)) - hb * (sl * (1.0 - sl))
                return [du - (xp * xpp + yp * ypp) * (w[0] * w[0])]

            def potential(aux_v, q):
                lft = _WH * sigma(_WB * q[0])
                rgt = _WH * sigma(_WB * (q[0] - 1.0))
                return (1.0 - lft) + rgt

            return FamilyFns(aux, k_at, dhdq, potential)

        return FusedForms(
            n=1, n_aux=4, coef_lens=(table_len,), consts=consts,
            arrays_fn=arrays_fn, make=make, name="bezier",
        )

    system = mk_system(
        jnp.array([1.0, 1.0]), coords, potential, n=1, name="bezier",
        params=params,
        fused_forms=fused_forms if k_pts >= 2 else None,
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
