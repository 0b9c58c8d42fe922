"""N-link pendulum chain — the BASELINE stress config (no reference analog).

``System (2N, N)``: BASELINE.md's "20-link pendulum chain (System 40 20)
stressing batched 20×20 mass-matrix solves per step".  Link ``i`` hangs from
link ``i−1``; the Cartesian position of bob ``i`` is the cumulative sum of the
link vectors, so the coordinate map is a pair of ``cumsum``s — cheap to
evaluate, with a dense ``(2N, N)`` Jacobian that exercises the full
``JᵀMJ`` / Cholesky / Hessian-contraction pipeline.

All physics parameters (masses, lengths, gravity) live in ``System.params``
(the reference parameterizes every example at the CLI,
``app/Examples.hs:195-359``), so parameter sweeps are first-class: batch the
``params`` leaves (``System.replace_params`` / ``tree_map``) and every path —
the generic mechanics, the tile-resident solves, and the fused whole-step
kernel — evaluates per-member physics.  The inertia vector is derived from
``params["masses"]`` via ``inertia_fn`` and can never fall out of sync.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from hamilton_tpu.models.base import Example
from hamilton_tpu.state import Config
from hamilton_tpu.system import mk_system_cart

__all__ = ["chain"]


def chain(
    n_links: int = 20,
    masses: Optional[Sequence[float]] = None,
    link_length: float = 1.0,
    gravity: float = 5.0,
    theta0: float = 0.5,
    fused_solver: str = "dense",
) -> Example:
    """Chain of ``n_links`` pendulum links.

    Coordinates: bob ``i`` sits at
    ``x_i = Σ_{j≤i} l_j·sin θ_j``, ``y_i = Σ_{j≤i} l_j·(1 − cos θ_j)`` —
    the natural generalization of the reference double pendulum's coordinate
    map (``app/Examples.hs:82-88``) to N links.

    Potential: ``U = g·Σ_i m_i·y_i`` (gravity, same form as the reference's
    ``5(m₁y₁ + m₂y₂)``, ``app/Examples.hs:89``).

    Initial state: every link displaced by ``theta0``, at rest.
    """
    if masses is None:
        masses = [1.0] * n_links
    masses = jnp.asarray(masses, dtype=jnp.result_type(float))
    if masses.shape != (n_links,):
        raise ValueError(f"need {n_links} masses, got shape {masses.shape}")
    params = {
        "masses": masses,
        "lengths": jnp.full((n_links,), link_length,
                            dtype=jnp.result_type(float)),
        "gravity": jnp.asarray(gravity, dtype=jnp.result_type(float)),
    }

    # Cartesian layout is (x1..xN, y1..yN), NOT interleaved pairs: the
    # dynamics are invariant to the permutation (inertia permutes with it),
    # and the concatenated form avoids a pair-stacking relayout inside the
    # per-step Jacobian assembly (measured 26% faster leapfrog steps at
    # 16384×20 on v5e — docs/design.md journal).
    def inertia_fn(p):
        return jnp.concatenate([p["masses"], p["masses"]])

    def coords(q, p):
        ls = p["lengths"].astype(q.dtype)
        x = jnp.cumsum(ls * jnp.sin(q))
        y = jnp.cumsum(ls * (1.0 - jnp.cos(q)))
        return jnp.concatenate([x, y])  # (x1..xN, y1..yN)

    # Closed-form Jacobian of the cumsum map: ∂x_i/∂θ_j = l_j·cosθ_j·[j ≤ i],
    # ∂y_i/∂θ_j = l_j·sinθ_j·[j ≤ i] — a lower-triangular mask times one
    # cos/sin row each.  Equals jacfwd(coords) (unit-tested); materializing
    # it via AD costs n tangent passes of coords and was measured as 2/3 of
    # the whole ensemble step (docs/design.md "Round-2 hot-loop reductions").
    tril = jnp.tril(jnp.ones((n_links, n_links), dtype=bool))

    def jacobian_fn(q, p):
        ls = p["lengths"].astype(q.dtype)
        jx = jnp.where(tril, (ls * jnp.cos(q))[None, :], 0.0)
        jy = jnp.where(tril, (ls * jnp.sin(q))[None, :], 0.0)
        return jnp.concatenate([jx, jy], axis=0)  # (2N, N)

    # Closed-form mass matrix: K[i,j] = Σ_k m_k·(∂x_k/∂θ_i·∂x_k/∂θ_j +
    # ∂y_k/∂θ_i·∂y_k/∂θ_j) = l_i·l_j·cos(θ_i−θ_j)·S_max(i,j) with the suffix
    # mass sums S_r = Σ_{k≥r} m_k — n² elementwise ops, no Jacobian.  Equals
    # JᵀMJ (unit-tested); on the ensemble hot path this removes the (B, m, n)
    # Jacobian materialization entirely (docs/design.md "Round-2 hot-loop
    # reductions").  The suffix sums are recomputed from the live params
    # each call (O(n) — negligible next to the n² trig), so swept masses
    # flow straight through.
    def mass_matrix_fn(q, p):
        ms = p["masses"].astype(q.dtype)
        ls = p["lengths"].astype(q.dtype)
        suffix = jnp.cumsum(ms[::-1])[::-1]  # S_r
        s_pair = jnp.minimum(suffix[:, None], suffix[None, :])  # S_max(i,j)
        ll = ls[:, None] * ls[None, :]
        return ll * jnp.cos(q[:, None] - q[None, :]) * s_pair

    # NO ``dtdq_fn`` override here, deliberately: chain's ∂T/∂q closed forms
    # were measured SLOWER than the AD sweep on TPU (16384×20 leapfrog A/B,
    # scripts/perf_ab_analytic.py): the O(n²) pairwise form
    # −l²·w_k·Σ_j sin(θ_k−θ_j)·S_max(k,j)·w_j costs 1.50 vs 0.95 ms/step
    # ((B, n, n) sin + reduce traffic), and the O(n) prefix/suffix-cumsum
    # separation 1.00 ms/step — the AD sweep through the cumsum-shaped
    # coords is already cumsum-structured, so hand forms only add work
    # (docs/design.md "Round-2 hot-loop reductions").

    def potential_cart(xs, p):
        ms = p["masses"].astype(xs.dtype)
        g = p["gravity"].astype(xs.dtype)
        return g * jnp.sum(ms * xs[n_links:])

    # Fused whole-step kernel (opt-in via method="leapfrog_fused"): the
    # planar-serial-chain closed forms let the entire Verlet step run inside
    # one Pallas kernel with the state resident in register tiles
    # (ops/pallas_step.py).  The family contract reads the LIVE system's
    # params, so concrete models bake immediates (the headline mode) while
    # traced or batched params become per-member coefficient tiles (sweeps).
    # ``fused_solver`` picks the kernel's linear algebra: "dense" is the
    # generic in-register O(n³) Cholesky; "semiseparable" the exact O(n)
    # factorization exploiting K's semiseparable structure
    # (serial_chain_forms_on) — same fixed points, ~5n factor carry.
    from hamilton_tpu.ops.pallas_step import (
        serial_chain_forms, serial_chain_forms_linv,
        serial_chain_forms_mobius, serial_chain_forms_on,
    )

    factories = {
        "dense": serial_chain_forms,
        "semiseparable": serial_chain_forms_on,
        # "linv": semiseparable factorization + explicit L⁻¹ mat-vec
        # solves (log-depth reductions) — trades ~2× flops for ~5× less
        # solve latency; measured per-config, see docs/design.md
        "linv": serial_chain_forms_linv,
        # "mobius": the semiseparable factorization with its Riccati
        # recursion collapsed to a division/sqrt-free scalar Möbius chain —
        # ~2n critical-path depth at the same flop count (round 5)
        "mobius": serial_chain_forms_mobius,
    }
    if fused_solver not in factories:
        raise ValueError(
            f"fused_solver must be one of {sorted(factories)}, "
            f"got {fused_solver!r}"
        )
    forms_factory = factories[fused_solver]

    def fused_forms(system):
        p = system.params
        return forms_factory(p["masses"], p["lengths"], p["gravity"])

    system = mk_system_cart(
        None, coords, potential_cart, n=n_links, name=f"chain{n_links}",
        jacobian_fn=jacobian_fn, mass_matrix_fn=mass_matrix_fn,
        fused_forms=fused_forms, params=params, inertia_fn=inertia_fn,
    )

    def draw(xs):
        return [jnp.stack([xs[i], xs[n_links + i]]) for i in range(n_links)]

    return Example(
        name=f"{n_links}-link chain",
        coord_names=tuple(f"θ{i+1}" for i in range(n_links)),
        system=system,
        draw=draw,
        init_config=Config(
            jnp.full((n_links,), theta0), jnp.zeros((n_links,))
        ),
    )
