"""Fused whole-step Pallas kernel for planar serial-chain systems.

The tile-resident hot loop (:mod:`hamilton_tpu.ops.pallas_solve`) still pays
one HBM round-trip per *operation* — factor, five solves, three AD sweeps and
their elementwise glue each read and write (B, n)-to-(B, n²)-sized arrays.
At 16384×chain-20 that is ~0.95 ms/step while the arithmetic itself is worth
~60 µs: the step is pure memory traffic.

This module collapses the **entire generalized Störmer-Verlet step** into one
Pallas kernel for the *planar serial linkage* family (pendulum, double
pendulum, N-link chain — reference ``app/Examples.hs:61-183`` members plus
the BASELINE chain config), whose closed forms make every per-step quantity
computable from ``2n`` transcendentals and per-link coefficients:

* mass matrix      ``K_ij(q)   = l_i·l_j·cos(θ_i−θ_j)·S_max(i,j)``
* potential grad   ``∇U_i(q)   = g·l_i·sin(θ_i)·S_i``
* kinetic gradient ``∂T/∂θ_k|w = −l_k·w_k·Σ_j l_j·sin(θ_k−θ_j)·S_kj·w_j``

with ``S_r = Σ_{k≥r} m_k`` the suffix mass sums.  All pairwise
``sin/cos(θ_i−θ_j)`` come from the ``n`` sin/cos pairs by the angle-subtraction
identities — vector FMAs, not transcendentals.  The kernel keeps the whole
step in registers/VMEM (batch-in-registers layout, one (8, 128) tile per
scalar — see pallas_solve.py); per step the only HBM traffic is the (B, n)
state in and out.  The fixed points are warm-started from the previous
step's converged force/velocity-derivative (carried tiles), and inside
``steps_per_call`` blocks the end-of-step factor+trig ride the Mosaic loop
carry so only the first step of a block pays the q₀ factorization (exact
for ``iters_q ≥ 1``; see ``increments``).

**Parameters are first-class operands.**  When the masses/lengths/gravity
are concrete unbatched values, the coefficient tables ``C_ij = l_i·l_j·S_ij``
and ``g·l_i·S_i`` are baked into the kernel as immediate scalars (the
fastest mode, and the headline-bench path).  When any of them is traced or
carries a leading batch axis — a **parameter sweep** — the coefficients are
materialized per member as ``(G, n², 8, 128)`` / ``(G, n, 8, 128)`` tile
operands computed once at ``init`` and carried alongside the state, so a
16k (IC × mass-grid) ensemble runs through the same fused kernel with
per-member physics (the reference parameterizes every example,
``app/Examples.hs:195-359``; masses are plain data,
``Numeric/Hamilton.hs:201-215``).  Traced-but-unbatched (shared) parameters
get a single ``(1, …)`` tile group whose block-index map reuses block 0 for
every grid step, so gradients w.r.t. scalar masses don't pay B-fold
coefficient traffic.

**The fused step is differentiable.**  The kernel itself is an opaque Mosaic
program, so reverse-mode runs through an *exact replay*: a pure-jnp mirror
of the identical arithmetic (same closed forms, same fixed-point iteration
order, same factor carry) evaluated under ``jax.checkpoint`` inside the
backward pass.  ``jax.grad`` through ``leapfrog_fused``/``yoshida4_fused``
therefore matches the library-path gradient (tested), including gradients
with respect to the per-member parameter tiles (mass/length/gravity
sensitivities) and ``dt``.

The evolution state stays in tile layout **across steps** (the Stepper carry
is the tiled state), so chained steps move no layout at all; ``extract`` is
the only relayout and runs once per emission/drift sample.

This is an opt-in hot path: systems carrying these closed forms attach a
factory as ``System.pallas_step`` (called with the live system, so the
parameters come from ``System.params``) and callers select it with
``method="leapfrog_fused"``; the generic AD/library path stays the default
and the correctness reference (parity unit-tested in interpreter mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hamilton_tpu.state import Phase

__all__ = ["serial_chain_stepper", "YOSHIDA4_COMPOSITION"]

TILE_B = 8 * 128

# Yoshida/Suzuki triple jump over a symmetric order-2 base: raises to order 4
_GAMMA = 2.0 ** (1.0 / 3.0)
YOSHIDA4_COMPOSITION = (
    1.0 / (2.0 - _GAMMA), -_GAMMA / (2.0 - _GAMMA), 1.0 / (2.0 - _GAMMA),
)


def _suffix_sums(xs):
    out, acc = [], 0.0
    for x in reversed(xs):
        acc += float(x)
        out.append(acc)
    return list(reversed(out))


def _to_tiles(x: jax.Array) -> jax.Array:
    """(B, k) → (G, k, 8, 128) with member b = g·1024 + s·128 + l."""
    b, k = x.shape
    return jnp.moveaxis(x.reshape(b // TILE_B, 8, 128, k), 3, 1)


def _from_tiles(xt: jax.Array) -> jax.Array:
    """(G, k, 8, 128) → (B, k)."""
    g, k = xt.shape[0], xt.shape[1]
    return jnp.moveaxis(xt, 1, 3).reshape(g * TILE_B, k)


def _concrete_vec(x, n: int):
    """``x`` as a list of n Python floats if it is concrete and unbatched,
    else None (→ runtime-operand mode)."""
    if isinstance(x, jax.core.Tracer):
        return None
    if isinstance(x, (list, tuple)):
        if len(x) != n:
            raise ValueError(f"expected {n} per-link values, got {len(x)}")
        try:
            return [float(v) for v in x]
        except TypeError:
            return None
    if hasattr(x, "ndim"):
        if x.ndim != 1:
            return None
        try:
            import numpy as np

            return [float(v) for v in np.asarray(x)]
        except Exception:
            return None
    return None


def _concrete_scalar(x):
    if isinstance(x, jax.core.Tracer):
        return None
    if isinstance(x, (int, float)):
        return float(x)
    if hasattr(x, "ndim"):
        if x.ndim != 0:
            return None
        try:
            return float(x)
        except Exception:
            return None
    return None


def serial_chain_stepper(
    masses,
    lengths,
    gravity,
    *,
    iters=(3, 1),
    compensated: bool = False,
    steps_per_call: int = 1,
    composition=(1.0,),
):
    """Build a fused whole-step leapfrog :class:`Stepper` for a planar serial
    chain with the given per-link masses/lengths and gravity.

    ``masses``/``lengths`` are length-n sequences or arrays ``(..., n)``;
    ``gravity`` a scalar or ``(...)`` array.  Concrete unbatched values are
    baked into the kernel as immediate constants (the fastest mode); traced
    or batched values become per-member coefficient tiles computed at
    ``init`` and carried with the state (parameter sweeps: a leading batch
    axis must EQUAL the state batch ``B``, matching the library path's
    member-pairwise vmap semantics).

    ``iters=(iters_p, iters_q)`` are the momentum/position fixed-point
    counts, both *exact* (fresh in-register factorization per iterate);
    ``iters_q=0`` selects the predictor-factor (Gauss-Seidel) placement
    matching the library's mode.  State batches must be ``(B, n)`` with
    ``B`` a multiple of 1024.

    ``steps_per_call`` executes that many consecutive dt-steps inside ONE
    kernel invocation (a Mosaic-level ``fori_loop`` whose carry lives in
    registers/VMEM), and the resulting ``Stepper`` reports it as
    ``.substeps`` so evolution drivers keep step counts and drift-sampling
    cadence aligned.  Its value comes from the **factor carry**: steps
    1..S−1 of a block skip the q₀ trig+factorization entirely (see
    ``increments``), measured 0.114 → 0.088 ms/step at 16384×chain-20 with
    S=50.  (Raw per-kernel-call launch cost inside a compiled loop is
    negligible on this backend — the ~25 ms fixed cost is per *jit
    dispatch* through the device relay, which long-chunk drivers
    amortize.)

    ``composition`` is a tuple of dt-scale coefficients executed as
    consecutive substeps *inside* each dt-step — ``(1.0,)`` is plain
    Verlet; the Yoshida triple jump ``(w1, w0, w1)`` yields the 4th-order
    method with the factor carried across substeps (the warm quantities
    are physical, so their dt-scaling survives the sign alternation).
    """
    from hamilton_tpu.integrators.fixed import Stepper, _kahan_add  # no cycle

    if isinstance(masses, (list, tuple)):
        n = len(masses)
    else:
        n = int(masses.shape[-1])
    n_len = len(lengths) if isinstance(lengths, (list, tuple)) else int(
        lengths.shape[-1]
    )
    if n_len != n:
        raise ValueError(f"need {n} lengths, got {n_len}")
    iters_p, iters_q = iters if isinstance(iters, tuple) else (iters, iters)
    if iters_p < 1:
        raise ValueError("fused leapfrog needs iters_p >= 1")
    if iters_q < 0:
        raise ValueError(
            f"iters_q must be >= 0 (0 selects the predictor-factor mode), "
            f"got {iters_q}"
        )
    composition = tuple(float(w) for w in composition)

    m_c = _concrete_vec(masses, n)
    l_c = _concrete_vec(lengths, n)
    g_c = _concrete_scalar(gravity)
    static_mode = m_c is not None and l_c is not None and g_c is not None
    n_par = 0 if static_mode else 2  # (cm, gu) tile operands

    if static_mode:
        suff = _suffix_sums(m_c)  # S_r
        # K/sweep coefficient C_ij = l_i·l_j·S_max(i,j); ∇U coeff g·l_i·S_i
        c_mat = [
            [l_c[i] * l_c[j] * suff[max(i, j)] for j in range(n)]
            for i in range(n)
        ]
        gu_c = [g_c * l_c[i] * suff[i] for i in range(n)]

    def coef_arrays(dtype):
        """Runtime mode: the (..., n, n) / (..., n) coefficient arrays from
        the (possibly traced/batched) parameters."""
        m_ = jnp.asarray(masses).astype(dtype)
        l_ = jnp.asarray(lengths).astype(dtype)
        g_ = jnp.asarray(gravity).astype(dtype)
        suffix = jnp.cumsum(m_[..., ::-1], axis=-1)[..., ::-1]  # S_r
        # S_max(i,j) = min(S_i, S_j): the suffix sums are non-increasing
        smax = jnp.minimum(suffix[..., :, None], suffix[..., None, :])
        cmat = l_[..., :, None] * l_[..., None, :] * smax
        gu = g_[..., None] * l_ * suffix
        return cmat, gu

    # -- step arithmetic, parametrized over the coefficient accessors -----
    # ``cm(i, j)``/``gu_at(i)``/``diag(i, like)`` return either Python floats
    # (static mode) or per-member values (tiles in the kernel, (B,) columns
    # in the replay) — the arithmetic below is agnostic.

    def trig(q):
        return [jnp.sin(qi) for qi in q], [jnp.cos(qi) for qi in q]

    # reuse the unrolled tile-entry factor/solve bodies from pallas_solve
    from hamilton_tpu.ops.pallas_solve import _chol_entries, _solve_entries

    def _pack_fac(low, inv_d, s, c):
        """Factor+trig as a flat pytree (loop-carryable tile tuples)."""
        flat = tuple(low[(i, j)] for i in range(n) for j in range(i + 1))
        return (flat, tuple(inv_d), tuple(s), tuple(c))

    def _unpack_fac(fac):
        flat, inv_d, s, c = fac
        low, k = {}, 0
        for i in range(n):
            for j in range(i + 1):
                low[(i, j)] = flat[k]
                k += 1
        return low, list(inv_d), list(s), list(c)

    def make_increments(cm, gu_at, diag):
        def k_at(s, c):
            def at(i, j):
                if i == j:
                    # cos(0)·C_ii exactly (not c²+s² with its rounding)
                    return diag(i, s[0])
                return cm(i, j) * (c[i] * c[j] + s[i] * s[j])

            return at

        def dhdq(s, c, w):
            """∂H/∂q = ∇U − ∂T/∂q|_w, from the trig pairs at this q.

            Dot-product form: Σ_j C_kj·sin(θk−θj)·w_j = s_k·Σ_j C_kj·(c_j·w_j)
            − c_k·Σ_j C_kj·(s_j·w_j) — 4n²+O(n) vector ops instead of 6n²
            (the j=k term contributes s_k·C_kk·c_k·w_k to both sums and
            cancels exactly in real arithmetic; in floats it perturbs at the
            rounding level, below the integrator's own f32 noise)."""
            cw = [c[j] * w[j] for j in range(n)]
            sw = [s[j] * w[j] for j in range(n)]
            out = []
            for k in range(n):
                acc_c = cm(k, 0) * cw[0]
                acc_s = cm(k, 0) * sw[0]
                for j in range(1, n):
                    acc_c = acc_c + cm(k, j) * cw[j]
                    acc_s = acc_s + cm(k, j) * sw[j]
                out.append(
                    gu_at(k) * s[k] + w[k] * (s[k] * acc_c - c[k] * acc_s)
                )
            return out

        def increments(q0, p0, a_est, vdot_est, dt, half, fac0=None):
            """Lists of per-member values → (dq_inc, dp_inc, warm', fac1).

            ``(a_est, vdot_est)`` warm-start the two fixed points from the
            previous step's converged force / velocity derivative, exactly as
            the library stepper does (fixed.py): the fixed *points* are
            unchanged, only the residual after the static iteration counts
            shrinks — measured on-TPU f32 drift at 16384×chain-20, 1e4 steps:
            cold (3,1) 6.7e-7 vs warm (3,1) at the converged level (the cold
            residual dominates the Kahan-compensated rounding floor).

            ``fac0``, when given, replaces the q₀ trig+factorization with the
            previous step's end-of-step factor and trig (``fac1``): for
            ``iters_q ≥ 1`` the carried factor was computed at exactly this
            q₀ (the converged q₁) so the substitution is EXACT; for
            ``iters_q=0`` it is the predictor factor, consistently stale by
            O(dt³) — the same placement the library's Gauss-Seidel mode runs,
            measured at converged drift.  Used inside multi-step blocks,
            where the carry lives in VMEM (through HBM it would cost more
            than it saves)."""
            if fac0 is not None:
                low0, inv_d0, s0, c0 = _unpack_fac(fac0)
            else:
                s0, c0 = trig(q0)
                low0, inv_d0 = _chol_entries(k_at(s0, c0), n)
            ph = [p0[i] - half * a_est[i] for i in range(n)]
            a_last = a_est
            for _ in range(iters_p):
                w = _solve_entries(low0, inv_d0, lambda i: ph[i], n)
                a_last = dhdq(s0, c0, w)
                ph = [p0[i] - half * a_last[i] for i in range(n)]
            v0 = _solve_entries(low0, inv_d0, lambda i: ph[i], n)
            q1 = [q0[i] + dt * v0[i] + (dt * half) * vdot_est[i]
                  for i in range(n)]  # warm predictor
            v_last = v0
            if iters_q == 0:
                # predictor-factor placement (cf. fixed.py Gauss-Seidel
                # mode): one factor at the O(dt²) predictor serves the
                # q-refinement and the end-of-step force
                s1, c1 = trig(q1)
                low1, inv_d1 = _chol_entries(k_at(s1, c1), n)
                v_last = _solve_entries(low1, inv_d1, lambda i: ph[i], n)
                q1 = [q0[i] + half * (v0[i] + v_last[i]) for i in range(n)]
                # force at the refined q1 with the predictor factor velocity
                s1r, c1r = trig(q1)
                b = dhdq(s1r, c1r, v_last)
                fac1 = _pack_fac(low1, inv_d1, s1r, c1r)
            else:
                for _ in range(iters_q):
                    s1, c1 = trig(q1)
                    low1, inv_d1 = _chol_entries(k_at(s1, c1), n)
                    v_last = _solve_entries(low1, inv_d1, lambda i: ph[i], n)
                    q1 = [q0[i] + half * (v0[i] + v_last[i]) for i in range(n)]
                # exact end-of-step factor at the converged q1
                s1, c1 = trig(q1)
                low1, inv_d1 = _chol_entries(k_at(s1, c1), n)
                w1 = _solve_entries(low1, inv_d1, lambda i: ph[i], n)
                b = dhdq(s1, c1, w1)
                fac1 = _pack_fac(low1, inv_d1, s1, c1)
            dq_inc = [half * (v0[i] + v_last[i]) for i in range(n)]
            dp_inc = [-half * (a_last[i] + b[i]) for i in range(n)]
            inv_dt = 1.0 / dt
            vdot1 = [(v_last[i] - v0[i]) * inv_dt for i in range(n)]
            return dq_inc, dp_inc, b, vdot1, fac1

        return increments

    if static_mode:
        increments_static = make_increments(
            lambda i, j: c_mat[i][j],
            lambda i: gu_c[i],
            lambda i, like: jnp.full_like(like, c_mat[i][i]),
        )

    def build_step_once(increments, dt, half):
        """One dt-step body (runs the composition substeps), with or without
        Kahan-compensated accumulation; state entries are per-member values
        (tiles in the kernel, columns in the replay)."""
        if not compensated:

            def step_once(state, fac):
                qs, ps, avs, vds = state
                for w in composition:
                    dq, dp, b, vd1, fac = increments(
                        list(qs), list(ps), list(avs), list(vds),
                        w * dt, w * half, fac0=fac,
                    )
                    qs = tuple(qs[i] + dq[i] for i in range(n))
                    ps = tuple(ps[i] + dp[i] for i in range(n))
                    avs, vds = tuple(b), tuple(vd1)
                return (qs, ps, avs, vds), fac

            return step_once

        def step_once(state, fac):
            qs, ps, cqs, cps, avs, vds = state
            for w in composition:
                dq, dp, b, vd1, fac = increments(
                    list(qs), list(ps), list(avs), list(vds),
                    w * dt, w * half, fac0=fac,
                )
                new_q, new_cq, new_p, new_cp = [], [], [], []
                for i in range(n):
                    qi, cqi = _kahan_add(qs[i], cqs[i], dq[i])
                    pi, cpi = _kahan_add(ps[i], cps[i], dp[i])
                    new_q.append(qi)
                    new_cq.append(cqi)
                    new_p.append(pi)
                    new_cp.append(cpi)

                qs, ps = tuple(new_q), tuple(new_p)
                cqs, cps = tuple(new_cq), tuple(new_cp)
                avs, vds = tuple(b), tuple(vd1)
            return (qs, ps, cqs, cps, avs, vds), fac

        return step_once

    n_sv = 6 if compensated else 4  # state vectors per member

    class _View:
        def __init__(self, ref):
            self._ref = ref

        def __getitem__(self, i):
            return self._ref[0, i]

        def __setitem__(self, i, val):
            self._ref[0, i] = val

    def _multi(step_once, state):
        """Run ``steps_per_call`` step bodies; the carry (a tuple of tile
        tuples) stays in registers/VMEM across the Mosaic-level loop.

        Step 0 is peeled (no carried factor at block entry — carrying it
        through HBM between dispatches would cost more than it saves);
        steps 1..S−1 run in a Mosaic-level ``fori_loop`` whose carry
        includes the end-of-step factor+trig, so they skip the q₀
        trig+factorization entirely."""
        state, fac = step_once(state, None)
        if steps_per_call == 1:
            return state
        out = jax.lax.fori_loop(
            0, steps_per_call - 1,
            lambda i, sf: step_once(sf[0], sf[1]), (state, fac),
        )
        return out[0]

    def kernel(*refs):
        # refs: dt, [cm, gu,] n_sv state-in, n_sv state-out
        dt = refs[0][...]
        half = dt * 0.5
        if static_mode:
            increments = increments_static
        else:
            cm_v, gu_v = _View(refs[1]), _View(refs[2])
            increments = make_increments(
                lambda i, j: cm_v[i * n + j],
                lambda i: gu_v[i],
                lambda i, like: cm_v[i * n + i],
            )
        in_views = [_View(r) for r in refs[1 + n_par: 1 + n_par + n_sv]]
        out_views = [_View(r) for r in refs[1 + n_par + n_sv:]]
        step_once = build_step_once(increments, dt, half)
        state = tuple(
            tuple(r[i] for i in range(n)) for r in in_views
        )
        state = _multi(step_once, state)
        for vi, r in enumerate(out_views):
            for i in range(n):
                r[i] = state[vi][i]

    def _call(dt_tile, ops):
        g = ops[n_par].shape[0]

        def vec_spec(k, shared=False):
            # ``shared``: a single-group operand (params identical for every
            # member) — every grid step reads block 0 instead of carrying
            # B-fold redundant per-member copies through HBM
            if shared:
                return pl.BlockSpec(
                    (1, k, 8, 128), lambda gg: (gg * 0,) * 4,
                    memory_space=pltpu.VMEM,
                )
            return pl.BlockSpec(
                (1, k, 8, 128), lambda gg: (gg, gg * 0, gg * 0, gg * 0),
                memory_space=pltpu.VMEM,
            )

        dt_spec = pl.BlockSpec(
            (8, 128), lambda gg: (gg * 0, gg * 0), memory_space=pltpu.VMEM
        )
        param_specs = (
            [vec_spec(n * n, ops[0].shape[0] == 1),
             vec_spec(n, ops[1].shape[0] == 1)]
            if n_par else []
        )
        state_specs = [vec_spec(n)] * n_sv

        def sds(t):
            # propagate the varying-across-mesh-axes set so the kernel
            # composes with shard_map (check_vma requires it on out_shape)
            vma = getattr(jax.typeof(t), "vma", None)
            if vma is not None:
                return jax.ShapeDtypeStruct((g, n, 8, 128), t.dtype, vma=vma)
            return jax.ShapeDtypeStruct((g, n, 8, 128), t.dtype)

        out_shapes = tuple(sds(t) for t in ops[n_par:])
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[dt_spec] + param_specs + state_specs,
            out_specs=tuple(state_specs),
            out_shape=out_shapes,
        )(dt_tile, *ops)

    def _replay(dt_tile, *ops):
        """Pure-jnp mirror of the kernel: identical arithmetic on (B,)
        member columns, used as the reverse-mode path (``jax.checkpoint``-ed
        per step so the backward memory is O(steps) small residuals, not the
        full unrolled block).  Forward-executing this instead of the kernel
        reproduces the kernel's math exactly (same operation order)."""
        state_tiles = ops[n_par:]
        arrays = [_from_tiles(t) for t in state_tiles]  # (B, n)
        b = arrays[0].shape[0]
        if static_mode:
            increments = increments_static
        else:
            cm_cols = _from_tiles(ops[0])  # (B, n²) — or (1024, n²) shared
            gu_cols = _from_tiles(ops[1])  # (B, n)
            if cm_cols.shape[0] != b:
                # shared single-group operands: every lane holds the same
                # value; keep lane 0 as a length-1 column that broadcasts
                # over members (its cotangent lands in lane 0, and init's
                # broadcast_to sums lanes, so parameter grads are exact)
                cm_cols, gu_cols = cm_cols[:1], gu_cols[:1]
            increments = make_increments(
                lambda i, j: cm_cols[:, i * n + j],
                lambda i: gu_cols[:, i],
                lambda i, like: cm_cols[:, i * n + i],
            )
        # per-member dt: the kernel multiplies the (8, 128) dt tile
        # elementwise into every member lane (shared across groups)
        dt_col = jnp.broadcast_to(
            dt_tile.reshape(1, TILE_B), (b // TILE_B, TILE_B)
        ).reshape(b)
        half = dt_col * 0.5
        step_once = build_step_once(increments, dt_col, half)
        state = tuple(
            tuple(a[:, i] for i in range(n)) for a in arrays
        )
        import os

        # Loop strategy for steps 1..S-1 of the replay.  Default is an
        # UNROLLED chain of checkpointed steps: reverse-differentiating a
        # lax.scan of this body never finished compiling through this
        # environment's remote TPU compile service (>20 min observed at
        # spc=5, chain-4 — both with and without per-step checkpoint),
        # while the unrolled chain compiles in ~1 min and the checkpoint
        # keeps backward memory at one step's activations
        # (docs/design.md round-3).  HAMILTON_REPLAY_LOOP selects
        # "scan"/"scan_ckpt" for backends where reverse-scan compiles fine.
        strategy = os.environ.get("HAMILTON_REPLAY_LOOP", "unroll_ckpt")
        state, fac = jax.checkpoint(lambda st: step_once(st, None))(state)
        if steps_per_call > 1:
            if strategy == "unroll_ckpt":
                step_ck = jax.checkpoint(step_once)
                for _ in range(steps_per_call - 1):
                    state, fac = step_ck(state, fac)
            else:
                def body(carry, _):
                    st, fc = carry
                    st, fc = step_once(st, fc)
                    return (st, fc), None

                if strategy == "scan_ckpt":
                    body = jax.checkpoint(body)
                (state, fac), _ = jax.lax.scan(
                    body, (state, fac), None, length=steps_per_call - 1,
                )
        outs = tuple(
            _to_tiles(jnp.stack(cols, axis=1)) for cols in state
        )
        return outs

    # Reverse-mode: custom VJP whose backward pass differentiates the exact
    # replay.  The primal path stays the fused kernel; gradients flow to the
    # state, the dt tile, and (runtime mode) the coefficient tiles.
    @jax.custom_vjp
    def _kernel_step(dt_tile, *ops):
        return _call(dt_tile, ops)

    def _kernel_step_fwd(dt_tile, *ops):
        return _call(dt_tile, ops), (dt_tile, ops)

    def _kernel_step_bwd(res, g):
        dt_tile, ops = res
        _, vjp_fn = jax.vjp(_replay, dt_tile, *ops)
        return vjp_fn(tuple(g))

    _kernel_step.defvjp(_kernel_step_fwd, _kernel_step_bwd)

    def _check(ph: Phase):
        if ph.q.ndim != 2 or ph.q.shape[-1] != n:
            raise ValueError(
                f"fused serial-chain stepper needs (B, {n}) states, got "
                f"{tuple(ph.q.shape)} (single trajectories and other "
                f"shapes: use the library leapfrog)"
            )
        if ph.q.shape[0] % TILE_B != 0:
            raise ValueError(
                f"fused stepper batch must be a multiple of {TILE_B}, got "
                f"{ph.q.shape[0]} (use the library leapfrog for other shapes)"
            )

    def init(ph: Phase):
        _check(ph)
        qt, pt = _to_tiles(ph.q), _to_tiles(ph.p)
        z = jnp.zeros_like(qt)
        # trailing (a_est, vdot_est) warm-start carries, zero-initialized
        # (≡ the cold start; see `increments`)
        if not compensated:
            state = (qt, pt, z, z)
        else:
            state = (qt, pt, z, jnp.zeros_like(pt), z, z)
        if static_mode:
            return state
        # runtime-parameter mode: materialize the coefficient tiles once;
        # they ride the carry (read-only) so chunked/resumed drivers keep
        # them with the state.  Unbatched (shared) params — e.g. gradients
        # w.r.t. scalar masses, or a system passed as a traced jit argument
        # — get ONE tile group reused by every grid step instead of B-fold
        # per-member copies.
        b = ph.q.shape[0]
        cmat, gu = coef_arrays(ph.q.dtype)
        if cmat.ndim == 2 and gu.ndim == 1:
            cm_b = jnp.broadcast_to(cmat.reshape(1, n * n), (TILE_B, n * n))
            gu_b = jnp.broadcast_to(gu.reshape(1, n), (TILE_B, n))
        else:
            # per coefficient array: unbatched replicates across members
            # (as the library path's broadcast of shared params does), a
            # leading batch axis must EQUAL the state batch — the library
            # path (the fused path's correctness reference) vmaps members
            # pairwise and rejects size-1 broadcasting, so accepting it
            # here would silently break the parity contract
            def member_rows(arr, tail_ndim, flat, tag):
                lead = arr.shape[:arr.ndim - tail_ndim]
                if lead == ():
                    return jnp.broadcast_to(arr.reshape(1, flat), (b, flat))
                if lead != (b,):
                    raise ValueError(
                        f"batched chain parameters must carry a leading "
                        f"batch axis equal to the state batch ({b}); got "
                        f"{tag} shape {tuple(arr.shape)} (broadcast size-1 "
                        f"axes explicitly, as the library path requires)"
                    )
                return arr.reshape(b, flat)

            cm_b = member_rows(cmat, 2, n * n, "C_ij")
            gu_b = member_rows(gu, 1, n, "g·l·S")
        return state + (_to_tiles(cm_b), _to_tiles(gu_b))

    def step(carry, dt):
        if static_mode:
            tiles, params = carry, ()
        else:
            tiles, params = carry[:-2], carry[-2:]
        dt_tile = jnp.full((8, 128), dt, carry[0].dtype)
        out = _kernel_step(dt_tile, *params, *tiles)
        return tuple(out) + tuple(params) if n_par else tuple(out)

    def extract(carry):
        return Phase(_from_tiles(carry[0]), _from_tiles(carry[1]))

    order = 2 if composition == (1.0,) else 4  # triple jump raises by 2
    return Stepper(init, step, extract, order=order, symplectic=True,
                   substeps=steps_per_call)
