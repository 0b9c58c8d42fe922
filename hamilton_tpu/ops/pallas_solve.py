"""Pallas TPU kernels for batched tiny-SPD Cholesky factorization and solve.

The make-or-break op of the whole framework (SURVEY.md §7 "Pallas batched
tiny-dense kernels"): every dynamics evaluation solves ``K w = p`` with
``K = JᵀMJ`` of size n×n (n ≤ ~32) for each of thousands of ensemble members.
XLA's batched ``cholesky`` runs its sequential panel loop per matrix (36 ms
for (16384, 20, 20) f32 on v5e); the masked-loop JAX fallback in
:mod:`hamilton_tpu.ops.linalg` gets that to ~1.5 ms but pays O(n³) flops and
loop overheads.

These kernels use the *batch-in-registers* layout: members are laid out over
the VPU's native (8, 128) sublane×lane tile, so each scalar of the n×n
factorization is one fully-dense vector op over 1024 members.  The
factorization loops are unrolled in Python over the static n (≈ n³/6 + n²
vector ops), which Mosaic schedules back-to-back with no loop machinery.

Layout transform (outside the kernel, fused by XLA into neighbors):

    K: (B, n, n) → (G, n², 8, 128)   with member b = g·1024 + s·128 + l

Public entry points pad B up to a multiple of 1024 with identity systems.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "spd_solve_pallas",
    "cholesky_pallas",
    "cho_solve_pallas",
    "spd_solve_bt",
    "cholesky_bt",
    "cho_solve_bt",
    "spd_solve_tiles",
    "cholesky_tiles",
    "cho_solve_tiles",
    "jac_tiles",
    "spd_solve_jac_tiles",
    "cholesky_jac_tiles",
    "to_vec_tiles",
    "from_vec_tiles",
    "k_tiles_from_jacobian",
    "tiles_eligible",
    "TILE_B",
]

TILE_B = 8 * 128  # members per grid cell: one (8, 128) register tile


def _to_tiles(x: jax.Array, entry_dims: int) -> jax.Array:
    """(B, d1[, d2]) → (G, d1·d2, 8, 128)."""
    b = x.shape[0]
    entries = 1
    for d in x.shape[1:]:
        entries *= d
    g = b // TILE_B
    x = x.reshape(g, 8, 128, entries)
    return jnp.moveaxis(x, 3, 1)  # (G, entries, 8, 128)


def _from_tiles(x: jax.Array, trailing) -> jax.Array:
    """(G, entries, 8, 128) → (B, *trailing)."""
    g = x.shape[0]
    x = jnp.moveaxis(x, 1, 3)  # (G, 8, 128, entries)
    return x.reshape((g * TILE_B,) + tuple(trailing))


def _chol_entries(k_at, n: int):
    """Unrolled Cholesky on tile-valued entries.

    ``k_at(i, j)`` returns the (8, 128) tile of K[i, j]; returns the lower
    factor as a dict {(i, j): tile} plus reciprocal-diagonal tiles.
    """
    low = {}
    inv_diag = [None] * n
    for j in range(n):
        s = k_at(j, j)
        for k in range(j):
            ljk = low[(j, k)]
            s = s - ljk * ljk
        d = jnp.sqrt(s)
        low[(j, j)] = d
        inv_d = 1.0 / d
        inv_diag[j] = inv_d
        for i in range(j + 1, n):
            s = k_at(i, j)
            for k in range(j):
                s = s - low[(i, k)] * low[(j, k)]
            low[(i, j)] = s * inv_d
    return low, inv_diag


def _solve_entries(low, inv_diag, b_at, n: int):
    """Unrolled L Lᵀ x = b on tile-valued entries; returns list of x tiles."""
    y = [None] * n
    for i in range(n):
        s = b_at(i)
        for k in range(i):
            s = s - low[(i, k)] * y[k]
        y[i] = s * inv_diag[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - low[(k, i)] * x[k]
        x[i] = s * inv_diag[i]
    return x


def _solve_kernel(n: int, k_ref, b_ref, x_ref):
    low, inv_diag = _chol_entries(lambda i, j: k_ref[i * n + j], n)
    xs = _solve_entries(low, inv_diag, lambda i: b_ref[i], n)
    for i in range(n):
        x_ref[i] = xs[i]


def _chol_kernel(n: int, k_ref, l_ref):
    low, _ = _chol_entries(lambda i, j: k_ref[i * n + j], n)
    for i in range(n):
        for j in range(n):
            l_ref[i * n + j] = low[(i, j)] if j <= i else jnp.zeros_like(low[(0, 0)])


def _chosolve_kernel(n: int, l_ref, b_ref, x_ref):
    low = {}
    inv_diag = [None] * n
    for i in range(n):
        for j in range(i + 1):
            low[(i, j)] = l_ref[i * n + j]
        inv_diag[i] = 1.0 / low[(i, i)]
    xs = _solve_entries(low, inv_diag, lambda i: b_ref[i], n)
    for i in range(n):
        x_ref[i] = xs[i]


def _pad_batch(k_mat, vecs):
    """Pad batch to a TILE_B multiple with identity systems / zero vectors."""
    b, n = k_mat.shape[0], k_mat.shape[-1]
    pad = (-b) % TILE_B
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=k_mat.dtype), (pad, n, n))
        k_mat = jnp.concatenate([k_mat, eye], axis=0)
        vecs = [
            jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], axis=0)
            for v in vecs
        ]
    return k_mat, vecs, b


def _block_specs(n_in, n_out, entries_in, entries_out):
    in_specs = [
        pl.BlockSpec((1, e, 8, 128), lambda g, e=e: (g, g * 0, g * 0, g * 0),
                     memory_space=pltpu.VMEM)
        for e in entries_in
    ]
    out_specs = [
        pl.BlockSpec((1, e, 8, 128), lambda g, e=e: (g, g * 0, g * 0, g * 0),
                     memory_space=pltpu.VMEM)
        for e in entries_out
    ]
    return in_specs, out_specs


def _run(kernel_fn, inputs, entries_in, entries_out, dtype):
    g = inputs[0].shape[0]
    in_specs, out_specs = _block_specs(None, None, entries_in, entries_out)
    out_shapes = [
        jax.ShapeDtypeStruct((g, e, 8, 128), dtype) for e in entries_out
    ]
    squeeze = len(entries_out) == 1
    result = pl.pallas_call(
        kernel_fn,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs[0] if squeeze else tuple(out_specs),
        out_shape=out_shapes[0] if squeeze else tuple(out_shapes),
    )(*inputs)
    return result


def _kernel_wrap(fn, n):
    """Adapt an entry-tile kernel to refs with a leading block axis of 1."""

    def kernel(*refs):
        views = [_RefView(r) for r in refs]
        fn(n, *views)

    return kernel


class _RefView:
    """Index adapter: ref[(i)] → ref[0, i] (drops the unit block axis)."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[0, idx]

    def __setitem__(self, idx, val):
        self._ref[0, idx] = val


# ---------------------------------------------------------------------------
# Tile-layout entry points — the hot-loop path.
#
# The member-major (B, n, n) entry points pay a strided relayout into the
# (8, 128) register tiles on every call; profiling the leapfrog hot loop
# (scripts/perf_trace.py, v5e, 16384×chain-20) showed 2.5 of 4.5 ms/step
# going to reshape/copy passes, and the XLA-side K = JᵀMJ contraction
# lowering to a **bf16 convolution** (docs/design.md "Precision on TPU").
# The hot-loop design that won:
#
#   * K never exists as an XLA array: the fused :func:`spd_solve_jac_tiles`
#     / :func:`cholesky_jac_tiles` kernels form K = (√M·J)ᵀ(√M·J) inside
#     the kernel from :func:`jac_tiles` operands — f32-exact VPU FMAs,
#     measured 2.3× faster per formation than the f32-precision einsum;
#   * the Cholesky factor lives in tile layout inside the integrators'
#     ``QFactor`` carry and is consumed by :func:`cho_solve_tiles`
#     with no relayout at all;
#   * only √M·J (one strided pass) and the small (B, n) vectors
#     (:func:`to_vec_tiles` / :func:`from_vec_tiles`) are re-tiled per
#     formation.
#
# The batch must be a TILE_B multiple; the member-major entry points below
# remain for ad-hoc batch sizes.
# ---------------------------------------------------------------------------


def tiles_eligible(batch: int, n: int, dtype) -> bool:
    """Static check: may the tile-resident hot path take this shape?

    ``HAMILTON_FORCE_PALLAS`` overrides the backend check (for exercising
    the routing under the Pallas interpreter on CPU in tests)."""
    if os.environ.get("HAMILTON_DISABLE_PALLAS"):
        return False
    if os.environ.get("HAMILTON_NO_TILES"):
        # keep the kernels but disable the tile-resident routing (A/B
        # benchmarking of the relayout strategies)
        return False
    if batch % TILE_B != 0 or batch == 0:
        return False
    if not 3 <= n <= 32:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if os.environ.get("HAMILTON_FORCE_PALLAS"):
        return True
    try:
        return jax.default_backend() != "cpu"
    except RuntimeError:
        return False


def to_vec_tiles(x: jax.Array) -> jax.Array:
    """(B, n) → (G, n, 8, 128).  A small transpose (n/n² of matrix bytes)."""
    b, n = x.shape
    return jnp.moveaxis(x.reshape(b // TILE_B, 8, 128, n), 3, 1)


def from_vec_tiles(xt: jax.Array) -> jax.Array:
    """(G, n, 8, 128) → (B, n)."""
    g, n = xt.shape[0], xt.shape[1]
    return jnp.moveaxis(xt, 1, 3).reshape(g * TILE_B, n)


def k_tiles_from_jacobian(j: jax.Array, inertia: jax.Array) -> jax.Array:
    """``K = JᵀMJ`` in tile layout, from the member-major (B, m, n) Jacobian.

    The contraction stays in the member-major order XLA lowers to a fast
    batched dot (a tile-ordered einsum was tried and lowered to a
    convolution + copies, net slower); the single explicit relayout of the
    (B, n, n) result is the only transpose K pays per formation."""
    k_mat = jnp.einsum("bmi,m,bmj->bij", j, inertia, j, precision=jax.lax.Precision.HIGHEST)
    return _to_tiles(k_mat, 2)


# -- fused J→K→factor[→solve] kernels ---------------------------------------
#
# One further fusion level: pass √M·J itself in tile layout and form
# K = (√M·J)ᵀ(√M·J) inside the kernel (n(n+1)/2 · m vector FMAs on the VPU,
# f32-exact).  This removes the XLA-side K contraction entirely — which the
# TPU backend lowers to a bf16 convolution plus layout copies — so the only
# data movement per formation is J's own relayout into tiles.


def jac_tiles(j: jax.Array, inertia: jax.Array) -> jax.Array:
    """``√M·J`` in tile layout: (B, m, n) member-major → (G, m·n, 8, 128).

    The inertia is folded in as a row scaling so the kernels need no
    separate inertia operand: ``K = JᵀMJ = (√M·J)ᵀ(√M·J)``.  ``inertia`` may
    be ``(m,)`` (shared) or ``(B, m)`` (per-member, from batched params)."""
    js = jnp.sqrt(inertia)[..., :, None].astype(j.dtype) * j
    return _to_tiles(js, 2)


def _k_at_from_jac(js_ref, n: int, m: int):
    """Entry accessor computing K[i, j] tiles on demand from √M·J tiles."""

    def k_at(i, j):
        s = js_ref[0 * n + i] * js_ref[0 * n + j]
        for mm in range(1, m):
            s = s + js_ref[mm * n + i] * js_ref[mm * n + j]
        return s

    return k_at


def _jac_solve_kernel(n: int, m: int, js_ref, b_ref, x_ref):
    low, inv_diag = _chol_entries(_k_at_from_jac(js_ref, n, m), n)
    xs = _solve_entries(low, inv_diag, lambda i: b_ref[i], n)
    for i in range(n):
        x_ref[i] = xs[i]


def _jac_chol_kernel(n: int, m: int, js_ref, l_ref):
    low, _ = _chol_entries(_k_at_from_jac(js_ref, n, m), n)
    for i in range(n):
        for j in range(n):
            l_ref[i * n + j] = low[(i, j)] if j <= i else jnp.zeros_like(low[(0, 0)])


def _kernel_wrap2(fn, n, m):
    def kernel(*refs):
        fn(n, m, *[_RefView(r) for r in refs])

    return kernel


def _jac_solve_impl(js_tiles, b_tiles, n, m):
    return _run(
        _kernel_wrap2(_jac_solve_kernel, n, m), [js_tiles, b_tiles],
        [m * n, n], [n], js_tiles.dtype,
    )


def _jac_chol_impl(js_tiles, n, m):
    return _run(
        _kernel_wrap2(_jac_chol_kernel, n, m), [js_tiles],
        [m * n], [n * n], js_tiles.dtype,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def spd_solve_jac_tiles(
    js_tiles: jax.Array, b_tiles: jax.Array, n: int, m: int
) -> jax.Array:
    """Fused form-K + factor + solve from √M·J tiles: ``Js (G, m·n, 8, 128)``,
    ``b (G, n, 8, 128)`` → ``x = (JsᵀJs)⁻¹ b`` tiles.  f32-exact (no MXU)."""
    return _jac_solve_impl(js_tiles, b_tiles, n, m)


def _jac_solve_fwd(js_tiles, b_tiles, n, m):
    x = _jac_solve_impl(js_tiles, b_tiles, n, m)
    return x, (js_tiles, x)


def _jac_solve_bwd(n, m, res, g):
    # x = K⁻¹b, K = JsᵀJs:  gb = K⁻¹g;  gK = −gb xᵀ;
    # gJs = Js (gK + gKᵀ) = −Js (gb xᵀ + x gbᵀ)
    js_tiles, x = res
    gnum = js_tiles.shape[0]
    gb = _jac_solve_impl(js_tiles, g, n, m)
    js = js_tiles.reshape(gnum, m, n, 8, 128)
    gsym = gb[:, :, None] * x[:, None, :] + x[:, :, None] * gb[:, None, :]
    gjs = -jnp.einsum("gmkst,gkist->gmist", js, gsym,
                      precision=jax.lax.Precision.HIGHEST)
    return gjs.reshape(js_tiles.shape), gb


spd_solve_jac_tiles.defvjp(_jac_solve_fwd, _jac_solve_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def cholesky_jac_tiles(js_tiles: jax.Array, n: int, m: int) -> jax.Array:
    """Fused form-K + factor from √M·J tiles → lower factor in tile layout
    (G, n², 8, 128), for the integrators' cached-factor carries."""
    return _jac_chol_impl(js_tiles, n, m)


def _jac_chol_fwd(js_tiles, n, m):
    return _jac_chol_impl(js_tiles, n, m), js_tiles


def _jac_chol_bwd(n, m, js_tiles, g_l):
    # chain gK (via the masked-factorization pullback) to gJs = Js (gK + gKᵀ)
    from hamilton_tpu.ops.linalg import _masked_cholesky

    gnum = js_tiles.shape[0]
    js = _from_tiles(js_tiles, (m, n))
    k = jnp.einsum("bmi,bmj->bij", js, js,
                   precision=jax.lax.Precision.HIGHEST)
    _, vjp_fn = jax.vjp(_masked_cholesky, k)
    (g_k,) = vjp_fn(_from_tiles(g_l, (n, n)))
    g_js = jnp.einsum("bmk,bki->bmi", js,
                      g_k + jnp.swapaxes(g_k, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)
    return (_to_tiles(g_js, 2),)


cholesky_jac_tiles.defvjp(_jac_chol_fwd, _jac_chol_bwd)


def _solve_tiles_impl(k_tiles, b_tiles, n):
    return _run(
        _kernel_wrap(_solve_kernel, n), [k_tiles, b_tiles],
        [n * n, n], [n], k_tiles.dtype,
    )


@jax.custom_vjp
def spd_solve_tiles(k_tiles: jax.Array, b_tiles: jax.Array) -> jax.Array:
    """Fused factor+solve on tile-layout operands: ``K (G, n², 8, 128)``,
    ``b (G, n, 8, 128)`` → ``x (G, n, 8, 128)``.  Zero relayout."""
    n = b_tiles.shape[1]
    return _solve_tiles_impl(k_tiles, b_tiles, n)


def _spd_tiles_fwd(k_tiles, b_tiles):
    x = _solve_tiles_impl(k_tiles, b_tiles, b_tiles.shape[1])
    return x, (k_tiles, x)


def _spd_tiles_bwd(res, g):
    k_tiles, x = res
    n = x.shape[1]
    gb = _solve_tiles_impl(k_tiles, g, n)
    gk = -gb[:, :, None] * x[:, None, :, :, :]  # (G, n, n, 8, 128)
    return gk.reshape(k_tiles.shape), gb


spd_solve_tiles.defvjp(_spd_tiles_fwd, _spd_tiles_bwd)


def _cholesky_tiles_impl(k_tiles, n):
    return _run(
        _kernel_wrap(_chol_kernel, n), [k_tiles], [n * n], [n * n],
        k_tiles.dtype,
    )


@jax.custom_vjp
def cholesky_tiles(k_tiles: jax.Array) -> jax.Array:
    """Lower Cholesky factor on tile-layout K: (G, n², 8, 128) →
    (G, n², 8, 128).  Zero relayout; the factor is meant to *stay* in tile
    layout (integrator carries) and be consumed by :func:`cho_solve_tiles`."""
    n = int(round(k_tiles.shape[1] ** 0.5))
    return _cholesky_tiles_impl(k_tiles, n)


def _cholesky_tiles_fwd(k_tiles):
    n = int(round(k_tiles.shape[1] ** 0.5))
    return _cholesky_tiles_impl(k_tiles, n), k_tiles


def _cholesky_tiles_bwd(k_tiles, g_l):
    # cold path: pull back through the masked reference factorization on the
    # member-major layout
    from hamilton_tpu.ops.linalg import _masked_cholesky

    g, e = k_tiles.shape[0], k_tiles.shape[1]
    n = int(round(e ** 0.5))
    k = _from_tiles(k_tiles, (n, n))
    _, vjp_fn = jax.vjp(_masked_cholesky, k)
    (g_k,) = vjp_fn(_from_tiles(g_l, (n, n)))
    return (_to_tiles(g_k, 2),)


cholesky_tiles.defvjp(_cholesky_tiles_fwd, _cholesky_tiles_bwd)


def _cho_solve_tiles_impl(l_tiles, b_tiles, n):
    return _run(
        _kernel_wrap(_chosolve_kernel, n), [l_tiles, b_tiles],
        [n * n, n], [n], l_tiles.dtype,
    )


@jax.custom_vjp
def cho_solve_tiles(l_tiles: jax.Array, b_tiles: jax.Array) -> jax.Array:
    """Solve ``L Lᵀ x = b`` on tile-layout operands (factor from
    :func:`cholesky_tiles`): zero relayout."""
    n = b_tiles.shape[1]
    return _cho_solve_tiles_impl(l_tiles, b_tiles, n)


def _cho_solve_tiles_fwd(l_tiles, b_tiles):
    x = _cho_solve_tiles_impl(l_tiles, b_tiles, b_tiles.shape[1])
    return x, (l_tiles, x)


def _cho_solve_tiles_bwd(res, g):
    l_tiles, x = res
    n = x.shape[1]
    gnum = l_tiles.shape[0]
    gb = _cho_solve_tiles_impl(l_tiles, g, n)
    gk = -gb[:, :, None] * x[:, None, :, :, :]  # (G, n, n, 8, 128)
    gsym = gk + jnp.swapaxes(gk, 1, 2)
    lt = l_tiles.reshape(gnum, n, n, 8, 128)
    gl = jnp.einsum("gikst,gkjst->gijst", gsym, lt, precision=jax.lax.Precision.HIGHEST)
    tril = (jnp.arange(n)[:, None] >= jnp.arange(n)[None, :])[
        None, :, :, None, None
    ]
    gl = jnp.where(tril, gl, 0.0)
    return gl.reshape(l_tiles.shape), gb


cho_solve_tiles.defvjp(_cho_solve_tiles_fwd, _cho_solve_tiles_bwd)


# ---------------------------------------------------------------------------
# Batch-minor ("bt") entry points — zero-copy tiling.
#
# The member-major (B, n, n) entry points below pay a strided relayout into
# the (8, 128) register tiles.  When the caller keeps the ensemble
# **batch-minor** — K as (n, n, B), vectors as (n, B) — the tile view is a
# pure reshape: (n, n, B) → (n², G, 8, 128) moves no data, and the BlockSpec
# walks the G axis directly.  These entry points serve callers that hold
# batch-minor data.  NOTE: an end-to-end batch-minor *stepper* was measured
# SLOWER than the member-major library path (5.8 vs 4.6 ms/step — the AD
# boundaries pay the transposes instead; docs/design.md "Layout
# experiments"), so the library mechanics stay member-major and route
# through the entry points further below.
# ---------------------------------------------------------------------------


def _bt_tiles(x: jax.Array) -> jax.Array:
    """(d1[, d2], B) → (d1·d2, G, 8, 128) — a free reshape (B minor)."""
    entries = 1
    for d in x.shape[:-1]:
        entries *= d
    b = x.shape[-1]
    return x.reshape(entries, b // TILE_B, 8, 128)


def _bt_pad(x: jax.Array, diag_entries: bool = False) -> jax.Array:
    """Pad the trailing batch axis to a TILE_B multiple.

    ``diag_entries=True`` pads an (n, n, B) SPD stack with identity members
    so the factorization stays finite in the padding lanes."""
    b = x.shape[-1]
    pad = (-b) % TILE_B
    if not pad:
        return x
    if diag_entries:
        n = x.shape[0]
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=x.dtype)[:, :, None], (n, n, pad)
        )
        return jnp.concatenate([x, eye], axis=-1)
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
    )


class _RefViewBT:
    """Index adapter for bt blocks: ref[(i)] → ref[i, 0]."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[idx, 0]

    def __setitem__(self, idx, val):
        self._ref[idx, 0] = val


def _kernel_wrap_bt(fn, n):
    def kernel(*refs):
        fn(n, *[_RefViewBT(r) for r in refs])

    return kernel


def _bt_run(kernel_fn, inputs, entries_out, dtype):
    g = inputs[0].shape[1]
    in_specs = [
        pl.BlockSpec((x.shape[0], 1, 8, 128), lambda gg: (gg * 0, gg, gg * 0, gg * 0),
                     memory_space=pltpu.VMEM)
        for x in inputs
    ]
    out_spec = pl.BlockSpec((entries_out, 1, 8, 128), lambda gg: (gg * 0, gg, gg * 0, gg * 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_fn,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((entries_out, g, 8, 128), dtype),
    )(*inputs)


@jax.custom_vjp
def spd_solve_bt(k_t: jax.Array, b_t: jax.Array) -> jax.Array:
    """Fused factor+solve, batch-minor: ``K (n, n, B)``, ``b (n, B)`` →
    ``x (n, B)``.  f32/bf16; any B (padded to a TILE_B multiple)."""
    return _spd_solve_bt_impl(k_t, b_t)


def _spd_solve_bt_impl(k_t, b_t):
    n, b = k_t.shape[0], k_t.shape[-1]
    kt = _bt_tiles(_bt_pad(k_t, diag_entries=True))
    bt = _bt_tiles(_bt_pad(b_t))
    xt = _bt_run(_kernel_wrap_bt(_solve_kernel, n), [kt, bt], n, k_t.dtype)
    return xt.reshape(n, -1)[:, :b]


def _spd_bt_fwd(k_t, b_t):
    x = _spd_solve_bt_impl(k_t, b_t)
    return x, (k_t, x)


def _spd_bt_bwd(res, g):
    k_t, x = res
    gb = _spd_solve_bt_impl(k_t, g)
    gk = -gb[:, None, :] * x[None, :, :]
    return gk, gb


spd_solve_bt.defvjp(_spd_bt_fwd, _spd_bt_bwd)


@jax.custom_vjp
def cholesky_bt(k_t: jax.Array) -> jax.Array:
    """Lower Cholesky factor, batch-minor: (n, n, B) → (n, n, B).
    Differentiable (adjoint via the masked-loop reference factorization)."""
    return _cholesky_bt_impl(k_t)


def _cholesky_bt_impl(k_t):
    n, b = k_t.shape[0], k_t.shape[-1]
    kt = _bt_tiles(_bt_pad(k_t, diag_entries=True))
    lt = _bt_run(_kernel_wrap_bt(_chol_kernel, n), [kt], n * n, k_t.dtype)
    return lt.reshape(n, n, -1)[:, :, :b]


def _cholesky_bt_fwd(k_t):
    return _cholesky_bt_impl(k_t), k_t


def _cholesky_bt_bwd(k_t, g_l):
    # Pull back through the (mathematically identical) masked-loop
    # factorization on the member-major layout; the moveaxis pair is the
    # only overhead and this is a cold (backward-only) path.
    from hamilton_tpu.ops.linalg import _masked_cholesky

    k = jnp.moveaxis(k_t, -1, 0)
    _, vjp_fn = jax.vjp(_masked_cholesky, k)
    (g_k,) = vjp_fn(jnp.moveaxis(g_l, -1, 0))
    return (jnp.moveaxis(g_k, 0, -1),)


cholesky_bt.defvjp(_cholesky_bt_fwd, _cholesky_bt_bwd)


@jax.custom_vjp
def cho_solve_bt(l_t: jax.Array, b_t: jax.Array) -> jax.Array:
    """Solve ``L Lᵀ x = b``, batch-minor: L (n, n, B), b (n, B) → (n, B).
    Differentiable (SPD-solve adjoint: one more solve + rank-1 updates)."""
    return _cho_solve_bt_impl(l_t, b_t)


def _cho_solve_bt_impl(l_t, b_t):
    n, b = l_t.shape[0], l_t.shape[-1]
    lt = _bt_tiles(_bt_pad(l_t, diag_entries=True))
    bt = _bt_tiles(_bt_pad(b_t))
    xt = _bt_run(_kernel_wrap_bt(_chosolve_kernel, n), [lt, bt], n, l_t.dtype)
    return xt.reshape(n, -1)[:, :b]


def _cho_solve_bt_fwd(l_t, b_t):
    x = _cho_solve_bt_impl(l_t, b_t)
    return x, (l_t, x)


def _cho_solve_bt_bwd(res, g):
    # x = K⁻¹b with K = LLᵀ: gb = K⁻¹g, gK = −gb xᵀ, gL = tril((gK + gKᵀ)L).
    # Only the lower triangle of L is read by the kernel, so the upper
    # cotangent is structurally zero.
    l_t, x = res
    n = l_t.shape[0]
    gb = _cho_solve_bt_impl(l_t, g)
    gk = -gb[:, None, :] * x[None, :, :]  # (n, n, B)
    gsym = gk + jnp.swapaxes(gk, 0, 1)
    gl = jnp.einsum("ikb,kjb->ijb", gsym, l_t, precision=jax.lax.Precision.HIGHEST)
    tril = (jnp.arange(n)[:, None] >= jnp.arange(n)[None, :])[..., None]
    return jnp.where(tril, gl, 0.0), gb


cho_solve_bt.defvjp(_cho_solve_bt_fwd, _cho_solve_bt_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def spd_solve_pallas(k_mat: jax.Array, b: jax.Array) -> jax.Array:
    """Fused factor+solve: ``x = K⁻¹ b`` for K (B, n, n) SPD, b (B, n).

    f32/bf16 only; any B (padded internally to a multiple of 1024).
    Differentiable via the standard SPD-solve adjoint (two more solves).
    """
    return _spd_solve_impl(k_mat, b)


def _spd_solve_impl(k_mat, b):
    n = k_mat.shape[-1]
    k_pad, (b_pad,), b_orig = _pad_batch(k_mat, [b])
    kt = _to_tiles(k_pad, 2)
    bt = _to_tiles(b_pad, 1)
    xt = _run(
        _kernel_wrap(_solve_kernel, n), [kt, bt], [n * n, n], [n], k_mat.dtype
    )
    return _from_tiles(xt, (n,))[:b_orig]


def _spd_fwd(k_mat, b):
    x = _spd_solve_impl(k_mat, b)
    return x, (k_mat, x)


def _spd_bwd(res, g):
    k_mat, x = res
    gb = _spd_solve_impl(k_mat, g)  # K⁻¹ g  (K symmetric)
    gk = -gb[..., :, None] * x[..., None, :]
    return gk, gb


spd_solve_pallas.defvjp(_spd_fwd, _spd_bwd)


@jax.custom_vjp
def cholesky_pallas(k_mat: jax.Array) -> jax.Array:
    """Lower Cholesky factor for K (B, n, n) SPD, batch-in-registers.
    Differentiable (adjoint via the masked-loop reference factorization), so
    ``jax.grad`` flows through the factor-cached steppers on TPU."""
    return _cholesky_impl(k_mat)


def _cholesky_impl(k_mat):
    n = k_mat.shape[-1]
    k_pad, _, b_orig = _pad_batch(k_mat, [])
    kt = _to_tiles(k_pad, 2)
    lt = _run(_kernel_wrap(_chol_kernel, n), [kt], [n * n], [n * n], k_mat.dtype)
    return _from_tiles(lt, (n, n))[:b_orig]


def _cholesky_fwd(k_mat):
    return _cholesky_impl(k_mat), k_mat


def _cholesky_bwd(k_mat, g_l):
    from hamilton_tpu.ops.linalg import _masked_cholesky

    _, vjp_fn = jax.vjp(_masked_cholesky, k_mat)
    return vjp_fn(g_l)


cholesky_pallas.defvjp(_cholesky_fwd, _cholesky_bwd)


@jax.custom_vjp
def cho_solve_pallas(low: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L Lᵀ x = b`` for a batched lower factor (B, n, n).
    Differentiable (SPD-solve adjoint: one more solve + rank-1 updates)."""
    return _cho_solve_impl(low, b)


def _cho_solve_impl(low, b):
    n = low.shape[-1]
    l_pad, (b_pad,), b_orig = _pad_batch(
        # pad factor with identity (its "K" is identity too)
        low, [b]
    )
    lt = _to_tiles(l_pad, 2)
    bt = _to_tiles(b_pad, 1)
    xt = _run(
        _kernel_wrap(_chosolve_kernel, n), [lt, bt], [n * n, n], [n], low.dtype
    )
    return _from_tiles(xt, (n,))[:b_orig]


def _cho_solve_fwd(low, b):
    x = _cho_solve_impl(low, b)
    return x, (low, x)


def _cho_solve_bwd(res, g):
    # x = K⁻¹b with K = LLᵀ: gb = K⁻¹g, gK = −gb xᵀ, gL = tril((gK + gKᵀ)L).
    low, x = res
    gb = _cho_solve_impl(low, g)
    gk = -gb[..., :, None] * x[..., None, :]
    gl = jnp.matmul(gk + jnp.swapaxes(gk, -1, -2), low)
    return jnp.tril(gl), gb


cho_solve_pallas.defvjp(_cho_solve_fwd, _cho_solve_bwd)
