"""Small symmetric-positive-definite dense solves.

The reference inverts the generalized mass matrix ``K = JᵀMJ`` explicitly with
LAPACK ``inv`` (``Numeric/Hamilton.hs:321,381``).  ``K`` is SPD by
construction (it is a Gram matrix of the Jacobian under the positive inertia
metric), so here every ``K⁻¹`` application is a Cholesky solve — cheaper,
backward-stable, and XLA lowers the batched version to MXU-friendly blocked
code under ``vmap``.

For the very small systems that dominate this domain (n = 1..3 for the
reference examples), closed forms avoid the lapack-style loop entirely and
fuse into the surrounding computation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "spd_solve",
    "spd_cholesky",
    "cholesky_solve",
    "small_cholesky",
    "small_cho_solve",
]


#: Below this (static) size, solves avoid XLA's ``cholesky`` /
#: ``triangular_solve`` entirely.  Rationale: XLA's batched lowering on TPU
#: runs its sequential panel loop per matrix and is catastrophically slow for
#: huge batches of tiny matrices (measured: 36 ms for a (16384, 20, 20) batch
#: on v5e — ~25× the cost of everything else in a dynamics evaluation
#: combined).  n ≤ 8 is fully unrolled into scalar ops (fused multiply-adds
#: over the batch under ``vmap``); 8 < n ≤ 32 uses a masked right-looking
#: ``fori_loop`` factorization (same vectorization, O(n)-size HLO so compile
#: time stays flat when the solve is instantiated many times per step).
UNROLL_LIMIT = 8
SMALL_LIMIT = 32

#: Minimum real batch size for dispatching to the Pallas batch-in-registers
#: kernels (smaller batches aren't worth the tile padding to 1024).
PALLAS_MIN_BATCH = 2048


def _pallas_eligible(mat: jax.Array, b=None) -> bool:
    """True when the batched small-SPD Pallas kernels should take this op:
    a real (single) batch axis, small n, f32/bf16, a TPU-like backend, and a
    batch big enough to amortize tile padding.  Note vmap-traced code sees
    the *unbatched* shapes and so never routes here — only code holding a
    native batch axis (the ensemble hot path) engages the kernels."""
    if os.environ.get("HAMILTON_DISABLE_PALLAS"):
        return False
    if mat.ndim != 3:
        return False
    n = mat.shape[-1]
    if not 3 <= n <= SMALL_LIMIT:
        return False
    if mat.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if b is not None and b.ndim != 2:
        return False
    if mat.shape[0] < PALLAS_MIN_BATCH:
        return False
    try:
        return jax.default_backend() != "cpu"
    except RuntimeError:
        return False


def spd_solve(k_mat: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``K x = b`` for SPD ``K`` of static size ``(n, n)``.

    Dispatches on the static ``n``: closed forms for n ∈ {1, 2}, unrolled
    Cholesky for n ≤ :data:`UNROLL_LIMIT`, masked-loop Cholesky for
    n ≤ :data:`SMALL_LIMIT`, XLA Cholesky beyond.  ``b`` may be ``(n,)`` or
    ``(n, k)``.
    """
    n = k_mat.shape[-1]
    if n == 1:
        # keep the trailing length-1 axis so leading batch axes broadcast
        return b / k_mat[..., 0]
    if n == 2:
        a, c = k_mat[..., 0, 0], k_mat[..., 1, 1]
        bb = k_mat[..., 0, 1]
        det = a * c - bb * bb
        x0 = (c * b[..., 0] - bb * b[..., 1]) / det
        x1 = (a * b[..., 1] - bb * b[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    if b.ndim == k_mat.ndim - 1:
        if _pallas_eligible(k_mat, b):
            from hamilton_tpu.ops.pallas_solve import spd_solve_pallas

            return spd_solve_pallas(k_mat, b)
        if n <= UNROLL_LIMIT:
            return _spd_solve_unrolled(k_mat, b)
        if n <= SMALL_LIMIT:
            low = _masked_cholesky(k_mat)
            return _masked_cho_solve(low, b)
    chol = spd_cholesky(k_mat)
    return cholesky_solve(chol, b)


def small_cholesky(k_mat: jax.Array) -> jax.Array:
    """Lower Cholesky factor via the TPU-friendly small-n paths (masked loop
    for n ≤ 32, XLA beyond).  The returned factor is a dense ``(..., n, n)``
    array consumable by :func:`small_cho_solve` — and therefore carryable
    through ``scan``/``fori_loop`` (the factor-caching used by the
    generalized-leapfrog stepper)."""
    n = k_mat.shape[-1]
    if _pallas_eligible(k_mat):
        from hamilton_tpu.ops.pallas_solve import cholesky_pallas

        return cholesky_pallas(k_mat)
    if n <= SMALL_LIMIT:
        return _masked_cholesky(k_mat)
    return spd_cholesky(k_mat)


def small_cho_solve(low: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L Lᵀ x = b`` for a :func:`small_cholesky` factor."""
    n = low.shape[-1]
    if _pallas_eligible(low, b):
        from hamilton_tpu.ops.pallas_solve import cho_solve_pallas

        return cho_solve_pallas(low, b)
    if n <= SMALL_LIMIT and b.ndim == low.ndim - 1:
        return _masked_cho_solve(low, b)
    return cholesky_solve(low, b)


def _masked_cholesky(k_mat: jax.Array) -> jax.Array:
    """Right-looking Cholesky as an n-iteration ``fori_loop`` with masked
    rank-1 updates — O(n³) batch-vectorized flops but O(n)-size HLO.

    Returns the lower factor with zeros above the diagonal.
    """
    n = k_mat.shape[-1]
    idx = jnp.arange(n)

    def body(j, a):
        d = jnp.sqrt(a[..., j, j])  # (...,)
        col = a[..., j] / d[..., None]  # column j scaled: (..., n)
        l_col = jnp.where(idx >= j, col, jnp.zeros_like(col))  # keep diag+below
        below = idx > j
        upd = l_col[..., :, None] * l_col[..., None, :]
        keep = below[:, None] & below[None, :]
        a = a - jnp.where(keep, upd, 0.0)
        # freeze column j of the factor (rows above j are zeroed)
        a = a.at[..., :, j].set(l_col)
        return a

    return jax.lax.fori_loop(0, n, body, k_mat)


def _masked_cho_solve(low: jax.Array, b: jax.Array) -> jax.Array:
    """Masked-loop forward/back substitution for :func:`_masked_cholesky`."""
    n = low.shape[-1]
    idx = jnp.arange(n)
    diag = jnp.diagonal(low, axis1=-2, axis2=-1)  # (..., n)

    def fwd(i, y):
        row = low[..., i, :]  # (..., n)
        s = jnp.sum(jnp.where(idx < i, row * y, 0.0), axis=-1)
        return y.at[..., i].set((b[..., i] - s) / low[..., i, i])

    y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(b))

    def bwd(k, x):
        i = n - 1 - k
        col = low[..., :, i]  # (..., n): Lᵀ row i
        s = jnp.sum(jnp.where(idx > i, col * x, 0.0), axis=-1)
        return x.at[..., i].set((y[..., i] - s) / low[..., i, i])

    del diag
    return jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(b))


def _unrolled_cholesky(k_mat: jax.Array):
    """Unrolled lower Cholesky of a small static-n SPD matrix.

    Returns ``(L, inv_diag)`` where ``L`` is a Python n×n list-of-lists of
    batch-shaped scalars (entries above the diagonal are None) and
    ``inv_diag[j] = 1/L[j][j]`` — the form the unrolled substitutions consume
    without re-dividing.
    """
    n = k_mat.shape[-1]
    low = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = k_mat[..., j, j]
        for k in range(j):
            s = s - low[j][k] * low[j][k]
        d = jnp.sqrt(s)
        low[j][j] = d
        inv_d = 1.0 / d
        inv_diag[j] = inv_d
        for i in range(j + 1, n):
            s = k_mat[..., i, j]
            for k in range(j):
                s = s - low[i][k] * low[j][k]
            low[i][j] = s * inv_d
    return low, inv_diag


def _unrolled_cho_solve(low, inv_diag, b: jax.Array) -> jax.Array:
    """Unrolled ``L Lᵀ x = b`` substitution for the factor form of
    :func:`_unrolled_cholesky`."""
    n = len(inv_diag)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - low[i][k] * y[k]
        y[i] = s * inv_diag[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - low[k][i] * x[k]
        x[i] = s * inv_diag[i]
    return jnp.stack(x, axis=-1)


def _spd_solve_unrolled(k_mat: jax.Array, b: jax.Array) -> jax.Array:
    low, inv_diag = _unrolled_cholesky(k_mat)
    return _unrolled_cho_solve(low, inv_diag, b)


def spd_cholesky(k_mat: jax.Array) -> jax.Array:
    """Lower-triangular Cholesky factor of an SPD matrix."""
    return jnp.linalg.cholesky(k_mat)


def cholesky_solve(chol: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L Lᵀ x = b`` given the lower Cholesky factor ``L``."""
    vec = b.ndim == chol.ndim - 1
    if vec:
        b = b[..., None]
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(chol, y, lower=True, trans=1)
    return x[..., 0] if vec else x
