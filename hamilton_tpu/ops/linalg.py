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

import jax
import jax.numpy as jnp

__all__ = ["spd_solve", "spd_cholesky", "cholesky_solve"]


def spd_solve(k_mat: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``K x = b`` for SPD ``K`` of static size ``(n, n)``.

    Dispatches on the static ``n``: closed forms for n ∈ {1, 2}, Cholesky
    otherwise.  ``b`` may be ``(n,)`` or ``(n, k)``.
    """
    n = k_mat.shape[-1]
    if n == 1:
        return b / k_mat[..., 0, 0]
    if n == 2:
        a, c = k_mat[..., 0, 0], k_mat[..., 1, 1]
        bb = k_mat[..., 0, 1]
        det = a * c - bb * bb
        x0 = (c * b[..., 0] - bb * b[..., 1]) / det
        x1 = (a * b[..., 1] - bb * b[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    chol = spd_cholesky(k_mat)
    return cholesky_solve(chol, b)


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
