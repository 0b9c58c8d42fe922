"""TPU compute kernels: small dense linear algebra and Pallas fused steps.

TPU-native replacement for the reference's foreign BLAS/LAPACK layer
(SURVEY.md §2.3): the dense algebra that the reference reaches through
``hmatrix``'s FFI (``inv``/``diag``/``#>``/``tr``,
``Numeric/Hamilton.hs:267,321-324,377-387``) is done here with XLA-fused ops
and, where XLA's default lowering of batched tiny-dense work falls short,
hand-written Pallas kernels.
"""

from hamilton_tpu.ops.linalg import spd_solve, spd_cholesky, cholesky_solve

__all__ = ["spd_solve", "spd_cholesky", "cholesky_solve"]
