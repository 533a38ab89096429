"""Linear-operator protocol — jit-traceable analogue of the reference's
``LinearOperator`` / ``SymmetricLinearOperator`` concepts
(reference: RandLAPACK/linops/rl_concepts.hh:31,46; rl_linops.hh:12-18).

Operators are pytree dataclasses with a small duck-typed surface:
    n_rows, n_cols        — static ints
    matmat(X)  -> A @ X
    tmatmat(X) -> Aᵀ @ X
    fro_nrm()  -> ‖A‖_F
Symmetric operators add ``dim`` and per-column regularization hooks.
Everything composes under jit/vmap/grad because operators are pytrees whose
leaves are arrays.
"""
from .dense import DenseLinOp
from .sparse import SparseLinOp
from .composite import CompositeLinOp
from .symmetric import (ExplicitSymLinOp, RegExplicitSymLinOp,
                        SpectralPrecond)
from .base import materialize, row_block, col_block, submatrix
from .sparse_views import (CSRMatrixView, CSRRowBlockView, CSRColBlock,
                           CSCColBlockView, CSCRowBlock, csr_row_block,
                           csr_col_block, csc_col_block, csc_row_block)

__all__ = [
    "DenseLinOp", "SparseLinOp", "CompositeLinOp",
    "ExplicitSymLinOp", "RegExplicitSymLinOp", "SpectralPrecond",
    "materialize", "row_block", "col_block", "submatrix",
    "CSRMatrixView", "CSRRowBlockView", "CSRColBlock", "CSCColBlockView",
    "CSCRowBlock", "csr_row_block", "csr_col_block", "csc_col_block",
    "csc_row_block",
]
