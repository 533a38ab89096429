"""Implicit product operator (reference: rl_composite_linop.hh:43).

The reference's borrow/own shared_ptr machinery disappears — pytrees are
value-semantic under JAX.
"""
from __future__ import annotations

import jax

from ..config import STABLE_PRECISION


@jax.tree_util.register_pytree_node_class
class CompositeLinOp:
    """A = Op1 · Op2, applied as two chained applies through an intermediate
    (never materialized)."""

    def __init__(self, op1, op2):
        assert op1.n_cols == op2.n_rows, (op1.n_cols, op2.n_rows)
        self.op1 = op1
        self.op2 = op2

    def tree_flatten(self):
        return (self.op1, self.op2), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_rows(self):
        return self.op1.n_rows

    @property
    def n_cols(self):
        return self.op2.n_cols

    @property
    def dtype(self):
        return self.op1.dtype

    def matmat(self, X, precision=STABLE_PRECISION):
        return self.op1.matmat(self.op2.matmat(X, precision), precision)

    def tmatmat(self, X, precision=STABLE_PRECISION):
        return self.op2.tmatmat(self.op1.tmatmat(X, precision), precision)

    def rmatmat(self, X, precision=STABLE_PRECISION):
        return self.op2.rmatmat(self.op1.rmatmat(X, precision), precision)

    def fro_nrm(self):
        # Upper bound ‖Op1·Op2‖_F ≤ ‖Op1‖_F·‖Op2‖_F would be wrong as an
        # exact value; materialize-free exact norm isn't available — the
        # reference materializes too for this case.
        import jax.numpy as jnp
        return jnp.linalg.norm(self.matmat(
            jnp.eye(self.n_cols, dtype=self.dtype)))

    # views slice the outer factor of the corresponding side
    # (rl_composite_linop.hh block views)
    def row_block(self, start: int, stop: int):
        return CompositeLinOp(self.op1.row_block(start, stop), self.op2)

    def col_block(self, start: int, stop: int):
        return CompositeLinOp(self.op1, self.op2.col_block(start, stop))

    def cols(self, start, size: int, precision=STABLE_PRECISION):
        return self.op1.matmat(self.op2.cols(start, size, precision),
                               precision)
