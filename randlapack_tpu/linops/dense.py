"""Dense linear operator (reference: rl_dense_linop.hh:36)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION


@jax.tree_util.register_pytree_node_class
class DenseLinOp:
    """Wraps a dense (m, n) array. Layout/lda plumbing from the reference
    disappears — XLA owns layout."""

    def __init__(self, mat: jax.Array):
        self.mat = mat

    # pytree
    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # protocol
    @property
    def n_rows(self):
        return self.mat.shape[0]

    @property
    def n_cols(self):
        return self.mat.shape[1]

    @property
    def dtype(self):
        return self.mat.dtype

    def matmat(self, X, precision=STABLE_PRECISION):
        return jnp.matmul(self.mat, X, precision=precision)

    def tmatmat(self, X, precision=STABLE_PRECISION):
        return jnp.matmul(self.mat.T, X, precision=precision)

    def rmatmat(self, X, precision=STABLE_PRECISION):
        """X @ A (the reference's Side::Right apply, rl_dense_linop.hh:94)."""
        return jnp.matmul(X, self.mat, precision=precision)

    def fro_nrm(self):
        return jnp.linalg.norm(self.mat)

    # views (rl_dense_linop.hh:295-329)
    def row_block(self, start: int, stop: int):
        return DenseLinOp(self.mat[start:stop, :])

    def col_block(self, start: int, stop: int):
        return DenseLinOp(self.mat[:, start:stop])

    def cols(self, start, size: int, precision=STABLE_PRECISION):
        """Materialize ``size`` columns from (traced) ``start`` — the
        dynamic block access the column-blocked Gram loops need."""
        start = jnp.asarray(start)
        return jax.lax.dynamic_slice(self.mat, (jnp.zeros_like(start), start),
                                     (self.mat.shape[0], size))

    def T(self):
        return DenseLinOp(self.mat.T)
