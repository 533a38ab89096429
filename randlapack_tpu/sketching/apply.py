"""Sided sketch application — the RandBLAS ``sketch_general`` capability.

Dispatches on operator kind (dense array / DenseSkOp / SparseSkOp / SRHTSkOp)
and side. Functional: returns the sketched array (no aliasing/beta-accumulate
— XLA fuses the consumer instead).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SKETCH_PRECISION
from .dense import DenseSkOp
from .sparse_ops import SparseSkOp, saso_left_apply, saso_right_apply
from .srht import SRHTSkOp, srht_left_apply


def sketch_left(S, A: jax.Array, precision=SKETCH_PRECISION) -> jax.Array:
    """S @ A with isometric scaling (E[SᵀS] = I for the scaled operator)."""
    if isinstance(S, DenseSkOp):
        scale = jnp.asarray(S.dist.isometry_scale, A.dtype)
        return scale * jnp.matmul(S.mat.astype(A.dtype), A,
                                  precision=precision)
    if isinstance(S, SparseSkOp):
        return saso_left_apply(S, A)
    if isinstance(S, SRHTSkOp):
        return srht_left_apply(S, A, precision=precision)
    # plain array: no implicit scaling
    return jnp.matmul(jnp.asarray(S, A.dtype), A, precision=precision)


def sketch_right(A: jax.Array, S, precision=SKETCH_PRECISION) -> jax.Array:
    """A @ S with isometric scaling."""
    if isinstance(S, DenseSkOp):
        scale = jnp.asarray(S.dist.isometry_scale, A.dtype)
        return scale * jnp.matmul(A, S.mat.astype(A.dtype),
                                  precision=precision)
    if isinstance(S, SparseSkOp):
        return saso_right_apply(A, S)
    if isinstance(S, SRHTSkOp):
        return srht_left_apply(S, A.T, precision=precision).T
    return jnp.matmul(A, jnp.asarray(S, A.dtype), precision=precision)
