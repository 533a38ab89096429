"""Shared linop helpers: materialization and block views.

Block views (reference: rl_dense_linop.hh:295-329, rl_sparse_views.hh,
rl_composite_linop.hh block slicing) are free functions dispatching on
operator type — a view is just a new operator over sliced leaves (zero-copy
under XLA, which never copies on slice-of-constant).
"""
from __future__ import annotations

import jax.numpy as jnp


def materialize(op, dtype=None):
    """Densify any operator via A @ I with fast paths
    (reference: rl_materialize.hh:34,53,69)."""
    if hasattr(op, "mat"):
        return op.mat if dtype is None else op.mat.astype(dtype)
    dtype = dtype or op.dtype
    return op.matmat(jnp.eye(op.n_cols, dtype=dtype))


def row_block(op, start: int, stop: int):
    """Operator view of rows [start, stop)."""
    return op.row_block(start, stop)


def col_block(op, start: int, stop: int):
    """Operator view of columns [start, stop)."""
    return op.col_block(start, stop)


def submatrix(op, r0: int, r1: int, c0: int, c1: int):
    return op.row_block(r0, r1).col_block(c0, c1)
