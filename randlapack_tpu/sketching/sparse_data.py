"""Sparse matrix formats + conversions — the RandBLAS ``sparse_data``
capability (SURVEY.md §2.9: COO/CSR/CSC matrices, ``coo_to_csr/csc``,
``*_to_dense``, ``dense_to_*``, ``left_spmm``/``right_spmm``).

TPU representation: BCOO is the XLA-lowerable workhorse (SparseLinOp);
BCSR covers the CSR side. This module provides the explicit format
conversions and dense round-trips as pure functions; CSC is represented as
the CSR of the transpose (the standard trick — every CSC operation maps to
a transposed CSR operation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse


def coo_sort(rows, cols, vals, shape):
    """Canonicalize COO: sort by (row, col) and sum duplicates (host)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    # merge duplicates
    key = rows.astype(np.int64) * shape[1] + cols
    uniq, inv = np.unique(key, return_inverse=True)
    out = np.zeros(len(uniq), dtype=vals.dtype)
    np.add.at(out, inv, vals)
    return (uniq // shape[1]).astype(np.int32), \
        (uniq % shape[1]).astype(np.int32), out


def coo_to_csr(rows, cols, vals, shape):
    """COO → CSR triple ``(indptr, indices, data)`` (host conversion)."""
    rows, cols, vals = coo_sort(rows, cols, vals, shape)
    indptr = np.zeros(shape[0] + 1, dtype=np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return indptr, cols, vals


def coo_to_csc(rows, cols, vals, shape):
    """COO → CSC triple ``(indptr, indices, data)`` = CSR of the transpose."""
    indptr, idx, data = coo_to_csr(cols, rows, vals, (shape[1], shape[0]))
    return indptr, idx, data


def csr_to_coo(indptr, indices, data):
    indptr = np.asarray(indptr)
    counts = np.diff(indptr)
    rows = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    return rows, np.asarray(indices, dtype=np.int32), np.asarray(data)


def coo_to_dense(rows, cols, vals, shape, dtype=None):
    out = np.zeros(shape, dtype=dtype or np.asarray(vals).dtype)
    np.add.at(out, (np.asarray(rows), np.asarray(cols)), np.asarray(vals))
    return jnp.asarray(out)


def dense_to_coo(A, tol: float = 0.0):
    Ah = np.asarray(A)
    rows, cols = np.nonzero(np.abs(Ah) > tol)
    return rows.astype(np.int32), cols.astype(np.int32), Ah[rows, cols]


def to_bcoo(rows, cols, vals, shape) -> jsparse.BCOO:
    idx = jnp.stack([jnp.asarray(rows), jnp.asarray(cols)], axis=1)
    return jsparse.BCOO((jnp.asarray(vals), idx), shape=shape)


def to_bcsr(indptr, indices, data, shape) -> jsparse.BCSR:
    return jsparse.BCSR((jnp.asarray(data), jnp.asarray(indices),
                         jnp.asarray(indptr)), shape=shape)


def left_spmm(sp, B, precision=None):
    """sp @ B for any BCOO/BCSR (RandBLAS left_spmm)."""
    return sp @ B


def right_spmm(A, sp, precision=None):
    """A @ sp (RandBLAS right_spmm)."""
    return A @ sp


def spgemm(sp1, sp2):
    """Sparse × sparse (RandBLAS spgemm capability via BCOO)."""
    return sp1 @ sp2
