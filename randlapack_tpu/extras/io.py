"""Matrix Market IO (reference: extras read .mtx via fast_matrix_market;
testing utilities write .mtx, rl_test_utils.hh:379-472).

scipy's reader/writer is the host path; a native C++ fast reader lives in
native/ (optional, used when built).
"""
from __future__ import annotations

import numpy as np


def mm_read(path: str, dense: bool = False):
    """Read a MatrixMarket file → (rows, cols, vals, shape) COO arrays, or
    a dense ndarray if ``dense=True``. Uses the native fast reader when the
    extension is built, else scipy."""
    try:
        from randlapack_tpu.native import fast_mm_read  # built extension
        rows, cols, vals, m, n = fast_mm_read(path)
        shape = (m, n)
    except Exception:
        import scipy.io as sio
        mat = sio.mmread(path)
        coo = mat.tocoo() if hasattr(mat, "tocoo") else None
        if coo is None:  # dense array file
            arr = np.asarray(mat)
            if dense:
                return arr
            rows, cols = np.nonzero(arr)
            return rows.astype(np.int32), cols.astype(np.int32), \
                arr[rows, cols], arr.shape
        rows, cols, vals = (coo.row.astype(np.int32),
                            coo.col.astype(np.int32), coo.data)
        shape = coo.shape
    if dense:
        out = np.zeros(shape, dtype=vals.dtype)
        np.add.at(out, (rows, cols), vals)
        return out
    return rows, cols, vals, shape


def mm_write(path: str, rows, cols, vals, shape, symmetric: bool = False):
    """Write a COO matrix as MatrixMarket coordinate format. Uses the
    native C++ writer when built (general symmetry only); scipy
    otherwise."""
    if not symmetric:
        try:
            from randlapack_tpu.native import fast_mm_write
            fast_mm_write(path, np.asarray(rows, np.int32),
                          np.asarray(cols, np.int32),
                          np.asarray(vals, np.float64),
                          int(shape[0]), int(shape[1]))
            return
        except ImportError:
            pass
    import scipy.sparse as sp
    import scipy.io as sio
    A = sp.coo_matrix((np.asarray(vals),
                       (np.asarray(rows), np.asarray(cols))), shape=shape)
    sio.mmwrite(path, A, symmetry="symmetric" if symmetric else "general")
