"""Unified linear-operator battery — the reference's tag-parametrized
pattern (test/linops/test_linop_unified.cc: operator tag types × transpose
× side, compared against a densified reference via sided_gemm;
block views per test_linop_block_views.cc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randlapack_tpu import RNGState
from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen
from randlapack_tpu.linops import (CompositeLinOp, DenseLinOp,
                                   ExplicitSymLinOp, RegExplicitSymLinOp,
                                   SparseLinOp, SpectralPrecond,
                                   materialize)

M, N, K, S = 40, 28, 16, 5


def _dense(seed, shape):
    A, _ = mat_gen(MatGenInfo(*shape, MatType.gaussian), RNGState(seed))
    return A


def _sparse_dense_pair(seed, shape, density=0.2):
    rng = np.random.default_rng(seed)
    mask = rng.random(shape) < density
    vals = rng.standard_normal(shape) * mask
    dense = jnp.asarray(vals)
    rows, cols = np.nonzero(mask)
    op = SparseLinOp.from_coo(rows, cols, vals[mask], shape)
    return op, dense


def make_op(tag, seed=0):
    """Operator factory returning (op, dense_reference)."""
    if tag == "dense":
        A = _dense(seed, (M, N))
        return DenseLinOp(A), A
    if tag == "sparse":
        return _sparse_dense_pair(seed, (M, N))
    if tag == "composite_dd":
        A = _dense(seed, (M, K))
        B = _dense(seed + 1, (K, N))
        return CompositeLinOp(DenseLinOp(A), DenseLinOp(B)), A @ B
    if tag == "composite_ds":
        A = _dense(seed, (M, K))
        opB, B = _sparse_dense_pair(seed + 2, (K, N))
        return CompositeLinOp(DenseLinOp(A), opB), A @ B
    if tag == "composite_sd":
        opA, A = _sparse_dense_pair(seed + 3, (M, K))
        B = _dense(seed + 4, (K, N))
        return CompositeLinOp(opA, DenseLinOp(B)), A @ B
    if tag == "composite_nested":
        A = _dense(seed, (M, K))
        B = _dense(seed + 1, (K, K))
        C = _dense(seed + 2, (K, N))
        inner = CompositeLinOp(DenseLinOp(B), DenseLinOp(C))
        return CompositeLinOp(DenseLinOp(A), inner), A @ B @ C
    raise ValueError(tag)


TAGS = ["dense", "sparse", "composite_dd", "composite_ds", "composite_sd",
        "composite_nested"]


@pytest.mark.parametrize("tag", TAGS)
class TestLinOpUnified:
    def test_shapes(self, tag):
        op, ref = make_op(tag)
        assert (op.n_rows, op.n_cols) == ref.shape

    def test_matmat(self, tag):
        op, ref = make_op(tag)
        X = _dense(90, (N, S))
        np.testing.assert_allclose(np.asarray(op.matmat(X)),
                                   np.asarray(ref @ X), atol=1e-12)

    def test_tmatmat(self, tag):
        op, ref = make_op(tag)
        X = _dense(91, (M, S))
        np.testing.assert_allclose(np.asarray(op.tmatmat(X)),
                                   np.asarray(ref.T @ X), atol=1e-12)

    def test_rmatmat(self, tag):
        op, ref = make_op(tag)
        X = _dense(92, (S, M))
        np.testing.assert_allclose(np.asarray(op.rmatmat(X)),
                                   np.asarray(X @ ref), atol=1e-12)

    def test_materialize(self, tag):
        op, ref = make_op(tag)
        np.testing.assert_allclose(np.asarray(materialize(op)),
                                   np.asarray(ref), atol=1e-12)

    def test_row_block(self, tag):
        op, ref = make_op(tag)
        v = op.row_block(8, 24)
        X = _dense(93, (N, S))
        np.testing.assert_allclose(np.asarray(v.matmat(X)),
                                   np.asarray(ref[8:24] @ X), atol=1e-12)

    def test_col_block(self, tag):
        op, ref = make_op(tag)
        v = op.col_block(4, 20)
        X = _dense(94, (16, S))
        np.testing.assert_allclose(np.asarray(v.matmat(X)),
                                   np.asarray(ref[:, 4:20] @ X), atol=1e-12)

    def test_cols_dynamic(self, tag):
        op, ref = make_op(tag)
        if not hasattr(op, "cols"):
            pytest.skip("no dynamic cols")
        got = op.cols(jnp.int32(6), 8)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref[:, 6:14]), atol=1e-12)

    def test_jit_traceable(self, tag):
        op, ref = make_op(tag)
        X = _dense(95, (N, S))

        @jax.jit
        def f(o, x):
            return o.matmat(x)

        np.testing.assert_allclose(np.asarray(f(op, X)),
                                   np.asarray(ref @ X), atol=1e-12)


class TestSymmetricOps:
    def _sym(self, seed, n=30):
        A = _dense(seed, (n, n))
        return 0.5 * (A + A.T)

    def test_explicit_sym(self):
        Asym = self._sym(1)
        op = ExplicitSymLinOp(Asym)
        X = _dense(2, (30, 4))
        np.testing.assert_allclose(np.asarray(op.matmat(X)),
                                   np.asarray(Asym @ X), atol=1e-12)
        idx = jnp.asarray([3, 7, 7, 29], jnp.int32)
        np.testing.assert_allclose(np.asarray(op.columns(idx)),
                                   np.asarray(Asym[:, [3, 7, 7, 29]]),
                                   atol=1e-14)
        np.testing.assert_allclose(np.asarray(op.diagonal()),
                                   np.asarray(jnp.diag(Asym)), atol=1e-14)

    def test_reg_explicit_sym_single_mu(self):
        Asym = self._sym(3)
        op = RegExplicitSymLinOp(Asym, 0.5)
        X = _dense(4, (30, 4))
        ref = Asym @ X + 0.5 * X
        np.testing.assert_allclose(np.asarray(op.matmat(X)), np.asarray(ref),
                                   atol=1e-12)
        off = op.with_reg(False)
        np.testing.assert_allclose(np.asarray(off.matmat(X)),
                                   np.asarray(Asym @ X), atol=1e-12)

    def test_reg_explicit_sym_per_column(self):
        Asym = self._sym(5)
        mus = jnp.asarray([0.1, 10.0])
        op = RegExplicitSymLinOp(Asym, mus)
        X = _dense(6, (30, 2))
        ref = Asym @ X + X * np.asarray([0.1, 10.0])[None, :]
        np.testing.assert_allclose(np.asarray(op.matmat(X)), np.asarray(ref),
                                   atol=1e-12)

    def test_spectral_precond(self):
        n, k = 30, 6
        Q, _ = jnp.linalg.qr(_dense(7, (n, k)))
        lam = jnp.linspace(10.0, 1.0, k)
        mu = 0.3
        P = SpectralPrecond.prep(Q, lam, mu)
        # dense reference: V diag(D) Vᵀ + I
        D = (lam[-1] + mu) / (lam + mu) - 1.0
        ref = Q @ jnp.diag(D) @ Q.T + jnp.eye(n)
        X = _dense(8, (n, 3))
        np.testing.assert_allclose(np.asarray(P.matmat(X)),
                                   np.asarray(ref @ X), atol=1e-12)
        # preconditioner property: P(A+muI) has clustered spectrum on range(Q)
        A = Q @ jnp.diag(lam) @ Q.T
        PA = np.asarray(P.matmat(A + mu * jnp.eye(n)))
        w = np.linalg.eigvalsh(0.5 * (PA + PA.T))
        # on range(Q) eigenvalues collapse to lam_min+mu
        assert np.sum(np.abs(w - float(lam[-1] + mu)) < 1e-9) >= k


class TestSparseViews:
    def test_row_block(self):
        op, dense = _sparse_dense_pair(10, (M, N))
        v = op.row_block(5, 25)
        np.testing.assert_allclose(np.asarray(v.to_dense()),
                                   np.asarray(dense[5:25]), atol=1e-14)

    def test_col_block(self):
        op, dense = _sparse_dense_pair(11, (M, N))
        v = op.col_block(3, 17)
        np.testing.assert_allclose(np.asarray(v.to_dense()),
                                   np.asarray(dense[:, 3:17]), atol=1e-14)

    def test_chained_views(self):
        op, dense = _sparse_dense_pair(12, (M, N))
        v = op.row_block(5, 30).col_block(2, 20)
        np.testing.assert_allclose(np.asarray(v.to_dense()),
                                   np.asarray(dense[5:30, 2:20]), atol=1e-14)


@pytest.mark.parametrize("tag", TAGS)
class TestViewAlgebra:
    """Deep block-view battery (reference: test_linop_block_views.cc)."""

    def test_view_of_view(self, tag):
        op, ref = make_op(tag)
        v = op.row_block(4, 36).col_block(2, 26)
        w = v.row_block(8, 24).col_block(4, 20)
        expect = ref[4:36, 2:26][8:24, 4:20]
        X = _dense(70, (expect.shape[1], S))
        np.testing.assert_allclose(np.asarray(w.matmat(X)),
                                   np.asarray(expect @ X), atol=1e-12)

    def test_view_transpose_apply(self, tag):
        op, ref = make_op(tag)
        v = op.row_block(4, 36)
        expect = ref[4:36, :]
        X = _dense(71, (32, S))
        np.testing.assert_allclose(np.asarray(v.tmatmat(X)),
                                   np.asarray(expect.T @ X), atol=1e-12)

    def test_view_rmatmat(self, tag):
        op, ref = make_op(tag)
        v = op.col_block(6, 22)
        expect = ref[:, 6:22]
        X = _dense(72, (S, M))
        np.testing.assert_allclose(np.asarray(v.rmatmat(X)),
                                   np.asarray(X @ expect), atol=1e-12)

    def test_view_materialize(self, tag):
        from randlapack_tpu.linops import materialize, submatrix
        op, ref = make_op(tag)
        v = submatrix(op, 2, 30, 4, 24)
        np.testing.assert_allclose(np.asarray(materialize(v)),
                                   np.asarray(ref[2:30, 4:24]), atol=1e-12)

    def test_full_range_view_identity(self, tag):
        op, ref = make_op(tag)
        v = op.row_block(0, op.n_rows).col_block(0, op.n_cols)
        X = _dense(73, (N, S))
        np.testing.assert_allclose(np.asarray(v.matmat(X)),
                                   np.asarray(ref @ X), atol=1e-12)


class TestCSRViews:
    """CSR/CSC view types (rl_sparse_views.hh parity): zero-copy row
    windows share the parent's buffers; column blocks copy+filter; CSC
    variants ride the CSR-of-transpose convention."""

    def _csr(self, m=20, n=16, seed=0):
        import scipy.sparse as sp
        rng = np.random.default_rng(seed)
        Ad = sp.random(m, n, density=0.3, random_state=rng).toarray()
        csr = sp.csr_matrix(Ad)
        from randlapack_tpu.linops.sparse_views import CSRMatrixView
        view = CSRMatrixView(jnp.asarray(csr.indptr.astype(np.int32)),
                             jnp.asarray(csr.indices.astype(np.int32)),
                             jnp.asarray(csr.data), (m, n))
        return Ad, view

    def test_row_block_zero_copy_and_values(self):
        Ad, V = self._csr()
        rb = V.row_block(5, 13)
        # zero-copy: the very same arrays, not copies
        assert rb.indices is V.indices and rb.data is V.data
        np.testing.assert_allclose(np.asarray(rb.materialize()),
                                   Ad[5:13], atol=0)

    def test_row_block_of_row_block(self):
        Ad, V = self._csr(seed=1)
        rb = V.row_block(4, 16).row_block(2, 9)
        np.testing.assert_allclose(np.asarray(rb.materialize()),
                                   Ad[6:13], atol=0)

    def test_col_block(self):
        Ad, V = self._csr(seed=2)
        cb = V.col_block(3, 11)
        np.testing.assert_allclose(np.asarray(cb.materialize()),
                                   Ad[:, 3:11], atol=0)

    def test_col_block_of_row_block(self):
        Ad, V = self._csr(seed=3)
        blk = V.row_block(2, 12).col_block(1, 9)
        np.testing.assert_allclose(np.asarray(blk.materialize()),
                                   Ad[2:12, 1:9], atol=0)

    def test_csc_views(self):
        from randlapack_tpu.linops.sparse_views import (csc_col_block,
                                                        csc_row_block,
                                                        CSRMatrixView)
        import scipy.sparse as sp
        rng = np.random.default_rng(4)
        Ad = sp.random(18, 14, density=0.3, random_state=rng).toarray()
        # CSC of A == CSR of A^T
        csrT = sp.csr_matrix(Ad.T)
        At = CSRMatrixView(jnp.asarray(csrT.indptr.astype(np.int32)),
                           jnp.asarray(csrT.indices.astype(np.int32)),
                           jnp.asarray(csrT.data), Ad.T.shape)
        cb = csc_col_block(At, 3, 10)
        np.testing.assert_allclose(np.asarray(cb.materialize()),
                                   Ad[:, 3:10], atol=0)
        rb = csc_row_block(At, 5, 12)
        np.testing.assert_allclose(np.asarray(rb.materialize()),
                                   Ad[5:12, :], atol=0)

    def test_matmat(self):
        Ad, V = self._csr(seed=5)
        X = np.random.default_rng(6).standard_normal((16, 3))
        np.testing.assert_allclose(np.asarray(V.matmat(jnp.asarray(X))),
                                   Ad @ X, atol=1e-12)
