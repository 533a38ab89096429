"""PD-kernel utility tests (reference: rl_pdkernels.hh —
standardize_dataset :34, euclidean_distance_submatrix :74,
squared_exp_kernel[_submatrix] :102/:133, block_arrowhead_multiply :161)."""
import jax
import jax.numpy as jnp
import numpy as np

from randlapack_tpu.pdkernels import (SquaredExpKernelLinOp,
                                      block_arrowhead_multiply,
                                      squared_distances,
                                      squared_exp_kernel,
                                      squared_exp_kernel_submatrix,
                                      standardize_dataset)


class TestKernels:
    def test_distances_vs_naive(self):
        rng = np.random.default_rng(0)
        XI = rng.standard_normal((5, 12))
        XJ = rng.standard_normal((5, 9))
        D = np.asarray(squared_distances(jnp.asarray(XI), jnp.asarray(XJ)))
        ref = ((XI.T[:, None, :] - XJ.T[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(D, ref, atol=1e-12)

    def test_kernel_properties(self):
        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.standard_normal((4, 30)))
        K = squared_exp_kernel(X, X, 0.8)
        Kh = np.asarray(K)
        np.testing.assert_allclose(np.diag(Kh), 1.0, atol=1e-12)
        np.testing.assert_allclose(Kh, Kh.T, atol=1e-12)
        w = np.linalg.eigvalsh(Kh)
        assert w.min() > -1e-10  # PSD

    def test_submatrix(self):
        rng = np.random.default_rng(2)
        X = jnp.asarray(rng.standard_normal((3, 20)))
        rows = jnp.asarray([1, 5, 7], jnp.int32)
        cols = jnp.asarray([0, 19], jnp.int32)
        sub = squared_exp_kernel_submatrix(X, rows, cols, 1.0)
        K = np.asarray(squared_exp_kernel(X, X, 1.0))
        np.testing.assert_allclose(np.asarray(sub),
                                   K[np.asarray(rows)][:, np.asarray(cols)],
                                   atol=1e-12)

    def test_standardize(self):
        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.standard_normal((6, 50)) * 7 + 3)
        Xs = standardize_dataset(X)
        np.testing.assert_allclose(np.asarray(jnp.mean(Xs, axis=1)), 0.0,
                                   atol=1e-12)

    def test_block_arrowhead(self):
        rng = np.random.default_rng(4)
        k, r, s = 6, 4, 3
        Dd = jnp.asarray(rng.random(k) + 1)
        B = jnp.asarray(rng.standard_normal((k, r)))
        C = jnp.asarray(rng.standard_normal((r, r)))
        V = jnp.asarray(rng.standard_normal((k + r, s)))
        out = block_arrowhead_multiply(Dd, B, C, V)
        M = np.block([[np.diag(np.asarray(Dd)), np.asarray(B)],
                      [np.asarray(B).T, np.asarray(C)]])
        np.testing.assert_allclose(np.asarray(out), M @ np.asarray(V),
                                   atol=1e-12)

    def test_linop_matmat_matches_dense(self):
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.standard_normal((4, 96)))
        op = SquaredExpKernelLinOp(X, 1.2, 0.05, block=32)
        V = jnp.asarray(rng.standard_normal((96, 3)))
        K = np.asarray(squared_exp_kernel(X, X, 1.2))
        ref = (K + 0.05 * np.eye(96)) @ np.asarray(V)
        np.testing.assert_allclose(np.asarray(op.matmat(V)), ref,
                                   rtol=1e-10, atol=1e-12)

    def test_linop_per_column_mu(self):
        rng = np.random.default_rng(6)
        X = jnp.asarray(rng.standard_normal((4, 64)))
        mus = jnp.asarray([0.1, 1.0])
        op = SquaredExpKernelLinOp(X, 1.0, mus, block=64)
        V = jnp.asarray(rng.standard_normal((64, 2)))
        K = np.asarray(squared_exp_kernel(X, X, 1.0))
        ref = K @ np.asarray(V) + np.asarray(V) * np.asarray(mus)[None, :]
        np.testing.assert_allclose(np.asarray(op.matmat(V)), ref,
                                   rtol=1e-10, atol=1e-12)
