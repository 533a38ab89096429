"""ABRIK, HQRRP, and Q-less linop-driver tests (reference:
test/drivers/test_abrik.cc, test_hqrrp.cc, test/linops + CQRRT_linops
benchmarks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import (ABRIKConfig, CholQRLinopsConfig,
                                    CQRRTLinopsConfig, HQRRPConfig, abrik,
                                    blocked_gram, cholqr_linops,
                                    cqrrt_linops, hqrrp,
                                    hqrrp_lapack_format, materialize_q,
                                    scholqr3_linops)
from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen
from randlapack_tpu.linops import CompositeLinOp, DenseLinOp, SparseLinOp
from randlapack_tpu.ops import util
from randlapack_tpu.ops.householder import apply_reflectors

EPS = np.finfo(np.float64).eps
ATOL = EPS ** 0.75


class TestABRIK:
    def test_dense_svd(self):
        A, st = mat_gen(MatGenInfo(400, 250, MatType.exponential,
                                   cond_num=1e6), RNGState(0))
        U, S, Vt, info, _ = abrik(A, 20, ABRIKConfig(block_size=10,
                                                     max_iters=8), st)
        s_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
        np.testing.assert_allclose(np.asarray(S), s_ref[:20], rtol=1e-8)
        # singular triplet residuals: ||A v - s u||
        for i in range(10):
            r = float(jnp.linalg.norm(A @ Vt[i] - S[i] * U[:, i]))
            assert r < 1e-8 * s_ref[0], (i, r)
        assert float(util.orthogonality_check(U)) < 1e-10

    def test_operator_input(self):
        A, st = mat_gen(MatGenInfo(300, 200, MatType.polynomial,
                                   cond_num=1e4), RNGState(1))
        U1, S1, V1, _, _ = abrik(DenseLinOp(A), 10,
                                 ABRIKConfig(block_size=10, max_iters=6),
                                 RNGState(2))
        U2, S2, V2, _, _ = abrik(A, 10,
                                 ABRIKConfig(block_size=10, max_iters=6),
                                 RNGState(2))
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S2),
                                   rtol=1e-12)

    def test_sparse_operator(self):
        rng = np.random.default_rng(0)
        m, n, nnz = 500, 300, 3000
        rows = rng.integers(0, m, nnz)
        cols = rng.integers(0, n, nnz)
        vals = rng.standard_normal(nnz)
        op = SparseLinOp.from_coo(rows, cols, vals, (m, n))
        # flat random spectrum: Krylov converges on the extreme values
        # first, so check only the leading triplets
        U, S, Vt, _, _ = abrik(op, 4, ABRIKConfig(block_size=8,
                                                  max_iters=16), RNGState(3))
        Ad = np.zeros((m, n)); np.add.at(Ad, (rows, cols), vals)
        s_ref = np.linalg.svd(Ad, compute_uv=False)
        np.testing.assert_allclose(np.asarray(S), s_ref[:4], rtol=1e-5)

    def test_capture_monotone(self):
        A, st = mat_gen(MatGenInfo(300, 300, MatType.exponential,
                                   cond_num=1e8), RNGState(4))
        _, _, _, info, _ = abrik(A, 16, ABRIKConfig(block_size=16,
                                                    max_iters=6), st)
        cap = np.asarray(info["capture"])
        assert np.all(np.diff(cap) >= -1e-10)

    def test_early_termination_fast_decay(self):
        # fast-decay spectrum + tol > 0: the while_loop must stop before
        # the full budget (rl_abrik.hh:454,595 Frobenius capture test)
        # and the leading triplets must stay reference-accurate
        from randlapack_tpu.gen import fast_decay_matrix
        A, st = fast_decay_matrix(400, 300, RNGState(7), decay=30.0)
        cfg = ABRIKConfig(block_size=16, max_iters=12)
        U, S, Vt, info, _ = abrik(A, 16, cfg, RNGState(8), tol=1e-6)
        iters = int(info["num_krylov_iters"])
        assert iters < 12, f"expected early stop, ran {iters}/12"
        s_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
        np.testing.assert_allclose(np.asarray(S[:8]), s_ref[:8],
                                   rtol=1e-5)

    def test_tol_zero_matches_full_budget(self):
        # tol=0 must be bit-identical to the historical full-budget run
        A, st = mat_gen(MatGenInfo(300, 200, MatType.exponential,
                                   cond_num=1e6), RNGState(9))
        cfg = ABRIKConfig(block_size=10, max_iters=6)
        U0, S0, V0, info0, _ = abrik(A, 12, cfg, RNGState(10), tol=0.0)
        U1, S1, V1, info1, _ = abrik(A, 12, cfg, RNGState(10), tol=1e-14)
        np.testing.assert_allclose(np.asarray(S0), np.asarray(S1),
                                   rtol=1e-12)


class TestHQRRP:
    def test_factorization(self):
        A, st = mat_gen(MatGenInfo(500, 400, MatType.polynomial,
                                   cond_num=1e6), RNGState(5))
        Q, R, J, rank, fail, _ = hqrrp(A, HQRRPConfig(block_size=100), st)
        AJ = util.col_swap(A, J)
        res = float(jnp.linalg.norm(Q @ R - AJ) / jnp.linalg.norm(A))
        assert res < ATOL * 10
        assert float(util.orthogonality_check(Q)) < ATOL * np.sqrt(400) * 10

    def test_lapack_format(self):
        A, st = mat_gen(MatGenInfo(200, 150, MatType.exponential,
                                   cond_num=1e4), RNGState(6))
        packed, taus, R, J, _ = hqrrp_lapack_format(
            A, HQRRPConfig(block_size=50), st)
        Qr = apply_reflectors(packed, taus)
        AJ = np.asarray(util.col_swap(A, J))
        np.testing.assert_allclose(np.asarray(Qr @ R), AJ,
                                   atol=ATOL * 10 * float(jnp.linalg.norm(A)))


class TestLinopDrivers:
    def _tall_op(self, seed, m=600, n=80, cond=1e4):
        A, _ = mat_gen(MatGenInfo(m, n, MatType.exponential, cond_num=cond),
                       RNGState(seed))
        return A, DenseLinOp(A)

    def test_blocked_gram_matches(self):
        A, op = self._tall_op(7)
        G1 = blocked_gram(op)
        G2 = blocked_gram(op, block=20)
        np.testing.assert_allclose(np.asarray(G1), np.asarray(A.T @ A),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(G2), np.asarray(G1),
                                   rtol=1e-10)

    def test_cholqr_linops(self):
        A, op = self._tall_op(8)
        R, fail, chain = cholqr_linops(op, CholQRLinopsConfig(gram_block=20,
                                                              passes=2))
        assert not bool(fail)
        Q = materialize_q(op, chain)
        assert float(util.orthogonality_check(Q)) < 1e-9
        np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(A),
                                   atol=ATOL * float(jnp.linalg.norm(A)))

    def test_scholqr3_linops_illcond(self):
        # Q-less blocked variant: orthogonality ~ eps*kappa(R1-chain);
        # residual is eps-grade at any cond
        A, op = self._tall_op(9, cond=1e10)
        R, fail, chain = scholqr3_linops(op, CholQRLinopsConfig())
        assert not bool(fail)
        Q = materialize_q(op, chain)
        assert float(util.orthogonality_check(Q)) < 1e-5
        np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(A),
                                   atol=ATOL * float(jnp.linalg.norm(A)))

    def test_scholqr3_basic_illcond(self):
        # materialized variant: eps-grade orthogonality at extreme cond
        from randlapack_tpu.drivers import scholqr3_linops_basic
        A, op = self._tall_op(19, cond=1e12)
        Q, R, fail = scholqr3_linops_basic(op)
        assert not bool(fail)
        assert float(util.orthogonality_check(Q)) < 1e-12
        np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(A),
                                   atol=ATOL * float(jnp.linalg.norm(A)))

    def test_cqrrt_linops(self):
        # materializing Q from a Q-less factorization re-derives it from A,
        # which carries an intrinsic eps·κ(A) error (same bound as the
        # reference's test-mode trsm materialization) — hence moderate cond
        A, op = self._tall_op(10, cond=1e5)
        R, fail, chain, _ = cqrrt_linops(op, CQRRTLinopsConfig(gram_block=20),
                                         RNGState(11))
        assert not bool(fail)
        Q = materialize_q(op, chain)
        assert float(util.orthogonality_check(Q)) < 1e-9

    def test_composite_operator_gram(self):
        A1, _ = mat_gen(MatGenInfo(500, 60, MatType.gaussian), RNGState(12))
        A2, _ = mat_gen(MatGenInfo(60, 40, MatType.gaussian), RNGState(13))
        comp = CompositeLinOp(DenseLinOp(A1), DenseLinOp(A2))
        G = blocked_gram(comp, block=20)
        ref = np.asarray((A1 @ A2).T @ (A1 @ A2))
        np.testing.assert_allclose(np.asarray(G), ref, rtol=1e-9)


class TestABRIKMore:
    def test_replayable(self):
        A, _ = mat_gen(MatGenInfo(200, 150, MatType.exponential,
                                  cond_num=1e4), RNGState(80))
        cfg = ABRIKConfig(block_size=10, max_iters=4)
        U1, S1, V1, _, _ = abrik(A, 10, cfg, RNGState(81))
        U2, S2, V2, _, _ = abrik(A, 10, cfg, RNGState(81))
        np.testing.assert_array_equal(np.asarray(S1), np.asarray(S2))

    def test_tall_and_wide(self):
        # ABRIK handles both aspect ratios
        for m, n in ((300, 120), (120, 300)):
            A, _ = mat_gen(MatGenInfo(m, n, MatType.exponential,
                                      cond_num=1e4), RNGState(82))
            U, S, Vt, _, _ = abrik(A, 8, ABRIKConfig(block_size=8,
                                                     max_iters=6),
                                   RNGState(83))
            s_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
            np.testing.assert_allclose(np.asarray(S[:4]), s_ref[:4],
                                       rtol=1e-6)

    def test_reorth_passes_config(self):
        A, _ = mat_gen(MatGenInfo(200, 150, MatType.exponential,
                                  cond_num=1e8), RNGState(84))
        for rp in (1, 2):
            U, S, Vt, _, _ = abrik(A, 8, ABRIKConfig(block_size=8,
                                                     max_iters=6,
                                                     reorth_passes=rp),
                                   RNGState(85))
            assert float(util.orthogonality_check(U)) < 1e-8, rp


class TestABRIKQRExplicit:
    """rl_abrik.hh:38-40 QR_explicit subroutine switch."""

    def test_cqrrt_matches_geqrf(self):
        from randlapack_tpu.gen import fast_decay_matrix
        A, _ = fast_decay_matrix(256, 192, RNGState(7), dtype=jnp.float64,
                                 decay=6.0)
        sv = np.linalg.svd(np.asarray(A), compute_uv=False)
        for qe in ("geqrf", "cqrrt"):
            cfg = ABRIKConfig(block_size=16, max_iters=4, qr_explicit=qe)
            U, S, Vt, info, _ = abrik(A, 32, cfg, RNGState(8))
            np.testing.assert_allclose(np.asarray(S[:16]), sv[:16],
                                       rtol=1e-3)
            orth = float(jnp.linalg.norm(U.T @ U - jnp.eye(32)))
            assert orth < 1e-12, (qe, orth)
