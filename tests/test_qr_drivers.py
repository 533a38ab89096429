"""Driver tests: CQRRT, CQRRPT, BQRRP — residual, orthogonality, and pivot
quality vs LAPACK-style ground truth, mirroring the reference's test recipe
(test/drivers/test_{cqrrpt,bqrrp}.cc; tolerances eps^0.75-scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import (BQRRPConfig, CQRRPTConfig, CQRRTConfig,
                                    QRTall, bqrrp, cqrrpt, cqrrt)
from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen
from randlapack_tpu.ops import util

EPS = np.finfo(np.float64).eps
ATOL = EPS ** 0.75


def _check_qr(A, Q, R, J=None, rank=None):
    m, n = A.shape
    k = rank if rank is not None else min(Q.shape[1], R.shape[0])
    Qk, Rk = Q[:, :k], R[:k, :]
    target = util.col_swap(A, J) if J is not None else A
    res = float(jnp.linalg.norm(Qk @ Rk - target) / jnp.linalg.norm(A))
    orth = float(util.orthogonality_check(Qk))
    assert res < ATOL * 10, f"residual {res}"
    assert orth < ATOL * np.sqrt(k) * 10, f"orthogonality {orth}"


class TestCQRRT:
    @pytest.mark.parametrize("cond", [10.0, 1e8])
    def test_basic(self, cond):
        A, st = mat_gen(MatGenInfo(2000, 100, MatType.exponential,
                                   cond_num=cond), RNGState(0))
        Q, R, fail, _ = cqrrt(A, CQRRTConfig(), st)
        assert not bool(fail)
        _check_qr(A, Q, R)
        # R upper triangular
        assert float(jnp.linalg.norm(jnp.tril(R, -1))) == 0.0

    def test_qless_mode(self):
        # compute_q=False: R only, one Gram pass (rl_cqrrt.hh compute_Q)
        A, st = mat_gen(MatGenInfo(1500, 80, MatType.exponential,
                                   cond_num=1e6), RNGState(40))
        Qn, R, fail, _ = cqrrt(A, CQRRTConfig(compute_q=False), RNGState(41))
        assert Qn is None and not bool(fail)
        G = np.asarray(A.T @ A)
        np.testing.assert_allclose(np.asarray(R.T @ R), G,
                                   rtol=1e-8, atol=1e-10)

    def test_srht_sketch(self):
        from randlapack_tpu.drivers import SketchKind
        A, st = mat_gen(MatGenInfo(1000, 64, MatType.exponential,
                                   cond_num=1e4), RNGState(1))
        Q, R, fail, _ = cqrrt(A, CQRRTConfig(sketch=SketchKind.srht), st)
        assert not bool(fail)
        _check_qr(A, Q, R)


class TestCQRRPT:
    @pytest.mark.parametrize("mtype,cond", [
        (MatType.gaussian, None),
        (MatType.polynomial, 1e8),
        (MatType.exponential, 1e10),
    ])
    def test_full_rank(self, mtype, cond):
        info = MatGenInfo(2000, 120, mtype, cond_num=cond or 1e3)
        A, st = mat_gen(info, RNGState(2))
        Q, R, J, rank, fail, _ = cqrrpt(A, CQRRPTConfig(), st)
        assert not bool(fail)
        assert int(rank) == 120
        _check_qr(A, Q, R, J)
        # pivots are a permutation
        assert len(set(np.asarray(J).tolist())) == 120

    def test_rank_deficient(self):
        A, st = mat_gen(MatGenInfo(1500, 50, MatType.exponential,
                                   cond_num=100), RNGState(3))
        A = jnp.concatenate([A, A[:, :50]], axis=1)  # 100 cols, rank 50
        Q, R, J, rank, fail, _ = cqrrpt(A, CQRRPTConfig(), st)
        assert int(rank) == 50
        _check_qr(A, Q, R, J, rank=int(rank))

    def test_bqrrp_on_sketch(self):
        # the large-n configuration: QRCP of the sketch via BQRRP
        from randlapack_tpu.drivers import QRCPKind
        A, st = mat_gen(MatGenInfo(3000, 256, MatType.exponential,
                                   cond_num=1e6), RNGState(50))
        cfg = CQRRPTConfig(qrcp=QRCPKind.bqrrp, bqrrp_block=64)
        Q, R, J, rank, fail, _ = cqrrpt(A, cfg, st)
        assert not bool(fail)
        _check_qr(A, Q, R, J)

    def test_gram_block_same_result(self):
        # syrk-blocked Gram is a pure flop-saving rearrangement: same
        # factorization quality, same pivots, same rank
        A, st = mat_gen(MatGenInfo(2000, 128, MatType.polynomial,
                                   cond_num=1e6), RNGState(21))
        Q0, R0, J0, r0, f0, _ = cqrrpt(A, CQRRPTConfig(), st)
        Qb, Rb, Jb, rb, fb, _ = cqrrpt(A, CQRRPTConfig(gram_block=32), st)
        assert not bool(f0) and not bool(fb)
        assert np.array_equal(np.asarray(J0), np.asarray(Jb))
        assert int(r0) == int(rb)
        _check_qr(A, Qb, Rb, Jb)
        assert np.allclose(np.asarray(Rb), np.asarray(R0),
                           atol=1e-9 * float(jnp.max(jnp.abs(R0))))

    def test_trsm_mode_blockinv_same_result(self):
        # partitioned-inverse a_mod_trsm: same pivots/rank, QR quality
        # within the driver's f64 tolerance on an ill-conditioned input
        A, st = mat_gen(MatGenInfo(2000, 128, MatType.polynomial,
                                   cond_num=1e6), RNGState(23))
        Q0, R0, J0, r0, f0, _ = cqrrpt(A, CQRRPTConfig(), st)
        Qb, Rb, Jb, rb, fb, _ = cqrrpt(
            A, CQRRPTConfig(trsm_mode="blockinv", trsm_block=32), st)
        assert not bool(f0) and not bool(fb)
        assert np.array_equal(np.asarray(J0), np.asarray(Jb))
        assert int(r0) == int(rb)
        _check_qr(A, Qb, Rb, Jb)

    def test_pivot_quality(self):
        # leading R diagonal should track the large singular values
        A, st = mat_gen(MatGenInfo(2000, 100, MatType.step, cond_num=1e6),
                        RNGState(4))
        Q, R, J, rank, fail, _ = cqrrpt(A, CQRRPTConfig(), st)
        s = np.linalg.svd(np.asarray(A), compute_uv=False)
        d = np.abs(np.diag(np.asarray(R)))
        assert d[0] > 0.1 * s[0]
        assert d[-1] < 10 * s[-1] + 1e-12


class TestBQRRP:
    @pytest.mark.parametrize("m,n,b", [(600, 600, 100), (1000, 300, 100),
                                       (300, 1000, 100)])
    def test_shapes(self, m, n, b):
        A, st = mat_gen(MatGenInfo(m, n, MatType.polynomial, cond_num=1e6),
                        RNGState(5))
        Q, R, J, rank, fail, _ = bqrrp(A, BQRRPConfig(block_size=b), st)
        K = min(m, n)
        assert Q.shape == (m, K) and R.shape == (K, n)
        assert not bool(fail)
        _check_qr(A, Q, R, J)
        assert len(set(np.asarray(J).tolist())) == n

    def test_vs_geqp3_diag(self):
        # randomized pivoting should produce an R diagonal within a modest
        # factor of LAPACK geqp3's (the reference's pivot-quality benchmark)
        import scipy.linalg as sla
        A, st = mat_gen(MatGenInfo(400, 400, MatType.step, cond_num=1e8),
                        RNGState(6))
        Q, R, J, rank, fail, _ = bqrrp(A, BQRRPConfig(block_size=50), st)
        _, Rs, _ = sla.qr(np.asarray(A), pivoting=True, mode="economic")
        d, ds = np.abs(np.diag(np.asarray(R))), np.abs(np.diag(Rs))
        ratio = d / ds
        assert ratio.max() < 30 and ratio.min() > 1 / 30

    def test_pivot_candidates(self):
        # candidate-preselected LU pivots: same quality bars as full LU
        import scipy.linalg as sla
        A, st = mat_gen(MatGenInfo(400, 400, MatType.step, cond_num=1e8),
                        RNGState(6))
        Q, R, J, rank, fail, _ = bqrrp(
            A, BQRRPConfig(block_size=50, pivot_candidates=2), st)
        _check_qr(A, Q, R, J)
        _, Rs, _ = sla.qr(np.asarray(A), pivoting=True, mode="economic")
        ratio = np.abs(np.diag(np.asarray(R))) / np.abs(np.diag(Rs))
        assert ratio.max() < 30 and ratio.min() > 1 / 30

    def test_hqr_panel(self):
        A, st = mat_gen(MatGenInfo(500, 200, MatType.exponential,
                                   cond_num=1e10), RNGState(7))
        Q, R, J, rank, fail, _ = bqrrp(
            A, BQRRPConfig(block_size=100, qr_tall=QRTall.hqr), st)
        _check_qr(A, Q, R, J)

    def test_low_rank(self):
        A, st = mat_gen(MatGenInfo(500, 300, MatType.exponential,
                                   cond_num=1e14, rank=300), RNGState(8))
        Q, R, J, rank, fail, _ = bqrrp(A, BQRRPConfig(block_size=100), st)
        # effective rank detected well below 300
        r = int(rank)
        assert r < 300
        # rank-r truncation: residual bounded by the optimal rank-r tail
        s = np.linalg.svd(np.asarray(A), compute_uv=False)
        tail = np.linalg.norm(s[r:])
        res = float(jnp.linalg.norm(Q[:, :r] @ R[:r, :] - util.col_swap(A, J)))
        assert res < 10 * tail + ATOL
        assert float(util.orthogonality_check(Q[:, :r])) < ATOL * np.sqrt(r) * 10


class TestCQRRTOrthogonalization:
    def test_basis_completion_trailing(self):
        # rank-deficient tall input -> FULL orthonormal Q (rl_cqrrt.hh:113)
        A, st = mat_gen(MatGenInfo(1500, 50, MatType.exponential,
                                   cond_num=100), RNGState(60))
        A = jnp.concatenate([A, A[:, :30]], axis=1)  # 80 cols, rank 50
        Q, R, rank, fail, _ = cqrrt(
            A, CQRRTConfig(orthogonalization=True), RNGState(61))
        assert 50 <= int(rank) <= 52
        assert float(util.orthogonality_check(Q)) < 1e-9 * np.sqrt(80)
        # Q spans col(A): every column of A (kept or deficient) projects in
        proj = float(jnp.linalg.norm(A - Q @ (Q.T @ A))
                     / jnp.linalg.norm(A))
        assert proj < ATOL * 10

    def test_basis_completion_interspersed(self):
        # deficient columns in the MIDDLE (no pivoting pushes them
        # trailing — the column-wise keep mask must handle this)
        A, st = mat_gen(MatGenInfo(1200, 40, MatType.exponential,
                                   cond_num=100), RNGState(62))
        cols = [A[:, :15], A[:, 3:10], A[:, 15:]]  # dup block interspersed
        A2 = jnp.concatenate(cols, axis=1)          # 47 cols, rank 40
        Q, R, rank, fail, _ = cqrrt(
            A2, CQRRTConfig(orthogonalization=True), RNGState(63))
        assert 40 <= int(rank) <= 42
        assert float(util.orthogonality_check(Q)) < 1e-9 * np.sqrt(47)
        proj = float(jnp.linalg.norm(A2 - Q @ (Q.T @ A2))
                     / jnp.linalg.norm(A2))
        assert proj < ATOL * 10

    def test_boundary_columns_colscale(self):
        # fuzz seed 850001 t3 reduction: columns scaled across ~30
        # decades put kept columns right at the eps*max keep cutoff —
        # preconditioned near-noise columns left one-pass CholQR orth at
        # 6e-7/6e-8; the CholQR2 second pass must hold eps-level orth
        A, st = mat_gen(MatGenInfo(800, 100, MatType.exponential,
                                   cond_num=1e6), RNGState(850004))
        from randlapack_tpu.drivers import SketchKind
        rng = np.random.RandomState(7)
        scales = 10.0 ** rng.uniform(-18, 2, size=100)
        A = A * jnp.asarray(scales)[None, :] * 1e-12
        Q, R, rank, fail, _ = cqrrt(
            A, CQRRTConfig(sketch=SketchKind.saso, d_factor=1.25,
                           orthogonalization=True), st)
        assert bool(fail) or (
            float(util.orthogonality_check(Q)) < 1e-11 * np.sqrt(100))

    def test_full_rank_matches_plain(self):
        # full-rank input: orth mode is just CQRRT with an extra
        # (no-op-selecting) completion — Q must still factor A
        A, st = mat_gen(MatGenInfo(1000, 60, MatType.exponential,
                                   cond_num=1e6), RNGState(64))
        Q, R, rank, fail, _ = cqrrt(
            A, CQRRTConfig(orthogonalization=True), RNGState(65))
        assert int(rank) == 60 and not bool(fail)
        assert float(util.orthogonality_check(Q)) < 1e-9 * np.sqrt(60)
        proj = float(jnp.linalg.norm(A - Q @ (Q.T @ A))
                     / jnp.linalg.norm(A))
        assert proj < ATOL * 10


class TestCQRRPTOrthogonalization:
    def test_basis_completion(self):
        # rank-deficient input + orthogonalization mode -> FULL orthonormal Q
        from randlapack_tpu.drivers.cqrrpt import CQRRPTConfig as _C
        A, st = mat_gen(MatGenInfo(1500, 50, MatType.exponential,
                                   cond_num=100), RNGState(30))
        A = jnp.concatenate([A, A[:, :30]], axis=1)  # 80 cols, rank 50
        Q, R, J, rank, fail, _ = cqrrpt(A, _C(orthogonalization=True),
                                        RNGState(31))
        # machine-eps rank threshold can land a column or two past the
        # true rank (noise-level diagonal entries)
        assert 50 <= int(rank) <= 52
        # the COMPLETE Q (all 80 columns) is orthonormal
        assert float(util.orthogonality_check(Q)) < 1e-9 * np.sqrt(80)
        # leading-rank part still factors A
        r = int(rank)
        res = float(jnp.linalg.norm(Q[:, :r] @ R[:r] - util.col_swap(A, J))
                    / jnp.linalg.norm(A))
        assert res < ATOL * 10


class TestPivotCandidatesAdversarial:
    def test_coherent_matrix_stays_correct(self):
        # high-coherence input (duplicated columns): top-norm preselection
        # can starve the LU of independent candidates — the factorization
        # must stay correct (fallbacks engage) even if pivot quality drops
        from randlapack_tpu.gen import adversarial_matrix
        A, _ = adversarial_matrix(400, 200, RNGState(70), jnp.float64,
                                  n_copies=4)
        for pc in (None, 2):
            Q, R, J, rank, fail, _ = bqrrp(
                A, BQRRPConfig(block_size=50, pivot_candidates=pc),
                RNGState(71))
            res = float(jnp.linalg.norm(Q @ R - util.col_swap(A, J))
                        / jnp.linalg.norm(A))
            assert res < 1e-10, (pc, res)
            assert bool(jnp.all(jnp.isfinite(Q))), pc
            # the ~50 independent directions are found either way
            d = np.abs(np.diag(np.asarray(R)))
            assert np.sum(d > 1e-6 * d[0]) >= 50, pc


class TestHeadlineConfigShape:
    def test_bench_headline_config_invariants(self):
        """CPU-scale guard for the benchmark headline path: the same
        config shape (cholqr panels + pivot candidates + 2 stages,
        factored form) must stay within reference tolerances."""
        from randlapack_tpu.drivers import (BQRRPConfig, bqrrp_factored,
                                            bqrrp_q)
        A, st = mat_gen(MatGenInfo(1024, 1024, MatType.exponential,
                                   cond_num=1e6), RNGState(77))
        # mirrors the r5 headline shape (b=n/32, defer=4, pc=2)
        cfg = BQRRPConfig(block_size=32, pivot_candidates=2, stages=2,
                          update_defer=4)
        fac, _ = bqrrp_factored(A, cfg, st)
        Q = bqrrp_q(fac)
        res = float(jnp.linalg.norm(Q @ fac.R - jnp.take(A, fac.J, axis=1))
                    / jnp.linalg.norm(A))
        orth = float(jnp.linalg.norm(Q.T @ Q - jnp.eye(1024)))
        assert res < ATOL * 10 and orth < ATOL * np.sqrt(1024) * 10
        assert not bool(fac.fail)


class TestExplicitUpdateDefer:
    def test_explicit_defer_matches_per_block(self):
        """Explicit-form update_defer: the group-end A -= Qg·Tg is the
        per-block GEMM sum reordered, so pivots match exactly and R to
        rounding (incl. through stages and the CQRRPT pass-through)."""
        from randlapack_tpu.drivers import (BQRRPConfig, CQRRPTConfig,
                                            QRCPKind, bqrrp, cqrrpt)
        hp = jax.lax.Precision.HIGHEST
        A, st = mat_gen(MatGenInfo(200, 160, MatType.exponential,
                                   cond_num=1e6), RNGState(5))
        for stages in [1, 2]:
            base = bqrrp(A, BQRRPConfig(block_size=16, stages=stages), st)
            for defer in [2, 4]:
                Q, R, J, rank, fail, _ = bqrrp(
                    A, BQRRPConfig(block_size=16, stages=stages,
                                   update_defer=defer), st)
                assert bool(jnp.all(J == base[2])), (stages, defer)
                np.testing.assert_allclose(np.asarray(R),
                                           np.asarray(base[1]), atol=1e-13)
                assert not bool(fail)
        At, st2 = mat_gen(MatGenInfo(1024, 128, MatType.exponential,
                                     cond_num=1e5), RNGState(6))
        c0 = CQRRPTConfig(qrcp=QRCPKind.bqrrp, bqrrp_block=16)
        c2 = CQRRPTConfig(qrcp=QRCPKind.bqrrp, bqrrp_block=16,
                          bqrrp_update_defer=4)
        out0 = cqrrpt(At, c0, st2)
        out2 = cqrrpt(At, c2, st2)
        np.testing.assert_array_equal(np.asarray(out2[2]),
                                      np.asarray(out0[2]))
        res = float(jnp.linalg.norm(
            jnp.matmul(out2[0], out2[1], precision=hp)
            - jnp.take(At, out2[2], axis=1)) / jnp.linalg.norm(At))
        assert res < 1e-13 and not bool(out2[4])
