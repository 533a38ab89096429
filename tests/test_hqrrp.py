"""HQRRP driver battery — the real Householder-QR-with-randomized-pivoting
algorithm (reference: test/drivers/test_hqrrp.cc + rl_hqrrp.hh:812).

Covers: the qr_type×panel_pivoting grid (qrcp / geqrf / cholqr panels),
arbitrary aspect ratios and non-multiple block sizes, pivot quality vs
LAPACK geqp3 on adversarial/kahan inputs, the GEQP3-format output, the
compact-WY building blocks, Drmač-downdated pivot selection, replayability,
and the CQRRPT QRCPKind.hqrrp wiring (rl_cqrrpt.hh:230-248).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from randlapack_tpu import RNGState
from randlapack_tpu.gen import (MatGenInfo, MatType, mat_gen, kahan_matrix,
                                adversarial_matrix)
from randlapack_tpu.drivers import (HQRRPConfig, PanelQR, hqrrp,
                                    hqrrp_lapack_format)
from randlapack_tpu.ops import util
from randlapack_tpu.ops.qr import (qrcp_panel, qrcp_select_pivots, wy_T,
                                   geqp3)
from randlapack_tpu.ops.householder import apply_reflectors

EPS = float(jnp.finfo(jnp.float64).eps)
ATOL = EPS ** 0.75
hp = jax.lax.Precision.HIGHEST


def _check(A, Q, R, J, factor=10):
    m, n = A.shape
    K = min(m, n)
    AJ = util.col_swap(A, J)
    res = float(jnp.linalg.norm(jnp.matmul(Q, R, precision=hp) - AJ)
                / jnp.linalg.norm(A))
    orth = float(jnp.linalg.norm(
        jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(K)))
    assert res < ATOL * factor, f"residual {res}"
    assert orth < ATOL * np.sqrt(K) * factor, f"orthogonality {orth}"
    assert sorted(np.asarray(J).tolist()) == list(range(n))


class TestHQRRPGrid:
    """The reference fixture's variant grid (test_hqrrp.cc:148 runs the
    cholqr/panel variants; we sweep all three panel types × shapes)."""

    @pytest.mark.parametrize("panel", [PanelQR.qrcp, PanelQR.geqrf,
                                       PanelQR.cholqr])
    @pytest.mark.parametrize("shape,b", [((500, 200), 50),   # ref case
                                         ((300, 300), 64),   # square, rem
                                         ((150, 260), 32)])  # wide
    def test_invariants(self, shape, b, panel):
        m, n = shape
        A, st = mat_gen(MatGenInfo(m, n, MatType.polynomial, cond_num=1e6),
                        RNGState(5))
        Q, R, J, rank, fail, _ = hqrrp(
            A, HQRRPConfig(block_size=b, panel_qr=panel), st)
        assert not bool(fail)
        _check(A, Q, R, J)

    def test_non_multiple_block(self):
        # K=210 with b=64 exercises the remainder epilogue (r=18)
        A, st = mat_gen(MatGenInfo(317, 210, MatType.exponential,
                                   cond_num=1e4), RNGState(7))
        Q, R, J, rank, fail, _ = hqrrp(A, HQRRPConfig(block_size=64), st)
        _check(A, Q, R, J)

    def test_block_bigger_than_k(self):
        A, st = mat_gen(MatGenInfo(120, 40, MatType.gaussian), RNGState(8))
        Q, R, J, rank, fail, _ = hqrrp(A, HQRRPConfig(block_size=64), st)
        _check(A, Q, R, J)

    def test_r_is_upper_trapezoidal(self):
        A, st = mat_gen(MatGenInfo(100, 160, MatType.gaussian), RNGState(9))
        _, R, _, _, _, _ = hqrrp(A, HQRRPConfig(block_size=32), st)
        assert float(jnp.linalg.norm(jnp.tril(R[:, :100], -1))) == 0.0

    def test_replayable(self):
        A, st = mat_gen(MatGenInfo(200, 150, MatType.polynomial,
                                   cond_num=1e3), RNGState(10))
        _, _, J1, _, _, s1 = hqrrp(A, HQRRPConfig(block_size=50), st)
        _, _, J2, _, _, s2 = hqrrp(A, HQRRPConfig(block_size=50), st)
        np.testing.assert_array_equal(np.asarray(J1), np.asarray(J2))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(s1.key)),
            np.asarray(jax.random.key_data(s2.key)))

    def test_distinct_from_bqrrp(self):
        """HQRRP and BQRRP are different algorithms: on the same input
        with the same seed they must run distinct code (pivot sequences
        generically differ beyond the dominant columns)."""
        from randlapack_tpu.drivers import BQRRPConfig, bqrrp
        A, st = mat_gen(MatGenInfo(256, 256, MatType.gaussian), RNGState(11))
        _, _, Jh, _, _, _ = hqrrp(A, HQRRPConfig(block_size=64), st)
        _, _, Jb, _, _, _ = bqrrp(A, BQRRPConfig(block_size=64), st)
        assert not np.array_equal(np.asarray(Jh), np.asarray(Jb))


class TestHQRRPPivotQuality:
    """R-diagonal decay vs LAPACK geqp3 (the reference's pivot-quality
    benchmark, bench_BQRRP/BQRRP_pivot_quality.cc methodology)."""

    def _ratio(self, A, b=32, panel=PanelQR.qrcp):
        _, R, J, _, _, _ = hqrrp(
            A, HQRRPConfig(block_size=b, panel_qr=panel), RNGState(3))
        _, Rr, _ = sla.qr(np.asarray(A), mode="economic", pivoting=True)
        K = min(A.shape)
        ours = np.abs(np.asarray(jnp.diag(R[:, :K])))
        ref = np.abs(np.diag(Rr))[:K]
        ours = np.maximum(ours, 1e-300)
        ref = np.maximum(ref, 1e-300)
        return ours / ref

    def test_polynomial_decay(self):
        A, _ = mat_gen(MatGenInfo(400, 300, MatType.polynomial,
                                  cond_num=1e8), RNGState(1))
        r = self._ratio(A)
        assert np.all(r[:150] > 0.3) and np.all(r[:150] < 3.0), r[:150]

    def test_kahan(self):
        A = kahan_matrix(96, jnp.float64)
        r = self._ratio(A, b=32)
        # kahan defeats greedy pivoting in a controlled way; randomized
        # pivots must stay within a modest factor on the leading half
        assert np.all(r[:48] > 0.1) and np.all(r[:48] < 10.0), r[:48]

    def test_adversarial(self):
        A, _ = adversarial_matrix(300, 200, RNGState(2), jnp.float64)
        r = self._ratio(A)
        assert np.all(r[:100] > 0.2) and np.all(r[:100] < 5.0), r[:100]

    def test_panel_pivoting_improves_kahan(self):
        """panel_pivoting=1 (qrcp panels) must not be worse than unpivoted
        panels on the pivot-hostile kahan matrix."""
        A = kahan_matrix(128, jnp.float64)
        r_piv = self._ratio(A, b=32, panel=PanelQR.qrcp)
        r_upiv = self._ratio(A, b=32, panel=PanelQR.geqrf)
        assert np.min(r_piv[:64]) >= np.min(r_upiv[:64]) * 0.5


class TestHQRRPLapackFormat:
    def test_round_trip(self):
        A, st = mat_gen(MatGenInfo(200, 150, MatType.exponential,
                                   cond_num=1e4), RNGState(6))
        packed, taus, R, J, _ = hqrrp_lapack_format(
            A, HQRRPConfig(block_size=50), st)
        Qr = apply_reflectors(packed, taus)
        AJ = np.asarray(util.col_swap(A, J))
        np.testing.assert_allclose(
            np.asarray(jnp.matmul(Qr, R, precision=hp)), AJ,
            atol=ATOL * 10 * float(jnp.linalg.norm(A)))

    def test_packed_strictly_lower(self):
        A, st = mat_gen(MatGenInfo(120, 90, MatType.gaussian), RNGState(12))
        packed, taus, R, J, _ = hqrrp_lapack_format(
            A, HQRRPConfig(block_size=30), st)
        assert float(jnp.linalg.norm(jnp.triu(packed))) == 0.0
        assert packed.shape == (120, 90) and taus.shape == (90,)


class TestWYBlocks:
    """Unit tests for the compact-WY building blocks."""

    def test_wy_t_matches_reflector_product(self):
        A, _ = mat_gen(MatGenInfo(60, 8, MatType.gaussian), RNGState(13))
        W, V, taus, _ = qrcp_panel(A, 0, pivot=False)
        T, Vz = wy_T(V, taus)
        H = jnp.eye(60) - Vz @ T @ Vz.T
        Hprod = jnp.eye(60)
        for l in range(8):
            v = V[:, l]
            Hprod = Hprod @ (jnp.eye(60) - taus[l] * jnp.outer(v, v))
        np.testing.assert_allclose(np.asarray(H), np.asarray(Hprod),
                                   atol=1e-12)

    def test_wy_t_zero_tau(self):
        # a zero column yields tau=0; the WY product must stay exact
        A = jnp.zeros((20, 3), jnp.float64).at[:, 0].set(
            jnp.arange(20, dtype=jnp.float64) + 1).at[5, 2].set(2.0)
        W, V, taus, _ = qrcp_panel(A, 0, pivot=False)
        T, Vz = wy_T(V, taus)
        H = jnp.eye(20) - Vz @ T @ Vz.T
        assert float(jnp.linalg.norm(H.T @ H - jnp.eye(20))) < 1e-12

    def test_qrcp_panel_row_offset(self):
        """Reflectors at offset row0 must not touch rows < row0."""
        m, b, row0 = 40, 6, 10
        A, _ = mat_gen(MatGenInfo(m, b, MatType.gaussian), RNGState(14))
        W, V, taus, sigma = qrcp_panel(A, row0, pivot=True)
        # rows above row0 of W = original rows of the permuted panel
        np.testing.assert_allclose(np.asarray(W[:row0, :]),
                                   np.asarray(A[:row0, sigma]), atol=0)
        assert float(jnp.linalg.norm(V[:row0, :])) == 0.0
        # factorization of the masked part: A_masked[:, sigma] = Q R
        T, Vz = wy_T(V, taus)
        Q = (jnp.eye(m) - Vz @ T @ Vz.T)
        rows = jnp.arange(m)
        Am = jnp.where(rows[:, None] >= row0, A, 0.0)
        # Q^T A_masked must reproduce W's R part (rows row0..row0+b,
        # upper triangle — below it W stores reflector tails)
        QtA = Q.T @ Am[:, sigma]
        np.testing.assert_allclose(
            np.asarray(jnp.triu(QtA[row0:row0 + b, :])),
            np.asarray(jnp.triu(W[row0:row0 + b, :])), atol=1e-12)

    def test_select_pivots_respects_live_mask(self):
        Y, _ = mat_gen(MatGenInfo(12, 30, MatType.gaussian), RNGState(15))
        live = jnp.ones((30,)).at[jnp.arange(0, 30, 3)].set(0.0)
        chosen = qrcp_select_pivots(Y, 8, live)
        dead = set(range(0, 30, 3))
        assert not (set(np.asarray(chosen).tolist()) & dead)
        assert len(set(np.asarray(chosen).tolist())) == 8

    def test_select_pivots_matches_geqp3_first_block(self):
        """With all columns live, greedy sketch QRCP pivots must match
        LAPACK geqp3's pivots on the same matrix (same algorithm)."""
        Y, _ = mat_gen(MatGenInfo(16, 24, MatType.polynomial,
                                  cond_num=1e6), RNGState(16))
        chosen = qrcp_select_pivots(Y, 8, jnp.ones((24,)))
        _, _, piv = sla.qr(np.asarray(Y), mode="economic", pivoting=True)
        np.testing.assert_array_equal(np.asarray(chosen), piv[:8])


class TestCQRRPTHQRRPWiring:
    def test_cqrrpt_with_hqrrp_qrcp(self):
        from randlapack_tpu.drivers import CQRRPTConfig, QRCPKind, cqrrpt
        A, st = mat_gen(MatGenInfo(800, 120, MatType.polynomial,
                                   cond_num=1e5), RNGState(17))
        cfg = CQRRPTConfig(qrcp=QRCPKind.hqrrp, bqrrp_block=32)
        Q, R, J, rank, fail, _ = cqrrpt(A, cfg, st)
        assert not bool(fail)
        _check(A, Q, R, J)


class TestHQRRPRankDeficient:
    def test_low_rank(self):
        A, st = mat_gen(MatGenInfo(200, 160, MatType.polynomial,
                                   cond_num=1e4, rank=40), RNGState(18))
        Q, R, J, rank, fail, _ = hqrrp(A, HQRRPConfig(block_size=32), st)
        assert int(rank) <= 60
        r = 40
        AJ = util.col_swap(A, J)
        res = float(jnp.linalg.norm(
            jnp.matmul(Q[:, :r], R[:r, :], precision=hp) - AJ)
            / jnp.linalg.norm(A))
        assert res < 1e-8
        # Q stays machine-orthonormal even past the numerical rank
        # (Householder form, unlike CholQR-based drivers)
        orth = float(jnp.linalg.norm(
            jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(160)))
        assert orth < ATOL * np.sqrt(160) * 10

    def test_timing_dict(self):
        A, st = mat_gen(MatGenInfo(100, 80, MatType.gaussian), RNGState(19))
        out = hqrrp(A, HQRRPConfig(block_size=40), st, timing=True)
        assert len(out) == 7
        phases = out[6]
        assert {"sketch", "blocks", "epilogue"} <= set(phases)


class TestUpdateDefer:
    def test_deferred_updates_match_per_block(self):
        """update_defer's telescoped aggregates must reproduce the
        per-block run: same pivot sequence, R to rounding, machine-grade
        residual (the identities are exact; only GEMM grouping differs)."""
        import numpy as np
        from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen
        from randlapack_tpu import RNGState
        hp = jax.lax.Precision.HIGHEST
        A, st = mat_gen(MatGenInfo(150, 256, MatType.exponential,
                                   cond_num=1e6), RNGState(5))
        for pq in list(PanelQR):
            base = hqrrp(A, HQRRPConfig(block_size=32, panel_qr=pq), st)
            for defer in [2, 3]:
                Q, R, J, rank, fail, _ = hqrrp(
                    A, HQRRPConfig(block_size=32, panel_qr=pq,
                                   update_defer=defer), st)
                assert bool(jnp.all(J == base[2])), (pq, defer)
                np.testing.assert_allclose(np.asarray(R),
                                           np.asarray(base[1]),
                                           atol=1e-13)
                K = Q.shape[1]
                res = float(jnp.linalg.norm(
                    jnp.matmul(Q, R[:K], precision=hp)
                    - jnp.take(A, J, axis=1)) / jnp.linalg.norm(A))
                orth = float(jnp.linalg.norm(
                    jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(K)))
                assert res < 1e-13 and orth < 1e-12, (pq, defer, res, orth)
                assert not bool(fail)


class TestHQRRPTrailingPrecision:
    def test_emul_quality_envelope(self):
        # bf16_3x-emulated trailing updates: residual stays within the f32
        # reference tolerance (measured 6.3e-7 -> 5.6e-6 at 1024, flat in
        # defer), orthogonality untouched
        import jax
        from randlapack_tpu.gen import fast_decay_matrix
        hp = jax.lax.Precision.HIGHEST
        A, _ = fast_decay_matrix(512, 512, RNGState(21),
                                 dtype=jnp.float32)
        for defer in (1, 4):
            cfg = HQRRPConfig(block_size=64, update_defer=defer,
                              trailing_precision="bf16_3x_emul")
            Q, R, J, rank, fail, _ = hqrrp(A, cfg, RNGState(22))
            res = float(jnp.linalg.norm(
                jnp.matmul(Q, R, precision=hp) - jnp.take(A, J, axis=1))
                / jnp.linalg.norm(A))
            orth = float(util.orthogonality_check(Q))
            assert res < 3e-5 and orth < 1e-3, (defer, res, orth)
            assert not bool(fail)
