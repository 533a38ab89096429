"""RSVD/QB battery vs truncated-SVD ground truth across matrix families —
the reference's test_rsvd.cc/test_qb.cc recipe (compose the object stack,
compare against gesdd, check invariants with eps^0.75 tolerances)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randlapack_tpu import RNGState
from randlapack_tpu.comps import (QBConfig, RFConfig, RSConfig, Stab, qb,
                                  qb_blocked, rf, rs)
from randlapack_tpu.drivers import RSVDConfig, rsvd, rsvd_fixed_rank
from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen
from randlapack_tpu.ops import util

EPS = np.finfo(np.float64).eps
ATOL = EPS ** 0.75


class TestRS:
    def test_alignment_improves_with_passes(self):
        # more power passes → sketch more aligned with top right-singular
        # subspace → larger projection energy
        A, st = mat_gen(MatGenInfo(300, 200, MatType.exponential,
                                   cond_num=1e6), RNGState(0))
        _, _, Vt = np.linalg.svd(np.asarray(A))
        V8 = Vt[:8].T
        energies = []
        for p in (0, 2, 4):
            Om, _ = rs(A, 8, RSConfig(passes_over_data=p), RNGState(1))
            Omh = np.asarray(Om)
            Qo, _ = np.linalg.qr(Omh)
            energies.append(np.linalg.norm(V8.T @ Qo))
        assert energies[0] < energies[1] <= energies[2] + 1e-9

    def test_stabilizer_variants(self):
        A, st = mat_gen(MatGenInfo(200, 150, MatType.exponential,
                                   cond_num=1e10), RNGState(2))
        for stab in (Stab.plu, Stab.cholqr2, Stab.hqr):
            Om, _ = rs(A, 10, RSConfig(passes_over_data=4, stab=stab),
                       RNGState(3))
            assert bool(jnp.all(jnp.isfinite(Om))), stab


class TestRF:
    def test_range_capture(self):
        A, st = mat_gen(MatGenInfo(400, 300, MatType.exponential,
                                   cond_num=1e8, rank=20), RNGState(4))
        Q, _ = rf(A, 24, RFConfig(), RNGState(5))
        assert float(util.orthogonality_check(Q)) < 1e-12
        # rank-20 matrix captured by 24-dim basis
        res = float(jnp.linalg.norm(A - Q @ (Q.T @ A)) / jnp.linalg.norm(A))
        assert res < 1e-10


class TestQB:
    @pytest.mark.parametrize("mtype", [MatType.polynomial,
                                       MatType.exponential])
    def test_blocked_error_decreases(self, mtype):
        A, st = mat_gen(MatGenInfo(300, 300, mtype, cond_num=1e8),
                        RNGState(6))
        Q, B, errs, _ = qb_blocked(A, 96, QBConfig(block_size=32),
                                   RNGState(7))
        e = np.asarray(errs)
        assert np.all(np.diff(e) <= 1e-12)
        # factorization identity
        res = float(jnp.linalg.norm(A - Q @ B) / jnp.linalg.norm(A))
        np.testing.assert_allclose(res, e[-1], rtol=1e-6)
        assert float(util.orthogonality_check(Q)) < ATOL * 10

    def test_adaptive_truncation(self):
        A, st = mat_gen(MatGenInfo(300, 300, MatType.exponential,
                                   cond_num=1e12, rank=300), RNGState(8))
        Q, B, rank, err, _ = qb(A, 224, QBConfig(block_size=32),
                                RNGState(9), tol=1e-6)
        assert rank < 224          # stopped early on tolerance
        assert err <= 1e-6 * 1.01


class TestRSVDBattery:
    @pytest.mark.parametrize("mtype,cond", [
        (MatType.polynomial, 1e6),
        (MatType.exponential, 1e10),
        (MatType.step, 1e4),
    ])
    def test_vs_truncated_svd(self, mtype, cond):
        A, st = mat_gen(MatGenInfo(350, 250, mtype, cond_num=cond),
                        RNGState(10))
        k = 64
        U, S, Vt, err, _ = rsvd_fixed_rank(
            A, k, RSVDConfig(QBConfig(block_size=32)), RNGState(11))
        s_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
        # captured spectrum approximates the true one; the Frobenius error
        # is within a modest factor of the optimal rank-k tail
        tail = np.linalg.norm(s_ref[k:])
        rec = np.asarray(U[:, :k] * S[None, :k] @ Vt[:k])
        fro = np.linalg.norm(np.asarray(A) - rec)
        assert fro < 3 * tail + ATOL
        np.testing.assert_allclose(np.asarray(S[:16]), s_ref[:16],
                                   rtol=1e-5)
        assert float(util.orthogonality_check(U)) < ATOL * 10
        assert float(util.orthogonality_check(Vt.T)) < ATOL * 10

    def test_adaptive_rsvd(self):
        A, st = mat_gen(MatGenInfo(300, 300, MatType.exponential,
                                   cond_num=1e12, rank=300), RNGState(12))
        U, S, Vt, rank, err, _ = rsvd(
            A, 224, RSVDConfig(QBConfig(block_size=32)), RNGState(13),
            tol=1e-5)
        assert rank < 224 and err <= 1.01e-5
        assert U.shape[1] == rank

    def test_input_validation(self):
        from randlapack_tpu.errors import RandLAPACKError
        A = jnp.ones((10, 10))
        with pytest.raises(RandLAPACKError):
            rsvd(A, 1000, RSVDConfig(), RNGState(0))


class TestBatching:
    def test_vmapped_rsvd(self):
        # functional design bonus: drivers compose with vmap (batched
        # factorizations in one device program — no reference analogue)
        As = []
        for i in range(3):
            A, _ = mat_gen(MatGenInfo(128, 96, MatType.exponential,
                                      cond_num=1e4), RNGState(i))
            As.append(A)
        batch = jnp.stack(As)
        cfg = RSVDConfig(QBConfig(block_size=16))
        f = jax.vmap(lambda a: rsvd_fixed_rank(a, 32, cfg, RNGState(7))[:3])
        U, S, Vt = f(batch)
        assert U.shape == (3, 128, 32) and S.shape == (3, 32)
        for i in range(3):
            s_ref = np.linalg.svd(np.asarray(As[i]), compute_uv=False)
            np.testing.assert_allclose(np.asarray(S[i][:8]), s_ref[:8],
                                       rtol=1e-4)


class TestDifferentiability:
    def test_grad_through_qb_and_rsvd(self):
        # functional-core bonus: randomized factorizations are exactly
        # differentiable (RNG held fixed) — no reference analogue
        A, st = mat_gen(MatGenInfo(96, 64, MatType.exponential,
                                   cond_num=100), RNGState(0))

        def loss_qb(A):
            Q, B, errs, _ = qb_blocked(A, 32, QBConfig(block_size=16),
                                       RNGState(1))
            return jnp.sum(jnp.square(A - Q @ B))

        g = jax.grad(loss_qb)(A)
        e = 1e-6
        # central difference: one-sided FD's O(e) truncation error is at
        # the edge of rtol=1e-4 for this loss
        fd = (loss_qb(A.at[3, 5].add(e)) - loss_qb(A.at[3, 5].add(-e))) / (2 * e)
        np.testing.assert_allclose(float(g[3, 5]), float(fd), rtol=1e-4)

        def loss_rsvd(A):
            U, S, Vt, err, _ = rsvd_fixed_rank(
                A, 16, RSVDConfig(QBConfig(block_size=16)), RNGState(2))
            return jnp.sum(S[:4])

        g2 = jax.grad(loss_rsvd)(A)
        fd2 = (loss_rsvd(A.at[2, 2].add(e)) - loss_rsvd(A.at[2, 2].add(-e))) / (2 * e)
        np.testing.assert_allclose(float(g2[2, 2]), float(fd2), rtol=1e-4)


class TestQBInLoopStops:
    """In-loop early-stop parity (rl_qb.hh:228, codes 3-4): the blocked
    loop freezes on error growth / orthogonality loss instead of
    committing a bad block, so the error history is non-increasing by
    construction and a pre-budget flat tail is diagnosable."""

    def test_error_history_non_increasing(self):
        from randlapack_tpu.comps import QBConfig, qb_blocked
        A, st = mat_gen(MatGenInfo(300, 200, MatType.exponential,
                                   cond_num=1e10), RNGState(21))
        Q, B, errs, _ = qb_blocked(A, 128, QBConfig(block_size=32), st)
        e = np.asarray(errs)
        assert np.all(np.diff(e) <= 1e-12), e

    def test_low_rank_freezes_not_corrupts(self):
        from randlapack_tpu.comps import QBConfig, qb_blocked
        from randlapack_tpu.comps.qb import qb_status, QB_ERROR_GREW
        A, st = mat_gen(MatGenInfo(300, 200, MatType.polynomial,
                                   cond_num=1e3, rank=32), RNGState(22))
        Q, B, errs, _ = qb_blocked(A, 128, QBConfig(block_size=32), st)
        # rank captured in the first block; later blocks must not degrade
        res = float(jnp.linalg.norm(A - Q @ B) / jnp.linalg.norm(A))
        assert res < 1e-10
        assert qb_status(errs, 1e-10) != QB_ERROR_GREW
