"""Matrix generator tests (reference: rl_gen.hh spectra and adversarial
matrices are themselves load-bearing test infrastructure)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randlapack_tpu import RNGState
from randlapack_tpu.gen import (MatGenInfo, MatType, adversarial_matrix,
                                bad_cholqr_matrix, fast_decay_matrix,
                                gen_exp_singvals, gen_poly_singvals,
                                gen_sparse_coo, gen_sparse_from_singvals,
                                gen_step_singvals, kahan_matrix, mat_gen,
                                psd_from_eigvals)


class TestSpectra:
    def test_exp_cond(self):
        s = gen_exp_singvals(50, 1e8, jnp.float64)
        assert abs(float(s[0] / s[-1]) - 1e8) / 1e8 < 1e-10
        assert np.all(np.diff(np.asarray(s)) <= 0)

    def test_poly_cond(self):
        s = gen_poly_singvals(50, 1e6, 2.0, jnp.float64)
        assert abs(float(s[0] / s[-1]) - 1e6) / 1e6 < 1e-8
        assert np.all(np.diff(np.asarray(s)) <= 0)

    def test_step_levels(self):
        s = gen_step_singvals(40, 1e4, jnp.float64)
        assert len(np.unique(np.asarray(s))) == 4

    @pytest.mark.parametrize("t", [MatType.polynomial, MatType.exponential,
                                   MatType.step])
    def test_generated_spectrum_matches(self, t):
        info = MatGenInfo(300, 80, t, cond_num=1e5)
        A, _ = mat_gen(info, RNGState(0))
        s = np.linalg.svd(np.asarray(A), compute_uv=False)
        assert abs(s[0] / s[-1] - 1e5) / 1e5 < 1e-6


class TestSpecialMatrices:
    def test_kahan_triangular(self):
        K = kahan_matrix(30, jnp.float64)
        assert float(jnp.linalg.norm(jnp.tril(K, -1))) == 0.0
        # tiny smallest singular value — pivoting stress property
        s = np.linalg.svd(np.asarray(K), compute_uv=False)
        assert s[-1] < 1e-3 * s[0]

    def test_bad_cholqr_breaks_single_pass(self):
        from randlapack_tpu.ops import cholqr
        A, _ = bad_cholqr_matrix(500, 60, RNGState(1), jnp.float64,
                                 cond=1e14)
        _, _, fail = cholqr(A)
        assert bool(fail)

    def test_adversarial_coherent(self):
        A, _ = adversarial_matrix(200, 40, RNGState(2), jnp.float64)
        # near-duplicated columns → numerically low rank
        s = np.linalg.svd(np.asarray(A), compute_uv=False)
        assert s[15] < 1e-6 * s[0]

    def test_psd(self):
        lam = gen_exp_singvals(60, 100, jnp.float64)
        A, _ = psd_from_eigvals(60, lam, RNGState(3))
        w = np.linalg.eigvalsh(np.asarray(A))
        np.testing.assert_allclose(np.sort(w)[::-1], np.asarray(lam),
                                   rtol=1e-10)

    def test_fast_decay_shape_and_scale(self):
        A, _ = fast_decay_matrix(512, 128, RNGState(4))
        assert A.shape == (512, 128)
        assert 0.001 < float(jnp.linalg.norm(A)) < 100


class TestSparseGen:
    def test_coo(self):
        (r, c, v), _ = gen_sparse_coo(100, 50, 400, RNGState(5))
        assert r.shape == (400,) and int(r.max()) < 100 and int(c.max()) < 50

    def test_from_singvals(self):
        s = gen_exp_singvals(30, 100, jnp.float64)
        A, _ = gen_sparse_from_singvals(400, 30, s, 0.3, RNGState(6))
        frac = float(jnp.mean((A != 0).astype(jnp.float64)))
        assert 0.2 < frac < 0.4
        sv = np.linalg.svd(np.asarray(A), compute_uv=False)
        # spectrum approximately preserved at the top (masking perturbs)
        assert 0.3 < sv[0] / float(s[0]) < 3.0


class TestDeterminism:
    def test_same_state_same_matrix(self):
        A1, _ = mat_gen(MatGenInfo(64, 32, MatType.gaussian), RNGState(7))
        A2, _ = mat_gen(MatGenInfo(64, 32, MatType.gaussian), RNGState(7))
        np.testing.assert_array_equal(np.asarray(A1), np.asarray(A2))

    def test_state_advances(self):
        info = MatGenInfo(64, 32, MatType.gaussian)
        A1, st = mat_gen(info, RNGState(8))
        A2, _ = mat_gen(info, st)
        assert not np.allclose(np.asarray(A1), np.asarray(A2))
