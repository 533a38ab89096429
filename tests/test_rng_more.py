"""RNG-state semantics battery — the checkpoint/resume enabler
(SURVEY.md §5.4: every computation replayable from (key, counter);
forked streams via branch ≙ key.incr)."""
import jax
import jax.numpy as jnp
import numpy as np

from randlapack_tpu import RNGState, as_state
from randlapack_tpu.comps import SYPSConfig, Stab, syps
from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen, psd_from_eigvals, gen_exp_singvals


class TestReplayability:
    def test_driver_replay_from_state(self):
        # the reference's core reproducibility contract: same state in →
        # identical results, across separate call sites
        from randlapack_tpu.drivers import BQRRPConfig, bqrrp
        A, _ = mat_gen(MatGenInfo(200, 100, MatType.gaussian), RNGState(0))
        st = RNGState(123)
        out1 = bqrrp(A, BQRRPConfig(block_size=50), st)
        out2 = bqrrp(A, BQRRPConfig(block_size=50), RNGState(123))
        np.testing.assert_array_equal(np.asarray(out1[2]),
                                      np.asarray(out2[2]))
        np.testing.assert_array_equal(np.asarray(out1[1]),
                                      np.asarray(out2[1]))

    def test_state_chaining_gives_fresh_streams(self):
        st = RNGState(5)
        A1, st = mat_gen(MatGenInfo(32, 32, MatType.gaussian), st)
        A2, st = mat_gen(MatGenInfo(32, 32, MatType.gaussian), st)
        A3, st = mat_gen(MatGenInfo(32, 32, MatType.gaussian), st)
        assert not np.allclose(np.asarray(A1), np.asarray(A2))
        assert not np.allclose(np.asarray(A2), np.asarray(A3))

    def test_branch_streams_statistically_independent(self):
        # correlations between branched streams ~ 1/sqrt(n)
        st = RNGState(9)
        n = 20000
        draws = []
        for i in range(3):
            key, _ = st.branch(i).spawn()
            draws.append(np.asarray(jax.random.normal(key, (n,))))
        for i in range(3):
            for j in range(i + 1, 3):
                corr = np.corrcoef(draws[i], draws[j])[0, 1]
                assert abs(corr) < 5 / np.sqrt(n), (i, j, corr)

    def test_as_state(self):
        s1 = as_state(7)
        s2 = as_state(RNGState(7))
        k1, _ = s1.spawn()
        k2, _ = s2.spawn()
        np.testing.assert_array_equal(np.asarray(jax.random.key_data(k1)),
                                      np.asarray(jax.random.key_data(k2)))


class TestSYPSVariants:
    def test_stab_period(self):
        lam = gen_exp_singvals(100, 1e10, jnp.float64)
        A, _ = psd_from_eigvals(100, lam, RNGState(10))
        # with rare stabilization, high powers overflow toward the top
        # eigvec; per-pass stabilization keeps a full-rank basis
        for q in (1, 3):
            Om, _ = syps(A, 8, SYPSConfig(passes_over_data=6,
                                          passes_per_stab=q), RNGState(11))
            assert bool(jnp.all(jnp.isfinite(Om))), q
            s = np.linalg.svd(np.asarray(Om), compute_uv=False)
            assert s[-1] > 0, q

    def test_stabilizers_agree_on_span(self):
        lam = gen_exp_singvals(80, 1e4, jnp.float64)
        A, _ = psd_from_eigvals(80, lam, RNGState(12))
        spans = []
        for stab in (Stab.plu, Stab.cholqr2):
            Om, _ = syps(A, 6, SYPSConfig(passes_over_data=4, stab=stab),
                         RNGState(13))
            Q, _ = np.linalg.qr(np.asarray(Om))
            spans.append(Q)
        # same RNG stream + same power iteration → same subspace
        overlap = np.linalg.svd(spans[0].T @ spans[1],
                                compute_uv=False)
        np.testing.assert_allclose(overlap, 1.0, atol=1e-8)


class TestSketchValidation:
    def test_saso_shape_mismatch(self):
        import pytest as _pt
        from randlapack_tpu.sketching import (SparseDist, fill_sparse,
                                              saso_left_apply)
        op, _ = fill_sparse(SparseDist(10, 40, 2), RNGState(14))
        with _pt.raises(AssertionError):
            saso_left_apply(op, jnp.ones((39, 3)))

    def test_fwht_non_pow2_rejected(self):
        import pytest as _pt
        from randlapack_tpu.sketching import fwht
        with _pt.raises(AssertionError):
            fwht(jnp.ones((100, 2)))
