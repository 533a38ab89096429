"""Deterministic-solver details: residual history semantics, lockstep
per-column freezing, block-mode pinv fallback, REVD2 over implicit
operators (reference: test/comps/test_determiter.cc, test_pcgls)."""
import jax
import jax.numpy as jnp
import numpy as np

from randlapack_tpu import RNGState
from randlapack_tpu.comps import PCGConfig, PCGSaddleConfig, pcg, pcg_saddle
from randlapack_tpu.drivers import REVD2Config, revd2_fixed_rank
from randlapack_tpu.gen import gen_exp_singvals, psd_from_eigvals
from randlapack_tpu.linops import ExplicitSymLinOp, SpectralPrecond
from randlapack_tpu.pdkernels import (SquaredExpKernelLinOp,
                                      standardize_dataset)


def _spd(n, cond, seed):
    lam = gen_exp_singvals(n, cond, jnp.float64)
    A, _ = psd_from_eigvals(n, lam, RNGState(seed))
    return A


class TestResidualHistory:
    def test_history_matches_recomputed(self):
        A = _spd(80, 100, 0)
        H = jax.random.normal(jax.random.key(0), (80, 2), dtype=jnp.float64)
        X, hist, it = pcg(A, H, None, jnp.zeros_like(H),
                          PCGConfig(tol=1e-12, max_iters=150))
        it = int(it)
        # final history entry equals the true final residual norm
        true_res = np.linalg.norm(np.asarray(A @ X - H), axis=0)
        np.testing.assert_allclose(np.asarray(hist[it]), true_res,
                                   rtol=1e-6, atol=1e-12)
        # history (mostly) decreases over the run
        h = np.asarray(hist[: it + 1, 0])
        assert h[-1] < 1e-8 * h[0]

    def test_lockstep_freezes_converged_columns(self):
        # column 0: easy system (rhs in the top eigenspace) converges first
        # and must stay frozen while column 1 keeps iterating
        lam = jnp.concatenate([jnp.ones(5, jnp.float64),
                               1e-4 * jnp.ones(75, jnp.float64)])
        A, _ = psd_from_eigvals(80, lam, RNGState(1))
        w, U = np.linalg.eigh(np.asarray(A))
        easy = jnp.asarray(U[:, -1:])              # single eigvec rhs
        hard = jax.random.normal(jax.random.key(2), (80, 1),
                                 dtype=jnp.float64)
        H = jnp.concatenate([easy, hard], axis=1)
        X, hist, it = pcg(A, H, None, jnp.zeros_like(H),
                          PCGConfig(tol=1e-10, max_iters=400))
        res = np.linalg.norm(np.asarray(A @ X - H), axis=0)
        assert res[0] < 1e-9 and res[1] < 1e-9
        h0 = np.asarray(hist[: int(it) + 1, 0])
        # column 0 hits its tolerance much earlier than the run length
        first_conv = int(np.argmax(h0 <= 1e-10 * np.linalg.norm(easy)))
        assert 0 < first_conv < int(it)

    def test_block_mode_handles_dependent_rhs(self):
        # identical rhs columns make the block scalar system singular —
        # the eigh pinv fallback (posm_square) must cope
        A = _spd(60, 50, 3)
        h = jax.random.normal(jax.random.key(3), (60, 1), dtype=jnp.float64)
        H = jnp.concatenate([h, h], axis=1)
        X, hist, it = pcg(A, H, None, jnp.zeros_like(H),
                          PCGConfig(tol=1e-10, max_iters=200, mode="block"))
        res = float(jnp.linalg.norm(A @ X - H) / jnp.linalg.norm(H))
        assert res < 1e-8

    def test_saddle_refresh(self):
        # long run crosses the exact-residual refresh boundary
        import randlapack_tpu.gen as gen
        A, _ = gen.mat_gen(gen.MatGenInfo(400, 60, gen.MatType.exponential,
                                          cond_num=100), RNGState(4))
        xt = jax.random.normal(jax.random.key(4), (60, 1), dtype=jnp.float64)
        b = A @ xt
        M = jnp.eye(60, dtype=jnp.float64)
        x, hist, it = pcg_saddle(A, b, jnp.zeros_like(xt), 0.0, M,
                                 jnp.zeros_like(xt),
                                 PCGSaddleConfig(tol=1e-13, max_iters=400,
                                                 refresh_every=20))
        # unpreconditioned CG on the normal equations: kappa^2 = 1e4
        np.testing.assert_allclose(np.asarray(x), np.asarray(xt), atol=1e-7)


class TestREVD2Linop:
    def test_kernel_operator(self):
        # REVD2 straight over the implicit kernel operator (never densified)
        X = standardize_dataset(jax.random.normal(jax.random.key(5),
                                                  (4, 256),
                                                  dtype=jnp.float64))
        op = SquaredExpKernelLinOp(X, 1.5, 0.0, evals_include_reg=False,
                                   block=64)
        V, lam, err, _, fail, _ = revd2_fixed_rank(op, 32, REVD2Config(), RNGState(6))
        assert not bool(fail)
        from randlapack_tpu.pdkernels import squared_exp_kernel
        K = squared_exp_kernel(X, X, 1.5)
        w = np.linalg.eigvalsh(np.asarray(K))[::-1]
        np.testing.assert_allclose(np.asarray(lam[:8]), w[:8], rtol=1e-4)

    def test_explicit_sym_matches_dense(self):
        A = _spd(128, 1e4, 7)
        V1, l1, e1, _, _, _ = revd2_fixed_rank(ExplicitSymLinOp(A), 16,
                                         REVD2Config(), RNGState(8))
        V2, l2, e2, _, _, _ = revd2_fixed_rank(A, 16, REVD2Config(), RNGState(8))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-12)


class TestSpectralPrecondEffect:
    def test_clusters_spectrum(self):
        lam = gen_exp_singvals(100, 1e6, jnp.float64)
        A, _ = psd_from_eigvals(100, lam, RNGState(9))
        mu = 1e-4
        w, U = np.linalg.eigh(np.asarray(A))
        V = jnp.asarray(U[:, ::-1][:, :40].copy())
        P = SpectralPrecond.prep(V, jnp.asarray(np.sort(w)[::-1][:40].copy()),
                                 mu)
        G = ExplicitSymLinOp(A + mu * jnp.eye(100, dtype=jnp.float64))
        H = jax.random.normal(jax.random.key(6), (100, 1), dtype=jnp.float64)
        cfgp = PCGConfig(tol=1e-10, max_iters=400)
        _, _, it_pre = pcg(G, H, P, jnp.zeros_like(H), cfgp)
        _, _, it_no = pcg(G, H, None, jnp.zeros_like(H), cfgp)
        assert int(it_pre) < int(it_no)


class TestSeminormHook:
    """rl_determiter.hh:299-345 — caller-pluggable seminorm stopping."""

    def _system(self, s=3, n=64, dtype=jnp.float64):
        rng = np.random.default_rng(7)
        Q = rng.standard_normal((n, n))
        G = jnp.asarray(Q @ Q.T + 10 * np.eye(n), dtype)
        H = jnp.asarray(rng.standard_normal((n, s)), dtype)
        return G, H

    def test_frobenius_seminorm_converges_both_modes(self):
        from randlapack_tpu.comps import frobenius_seminorm
        G, H = self._system()
        for mode in ("lockstep", "block"):
            cfg = PCGConfig(tol=1e-9, max_iters=300, mode=mode)
            X, hist, it = pcg(G, H, None, jnp.zeros_like(H), cfg,
                              seminorm=frobenius_seminorm)
            rel = float(jnp.linalg.norm(G @ X - H) / jnp.linalg.norm(H))
            assert rel < 1e-7, (mode, rel)
            # hist carries the even/odd seminorm trace: (it, 2)
            assert hist.shape[1] == 2
            # raw-residual column must match a recomputed Frobenius norm
            # at iteration 0 (R0 = H for X0 = 0)
            np.testing.assert_allclose(float(hist[0, 0]),
                                       float(jnp.linalg.norm(H)),
                                       rtol=1e-12)
            assert int(it) < cfg.max_iters

    def test_custom_seminorm_stops_on_subspace(self):
        # seminorm that ignores the first row: convergence is measured in
        # the quotient — a genuinely semidefinite measure
        G, H = self._system()

        def semi(R):
            return jnp.linalg.norm(R[1:, :])

        cfg = PCGConfig(tol=1e-8, max_iters=300)
        X, hist, it = pcg(G, H, None, jnp.zeros_like(H), cfg,
                          seminorm=semi)
        R = H - G @ X
        assert float(semi(R)) / float(jnp.linalg.norm(H)) < 1e-6


class TestPsdSqrtPinv:
    """rl_determiter.hh:181 — pinv(A) = B·Bᵀ factor with kernel count."""

    def test_rank_deficient(self):
        from randlapack_tpu.comps import psd_sqrt_pinv
        rng = np.random.default_rng(0)
        M = rng.standard_normal((8, 5))
        A = jnp.asarray(M @ M.T)
        B, ker, code = psd_sqrt_pinv(A)
        assert int(ker) == 3 and int(code) == 3
        pinv = np.linalg.pinv(np.asarray(A), rcond=1e-10)
        np.testing.assert_allclose(np.asarray(B @ B.T), pinv, atol=1e-8
                                   * np.linalg.norm(pinv))

    def test_flags(self):
        from randlapack_tpu.comps import psd_sqrt_pinv
        n = 5
        _, _, c_neg = psd_sqrt_pinv(jnp.asarray(-np.eye(n)))
        assert int(c_neg) == -(n + 1)
        _, _, c_zero = psd_sqrt_pinv(jnp.zeros((n, n)))
        assert int(c_zero) == -(n + 2)

    def test_full_rank_inverse(self):
        from randlapack_tpu.comps import psd_sqrt_pinv
        rng = np.random.default_rng(3)
        M = rng.standard_normal((6, 6))
        A = jnp.asarray(M @ M.T + 6 * np.eye(6))
        B, ker, code = psd_sqrt_pinv(A)
        assert int(ker) == 0 and int(code) == 0
        np.testing.assert_allclose(np.asarray(B @ B.T),
                                   np.linalg.inv(np.asarray(A)), atol=1e-10)


class TestKrillSeminorm:
    def test_krill_seminorm_convergence(self):
        from randlapack_tpu.comps import frobenius_seminorm
        from randlapack_tpu.drivers import KrillConfig, krill_full_rpchol
        from randlapack_tpu.linops.symmetric import RegExplicitSymLinOp
        lam = gen_exp_singvals(96, 1e4, jnp.float64)
        K, _ = psd_from_eigvals(96, lam, RNGState(4))
        mu = 1e-3
        G = RegExplicitSymLinOp(K, jnp.asarray([mu], jnp.float64))
        H = jax.random.normal(jax.random.key(2), (96, 1), dtype=jnp.float64)
        cfg = KrillConfig(k=32, rpchol_block=16,
                          pcg=PCGConfig(tol=1e-8, max_iters=200),
                          seminorm=frobenius_seminorm)
        X, hist, it, _ = krill_full_rpchol(G, H, mu, cfg, RNGState(5))
        rel = float(jnp.linalg.norm((K + mu * jnp.eye(96)) @ X - H)
                    / jnp.linalg.norm(H))
        assert rel < 1e-6
        assert hist.shape[1] == 2 and int(it) < 200
