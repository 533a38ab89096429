"""Per-driver phase-timing parity (reference fixed-slot timing vectors:
CQRRPT 8 slots rl_cqrrpt.hh:370-383, CQRRT 10 rl_cqrrt.hh:258-280, ABRIK
13 rl_abrik.hh:734, BQRRP 10 rl_bqrrp.hh:584-607, HQRRP 26
rl_hqrrp.hh:1150 — returned as named phase dicts, SURVEY.md §5.1)."""
import jax.numpy as jnp
import numpy as np

from randlapack_tpu import RNGState
from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen
from randlapack_tpu.drivers import (ABRIKConfig, BQRRPConfig, CQRRPTConfig,
                                    CQRRTConfig, HQRRPConfig, abrik, bqrrp,
                                    bqrrp_factored, cqrrpt, cqrrt, hqrrp)


def _mat(m=300, n=200, seed=1):
    return mat_gen(MatGenInfo(m, n, MatType.exponential, cond_num=1e6),
                   RNGState(seed))


class TestDriverTiming:
    def test_cqrrpt_phases(self):
        A, st = _mat()
        out = cqrrpt(A, CQRRPTConfig(orthogonalization=True), st,
                     timing=True)
        assert len(out) == 7
        phases = out[6]
        assert {"saso", "qrcp", "rank_reveal", "a_mod_piv", "a_mod_trsm",
                "cholqr", "orth"} <= set(phases)
        assert all(v >= 0 for v in phases.values())

    def test_cqrrt_phases(self):
        A, st = _mat(seed=2)
        Q, R, fail, _, phases = cqrrt(A, CQRRTConfig(), st, timing=True)
        assert {"saso", "qr", "precond", "gram", "potrf", "q",
                "finalize"} <= set(phases)
        # the timed path must produce the same factorization quality
        hp = jnp.float64
        res = float(jnp.linalg.norm(Q @ R - A) / jnp.linalg.norm(A))
        assert res < 1e-12

    def test_abrik_phases_and_equivalence(self):
        A, st = _mat(seed=3)
        cfg = ABRIKConfig(block_size=16, max_iters=4)
        out = abrik(A, 16, cfg, st, timing=True)
        assert len(out) == 6
        phases = out[5]
        assert {"allocation", "sketching", "gemm_A", "reorth", "qr",
                "r_cpy", "s_cpy", "norm", "main_loop", "get_factors",
                "total"} <= set(phases)
        # timed (iteration-split) execution == fused graph execution
        ref = abrik(A, 16, cfg, st)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                                   rtol=1e-10)

    def test_bqrrp_phases(self):
        A, st = _mat(256, 256, seed=4)
        out = bqrrp(A, BQRRPConfig(block_size=64, stages=2), st,
                    timing=True)
        phases = out[6]
        assert "sketch" in phases and "final_orth" in phases
        assert any(k.startswith("stage_") for k in phases)
        out_f = bqrrp_factored(A, BQRRPConfig(block_size=64), st,
                               timing=True)
        assert {"sketch", "stage_0", "epilogue"} <= set(out_f[2])

    def test_hqrrp_phases(self):
        A, st = _mat(200, 150, seed=5)
        out = hqrrp(A, HQRRPConfig(block_size=50), st, timing=True)
        phases = out[6]
        # top-level + the nested per-iteration slots (26-slot analogue;
        # r4 adds wy_t and splits the sketch downdate into its G/Y halves)
        assert {"sketch", "blocks", "epilogue", "qrcp", "qr", "wy_t",
                "updating_A", "updating_sketch_g", "updating_sketch_y",
                "downdating"} <= set(phases)
        # timed block-split run must match the fused run
        ref = hqrrp(A, HQRRPConfig(block_size=50), st)
        np.testing.assert_array_equal(np.asarray(out[2]),
                                      np.asarray(ref[2]))


class TestLinopDriverTiming:
    def test_cholqr_linops_phases(self):
        from randlapack_tpu.drivers import CholQRLinopsConfig, cholqr_linops
        from randlapack_tpu.linops import DenseLinOp
        A, _ = _mat(400, 60, seed=6)
        out = cholqr_linops(DenseLinOp(A), CholQRLinopsConfig(passes=2),
                            timing=True)
        R, fail, chain, phases = out
        assert {"gram_0", "potrf_0", "gram_1", "potrf_1"} <= set(phases)
        # timed path must match the fused path
        R2, f2, _ = cholqr_linops(DenseLinOp(A), CholQRLinopsConfig(passes=2))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-12)

    def test_cqrrt_linops_phases(self):
        from randlapack_tpu.drivers import CQRRTLinopsConfig, cqrrt_linops
        from randlapack_tpu.linops import DenseLinOp
        from randlapack_tpu import RNGState
        A, _ = _mat(400, 60, seed=7)
        out = cqrrt_linops(DenseLinOp(A), CQRRTLinopsConfig(), RNGState(8),
                           timing=True)
        R, fail, chain, _, phases = out
        assert {"sketch", "qr", "gram", "potrf", "recombine"} <= set(phases)
