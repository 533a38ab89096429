"""TPU-side invariant sweep — runs the driver surface on the REAL chip
in f32 and checks residual/orthogonality/pivot/finiteness invariants.

Why this exists: CPU-f64 tests stay green through TPU-only failure modes
(this backend miscompiles scalar induction-variable predicates inside
fori_loop — it silently zeroed QB/RSVD on the chip while every CPU test
passed; see CLAUDE.md). Run this after any change to a driver hot path,
and at round end. Exit code 0 iff every check passes.

Usage: python benchmarks/tpu_verify_sweep.py [quick|full]
(quick ≈ 4 min warm; full adds bigger shapes.)
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from randlapack_tpu import RNGState  # noqa: E402
from randlapack_tpu.gen import fast_decay_matrix  # noqa: E402

hp = jax.lax.Precision.HIGHEST
FAILS = []


def check(tag, cond, detail=""):
    status = "ok" if cond else "FAIL"
    print(f"[{status}] {tag} {detail}", flush=True)
    if not cond:
        FAILS.append((tag, detail))


def qr_invariants(tag, A, Q, R, J, fail, res_tol, orth_tol):
    K = Q.shape[1]
    AJ = jnp.take(A, J, axis=1)
    res = float(jnp.linalg.norm(jnp.matmul(Q, R[:K], precision=hp) - AJ)
                / jnp.linalg.norm(A))
    orth = float(jnp.linalg.norm(
        jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(K, dtype=Q.dtype)))
    jvalid = sorted(np.asarray(J).tolist()) == list(range(A.shape[1]))
    check(tag, (res < res_tol or bool(fail)) and orth < orth_tol and jvalid,
          f"res {res:.2e} orth {orth:.2e} fail {bool(fail)}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    t0 = time.time()
    n = 2048

    A, st = fast_decay_matrix(n, n, RNGState(0), dtype=jnp.float32)
    eps = float(jnp.finfo(jnp.float32).eps)
    res_tol = eps ** 0.75 * 10
    orth_tol = eps ** 0.75 * np.sqrt(n) * 10

    from randlapack_tpu.drivers import (ABRIKConfig, BQRRPConfig,
                                        CQRRPTConfig, HQRRPConfig,
                                        RSVDConfig, abrik, bqrrp,
                                        bqrrp_factored, bqrrp_q, cqrrpt,
                                        hqrrp)
    from randlapack_tpu.drivers.rsvd import rsvd_fixed_rank
    from randlapack_tpu.comps import QBConfig

    fac, _ = bqrrp_factored(
        A, BQRRPConfig(block_size=256, pivot_candidates=4, stages=2), st)
    qr_invariants("bqrrp_factored 2048", A, bqrrp_q(fac), fac.R, fac.J,
                  fac.fail, res_tol, orth_tol)

    Q, R, J, rank, fail, _ = bqrrp(A, BQRRPConfig(block_size=256), st)
    qr_invariants("bqrrp explicit 2048", A, Q, R, J, fail, res_tol,
                  orth_tol)

    # worker-kill regression (r3): b=512 full-width LU pivots on this
    # exact matrix once overflowed the trsm-downdated sketch to Inf,
    # and an Inf operand WEDGES XLA's TPU LU kernel — the run killed the
    # TPU worker process. _sanitize_sketch must keep this alive.
    Q, R, J, rank, fail, _ = bqrrp(A, BQRRPConfig(block_size=512), st)
    qr_invariants("bqrrp explicit 2048 b512 (Inf-LU regression)", A, Q, R,
                  J, fail, res_tol, orth_tol)

    Q, R, J, rank, fail, _ = hqrrp(A[:, :512], HQRRPConfig(block_size=128),
                                   st)
    qr_invariants("hqrrp 2048x512", A[:, :512], Q, R, J, fail, res_tol,
                  eps ** 0.75 * np.sqrt(512) * 10)

    At, st2 = fast_decay_matrix(16384, 512, RNGState(1), dtype=jnp.float32,
                                decay=6.0)
    Q, R, J, rank, fail, _ = cqrrpt(At, CQRRPTConfig(sketch="srht"), st2)
    qr_invariants("cqrrpt 16384x512", At, Q, R, J, fail, res_tol,
                  eps ** 0.75 * np.sqrt(512) * 10)
    # the bench-headline opt-in: partitioned-inverse a_mod_trsm must
    # keep trsm-grade quality on a spread-decay matrix (ops/trsm.py)
    Q, R, J, rank, fail, _ = cqrrpt(
        At, CQRRPTConfig(sketch="srht", trsm_mode="blockinv",
                         trsm_block=128), st2)
    qr_invariants("cqrrpt 16384x512 trsm=blockinv", At, Q, R, J, fail,
                  res_tol, eps ** 0.75 * np.sqrt(512) * 10)

    # the miscompile regression class: QB/RSVD error histories must decay
    U, S, Vt, err, _ = rsvd_fixed_rank(
        A, 128, RSVDConfig(QBConfig(block_size=64)), st)
    orth = float(jnp.linalg.norm(
        jnp.matmul(U.T, U, precision=hp) - jnp.eye(128, dtype=jnp.float32)))
    check("rsvd 2048 k128", 0.0 < float(err) < 1.0 and orth < 1e-3,
          f"qb err {float(err):.2e} orth {orth:.2e}")

    U, S, Vt, info, _ = abrik(A[:, :1024], 32,
                              ABRIKConfig(block_size=32, max_iters=4), st)
    check("abrik 2048x1024 k32",
          bool(jnp.all(jnp.isfinite(S))) and float(S[0]) > 0,
          f"sigma0 {float(S[0]):.3e}")

    # x64-on-TPU: BQRRP must auto-route pivot selection to the
    # Householder QRCP (XLA's TPU LU is f32-only) and stay correct
    jax.config.update("jax_enable_x64", True)
    try:
        A64, st64 = fast_decay_matrix(512, 512, RNGState(3),
                                      dtype=jnp.float64)
        fac64, _ = bqrrp_factored(
            A64, BQRRPConfig(block_size=128), st64)
        qr_invariants("bqrrp_factored x64 512", A64, bqrrp_q(fac64),
                      fac64.R, fac64.J, fac64.fail, 1e-8, 1e-8)
    except Exception as e:
        # passes if the failure is LOUD: either our own guidance naming
        # hqrrp/x64, or the backend refusing f64 outright at transfer
        # (this tunneled axon chip rejects 64-bit types before any
        # routing runs — nothing silent can happen)
        msg = str(e).lower()
        loud = any(s in msg for s in ("hqrrp", "x64", "64-bit", "f64",
                                      "float64"))
        check("bqrrp x64 route", loud, f"raised: {e}")
    finally:
        jax.config.update("jax_enable_x64", False)

    # --- round-4 features (CPU-verified; first on-chip exercise) --------
    # condition-aware CholQR auto-ladder: eps-orth at kappa=1e6 f32
    from randlapack_tpu.ops import cholqr_auto
    from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen
    Ac, _ = mat_gen(MatGenInfo(4096, 256, MatType.exponential,
                               cond_num=1e6), RNGState(11),
                    dtype=jnp.float32)
    Qc, Rc, fc = cholqr_auto(Ac)
    orth_c = float(jnp.linalg.norm(
        jnp.matmul(Qc.T, Qc, precision=hp) - jnp.eye(256,
                                                     dtype=jnp.float32)))
    check("cholqr_auto kappa=1e6 f32", (not bool(fc)) and orth_c < 1e-3,
          f"orth {orth_c:.2e}")

    # mixed-precision trailing, chip-measured envelopes (r4 sweep, 8192):
    # HIGH keeps a Householder-class sqrt(n)*eps residual (2.4e-5) and is
    # the supported speed mode; DEFAULT (1-pass bf16) lands ~3.2e-3 and
    # is a documented lossy knob. CPU emulation (~5.5e-6) under-models
    # the real chip — these gates pin the REAL numbers at measured+~2x
    # margin (VERDICT r4 item 8: 1e-4/2e-2 couldn't catch a 6x quality
    # regression).
    facmp, _ = bqrrp_factored(
        A, BQRRPConfig(block_size=256, pivot_candidates=4,
                       trailing_precision="high"), RNGState(12))
    qr_invariants("bqrrp_factored 2048 trailing=high", A,
                  bqrrp_q(facmp), facmp.R, facmp.J, facmp.fail,
                  5e-5, orth_tol)
    facmp, _ = bqrrp_factored(
        A, BQRRPConfig(block_size=256, pivot_candidates=4,
                       trailing_precision="default"), RNGState(12))
    qr_invariants("bqrrp_factored 2048 trailing=default", A,
                  bqrrp_q(facmp), facmp.R, facmp.J, facmp.fail,
                  1e-2, orth_tol)

    # ABRIK early termination on a fast-decay spectrum
    Afd, _ = fast_decay_matrix(1024, 768, RNGState(13),
                               dtype=jnp.float32, decay=30.0)
    _, Sfd, _, info_fd, _ = abrik(Afd, 16,
                                  ABRIKConfig(block_size=16,
                                              max_iters=12),
                                  RNGState(14), tol=1e-5)
    it_fd = int(info_fd["num_krylov_iters"])
    check("abrik early stop (decay=30)",
          it_fd < 12 and bool(jnp.all(jnp.isfinite(Sfd))),
          f"iters {it_fd}/12")

    # one-sided Jacobi SVD route (values + triplet consistency)
    from randlapack_tpu.ops.svd import svd_econ
    Bj = Afd[:256, :256]
    Uj, sj, Vtj = svd_econ(Bj, method="jacobi")
    rj = float(jnp.linalg.norm(
        jnp.matmul(Bj, Vtj.T, precision=hp) - Uj * sj[None, :])
        / jnp.maximum(float(sj[0]), 1e-30))
    check("svd jacobi 256 triplets", rj < 1e-4, f"res {rj:.2e}")

    # sparse-operator parity (r5, VERDICT r4 item 8): the BCOO matmat
    # path must reproduce the dense ABRIK spectrum on the same matrix
    from randlapack_tpu.gen import gen_exp_singvals, gen_sparse_from_singvals
    from randlapack_tpu.linops import SparseLinOp
    svs = gen_exp_singvals(1024, 1e5, jnp.float32)
    Asp, _ = gen_sparse_from_singvals(2048, 1024, svs, 0.02, RNGState(15))
    acfg_sp = ABRIKConfig(block_size=16, max_iters=4)
    _, S_sp, _, _, _ = abrik(SparseLinOp.from_dense(Asp), 16, acfg_sp,
                             RNGState(16))
    _, S_dn, _, _, _ = abrik(Asp, 16, acfg_sp, RNGState(16))
    gap_sp = float(jnp.max(jnp.abs(S_sp - S_dn)
                           / jnp.maximum(S_dn, 1e-30)))
    check("sparse abrik parity 2048x1024 d=0.02", gap_sp < 1e-5,
          f"sv gap {gap_sp:.2e}")  # chip-measured 6.4e-07 (r5)

    # pivot quality vs LAPACK geqp3 (r5, VERDICT r4 items 5+8): the
    # reference's trailing-norm-ratio metric on the chip's f32
    # factorization against f64 host truth. Chip-measured at 2048
    # (docs/pivot_quality_f32_*.json): BQRRP/HQRRP ratios stay within
    # a small constant of geqp3 — gate at measured+margin.
    try:
        import scipy.linalg as _sla
        Apq, _ = fast_decay_matrix(1024, 512, RNGState(17),
                                   dtype=jnp.float32, decay=9.0)
        _, Rq, Jq, _, fq, _ = bqrrp(Apq, BQRRPConfig(block_size=128),
                                    RNGState(18))
        An64 = np.asarray(Apq).astype(np.float64)
        _, R_qp3, _ = _sla.qr(An64, mode="economic", pivoting=True)

        def _trailing(Rm):
            Rm = np.asarray(Rm, np.float64)
            kk = min(Rm.shape)
            sq = np.abs(np.triu(Rm[:kk, :kk])) ** 2
            suf = np.flip(np.flip(sq, (0, 1)).cumsum(0).cumsum(1), (0, 1))
            return np.sqrt(np.diag(suf))

        tn_ours = _trailing(np.asarray(Rq)[:512])
        tn_qp3 = _trailing(R_qp3)
        rat = tn_qp3[:256] / np.maximum(tn_ours[:256], 1e-300)
        # chip-measured r5: [0.86, 1.00] here; [0.79, 1.07] over the
        # 2048 doc tables — gate at ~2x that spread
        check("bqrrp pivot quality vs geqp3 (f32 chip)",
              (not bool(fq)) and 0.5 < rat.min() and rat.max() < 2.0,
              f"norm-ratio [{rat.min():.2f}, {rat.max():.2f}]")
    except Exception as e:
        check("bqrrp pivot quality vs geqp3 (f32 chip)", False,
              f"raised: {e}")

    # r3 OPEN worker-fault regression (LAST in the quick tier on purpose:
    # if these wedge the chip, everything above has already reported).
    # Default config (full-width LU), the two shapes that killed the
    # worker in round 3 even after _sanitize_sketch. Round-4 hardening:
    # the structural-deficiency pad in ops/qr.py::lu_pivot_columns keeps
    # every elimination pivot nonzero (the last block has live=512 < d=640
    # sketch rows -> exact-zero pivots inside the TPU LU kernel were the
    # remaining suspect).
    for (mf, nf) in ((2560, 2048), (4096, 2048)):
        Af, stf = fast_decay_matrix(mf, nf, RNGState(3),
                                    dtype=jnp.float32, decay=9.0)
        Qf, Rf, Jf, rkf, ff, _ = bqrrp(Af, BQRRPConfig(block_size=512),
                                       stf)
        qr_invariants(f"bqrrp explicit {mf}x{nf} b512 (fault regression)",
                      Af, Qf, Rf, Jf, ff, res_tol,
                      eps ** 0.75 * np.sqrt(nf) * 10)
        facf, _ = bqrrp_factored(Af, BQRRPConfig(block_size=512),
                                 RNGState(4))
        qr_invariants(f"bqrrp_factored {mf}x{nf} b512 (fault regression)",
                      Af, bqrrp_q(facf), facf.R, facf.J, facf.fail,
                      res_tol, eps ** 0.75 * np.sqrt(nf) * 10)

    if mode == "full":
        n2 = 4096
        A2, st3 = fast_decay_matrix(n2, n2, RNGState(2), dtype=jnp.float32)
        fac, _ = bqrrp_factored(
            A2, BQRRPConfig(block_size=512, pivot_candidates=4, stages=2),
            st3)
        qr_invariants("bqrrp_factored 4096", A2, bqrrp_q(fac), fac.R,
                      fac.J, fac.fail, res_tol,
                      eps ** 0.75 * np.sqrt(n2) * 10)

    print(f"\n{len(FAILS)} failures, {time.time() - t0:.0f}s")
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
