"""Standalone fresh-seed fuzz driver — run each round with NEW seeds
(CLAUDE.md: the config-boundary grids found 7 real bugs in round 2 and
the Inf/scale class in round 3; test_property_sweeps.py holds the pinned
reductions). Covers every driver family incl. the distributed track,
with random global scales (2^+-80, 10^+-25) exercising the finite/scale
guards. CPU/f64, invariant checks only.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/fuzz_sweep.py SEED TRIALS
Round-3 batches: seeds 20260817/816234/5550123/31337808, 520 trials, 0
real bugs after the round-3 fixes (2 early flags were an over-strict
ABRIK criterion at the exact Krylov boundary q*b = 4k on flat spectra).
"""
import random
import sys
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import numpy as np

from randlapack_tpu import RNGState
from randlapack_tpu.gen import MatGenInfo, MatType, mat_gen

hp = jax.lax.Precision.HIGHEST
SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 12345
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
rng = random.Random(SEED)
fails = 0


def check_qr(tag, A, Q, R, J, fail):
    global fails
    n = A.shape[1]
    kq = Q.shape[1]
    AJ = jnp.take(A, J, axis=1)
    res = float(jnp.linalg.norm(jnp.matmul(Q, R[:kq], precision=hp) - AJ)
                / max(float(jnp.linalg.norm(A)), 1e-300))
    ok_piv = sorted(np.asarray(J).tolist()) == list(range(n))
    if not ok_piv or not (bool(fail) or res < 1e-9):
        fails += 1
        print(f"FAIL {tag}: res={res:.3e} piv_ok={ok_piv}", flush=True)


mts = [MatType.polynomial, MatType.exponential, MatType.gaussian,
       MatType.step]

def rand_scale(rng):
    # mostly power-of-2 extremes (the guard band), sometimes arbitrary
    k = rng.choice([0, 0, -80, -60, -30, 30, 60, 80])
    if rng.random() < 0.3:
        return 10.0 ** rng.choice([-25, -12, 12, 25])
    return 2.0 ** k


def mutate_columns(A, rng, trial):
    """Round-4 failure modes (VERDICT r3 item 10): mixed-scale columns,
    near-duplicate columns, zero/denormal columns — the classes the
    uniform-scale grids of rounds 2-3 never generated. Returns
    (A_mutated, tag_suffix)."""
    n = A.shape[1]
    key = jax.random.key(1_000_003 * trial + 7)
    roll = rng.random()
    if roll < 0.25:
        # mixed-scale columns: per-column pow2 exponents spanning 2^±50
        ks = jax.random.randint(key, (n,), -50, 51).astype(A.dtype)
        return A * (2.0 ** ks)[None, :], ":colscale"
    if roll < 0.45:
        # near-duplicate columns: copy a random prefix block onto a
        # random suffix block with relative 1e-9 noise (rank collapse
        # just above eps — pivot logic must not loop or mis-rank)
        kdup = max(1, n // 3)
        noise = 1e-9 * jax.random.normal(key, (A.shape[0], kdup),
                                         A.dtype)
        scale_ref = jnp.max(jnp.abs(A[:, :kdup]))
        A = A.at[:, n - kdup:].set(A[:, :kdup] + noise * scale_ref)
        return A, ":neardup"
    if roll < 0.55:
        # a zero column and a denormal-scale column
        A = A.at[:, n // 2].set(0.0)
        A = A.at[:, max(0, n // 2 - 1)].multiply(1e-300)
        return A, ":zerodenorm"
    if roll < 0.65:
        # r5-cont-3 novelty: Kahan column structure — the classical
        # column-pivoting adversary (graded upper triangular with
        # engineered near-ties in the trailing norms, gen.py:121 /
        # rl_gen.hh:409). Right-multiplying keeps A's row space; the
        # pivot logic must still satisfy the residual/permutation
        # contract without looping or mis-ranking.
        from randlapack_tpu.gen import kahan_matrix
        theta = 0.9 + 0.8 * float(jax.random.uniform(key, ()))
        K = kahan_matrix(n, A.dtype, theta)
        return jnp.matmul(A, K, precision=hp), ":kahan"
    return A, ""


for trial in range(TRIALS):
    kind = rng.choice(["bqrrp", "factored", "hqrrp", "cqrrpt", "spls",
                       "dist", "dist_spls", "abrik", "cqrrt", "sparse",
                       "rsvd", "krill"])
    scale = rand_scale(rng)
    tag = f"t{trial}:{kind}:s{scale:.0e}"
    try:
        if kind in ("bqrrp", "factored", "hqrrp", "cqrrpt"):
            from randlapack_tpu.drivers import (BQRRPConfig, CQRRPTConfig,
                                                HQRRPConfig, PanelQR,
                                                QRCPKind, bqrrp,
                                                bqrrp_factored, bqrrp_q,
                                                cqrrpt, hqrrp)
            m = rng.choice([33, 64, 97, 150, 256, 320])
            n = rng.choice([30, 64, 100, 190, 256])
            b = rng.choice([8, 16, 32, 48, 64])
            if kind == "cqrrpt" and m < 2 * n:
                m = 4 * n
            A, st = mat_gen(MatGenInfo(m, n, rng.choice(mts),
                                       cond_num=10 ** rng.choice(
                                           [1, 3, 6, 9])),
                            RNGState(SEED + trial))
            A = A * scale
            A, mut = mutate_columns(A, rng, trial)
            tag += f" m{m} n{n} b{b}{mut}"
            # r5 novelty: trailing_precision modes ride every QR config —
            # on CPU/f64 the Precision enum is numerically inert, so the
            # gates stay exact while the defer/sketch_r/precision jit-path
            # combinations all get exercised
            tp = rng.choice(["highest", "high", "default"])
            if kind == "bqrrp":
                cfg = BQRRPConfig(block_size=b, stages=rng.choice([1, 2, 3]),
                                  pivot_candidates=rng.choice([None, 2, 4]),
                                  trailing_precision=tp,
                                  d_factor=rng.choice([1.0, 1.25, 2.0]))
                Q, R, J, rank, fail, _ = bqrrp(A, cfg, st)
                check_qr(tag, A, Q, R, J, fail)
            elif kind == "factored":
                cfg = BQRRPConfig(block_size=b,
                                  update_defer=rng.choice([1, 2, 3]),
                                  sketch_r=rng.choice(["auto", "qr",
                                                       "gram"]),
                                  trailing_precision=tp,
                                  pivot_candidates=rng.choice([None, 2]))
                fac, _ = bqrrp_factored(A, cfg, st)
                check_qr(tag, A, bqrrp_q(fac), fac.R, fac.J, fac.fail)
            elif kind == "hqrrp":
                cfg = HQRRPConfig(block_size=b,
                                  oversample=rng.choice([0, 5, 10]),
                                  update_defer=rng.choice([1, 2, 3, 4]),
                                  trailing_precision=tp,
                                  panel_qr=rng.choice(list(PanelQR)))
                Q, R, J, rank, fail, _ = hqrrp(A, cfg, st)
                check_qr(tag, A, Q, R, J, fail)
            else:
                cfg = CQRRPTConfig(
                    sketch=rng.choice(["saso", "srht", "gaussian"]),
                    qrcp=rng.choice(list(QRCPKind)),
                    bqrrp_block=rng.choice([16, 32]),
                    bqrrp_stages=rng.choice([1, 2]),
                    bqrrp_pivot_candidates=rng.choice([None, 2, 4]),
                    bqrrp_update_defer=rng.choice([1, 2, 4]),
                    bqrrp_trailing_precision=tp,
                    q_form=rng.choice(["inverse", "trsm"]),
                    gram_block=rng.choice([0, 16, 32, 512]),
                    trsm_mode=rng.choice(["xla", "blockinv"]),
                    trsm_block=rng.choice([16, 32, 256]),
                    d_factor=rng.choice([1.25, 2.0, 4.0]),
                    orthogonalization=rng.random() < 0.3)
                Q, R, J, rank, fail, _ = cqrrpt(A, cfg, st)
                check_qr(tag, A, Q[:, :int(rank)], R[:int(rank)], J, fail)
        elif kind == "cqrrt":
            from randlapack_tpu.drivers import (CQRRTConfig, SketchKind,
                                                cqrrt)
            n = rng.choice([24, 40, 64, 100])
            m = rng.choice([4, 8, 16]) * n
            A, st = mat_gen(MatGenInfo(m, n, rng.choice(mts),
                                       cond_num=10 ** rng.choice(
                                           [1, 3, 6])),
                            RNGState(SEED + trial))
            A = A * scale
            A, mut = mutate_columns(A, rng, trial)
            orth_mode = rng.random() < 0.5
            tag += f" m{m} n{n} orth{int(orth_mode)}{mut}"
            cfg = CQRRTConfig(
                sketch=rng.choice(list(SketchKind)),
                d_factor=rng.choice([1.25, 2.0]),
                orthogonalization=orth_mode)
            if orth_mode:
                Q, R, rank, fail, _ = cqrrt(A, cfg, st)
                # contract: FULL orthonormal Q even on mutated inputs
                orth_err = float(jnp.linalg.norm(
                    jnp.matmul(Q.T, Q, precision=hp)
                    - jnp.eye(n, dtype=Q.dtype)))
                if not (bool(fail) or orth_err < 1e-8 * np.sqrt(n)):
                    fails += 1
                    cn = jnp.linalg.norm(A, axis=0)
                    print(f"FAIL {tag}: orth={orth_err:.3e} rank={int(rank)}"
                          f" sketch={cfg.sketch} d_factor={cfg.d_factor}"
                          f" colnorm[{float(jnp.min(cn)):.1e},"
                          f"{float(jnp.max(cn)):.1e}]", flush=True)
            else:
                Q, R, fail, _ = cqrrt(A, cfg, st)
                res = float(jnp.linalg.norm(
                    jnp.matmul(Q, R, precision=hp) - A)
                    / max(float(jnp.linalg.norm(A)), 1e-300))
                if not (bool(fail) or res < 1e-9):
                    fails += 1
                    print(f"FAIL {tag}: res={res:.3e}", flush=True)
        elif kind == "spls":
            from randlapack_tpu.drivers import SPLSConfig, spls
            from randlapack_tpu.comps import PCGSaddleConfig
            m, n = rng.choice([(300, 40), (500, 80), (800, 120)])
            mu = rng.choice([0.0, 1e-6, 1e-3])
            A, _ = mat_gen(MatGenInfo(m, n, MatType.exponential,
                                      cond_num=10 ** rng.choice([2, 4, 6])),
                           RNGState(SEED + trial))
            xt = jax.random.normal(jax.random.key(trial), (n,), jnp.float64)
            bvec = A @ xt
            solver = rng.choice(["pcg", "lsqr", "auto"])
            tag += f" m{m} n{n} {solver} mu{mu}"
            cfg = SPLSConfig(solver=solver,
                             pcg=PCGSaddleConfig(tol=1e-12, max_iters=300),
                             d_factor=rng.choice([2.0, 4.0, 8.0]))
            x, hist, it, _ = spls(A, bvec, mu, cfg, RNGState(SEED + 7))
            r = (jnp.matmul(A.T, jnp.matmul(A, x, precision=hp) - bvec,
                            precision=hp) + mu * x)
            opt = float(jnp.linalg.norm(r) / jnp.linalg.norm(
                jnp.matmul(A.T, bvec, precision=hp)))
            if not opt < 1e-7:
                fails += 1
                print(f"FAIL {tag}: opt={opt:.3e}", flush=True)
        elif kind == "abrik":
            from randlapack_tpu.drivers import ABRIKConfig, abrik
            m = rng.choice([100, 150, 220])
            n = rng.choice([60, 90])
            k = rng.choice([4, 8])
            bs = rng.choice([4, 8])
            q = rng.choice([4, 8, 20])
            A_mt = rng.choice(mts)
            A, st = mat_gen(MatGenInfo(m, n, A_mt,
                                       cond_num=10 ** rng.choice([2, 6])),
                            RNGState(SEED + trial))
            tag += f" m{m} n{n} k{k} b{bs} q{q}"
            cfg = ABRIKConfig(block_size=bs, max_iters=q,
                              qr_explicit=rng.choice(["geqrf", "cqrrt"]))
            U, S, Vt, info, _ = abrik(A, k, cfg, st)
            sv = np.linalg.svd(np.asarray(A), compute_uv=False)
            # sv accuracy only for decaying spectra: gaussian/step have
            # O(1%) relative gaps where block-Krylov convergence at fixed
            # q is legitimately data-dependent (two false flags in r3)
            if q * bs >= 8 * k and A_mt in (MatType.polynomial,
                                            MatType.exponential):
                rel = float(np.max(np.abs(np.asarray(S[:2]) - sv[:2])
                                   / sv[:2]))
                if rel > 1e-6:
                    fails += 1
                    print(f"FAIL {tag}: sv rel={rel:.3e}", flush=True)
            orth = float(jnp.linalg.norm(
                jnp.matmul(U.T, U, precision=hp) - jnp.eye(U.shape[1])))
            if orth > 1e-8:
                fails += 1
                print(f"FAIL {tag}: orth={orth:.3e}", flush=True)
        elif kind == "sparse":
            # r5 novelty (VERDICT r4 item 9): sparse BCOO operands through
            # the operator drivers — ABRIK spectrum parity vs the dense
            # run of the SAME matrix, and CholQR_linops Gram exactness,
            # at random densities incl. extreme global scales
            from randlapack_tpu.drivers import ABRIKConfig, abrik
            from randlapack_tpu.drivers.cholqr_linops import cholqr_linops
            from randlapack_tpu.gen import (gen_exp_singvals,
                                            gen_sparse_from_singvals)
            from randlapack_tpu.linops import SparseLinOp
            m = rng.choice([120, 200, 300])
            n = rng.choice([60, 100])
            dens = rng.choice([0.005, 0.02, 0.1, 0.5])
            sv = gen_exp_singvals(n, 10.0 ** rng.choice([2, 5]),
                                  jnp.float64)
            Ad, st = gen_sparse_from_singvals(m, n, sv, dens,
                                              RNGState(SEED + trial))
            Ad = Ad * scale
            A_op = SparseLinOp.from_dense(Ad)
            sub = rng.choice(["abrik", "cholqr"])
            tag += f" {sub} m{m} n{n} dens{dens}"
            if sub == "abrik":
                k, bs = 4, 4
                cfg = ABRIKConfig(block_size=bs, max_iters=6)
                _, S_sp, _, _, _ = abrik(A_op, k, cfg, RNGState(SEED + 9))
                _, S_dn, _, _, _ = abrik(Ad, k, cfg, RNGState(SEED + 9))
                gap = float(jnp.max(jnp.abs(S_sp - S_dn)
                                    / jnp.maximum(jnp.abs(S_dn), 1e-300)))
                if not gap < 1e-9:
                    fails += 1
                    print(f"FAIL {tag}: sparse-vs-dense sv gap={gap:.3e}",
                          flush=True)
            else:
                R, fail, _ = cholqr_linops(A_op)
                G_true = jnp.matmul(Ad.T, Ad, precision=hp)
                gerr = float(jnp.linalg.norm(
                    jnp.matmul(R.T, R, precision=hp) - G_true)
                    / max(float(jnp.linalg.norm(G_true)), 1e-300))
                if not (bool(fail) or gerr < 1e-9):
                    fails += 1
                    print(f"FAIL {tag}: gram err={gerr:.3e}", flush=True)
        elif kind == "rsvd":
            # r5-cont-3 novelty: low-rank approximation track (RSVD +
            # REVD2) under global scales, every svd_method incl. the
            # one-sided Jacobi route
            from randlapack_tpu.drivers import (REVD2Config, RSVDConfig,
                                                revd2, rsvd)
            from randlapack_tpu.gen import psd_from_eigvals, gen_exp_singvals
            svdm = rng.choice(["auto", "gram_eigh", "jacobi"])
            sub = rng.choice(["rsvd", "revd2"])
            tag += f" {sub} svd={svdm}"
            if sub == "rsvd":
                m = rng.choice([90, 150, 260])
                n = rng.choice([60, 120])
                k = rng.choice([8, 16])
                A_mt = rng.choice([MatType.polynomial, MatType.exponential])
                A, st = mat_gen(MatGenInfo(m, n, A_mt,
                                           cond_num=10 ** rng.choice(
                                               [3, 6, 9])),
                                RNGState(SEED + trial))
                A = A * scale
                tag += f" m{m} n{n} k{k}"
                U, S, Vt, rank, err, _ = rsvd(A, k, RSVDConfig(
                    svd_method=svdm), st)
                orth = float(jnp.linalg.norm(
                    jnp.matmul(U.T, U, precision=hp) - jnp.eye(U.shape[1])))
                nrmA = max(float(jnp.linalg.norm(A)), 1e-300)
                cap = float(jnp.linalg.norm(
                    A - jnp.matmul(U * S[None, :], Vt, precision=hp))) / nrmA
                sv = np.linalg.svd(np.asarray(A, np.float64),
                                   compute_uv=False)
                opt = float(np.linalg.norm(sv[k:]) / np.linalg.norm(sv))
                # rank-k capture within 10x of the optimal tail + eps slack
                if orth > 1e-8 or cap > 10 * opt + 1e-9:
                    fails += 1
                    print(f"FAIL {tag}: orth={orth:.3e} cap={cap:.3e} "
                          f"opt={opt:.3e}", flush=True)
            else:
                n = rng.choice([80, 140])
                k = rng.choice([4, 8])
                lam = gen_exp_singvals(n, 10.0 ** rng.choice([2, 5]),
                                       jnp.float64)
                K, _ = psd_from_eigvals(n, lam, RNGState(SEED + trial))
                K = K * abs(scale)
                tag += f" n{n} k{k}"
                # tol is ABSOLUTE (the reference's err-est comparison,
                # rl_revd2.hh:238-244) — scale it with the operand or the
                # k-doubling legitimately stops at k0 on tiny-normed K
                # (fuzz-check bug found at scale 9e-19, seed 851200 t42)
                V, lam_o, k_used, err, fail, _ = revd2(
                    K, k, 1e-10 * abs(scale), REVD2Config(svd_method=svdm),
                    RNGState(SEED + 5))
                orth = float(jnp.linalg.norm(
                    jnp.matmul(V.T, V, precision=hp)
                    - jnp.eye(V.shape[1])))
                # eigenvalue error vs truth for the captured head
                lam_t = np.sort(np.linalg.eigvalsh(
                    np.asarray(K, np.float64)))[::-1]
                rel = float(np.max(
                    np.abs(np.asarray(lam_o[:2]) - lam_t[:2]) / lam_t[:2]))
                if not (bool(fail) or (orth < 1e-8 and rel < 1e-6)):
                    fails += 1
                    print(f"FAIL {tag}: orth={orth:.3e} rel={rel:.3e}",
                          flush=True)
        elif kind == "krill":
            # r5-cont-3 novelty: kernel-ridge track under global scales
            # (μ scales WITH the kernel — the solve is scale-equivariant),
            # full vs restricted form, scalar vs per-column μ
            from randlapack_tpu.comps import PCGConfig
            from randlapack_tpu.drivers import (KrillConfig,
                                                krill_full_rpchol,
                                                krill_restricted_rpchol)
            from randlapack_tpu.gen import psd_from_eigvals, gen_exp_singvals
            from randlapack_tpu.linops.symmetric import RegExplicitSymLinOp
            n = rng.choice([100, 160, 240])
            s_cols = rng.choice([1, 2])
            lam = gen_exp_singvals(n, 10.0 ** rng.choice([3, 5]),
                                   jnp.float64)
            K, _ = psd_from_eigvals(n, lam, RNGState(SEED + trial))
            sc = abs(scale)
            K = K * sc
            mu_base = 10.0 ** rng.choice([-2, -3])
            mus = jnp.asarray([mu_base * (3.0 ** j) for j in range(s_cols)],
                              jnp.float64) * sc
            G = RegExplicitSymLinOp(K, mus)
            H = jax.random.normal(jax.random.key(trial), (n, s_cols),
                                  jnp.float64) * sc
            sub = rng.choice(["full", "restricted"])
            tag += f" {sub} n{n} s{s_cols} mu{mu_base:.0e}"
            cfg = KrillConfig(k=64, rpchol_block=16,
                              pcg=PCGConfig(tol=1e-10, max_iters=400))
            if sub == "full":
                Xk, hist, it, _ = krill_full_rpchol(G, H, mus, cfg,
                                                    RNGState(SEED + 11))
                for j in range(s_cols):
                    res = float(jnp.linalg.norm(
                        (K + mus[j] * jnp.eye(n)) @ Xk[:, j] - H[:, j])
                        / jnp.linalg.norm(H[:, j]))
                    if not res < 1e-6:
                        fails += 1
                        print(f"FAIL {tag}: col{j} res={res:.3e}",
                              flush=True)
            else:
                Xk, inds, y, _ = krill_restricted_rpchol(
                    G, H, mus, cfg, RNGState(SEED + 11))
                # contract: X supported on the k pivot rows, and the
                # restricted normal equations are solved: with
                # V = K[:, inds-span] ≈ F·Mᵀ, optimality of y in the
                # k-dim ridge. Check support + finite + the ridge
                # residual of the restricted problem via F.
                supp = np.setdiff1d(np.arange(n),
                                    np.asarray(inds))
                off = float(jnp.max(jnp.abs(Xk[supp]))) if len(supp) else 0.0
                if not (np.isfinite(np.asarray(Xk)).all() and off == 0.0):
                    fails += 1
                    print(f"FAIL {tag}: off-support max={off:.3e}",
                          flush=True)
        elif kind in ("dist", "dist_spls"):
            if len(jax.devices()) < 8:
                continue
            from jax.sharding import Mesh
            from randlapack_tpu.parallel import (dist_bqrrp, dist_cqrrpt,
                                                 dist_hqrrp, dist_rsvd,
                                                 dist_spls, row_sharded)
            p = rng.choice([2, 4, 8])
            mesh = Mesh(np.array(jax.devices()[:p]).reshape(p), ("rows",))
            if kind == "dist_spls":
                m = rng.choice([40, 60]) * p
                n = rng.choice([24, 40])
                A, _ = mat_gen(MatGenInfo(m, n, MatType.exponential,
                                          cond_num=10 ** rng.choice(
                                              [2, 5])),
                               RNGState(SEED + trial))
                xt = jax.random.normal(jax.random.key(trial), (n,),
                                       jnp.float64)
                bvec = A @ xt
                mu = rng.choice([0.0, 1e-5])
                tag += f" p{p} m{m} n{n} mu{mu}"
                As = jax.device_put(A, row_sharded(mesh))
                x, hist, it, _ = dist_spls(As, bvec, mu, mesh,
                                           RNGState(SEED + 3),
                                           tol=1e-12, max_iters=150)
                r = (jnp.matmul(A.T, jnp.matmul(A, x, precision=hp)
                                - bvec, precision=hp) + mu * x)
                opt = float(jnp.linalg.norm(r) / jnp.linalg.norm(
                    jnp.matmul(A.T, bvec, precision=hp)))
                if not opt < 1e-8:
                    fails += 1
                    print(f"FAIL {tag}: opt={opt:.3e}", flush=True)
            else:
                m = rng.choice([16, 24, 32]) * p
                n = rng.choice([32, 48])
                A, st = mat_gen(MatGenInfo(m, n, MatType.exponential,
                                           cond_num=10 ** rng.choice(
                                               [2, 5])),
                                RNGState(SEED + trial))
                A = A * scale   # exercises the dist band guards
                drv = rng.choice(["bqrrp", "cqrrpt", "hqrrp", "rsvd",
                                  "cqrrt", "revd2"])
                tag += f" p{p} {drv} m{m} n{n}"
                if drv == "cqrrt":
                    from randlapack_tpu.parallel import dist_cqrrt
                    if m < n:   # tall-only contract (loud require)
                        A, st = mat_gen(
                            MatGenInfo(2 * n if (2 * n) % p == 0
                                       else 2 * n * p, n,
                                       MatType.exponential, cond_num=100),
                            RNGState(SEED + trial))
                        m = A.shape[0]
                    Qc, Rc, fc, _ = dist_cqrrt(A, mesh, st)
                    resc = float(jnp.linalg.norm(
                        jnp.matmul(Qc, Rc, precision=hp) - A)
                        / jnp.linalg.norm(A))
                    if not (bool(fc) or resc < 1e-9):
                        fails += 1
                        print(f"FAIL {tag}: res={resc:.3e}", flush=True)
                    print(f"ok {tag}", flush=True)
                    continue
                if drv == "revd2":
                    from randlapack_tpu.parallel import dist_revd2
                    P = jnp.matmul(A.T, A, precision=hp)
                    P = P / float(jnp.linalg.norm(P))
                    Vv, lam, errv, nuv, fv, _ = dist_revd2(
                        P, 8, mesh, st, error_est_passes=4)
                    orthv = float(jnp.linalg.norm(
                        jnp.matmul(Vv.T, Vv, precision=hp) - jnp.eye(8)))
                    if not (bool(fv) or orthv < 1e-9):
                        fails += 1
                        print(f"FAIL {tag}: orth={orthv:.3e}", flush=True)
                    print(f"ok {tag}", flush=True)
                    continue
                if drv == "rsvd":
                    k = 8
                    U, S, Vt, fail, _ = dist_rsvd(A, k, mesh, st)
                    orth = float(jnp.linalg.norm(
                        jnp.matmul(U.T, U, precision=hp) - jnp.eye(k)))
                    if not (bool(fail) or orth < 1e-8):
                        fails += 1
                        print(f"FAIL {tag}: orth={orth:.3e}", flush=True)
                    continue
                if drv == "cqrrpt" and m < n:
                    # tall-only contract: the loud require IS the
                    # expected behavior on wide inputs (r3 fuzz catch)
                    from randlapack_tpu.errors import RandLAPACKError
                    try:
                        dist_cqrrpt(A, mesh, st)
                        fails += 1
                        print(f"FAIL {tag}: wide input not rejected",
                              flush=True)
                    except RandLAPACKError:
                        pass
                    print(f"ok {tag} (wide->require)", flush=True)
                    continue
                fn = {"bqrrp": dist_bqrrp, "cqrrpt": dist_cqrrpt,
                      "hqrrp": dist_hqrrp}[drv]
                kw = {} if drv == "cqrrpt" else {"block_size": 16}
                Q, R, J, rank, fail, _ = fn(A, mesh, st, **kw)
                check_qr(tag, A, Q, R, J, fail)
        print(f"ok {tag}", flush=True)
    except Exception:
        fails += 1
        print(f"EXC {tag}", flush=True)
        traceback.print_exc()

print(f"DONE seed={SEED} trials={TRIALS} fails={fails}", flush=True)
sys.exit(1 if fails else 0)
