"""Benchmark suite — runs the BASELINE.md configs on the available TPU and
prints ONE JSON line with the headline metric.

Headline: BQRRP blocked randomized pivoted QR on 8192×8192 (f32) in its
factored (implicit-Q, GEQP3-semantics) form — the reference's own output
contract — reported as effective GFLOP/s at the Householder-QR flop count
(4/3·n³), with ``vs_baseline`` the speedup over raw LAPACK sgeqp3
(measured on this host at 2048² and scaled cubically — documented in
BENCH_details.json). Explicit-Q materialization is timed separately.

The headline config runs first; the remaining configs are best-effort
within a wall budget so the JSON line is always emitted. Details for every
config go to BENCH_details.json; progress to stderr.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BUDGET_S = 720  # wall budget for the non-headline configs


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sync(out):
    """Force device execution to completion. On the tunneled axon backend
    ``block_until_ready`` returns before execution finishes — a scalar
    readback is the only reliable barrier (costs one ~30ms RTT)."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                        jnp.floating)]
    return float(jnp.sum(leaves[0]))


def timed(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def _tpu_preflight(timeout_s=240):
    """Probe the chip in a SUBPROCESS with a hard timeout: when the axon
    relay is dead, jax.devices() hangs instead of raising (measured r4),
    so an in-process probe would wedge the whole bench run. Returns
    (ok, message)."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128,128), jnp.float32);"
            "print('SUM', float(jnp.sum(x @ x)))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        if r.returncode == 0 and "SUM" in r.stdout:
            return True, "ok"
        return False, (r.stderr.strip().splitlines() or ["rc!=0"])[-1][:300]
    except subprocess.TimeoutExpired:
        return False, f"probe hung >{timeout_s}s (axon relay down)"


def main():
    t_start = time.time()
    ok, why = _tpu_preflight()
    if not ok:
        # the chip is unreachable (round-3 failure mode: the relay
        # process died and every device op hangs). Emit an HONEST rc=0
        # artifact naming the infrastructure failure instead of crashing
        # with no JSON at all (BENCH_r03.json was rc=1/empty).
        log(f"[bench] TPU unreachable: {why}")
        print(json.dumps({
            "metric": "bqrrp_factored_8192_gflops", "value": 0,
            "unit": "GFLOP/s", "vs_baseline": 0,
            "error": f"tpu_unreachable: {why}",
            "last_measured": {"round": 3, "seconds": 0.196,
                              "gflops": 3710,
                              "note": "BENCH_details.json r3, "
                                      "driver-capture failed rc=1"}}))
        return
    from randlapack_tpu import RNGState
    from randlapack_tpu.gen import fast_decay_matrix
    from randlapack_tpu.comps import QBConfig, PCGSaddleConfig
    from randlapack_tpu.drivers import (BQRRPConfig, CQRRPTConfig, QRCPKind,
                                        RSVDConfig, SPLSConfig, bqrrp,
                                        cqrrpt, spls)
    from randlapack_tpu.drivers.rsvd import rsvd_fixed_rank

    dtype = jnp.float32
    details = {"device": str(jax.devices()[0]), "dtype": "float32"}
    results = {}
    hp = jax.lax.Precision.HIGHEST

    # ---- config 4 (headline): BQRRP 8192x8192 --------------------------
    # Headline times the FACTORED form (implicit block-WY Q) — the
    # reference BQRRP's own output semantics (rl_bqrrp.hh returns
    # reflectors+tau+J, GEQP3-compatible, and does not form Q), measured
    # at the geqp3 flop count and compared against raw LAPACK sgeqp3.
    # Explicit-Q materialization is timed separately in the details.
    from randlapack_tpu.drivers import bqrrp_factored, bqrrp_q
    n = 8192
    log(f"[bench] BQRRP {n}x{n} (factored / GEQP3-semantics) ...")
    A, st = fast_decay_matrix(n, n, RNGState(0), dtype=dtype)
    # update_defer=2 measured on chip (trailing_precision_sweep r4):
    # 0.170 vs 0.196 s same-process at identical quality (the defer
    # telescoping is exact — same pivots, R to 1e-16)
    cfg = BQRRPConfig(block_size=512, pivot_candidates=4, stages=2,
                      update_defer=2)
    # min-of-8: warm reps are ~0.25s each and the headline runs before the
    # wall budget starts; extra reps squeeze the within-process sampling
    # noise out of the one number the driver records
    (fac, _), t = timed(lambda a, s: bqrrp_factored(a, cfg, s), A, st,
                        reps=8)
    qr_flops = 4.0 / 3.0 * n ** 3
    gflops = qr_flops / t / 1e9
    Q = bqrrp_q(fac)
    t0q = time.perf_counter()
    Q = bqrrp_q(fac)
    _sync(Q)
    t_q = time.perf_counter() - t0q
    res = float(jnp.linalg.norm(
        jnp.matmul(Q, fac.R, precision=hp) - jnp.take(A, fac.J, axis=1))
        / jnp.linalg.norm(A))
    orth = float(jnp.linalg.norm(
        jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(n, dtype=dtype)))
    results["bqrrp_8192"] = {"seconds": t, "gflops": gflops,
                             "residual": res, "orth": orth,
                             "fail": bool(fac.fail),
                             "materialize_q_seconds": t_q}
    log(f"[bench] BQRRP {n}: {t:.3f}s = {gflops:.0f} GFLOP/s "
        f"(+{t_q:.3f}s explicit Q), res {res:.2e}, orth {orth:.2e}")

    # speed mode: trailing A-update GEMMs at Precision.HIGH (panel/R/T
    # math stays HIGHEST). Chip-measured res 2.4e-5 at 8192 — i.e.
    # ~sqrt(n)*eps Householder-class residual, orth unchanged. Recorded
    # as a secondary number; the headline stays reference-grade res.
    try:
        cfg_sp = BQRRPConfig(block_size=512, pivot_candidates=4,
                             stages=2, trailing_precision="high")
        (fac_sp, _), t_sp = timed(
            lambda a, s: bqrrp_factored(a, cfg_sp, s), A, st, reps=6)
        Qs = bqrrp_q(fac_sp)
        res_sp = float(jnp.linalg.norm(
            jnp.matmul(Qs, fac_sp.R, precision=hp)
            - jnp.take(A, fac_sp.J, axis=1)) / jnp.linalg.norm(A))
        results["bqrrp_8192_speed_mode"] = {
            "seconds": t_sp, "gflops": qr_flops / t_sp / 1e9,
            "residual": res_sp, "trailing_precision": "high"}
        log(f"[bench] BQRRP {n} speed mode (trailing=high): {t_sp:.3f}s "
            f"= {qr_flops / t_sp / 1e9:.0f} GFLOP/s, res {res_sp:.2e}")
        del Qs, fac_sp
    except Exception as e:  # pragma: no cover
        log(f"[bench] speed mode skipped: {e}")
    del Q, fac, A

    # LAPACK geqp3 baseline + headline JSON line FIRST — the remaining
    # configs are best-effort and must not jeopardize the one-line output
    # (remote-compile times vary by minutes run to run).
    vs_baseline = None
    try:
        import numpy as np
        from scipy.linalg import lapack as slapack
        nb = 2048
        An = np.random.default_rng(0).standard_normal((nb, nb)).astype(
            np.float32)
        t0 = time.perf_counter()
        slapack.sgeqp3(An)  # raw geqp3: implicit Q, same semantics as ours
        t_lapack_small = time.perf_counter() - t0
        t_lapack_8192 = t_lapack_small * (8192 / nb) ** 3
        details["lapack_geqp3_2048_s"] = t_lapack_small
        details["lapack_geqp3_8192_extrapolated_s"] = t_lapack_8192
        vs_baseline = t_lapack_8192 / results["bqrrp_8192"]["seconds"]
        log(f"[bench] LAPACK sgeqp3 2048: {t_lapack_small:.2f}s -> 8192 "
            f"extrapolated {t_lapack_8192:.1f}s -> speedup "
            f"{vs_baseline:.1f}x")
    except Exception as e:  # pragma: no cover
        log(f"[bench] LAPACK baseline unavailable: {e}")

    print(json.dumps({
        "metric": "bqrrp_8192_f32_gflops",
        "value": round(results["bqrrp_8192"]["gflops"], 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }), flush=True)

    # ---- roofline primitives (for the speed-of-light attribution) ------
    # Three measured numbers turn every workload's analytic flop/traffic
    # model into a speed-of-light fraction: the f32-HIGHEST GEMM rate
    # (MXU roofline for everything R-grade), the HBM stream bandwidth,
    # and the tunnel sync floor (every timing below pays one scalar
    # readback — small workloads are RTT-bound, not chip-bound).
    roofline = {}
    try:
        log("[bench] roofline primitives ...")
        kk = jax.random.key(42)
        G8 = jax.random.normal(kk, (8192, 8192), dtype)
        mm = jax.jit(lambda a: jnp.matmul(a, a, precision=hp))
        _, t_mm = timed(mm, G8, reps=5)
        peak_flops = 2.0 * 8192 ** 3 / t_mm
        stream = jax.jit(lambda a: a * 1.0001 + 1.0)
        _, t_st = timed(stream, G8, reps=5)
        bw = 2.0 * G8.size * 4 / t_st          # read + write
        tiny = jax.jit(lambda a: jnp.sum(a[:8, :8]))
        _, t_rtt = timed(tiny, G8, reps=5)
        roofline = {"gemm_f32_highest_tflops": peak_flops / 1e12,
                    "hbm_stream_gbps": bw / 1e9,
                    "sync_rtt_floor_s": t_rtt}
        log(f"[bench] roofline: GEMM {peak_flops/1e12:.1f} TF/s, "
            f"HBM {bw/1e9:.0f} GB/s, sync floor {t_rtt*1e3:.1f} ms")
        del G8
    except Exception as e:  # pragma: no cover
        log(f"[bench] roofline primitives skipped: {e}")
    details["roofline"] = roofline

    def attach_sol(key, model_flops, model_bytes):
        """Annotate results[key] with its speed-of-light attribution:
        sol_seconds = max(flops/peak, bytes/bw) from the workload's
        analytic model, compared against the RTT-corrected wall time."""
        if not roofline or key not in results:
            return
        try:
            _attach_sol_inner(key, model_flops, model_bytes)
        except Exception as e:  # pragma: no cover
            log(f"[bench] SOL attribution for {key} skipped: {e}")

    def _attach_sol_inner(key, model_flops, model_bytes):
        t_meas = results[key]["seconds"]
        sol = max(model_flops / (roofline["gemm_f32_highest_tflops"] * 1e12),
                  model_bytes / (roofline["hbm_stream_gbps"] * 1e9))
        t_chip = max(t_meas - roofline["sync_rtt_floor_s"], 1e-9)
        bound = ("latency" if t_meas < 3 * roofline["sync_rtt_floor_s"]
                 else ("compute" if model_flops / (
                     roofline["gemm_f32_highest_tflops"] * 1e12)
                     >= model_bytes / (roofline["hbm_stream_gbps"] * 1e9)
                     else "bandwidth"))
        results[key]["sol"] = {
            "model_gflops": round(model_flops / 1e9, 1),
            "model_gbytes": round(model_bytes / 1e9, 2),
            "sol_seconds": round(sol, 4),
            "sol_fraction_rtt_corrected": round(sol / t_chip, 3),
            "binding_resource": bound}
        log(f"[bench] {key} SOL: {sol*1e3:.1f} ms ({bound}-bound) -> "
            f"{100*sol/t_chip:.0f}% of light speed")

    # headline: 4/3 n^3 QR flops; traffic ~ 2 trailing read+write sweeps
    # of the remaining columns per block = 2*m*n^2/b elements * 4 B
    attach_sol("bqrrp_8192", qr_flops, 2.0 * 8192 ** 3 / 512 * 4)

    # budget clock restarts here: remote-compile time for the headline
    # varies by MINUTES day to day and must not starve the other configs
    t_start = time.time()

    # ---- config 1: RSVD 4096x4096 rank 256 -----------------------------
    try:
        if time.time() - t_start > BUDGET_S:
            raise TimeoutError("wall budget")
        log("[bench] RSVD 4096 rank 256 ...")
        # decay chosen so the optimal rank-256 tail is ~1e-2: the QB error
        # should land within ~1.1x of it
        A, st = fast_decay_matrix(4096, 4096, RNGState(1), dtype=dtype,
                                  decay=80.0)
        rcfg = RSVDConfig(QBConfig(block_size=64))
        (U, S, Vt, err, _), t_rsvd = timed(
            lambda a, s: rsvd_fixed_rank(a, 256, rcfg, s), A, st)
        results["rsvd_4096_k256"] = {"seconds": t_rsvd,
                                     "qb_rel_err": float(err)}
        log(f"[bench] RSVD: {t_rsvd:.3f}s, QB rel err {float(err):.3e}")
        # QB block loop: ~6 full-width passes of A per block (RS 2, RF
        # apply 1, B_i 1, deflation read+write 2) x k/b blocks
        attach_sol("rsvd_4096_k256", 12.0 * 4096 * 4096 * 256,
                   6.0 * (256 // 64) * 4096 * 4096 * 4)
        del A, U, S, Vt
    except Exception as e:  # pragma: no cover
        log(f"[bench] RSVD skipped: {e}")

    # ---- config 3: CQRRPT 131072x2048 ----------------------------------
    try:
        if time.time() - t_start > BUDGET_S:
            raise TimeoutError("wall budget")
        log("[bench] CQRRPT 131072x2048 ...")
        m, nc = 131072, 2048
        A, st = fast_decay_matrix(m, nc, RNGState(2), dtype=dtype, decay=9.0)
        ccfg = CQRRPTConfig(sketch="srht", qrcp=QRCPKind.bqrrp,
                            bqrrp_block=256)
        (Qc, Rc, Jc, rkc, failc, _), t_cq = timed(
            lambda a, s: cqrrpt(a, ccfg, s), A, st)
        cq_flops = 2.0 * m * nc ** 2
        results["cqrrpt_131072x2048"] = {
            "seconds": t_cq, "gflops": cq_flops / t_cq / 1e9,
            "rank": int(rkc), "fail": bool(failc)}
        log(f"[bench] CQRRPT: {t_cq:.3f}s = {cq_flops/t_cq/1e9:.0f} GFLOP/s")
        # CholQR Gram + trsm dominate the flops (2mn^2); traffic ~ 6
        # full passes of A (sketch read, pivot gather r+w, trsm r+w,
        # Gram read) — the sketch QRCP runs on the small d x n sketch
        attach_sol("cqrrpt_131072x2048", cq_flops, 6.0 * m * nc * 4)
        # phase attribution (the reference's CQRRPT_runtime_breakdown.cc):
        # one synced run — phase sums exceed the fused wall time (each
        # sync pays the ~30ms tunnel RTT), so only the RATIOS matter
        try:
            cqrrpt(A, ccfg, st, timing=True)  # warm: compile + caches
            out_t = cqrrpt(A, ccfg, st, timing=True)
            results["cqrrpt_131072x2048"]["phase_breakdown_s"] = {
                k2: round(v2, 4) for k2, v2 in out_t[-1].items()}
            log(f"[bench] CQRRPT phases: {out_t[-1]}")
        except Exception as e2:
            log(f"[bench] CQRRPT breakdown skipped: {e2}")
        del A, Qc, Rc
    except Exception as e:  # pragma: no cover
        log(f"[bench] CQRRPT skipped: {e}")

    # ---- config 6: HQRRP 8192x8192 --------------------------------------
    # The randomized-pivoting Householder driver (CQRRPT's fallback QRCP
    # + the x64-on-TPU pivoted path). r3 target: within 2.5x of BQRRP's
    # factored headline.
    try:
        if time.time() - t_start > BUDGET_S:
            raise TimeoutError("wall budget")
        log("[bench] HQRRP 8192x8192 ...")
        from randlapack_tpu.drivers import HQRRPConfig, hqrrp_lapack_format
        A, st = fast_decay_matrix(8192, 8192, RNGState(7), dtype=dtype)
        # update_defer=4 chip-measured (hqrrp_speed grid r4): packed
        # 0.347 vs 0.399 s at defer=1, identical quality
        hcfg = HQRRPConfig(block_size=128, update_defer=4)
        # time the packed GEQP3-semantics form (the reference's native
        # output, rl_hqrrp.hh:778 — same semantics as the BQRRP
        # headline); explicit Q is timed separately like bqrrp_q
        (packed_h, taus_h, Rh, Jh, _), t_hq = timed(
            lambda a, s: hqrrp_lapack_format(a, hcfg, s), A, st, reps=2)
        mk_q = jax.jit(lambda p, t: jax.lax.linalg.householder_product(
            p + jnp.eye(8192, dtype=dtype), t))
        _sync(mk_q(packed_h, taus_h))  # warm the compile out of the timing
        t0q = time.perf_counter()
        Qh = mk_q(packed_h, taus_h)
        _sync(Qh)
        t_hq_q = time.perf_counter() - t0q
        res_h = float(jnp.linalg.norm(
            jnp.matmul(Qh, Rh, precision=hp) - jnp.take(A, Jh, axis=1))
            / jnp.linalg.norm(A))
        orth_h = float(jnp.linalg.norm(
            jnp.matmul(Qh.T, Qh, precision=hp)
            - jnp.eye(8192, dtype=dtype)))
        results["hqrrp_8192"] = {
            "seconds": t_hq,
            "gflops": (4.0 / 3.0 * 8192 ** 3) / t_hq / 1e9,
            "residual": res_h, "orth": orth_h,
            "materialize_q_seconds": t_hq_q,
            "vs_bqrrp_factored": t_hq / results["bqrrp_8192"]["seconds"]}
        log(f"[bench] HQRRP: {t_hq:.3f}s = "
            f"{4/3*8192**3/t_hq/1e9:.0f} GFLOP/s (+{t_hq_q:.3f}s Q), "
            f"res {res_h:.2e}, orth {orth_h:.2e} "
            f"({t_hq/results['bqrrp_8192']['seconds']:.2f}x BQRRP)")
        # same QR flop count; trailing WY read+write sweeps at b=128 make
        # it 4x more traffic-intensive than the b=512 headline
        attach_sol("hqrrp_8192", 4.0 / 3.0 * 8192 ** 3,
                   2.0 * 8192 ** 3 / 128 * 4)
        del A, Qh, Rh, packed_h
    except Exception as e:  # pragma: no cover
        log(f"[bench] HQRRP skipped: {e}")

    # ---- config 5: ABRIK block-Krylov SVD + KRILL KRR -------------------
    try:
        if time.time() - t_start > BUDGET_S:
            raise TimeoutError("wall budget")
        log("[bench] ABRIK 8192x4096 k=64 ...")
        from randlapack_tpu.drivers import ABRIKConfig, abrik
        A, st = fast_decay_matrix(8192, 4096, RNGState(5), dtype=dtype,
                                  decay=12.0)
        acfg = ABRIKConfig(block_size=64, max_iters=4)
        (U, S, Vt, info, _), t_ab = timed(
            lambda a, s: abrik(a, 64, acfg, s), A, st, reps=2)
        r0 = float(jnp.linalg.norm(
            jnp.matmul(A, Vt[0], precision=hp) - S[0] * U[:, 0]))
        results["abrik_8192x4096_k64"] = {"seconds": t_ab,
                                          "triplet0_resid": r0}
        log(f"[bench] ABRIK: {t_ab:.3f}s, triplet-0 resid {r0:.2e}")
        # per Krylov iter: A@V and A^T@U (2 x 2mnb) + reorth small terms;
        # traffic = 2 reads of A per iter
        attach_sol("abrik_8192x4096_k64", 8.0 * 8192 * 4096 * 64 * 4,
                   2.0 * 4 * 8192 * 4096 * 4)
        # ABRIK-vs-RSVD at matched rank — the reference ships
        # ABRIK_speed_comparisons.cc precisely to COMPARE the Krylov
        # driver against RSVD; record both sides on the same matrix so
        # the artifact carries the comparison, not a lone point.
        try:
            S_ab = S
            rcfg_cmp = RSVDConfig(QBConfig(block_size=64))
            (Ur, Sr, Vtr, err_r, _), t_rv = timed(
                lambda a, s: rsvd_fixed_rank(a, 64, rcfg_cmp, s), A, st,
                reps=2)
            rr0 = float(jnp.linalg.norm(
                jnp.matmul(A, Vtr[0], precision=hp) - Sr[0] * Ur[:, 0]))
            results["abrik_vs_rsvd_8192x4096_k64"] = {
                "abrik_seconds": t_ab, "rsvd_seconds": t_rv,
                "abrik_triplet0_resid": r0, "rsvd_triplet0_resid": rr0,
                "sv_rel_gap_max": float(jnp.max(
                    jnp.abs(S_ab[:64] - Sr[:64])
                    / jnp.maximum(Sr[:64], 1e-30)))}
            log(f"[bench] ABRIK vs RSVD k=64: {t_ab:.3f}s vs {t_rv:.3f}s, "
                f"triplet-0 resid {r0:.2e} vs {rr0:.2e}")
            del Ur, Sr, Vtr
        except Exception as e2:
            log(f"[bench] ABRIK-vs-RSVD comparison skipped: {e2}")
        del A, U, S, Vt

        log("[bench] KRILL n=8192 ...")
        from randlapack_tpu.drivers import KrillConfig, krill_full_rpchol
        from randlapack_tpu.comps import PCGConfig
        from randlapack_tpu.pdkernels import (SquaredExpKernelLinOp,
                                              standardize_dataset)
        import numpy as np
        X = standardize_dataset(jax.random.normal(jax.random.key(11),
                                                  (8, 8192), dtype=dtype))
        # bandwidth = median pairwise distance (the RBF median heuristic):
        # bw=1.0 on 8-dim standardized data makes K near-diagonal and the
        # rank-k preconditioner useless (measured: 100-iter cap); at the
        # median (~3.8) + k=256 PCG converges in ~14 iterations (CPU scale
        # model, round 3)
        sub = np.asarray(X[:, :256])
        d2 = ((sub[:, :, None] - sub[:, None, :]) ** 2).sum(0)
        bw = float(np.sqrt(np.median(d2[d2 > 0])))
        G = SquaredExpKernelLinOp(X, bw, 1e-2, block=2048)
        h = jax.random.normal(jax.random.key(12), (8192, 1), dtype=dtype)
        kcfg = KrillConfig(k=256, rpchol_block=64,
                           pcg=PCGConfig(tol=1e-5, max_iters=100))
        (Xs, histk, itk, _), t_kr = timed(
            lambda gg, hh, s: krill_full_rpchol(gg, hh, 1e-2, kcfg, s),
            G, h, RNGState(6), reps=1)
        hk = jnp.asarray(histk)[: int(itk) + 1, 0]
        final_rel = float(hk[-1] / hk[0])
        results["krill_8192"] = {"seconds": t_kr, "iters": int(itk),
                                 "bandwidth_median_heuristic": bw,
                                 "final_rel_resid": final_rel,
                                 "converged": bool(int(itk) < 100)}
        log(f"[bench] KRILL: {t_kr:.3f}s, {int(itk)} CG iters, "
            f"final rel resid {final_rel:.2e} (bw={bw:.2f})")
        # fused kernel matvec: K tiles are (re)computed in VMEM each CG
        # iter — 2*n^2*(d + ~3) flops, near-zero HBM traffic (X is 8 x n)
        attach_sol("krill_8192",
                   (int(itk) + 1) * 2.0 * 8192 ** 2 * (8 + 3),
                   (int(itk) + 1) * 8192 * 8 * 4 * 2)
    except Exception as e:  # pragma: no cover
        log(f"[bench] ABRIK/KRILL skipped: {e}")

    # ---- config 2: sketch-precondition least squares -------------------
    try:
        if time.time() - t_start > BUDGET_S:
            raise TimeoutError("wall budget")
        log("[bench] SPLS 100000x2000 ...")
        m2, n2 = 100000, 2000
        A, st = fast_decay_matrix(m2, n2, RNGState(3), dtype=dtype,
                                  decay=7.0)
        xt = jax.random.normal(jax.random.key(9), (n2,), dtype=dtype)
        b = A @ xt
        scfg = SPLSConfig(pcg=PCGSaddleConfig(tol=1e-6, max_iters=60))
        (x, hist, iters, _), t_ls = timed(
            lambda a, bb, s: spls(a, bb, 0.0, scfg, s), A, b, RNGState(4),
            reps=1)
        # Attainable metrics: the problem has kappa ~ e^7*400 ~ 4e5, so in
        # f32 the normal-equations x-error is bounded below by
        # ~kappa^2*eps ~ O(1) regardless of solver quality; the honest
        # convergence metrics are the residual ones.
        r_vec = jnp.matmul(A, x, precision=hp) - b
        rel_resid = float(jnp.linalg.norm(r_vec) / jnp.linalg.norm(b))
        ne_resid = float(
            jnp.linalg.norm(jnp.matmul(A.T, r_vec, precision=hp))
            / (jnp.linalg.norm(A) ** 2 * jnp.linalg.norm(x)))
        x_err = float(jnp.linalg.norm(x - xt) / jnp.linalg.norm(xt))
        results["spls_100000x2000"] = {
            "seconds": t_ls, "iters": int(iters),
            "rel_residual": rel_resid,
            "normal_eq_resid": ne_resid,
            "x_rel_err_f32_kappa2eps_limited": x_err}
        log(f"[bench] SPLS: {t_ls:.3f}s, {int(iters)} iters, "
            f"rel resid {rel_resid:.2e}, NE resid {ne_resid:.2e} "
            f"(x-err {x_err:.2e}; f32 kappa^2*eps floor ~1e0 at "
            f"kappa~4e5 — residual is the attainable metric)")
        # the d x m sketch GEMM dominates (2dmn); + SVD gram (2dn^2) +
        # per-PCG-iter normal-equation applies (4mn each)
        d_sp = scfg.d_factor * n2
        attach_sol("spls_100000x2000",
                   2.0 * d_sp * m2 * n2 + 2.0 * d_sp * n2 ** 2
                   + int(iters) * 4.0 * m2 * n2,
                   (int(iters) + 2.0) * m2 * n2 * 4)
        # LSQR on the chip (comps/lsqr.py claims kappa*eps-attainable
        # x-accuracy vs PCG's kappa^2*eps; previously demonstrated only
        # in CPU/f64 tests — this records the f32 TPU story next to the
        # PCG point on the same problem)
        try:
            lcfg = SPLSConfig(solver="lsqr",
                              pcg=PCGSaddleConfig(tol=1e-6, max_iters=60))
            (xl, histl, itl, _), t_lq = timed(
                lambda a, bb, s: spls(a, bb, 0.0, lcfg, s), A, b,
                RNGState(4), reps=1)
            rl_vec = jnp.matmul(A, xl, precision=hp) - b
            ne_l = float(
                jnp.linalg.norm(jnp.matmul(A.T, rl_vec, precision=hp))
                / (jnp.linalg.norm(A) ** 2 * jnp.linalg.norm(xl)))
            xl_err = float(jnp.linalg.norm(xl - xt) / jnp.linalg.norm(xt))
            results["spls_100000x2000"]["lsqr"] = {
                "seconds": t_lq, "iters": int(itl),
                "normal_eq_resid": ne_l, "x_rel_err": xl_err}
            log(f"[bench] SPLS/lsqr: {t_lq:.3f}s, {int(itl)} iters, "
                f"NE resid {ne_l:.2e}, x-err {xl_err:.2e}")
        except Exception as e2:
            log(f"[bench] SPLS/lsqr skipped: {e2}")
        del A, b, x
    except Exception as e:  # pragma: no cover
        log(f"[bench] SPLS skipped: {e}")

    details["results"] = results
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_details.json"), "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()
