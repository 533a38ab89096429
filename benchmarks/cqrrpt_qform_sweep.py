"""Same-process CQRRPT q_form comparison on the headline shape
(VERDICT r4 item 3: the cholqr slot became the dominant phase — split it
and attack it). Times the full driver min-of-N for q_form in
{trsm, inverse}, then runs one timed pass each to get the sub-slot
phase table (cholqr_gram / cholqr_potrf / cholqr_qform / cholqr_unprec).

Usage: python benchmarks/cqrrpt_qform_sweep.py [m n reps]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import CQRRPTConfig, QRCPKind, cqrrpt
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.utils import device_sync

hp = jax.lax.Precision.HIGHEST


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    A, st = fast_decay_matrix(m, n, RNGState(0), decay=9.0)

    grid = [("trsm", 0), ("inverse", 0), ("inverse", 1024),
            ("inverse", 512), ("inverse", 256)]
    for qf, gb in grid:
        cfg = CQRRPTConfig(sketch="srht", qrcp=QRCPKind.bqrrp,
                           bqrrp_block=256, q_form=qf, gram_block=gb)
        out = cqrrpt(A, cfg, st)       # warm compile
        device_sync(out[0])
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            out = cqrrpt(A, cfg, RNGState(1 + i))
            device_sync(out[0])
            best = min(best, time.perf_counter() - t0)
        Q, R, J, rank, fail, _ = out
        res = float(jnp.linalg.norm(
            jnp.matmul(Q, R, precision=hp) - jnp.take(A, J, axis=1))
            / jnp.linalg.norm(A))
        orth = float(jnp.linalg.norm(
            jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(n, dtype=Q.dtype)))
        print(f"q_form={qf:<8} gram_block={gb:<5} {best:7.3f}s "
              f"{2*m*n*n/best/1e9:7.0f} GF/s "
              f"res {res:.2e} orth {orth:.2e} fail {bool(fail)}",
              flush=True)
        # phase table (timed mode syncs between phases — slower total,
        # informative split); only for the configs worth splitting
        if (qf, gb) in (("inverse", 0), ("inverse", 512)):
            cqrrpt(A, cfg, st, timing=True)  # warm split-phase compiles
            ph = cqrrpt(A, cfg, RNGState(9), timing=True)[-1]
            print("  phases: " + "  ".join(
                f"{k}={v:.4f}" for k, v in sorted(ph.items(),
                                                  key=lambda kv: -kv[1])),
                flush=True)


if __name__ == "__main__":
    main()
