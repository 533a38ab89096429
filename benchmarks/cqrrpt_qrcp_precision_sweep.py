"""Chip sweep: CQRRPT sketch-QRCP trailing precision × update_defer.

The sketch BQRRP's trailing-update GEMM output is never read by the
preconditioner (only the leading R rows are — drivers/cqrrpt.py), so
its precision should be a pure-speed knob here. Same-process min-of-N
on the headline config (srht + bqrrp-256 + q_form=inverse +
gram_block=512 + trsm_mode=blockinv).

Usage: python benchmarks/cqrrpt_qrcp_precision_sweep.py [m n reps]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import CQRRPTConfig, QRCPKind, cqrrpt
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.utils.timing import device_sync

hp = jax.lax.Precision.HIGHEST


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    A, st = fast_decay_matrix(m, n, RNGState(0), decay=9.0)

    grid = [("highest", 1), ("default", 1), ("default", 2), ("high", 1)]
    for tp, defer in grid:
        cfg = CQRRPTConfig(sketch="srht", qrcp=QRCPKind.bqrrp,
                           bqrrp_block=256, trsm_mode="blockinv",
                           bqrrp_trailing_precision=tp,
                           bqrrp_update_defer=defer)
        out = cqrrpt(A, cfg, st)       # warm compile
        device_sync(out[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = cqrrpt(A, cfg, st)
            device_sync(out[0])
            best = min(best, time.perf_counter() - t0)
        Q, R, J, rank, fail, _ = out
        res = float(
            jnp.linalg.norm(A[:, J] - jnp.matmul(Q, R, precision=hp))
            / jnp.linalg.norm(A))
        orth = float(jnp.linalg.norm(
            jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(n, dtype=Q.dtype)))
        print(f"qrcp_tp={tp:<8} defer={defer} {best:7.3f}s "
              f"{2*m*n*n/best/1e9:7.0f} GF/s "
              f"res {res:.2e} orth {orth:.2e} fail {bool(fail)}",
              flush=True)


if __name__ == "__main__":
    main()
