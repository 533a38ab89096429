"""Chip sweep: CQRRPT a_mod_trsm implementation — XLA triangular_solve
vs partitioned-inverse blocked trsm (ops/trsm.py).

Same-process min-of-N at the headline shape. Usage:
    python benchmarks/cqrrpt_trsm_sweep.py [m] [n] [reps]
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

    grid = [("xla", 0), ("blockinv", 256), ("blockinv", 512),
            ("blockinv", 128)]
    for mode, tb in grid:
        cfg = CQRRPTConfig(sketch="srht", qrcp=QRCPKind.bqrrp,
                           bqrrp_block=256, trsm_mode=mode,
                           trsm_block=tb or 256)
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
        print(f"trsm={mode:<9} block={tb:<4} {best:7.3f}s "
              f"{2*m*n*n/best/1e9:7.0f} GF/s "
              f"res {res:.2e} orth {orth:.2e} fail {bool(fail)}",
              flush=True)


if __name__ == "__main__":
    main()
