"""CQRRPT speed / error / pivot-quality benchmarks (reference:
benchmark/bench_CQRRPT/CQRRPT_{speed_comparisons,runtime_breakdown,
error_analysis,pivot_quality}.cc).

Usage: python benchmarks/cqrrpt_speed.py [m n]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import CQRRPTConfig, QRCPKind, cqrrpt, cqrrt, CQRRTConfig
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.utils import device_sync


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    A, st = fast_decay_matrix(m, n, RNGState(0), decay=2.0)
    hp = jax.lax.Precision.HIGHEST

    for label, cfg in [
        ("saso+bqrrp", CQRRPTConfig(sketch="saso", qrcp=QRCPKind.bqrrp,
                                    bqrrp_block=256)),
        ("srht+bqrrp", CQRRPTConfig(sketch="srht", qrcp=QRCPKind.bqrrp,
                                    bqrrp_block=256)),
    ]:
        out = cqrrpt(A, cfg, st)
        device_sync(out[0])
        t0 = time.perf_counter()
        out = cqrrpt(A, cfg, RNGState(1))
        device_sync(out[0])
        t = time.perf_counter() - t0
        Q, R, J, rank, fail, _ = out
        res = float(jnp.linalg.norm(
            jnp.matmul(Q, R, precision=hp) - jnp.take(A, J, axis=1))
            / jnp.linalg.norm(A))
        orth = float(jnp.linalg.norm(
            jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(n, dtype=Q.dtype)))
        print(f"CQRRPT[{label}] {m}x{n}: {t:7.3f}s "
              f"{2*m*n*n/t/1e9:7.0f} GFLOP/s res {res:.2e} orth {orth:.2e} "
              f"rank {int(rank)} fail {bool(fail)}")

    # unpivoted CQRRT comparison
    out = cqrrt(A, CQRRTConfig(), st)
    device_sync(out[0])
    t0 = time.perf_counter()
    out = cqrrt(A, CQRRTConfig(), RNGState(2))
    device_sync(out[0])
    t = time.perf_counter() - t0
    print(f"CQRRT  (unpivoted)  {m}x{n}: {t:7.3f}s "
          f"{2*m*n*n/t/1e9:7.0f} GFLOP/s fail {bool(out[2])}")


if __name__ == "__main__":
    main()
