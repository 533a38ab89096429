"""Same-process CQRRPT config sweep at the BASELINE shape 131072x2048.

The warm phase breakdown (BENCH_details, round 3) puts the sketch QRCP
(explicit BQRRP on the 2560x2048 sketch) at 0.131 s of the 0.213 s wall
— the biggest slice. This sweeps the sketch-BQRRP knobs that won the
8192^2 headline (stages / pivot_candidates / block size) through the
full driver, same-process min-of-N.

Usage: python benchmarks/cqrrpt_config_sweep.py [reps]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import CQRRPTConfig, QRCPKind, cqrrpt
from randlapack_tpu.gen import fast_decay_matrix


def _sync(x):
    return float(jnp.sum(x))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    hp = jax.lax.Precision.HIGHEST
    m, n = 131072, 2048
    A, st = fast_decay_matrix(m, n, RNGState(2), dtype=jnp.float32,
                              decay=9.0)
    nrmA = float(jnp.linalg.norm(A))
    flops = 2.0 * m * n ** 2

    base = dict(sketch="srht", qrcp=QRCPKind.bqrrp)
    sweep = [
        ("b256 (bench default)", CQRRPTConfig(**base, bqrrp_block=256)),
        ("b256/d2", CQRRPTConfig(**base, bqrrp_block=256,
                                 bqrrp_update_defer=2)),
        ("b256/d4", CQRRPTConfig(**base, bqrrp_block=256,
                                 bqrrp_update_defer=4)),
        ("b128/d4", CQRRPTConfig(**base, bqrrp_block=128,
                                 bqrrp_update_defer=4)),
        ("b256/s2/pc4", CQRRPTConfig(**base, bqrrp_block=256,
                                     bqrrp_stages=2,
                                     bqrrp_pivot_candidates=4)),
        ("b512/s2/pc4", CQRRPTConfig(**base, bqrrp_block=512,
                                     bqrrp_stages=2,
                                     bqrrp_pivot_candidates=4)),
        ("b512", CQRRPTConfig(**base, bqrrp_block=512)),
    ]
    for name, cfg in sweep:
        try:
            t0 = time.perf_counter()
            Q, R, J, rank, fail, _ = cqrrpt(A, cfg, st)
            _sync(R)
            t_c = time.perf_counter() - t0
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                Q, R, J, rank, fail, _ = cqrrpt(A, cfg, st)
                _sync(R)
                best = min(best, time.perf_counter() - t0)
            res = float(jnp.linalg.norm(
                jnp.matmul(Q, R, precision=hp) - jnp.take(A, J, axis=1))
                / nrmA)
            orth = float(jnp.linalg.norm(
                jnp.matmul(Q.T, Q, precision=hp)
                - jnp.eye(n, dtype=jnp.float32)))
            print(f"{name:22s}: {best:7.4f}s  {flops/best/1e9:6.0f} GF/s"
                  f"  res {res:.2e}  orth {orth:.2e}  fail={bool(fail)}"
                  f"  (compile {t_c:.0f}s)", flush=True)
            del Q, R
        except Exception as e:
            print(f"{name:22s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
