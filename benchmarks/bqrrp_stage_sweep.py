"""Stage-count sweep at the r5 b=256 headline config (s2/d4/pc2 =
0.148 s reference-grade at 8192²). ``stages`` partitions the 32 blocks
into statically-shrinking column groups (the trailing width a later
stage updates is smaller); s∈{1,2} were measured, s=4 (32 % (4·256) = 0)
never was. Also re-checks s4 under the speed modes.

Usage: python benchmarks/bqrrp_stage_sweep.py [n] [reps]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import BQRRPConfig, bqrrp_factored, bqrrp_q
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.utils import device_sync


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    hp = jax.lax.Precision.HIGHEST
    A, st = fast_decay_matrix(n, n, RNGState(0), dtype=jnp.float32)
    nrmA = float(jnp.linalg.norm(A))
    eye = jnp.eye(n, dtype=jnp.float32)

    base = dict(block_size=256, pivot_candidates=2, update_defer=4)
    sweep = [
        ("s2 (headline)", BQRRPConfig(**base, stages=2)),
        ("s1", BQRRPConfig(**base, stages=1)),
        ("s4", BQRRPConfig(**base, stages=4)),
        ("s4 high", BQRRPConfig(**base, stages=4,
                                trailing_precision="high")),
        ("s2 high", BQRRPConfig(**base, stages=2,
                                trailing_precision="high")),
    ]
    flops = 4.0 / 3.0 * n ** 3
    for name, cfg in sweep:
        try:
            t0 = time.perf_counter()
            fac, _ = bqrrp_factored(A, cfg, st)
            device_sync(fac.R)
            t_compile = time.perf_counter() - t0
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fac, _ = bqrrp_factored(A, cfg, st)
                device_sync(fac.R)
                best = min(best, time.perf_counter() - t0)
            Q = bqrrp_q(fac)
            res = float(jnp.linalg.norm(
                jnp.matmul(Q, fac.R, precision=hp)
                - jnp.take(A, fac.J, axis=1)) / nrmA)
            orth = float(jnp.linalg.norm(
                jnp.matmul(Q.T, Q, precision=hp) - eye))
            print(f"{name:15s}: {best:7.4f}s  {flops/best/1e9:6.0f} GF/s  "
                  f"res {res:.2e}  orth {orth:.2e}  fail={bool(fac.fail)}  "
                  f"(compile {t_compile:.0f}s)", flush=True)
            del Q, fac
        except Exception as e:  # keep sweeping past a bad config
            print(f"{name:15s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
