"""Refinement sweep around the r5 small-block find (b=256, defer=4
= 0.148 s at 8192^2 — beat the b=512/d2 0.168 s headline by 13% at
identical reference-grade quality). Same-process min-of-N; decides the
new headline config and re-tests the trailing_precision speed modes at
the new block size (at b=512 `high` made defer stop paying — the
composition may differ at b=256 where panel work is a smaller slice).

Usage: python benchmarks/bqrrp_small_block_refine.py [n] [reps]
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

    base = dict(block_size=256, pivot_candidates=4, stages=2,
                update_defer=4)
    sweep = [
        ("b256/d4 (find)", BQRRPConfig(**base)),
        ("b256/d8", BQRRPConfig(**{**base, "update_defer": 8}),),
        ("b256/d4/pc2", BQRRPConfig(**{**base, "pivot_candidates": 2})),
        ("b256/d4 high", BQRRPConfig(**{**base,
                                        "trailing_precision": "high"})),
        ("b256/d8 high", BQRRPConfig(**{**base, "update_defer": 8,
                                        "trailing_precision": "high"})),
        ("b256/d4 default", BQRRPConfig(
            **{**base, "trailing_precision": "default"})),
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
            print(f"{name:18s}: {best:7.4f}s  {flops/best/1e9:6.0f} GF/s  "
                  f"res {res:.2e}  orth {orth:.2e}  fail={bool(fac.fail)}  "
                  f"(compile {t_compile:.0f}s)", flush=True)
            del Q, fac
        except Exception as e:  # keep sweeping past a bad config
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
