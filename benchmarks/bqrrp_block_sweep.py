"""Same-process BQRRP factored-form block sweep at 8192^2 f32.

Round-2 closed the b>512 road on QUALITY grounds (Gram-Cholesky R_sk
squares the panel condition number: residual 1.8e-3 at b=1024). Round-3's
``sketch_r="qr"`` route (Householder qr_econ of the (d,b) sketch — no
squaring) reopens it; this sweep decides the headline config with the
only measurement methodology that is trustworthy on the tunneled backend:
same-process min-of-N comparisons (cross-process drift is +-20%).

Usage: python benchmarks/bqrrp_block_sweep.py [n] [reps]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import BQRRPConfig, bqrrp_factored, bqrrp_q
from randlapack_tpu.gen import fast_decay_matrix


def _sync(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                        jnp.floating)]
    return float(jnp.sum(leaves[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    hp = jax.lax.Precision.HIGHEST
    A, st = fast_decay_matrix(n, n, RNGState(0), dtype=jnp.float32)
    nrmA = float(jnp.linalg.norm(A))
    eye = jnp.eye(n, dtype=jnp.float32)

    if len(sys.argv) > 3 and sys.argv[3] == "small":
        # r5: the DOWNWARD direction (b<512) was never measured at the
        # headline config; small blocks shed O(n*m*b) panel+downdate
        # flops but add iterations — defer merges the trailing GEMMs
        sweep = [
            ("b512/s2/d2 (r5 headline)", BQRRPConfig(
                block_size=512, pivot_candidates=4, stages=2,
                update_defer=2)),
            ("b256/s2/d2", BQRRPConfig(
                block_size=256, pivot_candidates=4, stages=2,
                update_defer=2)),
            ("b256/s2/d4", BQRRPConfig(
                block_size=256, pivot_candidates=4, stages=2,
                update_defer=4)),
            ("b128/s2/d4", BQRRPConfig(
                block_size=128, pivot_candidates=4, stages=2,
                update_defer=4)),
        ]
    else:
        sweep = [
            ("b512/s2/d1 (r2 headline)", BQRRPConfig(
                block_size=512, pivot_candidates=4, stages=2)),
            ("b512/s2/d2", BQRRPConfig(
                block_size=512, pivot_candidates=4, stages=2,
                update_defer=2)),
            ("b1024/s2", BQRRPConfig(
                block_size=1024, pivot_candidates=4, stages=2)),
            ("b1024/s2/d2", BQRRPConfig(
                block_size=1024, pivot_candidates=4, stages=2,
                update_defer=2)),
            ("b2048/s2", BQRRPConfig(
                block_size=2048, pivot_candidates=4, stages=2)),
        ]
    flops = 4.0 / 3.0 * n ** 3
    for name, cfg in sweep:
        try:
            t0 = time.perf_counter()
            fac, _ = bqrrp_factored(A, cfg, st)
            _sync(fac.R)
            t_compile = time.perf_counter() - t0
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fac, _ = bqrrp_factored(A, cfg, st)
                _sync(fac.R)
                best = min(best, time.perf_counter() - t0)
            Q = bqrrp_q(fac)
            res = float(jnp.linalg.norm(
                jnp.matmul(Q, fac.R, precision=hp)
                - jnp.take(A, fac.J, axis=1)) / nrmA)
            orth = float(jnp.linalg.norm(
                jnp.matmul(Q.T, Q, precision=hp) - eye))
            print(f"{name:28s}: {best:7.4f}s  {flops/best/1e9:6.0f} GF/s  "
                  f"res {res:.2e}  orth {orth:.2e}  fail={bool(fac.fail)}  "
                  f"(compile {t_compile:.0f}s)", flush=True)
            del Q, fac
        except Exception as e:  # keep sweeping past a bad config
            print(f"{name:28s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
