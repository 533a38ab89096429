"""Same-process sweep of the factored-BQRRP mixed-precision and defer
knobs on the headline shape (VERDICT r3 item 3: the two untried MFU
levers). Run ON THE CHIP — cross-process timings drift ±20%, so every
config is timed min-of-N inside one process against the same baseline.

Quality gates ride along: each config reports residual/orth of the
materialized Q so a speed win that costs accuracy is visible in the same
table. CPU emulation (tools/mixed_precision_probe.py) already pinned the
quality story at small n (res 7.5e-7 -> ~5.5e-6, orth unchanged, R-diag
profile tie-level); this script answers the SPEED half (default
precision = bf16_3x, 30.5 vs 17.2 TF/s measured GEMM peak).

Usage: python benchmarks/trailing_precision_sweep.py [n] [reps]
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

hp = jax.lax.Precision.HIGHEST


def run_cfg(A, cfg, reps):
    fac, _ = bqrrp_factored(A, cfg, RNGState(1))
    device_sync(fac.R)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        fac, _ = bqrrp_factored(A, cfg, RNGState(2 + i))
        device_sync(fac.R)
        best = min(best, time.perf_counter() - t0)
    Q = bqrrp_q(fac)
    n = A.shape[0]
    res = float(jnp.linalg.norm(
        jnp.matmul(Q, fac.R, precision=hp) - jnp.take(A, fac.J, axis=1))
        / jnp.linalg.norm(A))
    orth = float(jnp.linalg.norm(
        jnp.matmul(Q.T, Q, precision=hp) - jnp.eye(n, dtype=A.dtype)))
    return best, res, orth, bool(fac.fail), fac.J


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    A, _ = fast_decay_matrix(n, n, RNGState(0), dtype=jnp.float32)
    qr_flops = 4.0 / 3.0 * n ** 3

    grid = []
    for tp in ("highest", "high", "default"):
        for defer in (1, 2, 4):
            grid.append((tp, defer))

    print(f"# trailing_precision x update_defer, n={n}, b=512, stages=2, "
          f"pivot_candidates=4, min-of-{reps}")
    print(f"{'trailing':<10} {'defer':>5} {'t(s)':>8} {'TF/s':>7} "
          f"{'res':>10} {'orth':>10} {'fail':>5} {'Jagree':>7}")
    J_ref = None
    for tp, defer in grid:
        cfg = BQRRPConfig(block_size=512, pivot_candidates=4, stages=2,
                          trailing_precision=tp, update_defer=defer)
        t, res, orth, fail, J = run_cfg(A, cfg, reps)
        if J_ref is None:
            J_ref = J
        agree = float(jnp.mean((J == J_ref).astype(jnp.float32)))
        print(f"{tp:<10} {defer:>5} {t:>8.3f} {qr_flops/t/1e12:>7.2f} "
              f"{res:>10.2e} {orth:>10.2e} {str(fail):>5} {agree:>7.3f}",
              flush=True)


if __name__ == "__main__":
    main()
