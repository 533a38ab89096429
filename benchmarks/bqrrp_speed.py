"""BQRRP speed / breakdown / quality benchmarks (reference:
benchmark/bench_BQRRP/BQRRP_speed_comparisons_{mat_size,block_size}.cc,
BQRRP_runtime_breakdown.cc, BQRRP_error_analysis.cc,
BQRRP_pivot_quality.cc).

Usage:
    python benchmarks/bqrrp_speed.py sizes  [n ...]
    python benchmarks/bqrrp_speed.py blocks [n]
    python benchmarks/bqrrp_speed.py quality [n]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import BQRRPConfig, bqrrp
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.utils import device_sync


def run_one(n, b, reps=2, reorth=True):
    A, st = fast_decay_matrix(n, n, RNGState(0))
    cfg = BQRRPConfig(block_size=b, block_reorth=reorth)
    out = bqrrp(A, cfg, st)
    device_sync(out[0])
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = bqrrp(A, cfg, RNGState(i))
        device_sync(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, out, A


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sizes"
    if mode == "sizes":
        sizes = [int(a) for a in sys.argv[2:]] or [2048, 4096, 8192]
        for n in sizes:
            b = max(256, n // 16)
            t, _, _ = run_one(n, b)
            print(f"n={n:6d} b={b:4d}: {t:8.3f}s  "
                  f"{4/3*n**3/t/1e9:8.0f} GFLOP/s")
    elif mode == "blocks":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
        for b in [128, 256, 512, 1024]:
            if n % b:
                continue
            for reorth in (True, False):
                t, _, _ = run_one(n, b, reorth=reorth)
                print(f"n={n} b={b:5d} reorth={reorth}: {t:8.3f}s  "
                      f"{4/3*n**3/t/1e9:8.0f} GFLOP/s")
    elif mode == "breakdown":
        # per-phase runtime breakdown (reference BQRRP_runtime_breakdown.cc):
        # measured by differencing ablated configs — under jit the fused
        # phases can't be timed individually from the host.
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
        base_kw = dict(block_size=512, stages=4, pivot_candidates=2)

        def t_of(**kw):
            cfg = BQRRPConfig(**{**base_kw, **kw})
            A, st = fast_decay_matrix(n, n, RNGState(0))
            out = bqrrp(A, cfg, st)
            device_sync(out[0])
            ts = []
            for i in range(2):
                t0 = time.perf_counter()
                out = bqrrp(A, cfg, RNGState(i))
                device_sync(out[0])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        full = t_of()
        no_final = t_of(final_orth=0)
        no_reorth = t_of(final_orth=0, block_reorth=False)
        no_panel2 = t_of(final_orth=0, block_reorth=False,
                         panel_reorth=False)
        print(f"n={n} total                {full:8.3f}s")
        print(f"  final-orth pass         {full-no_final:8.3f}s")
        print(f"  BCGS2 block reorth      {no_final-no_reorth:8.3f}s")
        print(f"  panel 2nd CholQR pass   {no_reorth-no_panel2:8.3f}s")
        print(f"  core (pivots+panels+trailing+sketch) {no_panel2:8.3f}s")
    elif mode == "quality":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
        hp = jax.lax.Precision.HIGHEST
        t, out, A = run_one(n, 256)
        Q, R, J, rank, fail, _ = out
        res = float(jnp.linalg.norm(jnp.matmul(Q, R, precision=hp)
                                    - jnp.take(A, J, axis=1))
                    / jnp.linalg.norm(A))
        orth = float(jnp.linalg.norm(jnp.matmul(Q.T, Q, precision=hp)
                                     - jnp.eye(n, dtype=Q.dtype)))
        d = jnp.abs(jnp.diag(R))
        from randlapack_tpu.ops.svd import svd_econ
        s = svd_econ(A)[1]
        print(f"n={n}: residual {res:.3e}  orth {orth:.3e}  fail {bool(fail)}")
        print(f"pivot quality |R_ii|/sigma_i at i=0,n/4,n/2,3n/4:")
        for i in (0, n // 4, n // 2, 3 * n // 4):
            print(f"  i={i:5d}: {float(d[i]/s[i]):8.3f}")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
