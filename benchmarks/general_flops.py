"""Machine calibration — matmul/QR/SVD/Cholesky throughput on the current
device (reference: benchmark/bench_general/{GEMM,LAPACK}_flop_count.cc,
basic_blas_speed.cc).

Usage: python benchmarks/general_flops.py [n ...]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu.utils import device_sync


def timed(fn, *args, reps=3):
    device_sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
    dev = jax.devices()[0]
    print(f"device: {dev}")
    for n in sizes:
        A = jax.random.normal(jax.random.key(0), (n, n), jnp.float32)
        B = jax.random.normal(jax.random.key(1), (n, n), jnp.float32)
        for name, prec in [("bf16-ish (DEFAULT)", jax.lax.Precision.DEFAULT),
                           ("f32 (HIGHEST)", jax.lax.Precision.HIGHEST)]:
            f = jax.jit(lambda a, b, p=prec: jnp.matmul(a, b, precision=p))
            t = timed(f, A, B)
            print(f"n={n:6d} matmul {name:<18}: {t*1e3:8.2f} ms  "
                  f"{2*n**3/t/1e12:6.1f} TFLOP/s")
        for name, fn, flops in [
            ("cholesky", jax.jit(lambda a: jax.lax.linalg.cholesky(
                jnp.matmul(a, a.T, precision=jax.lax.Precision.HIGHEST)
                + n * jnp.eye(n, dtype=a.dtype))), n**3 / 3),
            ("qr", jax.jit(lambda a: jax.lax.linalg.qr(
                a, full_matrices=False)[0]), 4 * n**3 / 3),
            ("svd(vals)", jax.jit(lambda a: jnp.linalg.svd(
                a, compute_uv=False)), 4 * n**3),
        ]:
            if name == "svd(vals)" and "--svd" not in sys.argv:
                # XLA polar-SVD takes minutes to COMPILE on this backend
                continue
            t = timed(fn, A)
            print(f"n={n:6d} {name:<26}        : {t*1e3:8.2f} ms  "
                  f"{flops/t/1e9:8.1f} GFLOP/s-equiv")


if __name__ == "__main__":
    main()
