"""CholQR-family-over-linops speed + memory benchmarks (reference:
benchmark/bench_CQRRT_linops/*.cc — speed + peak memory with analytical
models).

Usage: python benchmarks/cholqr_linops_speed.py [m n gram_block]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.drivers import (CholQRLinopsConfig, CQRRTLinopsConfig,
                                    cholqr_linops, cqrrt_linops,
                                    scholqr3_linops)
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.linops import DenseLinOp
from randlapack_tpu.utils import (analytical_peak_bytes,
                                  device_memory_stats, device_sync)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    gb = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    A, st = fast_decay_matrix(m, n, RNGState(0), decay=1.0)
    op = DenseLinOp(A)
    gram_flops = 2.0 * m * n * n

    for tag, fn in [
        ("cholqr_linops p=1",
         lambda: cholqr_linops(op, CholQRLinopsConfig(gram_block=gb))),
        ("cholqr_linops p=2",
         lambda: cholqr_linops(op, CholQRLinopsConfig(gram_block=gb,
                                                      passes=2))),
        ("scholqr3_linops",
         lambda: scholqr3_linops(op, CholQRLinopsConfig(gram_block=gb))),
        ("cqrrt_linops",
         lambda: cqrrt_linops(op, CQRRTLinopsConfig(gram_block=gb),
                              RNGState(1))),
    ]:
        out = fn()
        device_sync(out[0])
        t0 = time.perf_counter()
        out = fn()
        device_sync(out[0])
        t = time.perf_counter() - t0
        print(f"{tag:<22} {m}x{n} gb={gb}: {t*1e3:8.1f} ms "
              f"({gram_flops/t/1e9:6.0f} GF/s per Gram pass)")

    model = analytical_peak_bytes("cholqr_linops", m, n, gb)
    stats = device_memory_stats()
    peak = stats.get("peak_bytes_in_use")
    print(f"analytical peak (cholqr_linops): {model/1e6:.0f} MB"
          + (f"; device peak_bytes_in_use: {peak/1e6:.0f} MB"
             if peak else ""))


if __name__ == "__main__":
    main()
