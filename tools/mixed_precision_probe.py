"""Mixed-precision trailing-update quality study (VERDICT r3 item 3b).

Question: can the factored BQRRP's trailing GEMMs (W = Vᵀ·A and the
group-end A −= V·Z — the FLOP bulk, ~2/3 of runtime) run at the TPU's
DEFAULT f32 matmul precision (bf16_3x, 30.5 TF/s vs 17.2 HIGHEST) while
panels / R / sketch math stay at HIGHEST — without losing pivot quality
or residual?

Method (CPU): "default" precision on CPU is exact f32, so the TPU error
model is emulated explicitly (ops/pallas_wy.py::bf16_3x_matmul — the
hi/lo bf16 split with the three dominant cross products). For each decay
spectrum, run bqrrp_factored with trailing_precision ∈ {highest,
bf16_3x_emul}, materialize Q, and compare pivot agreement, residual, and
orthogonality.

Usage: python tools/mixed_precision_probe.py [n] [b] [defer]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from randlapack_tpu import RNGState
from randlapack_tpu.drivers.bqrrp import (BQRRPConfig, bqrrp_factored,
                                          bqrrp_q)
from randlapack_tpu.gen import MatGenInfo, MatType, fast_decay_matrix, mat_gen
from randlapack_tpu.ops import util

hp = jax.lax.Precision.HIGHEST


def run(A, cfg, seed):
    t0 = time.perf_counter()
    fac, _ = bqrrp_factored(A, cfg, RNGState(seed))
    Q = bqrrp_q(fac)
    k = min(A.shape)
    AJ = jnp.take(A, fac.J, axis=1)
    res = float(jnp.linalg.norm(
        jnp.matmul(Q, fac.R[:k], precision=hp) - AJ) / jnp.linalg.norm(A))
    orth = float(util.orthogonality_check(Q))
    # R-diagonal decay profile (pivot quality proxy)
    rdiag = np.abs(np.asarray(jnp.diag(fac.R)))
    return fac.J, res, orth, rdiag, time.perf_counter() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    defer = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    cases = [
        ("gauss", mat_gen(MatGenInfo(n, n, MatType.gaussian),
                          RNGState(0), dtype=jnp.float32)[0]),
        ("exp_1e6", mat_gen(MatGenInfo(n, n, MatType.exponential,
                                       cond_num=1e6), RNGState(1),
                            dtype=jnp.float32)[0]),
        ("fastdecay9", fast_decay_matrix(n, n, RNGState(2),
                                         dtype=jnp.float32, decay=9.0)[0]),
        ("poly_1e8", mat_gen(MatGenInfo(n, n, MatType.polynomial,
                                        cond_num=1e8), RNGState(3),
                             dtype=jnp.float32)[0]),
    ]

    print(f"# n={n} b={b} defer={defer}")
    print(f"{'case':<12} {'mode':<14} {'res':>10} {'orth':>10} "
          f"{'J-agree':>8} {'rdiag-rel':>10} {'t(s)':>7}")
    for name, A in cases:
        base = None
        for mode in ("highest", "bf16_3x_emul"):
            cfg = BQRRPConfig(block_size=b, update_defer=defer,
                              trailing_precision=mode)
            J, res, orth, rdiag, dt = run(A, cfg, 42)
            if base is None:
                base = (J, rdiag)
                agree, rrel = 1.0, 0.0
            else:
                agree = float(np.mean(np.asarray(J) == np.asarray(base[0])))
                rrel = float(np.max(np.abs(rdiag - base[1])
                                    / np.maximum(base[1][0], 1e-30)))
            print(f"{name:<12} {mode:<14} {res:10.2e} {orth:10.2e} "
                  f"{agree:8.3f} {rrel:10.2e} {dt:7.2f}")


if __name__ == "__main__":
    main()
