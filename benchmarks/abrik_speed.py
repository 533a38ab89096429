"""ABRIK vs RSVD speed/accuracy comparison (reference:
benchmark/bench_ABRIK/ABRIK_speed_comparisons[_sparse].cc — ABRIK vs RSVD
vs Spectra SVDS).

Usage: python benchmarks/abrik_speed.py [m n k] [--sparse density]
       python benchmarks/abrik_speed.py k --mtx path.mtx
The --mtx mode reads a Matrix Market file and runs ABRIK on its
SparseLinOp (the reference's ABRIK_speed_comparisons_sparse.cc:309-316
file-input mode).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.comps import QBConfig
from randlapack_tpu.drivers import (ABRIKConfig, RSVDConfig, abrik,
                                    rsvd_fixed_rank)
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.utils import device_sync


def main():
    if "--mtx" in sys.argv:
        # .mtx file-input mode (ABRIK_speed_comparisons_sparse.cc:309-316)
        path = sys.argv[sys.argv.index("--mtx") + 1]
        k = int(sys.argv[1]) if sys.argv[1].isdigit() else 64
        from randlapack_tpu.extras.io import mm_read
        import numpy as _np
        rows, cols, vals, shape = mm_read(path)
        m, n = shape
        Ad = jnp.zeros((m, n), jnp.float32).at[
            jnp.asarray(rows), jnp.asarray(cols)].add(
            jnp.asarray(vals, jnp.float32))
        from randlapack_tpu.linops import SparseLinOp
        A_op = SparseLinOp.from_dense(Ad)
        A = Ad
        st = RNGState(0)
        print(f"mtx mode: {path} ({m}x{n}, nnz {len(vals)})")
        run(m, n, k, A, A_op, st)
        return
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    if "--sparse" in sys.argv:
        dens = float(sys.argv[sys.argv.index("--sparse") + 1])
        from randlapack_tpu.gen import gen_exp_singvals, gen_sparse_from_singvals
        import jax.numpy as _j
        sv = gen_exp_singvals(min(m, n), 1e6, _j.float32)
        Ad, st = gen_sparse_from_singvals(m, n, sv, dens, RNGState(0))
        from randlapack_tpu.linops import SparseLinOp
        A_op = SparseLinOp.from_dense(Ad)
        A = Ad  # dense copy for the reference spectrum below
        print(f"sparse mode: density {dens}")
    else:
        A, st = fast_decay_matrix(m, n, RNGState(0), decay=12.0)
        A_op = A
    run(m, n, k, A, A_op, st)


def run(m, n, k, A, A_op, st):
    hp = jax.lax.Precision.HIGHEST
    from randlapack_tpu.ops.svd import svd_econ
    s_ref = svd_econ(A)[1][:k]

    acfg = ABRIKConfig(block_size=k, max_iters=4)
    out = abrik(A_op, k, acfg, st)
    device_sync(out[1])
    t0 = time.perf_counter()
    U, S, Vt, info, _ = abrik(A_op, k, acfg, RNGState(1))
    device_sync(S)
    t_ab = time.perf_counter() - t0
    err_ab = float(jnp.max(jnp.abs(S - s_ref) / s_ref))

    rcfg = RSVDConfig(QBConfig(block_size=k))
    out = rsvd_fixed_rank(A, k, rcfg, st)
    device_sync(out[1])
    t0 = time.perf_counter()
    U2, S2, Vt2, errq, _ = rsvd_fixed_rank(A, k, rcfg, RNGState(2))
    device_sync(S2)
    t_rs = time.perf_counter() - t0
    err_rs = float(jnp.max(jnp.abs(S2[:k] - s_ref) / s_ref))

    print(f"{m}x{n} k={k}")
    print(f"  ABRIK: {t_ab:7.3f}s  max sigma rel err {err_ab:.2e}")
    print(f"  RSVD : {t_rs:7.3f}s  max sigma rel err {err_rs:.2e}")


if __name__ == "__main__":
    main()
