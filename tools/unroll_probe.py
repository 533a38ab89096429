"""Unrolled block-by-block probe of the worker-killing bqrrp case on TPU.

Mirrors drivers/bqrrp.py::_stage (r4 code: sanitized sketch, padded LU,
BCGS2, CholQR2 + lax.cond rescue) EAGERLY with a forced readback after
every op, so the last printed line before a worker crash localizes the
faulting kernel. Default shape = the tpu_verify_sweep regression case
(2048x2048 b=512 on fast_decay_matrix(RNGState(0)), full-width LU).

Usage: python tools/unroll_probe.py [m] [n] [b] [seed] [decay]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax
import jax.numpy as jnp

from randlapack_tpu import RNGState
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.drivers.bqrrp import (BQRRPConfig, _fix_pivots,
                                          _safe_triu_diag,
                                          _sanitize_sketch)
from randlapack_tpu.ops.cholqr import cholqr, preconditioned_cholqr, _pow2
from randlapack_tpu.ops.qr import qr_econ

hp = jax.lax.Precision.HIGHEST


def stats(name, x):
    x = jnp.asarray(x)
    fin = bool(jnp.all(jnp.isfinite(x)))
    mx = float(jnp.max(jnp.abs(x)))
    mn = float(jnp.min(jnp.abs(jnp.where(x == 0, jnp.inf, x))))
    print(f"    {name:14s} finite={fin} max|x|={mx:.3e} "
          f"min|nz|={mn:.3e}", flush=True)


def main():
    a = sys.argv[1:]
    m = int(a[0]) if len(a) > 0 else 2048
    n = int(a[1]) if len(a) > 1 else 2048
    b = int(a[2]) if len(a) > 2 else 512
    seed = int(a[3]) if len(a) > 3 else 0
    decay = float(a[4]) if len(a) > 4 else None
    dtype = jnp.float32
    kw = {} if decay is None else {"decay": decay}
    A, st = fast_decay_matrix(m, n, RNGState(seed), dtype=dtype, **kw)
    print(f"A ready {m}x{n} b={b}", flush=True)
    stats("A", A)

    cfg = BQRRPConfig(block_size=b)
    d = int(cfg.d_factor * b)
    K = min(m, n)
    nblocks = K // b
    key, st = st.spawn()
    import math
    Smat = jax.random.normal(key, (d, m), dtype=dtype) / math.sqrt(d)
    A_sk = jnp.matmul(Smat, A, precision=hp)
    stats("A_sk0", A_sk)

    A_work = A
    Qp = jnp.zeros((m, K), dtype)
    R = jnp.zeros((K, n), dtype)
    retired = jnp.zeros((n,), dtype)
    fail = jnp.asarray(False)

    for i in range(nblocks):
        print(f"block {i}:", flush=True)
        live = 1.0 - retired
        A_sk_m = A_sk * live[None, :]
        stats("A_sk_m", A_sk_m)
        # --- lu_pivot_columns, decomposed, operand printed pre-LU ------
        Yt = A_sk_m.T
        Yt = jnp.where(jnp.isfinite(Yt), Yt, 0.0)
        mx = jnp.max(jnp.abs(Yt))
        e = jnp.floor(jnp.log2(jnp.where(mx > 0, mx, 1.0))).astype(
            jnp.int32)
        delta = _pow2(e - 40, dtype)
        pad = delta * jax.nn.one_hot(jnp.arange(n) % d, d, dtype=dtype)
        lu_op = Yt + pad
        stats("lu_operand", lu_op)
        print(f"    calling lax.linalg.lu on {lu_op.shape} ...", flush=True)
        _, _, perm = jax.lax.linalg.lu(lu_op)
        perm = perm.astype(jnp.int32)
        stats("lu_perm", perm)
        chosen = perm[:b]
        chosen = _fix_pivots(chosen, retired)
        print(f"    chosen[:5]={[int(c) for c in chosen[:5]]}", flush=True)
        # --- panel ------------------------------------------------------
        A_sk_panel = jnp.take(A_sk, chosen, axis=1)
        panel = jnp.take(A_work, chosen, axis=1)
        proj = jnp.matmul(Qp.T, panel, precision=hp)
        panel = panel - jnp.matmul(Qp, proj, precision=hp)
        stats("panel", panel)
        R = R.at[:, chosen].add(proj)
        stats("R+proj", R)
        stats("A_sk_panel", A_sk_panel)
        print("    qr_econ(A_sk_panel) ...", flush=True)
        _, R_sk = qr_econ(A_sk_panel)
        R_sk = _safe_triu_diag(R_sk, dtype)
        stats("R_sk", R_sk)
        Q_panel, R11, failp = preconditioned_cholqr(panel, R_sk, hp)
        stats("Q_panel(pc)", Q_panel)
        Q_panel2, R2, f2 = cholqr(Q_panel, hp)
        R11b = jnp.matmul(R2, R11, precision=hp)
        failp = failp | f2
        print(f"    failp={bool(failp)}", flush=True)
        if bool(failp):
            print("    RESCUE qr_econ(panel) ...", flush=True)
            Q_panel, R11 = qr_econ(panel)
        else:
            Q_panel, R11 = Q_panel2, R11b
        stats("Q_panel", Q_panel)
        R11 = jnp.triu(R11)
        stats("R11", R11)
        # --- trailing update ---------------------------------------------
        T = jnp.matmul(Q_panel.T, A_work, precision=hp)
        T = T * live[None, :]
        T = T.at[:, chosen].set(R11)
        stats("T", T)
        A_work = A_work - jnp.matmul(Q_panel, T, precision=hp)
        stats("A_work", A_work)
        # --- sketch downdate ----------------------------------------------
        print("    triangular_solve downdate ...", flush=True)
        SQ = jax.lax.linalg.triangular_solve(
            _safe_triu_diag(R11, dtype), A_sk_panel,
            left_side=False, lower=False)
        stats("SQ", SQ)
        A_sk = A_sk - jnp.matmul(SQ, T, precision=hp)
        A_sk, fail = _sanitize_sketch(A_sk, fail, dtype)
        stats("A_sk", A_sk)
        Qp = jax.lax.dynamic_update_slice(Qp, Q_panel, (0, i * b))
        R = jax.lax.dynamic_update_slice(R, T, (i * b, 0))
        retired = retired.at[chosen].set(1.0)

    print("ALL BLOCKS DONE; final_orth ...", flush=True)
    G = jnp.matmul(Qp.T, Qp, precision=hp)
    stats("G", G)
    L = jax.lax.linalg.cholesky(G)
    stats("chol(G)", L)
    Qf = jax.lax.linalg.triangular_solve(L.T, Qp, left_side=False,
                                         lower=False)
    stats("Q_final", Qf)
    print(f"DONE fail={bool(fail)}", flush=True)


if __name__ == "__main__":
    main()
