"""Unrolled block-by-block probe of the failing bqrrp case on TPU:
2048x2048, b=512. Mirrors drivers/bqrrp.py::_stage block math outside
fori_loop, printing finiteness/extremes of every intermediate."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from randlapack_tpu import RNGState
from randlapack_tpu.gen import fast_decay_matrix
from randlapack_tpu.drivers import bqrrp as _m
from randlapack_tpu.drivers.bqrrp import (BQRRPConfig, _select_pivots,
                                          _fix_pivots, _safe_triu_diag)
from randlapack_tpu.ops.cholqr import cholqr, preconditioned_cholqr
from randlapack_tpu.ops.qr import qr_econ

hp = jax.lax.Precision.HIGHEST


def stats(name, x):
    x = jnp.asarray(x)
    fin = bool(jnp.all(jnp.isfinite(x)))
    mx = float(jnp.max(jnp.abs(x)))
    print(f"  {name:14s} finite={fin} max|x|={mx:.3e}", flush=True)


m, n = 2560, 2048
b = 512
cfg = BQRRPConfig(block_size=b)
dtype = jnp.float32
A, st = fast_decay_matrix(m, n, RNGState(3), dtype=dtype, decay=9.0)
print("A ready", flush=True)

# the driver's sketch: d = 1.25*b rows. Mirror how bqrrp builds it.
import inspect
src = inspect.getsource(_m.bqrrp)
# find the sketch construction in the driver source to mirror exactly
print("--- driver sketch construction snippet ---")
for line in src.splitlines():
    if "d_factor" in line or "normal(" in line or "sketch" in line.lower():
        print("   ", line.strip())
print("-------------------------------------------", flush=True)

d = int(cfg.d_factor * b)
key, st2 = st.spawn()
S = jax.random.normal(key, (d, m), dtype=dtype) / jnp.sqrt(
    jnp.asarray(d, dtype))
A_sk = jnp.matmul(S, A, precision=hp)
stats("A_sk0", A_sk)

A_work = A
Qp = jnp.zeros((m, n), dtype)
R = jnp.zeros((n, n), dtype)
retired = jnp.zeros((n,), dtype)

for i in range(4):
    print(f"block {i}:", flush=True)
    live = 1.0 - retired
    A_sk_m = A_sk * live[None, :]
    stats("A_sk_m", A_sk_m)
    chosen = _select_pivots(A_sk_m, b, retired, cfg, dtype, hp)
    chosen = _fix_pivots(chosen, retired)
    print(f"  chosen[:5]={[int(c) for c in chosen[:5]]}", flush=True)
    A_sk_panel = jnp.take(A_sk, chosen, axis=1)
    panel = jnp.take(A_work, chosen, axis=1)
    proj = jnp.matmul(Qp.T, panel, precision=hp)
    panel = panel - jnp.matmul(Qp, proj, precision=hp)
    stats("panel", panel)
    _, R_sk = qr_econ(A_sk_panel)
    R_sk = _safe_triu_diag(R_sk, dtype)
    stats("R_sk", R_sk)
    Q_panel, R11, failp = preconditioned_cholqr(panel, R_sk, hp)
    Q_panel2, R2, f2 = cholqr(Q_panel, hp)
    R11b = jnp.matmul(R2, R11, precision=hp)
    print(f"  failp={bool(failp)} f2={bool(f2)}", flush=True)
    if bool(failp | f2):
        Q_panel2, R11b = qr_econ(panel)
    Q_panel, R11 = Q_panel2, jnp.triu(R11b)
    stats("Q_panel", Q_panel)
    stats("R11", R11)
    T = jnp.matmul(Q_panel.T, A_work, precision=hp)
    T = T * live[None, :]
    T = T.at[:, chosen].set(R11)
    A_work = A_work - jnp.matmul(Q_panel, T, precision=hp)
    stats("A_work", A_work)
    SQ = jax.lax.linalg.triangular_solve(
        _safe_triu_diag(R11, dtype), A_sk_panel,
        left_side=False, lower=False)
    stats("SQ", SQ)
    A_sk = A_sk - jnp.matmul(SQ, T, precision=hp)
    stats("A_sk", A_sk)
    Qp = jax.lax.dynamic_update_slice(Qp, Q_panel, (0, i * b))
    retired = retired.at[chosen].set(1.0)

print("ALL BLOCKS DONE", flush=True)
