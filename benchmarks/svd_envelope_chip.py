"""On-chip spot-check of the SVD accuracy envelope (CLAUDE.md chip-up
checklist item 5): rerun two rows of tools/svd_envelope_sweep.py's table
on the REAL TPU in f32 — both svd_econ routes — against host f64 truth,
and compare to the CPU-measured envelope recorded in
docs/svd_envelope.md. The question is whether the chip's eigh/Jacobi
(different matmul units, HIGHEST-precision passes) degrades the
trust-region story the docs pin; the tool's CPU rows are the reference.

Usage: python benchmarks/svd_envelope_chip.py   (runs on default backend)
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from randlapack_tpu.ops.svd import svd_econ

hp = jax.lax.Precision.HIGHEST


def make_factor(p, q, law, kappa, seed):
    rng = np.random.default_rng(seed)
    k = min(p, q)
    if law == "exp":
        s = np.logspace(0, -np.log10(kappa), k)
    else:  # step: flat head, cliff, flat tail
        s = np.ones(k)
        s[k // 2:] = 1.0 / kappa
    U, _ = np.linalg.qr(rng.standard_normal((p, k)))
    V, _ = np.linalg.qr(rng.standard_normal((q, k)))
    return (U * s) @ V.T, s


def row(p, q, law, kappa, method):
    B64, s_true = make_factor(p, q, law, kappa, seed=p + q)
    B = jnp.asarray(B64, jnp.float32)
    U, s, Vt = svd_econ(B, method=method, precision=hp)
    U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
    k = s_true.shape[0]
    s, U, Vt = s[:k], U[:, :k], Vt[:k]
    rel = np.abs(s - s_true) / s_true
    Bf = np.asarray(B, np.float64)
    r1 = np.linalg.norm(Bf @ Vt.T - U * s, axis=0)
    r2 = np.linalg.norm(Bf.T @ U - Vt.T * s, axis=0)
    res = np.maximum(r1, r2) / s_true[0]
    ratio = s_true / s_true[0]
    # deepest sigma/sigma1 with every shallower value within 1e-3
    bad = np.where(rel > 1e-3)[0]
    deep = ratio[-1] if len(bad) == 0 else (
        ratio[bad[0] - 1] if bad[0] > 0 else float("nan"))
    trust = ratio > 1e-3
    res_trust = float(np.max(res[trust])) if trust.any() else float("nan")
    print(f"{p}x{q} {law}:{kappa:.0e} {method:>9s}: ok@1e-3 to "
          f"sigma/sigma1 {deep:.1e}; max-res {np.max(res):.1e}; "
          f"res@sigma/sigma1>1e-3 {res_trust:.1e}", flush=True)


def main():
    print(f"# devices: {jax.devices()}")
    for method in ("gram_eigh", "jacobi"):
        row(128, 1024, "exp", 1e6, method)
        row(256, 256, "step", 1e5, method)


if __name__ == "__main__":
    main()
