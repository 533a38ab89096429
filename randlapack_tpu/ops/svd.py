"""Economy SVD of small/skinny factors.

XLA's TPU SVD lowers to the polar/QDWH iteration, whose graph takes
minutes to compile on this backend (measured 236 s for a 512² svd, vs 11 s
for eigh). Every driver in this framework only ever takes the SVD of a
SMALL factor (QB's B, ABRIK's band, REVD2's B, sketch SVDs), so the default
implementation here is the Gram/eigh route:

    p ≤ q:  eigh(B Bᵀ) → U, σ²;  Vᵀ = diag(1/σ)·UᵀB
    p > q:  eigh(BᵀB) → V, σ²;  U  = B·V·diag(1/σ)

Accuracy model: σᵢ has relative error ~eps·(σ₁/σᵢ)² — singular values below
√eps·σ₁ are unreliable (they are zeroed along with their derived vectors).
For f64 correctness-critical paths use ``method="xla"`` (LAPACK on CPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION


def resolve_svd_method(method: str) -> str:
    """"auto" → "xla" on CPU (LAPACK: fast compile AND accurate),
    "gram_eigh" on TPU-like backends (where the polar-SVD graph takes
    minutes to compile)."""
    if method != "auto":
        return method
    return "xla" if jax.default_backend() == "cpu" else "gram_eigh"


@partial(jax.jit, static_argnames=("method", "precision"))
def svd_econ(B: jax.Array, method: str = "auto",
             precision=STABLE_PRECISION):
    """Economy SVD → (U, s, Vt) with s descending.

    ``method``: "auto" (backend-dependent), "gram_eigh" (fast TPU compile,
    √eps relative cutoff) or "xla" (native lowering — accurate, minutes to
    compile on TPU).
    """
    method = resolve_svd_method(method)
    if method == "xla":
        return jnp.linalg.svd(B, full_matrices=False)

    p, q = B.shape
    k = min(p, q)
    eps = jnp.finfo(B.dtype).eps
    if p <= q:
        G = jnp.matmul(B, B.T, precision=precision)
        lam, U = jnp.linalg.eigh(0.5 * (G + G.T))
        lam, U = lam[::-1], U[:, ::-1]
        s = jnp.sqrt(jnp.maximum(lam, 0.0))
        good = s > s[0] * jnp.sqrt(eps)
        s_safe = jnp.where(good, s, 1.0)
        Vt = jnp.matmul(U.T, B, precision=precision) / s_safe[:, None]
        Vt = jnp.where(good[:, None], Vt, 0.0)
        return U, s, Vt
    G = jnp.matmul(B.T, B, precision=precision)
    lam, V = jnp.linalg.eigh(0.5 * (G + G.T))
    lam, V = lam[::-1], V[:, ::-1]
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    good = s > s[0] * jnp.sqrt(eps)
    s_safe = jnp.where(good, s, 1.0)
    U = jnp.matmul(B, V, precision=precision) / s_safe[None, :]
    U = jnp.where(good[None, :], U, 0.0)
    return U, s, V.T
