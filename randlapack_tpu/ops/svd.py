"""Economy SVD of small/skinny factors.

XLA's TPU SVD lowers to the polar/QDWH iteration, whose graph takes
minutes to compile on this backend (measured 236 s for a 512² svd, vs 11 s
for eigh). Every driver in this framework only ever takes the SVD of a
SMALL factor (QB's B, ABRIK's band, REVD2's B, sketch SVDs), so the default
implementation here is the Gram/eigh route:

    p ≤ q:  eigh(B Bᵀ) → U, σ²;  Vᵀ = diag(1/σ)·UᵀB
    p > q:  eigh(BᵀB) → V, σ²;  U  = B·V·diag(1/σ)

Accuracy (MEASURED, docs/svd_envelope.md): the Rayleigh refinement
(σᵢ = ‖Bvᵢ‖, one already-needed GEMM) extends the λ-path's range, but
its floor is set by eigh's f32 subspace contamination, NOT by the naive
eps·σ₁/σᵢ model — on dense decaying spectra, values are ~1e-4-accurate
for σ ≥ 1e-2·σ₁ and ~1e-3-accurate down to σ ≈ 3e-3·σ₁, degrading to
O(10%) near the √eps·σ₁ cutoff; flat/clustered spectra are accurate
throughout; triplet residuals stay ≤ ~1e-3·σ₁ everywhere. Vectors for
σ < √eps·σ₁ are zeroed. Refined values are re-sorted descending (they can
swap order within their error band vs eigh's λ sort, and downstream S[:k]
truncations assume monotone s). For f64 correctness-critical paths use
``method="xla"`` (LAPACK on CPU).
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
        # Rayleigh refinement: σᵢ = ‖uᵢᵀB‖ has absolute error ~eps·σ₁
        # (relative eps·σ₁/σᵢ) instead of the λ-path's eps·σ₁²/σᵢ
        # (relative eps·(σ₁/σᵢ)²) — one already-needed GEMM, no extra cost
        W = jnp.matmul(U.T, B, precision=precision)
        s = jnp.linalg.norm(W, axis=1)
        # refined values can swap order within their error band vs eigh's
        # λ sort — re-sort so downstream S[:k] truncations stay valid
        ordr = jnp.argsort(-s, stable=True)
        s, U, W = s[ordr], U[:, ordr], W[ordr, :]
        good = s > s[0] * jnp.sqrt(eps)
        s_safe = jnp.where(good, s, 1.0)
        Vt = W / s_safe[:, None]
        Vt = jnp.where(good[:, None], Vt, 0.0)
        return U, s, Vt
    G = jnp.matmul(B.T, B, precision=precision)
    lam, V = jnp.linalg.eigh(0.5 * (G + G.T))
    lam, V = lam[::-1], V[:, ::-1]
    W = jnp.matmul(B, V, precision=precision)
    s = jnp.linalg.norm(W, axis=0)   # Rayleigh-refined σ (see above)
    ordr = jnp.argsort(-s, stable=True)     # see re-sort note above
    s, V, W = s[ordr], V[:, ordr], W[:, ordr]
    good = s > s[0] * jnp.sqrt(eps)
    s_safe = jnp.where(good, s, 1.0)
    U = W / s_safe[None, :]
    U = jnp.where(good[None, :], U, 0.0)
    return U, s, V.T
