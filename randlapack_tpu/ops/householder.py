"""Householder-format compatibility — the ``orhr_col``/GEQP3-output
capability (reference: lapack::orhr_col used in rl_bqrrp.hh:453-510 and the
reference impl rl_util.hh:339).

The TPU framework's primary output is explicit Q (SURVEY.md §7
recommendation); this adapter reconstructs the LAPACK implicit form
(packed reflectors + taus, plus the diagonal sign matrix) for drop-in
compatibility with GEQP3/GEQRF consumers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION


def householder_reconstruct(Q: jax.Array, precision=STABLE_PRECISION):
    """Given orthonormal Q (m, k), return ``(packed, taus, signs)`` such
    that applying the k reflectors (LAPACK convention, v[i]=1 implicit on
    the diagonal of ``packed``'s strict lower part) to I reproduces
    Q·diag(signs).

    Because Q is orthonormal, Householder QR of Q yields R = diag(±1)
    exactly — the reflectors ARE the implicit representation.
    """
    return _reconstruct(Q, precision)


def _reconstruct(Q, precision):
    from .qr import _larfg
    m, k = Q.shape
    dtype = Q.dtype

    def step(i, carry):
        W, V, taus = carry
        v, tau, alpha = _larfg(W[:, i], i)
        w = tau * jnp.matmul(v, W, precision=precision)
        w = jnp.where(jnp.arange(k) >= i, w, 0.0)
        W = W - jnp.outer(v, w)
        coli = jnp.where(jnp.arange(m) < i, W[:, i], 0.0).at[i].set(alpha)
        W = W.at[:, i].set(coli)
        V = V.at[:, i].set(v)
        taus = taus.at[i].set(tau)
        return W, V, taus

    W, V, taus = jax.lax.fori_loop(
        0, k, step, (Q, jnp.zeros((m, k), dtype), jnp.zeros((k,), dtype)))
    signs = jnp.sign(jnp.diag(W[:k, :]))
    packed = jnp.tril(V, -1)
    return packed, taus, signs


def apply_reflectors(packed: jax.Array, taus: jax.Array,
                     X: jax.Array | None = None,
                     precision=STABLE_PRECISION):
    """Form Q (or Q·X) from the packed implicit representation via
    ``householder_product`` — the gemqrt/ormqr capability."""
    m, k = packed.shape
    a = packed + jnp.eye(m, k, dtype=packed.dtype)
    Q = jax.lax.linalg.householder_product(a, taus)
    if X is None:
        return Q
    return jnp.matmul(Q, X, precision=precision)
