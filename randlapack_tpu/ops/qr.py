"""QR kernels: Householder wrappers, scan-based column-pivoted QR (geqp3
equivalent — XLA has no pivoted-QR primitive, SURVEY.md §7 "hard parts"),
and LU-based pivot selection (the reference BQRRP's default ``luqr``
qrcp_wide, rl_bqrrp.hh:339-356).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION


def qr_econ(A: jax.Array):
    """Economy Householder QR → (Q, R). Wraps lax.linalg.qr."""
    return jax.lax.linalg.qr(A, full_matrices=False)


def _larfg(x: jax.Array, i):
    """Householder reflector annihilating x[i+1:] with rows < i masked out.

    LAPACK larfg semantics, jit-safe with traced i.
    Returns (v, tau, alpha): v normalized so v[i] = 1 (zeros in rows < i),
    H = I − tau·v·vᵀ, H x = alpha·e_i (on the masked part).
    """
    m = x.shape[0]
    rows = jnp.arange(m)
    xm = jnp.where(rows >= i, x, 0)
    xi = x[i]
    normx = jnp.linalg.norm(xm)
    sign = jnp.where(xi >= 0, 1.0, -1.0).astype(x.dtype)
    alpha = -sign * normx
    denom = xi - alpha
    safe = jnp.abs(denom) > 0
    denom_s = jnp.where(safe, denom, 1.0)
    v = jnp.where(rows > i, xm / denom_s, 0.0)
    v = v.at[i].set(1.0)
    tau = jnp.where(safe, (alpha - xi) / jnp.where(alpha != 0, alpha, 1.0), 0.0)
    tau = jnp.where(normx > 0, tau, 0.0)
    alpha = jnp.where(normx > 0, alpha, xi)
    return v, tau.astype(x.dtype), alpha.astype(x.dtype)


@partial(jax.jit, static_argnames=("k", "want_q", "pivot", "precision"))
def geqp3(A: jax.Array, k: int | None = None, want_q: bool = True,
          pivot: bool = True, precision=STABLE_PRECISION):
    """Column-pivoted Householder QR (GEQP3 capability).

    Sequential over (at most) k columns with greedy max-norm pivoting and
    squared-norm downdating (the reference's HQRRP panel kernel
    ``NoFLA_QRPmod_WY_unb_var4`` uses the same math, rl_hqrrp.hh:360,557 —
    redesigned here as a lax.fori_loop of full-width masked rank-1 updates,
    which is how a column-sequential factorization stays static-shaped
    under jit).

    Returns ``(Q, R, J)``: Q (m×k) explicit orthonormal (or None if
    ``want_q=False``), R (k×n) upper-trapezoidal *of the pivoted matrix*,
    J (n,) int32 with A[:, J] ≈ Q R.

    Cost: O(m n k) VPU (rank-1) work — use only on small/sketch matrices;
    large pivoted QR should go through BQRRP.
    """
    m, n = A.shape
    if k is None:
        k = min(m, n)
    k = min(k, min(m, n))
    dtype = A.dtype

    def step(i, carry):
        Awork, V, taus, J, cn2 = carry
        cols = jnp.arange(n)
        if pivot:
            # 1. pivot selection on downdated squared norms
            masked = jnp.where(cols >= i, cn2, -jnp.inf)
            p = jnp.argmax(masked)
            # 2. swap columns i <-> p (gather-free swap via where)
            perm = jnp.where(cols == i, p, jnp.where(cols == p, i, cols))
            Awork = jnp.take(Awork, perm, axis=1)
            J = jnp.take(J, perm)
            cn2 = jnp.take(cn2, perm)
        # 3. reflector for column i
        v, tau, alpha = _larfg(Awork[:, i], i)
        # 4. apply H = I − tau v vᵀ to columns ≥ i
        w = tau * jnp.matmul(v, Awork, precision=precision)  # (n,)
        w = jnp.where(cols >= i, w, 0.0)
        Awork = Awork - jnp.outer(v, w)
        # 5. clean column i: alpha at (i, i), zeros below
        coli = jnp.where(jnp.arange(m) < i, Awork[:, i], 0.0).at[i].set(alpha)
        Awork = Awork.at[:, i].set(coli)
        # 6. store reflector, downdate norms
        V = V.at[:, i].set(v)
        taus = taus.at[i].set(tau)
        cn2 = jnp.where(cols > i, jnp.maximum(cn2 - Awork[i, :] ** 2, 0.0),
                        cn2)
        return Awork, V, taus, J, cn2

    carry = (A,
             jnp.zeros((m, k), dtype),
             jnp.zeros((k,), dtype),
             jnp.arange(n, dtype=jnp.int32),
             jnp.sum(A * A, axis=0))
    Awork, V, taus, J, _ = jax.lax.fori_loop(0, k, step, carry)

    R = jnp.triu(Awork[:k, :])
    Q = None
    if want_q:
        packed = jnp.tril(V, -1) + jnp.eye(m, k, dtype=dtype)
        Q = jax.lax.linalg.householder_product(packed, taus)
    return Q, R, J


def lu_pivot_columns(A_panel_t: jax.Array):
    """Column-pivot selection via partial-pivoted LU — BQRRP's ``luqr``
    qrcp_wide (rl_bqrrp.hh:339-349): getrf on the transposed sketch panel;
    the LU row permutation of A_skᵀ is the column pivot order of A_sk.

    ``A_panel_t``: (n, d) = transposed d×n sketch panel.
    Returns the full length-n permutation (first d entries are the chosen
    pivot columns, in order).
    """
    _, _, perm = jax.lax.linalg.lu(A_panel_t)
    return perm.astype(jnp.int32)
