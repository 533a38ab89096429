"""CQRRPT — CholeskyQR with randomized pivoting for tall matrices
(reference: RandLAPACK/drivers/rl_cqrrpt.hh: CQRRPTalg :21, CQRRPT::call
:147; algorithm of arXiv:2311.08316):

    1. SASO sketch A_sk = S·A (d×n, d = d_factor·n)        [:214-222]
    2. QRCP on the small sketch                             [:230-248]
    3. rank estimate from diag(R_sk)                        [:267-272]
    4. pivot A, precondition A·R_sk⁻¹, CholQR               [:287-332]
    5. un-precondition R = R_chol·R_sk                      [:338-345]

TPU redesign: all static shapes — the rank estimate is *returned* rather
than used to shrink arrays (callers slice on host); the QRCP-on-sketch
subroutine is selectable (scan-based geqp3, or BQRRP for bigger n).
"""
from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..rng import RNGState
from ..sketching import SparseDist, fill_sparse, saso_left_apply

from ..ops.qr import geqp3
from ..ops import util


class QRCPKind(enum.Enum):
    """QRCP subroutine for the sketch — the reference's three-way switch
    (rl_cqrrpt.hh:230-248, CQRRPTSubroutines::QRCP {geqp3,hqrrp,bqrrp})."""
    geqp3 = "geqp3"       # scan-based pivoted Householder on the sketch
    hqrrp = "hqrrp"       # Householder QR with randomized pivoting
    bqrrp = "bqrrp"       # blocked randomized QRCP (for larger n)


@dataclasses.dataclass(frozen=True)
class CQRRPTConfig:
    d_factor: float = 1.25
    vec_nnz: int = 2
    sketch: str = "saso"          # "saso" | "srht" | "gaussian"
    qrcp: QRCPKind = QRCPKind.geqp3
    bqrrp_block: int = 128        # block size when qrcp == bqrrp
    eps_rank: float | None = None  # rank-estimate threshold (None → machine)
    orthogonalization: bool = False  # complete a rank-deficient basis to a
                                     # full orthonormal Q with projected
                                     # Gaussians (rl_cqrrpt.hh:343-368)


@partial(jax.jit, static_argnames=("cfg", "precision"))
def cqrrpt(A: jax.Array, cfg: CQRRPTConfig, state: RNGState,
           precision=STABLE_PRECISION):
    """Pivoted QR of tall A: A[:, J] ≈ Q R.

    Returns ``(Q, R, J, rank, fail, next_state)`` — Q (m,n) orthonormal,
    R (n,n) upper-triangular, J (n,) int32 pivots, ``rank`` the estimated
    numerical rank (int32 scalar; columns of Q / rows of R beyond it are
    garbage exactly as in the reference's truncated outputs — slice on
    host), ``fail`` the CholQR breakdown flag.
    """
    m, n = A.shape
    d = int(cfg.d_factor * n)

    # 1. sketch (SASO for reference parity; SRHT rides the MXU and is the
    # TPU-preferred choice for huge m, SURVEY.md §7)
    if cfg.sketch == "saso":
        op, state = fill_sparse(SparseDist(d, m, cfg.vec_nnz), state,
                                dtype=A.dtype)
        A_sk = saso_left_apply(op, A)
    elif cfg.sketch == "srht":
        from ..sketching import srht_left_apply, srht_skop
        op, state = srht_skop(d, m, state, dtype=A.dtype)
        A_sk = srht_left_apply(op, A, precision=precision)
    else:
        import math
        key, state = state.spawn()
        S = jax.random.normal(key, (d, m), dtype=A.dtype) / math.sqrt(d)
        A_sk = jnp.matmul(S, A, precision=precision)

    # 2. QRCP on the d×n sketch
    if cfg.qrcp == QRCPKind.geqp3:
        _, R_sk, J = geqp3(A_sk, want_q=False, precision=precision)
    elif cfg.qrcp == QRCPKind.hqrrp:
        from .hqrrp import HQRRPConfig, hqrrp_lapack_format
        _, _, R_sk, J, state = hqrrp_lapack_format(
            A_sk, HQRRPConfig(block_size=cfg.bqrrp_block), state,
            precision)
        R_sk = R_sk[:n, :]
    else:
        from .bqrrp import BQRRPConfig, bqrrp
        _, R_sk, J, _, _, state = bqrrp(
            A_sk, BQRRPConfig(block_size=cfg.bqrrp_block), state, precision)
        R_sk = R_sk[:n, :]

    # 3. initial rank estimate off the sketch's R diagonal — the reference
    # truncates where R[i,i]/R[0,0] < eps_initial (machine eps by default)
    # just to keep the preconditioner invertible (rl_cqrrpt.hh:263-272);
    # the *real* rank comes a posteriori.
    eps = cfg.eps_rank or float(jnp.finfo(A.dtype).eps)
    diag = jnp.abs(jnp.diag(R_sk))
    rank = util.naive_rank_est(jnp.diag(R_sk), diag[0] * eps)

    # 4. pivot + precondition + CholQR. Static-shape handling of rank
    # deficiency: columns beyond `rank` are zeroed in the preconditioned
    # matrix and the Gram matrix gets an identity trailing block —
    # Cholesky nests, so the leading rank×rank factor (and the leading
    # `rank` columns of Q) are exactly what the reference's shrunken
    # computation produces; trailing Q columns are zero.
    keep = (jnp.arange(n) < rank).astype(A.dtype)
    dsafe = jnp.where(keep > 0, jnp.diag(R_sk), 1.0)
    R_sk_safe = jnp.triu(R_sk) - jnp.diag(jnp.diag(R_sk)) + jnp.diag(dsafe)
    A_piv = util.col_swap(A, J)
    A_pre = jax.lax.linalg.triangular_solve(
        R_sk_safe, A_piv, left_side=False, lower=False) * keep[None, :]
    G = jnp.matmul(A_pre.T, A_pre, precision=precision) + jnp.diag(1.0 - keep)
    L = jax.lax.linalg.cholesky(G)
    fail = jnp.any(jnp.isnan(L))
    R_chol = L.T
    Q = jax.lax.linalg.triangular_solve(
        R_chol, A_pre, left_side=False, lower=False)
    R = jnp.matmul(R_chol, R_sk_safe, precision=precision)

    if cfg.orthogonalization:
        # basis completion (rl_cqrrpt.hh:343-368): replace the zeroed
        # trailing columns with Gaussians projected against the leading
        # rank columns, orthonormalized by CholQR. Static shapes: all n
        # candidates are completed, then selected per-column by rank mask.
        key, state = state.spawn()
        G_rand = jax.random.normal(key, Q.shape, dtype=A.dtype)
        Qk = Q * keep[None, :]
        for _ in range(2):  # two projection passes (BCGS2)
            G_rand = G_rand - jnp.matmul(
                Qk, jnp.matmul(Qk.T, G_rand, precision=precision),
                precision=precision)
        from ..ops.cholqr import cholqr2
        Qc, _, f2 = cholqr2(G_rand, precision)
        fail = fail | f2
        Q = jnp.where(keep[None, :] > 0, Q, Qc)
    return Q, R, J, rank, fail, state
