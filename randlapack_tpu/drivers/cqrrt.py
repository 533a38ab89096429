"""CQRRT — unpivoted sketch-then-precondition CholeskyQR (reference:
RandLAPACK/drivers/rl_cqrrt.hh: CQRRTalg :21, CQRRT::call :123; algorithm
of arXiv:2111.11148): sketch A, QR the small sketch, use its R as a right
preconditioner so one CholQR pass orthogonalizes even ill-conditioned A.

TPU-first: the sketch is SASO (scatter-add) or SRHT (MXU); the Gram matrix
is one big MXU matmul. Everything is one jitted graph.
"""
from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..rng import RNGState
from ..sketching import (SparseDist, fill_sparse, saso_left_apply,
                         srht_left_apply, srht_skop)
from ..ops.cholqr import preconditioned_cholqr
from ..ops.qr import qr_econ


class SketchKind(enum.Enum):
    saso = "saso"
    srht = "srht"
    gaussian = "gaussian"


@dataclasses.dataclass(frozen=True)
class CQRRTConfig:
    d_factor: float = 1.25        # sketch rows = d_factor * n
    sketch: SketchKind = SketchKind.saso
    vec_nnz: int = 2              # SASO nonzeros per column
    compute_q: bool = True


def _sketch(A, d, cfg: CQRRTConfig, state: RNGState, precision):
    m = A.shape[0]
    if cfg.sketch == SketchKind.saso:
        op, state = fill_sparse(SparseDist(d, m, cfg.vec_nnz), state,
                                dtype=A.dtype)
        return saso_left_apply(op, A), state
    if cfg.sketch == SketchKind.srht:
        op, state = srht_skop(d, m, state, dtype=A.dtype)
        return srht_left_apply(op, A, precision=precision), state
    key, state = state.spawn()
    import math
    S = jax.random.normal(key, (d, m), dtype=A.dtype) / math.sqrt(d)
    return jnp.matmul(S, A, precision=precision), state


@partial(jax.jit, static_argnames=("cfg", "precision"))
def cqrrt(A: jax.Array, cfg: CQRRTConfig, state: RNGState,
          precision=STABLE_PRECISION):
    """Unpivoted QR of tall A. Returns ``(Q, R, fail, next_state)``.

    ``fail`` mirrors the reference's potrf-failure signal — True means the
    preconditioned CholQR broke down (A numerically rank-deficient beyond
    what preconditioning fixes).
    """
    m, n = A.shape
    d = int(cfg.d_factor * n)
    A_sk, state = _sketch(A, d, cfg, state, precision)
    _, R_sk = qr_econ(A_sk)                       # d×n sketch QR, R n×n
    # guard exact zeros on the diagonal so triangular_solve stays finite
    eps = jnp.finfo(A.dtype).eps
    dref = jnp.max(jnp.abs(jnp.diag(R_sk))) * eps
    dsafe = jnp.where(jnp.abs(jnp.diag(R_sk)) > dref,
                      jnp.diag(R_sk),
                      jnp.maximum(dref, eps))
    R_sk = R_sk - jnp.diag(jnp.diag(R_sk)) + jnp.diag(dsafe)
    if not cfg.compute_q:
        # Q-less path (the reference's compute_Q=false, rl_cqrrt.hh:113):
        # Gram + Cholesky only — R from one pass over A, no trsm for Q.
        A_pre = jax.lax.linalg.triangular_solve(R_sk, A, left_side=False,
                                                lower=False)
        G = jnp.matmul(A_pre.T, A_pre, precision=precision)
        L = jax.lax.linalg.cholesky(0.5 * (G + G.T))
        fail = jnp.any(jnp.isnan(L))
        R = jnp.matmul(L.T, R_sk, precision=precision)
        return None, R, fail, state
    Q, R, fail = preconditioned_cholqr(A, R_sk, precision)
    return Q, R, fail, state
