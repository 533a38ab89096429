"""RSVD — economy randomized SVD via QB (reference:
RandLAPACK/drivers/rl_rsvd.hh: RSVDalg :16, RSVD::call :114 — QB(A), then
dense SVD of the small factor B, U = Q·Û).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..errors import require
from ..rng import RNGState
from ..comps.qb import QBConfig, qb, qb_blocked
from ..ops.svd import svd_econ


@dataclasses.dataclass(frozen=True)
class RSVDConfig:
    qb: QBConfig = QBConfig()
    svd_method: str = "auto"      # see ops.svd.svd_econ


@partial(jax.jit, static_argnames=("k", "cfg", "precision"))
def rsvd_fixed_rank(A: jax.Array, k: int, cfg: RSVDConfig, state: RNGState,
                    precision=STABLE_PRECISION):
    """Fixed-rank RSVD, fully jitted: A ≈ U diag(S) Vᵀ with k terms.

    Returns ``(U, S, Vt, err, next_state)``; ``err`` is the relative
    Frobenius error of the rank-k QB capture (upper bound for SVD error).
    """
    Q, B, errs, state = qb_blocked(A, k, cfg.qb, state, precision)
    # SVD of the small k×n factor; U = Q·Û
    Ub, S, Vt = svd_econ(B, cfg.svd_method, precision)
    U = jnp.matmul(Q, Ub, precision=precision)
    return U, S, Vt, errs[-1], state


def rsvd(A: jax.Array, k: int, cfg: RSVDConfig, state: RNGState,
         tol: float = 0.0, precision=STABLE_PRECISION):
    """Adaptive-rank RSVD (the reference's tol-driven QB growth): stops QB
    at the first block meeting ``tol`` and truncates the SVD accordingly.

    Returns ``(U, S, Vt, rank, err, next_state)``.
    """
    m, n = A.shape
    require(0 < k <= min(m, n), "target rank out of range")
    Q, B, rank, err, state = qb(A, k, cfg.qb, state, tol, precision)
    Ub, S, Vt = svd_econ(B, cfg.svd_method, precision)
    U = jnp.matmul(Q, Ub, precision=precision)
    return U, S, Vt, rank, err, state
