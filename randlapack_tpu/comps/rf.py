"""Range finder — Q = orth(A·Ω) (reference: RandLAPACK/comps/rl_rf.hh:
RangeFinder :17, RF::call :107)."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..rng import RNGState
from .orth import Stab, orth
from .rs import RSConfig, rs


@dataclasses.dataclass(frozen=True)
class RFConfig:
    rs: RSConfig = RSConfig()
    orth: Stab = Stab.cholqr2


def rf(A: jax.Array, k: int, cfg: RFConfig, state: RNGState,
       precision=STABLE_PRECISION):
    """Orthonormal basis for an approximate dominant k-dim range of A.

    Returns ``(Q, next_state)`` with Q (m, k).
    CholQR failure falls back to Householder QR (the reference flags
    ``chol_fail`` and errors; we recover, which is strictly stronger).
    """
    omega, state = rs(A, k, cfg.rs, state, precision)
    y = jnp.matmul(A, omega, precision=precision)
    q, fail = orth(y, cfg.orth, precision)
    if cfg.orth != Stab.hqr:
        # lax.cond: the Householder fallback only executes on CholQR failure
        q = jax.lax.cond(fail,
                         lambda yy: orth(yy, Stab.hqr, precision)[0],
                         lambda _: q, y)
    return q, state
