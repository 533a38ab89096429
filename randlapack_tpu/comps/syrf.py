"""Symmetric range finder — SYRF = SYPS then orth(A·Ω)
(reference: RandLAPACK/comps/rl_syrf.hh: SYRF::call :72/:85)."""
from __future__ import annotations

import dataclasses

import jax

from ..config import STABLE_PRECISION
from ..rng import RNGState
from .orth import Stab, orth
from .syps import SYPSConfig, syps, _apply_sym


@dataclasses.dataclass(frozen=True)
class SYRFConfig:
    syps: SYPSConfig = SYPSConfig()
    orth: Stab = Stab.cholqr2


def syrf(A, k: int, cfg: SYRFConfig, state: RNGState,
         precision=STABLE_PRECISION):
    """Orthonormal basis aligned with the dominant eigenspace of a
    symmetric operator. Returns ``(Q, next_state)``."""
    omega, state = syps(A, k, cfg.syps, state, precision)
    y = _apply_sym(A, omega, precision)
    q, fail = orth(y, cfg.orth, precision)
    if cfg.orth != Stab.hqr:
        q = jax.lax.cond(fail,
                         lambda yy: orth(yy, Stab.hqr, precision)[0],
                         lambda _: q, y)
    return q, state
