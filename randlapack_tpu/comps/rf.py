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
    cond_check: bool = False      # also estimate cond(Y) before the
                                  # orthogonalization (rl_rf.hh:102)


def rf(A: jax.Array, k: int, cfg: RFConfig, state: RNGState,
       precision=STABLE_PRECISION):
    """Orthonormal basis for an approximate dominant k-dim range of A.

    Returns ``(Q, next_state)`` with Q (m, k) — plus a ``cond_nums``
    vector (RS stabilization conds followed by cond(Y), rl_rf.hh:102)
    when ``cfg.cond_check``.
    CholQR failure falls back to Householder QR (the reference flags
    ``chol_fail`` and errors; we recover, which is strictly stronger).
    """
    rs_cfg = cfg.rs
    if cfg.cond_check and not rs_cfg.cond_check:
        import dataclasses as _dc
        rs_cfg = _dc.replace(rs_cfg, cond_check=True)
    # unpack by rs_cfg's own arity: a caller may set RSConfig(cond_check=
    # True) with RFConfig.cond_check False — rs then returns a 3-tuple
    # whose conds rf simply drops
    if rs_cfg.cond_check:
        omega, state, conds = rs(A, k, rs_cfg, state, precision)
    else:
        omega, state = rs(A, k, rs_cfg, state, precision)
    y = jnp.matmul(A, omega, precision=precision)
    if cfg.cond_check:
        from .rs import _cond_est
        conds = jnp.concatenate(
            [conds, _cond_est(y, precision)[None].astype(A.dtype)])
    q, fail = orth(y, cfg.orth, precision)
    if cfg.orth != Stab.hqr:
        # lax.cond: the Householder fallback only executes on CholQR failure
        q = jax.lax.cond(fail,
                         lambda yy: orth(yy, Stab.hqr, precision)[0],
                         lambda _: q, y)
    if cfg.cond_check:
        return q, state, conds
    return q, state
