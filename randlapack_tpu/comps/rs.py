"""Row sketcher — power iteration aligning the sketch with the top right
singular subspace (reference: RandLAPACK/comps/rl_rs.hh: RowSketcher :16,
RS::call :117 — Gaussian init, alternating gemms with A/Aᵀ, pluggable
stabilization every ``passes_per_stab`` gemms).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..rng import RNGState
from .orth import Stab, stabilize


@dataclasses.dataclass(frozen=True)
class RSConfig:
    passes_over_data: int = 2     # total gemms with A or Aᵀ
    passes_per_stab: int = 1
    stab: Stab = Stab.plu
    cond_check: bool = False      # accumulate cond(Ω) after each
                                  # stabilization into a returned
                                  # ``cond_nums`` vector (rl_rs.hh:112)


def _cond_est(M, precision):
    """cond₂ via the Gram spectrum — the reference's
    util::cond_num_check (rl_util.hh:403) sized for a skinny sketch."""
    G = jnp.matmul(M.T, M, precision=precision)
    lam = jnp.linalg.eigvalsh(0.5 * (G + G.T))
    lam = jnp.maximum(lam, 0.0)
    lo = jnp.sqrt(jnp.maximum(lam[0], jnp.finfo(M.dtype).tiny))
    return jnp.sqrt(lam[-1]) / lo


def rs(A: jax.Array, k: int, cfg: RSConfig, state: RNGState,
       precision=STABLE_PRECISION):
    """Produce an n×k sketching matrix Ω. Returns ``(Omega, next_state)``,
    or ``(Omega, next_state, cond_nums)`` when ``cfg.cond_check`` — one
    condition-number estimate per stabilization, mirroring the reference's
    ``cond_nums`` accumulation (rl_rs.hh:112)."""
    m, n = A.shape
    p = cfg.passes_over_data
    key, state = state.spawn()
    conds = []

    def _stab(M):
        out, _ = stabilize(M, cfg.stab, precision)
        if cfg.cond_check:
            conds.append(_cond_est(out, precision))
        return out

    if p % 2 == 0:
        omega = jax.random.normal(key, (n, k), dtype=A.dtype)
        passes_done = 0
    else:
        omega_m = jax.random.normal(key, (m, k), dtype=A.dtype)
        omega = jnp.matmul(A.T, omega_m, precision=precision)
        passes_done = 1
        if cfg.passes_per_stab == 1:
            omega = _stab(omega)
    while passes_done < p:
        y = jnp.matmul(A, omega, precision=precision)
        passes_done += 1
        if passes_done % cfg.passes_per_stab == 0:
            y = _stab(y)
        omega = jnp.matmul(A.T, y, precision=precision)
        passes_done += 1
        if passes_done % cfg.passes_per_stab == 0:
            omega = _stab(omega)
    if cfg.cond_check:
        return omega, state, jnp.stack(conds) if conds else jnp.zeros((0,),
                                                                      A.dtype)
    return omega, state
