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


def rs(A: jax.Array, k: int, cfg: RSConfig, state: RNGState,
       precision=STABLE_PRECISION):
    """Produce an n×k sketching matrix Ω. Returns ``(Omega, next_state)``."""
    m, n = A.shape
    p = cfg.passes_over_data
    key, state = state.spawn()
    if p % 2 == 0:
        omega = jax.random.normal(key, (n, k), dtype=A.dtype)
        passes_done = 0
    else:
        omega_m = jax.random.normal(key, (m, k), dtype=A.dtype)
        omega = jnp.matmul(A.T, omega_m, precision=precision)
        passes_done = 1
        if cfg.passes_per_stab == 1:
            omega, _ = stabilize(omega, cfg.stab, precision)
    while passes_done < p:
        y = jnp.matmul(A, omega, precision=precision)
        passes_done += 1
        if passes_done % cfg.passes_per_stab == 0:
            y, _ = stabilize(y, cfg.stab, precision)
        omega = jnp.matmul(A.T, y, precision=precision)
        passes_done += 1
        if passes_done % cfg.passes_per_stab == 0:
            omega, _ = stabilize(omega, cfg.stab, precision)
    return omega, state
