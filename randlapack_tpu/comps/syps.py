"""Symmetric power sketch — SYPS (reference: RandLAPACK/comps/rl_syps.hh:
SYPS::call :82/:96): power method Ω ← A·Ω on a symmetric operator with QR
stabilization every q passes. Works on any symmetric linop (duck-typed
``matmat``) or a dense symmetric array.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..rng import RNGState
from .orth import Stab, stabilize


def _apply_sym(A, X, precision):
    if hasattr(A, "matmat"):
        return A.matmat(X, precision)
    return jnp.matmul(A, X, precision=precision)


@dataclasses.dataclass(frozen=True)
class SYPSConfig:
    passes_over_data: int = 3
    passes_per_stab: int = 1
    stab: Stab = Stab.plu


def syps(A, k: int, cfg: SYPSConfig, state: RNGState,
         precision=STABLE_PRECISION):
    """n×k power-iterated sketch of a symmetric operator.
    Returns ``(Omega, next_state)``."""
    n = A.dim if hasattr(A, "dim") else A.shape[0]
    dtype = A.dtype if hasattr(A, "dtype") else A.dtype
    key, state = state.spawn()
    omega = jax.random.normal(key, (n, k), dtype=dtype)
    for p in range(cfg.passes_over_data):
        omega = _apply_sym(A, omega, precision)
        if (p + 1) % cfg.passes_per_stab == 0:
            omega, _ = stabilize(omega, cfg.stab, precision)
    return omega, state
