"""KRILL — kernel ridge regression via RPCholesky-preconditioned CG
(reference: RandLAPACK/drivers/rl_krill.hh: krill_full_rpchol :21 —
RPCholesky preconditioner data at k≈√n, SpectralPrecond::prep, then pcg on
the regularized kernel operator; supports one μ or per-column μ).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..rng import RNGState
from ..comps.determiter import PCGConfig, pcg
from ..comps.preconditioners import rpchol_pc_data
from ..linops.symmetric import SpectralPrecond


@dataclasses.dataclass(frozen=True)
class KrillConfig:
    k: int | None = None          # preconditioner rank (None → ~√n)
    rpchol_block: int = 64
    pcg: PCGConfig = PCGConfig(tol=1e-8, max_iters=200)


def krill_full_rpchol(G, H: jax.Array, mus, cfg: KrillConfig,
                      state: RNGState, precision=STABLE_PRECISION):
    """Solve (K + μᵢ I) xᵢ = hᵢ for all columns of H.

    ``G`` is a regularized symmetric kernel operator exposing
    ``with_reg(flag)`` (RegExplicitSymLinOp or SquaredExpKernelLinOp);
    the preconditioner is built from the *unregularized* operator
    (rl_krill.hh:47) and applied per-column when μ is a vector.

    Returns ``(X, res_hist, iters, next_state)``.
    """
    n = G.dim
    mus_arr = jnp.atleast_1d(jnp.asarray(mus, H.dtype))
    k = cfg.k or max(cfg.rpchol_block,
                     (int(math.isqrt(n)) // cfg.rpchol_block)
                     * cfg.rpchol_block)
    V, lam, piv, state = rpchol_pc_data(G.with_reg(False), k, state,
                                        block_size=cfg.rpchol_block,
                                        precision=precision)
    P = SpectralPrecond.prep(V, lam, mus_arr)
    G_reg = G.with_reg(True)
    X0 = jnp.zeros_like(H)
    X, hist, iters = pcg(G_reg, H, P, X0, cfg.pcg, precision)
    return X, hist, iters, state
