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
    seminorm: object = None       # optional problem seminorm callable
                                  # val = seminorm(R) routed to pcg
                                  # (rl_determiter.hh:299-345) — the
                                  # convergence metric then becomes
                                  # seminorm(N·R) ≤ tol·(1+seminorm(N·R₀))
                                  # and hist holds the seminorm trace


def krill_full_rpchol(G, H: jax.Array, mus, cfg: KrillConfig,
                      state: RNGState, precision=STABLE_PRECISION):
    """Solve (K + μᵢ I) xᵢ = hᵢ for all columns of H.

    ``G`` is a regularized symmetric kernel operator exposing
    ``with_reg(flag)`` (RegExplicitSymLinOp or SquaredExpKernelLinOp);
    the preconditioner is built from the *unregularized* operator
    (rl_krill.hh:47) and applied per-column when μ is a vector.

    NOTE: the regularization that defines the linear systems lives in
    ``G`` itself (construct it with the same scalar-or-vector μ, exactly
    as the reference's RegExplicitSymLinOp holds its μs) — the ``mus``
    argument here only parameterizes the preconditioner and must match
    ``G``'s regularization, or PCG solves a different system than the
    preconditioner targets.

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
    X, hist, iters = pcg(G_reg, H, P, X0, cfg.pcg, precision,
                         seminorm=cfg.seminorm)
    return X, hist, iters, state


def krill_restricted_rpchol(G, H: jax.Array, mus, cfg: KrillConfig,
                            state: RNGState,
                            precision=STABLE_PRECISION):
    """Restricted-domain kernel ridge regression — the API the reference
    documents but ships disabled (rl_krill.hh:75-141
    ``krill_restricted_rpchol``, commented out): restrict the solution to
    the span of the k RPCholesky pivot columns.

    With F the rank-k RPCholesky factor (F·Fᵀ ≈ K Nyström, with
    (F·Fᵀ)[inds, inds] = K[inds, inds]) and M = F[inds, :], solve

        min ‖F·Mᵀ·x − H‖² + μ‖Mᵀ·x‖²   over x supported on ``inds``

    by the reference's change of basis y = Mᵀx: a k-dimensional ridge
    problem (VᵀV + μI)y = VᵀH solved directly (O(n·k²), the cost class
    the reference calls reasonable), then x[inds] = M⁻ᵀ·y.

    Returns ``(X, inds, y, next_state)``: X (n, s) zero off the pivot
    rows (the k·s nonzeros + k indices representation the reference
    notes), y the coefficients in the restricted basis.
    """
    from ..comps.rpchol import RPCholConfig, rp_cholesky
    n = G.dim
    s = H.shape[1] if H.ndim == 2 else 1
    H2 = H if H.ndim == 2 else H[:, None]
    mus_arr = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(mus, H.dtype)),
                               (s,))
    k = cfg.k or max(cfg.rpchol_block,
                     (int(math.isqrt(n)) // cfg.rpchol_block)
                     * cfg.rpchol_block)
    F, inds, state = rp_cholesky(G.with_reg(False), k,
                                 RPCholConfig(block_size=cfg.rpchol_block),
                                 state, precision)
    Gv = jnp.matmul(F.T, F, precision=precision)               # (k, k)
    rhs = jnp.matmul(F.T, H2, precision=precision)             # (k, s)

    def solve_col(mu_j, r_j):
        L = jax.lax.linalg.cholesky(Gv + mu_j * jnp.eye(k, dtype=H.dtype))
        z = jax.lax.linalg.triangular_solve(L, r_j[:, None],
                                            left_side=True, lower=True)
        return jax.lax.linalg.triangular_solve(
            L, z, left_side=True, lower=True, transpose_a=True)[:, 0]

    y = jax.vmap(solve_col, in_axes=(0, 1), out_axes=1)(mus_arr, rhs)
    M = F[inds, :]                                             # (k, k)
    x_active = jnp.linalg.solve(M.T, y)                        # (k, s)
    X = jnp.zeros((n, s), H.dtype).at[inds].set(x_active)
    if H.ndim == 1:
        return X[:, 0], inds, y[:, 0], state
    return X, inds, y, state
