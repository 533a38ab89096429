"""Deterministic iterative solvers — preconditioned CG family
(reference: RandLAPACK/comps/rl_determiter.hh: pcg :372 with lockstep and
block modes, posm_square :232, psd_sqrt_pinv :181, pcg_saddle :19,
StatefulFrobeniusNorm :140).

TPU design: lax.while_loop with a convergence *mask* — converged columns
freeze (the reference's lockstep mode zeroing off-diagonal scalars,
:418-440, is exactly per-column masked CG); residual history is a
preallocated (max_iters, s) array. Everything jit-traceable.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION


def _apply(op, X, precision):
    if op is None:
        return X
    if hasattr(op, "matmat"):
        return op.matmat(X, precision)
    if callable(op):
        return op(X)
    return jnp.matmul(op, X, precision=precision)


@dataclasses.dataclass(frozen=True)
class PCGConfig:
    tol: float = 1e-8             # relative residual target
    max_iters: int = 100
    mode: str = "lockstep"        # "lockstep" (per-column) | "block"
    verbose: bool = False         # per-iteration residual trace via
                                  # jax.debug.print (the reference's
                                  # ``verbose`` cout trace,
                                  # rl_determiter.hh:428,466)


@partial(jax.jit, static_argnames=("cfg", "precision"))
def pcg(G, H: jax.Array, N, X0: jax.Array, cfg: PCGConfig,
        precision=STABLE_PRECISION):
    """Preconditioned CG for G X = H (s columns).

    ``G``/``N`` are linops, callables, or dense arrays; ``N=None`` means no
    preconditioner. Lockstep mode solves the s systems independently with
    per-column scalars and a convergence mask; block mode couples them with
    b×b scalar solves (classical block CG, faster for one operator with
    multiple right-hand sides).

    Returns ``(X, res_hist, iters)``: res_hist (max_iters+1, s) of
    per-column residual norms (‖·‖₂; entries past convergence repeat the
    final value), iters the iteration count actually performed.
    """
    n, s = H.shape
    dtype = H.dtype
    nrm_H = jnp.linalg.norm(H, axis=0)
    tol_abs = cfg.tol * jnp.maximum(nrm_H, jnp.finfo(dtype).tiny)

    R = H - _apply(G, X0, precision)
    Z = _apply(N, R, precision)
    P = Z
    hist0 = jnp.zeros((cfg.max_iters + 1, s), dtype)
    hist0 = hist0.at[0].set(jnp.linalg.norm(R, axis=0))

    if cfg.mode == "lockstep":
        rho0 = jnp.sum(R * Z, axis=0)

        def cond(carry):
            X, R, Z, P, rho, hist, it = carry
            return (it < cfg.max_iters) & jnp.any(
                jnp.linalg.norm(R, axis=0) > tol_abs)

        def body(carry):
            X, R, Z, P, rho, hist, it = carry
            active = (jnp.linalg.norm(R, axis=0) > tol_abs).astype(dtype)
            W = _apply(G, P, precision)
            denom = jnp.sum(P * W, axis=0)
            alpha = jnp.where(denom != 0, rho / jnp.where(denom != 0, denom,
                                                          1.0), 0.0)
            alpha = alpha * active
            X = X + P * alpha[None, :]
            R = R - W * alpha[None, :]
            Z = _apply(N, R, precision)
            rho_new = jnp.sum(R * Z, axis=0)
            beta = jnp.where(rho != 0, rho_new / jnp.where(rho != 0, rho, 1.0),
                             0.0) * active
            P = Z + P * beta[None, :]
            res = jnp.linalg.norm(R, axis=0)
            hist = hist.at[it + 1].set(res)
            if cfg.verbose:
                jax.debug.print("pcg iter {it}: max residual {r}",
                                it=it + 1, r=jnp.max(res))
            return X, R, Z, P, rho_new, hist, it + 1

        X, R, Z, P, rho, hist, it = jax.lax.while_loop(
            cond, body, (X0, R, Z, P, rho0, hist0, jnp.int32(0)))
        return X, hist, it

    # block mode: s coupled rhs of ONE operator; b×b scalar systems solved
    # with Cholesky, falling back to eigh pseudo-inverse (posm_square).
    def _psd_solve(M, B):
        L = jax.lax.linalg.cholesky(M)
        ok = ~jnp.any(jnp.isnan(L))

        def chol_solve(_):
            y = jax.lax.linalg.triangular_solve(L, B, left_side=True,
                                                lower=True)
            return jax.lax.linalg.triangular_solve(L, y, left_side=True,
                                                   lower=True,
                                                   transpose_a=True)

        def pinv_solve(_):
            w, U = jnp.linalg.eigh(0.5 * (M + M.T))
            tol = jnp.maximum(jnp.max(jnp.abs(w)), 0.0) * s * jnp.finfo(dtype).eps
            winv = jnp.where(jnp.abs(w) > tol, 1.0 / jnp.where(w != 0, w, 1.0),
                             0.0)
            return U @ (winv[:, None] * (U.T @ B))

        return jax.lax.cond(ok, chol_solve, pinv_solve, None)

    rho0 = jnp.matmul(R.T, Z, precision=precision)   # (s, s)

    def cond_b(carry):
        X, R, Z, P, rho, hist, it = carry
        return (it < cfg.max_iters) & jnp.any(
            jnp.linalg.norm(R, axis=0) > tol_abs)

    def body_b(carry):
        X, R, Z, P, rho, hist, it = carry
        W = _apply(G, P, precision)
        alpha = _psd_solve(jnp.matmul(P.T, W, precision=precision), rho)
        X = X + jnp.matmul(P, alpha, precision=precision)
        R = R - jnp.matmul(W, alpha, precision=precision)
        Z = _apply(N, R, precision)
        rho_new = jnp.matmul(R.T, Z, precision=precision)
        beta = _psd_solve(rho, rho_new)
        P = Z + jnp.matmul(P, beta, precision=precision)
        res = jnp.linalg.norm(R, axis=0)
        hist = hist.at[it + 1].set(res)
        if cfg.verbose:
            jax.debug.print("pcg(block) iter {it}: max residual {r}",
                            it=it + 1, r=jnp.max(res))
        return X, R, Z, P, rho_new, hist, it + 1

    X, R, Z, P, rho, hist, it = jax.lax.while_loop(
        cond_b, body_b, (X0, R, Z, P, rho0, hist0, jnp.int32(0)))
    return X, hist, it


@dataclasses.dataclass(frozen=True)
class PCGSaddleConfig:
    tol: float = 1e-10
    max_iters: int = 200
    refresh_every: int = 50       # exact-residual recompute period (:92)
    verbose: bool = False         # per-iteration residual trace
                                  # (rl_determiter.hh:428 analogue)


@partial(jax.jit, static_argnames=("cfg", "precision"))
def pcg_saddle(A: jax.Array, b: jax.Array, c: jax.Array, mu,
               M: jax.Array, x0: jax.Array, cfg: PCGSaddleConfig,
               precision=STABLE_PRECISION):
    """PCG for the regularized normal equations (AᵀA + μI) x = Aᵀb − c with
    right preconditioner M (so N = M Mᵀ) — the sketch-and-precondition
    least-squares core (reference: rl_determiter.hh:19; the preconditioner
    comes from ``preconditioners.rpc_data_svd``).

    Returns ``(x, res_hist, iters)``.
    """
    dtype = A.dtype
    mu = jnp.asarray(mu, dtype)

    def G(x):
        return jnp.matmul(A.T, jnp.matmul(A, x, precision=precision),
                          precision=precision) + mu * x

    def N(r):
        return jnp.matmul(M, jnp.matmul(M.T, r, precision=precision),
                          precision=precision)

    rhs = jnp.matmul(A.T, b, precision=precision) - c
    nrm_rhs = jnp.linalg.norm(rhs)
    tol_abs = cfg.tol * jnp.maximum(nrm_rhs, jnp.finfo(dtype).tiny)

    r = rhs - G(x0)
    z = N(r)
    p = z
    rho0 = jnp.sum(r * z)
    hist0 = jnp.zeros((cfg.max_iters + 1,), dtype).at[0].set(
        jnp.linalg.norm(r))

    def cond(carry):
        x, r, z, p, rho, hist, it = carry
        return (it < cfg.max_iters) & (jnp.linalg.norm(r) > tol_abs)

    def body(carry):
        x, r, z, p, rho, hist, it = carry
        w = G(p)
        alpha = rho / jnp.sum(p * w)
        x = x + alpha * p
        r_upd = r - alpha * w
        # periodic exact-residual refresh fights drift (:92)
        r = jax.lax.cond((it + 1) % cfg.refresh_every == 0,
                         lambda _: rhs - G(x), lambda _: r_upd, None)
        z = N(r)
        rho_new = jnp.sum(r * z)
        beta = rho_new / rho
        p = z + beta * p
        hist = hist.at[it + 1].set(jnp.linalg.norm(r))
        if cfg.verbose:
            jax.debug.print("pcg_saddle iter {it}: residual {r}",
                            it=it + 1, r=jnp.linalg.norm(r))
        return x, r, z, p, rho_new, hist, it + 1

    x, r, z, p, rho, hist, it = jax.lax.while_loop(
        cond, body, (x0, r, z, p, rho0, hist0, jnp.int32(0)))
    return x, hist, it
