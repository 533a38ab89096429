"""Symmetric operators + spectral preconditioner
(reference: rl_sym_linops.hh — ExplicitSymLinOp :55, RegExplicitSymLinOp
:135, SpectralPrecond :228).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION


@jax.tree_util.register_pytree_node_class
class ExplicitSymLinOp:
    """Symmetric operator backed by a dense symmetric matrix."""

    def __init__(self, mat: jax.Array):
        self.mat = mat

    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def dim(self):
        return self.mat.shape[0]

    n_rows = n_cols = dim

    @property
    def dtype(self):
        return self.mat.dtype

    def matmat(self, X, precision=STABLE_PRECISION):
        return jnp.matmul(self.mat, X, precision=precision)

    tmatmat = matmat

    def fro_nrm(self):
        return jnp.linalg.norm(self.mat)

    def entry(self, i, j):
        return self.mat[i, j]

    def columns(self, idx):
        """K[:, idx] — the RPCholesky column-evaluation hook."""
        return jnp.take(self.mat, idx, axis=1)

    def diagonal(self):
        return jnp.diag(self.mat)


@jax.tree_util.register_pytree_node_class
class RegExplicitSymLinOp:
    """Family of regularized operators {A + μ_i I} applied columnwise:
    (G X)[:, i] = (A + μ_i I) X[:, i] (reference: rl_sym_linops.hh:135,
    per-column regularization :178-184). ``evals_include_reg`` mirrors
    ``set_eval_includes_reg`` — here it is an immutable constructor flag
    (functional style); use ``with_reg(flag)`` to flip.
    """

    def __init__(self, mat: jax.Array, mus: jax.Array,
                 evals_include_reg: bool = True):
        self.mat = mat
        self.mus = jnp.atleast_1d(mus)
        self.evals_include_reg = evals_include_reg

    def tree_flatten(self):
        return (self.mat, self.mus), self.evals_include_reg

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    def with_reg(self, flag: bool):
        return RegExplicitSymLinOp(self.mat, self.mus, flag)

    @property
    def dim(self):
        return self.mat.shape[0]

    n_rows = n_cols = dim

    @property
    def num_ops(self):
        return self.mus.shape[0]

    @property
    def dtype(self):
        return self.mat.dtype

    def _col_mus(self, ncols):
        if self.num_ops == 1:
            return jnp.broadcast_to(self.mus, (ncols,))
        assert ncols == self.num_ops, (ncols, self.num_ops)
        return self.mus

    def matmat(self, X, precision=STABLE_PRECISION):
        out = jnp.matmul(self.mat, X, precision=precision)
        if self.evals_include_reg:
            out = out + X * self._col_mus(X.shape[1])[None, :]
        return out

    tmatmat = matmat

    def fro_nrm(self):
        return jnp.linalg.norm(self.mat)

    def columns(self, idx):
        cols = jnp.take(self.mat, idx, axis=1)
        if self.evals_include_reg:
            # add μ on the diagonal entries of the selected columns
            mu = self.mus[0] if self.num_ops == 1 else None
            assert self.num_ops == 1, \
                "column eval with per-column μ is ambiguous"
            n = self.dim
            onehots = (jnp.arange(n)[:, None] == idx[None, :])
            cols = cols + mu * onehots.astype(cols.dtype)
        return cols

    def diagonal(self):
        d = jnp.diag(self.mat)
        if self.evals_include_reg:
            assert self.num_ops == 1
            d = d + self.mus[0]
        return d


@jax.tree_util.register_pytree_node_class
class SpectralPrecond:
    """P = V diag(D) Vᵀ + I with D = (λ_min + μ)/(λ + μ) − 1
    (reference: rl_sym_linops.hh:228, prep :318, 2-GEMM apply :339-377).

    Supports one μ (D shape (k,)) or per-column μ (D shape (k, s) and the
    apply regards column i of X as belonging to system i).
    """

    def __init__(self, V: jax.Array, D: jax.Array):
        self.V = V
        self.D = D

    @classmethod
    def prep(cls, eigvecs: jax.Array, eigvals: jax.Array, mus,
             min_eig=None):
        mus = jnp.atleast_1d(mus)
        lam_min = eigvals[-1] if min_eig is None else min_eig
        # broadcast: (k, s)
        D = (lam_min + mus[None, :]) / (eigvals[:, None] + mus[None, :]) - 1.0
        if mus.shape[0] == 1:
            D = D[:, 0]
        return cls(eigvecs, D)

    def tree_flatten(self):
        return (self.V, self.D), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def dim(self):
        return self.V.shape[0]

    n_rows = n_cols = dim

    @property
    def dtype(self):
        return self.V.dtype

    def matmat(self, X, precision=STABLE_PRECISION):
        W = jnp.matmul(self.V.T, X, precision=precision)  # (k, s)
        if self.D.ndim == 1:
            W = W * self.D[:, None]
        else:
            assert X.shape[1] == self.D.shape[1], (X.shape, self.D.shape)
            W = W * self.D
        return X + jnp.matmul(self.V, W, precision=precision)

    tmatmat = matmat

    def fro_nrm(self):
        # ‖VDVᵀ+I‖_F = sqrt(Σ(1+d)² + (n−k)) for orthonormal V, single-μ D
        if self.D.ndim == 1:
            n, k = self.V.shape
            return jnp.sqrt(jnp.sum((1.0 + self.D) ** 2) + (n - k))
        raise NotImplementedError
