"""BQRRP — blocked randomized QR with column pivoting, the flagship
performance driver (reference: RandLAPACK/drivers/rl_bqrrp.hh: BQRRPalg
:20, BQRRP::call :155; framework of arXiv:1509.06820 Alg 4).

Reference skeleton per block (SURVEY.md §3.3): QRCP on a one-time sketch
via LU pivots (``luqr``), pivot the trailing matrix, tall QR of the panel
(CholQR with sketch-R preconditioning), apply Qᵀ to the trailing matrix,
and *downdate* the sketch instead of re-sketching (:630-650).

TPU redesign:
  * Explicit-Q accumulation — the panel bases are orthogonal by
    construction (each panel is orthogonalized against the running Q via
    the trailing update), so Q = [Q₁ | Q₂ | …] directly; no Householder
    tau/orhr_col machinery (SURVEY.md §7 recommends explicit-Q primary).
  * One jitted lax.fori_loop over blocks; all shapes static. Column
    retirement is positional: a per-block permutation (built by argsort of
    a composite key) moves the b chosen pivots into place and is applied to
    A, the sketch, R's columns, and J together.
  * Trailing updates run full-width with masks (≤2× FLOP overhead vs
    shrinking widths, but zero recompilation and perfect MXU shapes).
  * Sketch downdate uses S·Q_panel = A_sk_panel·R₁₁⁻¹ (exact in exact
    arithmetic since Q_panel = A_panel·R₁₁⁻¹), one triangular solve + one
    rank-b GEMM — same math as the reference's trsm+gemm downdate.
"""
from __future__ import annotations

import dataclasses
import enum
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION
from ..rng import RNGState
from ..ops.cholqr import cholqr, preconditioned_cholqr
from ..ops.qr import qr_econ
from ..ops import util


class QRTall(enum.Enum):
    cholqr = "cholqr"     # sketch-preconditioned CholQR (default, MXU)
    hqr = "hqr"           # Householder panel QR (more robust, slower)


@dataclasses.dataclass(frozen=True)
class BQRRPConfig:
    block_size: int = 256
    d_factor: float = 1.25        # sketch rows d = d_factor * block_size
    qr_tall: QRTall = QRTall.cholqr
    panel_reorth: bool = True     # second CholQR pass on each panel
    block_reorth: bool = True     # BCGS2: re-project panel against Q
                                  # (Householder-grade orthogonality; ~+50%
                                  # FLOPs — turn off for max throughput)
    final_orth: int = 1           # CholQR passes on the finished Q (each
                                  # ~2·m·K² FLOPs): the factorization
                                  # QR = A[:,J] is exact under GS drift, so
                                  # a final pass on the near-orthonormal Q
                                  # recovers machine-grade orthogonality
                                  # far cheaper than per-block re-orth


def _safe_triu_diag(R, dtype):
    """Replace (near-)zero diagonal entries so triangular solves stay
    finite; deficient columns produce garbage Q beyond the returned rank,
    as in the reference (a-posteriori rank logic, rl_cqrrpt.hh:311-332)."""
    eps = jnp.finfo(dtype).eps
    d = jnp.diag(R)
    ref = jnp.max(jnp.abs(d)) * eps + eps
    dsafe = jnp.where(jnp.abs(d) > ref, d, ref)
    return R - jnp.diag(d) + jnp.diag(dsafe)


@partial(jax.jit, static_argnames=("cfg", "precision"))
def bqrrp(A: jax.Array, cfg: BQRRPConfig, state: RNGState,
          precision=STABLE_PRECISION):
    """Blocked randomized QRCP of A (any aspect ratio): A[:, J] ≈ Q R.

    Returns ``(Q, R, J, rank, fail, next_state)``:
      Q (m, K) orthonormal, R (K, n) upper-trapezoidal, J (n,) int32,
      K = min(m, n) (must be a multiple of ``cfg.block_size``),
      ``rank`` an int32 upper-bound estimate from diag(R) (the reference's
      field ``rank``, rl_bqrrp.hh:132-134), ``fail`` CholQR breakdown flag.
    """
    m, n = A.shape
    b = cfg.block_size
    K = min(m, n)
    assert K % b == 0, f"min(m,n)={K} must be a multiple of block_size={b}"
    nblocks = K // b
    d = int(cfg.d_factor * b)
    dtype = A.dtype

    # one-time sketch (rl_bqrrp.hh:306-312)
    key, state = state.spawn()
    S = jax.random.normal(key, (d, m), dtype=dtype) / math.sqrt(d)
    A_sk0 = jnp.matmul(S, A, precision=precision)

    Q0 = jnp.zeros((m, K), dtype)
    R0 = jnp.zeros((K, n), dtype)
    J0 = jnp.arange(n, dtype=jnp.int32)
    cols = jnp.arange(n)

    def block(i, carry):
        A_work, A_sk, Q, R, J, fail = carry
        c = i * b

        # -- qrcp_wide: LU-based pivot selection on the live sketch ------
        active = cols >= c
        A_sk_m = A_sk * active[None, :].astype(dtype)
        _, _, perm_lu = jax.lax.linalg.lu(A_sk_m.T)   # (n,) row perm of A_skᵀ
        chosen = perm_lu[:b]
        # composite sort key: retired cols stay; chosen move to the panel
        # in LU order; the rest keep relative order.
        pos = jnp.zeros((n,), jnp.int32).at[chosen].set(
            jnp.arange(b, dtype=jnp.int32))
        is_chosen = jnp.zeros((n,), bool).at[chosen].set(True)
        key_ = jnp.where(cols < c, cols,
                         jnp.where(is_chosen, n + pos, 2 * n + cols))
        perm = jnp.argsort(key_)
        A_work = jnp.take(A_work, perm, axis=1)
        A_sk = jnp.take(A_sk, perm, axis=1)
        R = jnp.take(R, perm, axis=1)
        J = jnp.take(J, perm)

        # -- panel QR: sketch-preconditioned CholQR ----------------------
        A_sk_panel = jax.lax.dynamic_slice(A_sk, (0, c), (d, b))
        panel = jax.lax.dynamic_slice(A_work, (0, c), (m, b))
        if cfg.block_reorth:
            # BCGS2: second Gram-Schmidt pass against the committed basis
            # (single-pass block GS drifts like u·cond²; the correction
            # coefficients are folded into R's earlier rows so the
            # factorization stays exact).
            proj = jnp.matmul(Q.T, panel, precision=precision)   # (K, b)
            panel = panel - jnp.matmul(Q, proj, precision=precision)
            Rpan = jax.lax.dynamic_slice(R, (0, c), (R.shape[0], b))
            R = jax.lax.dynamic_update_slice(R, Rpan + proj, (0, c))
        if cfg.qr_tall == QRTall.cholqr:
            _, R_sk = qr_econ(A_sk_panel)
            R_sk = _safe_triu_diag(R_sk, dtype)
            Q_panel, R11, failp = preconditioned_cholqr(panel, R_sk,
                                                        precision)
            if cfg.panel_reorth:
                Q_panel, R2, f2 = cholqr(Q_panel, precision)
                R11 = jnp.matmul(R2, R11, precision=precision)
                failp = failp | f2
            # Householder fallback if CholQR broke down on this panel
            Q_panel, R11 = jax.lax.cond(
                failp, lambda p, q, r: qr_econ(p),
                lambda p, q, r: (q, r), panel, Q_panel, R11)
        else:
            Q_panel, R11 = qr_econ(panel)
            failp = jnp.asarray(False)
        R11 = jnp.triu(R11)

        # -- trailing update (apply_trans_q) -----------------------------
        T = jnp.matmul(Q_panel.T, A_work, precision=precision)   # (b, n)
        T = jnp.where(active[None, :], T, 0.0)
        # exact R₁₁ in the panel columns
        T = jax.lax.dynamic_update_slice(T, R11, (0, c))
        A_work = A_work - jnp.matmul(Q_panel, T, precision=precision)

        # -- sketch downdate (rl_bqrrp.hh:630-650 equivalent) ------------
        SQ = jax.lax.linalg.triangular_solve(
            _safe_triu_diag(R11, dtype), A_sk_panel,
            left_side=False, lower=False)            # A_sk_panel · R₁₁⁻¹
        A_sk = A_sk - jnp.matmul(SQ, T, precision=precision)

        # -- commit block outputs ---------------------------------------
        Q = jax.lax.dynamic_update_slice(Q, Q_panel, (0, c))
        R = jax.lax.dynamic_update_slice(R, T, (c, 0))
        return A_work, A_sk, Q, R, J, fail | failp

    carry = (A, A_sk0, Q0, R0, J0, jnp.asarray(False))
    _, _, Q, R, J, fail = jax.lax.fori_loop(0, nblocks, block, carry)

    for _ in range(cfg.final_orth):
        Q, R2, f2 = cholqr(Q, precision)
        R = jnp.matmul(R2, R, precision=precision)
        fail = fail | f2

    diag = jnp.diag(R[:, :K])
    eps = jnp.finfo(dtype).eps
    tol = jnp.abs(diag[0]) * jnp.sqrt(jnp.asarray(eps, dtype))
    rank = util.naive_rank_est(diag, tol)
    return Q, R, J, rank, fail, state
