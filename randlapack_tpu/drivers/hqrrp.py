"""HQRRP — Householder QR with randomized pivoting (reference:
RandLAPACK/drivers/rl_hqrrp.hh: hqrrp() :812; the
Martinsson/Quintana-Ortí/Heavner/van de Geijn algorithm with WY-block
updates and Gaussian sketch downdating).

TPU mapping: the blocked randomized-pivoting engine is shared with BQRRP
(same sketch-downdating skeleton, SURVEY.md §3.3); HQRRP is the
Householder-panel instantiation (``qr_tall=hqr``, the reference's
``GEQRF_mod_WY`` path) with GEQP3-compatible output available through the
Householder reconstruction adapter. The reference's raw-Fortran WY
machinery (dlarfb etc., rl_hqrrp.hh:74-169) is replaced by explicit-Q
GEMM updates, which is how a WY "apply block reflector" maps to the MXU
anyway (a WY application IS two GEMMs).
"""
from __future__ import annotations

import dataclasses

import jax

from ..config import STABLE_PRECISION
from ..rng import RNGState
from .bqrrp import BQRRPConfig, QRTall, bqrrp
from ..ops.householder import householder_reconstruct


@dataclasses.dataclass(frozen=True)
class HQRRPConfig:
    block_size: int = 128
    oversample: int = 10          # the reference's p (sketch rows = b + p)


def hqrrp(A: jax.Array, cfg: HQRRPConfig, state: RNGState,
          precision=STABLE_PRECISION):
    """Randomized-pivoting Householder QR: A[:, J] ≈ Q R.

    Returns ``(Q, R, J, rank, fail, next_state)`` — same contract as
    :func:`bqrrp`.
    """
    d_factor = (cfg.block_size + cfg.oversample) / cfg.block_size
    bcfg = BQRRPConfig(block_size=cfg.block_size, d_factor=d_factor,
                       qr_tall=QRTall.hqr)
    return bqrrp(A, bcfg, state, precision)


def hqrrp_lapack_format(A: jax.Array, cfg: HQRRPConfig, state: RNGState,
                        precision=STABLE_PRECISION):
    """GEQP3-compatible output: ``(packed, taus, R, J, next_state)`` with
    the implicit-Q reflector representation (the reference's native output
    format)."""
    Q, R, J, rank, fail, state = hqrrp(A, cfg, state, precision)
    packed, taus, signs = householder_reconstruct(Q, precision)
    # fold the reconstruction signs into R so H_1...H_k · R' = A[:, J]
    R = signs[:, None] * R
    return packed, taus, R, J, state
