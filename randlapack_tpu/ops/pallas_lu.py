"""Pallas TPU kernel for the adaptive-sign unpivoted LU (``getrfnp``).

``ops/householder.py::getrfnp`` (the LAPACK ``launhr_col_getrfnp2``
analogue behind ``orhr_col``) is trace-time recursive: 16 leaf fori_loops
of 32 rank-1 steps each on 32² tiles plus ~31 internal trsm/GEMM nodes
for a 512² input. On this backend that chain costs ~2.5-3 ms per call —
measured as the LARGEST serial cost of the factored-BQRRP block loop
(~46 ms of a 242 ms total at 8192², round-3 attribution probes: the
round-2 "trailing-GEMM-bound" conclusion was an artifact of stubs that
left this chain in every variant).

Here the whole elimination runs as ONE VMEM-resident kernel: the b×b
Schur complement stays on-chip, each step is ~5 VPU passes over b², and
the adaptive sign choice (s_j = −sign of the *current* Schur diagonal —
the property that keeps every pivot ≥ 1 on orthonormal inputs) is a
scalar select. Identical math to the jnp leaf loop, since the recursion
is just a blocking of the same elimination.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HP = jax.lax.Precision.HIGHEST

_VMEM_LU_BYTES = 8 * 2**20


def _lu_fits(k, dtype):
    if dtype != jnp.float32:
        return False
    k_pad = max(-(-k // 8) * 8, 8) * max(-(-k // 128) * 128, 128)
    return 2 * k_pad * 4 <= _VMEM_LU_BYTES


@functools.partial(jax.jit, static_argnames=("interpret",))
def getrfnp_pallas(M: jax.Array, interpret: bool = False):
    """Adaptive-sign unpivoted LU of a square f32 matrix in one kernel.
    Returns ``(F, s)`` in ``getrfnp``'s packed layout (unit-L strict
    lower + U upper; s the diagonal sign modification).

    Structured as a sequential ``grid=(k,)`` kernel (one elimination
    step per grid index, the Schur complement persisting in VMEM
    scratch) rather than an in-kernel fori_loop: kernels with grid=()
    and a long internal loop hang the XLA compile when the pallas_call
    sits inside an outer lax.fori_loop on this backend (measured: the
    same kernel compiles in 14.5 s standalone and never finishes inside
    the BQRRP block loop), while the grid form matches the in-loop
    pattern ops/pallas_wy.py already uses successfully."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = M.shape[0]
    dtype = M.dtype
    k_pad = -(-k // 128) * 128

    def kern(m_ref, f_ref, s_ref, w_s, sv_s):
        j = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        @pl.when(j == 0)
        def _():
            w_s[...] = m_ref[...]
            sv_s[...] = jnp.zeros_like(sv_s)

        F = w_s[...]
        d = jnp.sum(jnp.where((rows == j) & (cols == j), F, 0.0))
        sj = jnp.where(d >= 0.0, -1.0, 1.0).astype(dtype)
        piv = d - sj
        col = jnp.sum(jnp.where(cols == j, F, 0.0), axis=1,
                      keepdims=True)                    # (k, 1)
        row = jnp.sum(jnp.where(rows == j, F, 0.0), axis=0,
                      keepdims=True)                    # (1, k)
        col_s = jnp.where(rows > j, col / piv, 0.0)
        row_m = jnp.where(cols > j, row, 0.0)
        F = F - col_s * row_m
        F = jnp.where((rows == j) & (cols == j), piv, F)
        F = jnp.where((rows > j) & (cols == j), col_s, F)
        w_s[...] = F
        sc = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
        sv_s[...] = jnp.where(sc == j, sj, sv_s[...])

        @pl.when(j == k - 1)
        def _():
            f_ref[...] = w_s[...]
            s_ref[...] = sv_s[...]

    F, s = pl.pallas_call(
        kern,
        grid=(k,),
        in_specs=[pl.BlockSpec((k, k), lambda j: (0, 0))],
        out_specs=[
            pl.BlockSpec((k, k), lambda j: (0, 0)),
            pl.BlockSpec((1, k_pad), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, k), dtype),
            jax.ShapeDtypeStruct((1, k_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, k), dtype),
            pltpu.VMEM((1, k_pad), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(M)
    return F, s[0, :k]


def getrfnp_routed(M: jax.Array, base: int = 32,
                   use_pallas: str = "auto", interpret: bool = False):
    """``getrfnp`` with the VMEM-resident kernel on TPU/f32 (any square
    size that fits); the recursive jnp path otherwise."""
    from .householder import getrfnp
    k = M.shape[0]
    on_tpu = jax.default_backend() not in ("cpu",)
    ok = _lu_fits(k, M.dtype) and (on_tpu or interpret)
    if use_pallas == "never" or not ok:
        return getrfnp(M, base)
    return getrfnp_pallas(M, interpret=interpret)
