"""Pallas TPU kernels for the framework's hot memory-bound ops.

Two kernels (SURVEY.md §7 "pallas for the kernels XLA can't fuse well"):

* ``kernel_matmat`` — (K(X,X) + μI)·V for the squared-exponential kernel
  without materializing any n×block slab of K in HBM: each grid step
  builds a TM×TN kernel tile in VMEM (distance GEMM + exp on the VPU) and
  immediately contracts it with V on the MXU. Replaces the reference's
  OpenMP-blocked entrywise kernel (rl_pdkernels.hh:133) as KRILL's hot op.

* ``gaussian_sketch`` — S·A with the d×m Gaussian S generated INSIDE the
  kernel from the TPU PRNG (Box-Muller over ``prng_random_bits``), so the
  sketch operator never exists in HBM — for tall A (m ~ 1e5+) that removes
  a GB-scale buffer and its bandwidth. Deterministic in (seed, tile), but
  a different stream than jax.random's (documented).

Both have jnp fallbacks (``*_reference``) used on non-TPU backends and in
tests (interpret mode exercises the kernels themselves on CPU).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..config import STABLE_PRECISION


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


# --------------------------------------------------------------------------
# fused squared-exp kernel matmat
# --------------------------------------------------------------------------

def kernel_matmat_reference(X, V, bandwidth, precision=STABLE_PRECISION):
    d2 = (jnp.sum(X * X, axis=0)[:, None]
          + jnp.sum(X * X, axis=0)[None, :]
          - 2.0 * jnp.matmul(X.T, X, precision=precision))
    K = jnp.exp(-jnp.maximum(d2, 0.0) / (2.0 * bandwidth ** 2))
    return jnp.matmul(K, V, precision=precision)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kernel_matmat(X: jax.Array, V: jax.Array, bandwidth,
                  interpret: bool = False) -> jax.Array:
    """K(X, X)·V for the squared-exp kernel, fully fused in VMEM.

    X: (d, n) points (d ≤ 64 after padding), V: (n, s). n must be a
    multiple of 256 (pad externally). Returns (n, s) in X.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, n = X.shape
    s = V.shape[1]
    TM = TN = 256
    assert n % TM == 0, f"n={n} must be a multiple of {TM}"
    bw = jnp.asarray(bandwidth, X.dtype)
    inv2s2 = (1.0 / (2.0 * bw * bw)).reshape(1, 1)

    def kern(inv_ref, xi_ref, xj_ref, vj_ref, o_ref):
        j = pl.program_id(1)
        xi = xi_ref[:]                       # (d, TM)
        xj = xj_ref[:]                       # (d, TN)
        ni = jnp.sum(xi * xi, axis=0)        # (TM,)
        nj = jnp.sum(xj * xj, axis=0)        # (TN,)
        cross = jnp.dot(xi.T, xj, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(ni[:, None] + nj[None, :] - 2.0 * cross, 0.0)
        kt = jnp.exp(-d2 * inv_ref[0, 0])
        contrib = jnp.dot(kt, vj_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

        @pl.when(j == 0)
        def _():
            o_ref[:] = contrib.astype(o_ref.dtype)

        @pl.when(j > 0)
        def _():
            o_ref[:] = o_ref[:] + contrib.astype(o_ref.dtype)

    grid = (n // TM, n // TN)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, s), X.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((d, TM), lambda i, j: (0, i)),
            pl.BlockSpec((d, TN), lambda i, j: (0, j)),
            pl.BlockSpec((TN, s), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TM, s), lambda i, j: (i, 0)),
        interpret=interpret,
    )(inv2s2, X, X, V)


def kernel_matmat_auto(X, V, bandwidth, precision=STABLE_PRECISION):
    """Pallas on TPU when shapes allow, jnp fallback otherwise."""
    d, n = X.shape
    if _on_tpu() and n % 256 == 0 and d <= 64:
        return kernel_matmat(X, V, bandwidth)
    return kernel_matmat_reference(X, V, bandwidth, precision)


# --------------------------------------------------------------------------
# fused generate+apply Gaussian sketch
# --------------------------------------------------------------------------

def gaussian_sketch_reference(A, d, seed, precision=STABLE_PRECISION):
    """jnp fallback: materializes S (same distribution family, different
    stream than the Pallas kernel)."""
    key = jax.random.key(seed)
    m = A.shape[0]
    S = jax.random.normal(key, (d, m), dtype=A.dtype) / math.sqrt(d)
    return jnp.matmul(S, A, precision=precision)


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def gaussian_sketch(A: jax.Array, d: int, seed, interpret: bool = False):
    """S·A (d×m · m×n) with S ~ N(0, 1/d) generated in-kernel.

    m must be a multiple of 512 and d a multiple of 8. One pass over A —
    S never touches HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = A.shape
    TK = 512
    assert m % TK == 0, f"m={m} must be a multiple of {TK}"
    assert d % 8 == 0, f"d={d} must be a multiple of 8"
    scale = float(1.0 / math.sqrt(d))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    def kern(seed_ref, a_ref, o_ref):
        k = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + k)     # per-tile independent stream
        bits1 = pltpu.prng_random_bits((d, TK))
        bits2 = pltpu.prng_random_bits((d, TK))
        # Box-Muller from 23 low bits (mask keeps int32 nonnegative —
        # uint32->f32 casts are unsupported in Mosaic)
        u1 = (bits1 & 0x7FFFFF).astype(jnp.float32) * (1.0 / 8388608.0)
        u2 = (bits2 & 0x7FFFFF).astype(jnp.float32) * (1.0 / 8388608.0)
        u1 = jnp.maximum(u1, 1e-7)
        z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
            2.0 * math.pi * u2)
        s_tile = (z * scale).astype(a_ref.dtype)     # (d, TK)
        contrib = jnp.dot(s_tile, a_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

        @pl.when(k == 0)
        def _():
            o_ref[:] = contrib.astype(o_ref.dtype)

        @pl.when(k > 0)
        def _():
            o_ref[:] = o_ref[:] + contrib.astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((d, n), A.dtype),
        grid=(m // TK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TK, n), lambda k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((d, n), lambda k: (0, 0)),
        interpret=interpret,
    )(seed, A)
