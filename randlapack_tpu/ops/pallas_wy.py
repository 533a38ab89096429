"""Pallas TPU kernels for the factored-BQRRP trailing WY update —
the loop's dominant cost (attribution-probed: the per-block small ops are
~free; the masked trailing GEMMs run ~2× off the square-GEMM peak).

Fuses the live-column mask into the GEMM operand load/store so the
update runs in exactly two passes over the window:

    Wk = Vᵀ·(A ⊙ live)         (reduction-grid GEMM, mask fused in)
    A ← A − (V·Z) ⊙ live       (GEMM + masked subtract, one read/write)

with Z = Tᵀ·Wk computed between them by XLA (b×b-by-b×w, cheap).
jnp fallbacks cover non-divisible shapes and non-TPU backends; the
kernels are exercised in interpret mode by the CPU tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HP = jax.lax.Precision.HIGHEST


def _divisible(m, w, b, tm, tn):
    return m % tm == 0 and w % tn == 0 and b % 128 == 0


def masked_vt_a_reference(V, A, mask, precision=HP):
    return jnp.matmul(V.T, A * mask[None, :], precision=precision)


def a_minus_vz_masked_reference(A, V, Z, mask, precision=HP):
    return A - jnp.matmul(V, Z, precision=precision) * mask[None, :]


def bf16_3x_matmul(X, Y):
    """Explicit bf16-split emulation of the TPU's DEFAULT f32 matmul
    precision (the bf16_3x decomposition): split each operand into a
    bfloat16 high part and a bfloat16 residual, take the three dominant
    cross products in bf16 inputs with f32 accumulation. Used for
    CPU-side quality studies of mixed-precision trailing updates
    (BQRRPConfig.trailing_precision="bf16_3x_emul") — on CPU the
    "default" precision is true f32, so the TPU error model must be
    emulated to be measured."""
    dtype = X.dtype
    xh = X.astype(jnp.bfloat16)
    xl = (X - xh.astype(dtype)).astype(jnp.bfloat16)
    yh = Y.astype(jnp.bfloat16)
    yl = (Y - yh.astype(dtype)).astype(jnp.bfloat16)

    def f(a, b):
        return jnp.matmul(a, b, preferred_element_type=jnp.float32)

    return (f(xh, yh) + (f(xh, yl) + f(xl, yh))).astype(dtype)


def masked_vt_a_mixed(V, A, mask, trailing_precision, precision=HP,
                      use_pallas="auto"):
    """W = Vᵀ·(A ⊙ mask) at the configured trailing precision.
    "highest" keeps the routed (Pallas-capable) HIGHEST path; "default"
    drops to XLA default precision (bf16_3x on TPU) on the jnp path;
    "bf16_3x_emul" emulates the TPU default explicitly (CPU studies)."""
    if trailing_precision == "highest":
        return masked_vt_a_routed(V, A, mask, precision, use_pallas)
    if trailing_precision == "default":
        return jnp.matmul(V.T, A * mask[None, :], precision=None)
    if trailing_precision == "high":
        return jnp.matmul(V.T, A * mask[None, :],
                          precision=jax.lax.Precision.HIGH)
    return bf16_3x_matmul(V.T, A * mask[None, :])


def a_minus_vz_masked_mixed(A, V, Z, mask, trailing_precision,
                            precision=HP, use_pallas="auto"):
    """A − (V·Z) ⊙ mask at the configured trailing precision (see
    masked_vt_a_mixed)."""
    if trailing_precision == "highest":
        return a_minus_vz_masked_routed(A, V, Z, mask, precision,
                                        use_pallas)
    if trailing_precision == "default":
        return A - jnp.matmul(V, Z, precision=None) * mask[None, :]
    if trailing_precision == "high":
        return A - jnp.matmul(V, Z,
                              precision=jax.lax.Precision.HIGH) \
            * mask[None, :]
    return A - bf16_3x_matmul(V, Z) * mask[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_vt_a(V: jax.Array, A: jax.Array, mask: jax.Array,
                interpret: bool = False) -> jax.Array:
    """Wk = Vᵀ·(A ⊙ mask) with the mask fused into the A load.

    V (m, b), A (m, w), mask (w,) → (b, w). Requires m % 512 == 0,
    w % 512 == 0, b % 128 == 0 (callers fall back otherwise).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, b = V.shape
    w = A.shape[1]
    TM = TN = 512
    mask2 = mask.reshape(1, w)

    def kern(v_ref, a_ref, mk_ref, o_ref):
        mi = pl.program_id(1)

        @pl.when(mi == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        am = a_ref[...] * mk_ref[...]
        o_ref[...] += jnp.dot(v_ref[...].T, am, precision=HP,
                              preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(w // TN, m // TM),          # reduction dim LAST (fastest)
        in_specs=[
            pl.BlockSpec((TM, b), lambda wi, mi: (mi, 0)),
            pl.BlockSpec((TM, TN), lambda wi, mi: (mi, wi)),
            pl.BlockSpec((1, TN), lambda wi, mi: (0, wi)),
        ],
        out_specs=pl.BlockSpec((b, TN), lambda wi, mi: (0, wi)),
        out_shape=jax.ShapeDtypeStruct((b, w), A.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(V, A, mask2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def a_minus_vz_masked(A: jax.Array, V: jax.Array, Z: jax.Array,
                      mask: jax.Array, interpret: bool = False) -> jax.Array:
    """A − (V·Z) ⊙ mask in one pass over A (GEMM epilogue fused).

    A (m, w), V (m, b), Z (b, w), mask (w,) → (m, w).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, b = V.shape
    w = A.shape[1]
    TM = TN = 512
    mask2 = mask.reshape(1, w)

    def kern(a_ref, v_ref, z_ref, mk_ref, o_ref):
        upd = jnp.dot(v_ref[...], z_ref[...], precision=HP,
                      preferred_element_type=jnp.float32)
        o_ref[...] = a_ref[...] - upd * mk_ref[...]

    return pl.pallas_call(
        kern,
        grid=(m // TM, w // TN),
        in_specs=[
            pl.BlockSpec((TM, TN), lambda mi, wi: (mi, wi)),
            pl.BlockSpec((TM, b), lambda mi, wi: (mi, 0)),
            pl.BlockSpec((b, TN), lambda mi, wi: (0, wi)),
            pl.BlockSpec((1, TN), lambda mi, wi: (0, wi)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda mi, wi: (mi, wi)),
        out_shape=jax.ShapeDtypeStruct((m, w), A.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(A, V, Z, mask2)


def _route(m, w, b, use_pallas, interpret):
    # b > 512 (e.g. update_defer aggregates) exceeds the kernels' scoped
    # VMEM at the 512×512 tiling (measured: 20.2M > 16M at b=1024) — XLA
    # fuses the mask equally well there (round-2 measurement), so route
    # wide aggregates to the jnp path instead of shrinking tiles
    ok = _divisible(m, w, b, 512, 512) and b <= 512
    on_tpu = jax.default_backend() not in ("cpu",)
    return not (use_pallas == "never" or not ok
                or (not on_tpu and not interpret))


def masked_vt_a_routed(V, A, mask, precision=HP, use_pallas="auto",
                       interpret: bool = False):
    """Wk = Vᵀ·(A ⊙ mask), Pallas when shapes divide on TPU else jnp."""
    m, b = V.shape
    if _route(m, A.shape[1], b, use_pallas, interpret):
        return masked_vt_a(V, A, mask, interpret=interpret)
    return masked_vt_a_reference(V, A, mask, precision)


def a_minus_vz_masked_routed(A, V, Z, mask, precision=HP, use_pallas="auto",
                             interpret: bool = False):
    """A − (V·Z) ⊙ mask, Pallas when shapes divide on TPU else jnp."""
    m, b = V.shape
    if _route(m, A.shape[1], b, use_pallas, interpret):
        return a_minus_vz_masked(A, V, Z, mask, interpret=interpret)
    return a_minus_vz_masked_reference(A, V, Z, mask, precision)


def trailing_wy_update(A, V, T, mask, precision=HP, use_pallas="auto",
                       interpret: bool = False):
    """The full fused trailing update: A ← A − V·(Tᵀ·(Vᵀ·(A⊙mask)))⊙mask.

    ``use_pallas="auto"`` routes to the kernels on TPU when shapes
    divide; "never" forces the jnp path (the numerics are identical up to
    accumulation order)."""
    m, b = V.shape
    w = A.shape[1]
    ok = _divisible(m, w, b, 512, 512)
    on_tpu = jax.default_backend() not in ("cpu",)
    if use_pallas == "never" or not ok or (not on_tpu and not interpret):
        Wk = masked_vt_a_reference(V, A, mask, precision)
        Z = jnp.matmul(T.T, Wk, precision=precision)
        return a_minus_vz_masked_reference(A, V, Z, mask, precision)
    Wk = masked_vt_a(V, A, mask, interpret=interpret)
    Z = jnp.matmul(T.T, Wk, precision=precision)
    return a_minus_vz_masked(A, V, Z, mask, interpret=interpret)
