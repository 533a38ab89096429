"""Pallas kernel tests — run in interpret mode on CPU so the kernel code
itself (grids, block specs, accumulation) is exercised without a TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randlapack_tpu.ops.pallas_kernels import (gaussian_sketch,
                                               kernel_matmat,
                                               kernel_matmat_reference)


class TestKernelMatmat:
    def test_matches_reference(self):
        d, n, s = 8, 512, 128
        X = jax.random.normal(jax.random.key(0), (d, n), jnp.float32)
        V = jax.random.normal(jax.random.key(1), (n, s), jnp.float32)
        out = kernel_matmat(X, V, 1.3, interpret=True)
        ref = kernel_matmat_reference(X, V, 1.3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-5)

    def test_bandwidth_traced(self):
        d, n, s = 8, 256, 128
        X = jax.random.normal(jax.random.key(2), (d, n), jnp.float32)
        V = jax.random.normal(jax.random.key(3), (n, s), jnp.float32)

        @jax.jit
        def f(bw):
            return kernel_matmat(X, V, bw, interpret=True)

        out = f(jnp.float32(0.7))
        ref = kernel_matmat_reference(X, V, 0.7)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-5)


class TestGaussianSketch:
    def test_statistics(self):
        m, n, d = 2048, 256, 64
        A = jax.random.normal(jax.random.key(4), (m, n), jnp.float32)
        try:
            out = gaussian_sketch(A, d, 11, interpret=True)
        except Exception as e:  # interpret-mode PRNG unsupported somewhere
            pytest.skip(f"interpret-mode prng unavailable: {e}")
        # E[||SA||_F] = ||A||_F
        ratio = float(jnp.linalg.norm(out) / jnp.linalg.norm(A))
        assert abs(ratio - 1.0) < 0.1
        # determinism
        out2 = gaussian_sketch(A, d, 11, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        # different seed differs
        out3 = gaussian_sketch(A, d, 12, interpret=True)
        assert not np.allclose(np.asarray(out), np.asarray(out3))


class TestPallasWY:
    """Fused masked-WY trailing update kernels (ops/pallas_wy.py) vs the
    jnp reference, in interpret mode."""

    def test_masked_vt_a(self):
        from randlapack_tpu.ops.pallas_wy import (masked_vt_a,
                                                  masked_vt_a_reference)
        rng = np.random.default_rng(0)
        V = jnp.asarray(rng.standard_normal((1024, 512)), jnp.float32)
        A = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
        mask = jnp.asarray(rng.random(1024) > 0.3, jnp.float32)
        o1 = masked_vt_a(V, A, mask, interpret=True)
        o2 = masked_vt_a_reference(V, A, mask)
        assert float(jnp.max(jnp.abs(o1 - o2))) < 1e-3 * float(
            jnp.max(jnp.abs(o2)))

    def test_full_trailing_update_and_fallback(self):
        from randlapack_tpu.ops.pallas_wy import (
            trailing_wy_update, a_minus_vz_masked_reference,
            masked_vt_a_reference)
        rng = np.random.default_rng(1)
        V = jnp.asarray(rng.standard_normal((1024, 512)), jnp.float32)
        A = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
        T = jnp.asarray(rng.standard_normal((512, 512)), jnp.float32) / 512
        mask = jnp.asarray(rng.random(1024) > 0.5, jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        Wk = masked_vt_a_reference(V, A, mask)
        ref = a_minus_vz_masked_reference(
            A, V, jnp.matmul(T.T, Wk, precision=hp), mask)
        out_k = trailing_wy_update(A, V, T, mask, interpret=True)
        assert float(jnp.max(jnp.abs(out_k - ref))) < 2e-3
        # non-divisible shapes take the jnp fallback transparently
        out_f = trailing_wy_update(A[:1000], V[:1000], T, mask)
        assert out_f.shape == (1000, 1024)
