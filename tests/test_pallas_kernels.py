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
