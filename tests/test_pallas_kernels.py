"""Pallas kernel oracle tests (interpreter mode on CPU).

The reference's test pattern: every SIMD kernel gets checked against a naive
oracle, including remainder/tail shapes (SURVEY.md section 4). Here the
oracle is the jnp implementation each kernel replaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama2_tpu.ops.pallas.quant_matmul import quant_matmul
from llama2_tpu.quant.q8 import dequantize, quantize


@pytest.mark.parametrize(
    "M,K,N,G",
    [
        (1, 256, 384, 64),  # decode matvec
        (3, 256, 384, 64),  # odd rows (pad path)
        (16, 512, 512, 64),
        (5, 128, 128, 128),  # single group per tile
        (2, 768, 288, 64),  # N not a multiple of 512
        (1, 288, 768, 32),  # stories15M dims (G=32 divides 288)
    ],
)
def test_quant_matmul_vs_oracle(M, K, N, G):
    rng = np.random.default_rng(M * 1000 + N)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    w = rng.standard_normal((K, N)).astype(np.float32)
    t = quantize(w, G)
    got = np.asarray(quant_matmul(x, t, interpret=True))
    want = np.asarray(x @ dequantize(t))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_quant_matmul_batched_lead_dims():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
    w = rng.standard_normal((128, 256)).astype(np.float32)
    t = quantize(w, 64)
    got = np.asarray(quant_matmul(x, t, interpret=True))
    want = np.asarray(x @ dequantize(t))
    assert got.shape == (2, 3, 256)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_quant_matmul_rejects_stacked():
    t = quantize(np.ones((2, 64, 8), dtype=np.float32))
    with pytest.raises(ValueError):
        quant_matmul(jnp.ones((1, 64)), t, interpret=True)
