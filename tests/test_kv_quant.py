"""INT8 KV cache: quantizer roundtrip, kernel vs oracle, generation quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config, random_params

from llama2_tpu.ops import xla as ops
from llama2_tpu.ops.pallas.attention_q8 import (
    dequantize_kv,
    flash_decode_attention_q8,
    quantize_kv_rows,
)


def test_quantize_kv_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((3, 4, 17, 32), dtype=np.float32))
    q, s = quantize_kv_rows(rows)
    assert q.dtype == jnp.int8 and s.shape == (3, 4, 17)
    back = dequantize_kv(q, s)
    # symmetric per-row int8: error <= scale/2 = max|row| / 254
    amax = np.abs(np.asarray(rows)).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(back) - np.asarray(rows)) <= amax / 254 + 1e-7).all()


def test_quantize_zero_row_is_safe():
    q, s = quantize_kv_rows(jnp.zeros((1, 1, 2, 8)))
    assert not np.isnan(np.asarray(dequantize_kv(q, s))).any()


@pytest.mark.parametrize("pos", [0, 7, 31])
@pytest.mark.parametrize("gqa", [False, True])
def test_q8_flash_decode_vs_dequant_oracle(pos, gqa):
    B, S, hs = 2, 32, 16
    KVH = 2
    H = 4 if gqa else KVH
    rng = np.random.default_rng(pos + 10 * gqa)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hs), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, hs), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, hs), dtype=np.float32))
    k8, ks = quantize_kv_rows(k)
    v8, vs = quantize_kv_rows(v)

    got = flash_decode_attention_q8(q, k8, ks, v8, vs, pos)
    want = ops.attention(q, dequantize_kv(k8, ks), dequantize_kv(v8, vs), pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


@pytest.mark.parametrize("T", [2, 4])
def test_q8_flash_window_vs_oracle(T):
    """T>1 verify-window rows: row t attends [0, last - (T-1) + t]."""
    B, S, hs, KVH, H = 1, 32, 16, 2, 4
    last = 19
    rng = np.random.default_rng(T)
    q = jnp.asarray(rng.standard_normal((B, T, H, hs), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, hs), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, hs), dtype=np.float32))
    k8, ks = quantize_kv_rows(k)
    v8, vs = quantize_kv_rows(v)

    got = flash_decode_attention_q8(q, k8, ks, v8, vs, last)
    kd, vd = dequantize_kv(k8, ks), dequantize_kv(v8, vs)
    # oracle row-by-row with single-query calls
    for t in range(T):
        want = ops.attention(q[:, t : t + 1], kd, vd, last - (T - 1) + t)
        np.testing.assert_allclose(
            np.asarray(got[:, t : t + 1]), np.asarray(want), atol=3e-2,
            err_msg=f"row {t}",
        )


def test_generation_with_q8_cache_tracks_fp32():
    """Full argmax generation with the int8 cache: tokens should track the
    fp32-cache run closely (the cache noise is ~0.4% per row)."""
    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.runtime.generator import Generator

    config = tiny_config()
    params = random_params(config)
    gen = GenerationConfig(temperature=0.0, steps=24, seed=0)

    ref = Generator(config, params).generate([7, 12], gen).tokens
    got = Generator(config, params, kv_quant=True).generate([7, 12], gen).tokens
    agree = sum(a == b for a, b in zip(got, ref)) / max(len(ref), 1)
    assert agree >= 0.75, f"{agree=} {got=} {ref=}"


def test_q8_cache_memory_shapes():
    from llama2_tpu.models.llama import init_cache

    config = tiny_config()
    c = init_cache(config, 2, kv_quant=True)
    assert c["k"].dtype == jnp.int8
    assert c["k_scale"].shape == c["k"].shape[:-1]
    # 4x smaller KV payload (scales add 1/hs overhead)
    dense = init_cache(config, 2)
    assert c["k"].nbytes * 4 == dense["k"].nbytes


@pytest.mark.parametrize("S", [96, 160, 200])
def test_q8_block_picker_awkward_seq_lens(S):
    """Lane-aligned-but-awkward S (e.g. seq_len + speculative pad) must not
    crash the block picker (a halving search once reached S % 0)."""
    B, KVH, H, hs = 1, 2, 2, 16
    rng = np.random.default_rng(S)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hs), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, hs), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, hs), dtype=np.float32))
    k8, ks = quantize_kv_rows(k)
    v8, vs = quantize_kv_rows(v)
    got = flash_decode_attention_q8(q, k8, ks, v8, vs, S - 1)
    want = ops.attention(q, dequantize_kv(k8, ks), dequantize_kv(v8, vs), S - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)
