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


def test_q8_fused_attention_block_vs_stacked():
    """The glue-fused kernel (RoPE + quantize + append + attend in one
    launch, ops/pallas/attention_q8.py::flash_decode_attention_q8_fused)
    must reproduce the composed path: XLA apply_rope + quantize_kv_rows +
    flash_decode_attention_q8_stacked."""
    from llama2_tpu.ops.pallas.attention_q8 import (
        flash_decode_attention_q8_fused,
        flash_decode_attention_q8_stacked,
    )

    L, B, KVH, S, hs, H = 3, 2, 2, 256, 128, 4
    rng = np.random.default_rng(1)
    pos = jnp.asarray([37, 130], jnp.int32)
    layer = 1
    k8, ks = quantize_kv_rows(
        jnp.asarray(rng.standard_normal((L, B, KVH, S, hs), np.float32))
    )
    v8, vs = quantize_kv_rows(
        jnp.asarray(rng.standard_normal((L, B, KVH, S, hs), np.float32))
    )
    qkv = jnp.asarray(
        rng.standard_normal((B, H + 2 * KVH, hs), np.float32)
    )

    cos, sin = ops.rope_angles(pos[:, None], hs)  # (B, 1, hs/2)
    q = ops.apply_rope(qkv[:, :H][:, None], cos, sin)[:, 0]
    kn = ops.apply_rope(qkv[:, H : H + KVH][:, None], cos, sin)[:, 0]
    k8n, ksn = quantize_kv_rows(kn[:, :, None, :])
    v8n, vsn = quantize_kv_rows(qkv[:, H + KVH :][:, :, None, :])
    att_ref, k8r, ksr, v8r, vsr = flash_decode_attention_q8_stacked(
        q, k8, ks, v8, vs, k8n, ksn, v8n, vsn, layer, pos, interpret=True
    )

    att_f, k8f, ksf, v8f, vsf = flash_decode_attention_q8_fused(
        qkv, jnp.array(k8), jnp.array(ks), jnp.array(v8), jnp.array(vs),
        jnp.repeat(cos[:, 0], 2, -1), jnp.repeat(sin[:, 0], 2, -1),
        layer, pos, n_heads=H, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(att_f), np.asarray(att_ref), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(k8f), np.asarray(k8r))
    np.testing.assert_array_equal(np.asarray(v8f), np.asarray(v8r))
    # appended scales may differ by an ULP (XLA fuses rope mul-adds
    # differently inside vs outside the kernel graph)
    np.testing.assert_allclose(
        np.asarray(ksf), np.asarray(ksr), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vsf), np.asarray(vsr), rtol=1e-6
    )


def test_q8_fused_model_path_token_parity(monkeypatch):
    """backend=pallas + int8 KV decode must emit the same tokens whether the
    glue-fused attention block engages or the composed stacked path runs."""
    import llama2_tpu.models.llama as M
    from llama2_tpu.config import ModelConfig
    from llama2_tpu.quant.q8 import quantize_params

    cfg = ModelConfig(
        dim=64, hidden_dim=172, n_layers=3, n_heads=4, n_kv_heads=2,
        vocab_size=256, seq_len=128, norm_eps=1e-5,
    )
    rng = np.random.default_rng(0)

    def r(*s):
        return rng.standard_normal(s, np.float32) * 0.1

    L, D, HD, V, KV = 3, 64, 172, 256, cfg.kv_dim
    params = {
        "tok_emb": r(V, D), "rms_att": 1 + r(L, D), "wq": r(L, D, D),
        "wk": r(L, D, KV), "wv": r(L, D, KV), "wo": r(L, D, D),
        "rms_ffn": 1 + r(L, D), "w1": r(L, D, HD), "w2": r(L, HD, D),
        "w3": r(L, D, HD), "rms_final": 1 + r(D), "wcls": r(D, V),
    }
    qp = M.fuse_layer_params(quantize_params(params, group_size=16), "pallas")

    def decode(use_fused):
        orig = M._layer_decode_stacked
        if not use_fused:

            def patched(x, lp, caches, idx, pos, cos, sin, config,
                        precision, backend, qi, cos_il=None, sin_il=None):
                return orig(x, lp, caches, idx, pos, cos, sin, config,
                            precision, backend, qi, None, None)

            monkeypatch.setattr(M, "_layer_decode_stacked", patched)
        try:
            cache = M.init_cache(cfg, 2, kv_quant=True)
            toks = jnp.asarray([[5], [9]], jnp.int32)
            pos = jnp.asarray([0, 0], jnp.int32)
            out = []
            for _ in range(10):
                hidden, cache = M.forward(
                    qp, cache, toks, pos, cfg, backend="pallas"
                )
                logits = M.logits_from_hidden(
                    qp, hidden[:, -1, :], backend="pallas"
                )
                toks = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
                pos = pos + 1
                out.append(np.asarray(toks[:, 0]).copy())
        finally:
            monkeypatch.setattr(M, "_layer_decode_stacked", orig)
        return np.stack(out)

    np.testing.assert_array_equal(decode(True), decode(False))
