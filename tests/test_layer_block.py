"""Whole-decoder-layer megakernel vs the 2-launch composition it replaces.

The layer_block kernel (ops/pallas/layer_block.py) must produce the same
layer output, next-layer QKV, and — bit-for-bit — the same INT8 cache
appends as the glue-fused attention kernel + the wo/FFN/next-qkv tail
megakernel it fuses together. Run in interpret mode (the checked build).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama2_tpu.config import ModelConfig
from llama2_tpu.models import llama as M
from llama2_tpu.ops.pallas.layer_block import (
    layer_block_stacked,
    layer_block_supported,
)
from llama2_tpu.quant.q8 import quantize_params

EPS = 1e-5


def _cfg(L=3, D=256, HD=384, H=2, KVH=2, V=128, S=128):
    return ModelConfig(dim=D, hidden_dim=HD, n_layers=L, n_heads=H,
                       n_kv_heads=KVH, vocab_size=V, seq_len=S, norm_eps=EPS)


def _params(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def r(*s):
        return rng.standard_normal(s, np.float32) * 0.05

    L, D, HD, V, KV = (cfg.n_layers, cfg.dim, cfg.hidden_dim,
                       cfg.vocab_size, cfg.kv_dim)
    params = {
        "tok_emb": r(V, D), "rms_att": 1 + r(L, D), "wq": r(L, D, D),
        "wk": r(L, D, KV), "wv": r(L, D, KV), "wo": r(L, D, D),
        "rms_ffn": 1 + r(L, D), "w1": r(L, D, HD), "w2": r(L, HD, D),
        "w3": r(L, D, HD), "rms_final": 1 + r(D), "wcls": r(D, V),
    }
    return M.fuse_layer_params(quantize_params(params, group_size=64),
                               "pallas")


def _two_launch_reference(qp, cfg, qkv3, x, caches, cos_il, sin_il, layer,
                          pos, with_qkv):
    """The exact 2-launch composition the model ran before layer_block."""
    from llama2_tpu.ops.pallas.attention_q8 import (
        flash_decode_attention_q8_fused,
    )
    from llama2_tpu.ops.pallas.mlp_block import (
        attn_mlp_block_stacked,
        layer_tail_qkv_stacked,
    )

    B = x.shape[0]
    H, hs = cfg.n_heads, cfg.head_size
    att, k, ks, v, vs = flash_decode_attention_q8_fused(
        qkv3, *caches, cos_il, sin_il, layer, pos,
        n_heads=H, scale=1.0 / hs**0.5,
    )
    att = att.reshape(B, cfg.dim)
    if with_qkv:
        out, qn = layer_tail_qkv_stacked(
            att, x, qp["wo"], qp["rms_ffn"], qp["w1"], qp["w3"], qp["w2"],
            qp["rms_att"], qp["wqkv"], layer, EPS,
        )
        return out, qn, (k, ks, v, vs)
    out = attn_mlp_block_stacked(
        att, x, qp["wo"], qp["rms_ffn"][int(layer)], qp["w1"], qp["w3"],
        qp["w2"], layer, EPS,
    )
    return out, None, (k, ks, v, vs)


@pytest.mark.parametrize("B,pos0,with_qkv", [
    (2, 5, True),
    (2, 5, False),
    (1, 0, True),       # empty cache: only the virtual row contributes
    (4, 100, True),     # multi-block scan at bs=128 (pos within block 0)
])
def test_layer_block_vs_two_launch(B, pos0, with_qkv):
    cfg = _cfg()
    qp = _params(cfg, seed=B + pos0)
    assert layer_block_supported(
        qp["wo"], qp["w1"], qp["w3"], qp["w2"], qp["wqkv"], cfg, B,
        cfg.seq_len,
    )
    rng = np.random.default_rng(7)
    H, KVH, hs = cfg.n_heads, cfg.n_kv_heads, cfg.head_size
    qkv3 = jnp.asarray(
        rng.standard_normal((B, H + 2 * KVH, hs), np.float32)
    )
    x = jnp.asarray(rng.standard_normal((B, cfg.dim), np.float32) * 0.1)
    pos = jnp.asarray([pos0 + 3 * b for b in range(B)], jnp.int32)
    from llama2_tpu.ops import xla as ops

    cos, sin = ops.rope_angles(pos[:, None], hs)
    cos_il = jnp.repeat(cos.reshape(B, -1), 2, axis=-1)
    sin_il = jnp.repeat(sin.reshape(B, -1), 2, axis=-1)

    c = M.init_cache(cfg, B, kv_quant=True)
    # fill with plausible rows so attention has history (one draw, reused —
    # both paths must start from the SAME cache bytes)
    k8_init = rng.integers(-100, 100, c["k"].shape).astype(np.int8)
    sc_init = rng.uniform(0.001, 0.01, c["k_scale"].shape).astype(np.float32)

    def fresh_caches():
        k8 = jnp.asarray(k8_init)
        sc = jnp.asarray(sc_init)
        return (k8, sc, jnp.roll(k8, 1, axis=-1), sc * 1.1)

    layer = jnp.int32(1)
    want, qn_want, c_want = _two_launch_reference(
        qp, cfg, qkv3, x, fresh_caches(), cos_il, sin_il, layer, pos,
        with_qkv,
    )
    got, qn_got, *c_got = layer_block_stacked(
        qkv3, x, *fresh_caches(), cos_il, sin_il, qp["wo"], qp["rms_ffn"],
        qp["w1"], qp["w3"], qp["w2"], qp["rms_att"], qp["wqkv"], layer,
        pos, n_heads=H, eps=EPS, with_qkv=with_qkv,
    )

    # cache appends: bit-identical (same quantization formula, same rows)
    for name, a, b in zip(("k", "ks", "v", "vs"), c_got, c_want):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"cache {name}"
        )
    # layer output: same math up to bf16 dot ordering (the virtual row folds
    # scales before the bf16 rounding where the composed path folds after)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2 * scale, rtol=2e-2
    )
    if with_qkv:
        qscale = np.abs(np.asarray(qn_want)).max()
        np.testing.assert_allclose(
            np.asarray(qn_got), np.asarray(qn_want), atol=2e-2 * qscale,
            rtol=2e-2,
        )


def test_model_path_token_parity(monkeypatch):
    """Full decode through forward(): tokens with the whole-layer megakernel
    vs the 2-launch path must match (deterministic small-weight config)."""
    import llama2_tpu.ops.pallas.layer_block as LB

    cfg = _cfg()
    qp = _params(cfg, seed=11)

    def decode(use_block):
        if not use_block:
            monkeypatch.setattr(LB, "layer_block_supported",
                                lambda *a, **k: False)
        try:
            cache = M.init_cache(cfg, 2, kv_quant=True)
            toks = jnp.asarray([[5], [9]], jnp.int32)
            pos = jnp.asarray([0, 0], jnp.int32)
            out = []
            for _ in range(8):
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
            monkeypatch.undo()
        return np.stack(out)

    np.testing.assert_array_equal(decode(True), decode(False))


def test_supported_predicate_gates():
    cfg = _cfg()
    qp = _params(cfg)
    ok = layer_block_supported(
        qp["wo"], qp["w1"], qp["w3"], qp["w2"], qp["wqkv"], cfg, 2, 128
    )
    assert ok
    # odd seq_len: the RMW scale window needs whole 128-lane tiles
    assert not layer_block_supported(
        qp["wo"], qp["w1"], qp["w3"], qp["w2"], qp["wqkv"], cfg, 2, 120
    )
    # head size not 128-aligned
    bad = _cfg(H=4, KVH=4)  # hs = 64
    assert not layer_block_supported(
        qp["wo"], qp["w1"], qp["w3"], qp["w2"], qp["wqkv"], bad, 2, 128
    )


def test_engine_serves_with_layer_block():
    """BatchEngine end-to-end on shapes where the megakernel engages."""
    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.runtime.batch_engine import BatchEngine
    from llama2_tpu.tools.make_random_q8 import random_q8_params

    cfg = _cfg(S=128)
    params = random_q8_params(cfg, 64, seed=4)
    eng = BatchEngine(cfg, params, batch_size=2, backend="pallas",
                      kv_quant=True)
    gen = GenerationConfig(temperature=0.0, steps=8)
    q = eng.submit([5, 7], gen)
    eng.run_until_idle()
    res = q.get(timeout=300)
    assert not isinstance(res, Exception)
    assert 0 < len(res.tokens) <= 10
