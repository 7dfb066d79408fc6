"""Fused MLP megakernel vs the composed XLA oracle (interpret mode).

The kernel fuses rmsnorm + w1/w3 + swiglu + w2 + residual into one launch
(ops/pallas/mlp_block.py); the oracle is the exact op composition the decode
path otherwise runs (reference semantics main.zig:398-418). Shapes cover:
single-chunk whole-K, multi-chunk ceil coverage with a fully-OOB clamped
trailing block, ragged D tiling, row padding, and layer indexing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama2_tpu.ops import xla as ops
from llama2_tpu.ops.pallas.mlp_block import (
    _plan,
    mlp_block_stacked,
    mlp_block_supported,
)
from llama2_tpu.quant.q8 import dequantize, quantize

EPS = 1e-5


def _oracle(x, rms_w, w1f, w3f, w2f):
    xn = ops.rmsnorm(x, rms_w, EPS)
    h = ops.swiglu(
        jnp.dot(xn, w1f, precision=jax.lax.Precision.HIGHEST),
        jnp.dot(xn, w3f, precision=jax.lax.Precision.HIGHEST),
    )
    return x + jnp.dot(h, w2f, precision=jax.lax.Precision.HIGHEST)


def _build(L, D, HD, G1, G2, seed=0):
    rng = np.random.default_rng(seed)
    w1 = quantize(rng.standard_normal((L, D, HD)).astype(np.float32) * 0.05, G1)
    w3 = quantize(rng.standard_normal((L, D, HD)).astype(np.float32) * 0.05, G1)
    w2 = quantize(rng.standard_normal((L, HD, D)).astype(np.float32) * 0.05, G2)
    rms_w = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    return w1, w3, w2, rms_w, rng


@pytest.mark.parametrize(
    "M,D,HD,G1,G2,m_cap",
    [
        (8, 256, 384, 64, 64, None),  # single chunk, whole-K both phases
        (1, 256, 1376, 8, 8, 2),  # ragged HD + chunking + clamped OOB block
        (8, 2176, 256, 64, 64, None),  # ragged D tiling (zeroed xn tail)
        (12, 256, 384, 64, 64, None),  # row padding (M % 8 != 0)
        (8, 128, 1376, 8, 8, 1),  # one sub-step per chunk, 3 chunks
    ],
)
def test_mlp_block_vs_oracle(M, D, HD, G1, G2, m_cap):
    w1, w3, w2, rms_w, rng = _build(2, D, HD, G1, G2, seed=D + HD)
    assert mlp_block_supported(w1, w3, w2)
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    for layer in (0, 1):
        want = np.asarray(
            _oracle(x, rms_w, dequantize(w1)[layer], dequantize(w3)[layer],
                    dequantize(w2)[layer])
        )
        got = np.asarray(
            mlp_block_stacked(x, rms_w, w1, w3, w2, layer, EPS,
                              interpret=True, m_cap=m_cap)
        )
        # fast-mode bf16 group dots: absolute error grows ~sqrt(D) with the
        # contraction length (random-walk accumulation of bf16 rounding);
        # the tight bit-level check is test_mlp_block_matches_fast_semantics
        tol = 3e-2 * max(1.0, (D / 512.0) ** 0.5)
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def _emu_matmul(x, qt, layer):
    """quant_matmul fast-mode semantics in plain jnp: bf16 per-group MXU
    dots, f32 scales applied to the partials (quant_matmul._accum_fast)."""
    G = qt.group_size
    q, s = qt.q[layer], qt.scale[layer]
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    wb = q.astype(jnp.bfloat16)
    acc = jnp.zeros((x.shape[0], q.shape[1]), jnp.float32)
    for g in range(q.shape[0] // G):
        part = jax.lax.dot_general(
            xb[:, g * G:(g + 1) * G], wb[g * G:(g + 1) * G],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc = acc + part * s[g][None, :]
    return acc


def test_mlp_block_matches_fast_semantics():
    """Bit-level check against the exact fast-mode op composition — isolates
    kernel bugs from the inherent bf16 rounding the f32 oracle can't."""
    D, HD = 2176, 256
    w1, w3, w2, rms_w, rng = _build(2, D, HD, 64, 64, seed=D + HD)
    x = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + EPS)
    xn = xf * inv * rms_w
    h1 = _emu_matmul(xn, w1, 1)
    h3 = _emu_matmul(xn, w3, 1)
    want = np.asarray(x + _emu_matmul(h1 * jax.nn.sigmoid(h1) * h3, w2, 1))
    got = np.asarray(
        mlp_block_stacked(x, rms_w, w1, w3, w2, 1, EPS, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-5)


def test_mlp_block_7b_plan():
    """The Llama-7B shapes tile as designed: ragged 512 K-tiles for the
    11008 hidden dim, two 5632-wide chunks (256-column over-read only)."""
    bk1, s13, bk2, m, T, bh = _plan(4096, 11008, 64, 64)
    assert (bk1, s13) == (512, 8)
    assert bk2 == 512 and T * bh - 11008 == 256
    assert bh % 128 == 0 and m * bk2 == bh


def test_mlp_block_leading_dims_and_unsupported():
    w1, w3, w2, rms_w, rng = _build(1, 256, 384, 64, 64, seed=7)
    x = jnp.asarray(rng.standard_normal((4, 1, 256)).astype(np.float32))
    got = mlp_block_stacked(x, rms_w, w1, w3, w2, 0, EPS, interpret=True)
    assert got.shape == (4, 1, 256)
    flat = mlp_block_stacked(
        x.reshape(4, 256), rms_w, w1, w3, w2, 0, EPS, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(4, 256), np.asarray(flat), rtol=1e-6
    )

    # 2-D (unstacked) weights are not eligible
    from llama2_tpu.quant.q8 import QuantTensor

    w1_2d = QuantTensor(q=w1.q[0], scale=w1.scale[0], group_size=64)
    assert not mlp_block_supported(w1_2d, w3, w2)
    with pytest.raises(ValueError):
        mlp_block_stacked(x, rms_w, w1_2d, w3, w2, 0, EPS, interpret=True)


def test_decode_forward_mlp_path_matches_w13_path():
    """Full decode steps through forward(): the fused-FFN path (separate
    w1/w3 -> megakernel) vs the w13-launch path, same fast-mode numerics."""
    from llama2_tpu.config import ModelConfig
    from llama2_tpu.models.llama import (
        forward,
        fuse_layer_params,
        init_cache,
        use_mlp_block,
    )
    from llama2_tpu.tools.make_random_q8 import random_q8_params

    config = ModelConfig(dim=256, hidden_dim=384, n_layers=2, n_heads=2,
                         n_kv_heads=2, vocab_size=96, seq_len=128)
    params = jax.tree.map(jnp.asarray, random_q8_params(config, 64, seed=3))
    p_mlp = fuse_layer_params(params, "pallas")
    assert "w1" in p_mlp and "w13" not in p_mlp
    assert use_mlp_block(p_mlp, "pallas")
    p_w13 = fuse_layer_params(params, "xla")  # forces the w13 concat layout
    assert "w13" in p_w13

    tok = jnp.asarray([[5], [7]], jnp.int32)
    ca = init_cache(config, 2)
    cb = init_cache(config, 2)
    for pos in range(3):
        ha, ca = forward(p_mlp, ca, tok, pos, config, backend="pallas")
        hb, cb = forward(p_w13, cb, tok, pos, config, backend="pallas")
        np.testing.assert_allclose(
            np.asarray(ha), np.asarray(hb), rtol=2e-2, atol=2e-2
        )
    np.testing.assert_allclose(
        np.asarray(ca["k"]), np.asarray(cb["k"]), rtol=2e-2, atol=2e-2
    )


def test_engine_keeps_w1_w3_for_mlp_kernel():
    """BatchEngine's launch fusion leaves w1/w3 unfused when the FFN
    megakernel is eligible, and the engine still serves tokens."""
    from llama2_tpu.config import GenerationConfig, ModelConfig
    from llama2_tpu.runtime.batch_engine import BatchEngine
    from llama2_tpu.tools.make_random_q8 import random_q8_params

    config = ModelConfig(dim=256, hidden_dim=384, n_layers=2, n_heads=2,
                         n_kv_heads=2, vocab_size=96, seq_len=64)
    params = random_q8_params(config, 64, seed=4)
    eng = BatchEngine(config, params, batch_size=2, backend="pallas")
    assert "w1" in eng.params and "w13" not in eng.params
    gen = GenerationConfig(temperature=0.0, steps=8)
    q = eng.submit([5, 7], gen)
    eng.run_until_idle()
    res = q.get(timeout=120)
    assert not isinstance(res, Exception)
    assert 0 < len(res.tokens) <= 8


@pytest.mark.parametrize(
    "M,D,HD,G,m_cap",
    [
        (8, 256, 384, 64, None),  # single chunk
        (4, 256, 1376, 8, 2),  # ragged HD + chunking (clamped OOB block)
    ],
)
def test_attn_mlp_block_vs_composed(M, D, HD, G, m_cap):
    """The wo-prepended megakernel (one launch for wo + FFN) must match
    r = x + att@wo followed by the plain mlp_block kernel, up to fast-mode
    bf16 group-dot rounding in the wo phase."""
    from llama2_tpu.ops.pallas.mlp_block import (
        attn_mlp_block_stacked,
        attn_mlp_block_supported,
        mlp_block_stacked,
    )

    w1, w3, w2, rms_w, rng = _build(2, D, HD, G, G, seed=D + HD)
    wo = quantize(
        jnp.asarray(rng.standard_normal((2, D, D)).astype(np.float32) * 0.05),
        G,
    )
    assert attn_mlp_block_supported(wo, w1, w3, w2)
    att = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    for layer in (0, 1):
        r = x + att @ dequantize(wo)[layer]
        want = np.asarray(
            mlp_block_stacked(r, rms_w, w1, w3, w2, layer, 1e-5, m_cap=m_cap)
        )
        got = np.asarray(
            attn_mlp_block_stacked(
                att, x, wo, rms_w, w1, w3, w2, layer, 1e-5, m_cap=m_cap
            )
        )
        np.testing.assert_allclose(
            got, want, atol=3e-2 * np.abs(want).max()
        )


def test_attn_mlp_model_path_token_parity(monkeypatch):
    """Decode tokens must match whether the wo+FFN megakernel engages or
    the wo-launch + mlp_block pair runs (shapes chosen so the megakernel's
    compiled-path gate passes: D%128, bh%128, hs=128)."""
    import llama2_tpu.models.llama as M
    import llama2_tpu.ops.pallas.mlp_block as MB
    from llama2_tpu.config import ModelConfig
    from llama2_tpu.quant.q8 import quantize_params

    cfg = ModelConfig(
        dim=256, hidden_dim=384, n_layers=2, n_heads=2, n_kv_heads=2,
        vocab_size=128, seq_len=128, norm_eps=1e-5,
    )
    rng = np.random.default_rng(0)

    def r(*s):
        return rng.standard_normal(s, np.float32) * 0.05

    L, D, HD, V, KV = 2, 256, 384, 128, cfg.kv_dim
    params = {
        "tok_emb": r(V, D), "rms_att": 1 + r(L, D), "wq": r(L, D, D),
        "wk": r(L, D, KV), "wv": r(L, D, KV), "wo": r(L, D, D),
        "rms_ffn": 1 + r(L, D), "w1": r(L, D, HD), "w2": r(L, HD, D),
        "w3": r(L, D, HD), "rms_final": 1 + r(D), "wcls": r(D, V),
    }
    qp = M.fuse_layer_params(quantize_params(params, group_size=64), "pallas")

    def decode(use_merged):
        if not use_merged:
            monkeypatch.setattr(
                MB, "attn_mlp_block_supported", lambda *a: False
            )
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


def test_layer_tail_qkv_model_token_parity(monkeypatch):
    """Decode tokens must match whether the 2-launch layer (fused attention
    + wo/FFN/next-qkv megakernel with qkv in the scan carry) engages or the
    per-layer path runs; covers both KV cache dtypes."""
    import llama2_tpu.models.llama as M
    import llama2_tpu.ops.pallas.mlp_block as MB
    from llama2_tpu.config import ModelConfig
    from llama2_tpu.quant.q8 import quantize_params

    cfg = ModelConfig(
        dim=256, hidden_dim=384, n_layers=3, n_heads=2, n_kv_heads=2,
        vocab_size=128, seq_len=128, norm_eps=1e-5,
    )
    rng = np.random.default_rng(4)

    def r(*s):
        return rng.standard_normal(s, np.float32) * 0.05

    L, D, HD, V, KV = 3, 256, 384, 128, cfg.kv_dim
    params = {
        "tok_emb": r(V, D), "rms_att": 1 + r(L, D), "wq": r(L, D, D),
        "wk": r(L, D, KV), "wv": r(L, D, KV), "wo": r(L, D, D),
        "rms_ffn": 1 + r(L, D), "w1": r(L, D, HD), "w2": r(L, HD, D),
        "w3": r(L, D, HD), "rms_final": 1 + r(D), "wcls": r(D, V),
    }
    qp = M.fuse_layer_params(quantize_params(params, group_size=64), "pallas")

    def decode(use_tail, kv_quant):
        if not use_tail:
            monkeypatch.setattr(
                MB, "layer_tail_qkv_supported", lambda *a: False
            )
        try:
            cache = M.init_cache(cfg, 2, kv_quant=kv_quant)
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

    for kv_quant in (False, True):
        np.testing.assert_array_equal(
            decode(True, kv_quant), decode(False, kv_quant)
        )
