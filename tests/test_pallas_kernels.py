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
    want = np.asarray(x @ dequantize(t))

    # accurate mode: bit-faithful to the f32 dequant oracle
    got = np.asarray(quant_matmul(x, t, interpret=True, mode="accurate"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # fast mode (default): bf16-level activation rounding, f32 accumulate —
    # error must stay well under the Q8 quantization noise itself
    fast = np.asarray(quant_matmul(x, t, interpret=True))
    scale = np.abs(want).mean() + 1e-6
    assert np.abs(fast - want).max() / scale < 3e-2
    assert np.abs(fast - want).mean() / scale < 5e-3


def test_quant_matmul_batched_lead_dims():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
    w = rng.standard_normal((128, 256)).astype(np.float32)
    t = quantize(w, 64)
    got = np.asarray(quant_matmul(x, t, interpret=True, mode="accurate"))
    want = np.asarray(x @ dequantize(t))
    assert got.shape == (2, 3, 256)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_quant_matmul_rejects_stacked():
    t = quantize(np.ones((2, 64, 8), dtype=np.float32))
    with pytest.raises(ValueError):
        quant_matmul(jnp.ones((1, 64)), t, interpret=True)


def test_fused_layer_params_token_identical(tiny_checkpoint):
    """QKV/W13 launch fusion changes kernel count, not tokens."""
    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.io.checkpoint import load_checkpoint
    from llama2_tpu.quant.q8 import quantize_params
    from llama2_tpu.runtime.generator import Generator

    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    qp = quantize_params(params)
    gen = GenerationConfig(temperature=0.0, steps=16, seed=0)

    g_fused = Generator(config, qp, backend="pallas")  # auto-fuses
    assert "wqkv" in g_fused.params and "wq" not in g_fused.params
    g_plain = Generator(config, qp, backend="xla")
    t_fused = g_fused.generate([7, 12], gen).tokens
    t_plain = g_plain.generate([7, 12], gen).tokens
    assert t_fused == t_plain


def test_quant_matmul_stacked_matches_per_layer():
    """Layer-indexed stacked kernel == slicing the layer out first."""
    from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked
    from llama2_tpu.quant.q8 import QuantTensor

    rng = np.random.default_rng(0)
    L, K, N, G = 3, 256, 384, 64
    w = rng.standard_normal((L, K, N)).astype(np.float32)
    t = quantize(w, G)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    for mode in ("accurate", "fast"):
        for l in range(L):
            got = np.asarray(
                quant_matmul_stacked(x, t, l, interpret=True, mode=mode)
            )
            t2 = QuantTensor(q=t.q[l], scale=t.scale[l], group_size=G)
            want = np.asarray(quant_matmul(x, t2, interpret=True, mode=mode))
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ---- flash decode attention ----

from llama2_tpu.ops.pallas.attention import flash_decode_attention
from llama2_tpu.ops import xla as ox


@pytest.mark.parametrize(
    "B,H,KVH,hs,S,pos",
    [
        (1, 6, 6, 48, 256, 0),      # stories15M shapes, first token
        (1, 6, 6, 48, 256, 100),
        (1, 6, 6, 48, 256, 255),    # full cache
        (2, 8, 2, 64, 128, 127),    # GQA, batch
        (1, 4, 1, 32, 64, 17),      # MQA
        (1, 32, 4, 128, 512, 300),  # llama-7B-ish head layout
    ],
)
def test_flash_decode_vs_oracle(B, H, KVH, hs, S, pos):
    rng = np.random.default_rng(B * 100 + pos)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hs)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, hs)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, hs)).astype(np.float32))
    got = np.asarray(flash_decode_attention(q, k, v, pos, interpret=True))
    want = np.asarray(ox.attention(q, k, v, pos))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flash_decode_per_row_positions():
    rng = np.random.default_rng(0)
    B, H, KVH, hs, S = 3, 4, 2, 64, 128
    q = jnp.asarray(rng.standard_normal((B, 1, H, hs)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, hs)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, hs)).astype(np.float32))
    pos = jnp.asarray([5, 77, 127])
    got = np.asarray(flash_decode_attention(q, k, v, pos, interpret=True))
    want = np.asarray(ox.attention(q, k, v, pos))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flash_decode_lane_padded_cache_matches_unpadded():
    """Zero lane padding of head_size must not change the output."""
    rng = np.random.default_rng(1)
    B, H, KVH, hs, S = 1, 6, 6, 48, 64
    q = rng.standard_normal((B, 1, H, hs)).astype(np.float32)
    k = rng.standard_normal((B, KVH, S, hs)).astype(np.float32)
    v = rng.standard_normal((B, KVH, S, hs)).astype(np.float32)
    pad = ((0, 0), (0, 0), (0, 0), (0, 128 - hs))
    qp = np.pad(q, ((0, 0), (0, 0), (0, 0), (0, 128 - hs)))
    kp, vp = np.pad(k, pad), np.pad(v, pad)
    want = np.asarray(ox.attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 40))
    got = np.asarray(
        flash_decode_attention(
            jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(vp), 40,
            scale=1.0 / hs**0.5, interpret=True,
        )
    )[..., :hs]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---- fused rmsnorm / swiglu ----

from llama2_tpu.ops.pallas.rmsnorm import rmsnorm as p_rmsnorm
from llama2_tpu.ops.pallas.swiglu import swiglu as p_swiglu


@pytest.mark.parametrize("shape", [(1, 1, 288), (2, 7, 64), (1, 300, 172)])
def test_pallas_rmsnorm_vs_oracle(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(1 + 0.1 * rng.standard_normal(shape[-1]).astype(np.float32))
    got = np.asarray(p_rmsnorm(x, w, interpret=True))
    want = np.asarray(ox.rmsnorm(x, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(1, 1, 768), (2, 7, 64), (1, 300, 172)])
def test_pallas_swiglu_vs_oracle(shape):
    rng = np.random.default_rng(0)
    h1 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    h3 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = np.asarray(p_swiglu(h1, h3, interpret=True))
    want = np.asarray(ox.swiglu(h1, h3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_model_forward_pallas_backend_matches_xla(tiny_checkpoint):
    """Full forward with backend=pallas (flash attention on lane-padded
    cache + pallas dequant matmul) vs the XLA path, on CPU interpret."""
    from llama2_tpu.io.checkpoint import load_checkpoint
    from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
    from llama2_tpu.quant.q8 import quantize_params

    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    qp = quantize_params(params)
    tok = jnp.asarray([[42]])

    h_x, _ = forward(qp, init_cache(config), tok, 0, config, backend="xla")
    lx = np.asarray(logits_from_hidden(qp, h_x, backend="xla"))
    h_p, _ = forward(
        qp, init_cache(config, lane_pad=True), tok, 0, config, backend="pallas"
    )
    lp = np.asarray(logits_from_hidden(qp, h_p, backend="pallas"))
    # fast-mode quant matmul rounds activations to bf16 (see quant_matmul
    # docstring): logits agree to bf16 noise, and the decision (argmax)
    # must be identical on this fixture.
    # per-layer bf16 rounding compounds through the stack: allow ~1% mean
    scale = np.abs(lx).mean()
    assert np.abs(lp - lx).max() / scale < 5e-2
    assert np.abs(lp - lx).mean() / scale < 1.5e-2
    assert np.argmax(lp) == np.argmax(lx)


# ---- flash prefill attention ----

from llama2_tpu.ops.pallas.prefill_attention import flash_prefill_attention


@pytest.mark.parametrize(
    "B,T,H,KVH,hs,S,pos",
    [
        (1, 8, 6, 6, 48, 64, 0),
        (1, 8, 6, 6, 48, 64, 13),   # continuation segment
        (2, 16, 8, 2, 64, 128, 32),  # GQA batch
        (1, 5, 4, 1, 32, 64, 10),   # MQA, T not a power of two
        (1, 7, 4, 2, 64, 64, 0),    # odd T forces block_q shrink
    ],
)
def test_flash_prefill_vs_oracle(B, T, H, KVH, hs, S, pos):
    rng = np.random.default_rng(T * 10 + pos)
    q = jnp.asarray(rng.standard_normal((B, T, H, hs)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, hs)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, hs)).astype(np.float32))
    got = np.asarray(flash_prefill_attention(q, k, v, pos, interpret=True))
    want = np.asarray(ox.attention(q, k, v, pos))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_generate_pallas_backend_matches_xla_tokens(tiny_checkpoint):
    """Full argmax generation must be token-identical across backends."""
    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.io.checkpoint import load_checkpoint
    from llama2_tpu.runtime.generator import Generator

    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    gen = GenerationConfig(temperature=0.0, steps=24)
    prompt = [5, 17, 320]
    a = Generator(config, params, backend="xla").generate(prompt, gen)
    b = Generator(config, params, backend="pallas").generate(prompt, gen)
    assert a.tokens == b.tokens


def test_flash_decode_stacked_matches_oracle():
    """Stacked-cache fused append+attend == dus + masked attention, and the
    caches really update in place (returned arrays carry the new rows)."""
    import numpy as np
    import jax.numpy as jnp

    from llama2_tpu.ops import xla as ox
    from llama2_tpu.ops.pallas.attention import flash_decode_attention_stacked

    L, B, KVH, S, hs, G = 3, 2, 2, 32, 128, 2
    H = KVH * G
    rng = np.random.default_rng(0)
    k_cache = jnp.asarray(rng.standard_normal((L, B, KVH, S, hs)), jnp.float32)
    v_cache = jnp.asarray(rng.standard_normal((L, B, KVH, S, hs)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, hs)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, KVH, 1, hs)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, KVH, 1, hs)), jnp.float32)
    pos = jnp.asarray([5, 9], jnp.int32)
    layer = 1

    out, k2, v2 = flash_decode_attention_stacked(
        q, k_cache, v_cache, k_new, v_new, layer, pos, interpret=True
    )
    kc = np.asarray(k_cache).copy()
    vc = np.asarray(v_cache).copy()
    for b in range(B):
        kc[layer, b, :, int(pos[b])] = np.asarray(k_new)[b, :, 0]
        vc[layer, b, :, int(pos[b])] = np.asarray(v_new)[b, :, 0]
    ref = ox.attention(
        q[:, None], jnp.asarray(kc[layer]), jnp.asarray(vc[layer]), pos,
        scale=1 / np.sqrt(hs),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref)[:, 0], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(k2), kc)
    np.testing.assert_array_equal(np.asarray(v2), vc)


def test_flash_decode_q8_stacked_matches_oracle():
    import numpy as np
    import jax.numpy as jnp

    from llama2_tpu.ops import xla as ox
    from llama2_tpu.ops.pallas.attention_q8 import (
        dequantize_kv,
        flash_decode_attention_q8_stacked,
        quantize_kv_rows,
    )

    L, B, KVH, S, hs, G = 2, 2, 2, 128, 128, 3
    H = KVH * G
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((L, B, KVH, S, hs)).astype(np.float32)
    k8, ks = quantize_kv_rows(jnp.asarray(rows))
    v8, vs = quantize_kv_rows(jnp.asarray(rows[::-1]))
    q = jnp.asarray(rng.standard_normal((B, H, hs)), jnp.float32)
    knew_f = jnp.asarray(rng.standard_normal((B, KVH, 1, hs)), jnp.float32)
    vnew_f = jnp.asarray(rng.standard_normal((B, KVH, 1, hs)), jnp.float32)
    k8n, ksn = quantize_kv_rows(knew_f)
    v8n, vsn = quantize_kv_rows(vnew_f)
    pos = jnp.asarray([3, 126], jnp.int32)
    layer = 1

    out, k8o, kso, v8o, vso = flash_decode_attention_q8_stacked(
        q, k8, ks, v8, vs, k8n, ksn, v8n, vsn, layer, pos, interpret=True,
    )
    # expected in-place RMW appends (rows + scales) at [layer, b, :, pos_b]
    ks = np.asarray(ks).copy()
    vs = np.asarray(vs).copy()
    k8r = np.asarray(k8).copy()
    v8r = np.asarray(v8).copy()
    for b in range(B):
        ks[layer, b, :, int(pos[b])] = np.asarray(ksn)[b, :, 0]
        vs[layer, b, :, int(pos[b])] = np.asarray(vsn)[b, :, 0]
        k8r[layer, b, :, int(pos[b])] = np.asarray(k8n)[b, :, 0]
        v8r[layer, b, :, int(pos[b])] = np.asarray(v8n)[b, :, 0]
    np.testing.assert_array_equal(np.asarray(k8o), k8r)
    np.testing.assert_array_equal(np.asarray(v8o), v8r)
    np.testing.assert_array_equal(np.asarray(kso), ks)
    np.testing.assert_array_equal(np.asarray(vso), vs)
    ref = ox.attention(
        q[:, None],
        dequantize_kv(jnp.asarray(k8r[layer]), jnp.asarray(ks[layer])),
        dequantize_kv(jnp.asarray(v8r[layer]), jnp.asarray(vs[layer])),
        pos,
        scale=1 / np.sqrt(hs),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref)[:, 0], rtol=3e-2, atol=3e-2
    )


def test_quant_matmul_ragged_k_tiling():
    """K admitting no legal dividing tile (e.g. Llama-7B w2's 11008) takes
    the ragged path: ceil grid + zero-padded x + masked OOB scale groups.
    Must be exact vs the dequant reference in accurate mode."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from llama2_tpu.ops.pallas.quant_matmul import (
        _pick_bk,
        quant_matmul,
        quant_matmul_stacked,
    )
    from llama2_tpu.quant.q8 import QuantTensor, dequantize, quantize

    # G=8: bk needs (bk/8)%8==0 i.e. bk % 64 == 0; K=280 has no such
    # divisor AND exceeds the 32-group threshold below which whole-K wins
    G, K, N, L, M = 8, 280, 128, 2, 4
    assert _pick_bk(K, G, 64) == 64 and K % 64 != 0  # ragged is exercised
    rng = np.random.default_rng(0)
    w = rng.standard_normal((L, K, N)).astype(np.float32) * 0.1
    qt = quantize(w, G)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

    want = jnp.dot(x, dequantize(qt)[1], precision=jax.lax.Precision.HIGHEST)
    got = quant_matmul_stacked(x, qt, 1, block_k=64, mode="accurate")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    got_fast = quant_matmul_stacked(x, qt, 1, block_k=64, mode="fast")
    np.testing.assert_allclose(np.asarray(got_fast), np.asarray(want),
                               rtol=2e-2, atol=2e-2)

    qt1 = QuantTensor(q=qt.q[0], scale=qt.scale[0], group_size=G)
    want0 = jnp.dot(x, dequantize(qt1), precision=jax.lax.Precision.HIGHEST)
    got0 = quant_matmul(x, qt1, block_k=64, mode="accurate")
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               rtol=1e-5, atol=1e-5)


def test_quant_matmul_stacked_norm_prologue_and_residual():
    """Fused rmsnorm prologue / residual epilogue on the stacked kernel
    (the decode path's wqkv and wo launch fusions) vs the op composition."""
    import numpy as np
    import jax.numpy as jnp

    from llama2_tpu.ops import xla as ops
    from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked
    from llama2_tpu.quant.q8 import dequantize, quantize

    rng = np.random.default_rng(11)
    for K in (256, 2176, 280):
        # 2176: ragged K tiling with the in-kernel norm (zeroed scratch
        # tail); 280: K not 128-lane aligned -> wrapper falls back to an
        # XLA-side norm but must stay numerically identical
        G = 64 if K % 64 == 0 else 8
        L, M, N = 2, 4, 128
        w = rng.standard_normal((L, K, N)).astype(np.float32) * 0.05
        qt = quantize(w, G)
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
        rms_w = jnp.asarray(rng.standard_normal(K).astype(np.float32))
        res = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))

        want = np.asarray(
            res + ops.rmsnorm(x, rms_w, 1e-5) @ dequantize(qt)[1]
        )
        got = np.asarray(
            quant_matmul_stacked(
                x, qt, 1, rms_w=rms_w, eps=1e-5, residual=res,
                interpret=True,
            )
        )
        tol = 3e-2 * max(1.0, (K / 512.0) ** 0.5)
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

        # norm-only and residual-only combinations
        got_n = np.asarray(
            quant_matmul_stacked(x, qt, 1, rms_w=rms_w, interpret=True)
        )
        np.testing.assert_allclose(
            got_n, want - np.asarray(res), rtol=tol, atol=tol
        )
        got_r = np.asarray(
            quant_matmul_stacked(
                ops.rmsnorm(x, rms_w, 1e-5), qt, 1, residual=res,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got_r, want, rtol=tol, atol=tol)


def test_f32_fused_attention_block_vs_stacked():
    """The fp-cache glue-fused kernel (RoPE + append + attend in one
    launch, ops/pallas/attention.py::flash_decode_attention_fused) must
    reproduce the composed path: XLA apply_rope +
    flash_decode_attention_stacked."""
    from llama2_tpu.ops import xla as xops
    from llama2_tpu.ops.pallas.attention import (
        flash_decode_attention_fused,
        flash_decode_attention_stacked,
    )

    L, B, KVH, S, hs, H = 3, 2, 2, 256, 128, 4
    rng = np.random.default_rng(2)
    pos = jnp.asarray([37, 130], jnp.int32)
    layer = 1
    k_cache = jnp.asarray(
        rng.standard_normal((L, B, KVH, S, hs), np.float32)
    )
    v_cache = jnp.asarray(
        rng.standard_normal((L, B, KVH, S, hs), np.float32)
    )
    qkv = jnp.asarray(
        rng.standard_normal((B, H + 2 * KVH, hs), np.float32)
    )

    cos, sin = xops.rope_angles(pos[:, None], hs)
    q = xops.apply_rope(qkv[:, :H][:, None], cos, sin)[:, 0]
    kn = xops.apply_rope(qkv[:, H : H + KVH][:, None], cos, sin)[:, 0]
    att_ref, kr, vr = flash_decode_attention_stacked(
        q, jnp.array(k_cache), jnp.array(v_cache),
        kn[:, :, None, :], qkv[:, H + KVH :][:, :, None, :],
        layer, pos, interpret=True,
    )
    att_f, kf, vf = flash_decode_attention_fused(
        qkv, jnp.array(k_cache), jnp.array(v_cache),
        jnp.repeat(cos[:, 0], 2, -1), jnp.repeat(sin[:, 0], 2, -1),
        layer, pos, n_heads=H, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(att_f), np.asarray(att_ref), atol=1e-5
    )
    # appended rows may differ by an ULP (XLA fuses the rope mul-adds
    # differently inside vs outside the kernel graph)
    np.testing.assert_allclose(
        np.asarray(kf), np.asarray(kr), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vf), np.asarray(vr), rtol=1e-6, atol=1e-6
    )


def test_f32_fused_model_path_token_parity(monkeypatch):
    """backend=pallas fp-cache decode must emit the same tokens whether the
    glue-fused attention block engages or the composed path runs."""
    import llama2_tpu.models.llama as M
    from llama2_tpu.config import ModelConfig
    from llama2_tpu.quant.q8 import quantize_params

    cfg = ModelConfig(
        dim=64, hidden_dim=172, n_layers=3, n_heads=4, n_kv_heads=2,
        vocab_size=256, seq_len=128, norm_eps=1e-5,
    )
    rng = np.random.default_rng(3)

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
            cache = M.init_cache(cfg, 2)  # fp32 KV
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
