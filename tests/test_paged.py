"""Paged KV cache: kernel-vs-oracle, pool allocator, write paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config

from llama2_tpu.ops import xla as ops
from llama2_tpu.ops.pallas.paged_attention import (
    paged_attention_oracle,
    paged_decode_attention,
)
from llama2_tpu.runtime.paged_cache import (
    OutOfPages,
    PagePool,
    append,
    write_segment,
)


def _pools(P=6, KVH=2, page=16, hs=32, seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.standard_normal((P, KVH, page, hs), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((P, KVH, page, hs), dtype=np.float32))
    return k, v


@pytest.mark.parametrize("pos", [0, 5, 16, 31, 47])
@pytest.mark.parametrize("gqa", [False, True])
def test_paged_attention_matches_dense(pos, gqa):
    """Pages in scrambled physical order == dense cache attention."""
    P, KVH, page, hs = 6, 2, 16, 32
    H = 4 if gqa else KVH
    B = 2
    rng = np.random.default_rng(pos * 10 + gqa)
    k_pool, v_pool = _pools(P, KVH, page, hs, seed=pos)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hs), dtype=np.float32))

    # scrambled physical pages per row
    tables = np.stack([
        rng.permutation(P)[: P // 2 + 1] for _ in range(B)
    ]).astype(np.int32)
    table = jnp.asarray(tables)
    positions = jnp.asarray([pos, max(0, pos - 3)], jnp.int32)

    got = paged_decode_attention(q, k_pool, v_pool, table, positions)

    # dense oracle: gather each row's pages into a contiguous cache
    want = paged_attention_oracle(q, k_pool, v_pool, table, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pool_alloc_release_exhaustion():
    config = tiny_config()
    pool = PagePool.create(config, n_pages=4, page_size=8)
    a = pool.alloc(3)
    assert len(set(a)) == 3
    with pytest.raises(OutOfPages):
        pool.alloc(2)
    pool.release(a[:2])
    b = pool.alloc(3)
    assert len(set(b)) == 3
    assert pool.pages_for(1) == 1 and pool.pages_for(8) == 1
    assert pool.pages_for(9) == 2 and pool.pages_for(0) == 1


def test_write_segment_then_paged_attention_matches_dense_cache():
    """Prefill KV through pages == the dense cache path, end to end."""
    config = tiny_config()
    L, KVH, hs = config.n_layers, config.n_kv_heads, config.head_size
    page = 8
    T = 19  # spans 3 pages
    rng = np.random.default_rng(3)

    pool = PagePool.create(config, n_pages=5, page_size=page)
    table = np.asarray(pool.alloc(pool.pages_for(T)), np.int32)
    assert len(table) == 3

    k_rows = jnp.asarray(rng.standard_normal((L, T, KVH, hs), dtype=np.float32))
    v_rows = jnp.asarray(rng.standard_normal((L, T, KVH, hs), dtype=np.float32))
    pool = write_segment(pool, k_rows, v_rows, table, 0)

    q = jnp.asarray(
        rng.standard_normal((1, 1, config.n_heads, hs), dtype=np.float32)
    )
    l = 1  # check one layer's plane
    got = paged_decode_attention(
        q,
        pool.k[l],
        pool.v[l],
        jnp.asarray(table[None, :]),
        jnp.asarray([T - 1], jnp.int32),
    )

    # dense reference
    S = 3 * page
    k_dense = jnp.zeros((1, KVH, S, hs)).at[0, :, :T].set(
        k_rows[l].transpose(1, 0, 2)
    )
    v_dense = jnp.zeros((1, KVH, S, hs)).at[0, :, :T].set(
        v_rows[l].transpose(1, 0, 2)
    )
    want = ops.attention(q, k_dense, v_dense, T - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_append_decode_rows():
    """Decode appends land at (page, row) and update attention results."""
    config = tiny_config()
    L, KVH, hs = config.n_layers, config.n_kv_heads, config.head_size
    page = 8
    pool = PagePool.create(config, n_pages=4, page_size=page)
    rng = np.random.default_rng(7)

    # two slots at positions 7 (page 0 full -> next lands in page 1) and 2
    tables = np.asarray([[0, 1], [2, 2]], np.int32)
    positions = np.asarray([7, 2])

    # fill existing rows
    for b in range(2):
        T = positions[b]
        if T:
            rows_k = jnp.asarray(rng.standard_normal((L, T, KVH, hs), dtype=np.float32))
            rows_v = jnp.asarray(rng.standard_normal((L, T, KVH, hs), dtype=np.float32))
            pool = write_segment(pool, rows_k, rows_v, tables[b], 0)

    k_new = jnp.asarray(rng.standard_normal((L, 2, KVH, hs), dtype=np.float32))
    v_new = jnp.asarray(rng.standard_normal((L, 2, KVH, hs), dtype=np.float32))
    page_ids = jnp.asarray(tables[np.arange(2), positions // page], jnp.int32)
    row_ids = jnp.asarray(positions % page, jnp.int32)
    pool = append(pool, k_new, v_new, page_ids, row_ids)

    # the new rows are now readable at their logical position
    for b in range(2):
        l = 0
        pg, row = int(page_ids[b]), int(row_ids[b])
        np.testing.assert_allclose(
            np.asarray(pool.k[l, pg, :, row]), np.asarray(k_new[l, b]), atol=0
        )


def test_paged_q8_stacked_vs_dequant_oracle():
    """INT8 paged decode attention (fused append + per-row scale folding)
    matches the dequantize-then-attend oracle; pools get the appended rows
    and scales at the (write_page, write_row) coordinates."""
    from llama2_tpu.ops.pallas.attention_q8 import (
        dequantize_kv,
        quantize_kv_rows,
    )
    from llama2_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_q8_stacked,
    )

    L, P, KVH, page, hs = 2, 4, 2, 128, 32
    B, H = 2, 4  # GQA x2
    rng = np.random.default_rng(3)
    kf = rng.standard_normal((L, P, KVH, page, hs)).astype(np.float32)
    vf = rng.standard_normal((L, P, KVH, page, hs)).astype(np.float32)
    k8, ks = quantize_kv_rows(jnp.asarray(kf))
    v8, vs = quantize_kv_rows(jnp.asarray(vf))

    tables = np.stack([rng.permutation(P)[:2] for _ in range(B)]).astype(np.int32)
    positions = np.asarray([page + 2, 40], np.int32)  # 2 pages / 1 page deep
    wpage = tables[np.arange(B), positions // page]
    wrow = positions % page

    q = jnp.asarray(rng.standard_normal((B, H, hs)).astype(np.float32))
    knew = rng.standard_normal((B, KVH, 1, hs)).astype(np.float32)
    vnew = rng.standard_normal((B, KVH, 1, hs)).astype(np.float32)
    k8n, ksn = quantize_kv_rows(jnp.asarray(knew))
    v8n, vsn = quantize_kv_rows(jnp.asarray(vnew))

    layer = 1
    att, k8o, kso, v8o, vso = paged_decode_attention_q8_stacked(
        q, k8, ks, v8, vs, jnp.asarray(tables),
        k8n, ksn, v8n, vsn,
        jnp.asarray(wpage), jnp.asarray(wrow), layer, jnp.asarray(positions),
    )

    # appended rows + scales landed at the write coords (layer 1 only)
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(k8o[layer, wpage[b], :, wrow[b]]),
            np.asarray(k8n[b, :, 0]),
        )
        np.testing.assert_array_equal(
            np.asarray(vso[layer, wpage[b], :, wrow[b]]),
            np.asarray(vsn[b, :, 0]),
        )
    np.testing.assert_array_equal(np.asarray(k8o[0]), np.asarray(k8[0]))

    # attention == dequantize the POST-APPEND pools, gather, attend
    want = paged_attention_oracle(
        q,
        dequantize_kv(k8o[layer], kso[layer]),
        dequantize_kv(v8o[layer], vso[layer]),
        jnp.asarray(tables),
        jnp.asarray(positions),
    )
    np.testing.assert_allclose(
        np.asarray(att), np.asarray(want[:, 0]), atol=3e-2
    )


def test_paged_q8_page_size_validation():
    from llama2_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_q8_stacked,
    )

    L, P, KVH, page, hs = 1, 2, 1, 64, 32  # page % 128 != 0
    z8 = jnp.zeros((L, P, KVH, page, hs), jnp.int8)
    zs = jnp.zeros((L, P, KVH, page), jnp.float32)
    with pytest.raises(ValueError, match="page_size"):
        paged_decode_attention_q8_stacked(
            jnp.zeros((1, 1, hs)), z8, zs, z8, zs,
            jnp.zeros((1, 1), jnp.int32),
            jnp.zeros((1, KVH, 1, hs), jnp.int8),
            jnp.zeros((1, KVH, 1), jnp.float32),
            jnp.zeros((1, KVH, 1, hs), jnp.int8),
            jnp.zeros((1, KVH, 1), jnp.float32),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            0, jnp.zeros((1,), jnp.int32),
        )


def test_pagepool_q8_memory_shapes():
    """INT8 pools hold 4x the tokens per byte (+ per-row scale sidecar)."""
    config = tiny_config()
    fp = PagePool.create(config, n_pages=4, page_size=8)
    q8 = PagePool.create(config, n_pages=4, page_size=8, kv_quant=True)
    assert q8.kv_quant and not fp.kv_quant
    assert q8.k.dtype == jnp.int8
    assert q8.ks.shape == q8.k.shape[:-1]
    assert q8.k.nbytes * 4 == fp.k.nbytes


def test_paged_q8_fused_vs_composed():
    """The glue-fused paged kernel (RoPE + quantize + append + table-chase,
    paged_attention.paged_decode_attention_q8_fused) must reproduce the
    composed path: XLA apply_rope + quantize_kv_rows +
    paged_decode_attention_q8_stacked."""
    from llama2_tpu.ops import xla as xops
    from llama2_tpu.ops.pallas.attention_q8 import quantize_kv_rows
    from llama2_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_q8_fused,
        paged_decode_attention_q8_stacked,
    )

    L, P, KVH, page, hs = 2, 4, 2, 128, 128
    B, H = 2, 4
    rng = np.random.default_rng(5)
    k8, ks = quantize_kv_rows(
        jnp.asarray(rng.standard_normal((L, P, KVH, page, hs), np.float32))
    )
    v8, vs = quantize_kv_rows(
        jnp.asarray(rng.standard_normal((L, P, KVH, page, hs), np.float32))
    )
    tables = np.stack(
        [rng.permutation(P)[:2] for _ in range(B)]
    ).astype(np.int32)
    positions = np.asarray([page + 2, 40], np.int32)
    wpage = tables[np.arange(B), positions // page]
    wrow = positions % page
    qkv = jnp.asarray(
        rng.standard_normal((B, H + 2 * KVH, hs), np.float32)
    )

    cos, sin = xops.rope_angles(jnp.asarray(positions)[:, None], hs)
    q = xops.apply_rope(qkv[:, :H][:, None], cos, sin)[:, 0]
    kn = xops.apply_rope(qkv[:, H : H + KVH][:, None], cos, sin)[:, 0]
    k8n, ksn = quantize_kv_rows(kn[:, :, None, :])
    v8n, vsn = quantize_kv_rows(qkv[:, H + KVH :][:, :, None, :])
    layer = 1
    att_ref, k8r, ksr, v8r, vsr = paged_decode_attention_q8_stacked(
        q, jnp.array(k8), jnp.array(ks), jnp.array(v8), jnp.array(vs),
        jnp.asarray(tables), k8n, ksn, v8n, vsn,
        jnp.asarray(wpage), jnp.asarray(wrow), layer,
        jnp.asarray(positions),
    )

    att_f, k8f, ksf, v8f, vsf = paged_decode_attention_q8_fused(
        qkv, jnp.array(k8), jnp.array(ks), jnp.array(v8), jnp.array(vs),
        jnp.asarray(tables),
        jnp.repeat(cos[:, 0], 2, -1), jnp.repeat(sin[:, 0], 2, -1),
        jnp.asarray(wpage), jnp.asarray(wrow), layer,
        jnp.asarray(positions), n_heads=H,
    )
    np.testing.assert_allclose(
        np.asarray(att_f), np.asarray(att_ref[:, 0] if att_ref.ndim == 4 else att_ref),
        atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(k8f), np.asarray(k8r))
    np.testing.assert_array_equal(np.asarray(v8f), np.asarray(v8r))
    np.testing.assert_allclose(np.asarray(ksf), np.asarray(ksr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vsf), np.asarray(vsr), rtol=1e-6)


def test_paged_engine_q8_fused_page128_matches_dense_engine():
    """A paged INT8 engine with page_size=128 (the glue-fused kernel's
    compiled-path gate) emits the same streams as the dense engine."""
    from llama2_tpu.config import GenerationConfig, ModelConfig
    from llama2_tpu.models.llama import fuse_layer_params
    from llama2_tpu.quant.q8 import quantize_params
    from llama2_tpu.runtime.batch_engine import BatchEngine
    from llama2_tpu.runtime.paged_engine import PagedBatchEngine

    cfg = ModelConfig(
        dim=64, hidden_dim=172, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=256, seq_len=256, norm_eps=1e-5,
    )
    rng = np.random.default_rng(7)

    def r(*s):
        return rng.standard_normal(s, np.float32) * 0.1

    L, D, HD, V, KV = 2, 64, 172, 256, cfg.kv_dim
    params = {
        "tok_emb": r(V, D), "rms_att": 1 + r(L, D), "wq": r(L, D, D),
        "wk": r(L, D, KV), "wv": r(L, D, KV), "wo": r(L, D, D),
        "rms_ffn": 1 + r(L, D), "w1": r(L, D, HD), "w2": r(L, HD, D),
        "w3": r(L, D, HD), "rms_final": 1 + r(D), "wcls": r(D, V),
    }
    qp = quantize_params(params, group_size=16)
    gen = GenerationConfig(temperature=0.0, steps=20)
    prompts = [[5, 7, 9], [3, 4], [11]]

    def serve(engine):
        qs = [engine.submit(p, gen) for p in prompts]
        engine.run_until_idle()
        return [q.get(timeout=300).tokens for q in qs]

    dense = serve(
        BatchEngine(cfg, qp, batch_size=2, backend="pallas", kv_quant=True)
    )
    paged = serve(
        PagedBatchEngine(
            cfg, qp, batch_size=2, page_size=128, n_pages=8,
            backend="pallas", kv_quant=True,
        )
    )
    assert paged == dense


def test_paged_f32_fused_vs_composed():
    """The fp-pool glue-fused paged kernel
    (paged_attention.paged_decode_attention_fused) must reproduce the
    composed path: XLA apply_rope + paged_decode_attention_stacked."""
    from llama2_tpu.ops import xla as xops
    from llama2_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_fused,
        paged_decode_attention_stacked,
    )

    L, P, KVH, page, hs = 2, 4, 2, 64, 128
    B, H = 2, 4
    rng = np.random.default_rng(9)
    k_pool = jnp.asarray(
        rng.standard_normal((L, P, KVH, page, hs), np.float32)
    )
    v_pool = jnp.asarray(
        rng.standard_normal((L, P, KVH, page, hs), np.float32)
    )
    tables = np.stack(
        [rng.permutation(P)[:2] for _ in range(B)]
    ).astype(np.int32)
    positions = np.asarray([page + 2, 40], np.int32)
    wpage = tables[np.arange(B), positions // page]
    wrow = positions % page
    qkv = jnp.asarray(
        rng.standard_normal((B, H + 2 * KVH, hs), np.float32)
    )

    cos, sin = xops.rope_angles(jnp.asarray(positions)[:, None], hs)
    q = xops.apply_rope(qkv[:, :H][:, None], cos, sin)[:, 0]
    kn = xops.apply_rope(qkv[:, H : H + KVH][:, None], cos, sin)[:, 0]
    layer = 1
    att_ref, kr, vr = paged_decode_attention_stacked(
        q, jnp.array(k_pool), jnp.array(v_pool), jnp.asarray(tables),
        kn[:, :, None, :], qkv[:, H + KVH :][:, :, None, :],
        jnp.asarray(wpage), jnp.asarray(wrow), layer,
        jnp.asarray(positions),
    )
    att_f, kf, vf = paged_decode_attention_fused(
        qkv, jnp.array(k_pool), jnp.array(v_pool), jnp.asarray(tables),
        jnp.repeat(cos[:, 0], 2, -1), jnp.repeat(sin[:, 0], 2, -1),
        jnp.asarray(wpage), jnp.asarray(wrow), layer,
        jnp.asarray(positions), n_heads=H,
    )
    ref = att_ref[:, 0] if att_ref.ndim == 4 else att_ref
    np.testing.assert_allclose(np.asarray(att_f), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kf), np.asarray(kr), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vf), np.asarray(vr), rtol=1e-6, atol=1e-6
    )


def test_paged_engine_f32_fused_matches_dense_engine():
    """A paged fp-KV engine under --kernels pallas (the fp glue-fused
    kernel's path) emits the same streams as the dense engine."""
    from llama2_tpu.config import GenerationConfig, ModelConfig
    from llama2_tpu.quant.q8 import quantize_params
    from llama2_tpu.runtime.batch_engine import BatchEngine
    from llama2_tpu.runtime.paged_engine import PagedBatchEngine

    cfg = ModelConfig(
        dim=64, hidden_dim=172, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=256, seq_len=256, norm_eps=1e-5,
    )
    rng = np.random.default_rng(11)

    def r(*s):
        return rng.standard_normal(s, np.float32) * 0.1

    L, D, HD, V, KV = 2, 64, 172, 256, cfg.kv_dim
    params = {
        "tok_emb": r(V, D), "rms_att": 1 + r(L, D), "wq": r(L, D, D),
        "wk": r(L, D, KV), "wv": r(L, D, KV), "wo": r(L, D, D),
        "rms_ffn": 1 + r(L, D), "w1": r(L, D, HD), "w2": r(L, HD, D),
        "w3": r(L, D, HD), "rms_final": 1 + r(D), "wcls": r(D, V),
    }
    qp = quantize_params(params, group_size=16)
    gen = GenerationConfig(temperature=0.0, steps=20)
    prompts = [[5, 7, 9], [3, 4], [11]]

    def serve(engine):
        qs = [engine.submit(p, gen) for p in prompts]
        engine.run_until_idle()
        return [q.get(timeout=300).tokens for q in qs]

    dense = serve(BatchEngine(cfg, qp, batch_size=2, backend="pallas"))
    paged = serve(
        PagedBatchEngine(
            cfg, qp, batch_size=2, page_size=64, n_pages=16,
            backend="pallas",
        )
    )
    assert paged == dense


def test_paged_tail_qkv_matches_composed(monkeypatch):
    """The paged 2-launch layer (fused paged attention + wo/FFN/next-qkv
    megakernel) must emit the same streams as the paged composed path,
    both KV dtypes (shapes pass the megakernel's gate: D%128, bh%128,
    hs=128). Dense-vs-paged is NOT asserted at int8: the online-softmax
    partial order differs between 128-row pages and the dense kernel's
    block size, and bf16 near-ties on random weights legitimately flip."""
    import llama2_tpu.ops.pallas.mlp_block as MB
    from llama2_tpu.config import GenerationConfig, ModelConfig
    from llama2_tpu.quant.q8 import quantize_params
    from llama2_tpu.runtime.paged_engine import PagedBatchEngine

    cfg = ModelConfig(
        dim=256, hidden_dim=384, n_layers=2, n_heads=2, n_kv_heads=2,
        vocab_size=128, seq_len=256, norm_eps=1e-5,
    )
    rng = np.random.default_rng(13)

    def r(*s):
        return rng.standard_normal(s, np.float32) * 0.05

    L, D, HD, V, KV = 2, 256, 384, 128, cfg.kv_dim
    params = {
        "tok_emb": r(V, D), "rms_att": 1 + r(L, D), "wq": r(L, D, D),
        "wk": r(L, D, KV), "wv": r(L, D, KV), "wo": r(L, D, D),
        "rms_ffn": 1 + r(L, D), "w1": r(L, D, HD), "w2": r(L, HD, D),
        "w3": r(L, D, HD), "rms_final": 1 + r(D), "wcls": r(D, V),
    }
    qp = quantize_params(params, group_size=64)
    gen = GenerationConfig(temperature=0.0, steps=16)
    prompts = [[5, 7, 9], [3, 4]]

    def serve(engine):
        qs = [engine.submit(p, gen) for p in prompts]
        engine.run_until_idle()
        return [q.get(timeout=300).tokens for q in qs]

    def paged(kvq):
        return serve(
            PagedBatchEngine(
                cfg, qp, batch_size=2, page_size=128, n_pages=8,
                backend="pallas", kv_quant=kvq,
            )
        )

    for kvq in (False, True):
        with_tail = paged(kvq)
        monkeypatch.setattr(MB, "layer_tail_qkv_supported", lambda *a: False)
        composed = paged(kvq)
        monkeypatch.undo()
        assert with_tail == composed, f"kv_quant={kvq}"
