"""Ring attention + sequence-parallel prefill vs dense oracles.

The reference has no long-context/sequence-parallel story to mirror
(SURVEY.md section 5, long-context row: ABSENT); these tests validate the
new TPU-native component on a virtual multi-device CPU mesh, the pattern
SURVEY.md section 4 prescribes for multi-chip code.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config, random_params

from llama2_tpu.parallel.ring import dense_causal_attention, ring_attention
from llama2_tpu.parallel.sp import (
    cache_from_segments,
    make_seq_mesh,
    sp_prefill,
)


def _qkv(B, T, H, KVH, hs, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, hs), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, KVH, hs), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, KVH, hs), dtype=np.float32))
    return q, k, v


@pytest.mark.parametrize("shards", [2, 4, 8])
@pytest.mark.parametrize("gqa", [False, True])
def test_ring_attention_matches_dense(shards, gqa):
    B, T, H, hs = 2, 32, 4, 16
    KVH = 2 if gqa else H
    q, k, v = _qkv(B, T, H, KVH, hs)
    mesh = make_seq_mesh(shards)
    out = ring_attention(q, k, v, mesh)
    want = dense_causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_ring_attention_single_shard_degenerate():
    q, k, v = _qkv(1, 8, 2, 2, 8, seed=3)
    mesh = make_seq_mesh(1)
    out = ring_attention(q, k, v, mesh)
    want = dense_causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_ring_attention_rejects_indivisible():
    q, k, v = _qkv(1, 30, 2, 2, 8)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, make_seq_mesh(4))


@pytest.mark.parametrize("shards", [2, 4])
def test_sp_prefill_matches_dense_forward(shards):
    from llama2_tpu.models.llama import forward, init_cache

    config = tiny_config()
    params = {k: jnp.asarray(v) for k, v in random_params(config).items()}
    T = 32
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (1, T)), jnp.int32
    )
    mesh = make_seq_mesh(shards)

    hidden_sp, k_seg, v_seg = sp_prefill(params, tokens, config, mesh)

    cache = init_cache(config, 1)
    hidden, cache_dense = forward(params, cache, tokens, 0, config)

    np.testing.assert_allclose(
        np.asarray(hidden_sp), np.asarray(hidden), atol=3e-5
    )

    # KV segments equal the dense cache's first T positions
    filled = cache_from_segments(init_cache(config, 1), k_seg, v_seg, mesh)
    np.testing.assert_allclose(
        np.asarray(filled["k"][:, :, :, :T]),
        np.asarray(cache_dense["k"][:, :, :, :T]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(filled["v"][:, :, :, :T]),
        np.asarray(cache_dense["v"][:, :, :, :T]),
        atol=2e-5,
    )


def test_sp_prefill_then_decode_token_identical():
    """SP prefill feeding the normal decode path = dense end-to-end tokens."""
    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
    from llama2_tpu.ops import sampling

    config = tiny_config()
    params = {k: jnp.asarray(v) for k, v in random_params(config).items()}
    T = 16
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, T)), jnp.int32)
    mesh = make_seq_mesh(4)

    # SP path
    hidden_sp, k_seg, v_seg = sp_prefill(params, tokens, config, mesh)
    cache_sp = cache_from_segments(init_cache(config, 1), k_seg, v_seg, mesh)
    logits_sp = logits_from_hidden(params, hidden_sp[:, -1:, :])
    tok_sp = sampling.sample_argmax(logits_sp[:, -1, :])

    # dense path
    cache = init_cache(config, 1)
    hidden, cache = forward(params, cache, tokens, 0, config)
    logits = logits_from_hidden(params, hidden[:, -1:, :])
    tok = sampling.sample_argmax(logits[:, -1, :])

    assert int(tok_sp[0]) == int(tok[0])

    # one more decode step from each cache
    for c, t in ((cache_sp, tok_sp), (cache, tok)):
        h2, _ = forward(params, c, t[:, None], T, config)
        l2 = logits_from_hidden(params, h2)
        nxt = int(sampling.sample_argmax(l2[:, -1, :])[0])
        if c is cache_sp:
            nxt_sp = nxt
    assert nxt_sp == nxt


@pytest.mark.parametrize("sp,tp", [(2, 2), (4, 2), (2, 4)])
def test_sp_tp_composition_matches_dense(sp, tp):
    """Ring attention over `seq` composes with Megatron TP over `model` on a
    2-D mesh: hidden states and KV segments equal the dense forward."""
    from llama2_tpu.models.llama import forward, init_cache
    from llama2_tpu.parallel.sp import make_sp_tp_mesh

    config = tiny_config()  # n_heads=4, n_kv_heads=2
    if config.n_kv_heads % tp:
        # tp must divide n_kv_heads: widen kv heads for the tp=4 leg so the
        # composition is exercised instead of skipped
        config = dataclasses.replace(config, n_kv_heads=4)
    params = {k: jnp.asarray(v) for k, v in random_params(config).items()}
    T = 16
    rng = np.random.default_rng(13)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, T)), jnp.int32)
    mesh = make_sp_tp_mesh(sp, tp)

    hidden_sp, k_seg, v_seg = sp_prefill(
        params, tokens, config, mesh, model_axis="model"
    )
    hidden, cache_dense = forward(params, init_cache(config, 1), tokens, 0, config)

    np.testing.assert_allclose(
        np.asarray(hidden_sp), np.asarray(hidden), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(k_seg[:, :, :, :T]),
        np.asarray(cache_dense["k"][:, :, :, :T]),
        atol=2e-5,
    )
