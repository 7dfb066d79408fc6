"""Forward-pass and generation parity tests against the numpy oracle.

The oracle (tests/oracle.py) independently re-implements the reference
semantics from main.zig:285-430; parity is defined as identical argmax token
IDs (the reference itself is fast-math and not bit-stable, SURVEY.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama2_tpu.config import GenerationConfig
from llama2_tpu.io.checkpoint import load_checkpoint
from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
from llama2_tpu.runtime.generator import Generator

from oracle import OracleModel


@pytest.fixture(scope="module")
def loaded(tiny_checkpoint):
    path, config, _ = tiny_checkpoint
    config2, params, _ = load_checkpoint(path)
    assert config2 == config
    return path, config, params


def test_single_token_logits_match_oracle(loaded):
    path, config, params = loaded
    oracle = OracleModel(path)
    cache = init_cache(config)

    token = 7
    hidden, cache = forward(params, cache, jnp.asarray([[token]]), 0, config)
    ours = np.asarray(logits_from_hidden(params, hidden))[0, 0]
    ref = oracle.forward(token, 0)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_multi_position_logits_match_oracle(loaded):
    path, config, params = loaded
    oracle = OracleModel(path)
    cache = init_cache(config)

    tokens = [1, 42, 7, 400, 3, 99]
    for pos, tok in enumerate(tokens):
        ref = oracle.forward(tok, pos)
        hidden, cache = forward(params, cache, jnp.asarray([[tok]]), pos, config)
        ours = np.asarray(logits_from_hidden(params, hidden))[0, 0]
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-5)
        assert int(np.argmax(ours)) == int(np.argmax(ref)), f"argmax diverged at pos {pos}"


def test_prefill_equals_token_at_a_time(loaded):
    """Batched segment prefill must equal sequential decode (causality)."""
    _, config, params = loaded
    tokens = [1, 42, 7, 400, 3]

    cache_a = init_cache(config)
    hidden_a, cache_a = forward(params, cache_a, jnp.asarray([tokens]), 0, config)

    cache_b = init_cache(config)
    last_hidden = None
    for pos, tok in enumerate(tokens):
        last_hidden, cache_b = forward(params, cache_b, jnp.asarray([[tok]]), pos, config)

    np.testing.assert_allclose(
        np.asarray(hidden_a)[0, -1], np.asarray(last_hidden)[0, 0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cache_a["k"])[:, :, :, : len(tokens)],
        np.asarray(cache_b["k"])[:, :, :, : len(tokens)],
        rtol=1e-5,
        atol=1e-6,
    )


def test_generate_argmax_parity_no_prompt(loaded):
    path, config, params = loaded
    oracle = OracleModel(path)
    ref = oracle.generate_argmax([], steps=64)

    g = Generator(config, params)
    res = g.generate([], GenerationConfig(temperature=0.0, steps=64))
    assert res.tokens == ref


def test_generate_argmax_parity_with_prompt(loaded):
    path, config, params = loaded
    prompt = [5, 17, 320, 9]
    oracle = OracleModel(path)
    ref = oracle.generate_argmax(prompt, steps=48)

    g = Generator(config, params)
    res = g.generate(prompt, GenerationConfig(temperature=0.0, steps=48))
    assert res.tokens == ref
    assert res.tokens[: len(prompt)] == prompt  # prompt echo


def test_generate_chunked_prefill_matches_unchunked(loaded):
    path, config, params = loaded
    prompt = [5, 17, 320, 9, 44, 210]
    g = Generator(config, params)
    a = g.generate(prompt, GenerationConfig(temperature=0.0, steps=40))
    b = g.generate(prompt, GenerationConfig(temperature=0.0, steps=40), prefill_chunk=1)
    assert a.tokens == b.tokens


def test_generate_steps_clamping(loaded):
    _, config, params = loaded
    g = Generator(config, params)
    # steps=0 -> model max; steps beyond seq_len clamped (main.zig:992-993)
    res = g.generate([], GenerationConfig(temperature=0.0, steps=10_000))
    assert len(res.tokens) <= config.seq_len


def test_prompt_longer_than_steps_is_echoed_truncated(loaded):
    _, config, params = loaded
    g = Generator(config, params)
    prompt = list(range(2, 30))
    res = g.generate(prompt, GenerationConfig(temperature=0.0, steps=8))
    assert res.tokens == prompt[:8]


def test_bos_in_prompt_stops(loaded):
    _, config, params = loaded
    g = Generator(config, params)
    res = g.generate([5, 17, 1, 9], GenerationConfig(temperature=0.0, steps=32))
    assert res.tokens == [5, 17]


def test_sampled_generation_stays_in_vocab(loaded):
    _, config, params = loaded
    g = Generator(config, params)
    res = g.generate([], GenerationConfig(temperature=0.9, top_p=0.9, steps=32, seed=7))
    assert all(0 <= t < config.vocab_size for t in res.tokens)
    res2 = g.generate([], GenerationConfig(temperature=0.9, top_p=0.9, steps=32, seed=7))
    assert res.tokens == res2.tokens  # seeded runs reproduce
