"""Exact speculative decoding: token streams must equal plain greedy."""

import numpy as np
import pytest

from conftest import tiny_config, random_params

from llama2_tpu.config import GenerationConfig
from llama2_tpu.runtime.generator import Generator


@pytest.fixture(scope="module")
def model():
    config = tiny_config()
    return config, random_params(config)


@pytest.mark.parametrize("d", [2, 4, 8])
@pytest.mark.parametrize(
    "prompt,steps",
    [
        ([], 24),
        ([7, 12], 24),
        ([5, 9, 300, 9, 300], 30),  # repeated bigrams: drafting gets hits
        ([4], 3),  # tiny budget: steps clamp inside a draft window
        ([2, 3, 4, 5, 6, 7, 8], 9),  # budget barely past the prompt
    ],
)
def test_speculative_matches_plain_greedy(model, d, prompt, steps):
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=steps, seed=0)
    want = Generator(config, params).generate(prompt, gen).tokens
    got = Generator(config, params, speculative=d).generate(prompt, gen).tokens
    assert got == want, f"d={d} prompt={prompt}: {got} != {want}"


def test_speculative_full_length(model):
    """Full-seq_len generation exercises the padded-cache tail."""
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=0, seed=0)  # 0 = model max
    want = Generator(config, params).generate([9], gen).tokens
    got = Generator(config, params, speculative=4).generate([9], gen).tokens
    assert got == want


def test_speculative_ignored_for_sampling(model):
    """Stochastic modes fall back to the plain loop (spec is greedy-only)."""
    config, params = model
    gen = GenerationConfig(temperature=1.0, top_p=0.9, steps=12, seed=3)
    want = Generator(config, params).generate([7], gen).tokens
    got = Generator(config, params, speculative=4).generate([7], gen).tokens
    assert got == want  # same RNG stream: identical draws


def test_speculative_with_kv_quant(model):
    """Speculation composes with the int8 KV cache (padded scale arrays)."""
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=20, seed=0)
    want = Generator(config, params, kv_quant=True).generate([7, 12], gen).tokens
    got = (
        Generator(config, params, kv_quant=True, speculative=4)
        .generate([7, 12], gen)
        .tokens
    )
    assert got == want
