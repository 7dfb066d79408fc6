"""HF importer: logits must match transformers' LlamaForCausalLM.

This is the strongest possible check of the weight mapping (incl. the
rotate_half -> interleaved RoPE unpermute): identical logits means every
tensor landed in the right place with the right orientation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
from llama2_tpu.tools.import_hf import import_hf, main as import_main


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=172,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=512,
        max_position_embeddings=96,
        tie_word_embeddings=False,
        rms_norm_eps=1e-5,  # Llama-2's value; also v0 .bin's only value
    )
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("hf_llama")
    model.save_pretrained(d, safe_serialization=False)
    return str(d), model


def test_hf_import_logits_match(hf_model_dir):
    d, model = hf_model_dir
    config, params, shared = import_hf(d)
    assert config.dim == 64 and config.n_layers == 3 and config.n_kv_heads == 2
    assert not shared

    tokens = np.array([[1, 5, 42, 300, 7, 12]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()

    jp = {k: jnp.asarray(v) for k, v in params.items()}
    cache = init_cache(config, 1)
    hidden, _ = forward(jp, cache, jnp.asarray(tokens), 0, config)
    got = np.asarray(logits_from_hidden(jp, hidden))

    # fp32 everywhere; differences are reduction order only
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_hf_import_decode_positions_match(hf_model_dir):
    """Same check at a nonzero position (exercises RoPE angles per pos)."""
    d, model = hf_model_dir
    config, params, _ = import_hf(d)
    jp = {k: jnp.asarray(v) for k, v in params.items()}

    tokens = np.array([[3, 9, 100, 255]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()

    # feed token-at-a-time through the cache (decode path)
    cache = init_cache(config, 1)
    outs = []
    for t in range(tokens.shape[1]):
        hidden, cache = forward(
            jp, cache, jnp.asarray(tokens[:, t : t + 1]), t, config
        )
        outs.append(np.asarray(logits_from_hidden(jp, hidden))[:, 0])
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_hf_import_cli_roundtrip(hf_model_dir, tmp_path):
    d, model = hf_model_dir
    out = str(tmp_path / "imported.bin")
    assert import_main([d, out]) == 0

    from llama2_tpu.io.checkpoint import load_checkpoint

    config, params, shared = load_checkpoint(out)
    assert config.vocab_size == 512 and not shared

    tokens = np.array([[1, 5, 42]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    hidden, _ = forward(jp, init_cache(config, 1), jnp.asarray(tokens), 0, config)
    got = np.asarray(logits_from_hidden(jp, hidden))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_hf_import_cache_int8(hf_model_dir, tmp_path):
    d, _ = hf_model_dir
    out = str(tmp_path / "cache")
    assert import_main([d, out, "--cache", "--int8"]) == 0

    from llama2_tpu.io import load_any
    from llama2_tpu.quant.q8 import QuantTensor

    config, params, _ = load_any(out)
    assert isinstance(params["wq"], QuantTensor)
    assert config.dim == 64
    assert config.norm_eps == 1e-5  # preserved through the cache meta


def test_hf_import_nondefault_eps_preserved_in_cache(tmp_path):
    """rms_norm_eps != 1e-5 flows through the cache format (not v0 .bin)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=32, rms_norm_eps=1e-6,
    )
    d = str(tmp_path / "hf")
    LlamaForCausalLM(cfg).eval().save_pretrained(d, safe_serialization=False)
    out = str(tmp_path / "cache")
    assert import_main([d, out, "--cache"]) == 0

    from llama2_tpu.io import load_any

    config, _, _ = load_any(out)
    assert config.norm_eps == 1e-6
