"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``), the standard way to validate
pjit/mesh code without a pod. Must run before jax is imported anywhere.
"""

import os
import sys

# The environment presets JAX_PLATFORMS=axon (the TPU tunnel) and the axon
# sitecustomize imports jax at interpreter startup, baking that choice in —
# env vars set here are too late. jax.config.update IS honored, so use it.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses without axon_site
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
TOKENIZER_BIN = os.path.join(FIXTURES, "tokenizer.bin")


def tiny_config():
    """A small but structurally complete llama2 config (GQA, odd sizes)."""
    from llama2_tpu.config import ModelConfig

    return ModelConfig(
        dim=64,
        hidden_dim=172,
        n_layers=3,
        n_heads=4,
        n_kv_heads=2,
        vocab_size=512,
        seq_len=96,
    )


def random_params(config, seed=0, scale=0.08):
    """Random weights in the loader's (transposed, layer-stacked) layout."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return rng.standard_normal(shape, dtype=np.float32) * scale

    L, D, HD, V = config.n_layers, config.dim, config.hidden_dim, config.vocab_size
    KV = config.kv_dim
    tok_emb = r(V, D)
    return {
        "tok_emb": tok_emb,
        "rms_att": 1.0 + r(L, D),
        "wq": r(L, D, D),
        "wk": r(L, D, KV),
        "wv": r(L, D, KV),
        "wo": r(L, D, D),
        "rms_ffn": 1.0 + r(L, D),
        "w1": r(L, D, HD),
        "w2": r(L, HD, D),
        "w3": r(L, D, HD),
        "rms_final": 1.0 + r(D,),
        "wcls": tok_emb.T.copy(),
    }


@pytest.fixture(scope="session")
def tiny_checkpoint(tmp_path_factory):
    """A tiny random llama2.c v0 checkpoint on disk (shared weights)."""
    from llama2_tpu.io.checkpoint import save_checkpoint

    config = tiny_config()
    params = random_params(config)
    path = tmp_path_factory.mktemp("ckpt") / "tiny.bin"
    save_checkpoint(str(path), config, params, shared_weights=True)
    return str(path), config, params


@pytest.fixture(scope="session")
def tokenizer():
    from llama2_tpu.tokenizer.tokenizer import Tokenizer

    return Tokenizer.from_file(TOKENIZER_BIN, 32000)
