"""ak42 v2 quantized checkpoint format tests: round-trip, conversion, header."""

import struct
import subprocess
import sys
import os

import numpy as np
import jax.numpy as jnp
import pytest

from llama2_tpu.config import GenerationConfig, ModelConfig
from llama2_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from llama2_tpu.io.quantized import (
    MAGIC,
    load_quantized_checkpoint,
    save_quantized_checkpoint,
)
from llama2_tpu.quant.q8 import QuantTensor, dequantize, quantize_params
from llama2_tpu.runtime.generator import Generator

from conftest import random_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gs_config():
    # dims divisible by a group size of 32
    return ModelConfig(
        dim=64, hidden_dim=160, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=256, seq_len=48,
    )


def test_roundtrip(tmp_path):
    config = gs_config()
    params = random_params(config, seed=2)
    qp = quantize_params(params, 32)
    path = str(tmp_path / "q.bin")
    save_quantized_checkpoint(path, config, qp, shared=False, group_size=32)

    config2, loaded, shared = load_quantized_checkpoint(path)
    assert config2 == config and shared is False
    for k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "wcls"):
        assert isinstance(loaded[k], QuantTensor)
        np.testing.assert_array_equal(np.asarray(loaded[k].q), np.asarray(qp[k].q), err_msg=k)
        np.testing.assert_allclose(
            np.asarray(loaded[k].scale), np.asarray(qp[k].scale), rtol=1e-6, err_msg=k
        )
    # tok_emb went through flat Q8: within one quantization step
    q = np.asarray(params["tok_emb"]).reshape(-1, 32)
    step = np.abs(q).max(axis=1, keepdims=True) / 127.0
    err = np.abs(loaded["tok_emb"].reshape(-1, 32) - q)
    assert (err <= step / 2 + 1e-7).all()


def test_magic_and_header(tmp_path):
    config = gs_config()
    qp = quantize_params(random_params(config, seed=3), 32)
    path = str(tmp_path / "q.bin")
    save_quantized_checkpoint(path, config, qp, shared=True, group_size=32)
    with open(path, "rb") as f:
        head = f.read(256)
    assert struct.unpack_from("<i", head, 0)[0] == MAGIC
    assert struct.unpack_from("<i", head, 4)[0] == 2
    assert head[36] == 1  # shared flag after 9 i32s


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "bad.bin")
    with open(path, "wb") as f:
        f.write(b"\x00" * 300)
    with pytest.raises(ValueError, match="magic"):
        load_quantized_checkpoint(path)


def test_shared_classifier_reuses_embedding(tmp_path):
    config = gs_config()
    qp = quantize_params(random_params(config, seed=4), 32)
    path = str(tmp_path / "q.bin")
    save_quantized_checkpoint(path, config, qp, shared=True, group_size=32)
    _, loaded, shared = load_quantized_checkpoint(path)
    assert shared is True
    # wcls dequantizes to tok_emb's transpose (same int8 data)
    np.testing.assert_allclose(
        np.asarray(dequantize(loaded["wcls"])), loaded["tok_emb"].T, rtol=1e-6, atol=1e-7
    )


def test_converter_cli_and_generation(tmp_path):
    """v0 → v2 conversion; INT8 model argmax tracks fp32 on a tiny fixture."""
    config = gs_config()
    params = random_params(config, seed=5)
    v0 = str(tmp_path / "m.bin")
    v2 = str(tmp_path / "m-q8.bin")
    save_checkpoint(v0, config, params, shared_weights=True)

    r = subprocess.run(
        [sys.executable, "-m", "llama2_tpu.quant.convert", v0, v2, "--group-size", "32"],
        capture_output=True,
        env={**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"},
        cwd=REPO,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr.decode()

    config2, qparams, shared = load_quantized_checkpoint(v2)
    assert config2 == config

    gen = GenerationConfig(temperature=0.0, steps=16)
    fp = Generator(config, params).generate([], gen)
    q8 = Generator(config2, qparams).generate([], gen)
    # INT8 quality: the argmax stream tracks fp32 for the first tokens
    match = sum(a == b for a, b in zip(fp.tokens, q8.tokens))
    assert match >= len(fp.tokens) * 0.7, (fp.tokens, q8.tokens)
