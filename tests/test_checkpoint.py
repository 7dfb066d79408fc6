"""Checkpoint format tests: round-trip, header semantics, layout."""

import numpy as np
import pytest

from llama2_tpu.config import ModelConfig
from llama2_tpu.io.checkpoint import load_checkpoint, save_checkpoint

from conftest import tiny_config, random_params


def test_roundtrip_shared(tmp_path):
    config = tiny_config()
    params = random_params(config, seed=3)
    path = str(tmp_path / "ck.bin")
    save_checkpoint(path, config, params, shared_weights=True)

    config2, params2, shared = load_checkpoint(path)
    assert shared is True
    assert config2 == config
    for k, v in params.items():
        np.testing.assert_array_equal(params2[k], v, err_msg=k)


def test_roundtrip_unshared(tmp_path):
    config = tiny_config()
    params = random_params(config, seed=4)
    # give wcls its own values so sharing would be detectable
    params["wcls"] = np.random.default_rng(9).standard_normal(
        (config.dim, config.vocab_size)
    ).astype(np.float32)
    path = str(tmp_path / "ck.bin")
    save_checkpoint(path, config, params, shared_weights=False)

    config2, params2, shared = load_checkpoint(path)
    assert shared is False
    assert config2 == config
    np.testing.assert_array_equal(params2["wcls"], params["wcls"])


def test_negative_vocab_header_is_unshared(tmp_path):
    # vocab_size < 0 in the header signals unshared weights (main.zig:942-944)
    config = tiny_config()
    params = random_params(config, seed=5)
    path = str(tmp_path / "ck.bin")
    save_checkpoint(path, config, params, shared_weights=False)
    raw = np.fromfile(path, dtype=np.int32, count=7)
    assert raw[5] == -config.vocab_size


def test_shared_wcls_aliases_embedding(tmp_path):
    config = tiny_config()
    params = random_params(config, seed=6)
    path = str(tmp_path / "ck.bin")
    save_checkpoint(path, config, params, shared_weights=True)
    _, params2, _ = load_checkpoint(path)
    np.testing.assert_array_equal(params2["wcls"], params2["tok_emb"].T)


def test_truncated_file_raises(tmp_path):
    path = str(tmp_path / "short.bin")
    with open(path, "wb") as f:
        f.write(b"\x00" * 12)
    with pytest.raises(ValueError):
        load_checkpoint(path)


def test_matmul_layout_against_flat_file(tmp_path):
    """wq row-major (out,in) in the file must land transposed as (in,out)."""
    config = ModelConfig(
        dim=4, hidden_dim=6, n_layers=1, n_heads=2, n_kv_heads=2,
        vocab_size=8, seq_len=4,
    )
    params = random_params(config, seed=7)
    path = str(tmp_path / "ck.bin")
    save_checkpoint(path, config, params, shared_weights=True)

    raw = np.fromfile(path, dtype=np.float32, offset=28)
    off = config.vocab_size * config.dim + config.n_layers * config.dim
    wq_file = raw[off : off + config.dim * config.dim].reshape(config.dim, config.dim)
    _, params2, _ = load_checkpoint(path)
    x = np.arange(config.dim, dtype=np.float32)
    # reference computes W(d,n) @ x(n); our layout computes x @ wq -> same vector
    np.testing.assert_allclose(wq_file @ x, x @ params2["wq"][0], rtol=1e-6)


def test_param_cache_roundtrip(tmp_path):
    from llama2_tpu.io.cache import is_cache_dir, load_cache, save_cache
    from llama2_tpu.io import load_any
    from llama2_tpu.quant.q8 import QuantTensor, quantize_params

    config = tiny_config()
    params = quantize_params(random_params(config, seed=8), 32)
    d = str(tmp_path / "cache")
    save_cache(d, config, params)
    assert is_cache_dir(d)

    config2, loaded, _ = load_cache(d)
    assert config2 == config
    for k, v in params.items():
        if isinstance(v, QuantTensor):
            np.testing.assert_array_equal(np.asarray(loaded[k].q), np.asarray(v.q))
            np.testing.assert_array_equal(np.asarray(loaded[k].scale), np.asarray(v.scale))
            assert loaded[k].group_size == v.group_size
        else:
            np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(v))

    config3, loaded2, shared = load_any(d)  # directory sniffing
    assert config3 == config and shared is False
