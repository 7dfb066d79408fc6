"""Oracle generation-parity across a config matrix (VERDICT round-1 item 5).

Every row builds a random checkpoint of that shape, generates argmax streams
with the independent numpy oracle (tests/oracle.py — reference semantics,
main.zig:285-430 / 987-1042), and asserts the engine emits identical token
IDs. Rows cover the reference's structural corners:

  * unshared classifier (``vocab_size < 0`` header sentinel, main.zig:942-944)
  * MQA (``n_kv_heads == 1``; kv_mul replication, main.zig:291)
  * GQA with lane-padded pallas kernels (head_size not a multiple of 128)
  * INT8 with an odd hidden_dim (group size falls back to gcd)
  * INT8 through the fused pallas kernels (interpret mode on CPU)

INT8 rows compare against the oracle run on the DEQUANTIZED weights — the
engine computes with exactly those effective weights, so argmax parity is the
correct bar (quantization error itself is measured in test_perplexity.py).
"""

import dataclasses

import numpy as np
import pytest

from conftest import random_params
from llama2_tpu.config import GenerationConfig, ModelConfig
from llama2_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from llama2_tpu.quant.q8 import QuantTensor, dequantize, quantize_params
from llama2_tpu.runtime.generator import Generator

from oracle import OracleModel


def _cfg(**kw) -> ModelConfig:
    base = dict(dim=64, hidden_dim=172, n_layers=3, n_heads=4, n_kv_heads=2,
                vocab_size=512, seq_len=96)
    base.update(kw)
    return ModelConfig(**base)


# (name, config, shared_classifier, quantize, backend)
MATRIX = [
    ("gqa_shared_xla", _cfg(), True, False, "xla"),
    ("unshared_cls_xla", _cfg(), False, False, "xla"),
    ("mqa_xla", _cfg(n_kv_heads=1), True, False, "xla"),
    ("mha_odd_dim_xla", _cfg(dim=60, n_heads=6, n_kv_heads=6,
                             hidden_dim=144), True, False, "xla"),
    ("lane_pad_pallas", _cfg(), True, False, "pallas"),
    ("mqa_unshared_pallas", _cfg(n_kv_heads=1), False, False, "pallas"),
    ("int8_odd_group_xla", _cfg(), True, True, "xla"),
    # fused pallas kernels in accurate mode (f32 HIGHEST dequant-dot) are
    # token-exact; the production "fast" mode (per-group bf16 MXU dots) may
    # flip genuine near-ties and gets its own near-tie-aware test below
    ("int8_pallas", _cfg(hidden_dim=128), False, True, "pallas-accurate"),
]


def _unshare(params: dict, seed: int) -> dict:
    """Give the classifier its own weights (vocab<0 path): wcls must stop
    aliasing tok_emb or the row tests nothing."""
    rng = np.random.default_rng(seed + 1000)
    out = dict(params)
    out["wcls"] = (
        0.08 * rng.standard_normal(params["wcls"].shape).astype(np.float32)
    )
    return out


@pytest.mark.parametrize("name,config,shared,quant,backend",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_generation_parity_matrix(tmp_path, name, config, shared, quant, backend):
    params = random_params(config, seed=hash(name) % 2**31)
    if not shared:
        params = _unshare(params, 7)
    path = str(tmp_path / f"{name}.bin")
    save_checkpoint(path, config, params, shared_weights=shared)

    # round-trip through the real loader (header sentinel, aliasing, order)
    config2, loaded, got_shared = load_checkpoint(path)
    assert config2 == config and got_shared == shared

    if quant:
        loaded = quantize_params(loaded)
        # oracle runs on the dequantized effective weights
        eff = {
            k: np.asarray(dequantize(v)) if isinstance(v, QuantTensor)
            else np.asarray(v)
            for k, v in loaded.items()
        }
        opath = str(tmp_path / f"{name}_dq.bin")
        save_checkpoint(opath, config, eff, shared_weights=False)
        oracle = OracleModel(opath)
    else:
        oracle = OracleModel(path)

    g = Generator(config, loaded, backend=backend)
    if backend == "pallas":
        assert g.lane_pad == (config.head_size % 128 != 0)

    for prompt, steps in ([], 56), ([5, 17, 320 % config.vocab_size, 9], 40):
        oracle.key_cache[:] = 0
        oracle.value_cache[:] = 0
        want = oracle.generate_argmax(prompt, steps=steps)
        got = g.generate(prompt, GenerationConfig(temperature=0.0, steps=steps))
        assert got.tokens == want, (
            f"{name} prompt={prompt}: {got.tokens[:12]}... != {want[:12]}..."
        )


def test_int8_pallas_fast_divergence_is_near_tie_only(tmp_path):
    """The fast INT8 kernels (per-group bf16 MXU dots) may flip argmax only
    on genuine near-ties: at the first diverging step the oracle's top-2
    logit gap must be below bf16 resolution at that magnitude."""
    config = _cfg(hidden_dim=128)
    params = _unshare(random_params(config, seed=1234), 9)
    path = str(tmp_path / "fast.bin")
    save_checkpoint(path, config, params, shared_weights=False)
    _, loaded, _ = load_checkpoint(path)
    q = quantize_params(loaded)
    eff = {
        k: np.asarray(dequantize(v)) if isinstance(v, QuantTensor)
        else np.asarray(v)
        for k, v in q.items()
    }
    opath = str(tmp_path / "fast_dq.bin")
    save_checkpoint(opath, config, eff, shared_weights=False)
    oracle = OracleModel(opath)
    g = Generator(config, q, backend="pallas")

    for prompt in ([], [5, 17, 9]):
        oracle.key_cache[:] = 0
        oracle.value_cache[:] = 0
        want = oracle.generate_argmax(prompt, steps=48)
        got = g.generate(
            prompt, GenerationConfig(temperature=0.0, steps=48)
        ).tokens
        div = next(
            (i for i, (a, b) in enumerate(zip(got, want)) if a != b), None
        )
        if div is None:
            continue
        # replay the oracle to the diverging position; measure the tie gap
        oracle.key_cache[:] = 0
        oracle.value_cache[:] = 0
        stream = [1] + want
        for pos in range(div + 1):
            logits = oracle.forward(stream[pos], pos)
        srt = np.sort(logits)
        gap = float(srt[-1] - srt[-2])
        tol = max(abs(float(srt[-1])), 1.0) * 2 ** -7  # bf16 mantissa step
        assert gap < tol, (
            f"fast-kernel divergence at step {div} is NOT a near-tie: "
            f"gap {gap} vs tol {tol}"
        )


def test_unshared_header_sentinel_roundtrip(tmp_path):
    """vocab_size < 0 on disk, abs() in config, independent wcls loaded."""
    config = _cfg()
    params = _unshare(random_params(config, seed=3), 3)
    path = str(tmp_path / "unshared.bin")
    save_checkpoint(path, config, params, shared_weights=False)
    import struct

    with open(path, "rb") as f:
        header = struct.unpack("<7i", f.read(28))
    assert header[5] == -config.vocab_size
    config2, loaded, shared = load_checkpoint(path)
    assert config2.vocab_size == config.vocab_size and not shared
    assert not np.allclose(np.asarray(loaded["wcls"]),
                           np.asarray(loaded["tok_emb"]).T)
