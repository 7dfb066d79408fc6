"""The 7B-proof tooling at tiny scale: random INT8 cache -> load -> host-fused
params -> continuous-batching engine, finite tokens out (benchmarks/bench7b.py
runs the same flow at Llama-2-7B shape on the chip)."""

import numpy as np

from benchmarks.bench7b import fuse_host, stream_bytes_per_step
from llama2_tpu.config import GenerationConfig, ModelConfig
from llama2_tpu.io.cache import load_cache, save_cache
from llama2_tpu.quant.q8 import QuantTensor
from llama2_tpu.runtime.batch_engine import BatchEngine
from llama2_tpu.tools.make_random_q8 import random_q8_params


def test_random_q8_cache_roundtrip_serves(tmp_path):
    config = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=4,
                         n_kv_heads=2, vocab_size=96, seq_len=48)
    params = random_q8_params(config, group_size=32, seed=1)
    d = str(tmp_path / "q8cache")
    save_cache(d, config, params, shared=False)
    config2, loaded, shared = load_cache(d)
    assert config2 == config and not shared

    fused = fuse_host(loaded)
    assert "wqkv" in fused and "wq" not in fused
    kv = config.kv_dim
    assert fused["wqkv"].q.shape == (2, 64, 64 + 2 * kv)

    # weight stream = every quantized tensor + norms, not the embedding
    wb = stream_bytes_per_step(fused)
    expect = sum(
        np.asarray(v.q).nbytes + np.asarray(v.scale).nbytes
        for v in fused.values() if isinstance(v, QuantTensor)
    ) + sum(np.asarray(fused[k]).nbytes
            for k in ("rms_att", "rms_ffn", "rms_final"))
    assert wb == expect

    eng = BatchEngine(config2, fused, batch_size=2, kv_quant=True)
    gen = GenerationConfig(temperature=0.0, steps=10)
    queues = [eng.submit([5, 7], gen), eng.submit([3], gen)]
    eng.run_until_idle()
    for q in queues:
        res = q.get(timeout=60)
        assert not isinstance(res, Exception)
        assert 0 < len(res.tokens) <= 10
        assert all(0 <= t < config.vocab_size for t in res.tokens)


def test_engine_fuses_quantized_pallas_params():
    """BatchEngine mirrors the Generator's launch fusion on the quantized
    pallas path (unfused 9-key trees fuse at init)."""
    config = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=4,
                         n_kv_heads=2, vocab_size=96, seq_len=48)
    params = random_q8_params(config, group_size=32, seed=2)
    eng = BatchEngine(config, params, batch_size=1, backend="pallas")
    assert "wqkv" in eng.params and "w13" in eng.params
