"""Continuous batching over a device mesh (VERDICT round-1 item 3).

The BatchEngine with ``mesh=`` runs every tick as one GSPMD program: params
tensor-sharded over ``model``, KV cache over (batch→data, kv-heads→model).
Token streams must be identical to the single-device engine — the bar the
north star sets for "continuous batching of decode requests across hosts"
(the scheduler is a host control loop; under multi-controller JAX it
replicates per process, so single-controller virtual-mesh equivalence is the
testable slice)."""

import numpy as np
import pytest

from llama2_tpu.config import GenerationConfig, ModelConfig
from llama2_tpu.parallel.mesh import make_mesh
from llama2_tpu.runtime.batch_engine import BatchEngine

from conftest import random_params


@pytest.fixture(scope="module")
def model():
    config = ModelConfig(
        dim=64, hidden_dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=256, seq_len=48,
    )
    return config, random_params(config, seed=11)


PROMPTS = [[5, 17], [250, 9, 44], [], [7], [33, 2, 8], [9, 9]]


def _serve(eng, gen):
    queues = [eng.submit(p, gen) for p in PROMPTS]
    eng.run_until_idle()
    out = []
    for q in queues:
        r = q.get(timeout=120)
        assert not isinstance(r, Exception), r
        out.append(r.tokens)
    return out


@pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_engine_token_identical(model, dp, tp):
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=16)
    want = _serve(BatchEngine(config, params, batch_size=4), gen)
    mesh = make_mesh(dp, tp)
    got = _serve(BatchEngine(config, params, batch_size=4, mesh=mesh), gen)
    assert got == want


def test_sharded_engine_multi_tick_and_sampled(model):
    """ticks_per_sync > 1 and seeded stochastic sampling also match on the
    mesh (same fold_in key schedule, GSPMD-reduced logits)."""
    config, params = model
    mesh = make_mesh(2, 4)
    gen = GenerationConfig(temperature=0.8, top_p=0.9, steps=14, seed=3)
    want = _serve(BatchEngine(config, params, batch_size=4, ticks_per_sync=4), gen)
    got = _serve(
        BatchEngine(config, params, batch_size=4, ticks_per_sync=4, mesh=mesh),
        gen,
    )
    assert got == want


def test_sharded_engine_params_actually_sharded(model):
    config, params = model
    mesh = make_mesh(2, 4)
    eng = BatchEngine(config, params, batch_size=4, mesh=mesh)
    # column-parallel wq: out-features split over 'model'
    shard_shape = eng.params["wq"].sharding.shard_shape(eng.params["wq"].shape)
    assert shard_shape[-1] == config.dim // 4
    # KV cache: batch over 'data', kv-heads over 'model'
    css = eng.cache["k"].sharding.shard_shape(eng.cache["k"].shape)
    assert css[1] == 4 // 2 and css[2] == config.n_kv_heads // 4


@pytest.mark.parametrize("dp,tp", [(2, 4), (8, 1)])
def test_sharded_paged_engine_token_identical(model, dp, tp):
    """Paged continuous batching over the mesh: pools shard kv-heads on
    ``model`` (the page axis is a shared allocator pool and replicates —
    parallel.sharding.pool_specs); streams must match the single-device
    paged engine."""
    from llama2_tpu.runtime.paged_engine import PagedBatchEngine

    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=16)
    want = _serve(
        PagedBatchEngine(config, params, batch_size=4, page_size=8, n_pages=32),
        gen,
    )
    mesh = make_mesh(dp, tp)
    got = _serve(
        PagedBatchEngine(
            config, params, batch_size=4, page_size=8, n_pages=32, mesh=mesh
        ),
        gen,
    )
    assert got == want


def test_sharded_paged_engine_q8_pools(model):
    """INT8 pools + mesh: scale pools shard alongside the int8 pages."""
    from llama2_tpu.runtime.paged_engine import PagedBatchEngine

    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=12)
    want = _serve(
        PagedBatchEngine(
            config, params, batch_size=4, page_size=8, n_pages=32,
            kv_quant=True,
        ),
        gen,
    )
    mesh = make_mesh(2, 4)
    eng = PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=32,
        kv_quant=True, mesh=mesh,
    )
    # round 5: the XLA backend now takes the shard_map paged tick too
    # (dp_pool_supported no longer requires pallas), so the pools shard
    # BOTH ways: pages over data with per-shard allocators, kv-heads over
    # model — no replicated pool bytes
    assert eng._mesh_ticks and eng._dp == 2 and eng._tp == 4
    shard = next(iter(eng.pool.k.addressable_shards)).data
    assert shard.shape[2] == config.n_kv_heads // 4  # kv-heads on model
    assert shard.shape[1] == eng.pool.n_pages // 2  # pages on data
    got = _serve(eng, gen)
    assert got == want


def test_mesh_downgrades_pallas_to_xla():
    """--mesh + --kernels pallas on a model the fused kernels CANNOT shard
    (tp=4 > n_heads=2) warns loudly and serves through the XLA/GSPMD path;
    streams match the single-device XLA engine. (Shardable models keep the
    pallas kernels via shard_map — tests/test_tp_pallas.py.)"""
    import numpy as np

    from llama2_tpu.config import ModelConfig
    from llama2_tpu.quant.q8 import quantize_params
    from llama2_tpu.runtime.batch_engine import BatchEngine

    cfg = ModelConfig(
        dim=256, hidden_dim=384, n_layers=2, n_heads=2, n_kv_heads=2,
        vocab_size=128, seq_len=128, norm_eps=1e-5,
    )
    rng = np.random.default_rng(1)

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
    gen = GenerationConfig(temperature=0.0, steps=12)
    want = _serve(BatchEngine(cfg, qp, batch_size=2, kv_quant=True), gen)
    with pytest.warns(UserWarning, match="falling back to the XLA"):
        eng = BatchEngine(
            cfg, qp, batch_size=2, backend="pallas", kv_quant=True,
            mesh=make_mesh(2, 4),
        )
    assert eng.backend == "xla"
    assert _serve(eng, gen) == want
