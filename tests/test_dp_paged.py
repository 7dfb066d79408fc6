"""Data-parallel paged serving (parallel/dp_paged.py; VERDICT r2 weak 3 /
next-round 7): page pools shard their page axis over ``data`` with
per-shard allocators — pool bytes scale 1/dp per device — and the ticks run
the single-chip kernels per shard under shard_map (zero collectives), so
``--paged --mesh --kernels pallas`` composes on dp meshes."""

import numpy as np
import pytest

from conftest import random_params

from llama2_tpu.config import GenerationConfig, ModelConfig
from llama2_tpu.parallel.mesh import make_mesh
from llama2_tpu.runtime.paged_engine import PagedBatchEngine


@pytest.fixture(scope="module")
def model():
    config = ModelConfig(
        dim=64, hidden_dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=256, seq_len=48,
    )
    return config, random_params(config, seed=11)


PROMPTS = [[5, 17], [250, 9, 44], [], [7], [33, 2, 8], [9, 9]]


def _serve(eng, gen, prompts=PROMPTS):
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    out = []
    for q in queues:
        r = q.get(timeout=180)
        assert not isinstance(r, Exception), r
        out.append(r.tokens)
    return out


@pytest.mark.parametrize("dp", [2, 4])
def test_dp_paged_token_identical(model, dp):
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=16)
    want = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48), gen)
    eng = PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        mesh=make_mesh(dp, 1),
    )
    assert eng._dp == dp, "dp pool path must engage on a (dp, 1) mesh"
    assert _serve(eng, gen) == want


def test_dp_pool_bytes_scale(model):
    """The point of the path: each data shard holds n_pages/dp pages."""
    config, params = model
    dp = 4
    eng = PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        mesh=make_mesh(dp, 1),
    )
    shard = eng.pool.k.addressable_shards[0].data
    assert shard.shape[1] == eng.pool.n_pages // dp
    total_shard_bytes = sum(
        s.data.nbytes for s in eng.pool.k.addressable_shards
    )
    assert total_shard_bytes == eng.pool.k.nbytes  # no replication


def test_dp_paged_sampled_and_multitick(model):
    config, params = model
    gen = GenerationConfig(temperature=0.8, top_p=0.9, steps=14, seed=3)
    want = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        ticks_per_sync=4), gen)
    got = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        ticks_per_sync=4, mesh=make_mesh(2, 1)), gen)
    assert got == want


def test_dp_paged_spec_windows(model):
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=16)
    want = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48), gen)
    got = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        spec_window=4, mesh=make_mesh(2, 1)), gen)
    assert got == want


def test_dp_paged_prefix_cache_and_pressure(model):
    """Prefix sharing is per data shard; memory pressure preempts and
    recovers exactly as on one device."""
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=28)
    prompts = [[3] * 17, [3] * 17, [5] * 17, [3] * 17]
    want = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        prefix_cache=True), gen, prompts)
    eng = PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        prefix_cache=True, mesh=make_mesh(2, 1),
    )
    assert _serve(eng, gen, prompts) == want
    assert eng.metrics["prefix_hit_pages"] >= 1


def test_dp_paged_int8_kv(model):
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=14)
    want = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        kv_quant=True), gen)
    got = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48,
        kv_quant=True, mesh=make_mesh(2, 1)), gen)
    assert got == want


def test_dp_refused_composes_replicated(model):
    """tp > 1 (or indivisible batch) keeps the old replicated-pool GSPMD
    path — loudly."""
    config, params = model
    gen = GenerationConfig(temperature=0.0, steps=10)
    want = _serve(PagedBatchEngine(
        config, params, batch_size=4, page_size=8, n_pages=48), gen)
    with pytest.warns(UserWarning, match="REPLICATES over data"):
        eng = PagedBatchEngine(
            config, params, batch_size=4, page_size=8, n_pages=48,
            mesh=make_mesh(2, 2),
        )
    assert eng._dp == 0
    assert _serve(eng, gen) == want


def test_dp_paged_pallas_program_contains_kernels(model):
    """--paged --mesh --kernels pallas on a dp mesh: the dp tick's program
    contains the pallas kernels inside shard_map — the fast path truly
    executes per shard (no silent XLA downgrade), with zero collectives."""
    import jax
    import jax.numpy as jnp

    from llama2_tpu.parallel import dp_paged
    from llama2_tpu.quant.q8 import quantize_params

    config, params = model
    qp = quantize_params(
        {k: np.asarray(v) for k, v in params.items()}, group_size=32
    )
    mesh = make_mesh(2, 1)
    eng = PagedBatchEngine(
        config, qp, batch_size=4, page_size=8, n_pages=48,
        backend="pallas", mesh=mesh,
    )
    assert eng._dp == 2 and eng.backend == "pallas"
    fn = dp_paged.build_tick_dp(
        mesh, eng.params, False, config=config, precision=eng.precision,
        backend="pallas", n_ticks=1, stochastic=False, unroll=1,
    )
    B = 4
    z = lambda *s: jnp.zeros(s, jnp.int32)
    keys = jnp.zeros((B, 2), jnp.uint32)
    jaxpr = str(jax.make_jaxpr(lambda *a: fn(*a))(
        eng.params, eng.pool.k, eng.pool.v, z(B, eng.max_pages),
        z(B), z(B), z(B) + 4, z(1, B), z(1, B),
        jnp.ones(B, jnp.float32), jnp.ones(B, jnp.float32),
        jnp.ones(B, bool), jnp.ones(B, bool), keys,
    ))
    assert "shard_map" in jaxpr
    assert "pallas_call" in jaxpr
    assert "psum" not in jaxpr  # data-parallel tick: zero collectives
