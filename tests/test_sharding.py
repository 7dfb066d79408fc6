"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The reference offers no multi-node precedent (SURVEY.md section 2:
parallelism = NONE); these validate the new tensor/data-parallel layer:
sharded execution must be numerically equivalent to single-device execution,
mesh-shape-parameterized (SURVEY.md section 4, "what the TPU build needs").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama2_tpu.config import ModelConfig
from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
from llama2_tpu.parallel.mesh import make_mesh
from llama2_tpu.parallel.sharding import shard_cache, shard_params

from conftest import random_params


@pytest.fixture(scope="module")
def model():
    config = ModelConfig(
        dim=64, hidden_dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=256, seq_len=32,
    )
    return config, random_params(config, seed=11)


def _run(config, params, cache, tokens, pos):
    hidden, cache = forward(params, cache, tokens, pos, config)
    return logits_from_hidden(params, hidden), cache


@pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (4, 2), (8, 1), (1, 4)])
def test_sharded_matches_single_device(model, dp, tp):
    config, params = model
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 256, (dp, 6)))

    ref_logits, ref_cache = _run(config, params, init_cache(config, dp), tokens, 0)

    mesh = make_mesh(dp, tp)
    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(config, dp), mesh)
        logits, cache = _run(config, sp, sc, tokens, 0)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cache["k"]), np.asarray(ref_cache["k"]), rtol=1e-5, atol=1e-6
    )


def test_sharded_decode_after_prefill(model):
    config, params = model
    mesh = make_mesh(2, 4)
    prompt = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 5)))

    ref_cache = init_cache(config, 2)
    _, ref_cache = _run(config, params, ref_cache, prompt, 0)
    ref_logits, _ = _run(config, params, ref_cache, jnp.asarray([[7], [9]]), 5)

    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(config, 2), mesh)
        _, sc = _run(config, sp, sc, prompt, 0)
        logits, _ = _run(config, sp, sc, jnp.asarray([[7], [9]]), 5)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)


def test_uneven_tp_shard(model):
    """tp=3 does not divide 8 heads / 128 hidden: GSPMD pads; results equal."""
    config, params = model
    mesh = make_mesh(1, 3, devices=jax.devices()[:3])
    tokens = jnp.asarray([[3, 5, 250]])

    ref_logits, _ = _run(config, params, init_cache(config, 1), tokens, 0)
    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sc = shard_cache(init_cache(config, 1), mesh)
        logits, _ = _run(config, sp, sc, tokens, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)


def test_batch_axis_ragged_warns():
    """A batch that does not divide dp must warn (loud-fallback discipline):
    silent replication means every data shard computes the whole batch."""
    from llama2_tpu.parallel.tp import _batch_axis

    mesh = make_mesh(2, 1)
    with pytest.warns(UserWarning, match="does not divide dp"):
        assert _batch_axis(3, mesh) is None
    assert _batch_axis(4, mesh) == "data"
    assert _batch_axis(1, mesh) is None  # B=1 prefill plane: silent by design


def test_logits_sharded_indivisible_vocab_warns():
    """A vocab that does not split over tp falls back to a replicated
    classifier — loudly (each shard then does the full vocab matvec)."""
    from llama2_tpu.parallel.tp import logits_sharded
    from llama2_tpu.quant.q8 import quantize

    mesh = make_mesh(1, 3)  # vocab 256 % 3 != 0
    wcls = quantize(
        np.random.default_rng(0).standard_normal((64, 256), np.float32) * 0.1,
        group_size=64,
    )
    hidden = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64), np.float32)
    )
    with pytest.warns(UserWarning, match="not divisible by tp"):
        out = logits_sharded(hidden, wcls, mesh, "pallas")
    assert out.shape == (2, 256)
