"""Pipeline-parallel prefill vs the dense forward (virtual CPU stages)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config, random_params

from llama2_tpu.models.llama import forward, init_cache
from llama2_tpu.parallel.pp import make_stage_mesh, pp_prefill


def _setup(M=3, T=12, seed=5):
    config = tiny_config()  # n_layers=3
    params = {k: jnp.asarray(v) for k, v in random_params(config).items()}
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (M, 1, T)), jnp.int32
    )
    return config, params, tokens


@pytest.mark.parametrize("stages", [1, 3])
def test_pp_prefill_matches_dense(stages):
    config, params, tokens = _setup()
    mesh = make_stage_mesh(stages)
    hidden, k_seg, v_seg = pp_prefill(params, tokens, config, mesh)

    M, B, T = tokens.shape
    assert hidden.shape == (M, B, T, config.dim)
    assert k_seg.shape[0] == config.n_layers and k_seg.shape[1] == M

    for m in range(M):
        cache = init_cache(config, B)
        want_h, want_cache = forward(params, cache, tokens[m], 0, config)
        np.testing.assert_allclose(
            np.asarray(hidden[m]), np.asarray(want_h), atol=3e-5,
            err_msg=f"microbatch {m} hidden",
        )
        np.testing.assert_allclose(
            np.asarray(k_seg[:, m, :, :, :T]),
            np.asarray(want_cache["k"][:, :, :, :T]),
            atol=2e-5,
            err_msg=f"microbatch {m} k cache",
        )
        np.testing.assert_allclose(
            np.asarray(v_seg[:, m, :, :, :T]),
            np.asarray(want_cache["v"][:, :, :, :T]),
            atol=2e-5,
        )


def test_pp_rejects_indivisible_layers():
    config, params, tokens = _setup()
    with pytest.raises(ValueError, match="not divisible"):
        pp_prefill(params, tokens, config, make_stage_mesh(2))


@pytest.mark.parametrize("stages,tp", [(3, 2), (1, 2)])
def test_pp_tp_composition_matches_dense(stages, tp):
    """Pipeline stages of tensor-sharded layers on a (stage, model) mesh."""
    from llama2_tpu.parallel.pp import make_pp_tp_mesh

    config, params, tokens = _setup()
    mesh = make_pp_tp_mesh(stages, tp)
    hidden, k_seg, v_seg = pp_prefill(
        params, tokens, config, mesh, model_axis="model"
    )
    M, B, T = tokens.shape
    for m in range(M):
        want_h, want_cache = forward(
            params, init_cache(config, B), tokens[m], 0, config
        )
        np.testing.assert_allclose(
            np.asarray(hidden[m]), np.asarray(want_h), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(k_seg[:, m, :, :, :T]),
            np.asarray(want_cache["k"][:, :, :, :T]),
            atol=2e-5,
        )
