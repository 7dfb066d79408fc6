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


@pytest.mark.parametrize("stages", [1, 3])
def test_pp_decode_matches_dense_greedy(stages):
    """Pipelined decode (M = S microbatch rotation, layer-sharded caches,
    wrap-hop token embeddings) is token-identical to the dense greedy loop."""
    from llama2_tpu.models.llama import logits_from_hidden
    from llama2_tpu.parallel.pp import pp_decode

    config, params, _ = _setup()
    rng = np.random.default_rng(9)
    S, B, n = stages, 2, 5
    M = S
    tokens0 = jnp.asarray(rng.integers(1, config.vocab_size, (M, B)), jnp.int32)
    pos0 = jnp.zeros((M, B), jnp.int32)
    KVH, hs = config.n_kv_heads, config.head_size
    kc = jnp.zeros((config.n_layers, M, B, KVH, config.seq_len, hs))
    vc = jnp.zeros_like(kc)

    mesh = make_stage_mesh(S)
    out, kc_new, vc_new = pp_decode(
        params, kc, vc, tokens0, pos0, n, config, mesh
    )
    assert out.shape == (M, B, n)

    for m in range(M):
        cache = init_cache(config, B)
        tok = tokens0[m][:, None]
        want = []
        for pos in range(n):
            hidden, cache = forward(params, cache, tok, pos, config)
            logits = logits_from_hidden(params, hidden[:, -1, :])
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            want.append(np.asarray(tok[:, 0]))
        np.testing.assert_array_equal(
            np.asarray(out[m]), np.stack(want, axis=1),
            err_msg=f"microbatch {m} token stream",
        )
        # the stage-sharded caches saw every appended row
        np.testing.assert_allclose(
            np.asarray(kc_new[:, m, :, :, :n]),
            np.asarray(cache["k"][:, :, :, :n]), atol=3e-5,
        )


def test_pp_decode_rejects_wrong_microbatch_count():
    from llama2_tpu.parallel.pp import pp_decode

    config, params, _ = _setup()
    kc = jnp.zeros((config.n_layers, 2, 1, config.n_kv_heads,
                    config.seq_len, config.head_size))
    with pytest.raises(ValueError, match="microbatch"):
        pp_decode(
            params, kc, kc, jnp.ones((2, 1), jnp.int32),
            jnp.zeros((2, 1), jnp.int32), 3, config, make_stage_mesh(3),
        )


def test_pp_prefill_then_pp_decode_continues_exactly():
    """The composed pipeline story: pp_prefill's layer-sharded KV segments
    seed pp_decode, matching the dense prefill+decode continuation."""
    from llama2_tpu.models.llama import logits_from_hidden
    from llama2_tpu.parallel.pp import pp_decode

    config, params, tokens = _setup(M=3, T=8)
    S = 3
    M, B, T = tokens.shape
    n = 4
    mesh = make_stage_mesh(S)
    hidden, k_seg, v_seg = pp_prefill(params, tokens, config, mesh)

    # greedy-sample each microbatch's next token from the prefill logits
    last = hidden[:, :, -1, :]  # (M, B, D)
    logits = jnp.einsum("mbd,dv->mbv", last.astype(jnp.float32),
                        params["wcls"].astype(jnp.float32))
    tokens0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    pos0 = jnp.full((M, B), T, jnp.int32)

    KVH, hs = config.n_kv_heads, config.head_size
    pad = config.seq_len - T
    kc = jnp.pad(k_seg, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    vc = jnp.pad(v_seg, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    out, _, _ = pp_decode(params, kc, vc, tokens0, pos0, n, config, mesh)

    for m in range(M):
        cache = init_cache(config, B)
        h, cache = forward(params, cache, tokens[m], 0, config)
        logits = logits_from_hidden(params, h[:, -1, :])
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        want = []
        for pos in range(T, T + n):
            h, cache = forward(params, cache, tok, pos, config)
            logits = logits_from_hidden(params, h[:, -1, :])
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            want.append(np.asarray(tok[:, 0]))
        np.testing.assert_array_equal(
            np.asarray(out[m]), np.stack(want, axis=1),
            err_msg=f"microbatch {m} continuation",
        )
