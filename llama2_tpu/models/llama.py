"""The Llama-2 decoder as pure functions over a param pytree.

TPU-first redesign of the reference's mutating single-token ``transformer()``
(main.zig:285-430): the layer loop is a ``lax.scan`` over layer-stacked
weights (one compiled layer body), state (the KV cache) is threaded
functionally, and a whole segment of T tokens is processed per call so prefill
runs as batched matmuls on the MXU. ``T=1`` is the decode step. Causal
masking makes segment processing produce bit-the-same math as the reference's
token-at-a-time loop up to reduction order.

Cache layout: ``(n_layers, B, S, n_kv_heads, head_size)`` for K and V — the
sequence axis is contiguous per (batch, kv-head) so decode attention reads it
as a flash-decode stream, and kv-heads are the tensor-parallel shard axis
(SURVEY.md section 5, long-context row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from llama2_tpu.config import ModelConfig
from llama2_tpu.ops import xla as ops
from llama2_tpu.ops.linear import linear


def init_cache(
    config: ModelConfig, batch: int = 1, dtype=jnp.float32
) -> dict[str, jax.Array]:
    """Allocate the functional KV cache at full seq_len (main.zig:151-152)."""
    shape = (config.n_layers, batch, config.seq_len, config.n_kv_heads, config.head_size)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _layer(
    x: jax.Array,
    layer_params: dict,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    config: ModelConfig,
    precision,
    backend: str,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One decoder layer over a (B, T, D) segment starting at ``pos``."""
    B, T, D = x.shape
    H, KVH, hs = config.n_heads, config.n_kv_heads, config.head_size

    # attention block
    xb = ops.rmsnorm(x, layer_params["rms_att"])
    q = linear(xb, layer_params["wq"], precision, backend).reshape(B, T, H, hs)
    k = linear(xb, layer_params["wk"], precision, backend).reshape(B, T, KVH, hs)
    v = linear(xb, layer_params["wv"], precision, backend).reshape(B, T, KVH, hs)

    q = ops.apply_rope(q, cos, sin)
    k = ops.apply_rope(k, cos, sin)

    k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, pos, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, pos, 0, 0))

    att = ops.attention(q, k_cache, v_cache, pos, precision=precision)
    att = att.reshape(B, T, D)
    x = x + linear(att, layer_params["wo"], precision, backend)

    # FFN block
    xb = ops.rmsnorm(x, layer_params["rms_ffn"])
    h1 = linear(xb, layer_params["w1"], precision, backend)
    h3 = linear(xb, layer_params["w3"], precision, backend)
    x = x + linear(ops.swiglu(h1, h3), layer_params["w2"], precision, backend)
    return x, k_cache, v_cache


_LAYER_KEYS = ("rms_att", "wq", "wk", "wv", "wo", "rms_ffn", "w1", "w2", "w3")


@partial(jax.jit, static_argnames=("config", "precision", "backend"))
def forward(
    params: dict,
    cache: dict,
    tokens: jax.Array,
    pos,
    config: ModelConfig,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
) -> tuple[jax.Array, dict]:
    """Run T tokens at positions ``pos..pos+T-1`` through all layers.

    tokens: (B, T) int32. Returns ``(hidden, new_cache)`` with hidden
    (B, T, D) already final-rmsnormed; project with
    :func:`logits_from_hidden`. The full forward incl. embedding lookup,
    N x (attention + FFN) via lax.scan, and final norm (main.zig:285-430).
    """
    x = jnp.take(params["tok_emb"], tokens, axis=0)  # (B, T, D)
    x = x.astype(params["wq"].dtype)
    pos = jnp.asarray(pos, jnp.int32)
    positions = pos + jnp.arange(tokens.shape[1], dtype=jnp.int32)
    cos, sin = ops.rope_angles(positions, config.head_size)  # (T, hs/2)

    layer_stack = {k: params[k] for k in _LAYER_KEYS}

    def body(carry, xs):
        x = carry
        layer_params, k_c, v_c = xs
        x, k_c, v_c = _layer(
            x, layer_params, k_c, v_c, pos, cos, sin, config, precision, backend
        )
        return x, (k_c, v_c)

    x, (k_new, v_new) = jax.lax.scan(body, x, (layer_stack, cache["k"], cache["v"]))
    x = ops.rmsnorm(x, params["rms_final"])
    return x, {"k": k_new, "v": v_new}


def logits_from_hidden(
    params: dict,
    hidden: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
):
    """Classifier head: ``hidden @ wcls`` → (.., vocab) float32 logits."""
    return linear(hidden, params["wcls"], precision, backend).astype(jnp.float32)
