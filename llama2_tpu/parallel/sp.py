"""Sequence-parallel prefill: the full decoder over a T-sharded segment.

Long-context scale-out (SURVEY.md section 5, long-context row): a prompt too
long for one chip's HBM activations is sharded over a ``seq`` mesh axis; every
position-local op (norms, QKV/FFN matmuls, RoPE, SwiGLU) runs on the shard
that owns the position with zero communication, and attention runs as
:func:`llama2_tpu.parallel.ring.ring_attention` — S ppermute hops per layer,
each overlapped with the previous chunk's matmuls.

Weights are replicated across the seq axis (inference-scale models fit; for
models that don't, combine with tensor parallelism on a second axis — the
ring only involves activations, so the two compose). After prefill the
KV chunks are written into a standard dense cache for the decode loop, which
is latency-bound and stays single-shard (data-parallel across requests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from llama2_tpu.config import ModelConfig
from llama2_tpu.models.llama import _LAYER_KEYS
from llama2_tpu.ops import xla as ops
from llama2_tpu.parallel.ring import _ring_attention_local

SEQ_AXIS = "seq"


def make_seq_mesh(sp: int | None = None, devices=None) -> Mesh:
    """A 1-D ``(seq,)`` mesh for sequence-parallel prefill."""
    devices = devices if devices is not None else jax.devices()
    sp = sp if sp is not None else len(devices)
    return Mesh(np.asarray(devices[:sp]), (SEQ_AXIS,))


def _sp_forward_local(
    params: dict,
    tokens: jax.Array,  # (B, Tl) this shard's chunk
    *,
    config: ModelConfig,
    precision,
    t_local: int,
    axis_name: str,
):
    """Per-shard body: the whole layer stack on a local chunk + KV ring."""
    B, Tl = tokens.shape
    H, KVH, hs = config.n_heads, config.n_kv_heads, config.head_size
    D = config.dim

    my = jax.lax.axis_index(axis_name)
    positions = (my * t_local + jnp.arange(t_local, dtype=jnp.int32))[None, :]
    cos, sin = ops.rope_angles(positions, hs)

    x = jnp.take(params["tok_emb"], tokens, axis=0).astype(params["wq"].dtype)
    layer_stack = {k: params[k] for k in _LAYER_KEYS}

    def body(x, lp):
        xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
        mm = lambda a, w: jnp.einsum("btd,de->bte", a, w, precision=precision)
        q = mm(xb, lp["wq"]).reshape(B, Tl, H, hs)
        k = mm(xb, lp["wk"]).reshape(B, Tl, KVH, hs)
        v = mm(xb, lp["wv"]).reshape(B, Tl, KVH, hs)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        att = _ring_attention_local(
            q, k, v, axis_name=axis_name, scale=1.0 / hs**0.5, t_local=t_local
        )
        x = x + mm(att.reshape(B, Tl, D), lp["wo"])
        xb = ops.rmsnorm(x, lp["rms_ffn"], config.norm_eps)
        x = x + mm(ops.swiglu(mm(xb, lp["w1"]), mm(xb, lp["w3"])), lp["w2"])
        # cache planes (B, KVH, Tl, hs) for this layer's chunk
        return x, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    x, (k_seg, v_seg) = jax.lax.scan(body, x, layer_stack)
    x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
    return x, k_seg, v_seg


@partial(
    jax.jit, static_argnames=("config", "precision", "mesh", "axis_name")
)
def sp_prefill(
    params: dict,
    tokens: jax.Array,  # (B, T), T divisible by the seq-axis size
    config: ModelConfig,
    mesh: Mesh,
    precision=jax.lax.Precision.HIGHEST,
    axis_name: str = SEQ_AXIS,
):
    """Run a (B, T) segment sequence-parallel from position 0.

    Returns ``(hidden, k_seg, v_seg)``: hidden (B, T, D) final-rmsnormed and
    T-sharded over ``axis_name``; k_seg/v_seg (L, B, KVH, T, hs) cache
    segments (T-sharded on dim 3). Numerics equal the dense
    :func:`llama2_tpu.models.llama.forward` up to reduction order.
    """
    B, T = tokens.shape
    S = mesh.shape[axis_name]
    if T % S != 0:
        raise ValueError(f"T={T} not divisible by seq shards {S}")

    tok_spec = P(None, axis_name)
    out_specs = (
        P(None, axis_name, None),  # hidden (B, T, D)
        P(None, None, None, axis_name, None),  # k_seg (L, B, KVH, T, hs)
        P(None, None, None, axis_name, None),
    )
    fn = shard_map(
        partial(
            _sp_forward_local,
            config=config,
            precision=precision,
            t_local=T // S,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=(P(), tok_spec),
        out_specs=out_specs,
    )
    return fn(params, tokens)


def cache_from_segments(cache: dict, k_seg, v_seg, mesh: Mesh) -> dict:
    """Write SP prefill KV segments into a standard dense cache at pos 0.

    Gathers the T-sharded segments (one all-gather over ICI) and returns the
    cache the decode loop consumes.
    """
    rep = NamedSharding(mesh, P())
    k_seg = jax.device_put(k_seg, rep)
    v_seg = jax.device_put(v_seg, rep)
    zero = (0, 0, 0, 0, 0)
    return {
        "k": jax.lax.dynamic_update_slice(cache["k"], k_seg.astype(cache["k"].dtype), zero),
        "v": jax.lax.dynamic_update_slice(cache["v"], v_seg.astype(cache["v"].dtype), zero),
    }
