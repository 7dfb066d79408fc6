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
from llama2_tpu.parallel.mesh import MODEL_AXIS
from llama2_tpu.parallel.ring import _ring_attention_local

SEQ_AXIS = "seq"


def make_seq_mesh(sp: int | None = None, devices=None) -> Mesh:
    """A 1-D ``(seq,)`` mesh for sequence-parallel prefill."""
    devices = devices if devices is not None else jax.devices()
    sp = sp if sp is not None else len(devices)
    return Mesh(np.asarray(devices[:sp]), (SEQ_AXIS,))


def make_sp_tp_mesh(sp: int, tp: int, devices=None) -> Mesh:
    """A 2-D ``(seq, model)`` mesh: ring attention over ``seq`` composes
    with Megatron-style tensor parallelism over ``model`` (the ring moves
    activations only, so the axes are independent)."""
    devices = devices if devices is not None else jax.devices()
    if sp * tp > len(devices):
        raise ValueError(f"mesh {sp}x{tp} needs {sp * tp} devices")
    grid = np.asarray(devices[: sp * tp]).reshape(sp, tp)
    return Mesh(grid, (SEQ_AXIS, MODEL_AXIS))


def _sp_forward_local(
    params: dict,
    tokens: jax.Array,  # (B, Tl) this shard's chunk
    *,
    config: ModelConfig,
    precision,
    t_local: int,
    axis_name: str,
    model_axis: str | None = None,
):
    """Per-shard body: the whole layer stack on a local chunk + KV ring.

    With ``model_axis``, weights arrive tensor-sharded (wq/wk/wv/w1/w3 on
    out-features, wo/w2 on in-features): attention/SwiGLU run on the local
    head/hidden slice and ONE all-reduce per block (the Megatron pairing)
    restores the residual — orthogonal to the seq-axis ring, which only
    moves activations.
    """
    B, Tl = tokens.shape
    hs = config.head_size
    D = config.dim

    my = jax.lax.axis_index(axis_name)
    positions = (my * t_local + jnp.arange(t_local, dtype=jnp.int32))[None, :]
    cos, sin = ops.rope_angles(positions, hs)

    x = jnp.take(params["tok_emb"], tokens, axis=0).astype(params["wq"].dtype)
    layer_stack = {k: params[k] for k in _LAYER_KEYS}
    # local head/hidden counts come from the (possibly sharded) weights
    H_l = params["wq"].shape[-1] // hs
    KVH_l = params["wk"].shape[-1] // hs

    def reduce_block(y):
        return jax.lax.psum(y, model_axis) if model_axis else y

    def body(x, lp):
        xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
        mm = lambda a, w: jnp.einsum("btd,de->bte", a, w, precision=precision)
        q = mm(xb, lp["wq"]).reshape(B, Tl, H_l, hs)
        k = mm(xb, lp["wk"]).reshape(B, Tl, KVH_l, hs)
        v = mm(xb, lp["wv"]).reshape(B, Tl, KVH_l, hs)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        att = _ring_attention_local(
            q, k, v, axis_name=axis_name, scale=1.0 / hs**0.5,
            t_local=t_local,
            extra_varying=(model_axis,) if model_axis else (),
        )
        x = x + reduce_block(mm(att.reshape(B, Tl, H_l * hs), lp["wo"]))
        xb = ops.rmsnorm(x, lp["rms_ffn"], config.norm_eps)
        x = x + reduce_block(
            mm(ops.swiglu(mm(xb, lp["w1"]), mm(xb, lp["w3"])), lp["w2"])
        )
        # cache planes (B, KVH_local, Tl, hs) for this layer's chunk
        return x, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    x, (k_seg, v_seg) = jax.lax.scan(body, x, layer_stack)
    x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
    return x, k_seg, v_seg


@partial(
    jax.jit,
    static_argnames=("config", "precision", "mesh", "axis_name", "model_axis"),
)
def sp_prefill(
    params: dict,
    tokens: jax.Array,  # (B, T), T divisible by the seq-axis size
    config: ModelConfig,
    mesh: Mesh,
    precision=jax.lax.Precision.HIGHEST,
    axis_name: str = SEQ_AXIS,
    model_axis: str | None = None,
):
    """Run a (B, T) segment sequence-parallel from position 0.

    Returns ``(hidden, k_seg, v_seg)``: hidden (B, T, D) final-rmsnormed and
    T-sharded over ``axis_name``; k_seg/v_seg (L, B, KVH, T, hs) cache
    segments (T-sharded on dim 3). Numerics equal the dense
    :func:`llama2_tpu.models.llama.forward` up to reduction order.

    ``model_axis``: tensor-parallel composition over a 2-D ``(seq, model)``
    mesh (:func:`make_sp_tp_mesh`) — weights shard Megatron-style, the KV
    segments come out kv-head-sharded on ``model``, and the ring stays on
    ``seq``. The model axis size must divide n_kv_heads (and n_heads).
    """
    B, T = tokens.shape
    S = mesh.shape[axis_name]
    if T % S != 0:
        raise ValueError(f"T={T} not divisible by seq shards {S}")
    if model_axis:
        tp = mesh.shape[model_axis]
        if config.n_kv_heads % tp or config.n_heads % tp:
            raise ValueError(
                f"model axis {tp} must divide n_heads/n_kv_heads"
            )

    ma = model_axis
    col = P(None, None, ma)  # (L, D, out) sharded on out-features
    row = P(None, ma, None)  # (L, in, D) sharded on in-features
    param_specs = {
        "tok_emb": P(), "rms_att": P(), "rms_ffn": P(), "rms_final": P(),
        "wq": col, "wk": col, "wv": col, "w1": col, "w3": col,
        "wo": row, "w2": row, "wcls": P(),
    }
    tok_spec = P(None, axis_name)
    out_specs = (
        P(None, axis_name, None),  # hidden (B, T, D), psum'd over model
        P(None, None, ma, axis_name, None),  # k_seg (L, B, KVH, T, hs)
        P(None, None, ma, axis_name, None),
    )
    fn = shard_map(
        partial(
            _sp_forward_local,
            config=config,
            precision=precision,
            t_local=T // S,
            axis_name=axis_name,
            model_axis=model_axis,
        ),
        mesh=mesh,
        in_specs=({k: param_specs.get(k, P()) for k in params}, tok_spec),
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
