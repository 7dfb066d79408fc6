"""Ring attention: exact causal attention over a sequence-sharded segment.

The long-context scale-out path (SURVEY.md section 5, long-context row: the
reference caps context at one host's dense KV cache, main.zig:151-152; ring
attention over ICI is the TPU-native stretch path for contexts beyond one
chip's HBM).

Design — blockwise causal attention as a ring of KV chunks:

* the prefill segment of T tokens is sharded over a ``seq`` mesh axis of S
  devices; each device holds the query/key/value chunks for its own T/S
  positions;
* attention runs S steps of flash-style online-softmax accumulation: at step
  s each device combines its local queries with the KV chunk that started on
  device ``(i - s) mod S``, then passes that chunk to its ring successor via
  ``jax.lax.ppermute`` (one ICI hop per step — the collective rides neighbor
  links, never DCN);
* causality is by construction: chunks from later shards contribute nothing
  (their scores mask to -inf and the online-softmax merge keeps the running
  max/denominator finite), the diagonal chunk applies the intra-chunk causal
  mask, earlier chunks are attended in full;
* communication per step is the KV chunk (2 * T/S * KVH * hs floats) which
  XLA overlaps with the score/accumulate matmuls of the previous chunk under
  the latency-hiding scheduler.

The math is the standard online-softmax merge (the same accumulation the
Pallas flash kernels in ``ops/pallas/`` use, here expressed at the JAX level
with the ring as the block loop), so results equal dense masked attention up
to reduction order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG_INF = -1e30


def _chunk_attention_step(q, k, v, acc, row_max, row_sum, q_pos, k_pos, scale):
    """One online-softmax accumulation of a (q-chunk, kv-chunk) pair.

    q: (B, Tq, H, hs); k/v: (B, Tk, KVH, hs); acc: (B, Tq, H, hs) running
    numerator; row_max/row_sum: (B, Tq, H) running max / denominator.
    q_pos: (Tq,) global query positions; k_pos: (Tk,) global key positions.
    """
    B, Tq, H, hs = q.shape
    KVH = k.shape[2]
    group = H // KVH  # GQA: q head h reads kv head h // group (main.zig:291)

    qg = q.reshape(B, Tq, KVH, group, hs)
    # softmax statistics accumulate in f32 regardless of activation dtype —
    # bf16 running sums over thousands of ring steps drift visibly from the
    # dense f32-softmax oracle
    scores = jnp.einsum(
        "bqkgh,bskh->bqkgs", qg, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * scale  # (B,Tq,KVH,g,Tk)
    mask = (k_pos[None, :] <= q_pos[:, None])[None, :, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)

    new_max = jnp.maximum(row_max, scores.max(axis=-1).reshape(B, Tq, H))
    # rescale previous accumulator to the new max
    correction = jnp.exp(row_max - new_max)  # (B, Tq, H)
    p = jnp.exp(scores - new_max.reshape(B, Tq, KVH, group)[..., None])
    new_sum = row_sum * correction + p.sum(axis=-1).reshape(B, Tq, H)
    pv = jnp.einsum(
        "bqkgs,bskh->bqkgh", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).reshape(B, Tq, H, hs).astype(jnp.float32)
    new_acc = acc * correction[..., None] + pv
    return new_acc, new_max, new_sum


def _ring_attention_local(
    q, k, v, *, axis_name: str, scale: float, t_local: int,
    extra_varying: tuple = (),
):
    """Per-shard body: S online-softmax steps, rotating KV around the ring.

    ``extra_varying``: other mesh axes the q/k/v shards vary over (e.g. the
    tensor-parallel ``model`` axis when heads are sharded) — shard_map's
    varying-axis type system needs the scan carry declared varying over the
    same set as the inputs.
    """
    B, Tl, H, hs = q.shape
    s_size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    q_pos = my * t_local + jnp.arange(t_local)

    # pcast-to-varying: the accumulators start as literal zeros (device-invariant) but
    # the scan writes device-varying values into them; shard_map's
    # varying-axis type system requires the carry declared varying up front.
    axes = (axis_name, *extra_varying)
    acc = jax.lax.pcast(jnp.zeros((B, Tl, H, hs), jnp.float32), axes, to="varying")
    row_max = jax.lax.pcast(jnp.full((B, Tl, H), NEG_INF, jnp.float32), axes, to="varying")
    row_sum = jax.lax.pcast(jnp.zeros((B, Tl, H), jnp.float32), axes, to="varying")

    perm = [(i, (i + 1) % s_size) for i in range(s_size)]

    def step(state, s):
        acc, row_max, row_sum, k, v = state
        src = (my - s) % s_size  # ring position this KV chunk started at
        k_pos = src * t_local + jnp.arange(t_local)
        acc, row_max, row_sum = _chunk_attention_step(
            q, k, v, acc, row_max, row_sum, q_pos, k_pos, scale
        )
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        return (acc, row_max, row_sum, k, v), None

    (acc, row_max, row_sum, _, _), _ = jax.lax.scan(
        step, (acc, row_max, row_sum, k, v), jnp.arange(s_size)
    )
    # row_sum is never 0: every query attends at least to itself (diagonal).
    return (acc / row_sum[..., None]).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "seq",
    scale: float | None = None,
) -> jax.Array:
    """Exact causal attention over a T-sharded segment via a KV ring.

    q: (B, T, H, hs), k/v: (B, T, KVH, hs) — T sharded over ``axis_name``
    (must divide T), everything else replicated. Returns (B, T, H, hs)
    sharded like q. Equal to dense causal attention up to reduction order.
    """
    B, T, H, hs = q.shape
    S = mesh.shape[axis_name]
    if T % S != 0:
        raise ValueError(f"T={T} not divisible by seq shards {S}")
    scale = scale if scale is not None else 1.0 / (hs**0.5)

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        partial(
            _ring_attention_local,
            axis_name=axis_name,
            scale=scale,
            t_local=T // S,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def dense_causal_attention(q, k, v, scale=None):
    """jnp oracle: dense masked attention (for tests and the S=1 path)."""
    B, T, H, hs = q.shape
    KVH = k.shape[2]
    group = H // KVH
    scale = scale if scale is not None else 1.0 / (hs**0.5)
    qg = q.reshape(B, T, KVH, group, hs)
    scores = jnp.einsum("bqkgh,bskh->bqkgs", qg, k) * scale
    pos = jnp.arange(T)
    mask = (pos[None, :] <= pos[:, None])[None, :, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqkgs,bskh->bqkgh", p, v).reshape(B, T, H, hs)
