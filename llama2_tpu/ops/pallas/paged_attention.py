"""Paged flash decode attention: KV pages gathered through a page table.

vLLM-style paged KV management, TPU-native (the reference preallocates one
dense per-request cache at full seq_len, main.zig:151-152 — fine for batch 1,
wasteful for a continuous-batching server where requests have wildly varying
lengths). The cache is a pool of fixed-size pages; each slot's logical
positions map to physical pages via a small int32 page table that rides the
scalar-prefetch channel into SMEM, and the kernel's double-buffered DMA loop
chases the table — one page per step, exactly like
:mod:`llama2_tpu.ops.pallas.attention` chases contiguous blocks.

Pool layout (per layer): ``(n_pages, KVH, page_size, hs)`` — a page plane for
one (page, kv-head) is a contiguous ``(page_size, hs)`` tile (whole 128-lane
rows, Mosaic-clean DMA), and kv-heads stay the tensor-parallel shard axis.

Grid: ``(B, KVH)``; each program handles its G = H/KVH group-query heads.
Numerics identical to flash_decode_attention (online softmax over [0, pos]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import interpret_default

NEG_INF = float("-inf")


def _kernel(
    pos_ref,  # scalar prefetch: (B,) int32
    table_ref,  # scalar prefetch: (B, max_pages) int32 physical page ids
    q_ref,  # (1, G, hs) VMEM
    k_pool,  # (P, KVH, page, hs) HBM
    v_pool,
    o_ref,  # (1, G, hs) VMEM
    k_buf,  # (2, page, hs) VMEM scratch
    v_buf,
    sems,  # (2, 2) DMA
    *,
    page: int,
    scale: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    pos = pos_ref[b]
    n_pages = jax.lax.div(pos, page) + 1

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_pool.at[table_ref[b, i], h], k_buf.at[slot], sems.at[slot, 0]
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_pool.at[table_ref[b, i], h], v_buf.at[slot], sems.at[slot, 1]
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    q = q_ref[0].astype(jnp.float32) * scale  # (G, hs)
    G, hs = q.shape

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_pages)
        def _():
            k_dma(next_slot, i + 1).start()
            v_dma(next_slot, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        k = k_buf[slot].astype(jnp.float32)
        v = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (G, page)
        t = i * page + jax.lax.broadcasted_iota(jnp.int32, (G, page), 1)
        s = jnp.where(t <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, hs), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _paged_decode(q, k_pool, v_pool, table, pos, scale: float, interpret: bool):
    B, H, hs = q.shape
    P, KVH, page, _ = k_pool.shape
    G = H // KVH

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec(
                (1, G, hs),
                lambda b, h, pos_ref, table_ref: (b * pl.num_programs(1) + h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, hs),
            lambda b, h, pos_ref, table_ref: (b * pl.num_programs(1) + h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, page, hs), k_pool.dtype),
            pltpu.VMEM((2, page, hs), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    q3 = q.reshape(B * KVH, G, hs)
    out = pl.pallas_call(
        functools.partial(_kernel, page=page, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * KVH, G, hs), q.dtype),
        interpret=interpret,
    )(pos, table, q3, k_pool, v_pool)
    return out.reshape(B, H, hs)


def paged_decode_attention(
    q: jax.Array,
    k_pool: jax.Array,
    v_pool: jax.Array,
    table: jax.Array,
    pos: jax.Array,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention through a page table.

    q: (B, 1, H, hs) or (B, H, hs); pools (P, KVH, page, hs); table
    (B, max_pages) int32 physical page ids (entries past the row's
    ``pos // page`` are unread); pos (B,) int32 per-row positions.
    ``hs % 128 == 0`` required when compiled (lane-whole DMA), like the
    dense flash kernel.
    """
    squeeze = False
    if q.ndim == 4:
        if q.shape[1] != 1:
            raise ValueError("paged_decode_attention is single-query (T=1)")
        q = q[:, 0]
        squeeze = True
    if interpret is None:
        interpret = interpret_default()
    hs = q.shape[-1]
    if not interpret and hs % 128 != 0:
        raise ValueError(f"paged decode requires head_size % 128 == 0 (got {hs})")
    if scale is None:
        scale = 1.0 / (hs**0.5)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (q.shape[0],))
    out = _paged_decode(q, k_pool, v_pool, table, pos, float(scale), interpret)
    return out[:, None] if squeeze else out


def paged_attention_oracle(q, k_pool, v_pool, table, pos, scale=None):
    """jnp oracle: gather the pages into a dense cache, run masked attention."""
    from llama2_tpu.ops import xla as ops

    if q.ndim == 3:
        q = q[:, None]
    B = q.shape[0]
    P, KVH, page, hs = k_pool.shape
    max_pages = table.shape[1]
    # (B, max_pages, KVH, page, hs) -> (B, KVH, max_pages*page, hs)
    kg = k_pool[table]  # gather pages per row
    vg = v_pool[table]
    k = kg.transpose(0, 2, 1, 3, 4).reshape(B, KVH, max_pages * page, hs)
    v = vg.transpose(0, 2, 1, 3, 4).reshape(B, KVH, max_pages * page, hs)
    return ops.attention(q, k, v, jnp.asarray(pos), scale=scale)
