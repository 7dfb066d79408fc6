"""Blockwise causal (flash) attention for prefill segments.

Completes the attention story (SURVEY.md section 7 step 4): the decode kernel
(attention.py) handles T=1; this one processes a T-token prefill segment
against the cache without materializing the (T, S) score matrix — online
softmax over streamed key blocks, causal skipping so key blocks entirely
beyond the segment's last position are never read (the XLA fallback masks
over full S).

Grid: (B, KVH, T/block_q). Each program holds a (block_q * G, hs) query tile
(token-major, the G group heads interleaved per token) and loops key blocks
0..ceil((pos0 + t_hi + 1)/block_s) with the decode kernel's double-buffered
DMA. Rows of the score tile mask by their own token's causal window.
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
    pos_ref,  # scalar prefetch (1,): segment start position
    q_ref,  # (1, block_q * G, hs) VMEM
    k_hbm,  # (B, KVH, S, hs) HBM
    v_hbm,
    o_ref,  # (1, block_q * G, hs) VMEM
    k_buf,  # (2, block_s, hs) VMEM scratch
    v_buf,
    sems,
    *,
    block_q: int,
    block_s: int,
    groups: int,
    scale: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    tq = pl.program_id(2)
    pos0 = pos_ref[0]
    # last query position in this tile: pos0 + tq*block_q + block_q - 1
    hi = pos0 + (tq + 1) * block_q - 1
    n_blocks = jax.lax.div(hi, block_s) + 1

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(blk * block_s, block_s), :], k_buf.at[slot], sems.at[slot, 0]
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(blk * block_s, block_s), :], v_buf.at[slot], sems.at[slot, 1]
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    q = q_ref[0].astype(jnp.float32) * scale  # (block_q*G, hs)
    R, hs = q.shape
    # query position per row: row r belongs to token r // G of this tile
    qpos = pos0 + tq * block_q + jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 0) // groups

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            k_dma(nxt, i + 1).start()
            v_dma(nxt, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        k = k_buf[slot].astype(jnp.float32)
        v = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R, block_s)
        kpos = i * block_s + jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 1)
        s = jnp.where(kpos <= qpos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((R, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((R, 1), jnp.float32)
    acc0 = jnp.zeros((R, hs), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_s", "interpret"), inline=True)
def _flash_prefill(q, k_cache, v_cache, pos, scale, block_q, block_s, interpret):
    B, T, H, hs = q.shape
    KVH, S = k_cache.shape[1], k_cache.shape[2]
    G = H // KVH
    R = block_q * G

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH, T // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, R, hs),
                lambda b, h, t, pr: (b * pl.num_programs(1) + h, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, hs),
            lambda b, h, t, pr: (b * pl.num_programs(1) + h, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_s, hs), k_cache.dtype),
            pltpu.VMEM((2, block_s, hs), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    # (B, T, KVH, G, hs) -> (B, KVH, T, G, hs) -> (B*KVH, T*G, hs):
    # within one (b, kvh) plane, rows are token-major with the G group heads
    # adjacent — matching the kernel's row->token mapping (row // G).
    q5 = q.reshape(B, T, KVH, G, hs).transpose(0, 2, 1, 3, 4).reshape(B * KVH, T * G, hs)
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_q=block_q, block_s=block_s, groups=G, scale=scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * KVH, T * G, hs), q.dtype),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), q5, k_cache, v_cache)
    return (
        out.reshape(B, KVH, T, G, hs).transpose(0, 2, 1, 3, 4).reshape(B, T, H, hs)
    )


def flash_prefill_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos,
    *,
    scale: float | None = None,
    block_q: int = 128,
    block_s: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Causal attention of a (B, T, H, hs) segment at start position ``pos``
    against the (B, KVH, S, hs) cache (which already contains the segment's
    own keys/values). Returns (B, T, H, hs)."""
    if interpret is None:
        interpret = interpret_default()
    B, T, H, hs = q.shape
    if not interpret and hs % 128 != 0:
        raise ValueError(f"flash prefill requires head_size % 128 == 0 (got {hs})")
    if scale is None:
        scale = 1.0 / (hs**0.5)
    S = k_cache.shape[2]
    # bq must divide T AND give a Mosaic-legal q tile: (bq*G) % 8 == 0 or
    # bq == T (whole dim). A bare largest-divisor pick produces e.g. bq=67
    # for T=201 on MHA (G=1), which Mosaic rejects.
    G = H // k_cache.shape[1]
    bq = T
    for cand in range(min(block_q, T), 0, -1):
        if T % cand == 0 and (cand * G) % 8 == 0:
            bq = cand
            break
    bs = min(block_s, S)
    while S % bs != 0:
        bs //= 2
    return _flash_prefill(
        q, k_cache, v_cache, pos, float(scale), bq, bs, interpret
    )
