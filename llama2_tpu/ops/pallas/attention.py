"""Flash decode attention over the HBM-resident KV cache.

The TPU-native replacement for the reference's per-head score/softmax/AV loop
(main.zig:361-389) at decode time: one query token attends to the cache with
**online softmax** (max/sum carried across key blocks, never materializing
the (H, S) score matrix) while key/value blocks stream HBM→VMEM with manual
double-buffered DMA. The loop bound is ``ceil((pos+1)/block)`` — a *dynamic*
``fori_loop`` bound — so a token at position 100 in a 4096-slot cache reads
100 slots, not 4096 (the XLA fallback in ops/xla.py masks over full S).

GQA/MQA: grid is (batch, kv_heads); each program handles the ``G = H/KVH``
query heads of its group against one KV head — ``kv_mul`` replication stays
implicit via indexing (SURVEY.md section 7 step 4).

Numerics match ops.xla.attention: scores scaled by 1/sqrt(hs), f32 softmax
accumulation, causal window [0, pos].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import decode_block_rows, interpret_default

NEG_INF = float("-inf")


def _kernel(
    pos_ref,  # scalar prefetch: (B,) int32 — per-row position
    q_ref,  # (1, G, hs) VMEM
    k_hbm,  # (B, KVH, S, hs) in HBM/ANY
    v_hbm,
    o_ref,  # (1, G, hs) VMEM
    k_buf,  # (2, block_s, hs) VMEM scratch
    v_buf,
    sems,  # DMA sems (2, 2)
    *,
    block_s: int,
    scale: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    pos = pos_ref[b]
    n_blocks = jax.lax.div(pos, block_s) + 1  # ceil((pos+1)/block_s) blocks

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(blk * block_s, block_s), :],
            k_buf.at[slot],
            sems.at[slot, 0],
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(blk * block_s, block_s), :],
            v_buf.at[slot],
            sems.at[slot, 1],
        )

    # warm-up: start the first block's DMAs
    k_dma(0, 0).start()
    v_dma(0, 0).start()

    q = q_ref[0].astype(jnp.float32) * scale  # (G, hs)
    G, hs = q.shape

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            k_dma(next_slot, i + 1).start()
            v_dma(next_slot, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        k = k_buf[slot].astype(jnp.float32)  # (bs, hs)
        v = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # Mosaic default is 1-pass bf16
        )  # (G, bs)
        t = i * block_s + jax.lax.broadcasted_iota(jnp.int32, (G, block_s), 1)
        s = jnp.where(t <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))  # (G, 1)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # (G, bs)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, hs), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_s", "interpret"), inline=True)
def _flash_decode(q, k_cache, v_cache, pos, scale: float, block_s: int, interpret: bool):
    B, H, hs = q.shape
    KVH, S = k_cache.shape[1], k_cache.shape[2]
    G = H // KVH

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH),
        in_specs=[
            # q laid out (B*KVH, G, hs): the block covers the whole (G, hs)
            # trailing dims (Mosaic requires trailing block dims divisible by
            # (8, 128) OR equal to the array dims — G can be 1 for MHA).
            pl.BlockSpec(
                (1, G, hs),
                lambda b, h, pos_ref: (b * pl.num_programs(1) + h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # K cache stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # V cache stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, G, hs),
            lambda b, h, pos_ref: (b * pl.num_programs(1) + h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_s, hs), k_cache.dtype),
            pltpu.VMEM((2, block_s, hs), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    q3 = q.reshape(B * KVH, G, hs)
    out = pl.pallas_call(
        functools.partial(_kernel, block_s=block_s, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * KVH, G, hs), q.dtype),
        interpret=interpret,
    )(pos, q3, k_cache, v_cache)
    return out.reshape(B, H, hs)


def _kernel_stacked(
    pos_ref,  # scalar prefetch: (B,) int32 — per-row position
    layer_ref,  # scalar prefetch: (1,) int32 — layer index
    q_ref,  # (1, KVH, G, hs) VMEM
    k_hbm_in,  # (L, B, KVH, S, hs) HBM — aliased with k_out (unused ref)
    v_hbm_in,
    knew_ref,  # (1, KVH, 1, hs) VMEM — batch row b's new K rows, all heads
    vnew_ref,
    o_ref,  # (1, KVH, G, hs) VMEM
    k_out,  # (L, B, KVH, S, hs) HBM — SAME buffer as k_hbm_in
    v_out,
    k_buf,  # (2, KVH, block_s, hs) VMEM scratch
    v_buf,
    sems,  # DMA sems (2, 3): [slot, {k, v, append}]
    *,
    block_s: int,
    scale: float,
):
    """Decode attention over a layer-STACKED cache with in-place row append.

    The cache-streaming analog of quant_matmul_stacked: the full (L, ...)
    cache stays one un-sliced HBM buffer carried through the layer scan
    (aliased input→output, zero copies); the kernel writes this step's K/V
    rows for ALL heads of batch row b at [layer, b, :, pos] itself, then
    runs the online-softmax block loop. The grid is (B,) with every KV head
    streamed per program in one strided DMA — a (b, h) grid issues B*KVH
    tiny DMAs per layer and becomes DMA-latency-bound at serving batch
    sizes (measured ~195 us/layer at B=8, KVH=16 vs ~58 us at B=1).
    Without the stacked layout, XLA materializes per-layer cache plane
    copies every decode step (scan-sliced pallas operands can't alias) —
    measured as the dominant term of the batched tick
    (benchmarks/engine_profile.py).
    """
    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_blocks = jax.lax.div(pos, block_s) + 1

    # append this step's rows, in place, before any block read can cover pos
    ak = pltpu.make_async_copy(
        knew_ref.at[0], k_out.at[layer, b, :, pl.ds(pos, 1), :], sems.at[0, 2]
    )
    av = pltpu.make_async_copy(
        vnew_ref.at[0], v_out.at[layer, b, :, pl.ds(pos, 1), :], sems.at[1, 2]
    )
    ak.start()
    av.start()
    ak.wait()
    av.wait()

    o_ref[0] = _attend_blocks_f32(
        layer, b, pos, n_blocks, q_ref[0].astype(jnp.float32) * scale,
        k_out, v_out, k_buf, v_buf, sems, block_s=block_s,
    ).astype(o_ref.dtype)


def _attend_blocks_f32(
    layer, b, pos, n_blocks, q, k_out, v_out, k_buf, v_buf, sems,
    *, block_s: int,
):
    """Double-buffered online-softmax loop over (layer, b)'s fp KV blocks.
    ``q``: (KVH, G, hs) f32 values, PRE-scaled. Returns (KVH, G, hs) f32."""

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_out.at[layer, b, :, pl.ds(blk * block_s, block_s), :],
            k_buf.at[slot],
            sems.at[slot, 0],
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_out.at[layer, b, :, pl.ds(blk * block_s, block_s), :],
            v_buf.at[slot],
            sems.at[slot, 1],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    KVH, G, hs = q.shape

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            k_dma(next_slot, i + 1).start()
            v_dma(next_slot, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        k = k_buf[slot].astype(jnp.float32)  # (KVH, bs, hs)
        v = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (KVH, G, bs)
        t = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (KVH, G, block_s), 2
        )
        s = jnp.where(t <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # (KVH, G, bs)
        l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((KVH, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((KVH, G, 1), jnp.float32)
    acc0 = jnp.zeros((KVH, G, hs), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    return acc / l


@functools.partial(
    jax.jit, static_argnames=("scale", "block_s", "interpret"), inline=True
)
def _flash_decode_stacked(
    q, k_cache, v_cache, k_new, v_new, layer, pos, scale: float,
    block_s: int, interpret: bool,
):
    B, H, hs = q.shape
    KVH, S = k_cache.shape[2], k_cache.shape[3]
    G = H // KVH

    def vmem_spec(shape):
        return pl.BlockSpec(
            shape,
            lambda b, pos_ref, layer_ref: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pos (B,), layer (1,)
        grid=(B,),
        in_specs=[
            vmem_spec((1, KVH, G, hs)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # K cache (aliased out)
            pl.BlockSpec(memory_space=pltpu.ANY),  # V cache (aliased out)
            vmem_spec((1, KVH, 1, hs)),
            vmem_spec((1, KVH, 1, hs)),
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, block_s, hs), k_cache.dtype),
            pltpu.VMEM((2, KVH, block_s, hs), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    q4 = q.reshape(B, KVH, G, hs)
    out, k_cache, v_cache = pl.pallas_call(
        functools.partial(_kernel_stacked, block_s=block_s, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # global operand indices: 0=pos 1=layer 2=q 3=k 4=v 5=knew 6=vnew
        input_output_aliases={3: 1, 4: 2},
        interpret=interpret,
    )(
        pos, layer, q4, k_cache, v_cache,
        k_new.reshape(B, KVH, 1, hs), v_new.reshape(B, KVH, 1, hs),
    )
    return out.reshape(B, H, hs), k_cache, v_cache


def flash_decode_attention_stacked(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    layer,
    pos,
    *,
    scale: float | None = None,
    block_s: int = 1024,
    interpret: bool | None = None,
):
    """Fused KV-append + decode attention over the layer-stacked cache.

    q (B, H, hs) or (B, 1, H, hs); caches (L, B, KVH, S, hs) — returned
    updated IN PLACE (callers must treat the inputs as consumed, scan-carry
    style); k_new/v_new (B, KVH, 1, hs) rows for position ``pos`` (scalar or
    per-row (B,)); ``layer`` the scan's layer index.
    """
    squeeze = False
    if q.ndim == 4:
        if q.shape[1] != 1:
            raise ValueError("flash_decode_attention_stacked is T=1 only")
        q = q[:, 0]
        squeeze = True
    if interpret is None:
        interpret = interpret_default()
    hs = q.shape[-1]
    if not interpret and hs % 128 != 0:
        raise ValueError(
            f"stacked flash decode requires head_size % 128 == 0 (got {hs})"
        )
    if scale is None:
        scale = 1.0 / (hs**0.5)
    S = k_cache.shape[3]
    KVH = k_cache.shape[2]
    # all KV heads ride one scratch buffer: clamp rows to the scoped-vmem
    # budget (7B shapes KVH=32/hs=128/f32 OOM the Mosaic stack at 512 rows)
    bs = decode_block_rows(S, KVH, hs, k_cache.dtype.itemsize, block_s)
    pos_vec = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (q.shape[0],)
    )
    layer_vec = jnp.asarray(layer, jnp.int32).reshape(1)
    out, k_cache, v_cache = _flash_decode_stacked(
        q, k_cache, v_cache, k_new, v_new, layer_vec, pos_vec,
        float(scale), bs, interpret,
    )
    return (out[:, None] if squeeze else out), k_cache, v_cache


def _kernel_stacked_fused(
    pos_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    qkv_ref,  # (1, H + 2*KVH, hs) VMEM — PRE-rope QKV rows
    cos_ref,  # (1, 1, hs) f32 VMEM — interleaved-duplicated step row
    sin_ref,
    k_hbm_in,  # aliased caches
    v_hbm_in,
    o_ref,  # (1, KVH, G, hs) VMEM
    k_out,
    v_out,
    k_buf,
    v_buf,
    knew_s,  # (KVH, 1, hs) cache-dtype scratch — staged append row
    vnew_s,
    sems,
    *,
    block_s: int,
    scale: float,
    n_q_heads: int,
):
    """:func:`_kernel_stacked` with the inter-launch XLA glue pulled into
    the kernel prologue (the fp-cache twin of
    attention_q8._kernel_stacked_fused): RoPE on q/k runs on the VPU on the
    raw fused-QKV launch output; the roped K row and V row stage through
    VMEM scratch and append via the same single-row DMA."""
    from llama2_tpu.ops.pallas.attention_q8 import _rope_interleaved

    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_blocks = jax.lax.div(pos, block_s) + 1
    H = n_q_heads
    KVH = knew_s.shape[0]
    hs = knew_s.shape[2]

    qkv = qkv_ref[0].astype(jnp.float32)  # (H + 2*KVH, hs)
    cos = cos_ref[0]
    sin = sin_ref[0]
    q = _rope_interleaved(qkv[:H], cos, sin)
    knew_s[:] = _rope_interleaved(qkv[H : H + KVH], cos, sin)[
        :, None, :
    ].astype(knew_s.dtype)
    vnew_s[:] = qkv[H + KVH :][:, None, :].astype(vnew_s.dtype)

    ak = pltpu.make_async_copy(
        knew_s, k_out.at[layer, b, :, pl.ds(pos, 1), :], sems.at[0, 2]
    )
    av = pltpu.make_async_copy(
        vnew_s, v_out.at[layer, b, :, pl.ds(pos, 1), :], sems.at[1, 2]
    )
    ak.start()
    av.start()
    ak.wait()
    av.wait()

    o_ref[0] = _attend_blocks_f32(
        layer, b, pos, n_blocks,
        q.reshape(KVH, H // KVH, hs) * scale,
        k_out, v_out, k_buf, v_buf, sems, block_s=block_s,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "scale", "block_s", "interpret"),
    inline=True,
)
def _flash_decode_fused(
    qkv, k_cache, v_cache, cos_il, sin_il, layer, pos,
    n_heads: int, scale: float, block_s: int, interpret: bool,
):
    B = qkv.shape[0]
    KVH, S, hs = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
    H = n_heads
    G = H // KVH

    def vmem_spec(shape):
        nd = len(shape)

        def imap(b, pos_ref, layer_ref, nd=nd):
            return (b,) + (0,) * (nd - 1)

        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pos (B,), layer (1,)
        grid=(B,),
        in_specs=[
            vmem_spec((1, H + 2 * KVH, hs)),  # qkv
            # (B, 1, hs) layout — see attention_q8._flash_decode_q8_fused
            vmem_spec((1, 1, hs)),  # cos_il
            vmem_spec((1, 1, hs)),  # sin_il
            pl.BlockSpec(memory_space=pltpu.ANY),  # K cache (aliased out)
            pl.BlockSpec(memory_space=pltpu.ANY),  # V cache (aliased out)
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, block_s, hs), k_cache.dtype),
            pltpu.VMEM((2, KVH, block_s, hs), v_cache.dtype),
            pltpu.VMEM((KVH, 1, hs), k_cache.dtype),
            pltpu.VMEM((KVH, 1, hs), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    # global operand indices: 0=pos 1=layer 2=qkv 3=cos 4=sin 5=k 6=v
    out, k_cache, v_cache = pl.pallas_call(
        functools.partial(
            _kernel_stacked_fused, block_s=block_s, scale=scale, n_q_heads=H
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), qkv.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(pos, layer, qkv, cos_il[:, None], sin_il[:, None], k_cache, v_cache)
    return out.reshape(B, H, hs), k_cache, v_cache


def flash_decode_attention_fused(
    qkv: jax.Array,  # (B, H+2*KVH, hs) — raw fused-QKV output, PRE-rope
    k_cache: jax.Array,  # (L, B, KVH, S, hs) — updated IN PLACE
    v_cache: jax.Array,
    cos_il: jax.Array,  # (B, hs) f32 — step RoPE rows, pair-DUPLICATED
    sin_il: jax.Array,
    layer,
    pos,
    *,
    n_heads: int,
    scale: float | None = None,
    block_s: int = 1024,
    interpret: bool | None = None,
):
    """Glue-fused fp-cache decode attention: RoPE (q and k), the in-place
    KV append, and the online-softmax read in ONE launch consuming the
    fused-QKV launch's raw output (fp twin of
    attention_q8.flash_decode_attention_q8_fused).

    Returns ``(att (B, H, hs), k_cache, v_cache)`` with the caches updated
    in place — treat the inputs as consumed, scan-carry style.
    """
    B, rows, hs = qkv.shape
    KVH = k_cache.shape[2]
    if rows != n_heads + 2 * KVH:
        raise ValueError(
            f"qkv rows {rows} != n_heads {n_heads} + 2*KVH {2 * KVH}"
        )
    if interpret is None:
        interpret = interpret_default()
    if not interpret and hs % 128 != 0:
        raise ValueError(
            f"fused flash decode requires head_size % 128 == 0 (got {hs})"
        )
    if scale is None:
        scale = 1.0 / (hs**0.5)
    S = k_cache.shape[3]
    KVH = k_cache.shape[2]
    bs = decode_block_rows(S, KVH, hs, k_cache.dtype.itemsize, block_s)
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    layer_vec = jnp.asarray(layer, jnp.int32).reshape(1)
    return _flash_decode_fused(
        qkv, k_cache, v_cache, cos_il, sin_il, layer_vec, pos_vec,
        n_heads, float(scale), bs, interpret,
    )


def flash_decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos,
    *,
    scale: float | None = None,
    block_s: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention: q (B, 1, H, hs) or (B, H, hs) vs cache (B, KVH, S, hs).

    Returns the same shape as ``q``. ``pos`` is the query token's position.
    ``hs`` must be a multiple of 128 when compiled (Mosaic DMA slices must
    cover whole 128-lane tiles) — callers zero-pad smaller head sizes (the
    scores/outputs are unchanged by zero pad lanes) and pass the real
    ``scale`` = 1/sqrt(real_hs).
    """
    squeeze = False
    if q.ndim == 4:
        if q.shape[1] != 1:
            raise ValueError("flash_decode_attention is single-query (T=1)")
        q = q[:, 0]
        squeeze = True
    if interpret is None:
        interpret = interpret_default()
    hs = q.shape[-1]
    if not interpret and hs % 128 != 0:
        raise ValueError(
            f"flash decode requires head_size % 128 == 0 on TPU (got {hs}); "
            "pad the cache head dim (Generator does this automatically)"
        )
    if scale is None:
        scale = 1.0 / (hs**0.5)
    S = k_cache.shape[2]
    # Big blocks amortize DMA-wait overhead (measured on v5e at 8K context:
    # 256-row blocks 56% of HBM, 1024-row 92%), but keep >=4 blocks so the
    # double-buffered pipeline has work in flight at small S.
    bs = min(block_s, max(256, S // 4), S)
    while S % bs != 0:
        bs //= 2
    pos_vec = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (q.shape[0],)
    )
    out = _flash_decode(q, k_cache, v_cache, pos_vec, float(scale), bs, interpret)
    return out[:, None] if squeeze else out
