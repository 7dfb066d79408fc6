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


@functools.partial(jax.jit, static_argnames=("scale", "interpret"), inline=True)
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


def _kernel_stacked(
    pos_ref,  # (B,) int32
    table_ref,  # (B, max_pages) int32
    wpage_ref,  # (B,) int32 — physical page receiving this step's row
    wrow_ref,  # (B,) int32 — row within that page
    layer_ref,  # (1,) int32
    q_ref,  # (1, KVH, G, hs) VMEM
    k_hbm_in,  # (L, P, KVH, page, hs) HBM — aliased with k_out
    v_hbm_in,
    knew_ref,  # (1, KVH, 1, hs) VMEM
    vnew_ref,
    o_ref,  # (1, KVH, G, hs) VMEM
    k_out,  # aliased pools
    v_out,
    k_buf,  # (2, KVH, page, hs) VMEM scratch
    v_buf,
    sems,  # (2, 3)
    *,
    page: int,
    scale: float,
):
    """Layer-stacked paged decode attention with in-place row append.

    The paged analog of attention._kernel_stacked: pools ride the layer
    scan's CARRY un-sliced (scan-slicing them cost a full pool read+rebuild
    per decode step — the round-1 paged engine ran at half the dense
    engine's throughput for exactly this reason), the kernel indexes the
    layer via scalar prefetch, appends this step's K/V rows for all heads
    at (write_page, write_row) itself (single-row f32 DMAs are layout-legal;
    int8 pools would need the q8 kernel's RMW windows), and the grid is (B,)
    with every KV head of a page streamed in one DMA.
    """
    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_pages = jax.lax.div(pos, page) + 1

    ak = pltpu.make_async_copy(
        knew_ref.at[0],
        k_out.at[layer, wpage_ref[b], :, pl.ds(wrow_ref[b], 1), :],
        sems.at[0, 2],
    )
    av = pltpu.make_async_copy(
        vnew_ref.at[0],
        v_out.at[layer, wpage_ref[b], :, pl.ds(wrow_ref[b], 1), :],
        sems.at[1, 2],
    )
    ak.start()
    av.start()
    ak.wait()
    av.wait()

    o_ref[0] = _attend_pages_f32(
        layer, b, pos, n_pages, q_ref[0].astype(jnp.float32) * scale,
        table_ref, k_out, v_out, k_buf, v_buf, sems, page=page,
    ).astype(o_ref.dtype)


def _attend_pages_f32(
    layer, b, pos, n_pages, q, table_ref, k_out, v_out, k_buf, v_buf, sems,
    *, page: int,
):
    """Double-buffered table-chasing online-softmax loop over row ``b``'s fp
    pages. ``q``: (KVH, G, hs) f32 values, PRE-scaled. Returns f32."""

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_out.at[layer, table_ref[b, i]], k_buf.at[slot], sems.at[slot, 0]
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_out.at[layer, table_ref[b, i]], v_buf.at[slot], sems.at[slot, 1]
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    KVH, G, hs = q.shape

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

        k = k_buf[slot].astype(jnp.float32)  # (KVH, page, hs)
        v = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (KVH, G, page)
        t = i * page + jax.lax.broadcasted_iota(jnp.int32, (KVH, G, page), 2)
        s = jnp.where(t <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
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
    _, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
    return acc / l


@functools.partial(jax.jit, static_argnames=("scale", "interpret"), inline=True)
def _paged_decode_stacked(
    q, k_pool, v_pool, table, k_new, v_new, wpage, wrow, layer, pos,
    scale: float, interpret: bool,
):
    B, H, hs = q.shape
    L, P, KVH, page, _ = k_pool.shape
    G = H // KVH

    def vmem_spec(shape):
        return pl.BlockSpec(
            shape,
            lambda b, *refs: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # pos, table, wpage, wrow, layer
        grid=(B,),
        in_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec,  # k pool (aliased)
            hbm_spec,  # v pool (aliased)
            vmem_spec((1, KVH, 1, hs)),
            vmem_spec((1, KVH, 1, hs)),
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec,
            hbm_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, page, hs), k_pool.dtype),
            pltpu.VMEM((2, KVH, page, hs), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    q4 = q.reshape(B, KVH, G, hs)
    # operands: 0=pos 1=table 2=wpage 3=wrow 4=layer 5=q 6=k 7=v 8=knew 9=vnew
    out, k_pool, v_pool = pl.pallas_call(
        functools.partial(_kernel_stacked, page=page, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(
        pos, table, wpage, wrow, layer, q4, k_pool, v_pool,
        k_new.reshape(B, KVH, 1, hs), v_new.reshape(B, KVH, 1, hs),
    )
    return out.reshape(B, H, hs), k_pool, v_pool


def paged_decode_attention_stacked(
    q: jax.Array,
    k_pool: jax.Array,  # (L, P, KVH, page, hs) — updated IN PLACE
    v_pool: jax.Array,
    table: jax.Array,  # (B, max_pages) int32
    k_new: jax.Array,  # (B, KVH, 1, hs) rows for the write coords
    v_new: jax.Array,
    write_page: jax.Array,  # (B,) int32 physical page for this step's row
    write_row: jax.Array,  # (B,) int32 row within that page
    layer,
    pos,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Fused append + paged decode attention over layer-stacked pools.

    Returns ``(att (B, H, hs) or (B, 1, H, hs), k_pool, v_pool)`` with the
    pools updated in place (treat inputs as consumed, scan-carry style).
    """
    squeeze = False
    if q.ndim == 4:
        if q.shape[1] != 1:
            raise ValueError("paged stacked decode is single-query (T=1)")
        q = q[:, 0]
        squeeze = True
    if interpret is None:
        interpret = interpret_default()
    hs = q.shape[-1]
    if not interpret and hs % 128 != 0:
        raise ValueError(f"paged decode requires head_size % 128 == 0 (got {hs})")
    if scale is None:
        scale = 1.0 / (hs**0.5)
    B = q.shape[0]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    out, k_pool, v_pool = _paged_decode_stacked(
        q, k_pool, v_pool, table,
        k_new, v_new,
        jnp.asarray(write_page, jnp.int32).reshape(-1),
        jnp.asarray(write_row, jnp.int32).reshape(-1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos, float(scale), interpret,
    )
    return (out[:, None] if squeeze else out), k_pool, v_pool


def _kernel_stacked_q8(
    pos_ref,  # (B,) int32
    table_ref,  # (B, max_pages) int32
    wpage_ref,  # (B,) int32
    wrow_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    q_ref,  # (1, KVH, G, hs) VMEM
    k_hbm_in,  # (L, P, KVH, page, hs) int8 — aliased with k_out
    ks_hbm_in,  # (L, P, KVH, page) f32 — aliased with ks_out
    v_hbm_in,
    vs_hbm_in,
    knew_ref,  # (1, KVH, 8, hs) int8 VMEM — row 0 is this step's K row
    ksnew_ref,  # (1, KVH, 1) f32
    vnew_ref,
    vsnew_ref,
    o_ref,  # (1, KVH, G, hs) VMEM
    k_out,  # aliased pools
    ks_out,
    v_out,
    vs_out,
    k_buf,  # (2, KVH, page, hs) int8 scratch
    ks_buf,  # (2, KVH, page) f32
    v_buf,
    vs_buf,
    kwin,  # (KVH, 8, hs) int8 — append RMW window
    vwin,
    kswin,  # (KVH, 128) f32
    vswin,
    sems,  # (2, 6)
    *,
    page: int,
    scale: float,
):
    """INT8 paged decode attention with in-kernel row+scale appends.

    The paged counterpart of attention_q8._kernel_stacked: pools are int8
    with per-row scales (4x the tokens per HBM byte — the paged pool IS the
    memory-capacity story, so quantizing it compounds), appends go through
    the same aligned read-modify-write windows (single-row int8 DMAs are
    illegal: sublane slices must be 8-aligned multiples of 8; a lone f32
    scale sits mid-lane-tile) addressed at (write_page, write_row), and the
    block loop chases the page table with per-page scale folding:
    ``s = (q·k8) * k_scale``, ``out += (p * v_scale)·v8`` — int8→bf16 is
    exact, both contractions stay on the MXU.
    """
    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_pages = jax.lax.div(pos, page) + 1
    wpage = wpage_ref[b]
    wrow = wrow_ref[b]

    from llama2_tpu.ops.pallas.attention_q8 import _append_rmw

    # same aligned-window RMW as the dense stacked kernel, addressed at the
    # write coordinates: pools index as [layer, PAGE, kvh, ROW-in-page, hs]
    _append_rmw(
        layer, wpage, wrow,
        knew_ref[0, :, 0:1, :], ksnew_ref[0], vnew_ref[0, :, 0:1, :],
        vsnew_ref[0],
        k_out, ks_out, v_out, vs_out, kwin, vwin, kswin, vswin, sems,
    )
    o_ref[0] = _attend_pages_q8(
        layer, b, pos, n_pages, q_ref[0].astype(jnp.bfloat16), table_ref,
        k_out, ks_out, v_out, vs_out, k_buf, ks_buf, v_buf, vs_buf, sems,
        page=page, scale=scale,
    ).astype(o_ref.dtype)


def _attend_pages_q8(
    layer, b, pos, n_pages, q, table_ref,
    k_out, ks_out, v_out, vs_out, k_buf, ks_buf, v_buf, vs_buf, sems,
    *, page: int, scale: float,
):
    """Double-buffered table-chasing online-softmax loop over row ``b``'s
    int8 pages. ``q``: (KVH, G, hs) bf16 values. Returns (KVH, G, hs) f32."""

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_out.at[layer, table_ref[b, i]], k_buf.at[slot], sems.at[slot, 0]
        )

    def ks_dma(slot, i):
        return pltpu.make_async_copy(
            ks_out.at[layer, table_ref[b, i]], ks_buf.at[slot],
            sems.at[slot, 1],
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_out.at[layer, table_ref[b, i]], v_buf.at[slot], sems.at[slot, 2]
        )

    def vs_dma(slot, i):
        return pltpu.make_async_copy(
            vs_out.at[layer, table_ref[b, i]], vs_buf.at[slot],
            sems.at[slot, 3],
        )

    for d in (k_dma, ks_dma, v_dma, vs_dma):
        d(0, 0).start()

    KVH, G, hs = q.shape

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_pages)
        def _():
            for d in (k_dma, ks_dma, v_dma, vs_dma):
                d(nxt, i + 1).start()

        for d in (k_dma, ks_dma, v_dma, vs_dma):
            d(slot, i).wait()

        k = k_buf[slot].astype(jnp.bfloat16)  # (KVH, page, hs)
        ks = ks_buf[slot].reshape(KVH, 1, page)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KVH, G, page)
        s = s * (ks * scale)
        t = i * page + jax.lax.broadcasted_iota(jnp.int32, (KVH, G, page), 2)
        s = jnp.where(t <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # (KVH, G, page) f32
        l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
        v = v_buf[slot].astype(jnp.bfloat16)
        vs = vs_buf[slot].reshape(KVH, 1, page)
        pv = jax.lax.dot_general(
            (p * vs).astype(jnp.bfloat16), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((KVH, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((KVH, G, 1), jnp.float32)
    acc0 = jnp.zeros((KVH, G, hs), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
    return acc / l


@functools.partial(jax.jit, static_argnames=("scale", "interpret"), inline=True)
def _paged_decode_stacked_q8(
    q, k_pool, ks_pool, v_pool, vs_pool, table,
    k_new4, ks_new, v_new4, vs_new, wpage, wrow, layer, pos,
    scale: float, interpret: bool,
):
    B, H, hs = q.shape
    L, P, KVH, page, _ = k_pool.shape
    G = H // KVH

    def vmem_spec(shape):
        nd = len(shape)

        def imap(b, *refs, nd=nd):
            return (b,) + (0,) * (nd - 1)

        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # pos, table, wpage, wrow, layer
        grid=(B,),
        in_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec,  # k8 pool (aliased)
            hbm_spec,  # k scale pool (aliased)
            hbm_spec,  # v8 pool (aliased)
            hbm_spec,  # v scale pool (aliased)
            vmem_spec((1, KVH, 8, hs)),  # knew (row 0 real)
            vmem_spec((1, KVH, 1)),  # ksnew
            vmem_spec((1, KVH, 8, hs)),
            vmem_spec((1, KVH, 1)),
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec, hbm_spec, hbm_spec, hbm_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, page, hs), jnp.int8),
            pltpu.VMEM((2, KVH, page), jnp.float32),
            pltpu.VMEM((2, KVH, page, hs), jnp.int8),
            pltpu.VMEM((2, KVH, page), jnp.float32),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    q4 = q.reshape(B, KVH, G, hs)
    # operands: 0=pos 1=table 2=wpage 3=wrow 4=layer 5=q 6=k8 7=ks 8=v8
    #           9=vs 10=knew 11=ksnew 12=vnew 13=vsnew
    out, k_pool, ks_pool, v_pool, vs_pool = pl.pallas_call(
        functools.partial(_kernel_stacked_q8, page=page, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(ks_pool.shape, ks_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(vs_pool.shape, vs_pool.dtype),
        ],
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4},
        interpret=interpret,
    )(
        pos, table, wpage, wrow, layer, q4, k_pool, ks_pool, v_pool, vs_pool,
        k_new4, ks_new, v_new4, vs_new,
    )
    return out.reshape(B, H, hs), k_pool, ks_pool, v_pool, vs_pool


def paged_decode_attention_q8_stacked(
    q: jax.Array,
    k_pool: jax.Array,  # (L, P, KVH, page, hs) int8 — updated IN PLACE
    ks_pool: jax.Array,  # (L, P, KVH, page) f32 — updated IN PLACE
    v_pool: jax.Array,
    vs_pool: jax.Array,
    table: jax.Array,  # (B, max_pages) int32
    k_new: jax.Array,  # (B, KVH, 1, hs) int8 rows for the write coords
    ks_new: jax.Array,  # (B, KVH, 1) f32
    v_new: jax.Array,
    vs_new: jax.Array,
    write_page: jax.Array,  # (B,) int32
    write_row: jax.Array,  # (B,) int32
    layer,
    pos,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Fused append + INT8 paged decode attention over layer-stacked pools.

    Returns ``(att, k_pool, ks_pool, v_pool, vs_pool)`` with all four pools
    updated in place (treat inputs as consumed, scan-carry style).
    ``page_size % 128 == 0`` required when compiled: the RMW scale window is
    one whole 128-lane tile inside the page.
    """
    squeeze = False
    if q.ndim == 4:
        if q.shape[1] != 1:
            raise ValueError("paged stacked q8 decode is single-query (T=1)")
        q = q[:, 0]
        squeeze = True
    if interpret is None:
        interpret = interpret_default()
    hs = q.shape[-1]
    page = k_pool.shape[3]
    if not interpret and hs % 128 != 0:
        raise ValueError(f"paged q8 decode requires head_size % 128 == 0 (got {hs})")
    if page % 128 != 0:
        # the RMW scale window is one whole 128-lane tile inside the page —
        # interpret mode included (the window slice would run off a shorter
        # page); engines gate on this before choosing the pallas path
        raise ValueError(f"paged q8 decode requires page_size % 128 == 0 (got {page})")
    if scale is None:
        scale = 1.0 / (hs**0.5)
    B = q.shape[0]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    k_new4 = jnp.pad(k_new, ((0, 0), (0, 0), (0, 7), (0, 0)))
    v_new4 = jnp.pad(v_new, ((0, 0), (0, 0), (0, 7), (0, 0)))
    out, k_pool, ks_pool, v_pool, vs_pool = _paged_decode_stacked_q8(
        q, k_pool, ks_pool, v_pool, vs_pool, table,
        k_new4, ks_new, v_new4, vs_new,
        jnp.asarray(write_page, jnp.int32).reshape(-1),
        jnp.asarray(write_row, jnp.int32).reshape(-1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos, float(scale), interpret,
    )
    return (
        (out[:, None] if squeeze else out), k_pool, ks_pool, v_pool, vs_pool
    )


def _kernel_stacked_fused(
    pos_ref,  # (B,) int32
    table_ref,  # (B, max_pages) int32
    wpage_ref,  # (B,) int32
    wrow_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    qkv_ref,  # (1, H + 2*KVH, hs) VMEM — PRE-rope QKV rows
    cos_ref,  # (1, 1, hs) f32 VMEM — interleaved-duplicated step row
    sin_ref,
    k_hbm_in,  # aliased pools
    v_hbm_in,
    o_ref,  # (1, KVH, G, hs) VMEM
    k_out,
    v_out,
    k_buf,
    v_buf,
    knew_s,  # (KVH, 1, hs) pool-dtype scratch — staged append row
    vnew_s,
    sems,
    *,
    page: int,
    scale: float,
    n_q_heads: int,
):
    """:func:`_kernel_stacked` with the inter-launch XLA glue pulled into
    the kernel prologue (the paged fp twin of
    attention._kernel_stacked_fused): RoPE on q/k runs on the VPU on the
    raw fused-QKV launch output; the roped K row and V row stage through
    VMEM scratch and append via the same single-row DMA at the write
    coordinates."""
    from llama2_tpu.ops.pallas.attention_q8 import _rope_interleaved

    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_pages = jax.lax.div(pos, page) + 1
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
        knew_s,
        k_out.at[layer, wpage_ref[b], :, pl.ds(wrow_ref[b], 1), :],
        sems.at[0, 2],
    )
    av = pltpu.make_async_copy(
        vnew_s,
        v_out.at[layer, wpage_ref[b], :, pl.ds(wrow_ref[b], 1), :],
        sems.at[1, 2],
    )
    ak.start()
    av.start()
    ak.wait()
    av.wait()

    o_ref[0] = _attend_pages_f32(
        layer, b, pos, n_pages,
        q.reshape(KVH, H // KVH, hs) * scale,
        table_ref, k_out, v_out, k_buf, v_buf, sems, page=page,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "scale", "interpret"), inline=True
)
def _paged_decode_fused(
    qkv, k_pool, v_pool, table, cos_il, sin_il, wpage, wrow, layer, pos,
    n_heads: int, scale: float, interpret: bool,
):
    B = qkv.shape[0]
    L, P, KVH, page, hs = k_pool.shape
    H = n_heads
    G = H // KVH

    def vmem_spec(shape):
        nd = len(shape)

        def imap(b, *refs, nd=nd):
            return (b,) + (0,) * (nd - 1)

        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # pos, table, wpage, wrow, layer
        grid=(B,),
        in_specs=[
            vmem_spec((1, H + 2 * KVH, hs)),  # qkv
            # (B, 1, hs) layout — see attention_q8._flash_decode_q8_fused
            vmem_spec((1, 1, hs)),  # cos_il
            vmem_spec((1, 1, hs)),  # sin_il
            hbm_spec, hbm_spec,  # pools (aliased)
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec, hbm_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, page, hs), k_pool.dtype),
            pltpu.VMEM((2, KVH, page, hs), v_pool.dtype),
            pltpu.VMEM((KVH, 1, hs), k_pool.dtype),
            pltpu.VMEM((KVH, 1, hs), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    # operands: 0=pos 1=table 2=wpage 3=wrow 4=layer 5=qkv 6=cos 7=sin
    #           8=k 9=v
    out, k_pool, v_pool = pl.pallas_call(
        functools.partial(
            _kernel_stacked_fused, page=page, scale=scale, n_q_heads=H
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), qkv.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases={8: 1, 9: 2},
        interpret=interpret,
    )(pos, table, wpage, wrow, layer, qkv, cos_il[:, None], sin_il[:, None],
      k_pool, v_pool)
    return out.reshape(B, H, hs), k_pool, v_pool


def paged_decode_attention_fused(
    qkv: jax.Array,  # (B, H+2*KVH, hs) — raw fused-QKV output, PRE-rope
    k_pool: jax.Array,  # (L, P, KVH, page, hs) — updated IN PLACE
    v_pool: jax.Array,
    table: jax.Array,  # (B, max_pages) int32
    cos_il: jax.Array,  # (B, hs) f32 — step RoPE rows, pair-DUPLICATED
    sin_il: jax.Array,
    write_page: jax.Array,  # (B,) int32
    write_row: jax.Array,  # (B,) int32
    layer,
    pos,
    *,
    n_heads: int,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Glue-fused fp paged decode attention: RoPE (q and k), the in-place
    row append at ``(write_page, write_row)``, and the table-chasing
    online-softmax read in ONE launch consuming the fused-QKV launch's raw
    output (the paged fp twin of attention.flash_decode_attention_fused).

    Returns ``(att (B, H, hs), k_pool, v_pool)`` with the pools updated in
    place — treat the inputs as consumed, scan-carry style.
    """
    B, rows, hs = qkv.shape
    KVH = k_pool.shape[2]
    if rows != n_heads + 2 * KVH:
        raise ValueError(
            f"qkv rows {rows} != n_heads {n_heads} + 2*KVH {2 * KVH}"
        )
    if interpret is None:
        interpret = interpret_default()
    if not interpret and hs % 128 != 0:
        raise ValueError(
            f"paged fused decode requires head_size % 128 == 0 (got {hs})"
        )
    if scale is None:
        scale = 1.0 / (hs**0.5)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    return _paged_decode_fused(
        qkv, k_pool, v_pool, table, cos_il, sin_il,
        jnp.asarray(write_page, jnp.int32).reshape(-1),
        jnp.asarray(write_row, jnp.int32).reshape(-1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos, n_heads, float(scale), interpret,
    )


def _kernel_stacked_q8_fused(
    pos_ref,  # (B,) int32
    table_ref,  # (B, max_pages) int32
    wpage_ref,  # (B,) int32
    wrow_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    qkv_ref,  # (1, H + 2*KVH, hs) f32 VMEM — PRE-rope QKV rows
    cos_ref,  # (1, hs) f32 VMEM — interleaved-duplicated step table
    sin_ref,
    k_hbm_in,  # aliased pools
    ks_hbm_in,
    v_hbm_in,
    vs_hbm_in,
    o_ref,  # (1, KVH, G, hs) VMEM
    k_out,
    ks_out,
    v_out,
    vs_out,
    k_buf,
    ks_buf,
    v_buf,
    vs_buf,
    kwin,
    vwin,
    kswin,
    vswin,
    sems,
    *,
    page: int,
    scale: float,
    n_q_heads: int,
):
    """:func:`_kernel_stacked_q8` with the inter-launch XLA glue pulled into
    the kernel prologue (the paged twin of
    attention_q8._kernel_stacked_fused): RoPE on q/k and per-row K/V
    quantization run on the VPU on the raw fused-QKV launch output, then the
    RMW append at the write coordinates and the table-chasing read."""
    from llama2_tpu.ops.pallas.attention_q8 import (
        _append_rmw,
        _quantize_rows,
        _rope_interleaved,
    )

    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_pages = jax.lax.div(pos, page) + 1
    H = n_q_heads
    KVH = kwin.shape[0]
    hs = kwin.shape[2]

    qkv = qkv_ref[0]  # (H + 2*KVH, hs) f32
    cos = cos_ref[0]
    sin = sin_ref[0]
    q = _rope_interleaved(qkv[:H], cos, sin)
    k = _rope_interleaved(qkv[H : H + KVH], cos, sin)
    v = qkv[H + KVH :]
    k8, k_sc = _quantize_rows(k)
    v8, v_sc = _quantize_rows(v)

    _append_rmw(
        layer, wpage_ref[b], wrow_ref[b], k8, k_sc, v8, v_sc,
        k_out, ks_out, v_out, vs_out, kwin, vwin, kswin, vswin, sems,
    )
    o_ref[0] = _attend_pages_q8(
        layer, b, pos, n_pages,
        q.reshape(KVH, H // KVH, hs).astype(jnp.bfloat16), table_ref,
        k_out, ks_out, v_out, vs_out, k_buf, ks_buf, v_buf, vs_buf, sems,
        page=page, scale=scale,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "scale", "interpret"), inline=True
)
def _paged_decode_q8_fused(
    qkv, k_pool, ks_pool, v_pool, vs_pool, table, cos_il, sin_il,
    wpage, wrow, layer, pos,
    n_heads: int, scale: float, interpret: bool,
):
    B = qkv.shape[0]
    L, P, KVH, page, hs = k_pool.shape
    H = n_heads
    G = H // KVH

    def vmem_spec(shape):
        nd = len(shape)

        def imap(b, *refs, nd=nd):
            return (b,) + (0,) * (nd - 1)

        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # pos, table, wpage, wrow, layer
        grid=(B,),
        in_specs=[
            vmem_spec((1, H + 2 * KVH, hs)),  # qkv
            # (B, 1, hs) layout — see attention_q8._flash_decode_q8_fused
            vmem_spec((1, 1, hs)),  # cos_il
            vmem_spec((1, 1, hs)),  # sin_il
            hbm_spec, hbm_spec, hbm_spec, hbm_spec,  # pools (aliased)
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec, hbm_spec, hbm_spec, hbm_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, page, hs), jnp.int8),
            pltpu.VMEM((2, KVH, page), jnp.float32),
            pltpu.VMEM((2, KVH, page, hs), jnp.int8),
            pltpu.VMEM((2, KVH, page), jnp.float32),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    # operands: 0=pos 1=table 2=wpage 3=wrow 4=layer 5=qkv 6=cos 7=sin
    #           8=k8 9=ks 10=v8 11=vs
    out, k_pool, ks_pool, v_pool, vs_pool = pl.pallas_call(
        functools.partial(
            _kernel_stacked_q8_fused, page=page, scale=scale, n_q_heads=H
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), qkv.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(ks_pool.shape, ks_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(vs_pool.shape, vs_pool.dtype),
        ],
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        interpret=interpret,
    )(
        pos, table, wpage, wrow, layer, qkv, cos_il[:, None], sin_il[:, None],
        k_pool, ks_pool, v_pool, vs_pool,
    )
    return out.reshape(B, H, hs), k_pool, ks_pool, v_pool, vs_pool


def paged_decode_attention_q8_fused(
    qkv: jax.Array,  # (B, H+2*KVH, hs) f32 — raw fused-QKV output, PRE-rope
    k_pool: jax.Array,  # (L, P, KVH, page, hs) int8 — updated IN PLACE
    ks_pool: jax.Array,
    v_pool: jax.Array,
    vs_pool: jax.Array,
    table: jax.Array,  # (B, max_pages) int32
    cos_il: jax.Array,  # (B, hs) f32 — step RoPE rows, pair-DUPLICATED
    sin_il: jax.Array,
    write_page: jax.Array,  # (B,) int32
    write_row: jax.Array,  # (B,) int32
    layer,
    pos,
    *,
    n_heads: int,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Glue-fused INT8 paged decode attention: RoPE (q and k), per-row K/V
    quantization, the RMW append at ``(write_page, write_row)``, and the
    table-chasing online-softmax read in ONE launch, consuming the fused-QKV
    launch's raw output (the paged twin of
    attention_q8.flash_decode_attention_q8_fused).

    Returns ``(att (B, H, hs), k_pool, ks_pool, v_pool, vs_pool)`` with the
    pools updated in place — treat the inputs as consumed, scan-carry style.
    """
    B, rows, hs = qkv.shape
    KVH = k_pool.shape[2]
    if rows != n_heads + 2 * KVH:
        raise ValueError(
            f"qkv rows {rows} != n_heads {n_heads} + 2*KVH {2 * KVH}"
        )
    if interpret is None:
        interpret = interpret_default()
    if not interpret and hs % 128 != 0:
        raise ValueError(f"paged q8 decode requires head_size % 128 == 0 (got {hs})")
    page = k_pool.shape[3]
    if page % 128 != 0:
        raise ValueError(f"paged q8 decode requires page_size % 128 == 0 (got {page})")
    if scale is None:
        scale = 1.0 / (hs**0.5)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    return _paged_decode_q8_fused(
        qkv, k_pool, ks_pool, v_pool, vs_pool, table, cos_il, sin_il,
        jnp.asarray(write_page, jnp.int32).reshape(-1),
        jnp.asarray(write_row, jnp.int32).reshape(-1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos, n_heads, float(scale), interpret,
    )


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
