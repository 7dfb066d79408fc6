"""Flash decode attention over an INT8-quantized KV cache.

KV-cache quantization (per-row scales) cuts decode-attention HBM traffic and
cache footprint 4x vs fp32 — the long-context serving lever (the weights are
already INT8 on that path; at 8K+ context the KV stream becomes the
bandwidth term that matters).

TPU-native trick: the dequant never touches the streamed blocks
elementwise-with-scales. int8→bf16 conversion is EXACT (bf16's 8-bit
mantissa covers [-127, 127]), and the per-ROW scales fold into
score/probability vectors instead:

    scores[g, t] = (q_bf16 · k8_bf16[t]) * k_scale[t] * (1/sqrt(hs))
    out[g]      += Σ_t (p[g, t] * v_scale[t]) · v8_bf16[t]

so the VPU does one exact convert per element plus O(block) scale
multiplies, and both contractions stay on the MXU. Same online softmax and
double-buffered DMA as :mod:`llama2_tpu.ops.pallas.attention`.

Quantization: per (position, kv-head) row, ``scale = max|row| / 127``
(symmetric, like Q8_0 but per-row) — see :func:`quantize_kv_rows`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import decode_block_rows_q8, interpret_default

NEG_INF = float("-inf")


def quantize_kv_rows(rows: jax.Array):
    """Per-row symmetric int8: rows (..., hs) → (int8 rows, f32 scales (...))."""
    amax = jnp.max(jnp.abs(rows), axis=-1)
    scale = amax / 127.0
    safe = jnp.maximum(scale, 1e-20)[..., None]
    q = jnp.clip(jnp.round(rows / safe), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_kv(q: jax.Array, scale: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize_kv_rows` (oracle/tests)."""
    return q.astype(jnp.float32) * scale[..., None]


def _kernel(
    pos_ref,  # (B,) int32 scalar prefetch
    q_ref,  # (1, G, hs) VMEM
    k_hbm,  # (B, KVH, S, hs) int8 HBM
    ks_hbm,  # (B, KVH, S) f32 HBM
    v_hbm,
    vs_hbm,
    o_ref,  # (1, G, hs) VMEM
    k_buf,  # (2, block_s, hs) int8 scratch
    ks_buf,  # (2, 1, block_s) f32 scratch
    v_buf,
    vs_buf,
    sems,  # (2, 4)
    *,
    block_s: int,
    scale: float,
    lane: int = 128,
    t_rows: int = 1,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    pos = pos_ref[b]  # position of the LAST query row
    n_blocks = jax.lax.div(pos, block_s) + 1

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(blk * block_s, block_s), :],
            k_buf.at[slot], sems.at[slot, 0],
        )

    # scale arrays arrive as (B, KVH, S/lane, lane): KVH must stay OUTSIDE
    # the last-two (tiled) dims or Mosaic rejects the single-head slice
    rows = block_s // lane

    def ks_dma(slot, blk):
        return pltpu.make_async_copy(
            ks_hbm.at[b, h, pl.ds(blk * rows, rows), :],
            ks_buf.at[slot], sems.at[slot, 1],
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(blk * block_s, block_s), :],
            v_buf.at[slot], sems.at[slot, 2],
        )

    def vs_dma(slot, blk):
        return pltpu.make_async_copy(
            vs_hbm.at[b, h, pl.ds(blk * rows, rows), :],
            vs_buf.at[slot], sems.at[slot, 3],
        )

    for d in (k_dma, ks_dma, v_dma, vs_dma):
        d(0, 0).start()

    # q rows are (T*G): row r is query-token r // G, group head r % G; its
    # causal horizon is pos - (T-1) + r//G (the last row sits at `pos`)
    q = q_ref[0].astype(jnp.bfloat16)  # (T*G, hs); int8 path is bf16-dot
    R, hs = q.shape
    G = R // t_rows
    row_pos = pos - (t_rows - 1) + (
        jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 0) // G
    )

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            for d in (k_dma, ks_dma, v_dma, vs_dma):
                d(nxt, i + 1).start()

        for d in (k_dma, ks_dma, v_dma, vs_dma):
            d(slot, i).wait()

        k = k_buf[slot].astype(jnp.bfloat16)  # exact int8 -> bf16
        ks = ks_buf[slot].reshape(1, block_s)  # (rows, 128) -> (1, bs)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, bs) raw int-scale scores
        s = s * (ks * scale)
        t = i * block_s + jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 1)
        s = jnp.where(t <= row_pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # (G, bs) f32
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_buf[slot].astype(jnp.bfloat16)
        vs = vs_buf[slot].reshape(1, block_s)
        pv = jax.lax.dot_general(
            (p * vs).astype(jnp.bfloat16), v,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((R, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((R, 1), jnp.float32)
    acc0 = jnp.zeros((R, hs), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_s", "interpret", "lane"),
    inline=True,
)
def _flash_decode_q8(
    q, k8, ks, v8, vs, pos, scale: float, block_s: int, interpret: bool,
    lane: int,
):
    B, T, H, hs = q.shape
    KVH, S = k8.shape[1], k8.shape[2]
    G = H // KVH
    R = T * G

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec(
                (1, R, hs),
                lambda b, h, pos_ref: (b * pl.num_programs(1) + h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, hs),
            lambda b, h, pos_ref: (b * pl.num_programs(1) + h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_s, hs), jnp.int8),
            pltpu.VMEM((2, block_s // lane, lane), jnp.float32),
            pltpu.VMEM((2, block_s, hs), jnp.int8),
            pltpu.VMEM((2, block_s // lane, lane), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    # (B, T, H, hs) -> (B*KVH, T*G, hs), rows token-major within a group
    q3 = (
        q.reshape(B, T, KVH, G, hs)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B * KVH, R, hs)
    )
    # scales (B, KVH, S) -> (B, KVH, S/lane, lane): keep KVH out of the
    # tiled last-two dims so the per-head DMA slice is layout-legal
    ks4 = ks.reshape(B, KVH, S // lane, lane)
    vs4 = vs.reshape(B, KVH, S // lane, lane)
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_s=block_s, scale=scale, lane=lane, t_rows=T
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * KVH, R, hs), q.dtype),
        interpret=interpret,
    )(pos, q3, k8, ks4, v8, vs4)
    return (
        out.reshape(B, KVH, T, G, hs)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, T, H, hs)
    )


def _rope_interleaved(x, cos_il, sin_il):
    """Interleaved-pair RoPE on lane-major rows inside a kernel.

    ``x``: (..., hs) f32; ``cos_il/sin_il``: broadcastable (..., hs) with each
    pair's cos/sin DUPLICATED onto both lanes (cos_il[2j] == cos_il[2j+1]).
    Uses two 1-lane circular rolls + a parity select instead of the XLA
    formulation's (hs/2, 2) reshape, which Mosaic would relayout. The wrap
    lanes of each roll land only on the opposite parity and are masked by
    the select. Computes exactly x0*c - x1*s / x0*s + x1*c per pair, so it
    is bit-identical to :func:`llama2_tpu.ops.xla.apply_rope`.
    """
    hs = x.shape[-1]
    left = pltpu.roll(x, shift=hs - 1, axis=x.ndim - 1)  # lane j <- x[j+1]
    right = pltpu.roll(x, shift=1, axis=x.ndim - 1)  # lane j <- x[j-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    swapneg = jnp.where(lane % 2 == 0, -left, right)
    return x * cos_il + swapneg * sin_il


def _quantize_rows(x):
    """In-kernel :func:`quantize_kv_rows`: (N, hs) → ((N, 1, hs) int8,
    (N, 1) f32 scales). Same formula, so cache bytes match the XLA path."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # (N, 1)
    scale = amax / 127.0
    safe = jnp.maximum(scale, 1e-20)
    q8 = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
    return q8[:, None, :], scale


def _append_rmw(
    layer, b, pos, k_new, k_sc, v_new, v_sc,
    k_out, ks_out, v_out, vs_out, kwin, vwin, kswin, vswin, sems,
):
    """Aligned read-modify-write append of one (KVH, hs) K/V row + scales.

    A single int8 row cannot be DMA'd (int8 sublane tile is 8 with 4-row
    packing, so S-dim slices must be 8-aligned multiples of 8) and a single
    f32 scale element sits mid-lane-tile, so the kernel reads the enclosing
    ALIGNED window (8 rows of K/V, 128 lanes of scales), merges this step's
    row with a vector select, and writes the window back — all window
    shapes/offsets are tile-aligned and the extra traffic is
    ~KVH*(8*hs + 512) bytes per program. This replaces B x 4 x L per-step
    dynamic_update_slices, measured at ~160 us PER LAYER of pure op-dispatch
    overhead at 7B serving shapes (benchmarks/decode_breakdown.py).

    ``k_new/v_new``: (KVH, 1, hs) int8 values; ``k_sc/v_sc``: (KVH, 1) f32.
    """
    a8 = (pos // 8) * 8
    off8 = pos - a8
    a128 = (pos // 128) * 128
    off128 = pos - a128
    reads = (
        pltpu.make_async_copy(
            k_out.at[layer, b, :, pl.ds(a8, 8), :], kwin, sems.at[0, 4]
        ),
        pltpu.make_async_copy(
            v_out.at[layer, b, :, pl.ds(a8, 8), :], vwin, sems.at[1, 4]
        ),
        pltpu.make_async_copy(
            ks_out.at[layer, b, :, pl.ds(a128, 128)], kswin, sems.at[0, 5]
        ),
        pltpu.make_async_copy(
            vs_out.at[layer, b, :, pl.ds(a128, 128)], vswin, sems.at[1, 5]
        ),
    )
    for r in reads:
        r.start()
    for r in reads:
        r.wait()
    KVH = kwin.shape[0]
    hs = kwin.shape[2]
    row8 = jax.lax.broadcasted_iota(jnp.int32, (KVH, 8, hs), 1)
    kwin[:] = jnp.where(row8 == off8, k_new, kwin[:])
    vwin[:] = jnp.where(row8 == off8, v_new, vwin[:])
    lane = jax.lax.broadcasted_iota(jnp.int32, (KVH, 128), 1)
    kswin[:] = jnp.where(lane == off128, k_sc, kswin[:])
    vswin[:] = jnp.where(lane == off128, v_sc, vswin[:])
    writes = (
        pltpu.make_async_copy(
            kwin, k_out.at[layer, b, :, pl.ds(a8, 8), :], sems.at[0, 4]
        ),
        pltpu.make_async_copy(
            vwin, v_out.at[layer, b, :, pl.ds(a8, 8), :], sems.at[1, 4]
        ),
        pltpu.make_async_copy(
            kswin, ks_out.at[layer, b, :, pl.ds(a128, 128)], sems.at[0, 5]
        ),
        pltpu.make_async_copy(
            vswin, vs_out.at[layer, b, :, pl.ds(a128, 128)], sems.at[1, 5]
        ),
    )
    for w in writes:
        w.start()
    for w in writes:
        w.wait()


def _kernel_stacked(
    pos_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    q_ref,  # (1, KVH, G, hs) VMEM
    k_hbm_in,  # (L, B, KVH, S, hs) int8 — aliased with k_out
    ks_hbm_in,  # (L, B, KVH, S) f32 — aliased with ks_out
    v_hbm_in,
    vs_hbm_in,
    knew_ref,  # (1, KVH, 8, hs) int8 VMEM — row 0 is this step's K row
    ksnew_ref,  # (1, KVH, 1) f32 VMEM
    vnew_ref,
    vsnew_ref,
    o_ref,  # (1, KVH, G, hs) VMEM
    k_out,  # aliased caches (same buffers as *_in)
    ks_out,
    v_out,
    vs_out,
    k_buf,  # (2, KVH, block_s, hs) int8 scratch
    ks_buf,  # (2, KVH, block_s) f32
    v_buf,
    vs_buf,
    kwin,  # (KVH, 8, hs) int8 scratch — append RMW window
    vwin,
    kswin,  # (KVH, 128) f32
    vswin,
    sems,  # (2, 6)
    *,
    block_s: int,
    scale: float,
):
    """Stacked-cache T=1 decode attention over the INT8 KV cache with
    in-kernel read-modify-write appends (see :func:`_append_rmw`).

    Batched-serving shape: the grid is (B,) and each program streams ALL KV
    heads' blocks in one strided DMA — a (b, h)-per-program grid issues
    B*KVH tiny DMAs per layer and goes DMA-latency-bound (measured ~195 us
    per layer call at B=8, KVH=16 vs ~58 us at B=1).
    """
    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_blocks = jax.lax.div(pos, block_s) + 1

    _append_rmw(
        layer, b, pos,
        knew_ref[0, :, 0:1, :], ksnew_ref[0], vnew_ref[0, :, 0:1, :],
        vsnew_ref[0],
        k_out, ks_out, v_out, vs_out, kwin, vwin, kswin, vswin, sems,
    )
    o_ref[0] = _attend_blocks(
        layer, b, pos, n_blocks, q_ref[0].astype(jnp.bfloat16),
        k_out, ks_out, v_out, vs_out, k_buf, ks_buf, v_buf, vs_buf, sems,
        block_s=block_s, scale=scale,
    ).astype(o_ref.dtype)


def _attend_blocks(
    layer, b, pos, n_blocks, q,
    k_out, ks_out, v_out, vs_out, k_buf, ks_buf, v_buf, vs_buf, sems,
    *, block_s: int, scale: float,
):
    """Double-buffered online-softmax loop over the int8 KV blocks of
    (layer, b). ``q``: (KVH, G, hs) bf16 values. Returns (KVH, G, hs) f32."""

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_out.at[layer, b, :, pl.ds(blk * block_s, block_s), :],
            k_buf.at[slot], sems.at[slot, 0],
        )

    def ks_dma(slot, blk):
        return pltpu.make_async_copy(
            ks_out.at[layer, b, :, pl.ds(blk * block_s, block_s)],
            ks_buf.at[slot], sems.at[slot, 1],
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_out.at[layer, b, :, pl.ds(blk * block_s, block_s), :],
            v_buf.at[slot], sems.at[slot, 2],
        )

    def vs_dma(slot, blk):
        return pltpu.make_async_copy(
            vs_out.at[layer, b, :, pl.ds(blk * block_s, block_s)],
            vs_buf.at[slot], sems.at[slot, 3],
        )

    for d in (k_dma, ks_dma, v_dma, vs_dma):
        d(0, 0).start()

    KVH, G, hs = q.shape

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            for d in (k_dma, ks_dma, v_dma, vs_dma):
                d(nxt, i + 1).start()

        for d in (k_dma, ks_dma, v_dma, vs_dma):
            d(slot, i).wait()

        k = k_buf[slot].astype(jnp.bfloat16)  # (KVH, bs, hs)
        ks = ks_buf[slot].reshape(KVH, 1, block_s)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KVH, G, bs)
        s = s * (ks * scale)
        t = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (KVH, G, block_s), 2
        )
        s = jnp.where(t <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # (KVH, G, bs) f32
        l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
        v = v_buf[slot].astype(jnp.bfloat16)  # (KVH, bs, hs)
        vs = vs_buf[slot].reshape(KVH, 1, block_s)
        pv = jax.lax.dot_general(
            (p * vs).astype(jnp.bfloat16), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KVH, G, hs)
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((KVH, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((KVH, G, 1), jnp.float32)
    acc0 = jnp.zeros((KVH, G, hs), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    return acc / l


@functools.partial(
    jax.jit, static_argnames=("scale", "block_s", "interpret"), inline=True
)
def _flash_decode_q8_stacked(
    q, k8, ks, v8, vs, k_new4, ks_new, v_new4, vs_new, layer, pos,
    scale: float, block_s: int, interpret: bool,
):
    B, H, hs = q.shape
    KVH = k8.shape[2]
    G = H // KVH

    def vmem_spec(shape):
        nd = len(shape)

        def imap(b, pos_ref, layer_ref, nd=nd):
            return (b,) + (0,) * (nd - 1)

        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec,  # k8 (aliased)
            hbm_spec,  # k scales (aliased)
            hbm_spec,  # v8 (aliased)
            hbm_spec,  # v scales (aliased)
            vmem_spec((1, KVH, 8, hs)),  # knew (row 0 real)
            vmem_spec((1, KVH, 1)),  # ksnew
            vmem_spec((1, KVH, 8, hs)),  # vnew
            vmem_spec((1, KVH, 1)),  # vsnew
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec, hbm_spec, hbm_spec, hbm_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, block_s, hs), jnp.int8),
            pltpu.VMEM((2, KVH, block_s), jnp.float32),
            pltpu.VMEM((2, KVH, block_s, hs), jnp.int8),
            pltpu.VMEM((2, KVH, block_s), jnp.float32),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    q4 = q.reshape(B, KVH, G, hs)
    # operands: 0=pos 1=layer 2=q 3=k8 4=ks 5=v8 6=vs 7=knew 8=ksnew
    #           9=vnew 10=vsnew; outputs: 0=att 1=k8 2=ks 3=v8 4=vs
    out, k8, ks, v8, vs = pl.pallas_call(
        functools.partial(_kernel_stacked, block_s=block_s, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), q.dtype),
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        interpret=interpret,
    )(pos, layer, q4, k8, ks, v8, vs, k_new4, ks_new, v_new4, vs_new)
    return out.reshape(B, H, hs), k8, ks, v8, vs


def flash_decode_attention_q8_stacked(
    q: jax.Array,
    k8: jax.Array,  # (L, B, KVH, S, hs) int8 — updated IN PLACE
    k_scale: jax.Array,  # (L, B, KVH, S) f32 — updated IN PLACE
    v8: jax.Array,
    v_scale: jax.Array,
    k_new: jax.Array,  # (B, KVH, 1, hs) int8 row for position pos
    ks_new: jax.Array,  # (B, KVH, 1) f32
    v_new: jax.Array,
    vs_new: jax.Array,
    layer,
    pos,
    *,
    scale: float | None = None,
    block_s: int = 1024,
    interpret: bool | None = None,
):
    """T=1 decode attention over the layer-stacked INT8 cache, appending
    this step's rows AND scales in-kernel via aligned read-modify-write
    windows. Returns ``(att, k8, k_scale, v8, v_scale)`` with all four
    caches updated in place — treat the inputs as consumed, scan-carry
    style."""
    squeeze = False
    if q.ndim == 4:
        if q.shape[1] != 1:
            raise ValueError("stacked q8 decode is T=1 only")
        q = q[:, 0]
        squeeze = True
    if interpret is None:
        interpret = interpret_default()
    hs = q.shape[-1]
    if not interpret and hs % 128 != 0:
        raise ValueError(f"q8 stacked decode requires head_size % 128 == 0 (got {hs})")
    S = k8.shape[3]
    if scale is None:
        scale = 1.0 / (hs**0.5)
    if S % 128 != 0:
        # the RMW scale window is a whole 128-lane tile; functional-mode
        # fixtures with odd S take the model's XLA fallback instead
        raise ValueError(f"q8 stacked decode requires seq_len % 128 == 0 (got {S})")
    bs = decode_block_rows_q8(S, k8.shape[2], hs, block_s)
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (q.shape[0],))
    layer_vec = jnp.asarray(layer, jnp.int32).reshape(1)
    k_new4 = jnp.pad(k_new, ((0, 0), (0, 0), (0, 7), (0, 0)))
    v_new4 = jnp.pad(v_new, ((0, 0), (0, 0), (0, 7), (0, 0)))
    out, k8, k_scale, v8, v_scale = _flash_decode_q8_stacked(
        q, k8, k_scale, v8, v_scale, k_new4, ks_new, v_new4, vs_new,
        layer_vec, pos_vec, float(scale), bs, interpret,
    )
    return (out[:, None] if squeeze else out), k8, k_scale, v8, v_scale


def _kernel_stacked_fused(
    pos_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    qkv_ref,  # (1, H + 2*KVH, hs) f32 VMEM — PRE-rope QKV rows
    cos_ref,  # (1, 1, hs) f32 VMEM — interleaved-duplicated step row
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
    block_s: int,
    scale: float,
    n_q_heads: int,
):
    """:func:`_kernel_stacked` with the inter-launch XLA glue pulled into
    the kernel prologue: RoPE on q/k (:func:`_rope_interleaved`) and per-row
    K/V quantization (:func:`_quantize_rows`) run on the VPU on data already
    in VMEM. The decode step is launch-bound at 7B scale — every XLA op
    between the qkv launch and this kernel is unhidden wall time, so the
    kernel takes the raw fused-QKV launch output instead."""
    b = pl.program_id(0)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_blocks = jax.lax.div(pos, block_s) + 1
    H = n_q_heads
    KVH = kwin.shape[0]
    hs = kwin.shape[2]

    qkv = qkv_ref[0]  # (H + 2*KVH, hs) f32
    cos = cos_ref[0]  # (1, hs) — broadcasts over rows
    sin = sin_ref[0]
    q = _rope_interleaved(qkv[:H], cos, sin)
    k = _rope_interleaved(qkv[H : H + KVH], cos, sin)
    v = qkv[H + KVH :]
    k8, k_sc = _quantize_rows(k)  # (KVH, 1, hs) int8, (KVH, 1) f32
    v8, v_sc = _quantize_rows(v)

    _append_rmw(
        layer, b, pos, k8, k_sc, v8, v_sc,
        k_out, ks_out, v_out, vs_out, kwin, vwin, kswin, vswin, sems,
    )
    o_ref[0] = _attend_blocks(
        layer, b, pos, n_blocks,
        q.reshape(KVH, H // KVH, hs).astype(jnp.bfloat16),
        k_out, ks_out, v_out, vs_out, k_buf, ks_buf, v_buf, vs_buf, sems,
        block_s=block_s, scale=scale,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "scale", "block_s", "interpret"),
    inline=True,
)
def _flash_decode_q8_fused(
    qkv, k8, ks, v8, vs, cos_il, sin_il, layer, pos,
    n_heads: int, scale: float, block_s: int, interpret: bool,
):
    B = qkv.shape[0]
    KVH = k8.shape[2]
    hs = k8.shape[4]
    H = n_heads
    G = H // KVH

    def vmem_spec(shape):
        nd = len(shape)

        def imap(b, pos_ref, layer_ref, nd=nd):
            return (b,) + (0,) * (nd - 1)

        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            vmem_spec((1, H + 2 * KVH, hs)),  # qkv
            # cos/sin ride (B, 1, hs): a (1, hs) block of a (B, hs) array
            # has sublane dim 1 (< 8, not whole-B) — Mosaic-illegal
            vmem_spec((1, 1, hs)),  # cos_il
            vmem_spec((1, 1, hs)),  # sin_il
            hbm_spec, hbm_spec, hbm_spec, hbm_spec,  # pools (aliased)
        ],
        out_specs=[
            vmem_spec((1, KVH, G, hs)),
            hbm_spec, hbm_spec, hbm_spec, hbm_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KVH, block_s, hs), jnp.int8),
            pltpu.VMEM((2, KVH, block_s), jnp.float32),
            pltpu.VMEM((2, KVH, block_s, hs), jnp.int8),
            pltpu.VMEM((2, KVH, block_s), jnp.float32),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 8, hs), jnp.int8),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.VMEM((KVH, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    # operands: 0=pos 1=layer 2=qkv 3=cos 4=sin 5=k8 6=ks 7=v8 8=vs
    # outputs:  0=att 1=k8 2=ks 3=v8 4=vs
    out, k8, ks, v8, vs = pl.pallas_call(
        functools.partial(
            _kernel_stacked_fused, block_s=block_s, scale=scale,
            n_q_heads=H,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, hs), qkv.dtype),
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        interpret=interpret,
    )(pos, layer, qkv, cos_il[:, None], sin_il[:, None], k8, ks, v8, vs)
    return out.reshape(B, H, hs), k8, ks, v8, vs


def flash_decode_attention_q8_fused(
    qkv: jax.Array,  # (B, H+2*KVH, hs) f32 — raw fused-QKV output, PRE-rope
    k8: jax.Array,  # (L, B, KVH, S, hs) int8 — updated IN PLACE
    k_scale: jax.Array,  # (L, B, KVH, S) f32 — updated IN PLACE
    v8: jax.Array,
    v_scale: jax.Array,
    cos_il: jax.Array,  # (B, hs) f32 — step RoPE table, pair-DUPLICATED
    sin_il: jax.Array,
    layer,
    pos,
    *,
    n_heads: int,
    scale: float | None = None,
    block_s: int = 1024,
    interpret: bool | None = None,
):
    """T=1 decode attention that fuses the whole attention block's glue:
    RoPE (q and k), per-row K/V INT8 quantization, the RMW cache append,
    and the online-softmax read — one launch consuming the fused-QKV
    launch's raw output. ``cos_il/sin_il`` are this step's per-slot rope
    rows with each pair's value duplicated onto both lanes
    (``jnp.repeat(cos, 2, -1)``), shared by every layer.

    Returns ``(att (B, H, hs), k8, k_scale, v8, v_scale)`` with the caches
    updated in place — treat the inputs as consumed, scan-carry style.
    """
    B, rows, hs = qkv.shape
    KVH = k8.shape[2]
    if rows != n_heads + 2 * KVH:
        raise ValueError(
            f"qkv rows {rows} != n_heads {n_heads} + 2*KVH {2 * KVH}"
        )
    if interpret is None:
        interpret = interpret_default()
    if not interpret and hs % 128 != 0:
        raise ValueError(f"fused q8 decode requires head_size % 128 == 0 (got {hs})")
    S = k8.shape[3]
    if S % 128 != 0:
        raise ValueError(f"fused q8 decode requires seq_len % 128 == 0 (got {S})")
    if scale is None:
        scale = 1.0 / (hs**0.5)
    bs = decode_block_rows_q8(S, k8.shape[2], hs, block_s)
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    layer_vec = jnp.asarray(layer, jnp.int32).reshape(1)
    return _flash_decode_q8_fused(
        qkv, k8, k_scale, v8, v_scale, cos_il, sin_il, layer_vec, pos_vec,
        n_heads, float(scale), bs, interpret,
    )


def flash_decode_attention_q8(
    q: jax.Array,
    k8: jax.Array,  # (B, KVH, S, hs) int8
    k_scale: jax.Array,  # (B, KVH, S) f32
    v8: jax.Array,
    v_scale: jax.Array,
    pos,
    *,
    scale: float | None = None,
    block_s: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention over the quantized cache.

    q: (B, T, H, hs) or (B, H, hs). ``pos`` is the position of the LAST
    query row; row t attends [0, pos - (T-1) + t] — a T>1 call is a
    speculative verify window whose keys were just written at positions
    pos-T+1..pos. hs % 128 == 0 when compiled.
    """
    squeeze = False
    if q.ndim == 3:
        q = q[:, None]
        squeeze = True
    if interpret is None:
        interpret = interpret_default()
    hs = q.shape[-1]
    if not interpret and hs % 128 != 0:
        raise ValueError(f"q8 flash decode requires head_size % 128 == 0 (got {hs})")
    S = k8.shape[2]
    if not interpret and S % 128 != 0:
        raise ValueError(f"q8 flash decode requires seq_len % 128 == 0 (got {S})")
    if scale is None:
        scale = 1.0 / (hs**0.5)
    if interpret:
        # functional mode: any lane dividing S works; take the largest <=128
        lane = next(l for l in range(min(128, S), 0, -1) if S % l == 0)
    else:
        lane = 128
        if S % lane != 0:
            raise ValueError(
                f"q8 flash decode requires seq_len % 128 == 0 (got {S})"
            )
    # largest multiple of `lane` that divides S, capped for pipelining
    # (halving can skip every legal divisor, e.g. S=2176 -> 544 -> ... -> 0)
    cap = min(block_s, max(256, S // 4), S)
    bs = lane
    k = 1
    while True:
        cand = lane * k
        if cand > cap:
            break
        if S % cand == 0:
            bs = cand
        k += 1
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (q.shape[0],))
    out = _flash_decode_q8(
        q, k8, k_scale, v8, v_scale, pos_vec, float(scale), bs, interpret, lane
    )
    return out[:, 0] if squeeze else out
