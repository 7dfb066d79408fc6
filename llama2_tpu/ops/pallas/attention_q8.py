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

from llama2_tpu.ops.pallas.common import interpret_default

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
    jax.jit, static_argnames=("scale", "block_s", "interpret", "lane")
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


def _kernel_stacked(
    pos_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    q_ref,  # (1, G, hs) VMEM
    k_hbm_in,  # (L, B, KVH, S, hs) int8 — aliased with k_out
    ks_hbm,  # (L, B, KVH, S/lane, lane) f32 (scales appended by caller)
    v_hbm_in,
    vs_hbm,
    knew_ref,  # (1, 1, hs) int8 VMEM
    vnew_ref,
    o_ref,  # (1, G, hs) VMEM
    k_out,  # aliased k cache
    v_out,
    k_buf,
    ks_buf,
    v_buf,
    vs_buf,
    sems,  # (2, 5)
    *,
    block_s: int,
    scale: float,
    lane: int = 128,
):
    """Stacked-cache T=1 decode attention over the INT8 KV cache with
    in-place int8 row append (see attention._kernel_stacked for why: the
    carried cache must never be scan-sliced into a pallas operand). Scale
    rows are appended by the CALLER via a tiny dynamic_update_slice — a
    single f32 element inside the lane-tiled scale array cannot be DMA'd
    legally from the kernel."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    layer = layer_ref[0]
    pos = pos_ref[b]
    n_blocks = jax.lax.div(pos, block_s) + 1

    ak = pltpu.make_async_copy(
        knew_ref.at[0], k_out.at[layer, b, h, pl.ds(pos, 1), :], sems.at[0, 4]
    )
    av = pltpu.make_async_copy(
        vnew_ref.at[0], v_out.at[layer, b, h, pl.ds(pos, 1), :], sems.at[1, 4]
    )
    ak.start()
    av.start()
    ak.wait()
    av.wait()

    rows = block_s // lane

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_out.at[layer, b, h, pl.ds(blk * block_s, block_s), :],
            k_buf.at[slot], sems.at[slot, 0],
        )

    def ks_dma(slot, blk):
        return pltpu.make_async_copy(
            ks_hbm.at[layer, b, h, pl.ds(blk * rows, rows), :],
            ks_buf.at[slot], sems.at[slot, 1],
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_out.at[layer, b, h, pl.ds(blk * block_s, block_s), :],
            v_buf.at[slot], sems.at[slot, 2],
        )

    def vs_dma(slot, blk):
        return pltpu.make_async_copy(
            vs_hbm.at[layer, b, h, pl.ds(blk * rows, rows), :],
            vs_buf.at[slot], sems.at[slot, 3],
        )

    for d in (k_dma, ks_dma, v_dma, vs_dma):
        d(0, 0).start()

    q = q_ref[0].astype(jnp.bfloat16)  # (G, hs)
    R, hs = q.shape

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

        k = k_buf[slot].astype(jnp.bfloat16)
        ks = ks_buf[slot].reshape(1, block_s)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * (ks * scale)
        t = i * block_s + jax.lax.broadcasted_iota(jnp.int32, (R, block_s), 1)
        s = jnp.where(t <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
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
    jax.jit, static_argnames=("scale", "block_s", "interpret", "lane")
)
def _flash_decode_q8_stacked(
    q, k8, ks, v8, vs, k_new, v_new, layer, pos, scale: float, block_s: int,
    interpret: bool, lane: int,
):
    B, H, hs = q.shape
    L, KVH, S = k8.shape[0], k8.shape[2], k8.shape[3]
    G = H // KVH

    def vmem_spec(shape):
        return pl.BlockSpec(
            shape,
            lambda b, h, pos_ref, layer_ref: (b * pl.num_programs(1) + h, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KVH),
        in_specs=[
            vmem_spec((1, G, hs)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k8 (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),  # k scales
            pl.BlockSpec(memory_space=pltpu.ANY),  # v8 (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),  # v scales
            vmem_spec((1, 1, hs)),
            vmem_spec((1, 1, hs)),
        ],
        out_specs=[
            vmem_spec((1, G, hs)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_s, hs), jnp.int8),
            pltpu.VMEM((2, block_s // lane, lane), jnp.float32),
            pltpu.VMEM((2, block_s, hs), jnp.int8),
            pltpu.VMEM((2, block_s // lane, lane), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    q3 = q.reshape(B * KVH, G, hs)
    ks5 = ks.reshape(L, B, KVH, S // lane, lane)
    vs5 = vs.reshape(L, B, KVH, S // lane, lane)
    # operands: 0=pos 1=layer 2=q 3=k8 4=ks 5=v8 6=vs 7=knew 8=vnew
    out, k8, v8 = pl.pallas_call(
        functools.partial(
            _kernel_stacked, block_s=block_s, scale=scale, lane=lane
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * KVH, G, hs), q.dtype),
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
        ],
        input_output_aliases={3: 1, 5: 2},
        interpret=interpret,
    )(
        pos, layer, q3, k8, ks5, v8, vs5,
        k_new.reshape(B * KVH, 1, hs), v_new.reshape(B * KVH, 1, hs),
    )
    return out.reshape(B, KVH, G, hs).reshape(B, KVH * G, hs), k8, v8


def flash_decode_attention_q8_stacked(
    q: jax.Array,
    k8: jax.Array,  # (L, B, KVH, S, hs) int8 — updated IN PLACE
    k_scale: jax.Array,  # (L, B, KVH, S) f32, rows for `pos` ALREADY written
    v8: jax.Array,
    v_scale: jax.Array,
    k_new: jax.Array,  # (B, KVH, 1, hs) int8 row for position pos
    v_new: jax.Array,
    layer,
    pos,
    *,
    scale: float | None = None,
    block_s: int = 1024,
    interpret: bool | None = None,
):
    """T=1 decode attention over the layer-stacked INT8 cache; returns
    ``(att (B, H, hs), k8, v8)`` with the int8 caches updated in place.
    The CALLER must have already written this step's scale values into
    k_scale/v_scale at [layer, :, :, pos] (cheap dynamic_update_slice)."""
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
    if interpret:
        lane = next(l for l in range(min(128, S), 0, -1) if S % l == 0)
    else:
        lane = 128
        if S % lane != 0:
            raise ValueError(f"q8 stacked decode requires seq_len % 128 == 0 (got {S})")
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
    layer_vec = jnp.asarray(layer, jnp.int32).reshape(1)
    out, k8, v8 = _flash_decode_q8_stacked(
        q, k8, k_scale, v8, v_scale, k_new, v_new, layer_vec, pos_vec,
        float(scale), bs, interpret, lane,
    )
    return (out[:, None] if squeeze else out), k8, v8


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
