"""Decode forward step over a paged KV cache.

The paged counterpart of :func:`llama2_tpu.models.llama.forward` for T=1
decode: instead of a dense per-slot cache, K/V live in per-layer page pools
(``runtime/paged_cache.py``) and each batch row reaches its pages through an
int32 page table. The layer loop is the same ``lax.scan`` — the pools' leading
layer dim scans exactly like the dense cache's.

Per layer: project q/k/v for the B current tokens, then the layer-stacked
paged flash kernel appends each row's K/V at its (page, row) slot
(host-precomputed from pos — allocation is host-side bookkeeping) and
attends through the table in one launch (``backend="pallas"``); the XLA
path writes rows with per-slot dynamic_update_slices and runs the gather
oracle. Pools ride the layer scan's carry un-sliced.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from llama2_tpu.config import ModelConfig
from llama2_tpu.models.llama import layer_keys
from llama2_tpu.ops import xla as ops
from llama2_tpu.ops.linear import linear


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend", "unroll", "axis_name",
                     "ring"),
    donate_argnames=("k_pool", "v_pool", "ks_pool", "vs_pool"),
    inline=True,
)
def paged_forward_step(
    params: dict,
    k_pool: jax.Array,  # (L, P, KVH, page, hs) — int8 when quantized
    v_pool: jax.Array,
    table: jax.Array,  # (B, max_pages) int32
    tokens: jax.Array,  # (B,) int32
    pos: jax.Array,  # (B,) int32 position of `tokens`
    page_ids: jax.Array,  # (B,) physical page holding position `pos`
    row_ids: jax.Array,  # (B,) row within that page
    config: ModelConfig,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
    unroll: int = 1,
    ks_pool: jax.Array | None = None,  # (L, P, KVH, page) f32 — int8 pools
    vs_pool: jax.Array | None = None,
    axis_name: str | None = None,  # tensor-parallel axis inside shard_map
    ring: bool = False,  # explicit overlapped ring for the wo/w2 reduces
):
    """One batched decode step.

    Returns ``(hidden, k_pool, v_pool)``, or
    ``(hidden, k_pool, ks_pool, v_pool, vs_pool)`` when scale pools are
    given (INT8 KV: per-row symmetric quantization, the paged analog of the
    dense engine's ``kv_quant`` — attention_q8.quantize_kv_rows).

    ``axis_name``: set when running INSIDE shard_map over a tensor-parallel
    mesh (parallel/dp_paged.py): weights and the pools' kv-head axis are
    LOCAL shards, ``config`` holds LOCAL head counts, and the row-parallel
    wo/w2 outputs psum over the axis (models/llama._post_attention — the
    same contract as the dense _run_layers path)."""
    B = tokens.shape[0]
    H, KVH, hs_real = config.n_heads, config.n_kv_heads, config.head_size
    hs_c = k_pool.shape[-1]  # possibly lane-padded

    from llama2_tpu.quant.q8 import QuantTensor

    x = jnp.take(params["tok_emb"], tokens, axis=0)[:, None, :]  # (B, 1, D)
    D = config.dim
    # QuantTensor.dtype == its dequant dtype; fused trees carry wqkv/w13
    x = x.astype(params.get("wq", params.get("wqkv")).dtype)
    positions = pos[:, None]
    cos, sin = ops.rope_angles(positions, hs_real)
    # quantized weights stay stacked; kernel indexes the layer (ops/linear.py)
    keys = layer_keys(params)
    stacked = {
        k: params[k] for k in keys if isinstance(params[k], QuantTensor)
    }
    layer_stack = {k: params[k] for k in keys if k not in stacked}

    kv_quant = ks_pool is not None

    # Pair-duplicated step rope rows for the glue-fused attention kernel —
    # one repeat per STEP (outside the layer scan; every layer shares the
    # step's positions). See llama.forward's T=1 branch.
    from llama2_tpu.ops.pallas.common import interpret_default

    cos_il = sin_il = None
    from llama2_tpu.ops.pallas.common import paged_scratch_fits

    if (
        backend == "pallas"
        and stacked
        and hs_c == hs_real
        and (hs_real % 128 == 0 or interpret_default())
        and (k_pool.shape[3] % 128 == 0 or not kv_quant)
        # whole pages are the kernels' DMA unit: K+V double buffers for all
        # KV heads must fit the Mosaic scoped-vmem stack (else compile OOM;
        # the engine warns and this falls back to the XLA gather path)
        and paged_scratch_fits(
            KVH, k_pool.shape[3], hs_c, k_pool.dtype.itemsize
        )
    ):
        cos_il = jnp.repeat(cos.reshape(B, -1), 2, axis=-1)
        sin_il = jnp.repeat(sin.reshape(B, -1), 2, axis=-1)

    # TWO-launch decode layer over the page pools (the paged twin of
    # llama.forward's tail-qkv scan): glue-fused paged attention + the
    # wo/FFN/next-qkv megakernel, qkv riding the scan carry.
    from llama2_tpu.ops.pallas.mlp_block import layer_tail_qkv_supported

    use_tail_qkv = (
        cos_il is not None
        and axis_name is None  # the tail megakernel spans both tp psums
        and all(
            isinstance(stacked.get(k), QuantTensor)
            for k in ("wqkv", "wo", "w1", "w3", "w2")
        )
        and layer_tail_qkv_supported(
            stacked["wo"], stacked["w1"], stacked["w3"], stacked["w2"],
            stacked["wqkv"],
        )
    )
    if use_tail_qkv:
        from llama2_tpu.ops.pallas.mlp_block import layer_tail_qkv_stacked
        from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

        H_, KVH_, hs_ = H, KVH, hs_real
        scale = 1.0 / (hs_**0.5)
        qkv0 = quant_matmul_stacked(
            x, stacked["wqkv"], jnp.int32(0),
            rms_w=params["rms_att"][0], eps=config.norm_eps,
        )

        def fused_attention(qkv, pools, idx):
            qkv3 = qkv[:, 0].reshape(B, H_ + 2 * KVH_, hs_)
            if kv_quant:
                from llama2_tpu.ops.pallas.paged_attention import (
                    paged_decode_attention_q8_fused,
                )

                kp, ksp, vp, vsp = pools
                att, kp, ksp, vp, vsp = paged_decode_attention_q8_fused(
                    qkv3, kp, ksp, vp, vsp, table,
                    cos_il, sin_il, page_ids, row_ids, idx, pos,
                    n_heads=H_, scale=scale,
                )
                return att, (kp, ksp, vp, vsp)
            from llama2_tpu.ops.pallas.paged_attention import (
                paged_decode_attention_fused,
            )

            kp, vp = pools
            att, kp, vp = paged_decode_attention_fused(
                qkv3, kp, vp, table, cos_il, sin_il,
                page_ids, row_ids, idx, pos, n_heads=H_, scale=scale,
            )
            return att, (kp, vp)

        def body_tail(carry, idx):
            x, qkv, pools = carry
            att, pools = fused_attention(qkv, pools, idx)
            x, qkv = layer_tail_qkv_stacked(
                att.reshape(B, 1, D), x, stacked["wo"], params["rms_ffn"],
                stacked["w1"], stacked["w3"], stacked["w2"],
                params["rms_att"], stacked["wqkv"], idx, config.norm_eps,
            )
            return (x, qkv, pools), None

        # scan the first L-1 layers; the LAST layer runs unrolled with the
        # no-qkv megakernel (the trailing clamped Wqkv stream is waste)
        from llama2_tpu.ops.pallas.mlp_block import attn_mlp_block_stacked

        idxs = jnp.arange(config.n_layers, dtype=jnp.int32)
        pools = (
            (k_pool, ks_pool, v_pool, vs_pool) if kv_quant
            else (k_pool, v_pool)
        )
        (x, qkv_last, pools), _ = jax.lax.scan(
            body_tail, (x, qkv0, pools), idxs[:-1], unroll=unroll
        )
        last = jnp.int32(config.n_layers - 1)
        att, pools = fused_attention(qkv_last, pools, last)
        x = attn_mlp_block_stacked(
            att.reshape(B, 1, D), x, stacked["wo"],
            params["rms_ffn"][config.n_layers - 1], stacked["w1"],
            stacked["w3"], stacked["w2"], last, config.norm_eps,
        )
        x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
        if kv_quant:
            k_pool, ks_pool, v_pool, vs_pool = pools
            return x, k_pool, ks_pool, v_pool, vs_pool
        k_pool, v_pool = pools
        return x, k_pool, v_pool

    def body(carry, xs):
        # pools ride the CARRY un-sliced (the xs/ys form cost a full pool
        # read + rebuild per decode step — the round-1 paged engine ran at
        # HALF the dense engine's throughput for exactly this reason); the
        # stacked kernel indexes the layer via scalar prefetch and appends
        # the step's rows itself
        if kv_quant:
            x, k_pool, ks_pool, v_pool, vs_pool = carry
        else:
            x, k_pool, v_pool = carry
            ks_pool = vs_pool = None
        idx, sliced = xs
        lp = {**sliced, **stacked}
        li = idx if stacked else None
        fuse_glue = (
            backend == "pallas"
            and li is not None
            and isinstance(lp.get("wqkv"), QuantTensor)
            and lp["wqkv"].q.ndim == 3
        )
        if fuse_glue and cos_il is not None:
            # fully-fused attention block: qkv launch → fused attention
            # launch (RoPE + [quantize +] append + table-chase in-kernel) —
            # see paged_attention.paged_decode_attention[_q8]_fused
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

            qkv = quant_matmul_stacked(
                x, lp["wqkv"], li, rms_w=lp["rms_att"], eps=config.norm_eps
            )  # (B, 1, D + 2*KV) — pre-rope
            qkv3 = qkv[:, 0].reshape(B, H + 2 * KVH, hs_real)
            if kv_quant:
                from llama2_tpu.ops.pallas.paged_attention import (
                    paged_decode_attention_q8_fused,
                )

                att, k_pool, ks_pool, v_pool, vs_pool = (
                    paged_decode_attention_q8_fused(
                        qkv3, k_pool, ks_pool, v_pool, vs_pool, table,
                        cos_il, sin_il, page_ids, row_ids, idx, pos,
                        n_heads=H, scale=1.0 / (hs_real**0.5),
                    )
                )
            else:
                from llama2_tpu.ops.pallas.paged_attention import (
                    paged_decode_attention_fused,
                )

                att, k_pool, v_pool = paged_decode_attention_fused(
                    qkv3, k_pool, v_pool, table, cos_il, sin_il,
                    page_ids, row_ids, idx, pos,
                    n_heads=H, scale=1.0 / (hs_real**0.5),
                )
            att = att.reshape(B, 1, config.dim)
            from llama2_tpu.models.llama import _post_attention

            x = _post_attention(
                x, att, lp, config, precision, backend, li, axis_name, ring
            )
            if kv_quant:
                return (x, k_pool, ks_pool, v_pool, vs_pool), None
            return (x, k_pool, v_pool), None

        if fuse_glue:
            # rmsnorm fused into the qkv launch (see llama._layer_decode_stacked)
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

            kv = KVH * hs_real
            qkv = quant_matmul_stacked(
                x, lp["wqkv"], li, rms_w=lp["rms_att"], eps=config.norm_eps
            )
            q = qkv[..., :D].reshape(B, 1, H, hs_real)
            k = qkv[..., D : D + kv].reshape(B, 1, KVH, hs_real)
            v = qkv[..., D + kv :].reshape(B, 1, KVH, hs_real)
        elif "wqkv" in lp:
            xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
            kv = KVH * hs_real
            qkv = linear(xb, lp["wqkv"], precision, backend, li)
            q = qkv[..., :D].reshape(B, 1, H, hs_real)
            k = qkv[..., D : D + kv].reshape(B, 1, KVH, hs_real)
            v = qkv[..., D + kv :].reshape(B, 1, KVH, hs_real)
        else:
            xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
            q = linear(xb, lp["wq"], precision, backend, li).reshape(B, 1, H, hs_real)
            k = linear(xb, lp["wk"], precision, backend, li).reshape(B, 1, KVH, hs_real)
            v = linear(xb, lp["wv"], precision, backend, li).reshape(B, 1, KVH, hs_real)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        if hs_c != hs_real:
            pad = [(0, 0)] * 3 + [(0, hs_c - hs_real)]
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        k_bh = k.transpose(0, 2, 1, 3)  # (B, KVH, 1, hs)
        v_bh = v.transpose(0, 2, 1, 3)

        scale = 1.0 / (hs_real**0.5)
        if kv_quant:
            from llama2_tpu.ops.pallas.attention_q8 import quantize_kv_rows

            k8_new, k_sc = quantize_kv_rows(k_bh)  # (B,KVH,1,hs), (B,KVH,1)
            v8_new, v_sc = quantize_kv_rows(v_bh)
            if backend.startswith("pallas") and paged_scratch_fits(
                KVH, k_pool.shape[3], hs_c, 1
            ):
                from llama2_tpu.ops.pallas.paged_attention import (
                    paged_decode_attention_q8_stacked,
                )

                att, k_pool, ks_pool, v_pool, vs_pool = (
                    paged_decode_attention_q8_stacked(
                        q, k_pool, ks_pool, v_pool, vs_pool, table,
                        k8_new, k_sc, v8_new, v_sc,
                        page_ids, row_ids, idx, pos, scale=scale,
                    )
                )
                att = att[:, None]
            else:
                from llama2_tpu.ops.pallas.attention_q8 import dequantize_kv
                from llama2_tpu.ops.pallas.paged_attention import (
                    paged_attention_oracle,
                )

                for b in range(B):
                    k_pool = jax.lax.dynamic_update_slice(
                        k_pool, k8_new[b][None, None],
                        (idx, page_ids[b], 0, row_ids[b], 0),
                    )
                    v_pool = jax.lax.dynamic_update_slice(
                        v_pool, v8_new[b][None, None],
                        (idx, page_ids[b], 0, row_ids[b], 0),
                    )
                    ks_pool = jax.lax.dynamic_update_slice(
                        ks_pool, k_sc[b][None, None],
                        (idx, page_ids[b], 0, row_ids[b]),
                    )
                    vs_pool = jax.lax.dynamic_update_slice(
                        vs_pool, v_sc[b][None, None],
                        (idx, page_ids[b], 0, row_ids[b]),
                    )
                att = paged_attention_oracle(
                    q,
                    dequantize_kv(
                        jax.lax.dynamic_index_in_dim(k_pool, idx, 0, False),
                        jax.lax.dynamic_index_in_dim(ks_pool, idx, 0, False),
                    ),
                    dequantize_kv(
                        jax.lax.dynamic_index_in_dim(v_pool, idx, 0, False),
                        jax.lax.dynamic_index_in_dim(vs_pool, idx, 0, False),
                    ),
                    table, pos, scale=scale,
                )
        elif backend.startswith("pallas") and paged_scratch_fits(
            KVH, k_pool.shape[3], hs_c, k_pool.dtype.itemsize
        ):
            from llama2_tpu.ops.pallas.paged_attention import (
                paged_decode_attention_stacked,
            )

            att, k_pool, v_pool = paged_decode_attention_stacked(
                q, k_pool, v_pool, table, k_bh, v_bh,
                page_ids, row_ids, idx, pos, scale=scale,
            )
            att = att[:, None]
        else:
            from llama2_tpu.ops.pallas.paged_attention import (
                paged_attention_oracle,
            )

            for b in range(B):
                k_pool = jax.lax.dynamic_update_slice(
                    k_pool, k_bh[b][None, None],
                    (idx, page_ids[b], 0, row_ids[b], 0),
                )
                v_pool = jax.lax.dynamic_update_slice(
                    v_pool, v_bh[b][None, None],
                    (idx, page_ids[b], 0, row_ids[b], 0),
                )
            att = paged_attention_oracle(
                q,
                jax.lax.dynamic_index_in_dim(k_pool, idx, 0, False),
                jax.lax.dynamic_index_in_dim(v_pool, idx, 0, False),
                table, pos, scale=scale,
            )
        att = att[..., :hs_real].reshape(B, 1, config.dim)
        from llama2_tpu.models.llama import _post_attention

        x = _post_attention(
            x, att, lp, config, precision, backend, li, axis_name, ring
        )
        if kv_quant:
            return (x, k_pool, ks_pool, v_pool, vs_pool), None
        return (x, k_pool, v_pool), None

    idxs = jnp.arange(config.n_layers, dtype=jnp.int32)
    if kv_quant:
        (x, k_pool, ks_pool, v_pool, vs_pool), _ = jax.lax.scan(
            body, (x, k_pool, ks_pool, v_pool, vs_pool),
            (idxs, layer_stack), unroll=unroll,
        )
        x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
        return x, k_pool, ks_pool, v_pool, vs_pool
    (x, k_pool, v_pool), _ = jax.lax.scan(
        body, (x, k_pool, v_pool), (idxs, layer_stack), unroll=unroll
    )
    x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
    return x, k_pool, v_pool


def _write_window_rows(pool, rows, idx, page_ids, row_ids):
    """Scatter a (B, KVH, T, hs) window of rows into layer ``idx`` of the
    (L, P, KVH, page, hs) pool at per-(slot, token) ``(page, row)`` coords
    (each (B, T) int32). A lax.scan of per-row dynamic_update_slices keeps
    the carry in place (a vmapped write would lower to scatter + full-pool
    copy — CLAUDE.md per-row KV write rule)."""
    B, KVH, T, hs = rows.shape
    flat = rows.transpose(0, 2, 1, 3).reshape(B * T, KVH, hs)
    pids, rids = page_ids.reshape(-1), row_ids.reshape(-1)

    def per_row(pool, r):
        row = jax.lax.dynamic_index_in_dim(flat, r, 0, keepdims=False)
        upd = row[None, None, :, None, :]  # (1, 1, KVH, 1, hs)
        return jax.lax.dynamic_update_slice(
            pool, upd.astype(pool.dtype), (idx, pids[r], 0, rids[r], 0)
        ), None

    pool, _ = jax.lax.scan(per_row, pool, jnp.arange(B * T))
    return pool


def _write_window_scales(spool, scales, idx, page_ids, row_ids):
    """Scale twin of :func:`_write_window_rows`: (B, KVH, T) per-row scales
    into the (L, P, KVH, page) pool."""
    B, KVH, T = scales.shape
    flat = scales.transpose(0, 2, 1).reshape(B * T, KVH)
    pids, rids = page_ids.reshape(-1), row_ids.reshape(-1)

    def per_row(spool, r):
        s = jax.lax.dynamic_index_in_dim(flat, r, 0, keepdims=False)
        upd = s[None, None, :, None]  # (1, 1, KVH, 1)
        return jax.lax.dynamic_update_slice(
            spool, upd.astype(spool.dtype), (idx, pids[r], 0, rids[r])
        ), None

    spool, _ = jax.lax.scan(per_row, spool, jnp.arange(B * T))
    return spool


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend", "unroll", "axis_name",
                     "ring"),
    donate_argnames=("k_pool", "v_pool", "ks_pool", "vs_pool"),
    inline=True,
)
def paged_forward_window(
    params: dict,
    k_pool: jax.Array,
    v_pool: jax.Array,
    table: jax.Array,  # (B, max_pages) int32
    seg: jax.Array,  # (B, T) int32 — teacher-forced window tokens
    pos: jax.Array,  # (B,) int32 position of seg[:, 0]
    config: ModelConfig,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
    unroll: int = 1,
    ks_pool: jax.Array | None = None,
    vs_pool: jax.Array | None = None,
    axis_name: str | None = None,  # tensor-parallel axis inside shard_map
    ring: bool = False,  # explicit overlapped ring for the wo/w2 reduces
):
    """A (B, T) teacher-forced decode window over the page pools — the paged
    counterpart of the dense spec window (``batch_engine._tick_spec``'s
    forward): every slot runs T tokens at positions ``pos..pos+T-1``,
    appending each row through its page table.

    Write coordinates are computed ON DEVICE from ``table`` (the window's
    position advance is data-dependent under speculation, so the host cannot
    precompute them like the plain paged tick does); positions past
    ``seq_len`` route to the scratch page (page 0) — the paged analog of the
    dense spec cache's overshoot pad rows. Projections keep the quant/pallas
    matmul path (the weight stream the window amortizes); attention runs the
    XLA paged oracle with intra-window causality (the pallas paged kernels
    are single-query appenders).

    Returns ``(hidden (B, T, D), pools...)`` with the same pool arity as
    :func:`paged_forward_step`.
    """
    B, T = seg.shape
    H, KVH, hs_real = config.n_heads, config.n_kv_heads, config.head_size
    hs_c = k_pool.shape[-1]
    ps = k_pool.shape[3]
    S = config.seq_len
    D = config.dim
    kv_quant = ks_pool is not None

    from llama2_tpu.quant.q8 import QuantTensor

    x = jnp.take(params["tok_emb"], seg, axis=0)  # (B, T, D)
    x = x.astype(params.get("wq", params.get("wqkv")).dtype)
    positions = pos[:, None] + jnp.arange(T)[None, :]  # (B, T)
    cos, sin = ops.rope_angles(positions, hs_real)

    # per-(slot, token) write coords through the table; invalid (>= seq_len)
    # positions go to the scratch page, never corrupting committed rows
    valid = positions < S
    pidx = jnp.clip(positions // ps, 0, table.shape[1] - 1)
    page_ids = jnp.where(valid, jnp.take_along_axis(table, pidx, axis=1), 0)
    row_ids = jnp.where(valid, positions % ps, 0).astype(jnp.int32)
    page_ids = page_ids.astype(jnp.int32)

    keys = layer_keys(params)
    stacked = {
        k: params[k] for k in keys if isinstance(params[k], QuantTensor)
    }
    layer_stack = {k: params[k] for k in keys if k not in stacked}

    from llama2_tpu.ops.pallas.attention_q8 import dequantize_kv, quantize_kv_rows
    from llama2_tpu.ops.pallas.paged_attention import paged_attention_oracle

    def body(carry, xs):
        if kv_quant:
            x, k_pool, ks_pool, v_pool, vs_pool = carry
        else:
            x, k_pool, v_pool = carry
            ks_pool = vs_pool = None
        idx, sliced = xs
        lp = {**sliced, **stacked}
        li = idx if stacked else None
        fuse_glue = (
            backend.startswith("pallas")
            and li is not None
            and isinstance(lp.get("wqkv"), QuantTensor)
            and lp["wqkv"].q.ndim == 3
        )
        kv = KVH * hs_real
        if fuse_glue:
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

            qkv = quant_matmul_stacked(
                x, lp["wqkv"], li, rms_w=lp["rms_att"], eps=config.norm_eps
            )
            q = qkv[..., :D].reshape(B, T, H, hs_real)
            k = qkv[..., D : D + kv].reshape(B, T, KVH, hs_real)
            v = qkv[..., D + kv :].reshape(B, T, KVH, hs_real)
        elif "wqkv" in lp:
            xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
            qkv = linear(xb, lp["wqkv"], precision, backend, li)
            q = qkv[..., :D].reshape(B, T, H, hs_real)
            k = qkv[..., D : D + kv].reshape(B, T, KVH, hs_real)
            v = qkv[..., D + kv :].reshape(B, T, KVH, hs_real)
        else:
            xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
            q = linear(xb, lp["wq"], precision, backend, li).reshape(B, T, H, hs_real)
            k = linear(xb, lp["wk"], precision, backend, li).reshape(B, T, KVH, hs_real)
            v = linear(xb, lp["wv"], precision, backend, li).reshape(B, T, KVH, hs_real)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        if hs_c != hs_real:
            pad = [(0, 0)] * 3 + [(0, hs_c - hs_real)]
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        k_bh = k.transpose(0, 2, 1, 3)  # (B, KVH, T, hs)
        v_bh = v.transpose(0, 2, 1, 3)

        scale = 1.0 / (hs_real**0.5)
        if kv_quant:
            k8, k_sc = quantize_kv_rows(k_bh)  # (B,KVH,T,hs), (B,KVH,T)
            v8, v_sc = quantize_kv_rows(v_bh)
            k_pool = _write_window_rows(k_pool, k8, idx, page_ids, row_ids)
            v_pool = _write_window_rows(v_pool, v8, idx, page_ids, row_ids)
            ks_pool = _write_window_scales(ks_pool, k_sc, idx, page_ids, row_ids)
            vs_pool = _write_window_scales(vs_pool, v_sc, idx, page_ids, row_ids)
            att = paged_attention_oracle(
                q,
                dequantize_kv(
                    jax.lax.dynamic_index_in_dim(k_pool, idx, 0, False),
                    jax.lax.dynamic_index_in_dim(ks_pool, idx, 0, False),
                ),
                dequantize_kv(
                    jax.lax.dynamic_index_in_dim(v_pool, idx, 0, False),
                    jax.lax.dynamic_index_in_dim(vs_pool, idx, 0, False),
                ),
                table, pos, scale=scale,
            )
        else:
            k_pool = _write_window_rows(k_pool, k_bh, idx, page_ids, row_ids)
            v_pool = _write_window_rows(v_pool, v_bh, idx, page_ids, row_ids)
            att = paged_attention_oracle(
                q,
                jax.lax.dynamic_index_in_dim(k_pool, idx, 0, False),
                jax.lax.dynamic_index_in_dim(v_pool, idx, 0, False),
                table, pos, scale=scale,
            )
        att = att[..., :hs_real].reshape(B, T, config.dim)
        from llama2_tpu.models.llama import _post_attention

        x = _post_attention(
            x, att, lp, config, precision, backend, li, axis_name, ring
        )
        if kv_quant:
            return (x, k_pool, ks_pool, v_pool, vs_pool), None
        return (x, k_pool, v_pool), None

    idxs = jnp.arange(config.n_layers, dtype=jnp.int32)
    if kv_quant:
        (x, k_pool, ks_pool, v_pool, vs_pool), _ = jax.lax.scan(
            body, (x, k_pool, ks_pool, v_pool, vs_pool),
            (idxs, layer_stack), unroll=unroll,
        )
        x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
        return x, k_pool, ks_pool, v_pool, vs_pool
    (x, k_pool, v_pool), _ = jax.lax.scan(
        body, (x, k_pool, v_pool), (idxs, layer_stack), unroll=unroll
    )
    x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
    return x, k_pool, v_pool
