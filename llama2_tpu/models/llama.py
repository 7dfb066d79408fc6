"""The Llama-2 decoder as pure functions over a param pytree.

TPU-first redesign of the reference's mutating single-token ``transformer()``
(main.zig:285-430): the layer loop is a ``lax.scan`` over layer-stacked
weights (one compiled layer body), state (the KV cache) is threaded
functionally, and a whole segment of T tokens is processed per call so prefill
runs as batched matmuls on the MXU. ``T=1`` is the decode step. Causal
masking makes segment processing produce bit-the-same math as the reference's
token-at-a-time loop up to reduction order.

Cache layout: ``(n_layers, B, n_kv_heads, S, head_size)`` for K and V — each
(batch, kv-head) owns a contiguous ``(S, head_size)`` plane, so the flash
decode kernel DMAs sequence blocks without crossing lane tiling (Mosaic
requires last-dim slices to be whole or 128-aligned), and kv-heads are the
tensor-parallel shard axis (SURVEY.md section 5, long-context row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from llama2_tpu.config import ModelConfig
from llama2_tpu.ops import xla as ops
from llama2_tpu.ops.linear import linear


def init_cache(
    config: ModelConfig,
    batch: int = 1,
    dtype=jnp.float32,
    lane_pad: bool = False,
    kv_quant: bool = False,
) -> dict[str, jax.Array]:
    """Allocate the functional KV cache at full seq_len (main.zig:151-152).

    ``lane_pad`` zero-pads the head dim up to a multiple of 128 lanes — the
    flash decode kernel's DMA requirement. Zero pad lanes change no scores or
    outputs (q·k adds zeros; V pad columns produce zeros that are sliced off).

    ``kv_quant`` stores K/V as int8 with per-(position, head) f32 scales —
    4x less decode-attention HBM traffic and 4x more context per byte (see
    ops/pallas/attention_q8.py). Keys gain ``k_scale``/``v_scale``.
    """
    hs = config.head_size
    if lane_pad:
        hs = ((hs + 127) // 128) * 128
    shape = (config.n_layers, batch, config.n_kv_heads, config.seq_len, hs)
    if kv_quant:
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v": jnp.zeros(shape, jnp.int8),
            "v_scale": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _layer(
    x: jax.Array,
    layer_params: dict,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    config: ModelConfig,
    precision,
    backend: str,
    layer_idx=None,
    ks_cache: jax.Array | None = None,
    vs_cache: jax.Array | None = None,
    axis_name: str | None = None,
    ring: bool = False,
):
    """One decoder layer over a (B, T, D) segment starting at ``pos``.

    ``layer_idx``: set when quantized weights arrive layer-STACKED (the scan
    passes the whole stack + index so the pallas kernel reads tiles in place
    — see ops/linear.py).

    ``axis_name``: set when running INSIDE shard_map over a tensor-parallel
    mesh axis — weights arrive as LOCAL shards (wq/wk/wv/w1/w3 out-sharded,
    wo/w2 in-sharded), the config describes LOCAL head counts, and the
    row-parallel wo/w2 outputs are partial sums this layer reduces with
    ``psum`` (or the explicit overlapped ring when ``ring=True``) before
    adding the residual. x is replicated on the axis. The Megatron pairing
    from parallel/sharding.py made explicit per shard.
    """
    B, T, D = x.shape
    H, KVH, hs = config.n_heads, config.n_kv_heads, config.head_size

    # attention block
    xb = ops.rmsnorm(x, layer_params["rms_att"], config.norm_eps)
    if "wqkv" in layer_params:
        # fused QKV (the reference's matmul_fused(3, ...) analog,
        # main.zig:308-320): one kernel launch, one read of xb. Split by
        # H*hs, not D: under tp the shard's H is local while D stays global
        kv = KVH * hs
        qd = H * hs
        qkv = linear(xb, layer_params["wqkv"], precision, backend, layer_idx)
        q = qkv[..., :qd].reshape(B, T, H, hs)
        k = qkv[..., qd : qd + kv].reshape(B, T, KVH, hs)
        v = qkv[..., qd + kv :].reshape(B, T, KVH, hs)
    else:
        q = linear(xb, layer_params["wq"], precision, backend, layer_idx).reshape(B, T, H, hs)
        k = linear(xb, layer_params["wk"], precision, backend, layer_idx).reshape(B, T, KVH, hs)
        v = linear(xb, layer_params["wv"], precision, backend, layer_idx).reshape(B, T, KVH, hs)

    q = ops.apply_rope(q, cos, sin)
    k = ops.apply_rope(k, cos, sin)

    # lane-padded cache (flash kernel): widen q/k/v head dim with zeros
    hs_c = k_cache.shape[-1]
    if hs_c != hs:
        pad = [(0, 0)] * 3 + [(0, hs_c - hs)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    # cache planes are (B, KVH, S, hs); new keys arrive as (B, T, KVH, hs)
    k_bh = k.transpose(0, 2, 1, 3)
    v_bh = v.transpose(0, 2, 1, 3)
    kv_quant = ks_cache is not None

    if kv_quant:
        from llama2_tpu.ops.pallas.attention_q8 import quantize_kv_rows

        k_bh, k_sc = quantize_kv_rows(k_bh)  # (B, KVH, T, hs), (B, KVH, T)
        v_bh, v_sc = quantize_kv_rows(v_bh)

    if pos.ndim == 0:
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_bh, (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_bh, (0, 0, pos, 0))
        if kv_quant:
            ks_cache = jax.lax.dynamic_update_slice(ks_cache, k_sc, (0, 0, pos))
            vs_cache = jax.lax.dynamic_update_slice(vs_cache, v_sc, (0, 0, pos))
    else:
        # per-row positions (continuous batching: each slot at its own pos).
        # Unrolled per-slot dynamic_update_slice, NOT a vmapped one: vmap
        # lowers this update to scatter (+ a full-cache copy when the buffer
        # can't be aliased) — measured ~7 ms/step of pure overhead on a
        # 16-layer model at batch 8 (benchmarks/engine_profile.py); the
        # unrolled form stays B in-place row writes.
        for b in range(k_bh.shape[0]):
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_bh[b : b + 1], (b, 0, pos[b], 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_bh[b : b + 1], (b, 0, pos[b], 0)
            )
            if kv_quant:
                ks_cache = jax.lax.dynamic_update_slice(
                    ks_cache, k_sc[b : b + 1], (b, 0, pos[b])
                )
                vs_cache = jax.lax.dynamic_update_slice(
                    vs_cache, v_sc[b : b + 1], (b, 0, pos[b])
                )

    scale = 1.0 / (hs**0.5)  # real head size, not the lane-padded one
    if kv_quant:
        from llama2_tpu.ops.pallas.common import interpret_default

        # T <= 16: decode steps and speculative verify windows; longer
        # segments (prefill) take the dequant fallback — a one-off cost,
        # and the kernel's (T*G, hs) query block must stay VMEM-sized.
        # Compiled mode additionally needs S % 128 (lane-whole scale DMA).
        S_c = k_cache.shape[2]
        if backend.startswith("pallas") and hs_c % 128 == 0 and T <= 16 and (
            pos.ndim == 0 or T == 1
        ) and (S_c % 128 == 0 or interpret_default()):
            from llama2_tpu.ops.pallas.attention_q8 import (
                flash_decode_attention_q8,
            )

            # the kernel takes the LAST query row's position; a T>1 call is
            # a speculative verify window at positions pos..pos+T-1
            att = flash_decode_attention_q8(
                q, k_cache, ks_cache, v_cache, vs_cache,
                pos + (T - 1) if pos.ndim == 0 else pos,
                scale=scale,
            )
        else:
            # oracle/fallback: dequantize and reuse the fp paths
            from llama2_tpu.ops.pallas.attention_q8 import dequantize_kv

            att = ops.attention(
                q,
                dequantize_kv(k_cache, ks_cache),
                dequantize_kv(v_cache, vs_cache),
                pos,
                precision=precision,
                scale=scale,
            )
    elif backend.startswith("pallas") and hs_c % 128 == 0 and pos.ndim == 0 and T > 1:
        from llama2_tpu.ops.pallas.prefill_attention import flash_prefill_attention

        att = flash_prefill_attention(q, k_cache, v_cache, pos, scale=scale)
    elif backend.startswith("pallas") and T == 1 and hs_c % 128 == 0:
        from llama2_tpu.ops.pallas.attention import flash_decode_attention

        att = flash_decode_attention(q, k_cache, v_cache, pos, scale=scale)
    else:
        att = ops.attention(q, k_cache, v_cache, pos, precision=precision, scale=scale)
    # local head count: under tp the shard's heads are a contiguous slice of
    # the feature dim, matching wo's in-shard rows
    att = att[..., :hs].reshape(B, T, H * hs)
    x = x + _row_parallel(
        att, layer_params["wo"], precision, backend, layer_idx, axis_name, ring
    )

    # FFN block
    xb = ops.rmsnorm(x, layer_params["rms_ffn"], config.norm_eps)
    if "w13" in layer_params:
        # fused gate+up (matmul_fused(2, {w1,w3}) analog, main.zig:405-408)
        HD = layer_params["w13"].shape[-1] // 2
        h13 = linear(xb, layer_params["w13"], precision, backend, layer_idx)
        h1, h3 = h13[..., :HD], h13[..., HD:]
    else:
        h1 = linear(xb, layer_params["w1"], precision, backend, layer_idx)
        h3 = linear(xb, layer_params["w3"], precision, backend, layer_idx)
    x = x + _row_parallel(
        ops.swiglu(h1, h3), layer_params["w2"], precision, backend, layer_idx,
        axis_name, ring,
    )
    return x, k_cache, v_cache, ks_cache, vs_cache


def _row_parallel(
    y: jax.Array, w, precision, backend: str, layer_idx, axis_name, ring: bool
):
    """Row-parallel projection: ``y_local @ w_local`` summed across the model
    axis. ``axis_name=None`` is the single-shard identity (plain linear).

    ``ring=True`` replaces the GSPMD-scheduled ``psum`` with the explicit
    overlapped collective matmul (parallel/collective_matmul.py): the dot is
    issued column-chunk by column-chunk interleaved with ring ppermutes, so
    every ICI hop has a co-scheduled MXU dot (SURVEY.md §7 hard part (e)).
    The ring form uses XLA dots (dequantizing QuantTensor shards); the fused
    pallas wo/w2 kernels pair with the psum form.
    """
    if axis_name is None:
        return linear(y, w, precision, backend, layer_idx)
    if ring:
        from llama2_tpu.parallel.collective_matmul import ring_linear_local

        return ring_linear_local(y, w, axis_name, layer_idx, precision)
    return jax.lax.psum(linear(y, w, precision, backend, layer_idx), axis_name)


def _layer_decode_stacked(
    x: jax.Array,  # (B, 1, D)
    layer_params: dict,
    caches: tuple,  # stacked (L, ...) cache arrays, carried whole
    layer_idx,
    pos,  # (B,) int32
    cos,
    sin,
    config: ModelConfig,
    precision,
    backend: str,
    quant_idx,  # layer index for stacked QuantTensors (or None)
    cos_il=None,  # (B, hs) pair-duplicated step rope tables — enables the
    sin_il=None,  # glue-fused attention kernel (rope+quant+append in-kernel)
    axis_name: str | None = None,  # tensor-parallel axis inside shard_map
    ring: bool = False,  # explicit overlapped ring for the wo/w2 reduces
):
    """One decoder layer of the T=1 decode step over LAYER-STACKED caches.

    The decode-path counterpart of :func:`_layer`: the KV cache never enters
    the layer scan as xs/ys. Scan-slicing the cache costs a full cache
    read + rebuild per step, and pallas kernels additionally force
    materialized copies of sliced operands — measured as ~95% of the batched
    tick at 0.35B scale (benchmarks/engine_profile.py). Here the caches ride
    the scan CARRY un-sliced: new rows are appended in place (inside the
    flash kernel on pallas; per-slot dynamic_update_slice on XLA) and the
    kernels index the layer themselves via scalar prefetch, exactly like
    ``quant_matmul_stacked`` does for weights.
    """
    B, T, D = x.shape
    H, KVH, hs = config.n_heads, config.n_kv_heads, config.head_size
    kv_quant = len(caches) == 4
    if kv_quant:
        k_cache, ks_cache, v_cache, vs_cache = caches
    else:
        k_cache, v_cache = caches

    from llama2_tpu.quant.q8 import QuantTensor

    fuse_glue = (
        backend == "pallas"
        and quant_idx is not None
        and isinstance(layer_params.get("wqkv"), QuantTensor)
        and layer_params["wqkv"].q.ndim == 3
    )

    # Fully-fused attention block: qkv launch → attention launch, with RoPE,
    # K/V quantization, and the cache append all inside the attention kernel
    # (ops/pallas/attention_q8.py::flash_decode_attention_q8_fused). The
    # decode step is launch-bound at 7B scale; this removes every XLA op
    # between the two launches.
    from llama2_tpu.ops.pallas.common import interpret_default

    if (
        fuse_glue
        and cos_il is not None
        and (hs % 128 == 0 or interpret_default())
        and k_cache.shape[-1] == hs
        and (k_cache.shape[3] % 128 == 0 or not kv_quant)
    ):
        from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

        qkv = quant_matmul_stacked(
            x, layer_params["wqkv"], quant_idx,
            rms_w=layer_params["rms_att"], eps=config.norm_eps,
        )  # (B, 1, (H + 2*KVH) * hs) — pre-rope, local heads under tp
        pvec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
        qkv3 = qkv[:, 0].reshape(B, H + 2 * KVH, hs)
        if kv_quant:
            from llama2_tpu.ops.pallas.attention_q8 import (
                flash_decode_attention_q8_fused,
            )

            att, k_cache, ks_cache, v_cache, vs_cache = (
                flash_decode_attention_q8_fused(
                    qkv3, k_cache, ks_cache, v_cache, vs_cache,
                    cos_il, sin_il, layer_idx, pvec,
                    n_heads=H, scale=1.0 / (hs**0.5),
                )
            )
        else:
            from llama2_tpu.ops.pallas.attention import (
                flash_decode_attention_fused,
            )

            att, k_cache, v_cache = flash_decode_attention_fused(
                qkv3, k_cache, v_cache, cos_il, sin_il, layer_idx, pvec,
                n_heads=H, scale=1.0 / (hs**0.5),
            )
        att = att.reshape(B, T, H * hs)
        x = _post_attention(
            x, att, layer_params, config, precision, backend, quant_idx,
            axis_name, ring,
        )
        if kv_quant:
            return x, (k_cache, ks_cache, v_cache, vs_cache)
        return x, (k_cache, v_cache)

    qd = H * hs  # query width: local under tp (D stays global)
    if fuse_glue:
        # rmsnorm fused into the qkv launch (quant_matmul prologue) — the
        # decode step is launch-bound, every XLA dispatch between pallas
        # calls is unhidden time
        from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

        kv = KVH * hs
        qkv = quant_matmul_stacked(
            x, layer_params["wqkv"], quant_idx,
            rms_w=layer_params["rms_att"], eps=config.norm_eps,
        )
        q = qkv[..., :qd].reshape(B, T, H, hs)
        k = qkv[..., qd : qd + kv].reshape(B, T, KVH, hs)
        v = qkv[..., qd + kv :].reshape(B, T, KVH, hs)
    else:
        xb = ops.rmsnorm(x, layer_params["rms_att"], config.norm_eps)
        if "wqkv" in layer_params:
            kv = KVH * hs
            qkv = linear(xb, layer_params["wqkv"], precision, backend, quant_idx)
            q = qkv[..., :qd].reshape(B, T, H, hs)
            k = qkv[..., qd : qd + kv].reshape(B, T, KVH, hs)
            v = qkv[..., qd + kv :].reshape(B, T, KVH, hs)
        else:
            q = linear(xb, layer_params["wq"], precision, backend, quant_idx).reshape(B, T, H, hs)
            k = linear(xb, layer_params["wk"], precision, backend, quant_idx).reshape(B, T, KVH, hs)
            v = linear(xb, layer_params["wv"], precision, backend, quant_idx).reshape(B, T, KVH, hs)

    q = ops.apply_rope(q, cos, sin)
    k = ops.apply_rope(k, cos, sin)

    hs_c = k_cache.shape[-1]
    if hs_c != hs:
        pad = [(0, 0)] * 3 + [(0, hs_c - hs)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    k_bh = k.transpose(0, 2, 1, 3)  # (B, KVH, 1, hs)
    v_bh = v.transpose(0, 2, 1, 3)
    pvec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    scale = 1.0 / (hs**0.5)
    use_pallas = (
        backend.startswith("pallas")
        and hs_c % 128 == 0
        and (k_cache.shape[3] % 128 == 0 or not kv_quant)
    )

    if kv_quant:
        from llama2_tpu.ops.pallas.attention_q8 import quantize_kv_rows

        k8_new, k_sc = quantize_kv_rows(k_bh)  # (B, KVH, 1, hs), (B, KVH, 1)
        v8_new, v_sc = quantize_kv_rows(v_bh)
        if use_pallas:
            from llama2_tpu.ops.pallas.attention_q8 import (
                flash_decode_attention_q8_stacked,
            )

            # rows AND scales append inside the kernel via aligned RMW
            # windows — the per-slot dynamic_update_slice alternative costs
            # ~160 us PER LAYER of op dispatch at 7B serving shapes
            att, k_cache, ks_cache, v_cache, vs_cache = (
                flash_decode_attention_q8_stacked(
                    q, k_cache, ks_cache, v_cache, vs_cache,
                    k8_new, k_sc, v8_new, v_sc,
                    layer_idx, pvec, scale=scale,
                )
            )
            att = att[:, None]
        else:
            # XLA fallback: per-slot in-place row + scale writes on the carry
            for b in range(B):
                ks_cache = jax.lax.dynamic_update_slice(
                    ks_cache, k_sc[b][None, None], (layer_idx, b, 0, pvec[b])
                )
                vs_cache = jax.lax.dynamic_update_slice(
                    vs_cache, v_sc[b][None, None], (layer_idx, b, 0, pvec[b])
                )
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k8_new[b : b + 1][None],
                    (layer_idx, b, 0, pvec[b], 0),
                )
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v8_new[b : b + 1][None],
                    (layer_idx, b, 0, pvec[b], 0),
                )
            from llama2_tpu.ops.pallas.attention_q8 import dequantize_kv

            kd = dequantize_kv(
                jax.lax.dynamic_index_in_dim(k_cache, layer_idx, 0, False),
                jax.lax.dynamic_index_in_dim(ks_cache, layer_idx, 0, False),
            )
            vd = dequantize_kv(
                jax.lax.dynamic_index_in_dim(v_cache, layer_idx, 0, False),
                jax.lax.dynamic_index_in_dim(vs_cache, layer_idx, 0, False),
            )
            att = ops.attention(q, kd, vd, pos, precision=precision, scale=scale)
    elif use_pallas:
        from llama2_tpu.ops.pallas.attention import flash_decode_attention_stacked

        att, k_cache, v_cache = flash_decode_attention_stacked(
            q, k_cache, v_cache, k_bh, v_bh, layer_idx, pvec, scale=scale
        )
        att = att[:, None]
    else:
        for b in range(B):
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_bh[b : b + 1][None], (layer_idx, b, 0, pvec[b], 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_bh[b : b + 1][None], (layer_idx, b, 0, pvec[b], 0)
            )
        att = ops.attention(
            q,
            jax.lax.dynamic_index_in_dim(k_cache, layer_idx, 0, False),
            jax.lax.dynamic_index_in_dim(v_cache, layer_idx, 0, False),
            pos,
            precision=precision,
            scale=scale,
        )

    att = att[..., :hs].reshape(B, T, H * hs)
    x = _post_attention(
        x, att, layer_params, config, precision, backend, quant_idx,
        axis_name, ring,
    )
    if kv_quant:
        return x, (k_cache, ks_cache, v_cache, vs_cache)
    return x, (k_cache, v_cache)


def _post_attention(
    x, att, layer_params, config: ModelConfig, precision, backend: str,
    quant_idx, axis_name: str | None = None, ring: bool = False,
):
    """Shared post-attention epilogue of a decode layer: wo projection +
    FFN block, preferring the launch-minimal kernels in order — the
    wo+FFN megakernel (one launch), then fused-residual wo + the FFN
    megakernel (two), then the composed wo / rmsnorm / w13 / swiglu / w2
    path (the XLA and fp-weight fallback).

    ``axis_name``: tensor-parallel mode (inside shard_map). The wo and w2
    outputs are partial sums over the model axis; each is reduced (psum, or
    the overlapped ring when ``ring=True``) BEFORE its residual add, so the
    residual-fusing single-launch forms (attn_mlp megakernel, fused-residual
    wo, in-kernel FFN residual) split into reduce-then-add pairs: per layer
    the tp pallas decode runs qkv + attention + wo + FFN-megakernel launches
    with two psums riding ICI between them."""
    from llama2_tpu.quant.q8 import QuantTensor

    wo = layer_params["wo"]
    wo_stacked = (
        backend == "pallas"
        and quant_idx is not None
        and isinstance(wo, QuantTensor)
        and wo.q.ndim == 3
    )
    if quant_idx is not None and not ring and use_mlp_block(layer_params, backend):
        from llama2_tpu.ops.pallas.mlp_block import (
            attn_mlp_block_stacked,
            attn_mlp_block_supported,
            mlp_block_stacked,
        )

        if axis_name is None and attn_mlp_block_supported(
            wo, layer_params["w1"], layer_params["w3"], layer_params["w2"]
        ):
            # wo + FFN in ONE launch (the whole post-attention half of the
            # layer): r = x + att@wo, out = r + swiglu(rmsnorm(r)@w1,@w3)@w2
            return attn_mlp_block_stacked(
                att, x, wo, layer_params["rms_ffn"], layer_params["w1"],
                layer_params["w3"], layer_params["w2"], quant_idx,
                config.norm_eps,
            )
        if wo_stacked and axis_name is None:
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

            x = quant_matmul_stacked(att, wo, quant_idx, residual=x)
        elif wo_stacked:
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

            x = x + jax.lax.psum(
                quant_matmul_stacked(att, wo, quant_idx), axis_name
            )
        else:
            x = x + _row_parallel(
                att, wo, precision, backend, quant_idx, axis_name, ring
            )
        # whole FFN block in one launch: rmsnorm + w1/w3 + swiglu + w2 +
        # residual fused (ops/pallas/mlp_block.py) — activations stay in
        # VMEM, weights stream once, 2 launches + 3 XLA ops become 1 launch
        ffn = mlp_block_stacked(
            x, layer_params["rms_ffn"], layer_params["w1"],
            layer_params["w3"], layer_params["w2"], quant_idx,
            config.norm_eps, residual=axis_name is None,
        )
        if axis_name is None:
            return ffn
        return x + jax.lax.psum(ffn, axis_name)
    if wo_stacked and axis_name is None and not ring:
        # residual add fused into the wo launch (quant_matmul epilogue)
        from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

        x = quant_matmul_stacked(att, wo, quant_idx, residual=x)
    elif wo_stacked and not ring:
        from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

        x = x + jax.lax.psum(
            quant_matmul_stacked(att, wo, quant_idx), axis_name
        )
    else:
        x = x + _row_parallel(
            att, wo, precision, backend, quant_idx, axis_name, ring
        )
    xb = ops.rmsnorm(x, layer_params["rms_ffn"], config.norm_eps)
    if "w13" in layer_params:
        HD = layer_params["w13"].shape[-1] // 2
        h13 = linear(xb, layer_params["w13"], precision, backend, quant_idx)
        h1, h3 = h13[..., :HD], h13[..., HD:]
    else:
        h1 = linear(xb, layer_params["w1"], precision, backend, quant_idx)
        h3 = linear(xb, layer_params["w3"], precision, backend, quant_idx)
    return x + _row_parallel(
        ops.swiglu(h1, h3), layer_params["w2"], precision, backend, quant_idx,
        axis_name, ring,
    )


_LAYER_KEYS = ("rms_att", "wq", "wk", "wv", "wo", "rms_ffn", "w1", "w2", "w3")
_LAYER_KEYS_FUSED = ("rms_att", "wqkv", "wo", "rms_ffn", "w13", "w2")


def layer_keys(params: dict) -> tuple[str, ...]:
    """The per-layer param keys actually present (QKV and W1/W3 may each be
    fused or separate — see :func:`fuse_layer_params`)."""
    keys = ["rms_att"]
    keys += ["wqkv"] if "wqkv" in params else ["wq", "wk", "wv"]
    keys += ["wo", "rms_ffn"]
    keys += ["w13"] if "w13" in params else ["w1", "w3"]
    keys += ["w2"]
    return tuple(keys)


def use_mlp_block(params: dict, backend: str) -> bool:
    """True when the decode FFN should run as the single fused megakernel
    (ops/pallas/mlp_block.py) instead of w13-launch + swiglu + w2-launch.
    Requires separate layer-stacked quantized w1/w3 (the concatenated w13
    layout has no block-aligned w3 offset) and the fast pallas backend."""
    from llama2_tpu.ops.pallas.mlp_block import mlp_block_supported
    from llama2_tpu.quant.q8 import QuantTensor

    return (
        backend == "pallas"
        and "w13" not in params
        and isinstance(params.get("w1"), QuantTensor)
        and mlp_block_supported(params["w1"], params["w3"], params["w2"])
    )


def fuse_layer_params(
    params: dict, backend: str = "pallas", shards: int = 1
) -> dict:
    """Concatenate QKV (and, when the fused-MLP megakernel won't take over,
    W1/W3) along out-features: wqkv (L, D, D+2*KV), w13 (L, D, 2*HD).

    The kernel-launch analog of the reference's ``matmul_fused`` (one read of
    x across co-located matvecs, main.zig:530-605): at decode each
    pallas/matmul invocation has a fixed launch cost, so 7 weight-applying
    calls per layer become 4. Works for fp arrays and QuantTensors (same K
    and group size by construction). Done once at engine init — the param
    tree on disk / in sharding specs keeps the 9-key layout.

    ``shards > 1`` builds the SHARD-BLOCKED wqkv layout for tensor
    parallelism: out-features are ordered ``[q_0|k_0|v_0|q_1|k_1|v_1|...]``
    where block ``s`` holds shard ``s``'s heads. Splitting the out axis into
    ``shards`` equal chunks (the model-axis PartitionSpec) then hands every
    device a contiguous, self-contained ``[q|k|v]`` block with ``H/shards``
    query heads — exactly the single-chip fused layout at 1/shards scale, so
    the fused pallas kernels run unchanged inside shard_map. Requires
    ``shards`` to divide n_heads and n_kv_heads (the tensor-parallel support
    predicate checks this).

    W1/W3 stay SEPARATE when :func:`use_mlp_block` will engage: the FFN then
    runs as one pallas launch fusing rmsnorm + w1/w3 + swiglu + w2 +
    residual, which needs block-aligned per-matrix streams.
    """
    import jax.numpy as _jnp

    from llama2_tpu.quant.q8 import QuantTensor

    def shard_chunks(w, s):
        """Split out-features (last axis) into ``shards`` equal chunks."""
        n = w.q.shape[-1] if isinstance(w, QuantTensor) else w.shape[-1]
        assert n % shards == 0
        c = n // shards
        if isinstance(w, QuantTensor):
            return QuantTensor(
                q=jax.lax.slice_in_dim(w.q, s * c, (s + 1) * c, axis=-1),
                scale=jax.lax.slice_in_dim(
                    w.scale, s * c, (s + 1) * c, axis=-1
                ),
                group_size=w.group_size,
            )
        return jax.lax.slice_in_dim(w, s * c, (s + 1) * c, axis=-1)

    def cat(*ws):
        if isinstance(ws[0], QuantTensor):
            assert len({w.group_size for w in ws}) == 1
            return QuantTensor(
                q=_jnp.concatenate([w.q for w in ws], axis=-1),
                scale=_jnp.concatenate([w.scale for w in ws], axis=-1),
                group_size=ws[0].group_size,
            )
        return _jnp.concatenate(ws, axis=-1)

    out = {k: v for k, v in params.items()
           if k not in ("wq", "wk", "wv", "w1", "w3")}
    if shards > 1:
        blocks = []
        for s in range(shards):
            blocks += [
                shard_chunks(params["wq"], s),
                shard_chunks(params["wk"], s),
                shard_chunks(params["wv"], s),
            ]
        out["wqkv"] = cat(*blocks)
    else:
        out["wqkv"] = cat(params["wq"], params["wk"], params["wv"])
    if use_mlp_block(params, backend) or shards > 1:
        # under tp the FFN always runs separate w1/w3 (either the local
        # megakernel or per-matrix launches) — a blocked w13 would buy nothing
        out["w1"], out["w3"] = params["w1"], params["w3"]
    else:
        out["w13"] = cat(params["w1"], params["w3"])
    return out


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend", "unroll", "mesh",
                     "collective"),
    inline=True,
)
def forward(
    params: dict,
    cache: dict,
    tokens: jax.Array,
    pos,
    config: ModelConfig,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
    unroll: int = 1,
    mesh=None,
    collective: str | None = None,
) -> tuple[jax.Array, dict]:
    """Run T tokens at positions ``pos..pos+T-1`` through all layers.

    tokens: (B, T) int32. Returns ``(hidden, new_cache)`` with hidden
    (B, T, D) already final-rmsnormed; project with
    :func:`logits_from_hidden`. The full forward incl. embedding lookup,
    N x (attention + FFN) via lax.scan, and final norm (main.zig:285-430).

    ``unroll`` unrolls the layer scan: inside an outer dynamic loop (the
    on-device decode loop) every scan trip has a fixed runtime cost, and for
    small models that overhead dominates the layer math — full unroll was
    measured ~1.6x faster end-to-end on stories15M on a v5e chip.

    ``mesh``: a (data, model) Mesh — runs the layer stack under shard_map
    with explicit per-shard pallas kernels and psum/ring reduces
    (parallel/tp.py). The caller must have sharded params/cache with the
    SHARD-ALIGNED layouts (engine init does: fuse_layer_params(shards=tp) +
    shard_params) and verified support via
    parallel.tp.tp_pallas_supported. Without ``mesh`` sharded callers get
    GSPMD from input shardings, as before.

    ``collective="ring"``: row-parallel wo/w2 reduce via the explicit
    overlapped ring collective matmul instead of psum (requires ``mesh``;
    see parallel/collective_matmul.py).
    """
    x = jnp.take(params["tok_emb"], tokens, axis=0)  # (B, T, D)
    x = x.astype(params.get("wq", params.get("wqkv")).dtype)
    pos = jnp.asarray(pos, jnp.int32)  # scalar or per-row (B,)
    positions = pos[..., None] + jnp.arange(tokens.shape[1], dtype=jnp.int32)
    positions = positions.reshape(*pos.shape, tokens.shape[1])
    cos, sin = ops.rope_angles(positions, config.head_size)  # (.., T, hs/2)

    if mesh is not None:
        from llama2_tpu.parallel.tp import run_layers_sharded

        x, new_cache = run_layers_sharded(
            _run_layers, params, cache, x, pos, cos, sin, config, precision,
            backend, unroll, mesh, collective,
        )
    else:
        x, new_cache = _run_layers(
            params, cache, x, pos, cos, sin, config, precision, backend,
            unroll, ring=collective == "ring",
        )
    x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
    return x, new_cache


def _run_layers(
    params: dict,
    cache: dict,
    x: jax.Array,  # (B, T, D) embedded segment
    pos,
    cos,
    sin,
    config: ModelConfig,
    precision,
    backend: str,
    unroll: int = 1,
    axis_name: str | None = None,
    ring: bool = False,
):
    """All N decoder layers over an embedded segment; returns (x, new_cache)
    WITHOUT the final rmsnorm (forward applies it).

    This is the region :func:`forward` runs under ``shard_map`` for the
    tensor-parallel pallas path (parallel/tp.py): with ``axis_name`` set the
    weights/caches are LOCAL shards, ``config`` holds LOCAL head counts, and
    the row-parallel reduces ride the named axis (see _layer /
    _post_attention). Single-chip callers leave ``axis_name=None`` and get
    the exact previous behavior.
    """
    from llama2_tpu.quant.q8 import QuantTensor

    # Quantized weights stay layer-STACKED outside the scan: the pallas
    # kernel indexes the layer itself (scalar-prefetch index_map), avoiding
    # a materialized weight-slice copy per scan trip (ops/linear.py).
    keys = layer_keys(params)
    stacked = {
        k: params[k] for k in keys if isinstance(params[k], QuantTensor)
    }
    layer_stack = {k: params[k] for k in keys if k not in stacked}

    kv_quant = "k_scale" in cache

    if x.shape[1] == 1:
        # T=1 decode: caches ride the scan carry whole (see
        # _layer_decode_stacked — scan-slicing them costs a full cache
        # read+rebuild per step and forces pallas operand copies)
        if kv_quant:
            caches = (cache["k"], cache["k_scale"], cache["v"], cache["v_scale"])
        else:
            caches = (cache["k"], cache["v"])

        # Pair-duplicated step rope rows for the glue-fused attention kernel
        # — computed ONCE per step here (outside the layer scan, every layer
        # shares the step's positions) when the fused path can engage.
        cos_il = sin_il = None
        if backend == "pallas" and stacked:
            B = x.shape[0]
            cos_il = jnp.repeat(cos.reshape(-1, cos.shape[-1]), 2, axis=-1)
            sin_il = jnp.repeat(sin.reshape(-1, sin.shape[-1]), 2, axis=-1)
            cos_il = jnp.broadcast_to(cos_il, (B, cos_il.shape[-1]))
            sin_il = jnp.broadcast_to(sin_il, (B, sin_il.shape[-1]))

        idxs = jnp.arange(config.n_layers, dtype=jnp.int32)

        # TWO-launch decode layer: glue-fused attention + the wo/FFN/next-
        # qkv megakernel, with each layer's pre-rope QKV riding the scan
        # carry (computed by the PREVIOUS layer's tail launch; layer 0's by
        # one standalone launch per step).
        from llama2_tpu.ops.pallas.common import interpret_default
        from llama2_tpu.ops.pallas.mlp_block import layer_tail_qkv_supported

        hs = config.head_size
        use_tail_qkv = (
            cos_il is not None
            and axis_name is None  # the tail megakernel spans both tp psums
            and not ring
            and (hs % 128 == 0 or interpret_default())
            and cache["k"].shape[-1] == hs
            and (cache["k"].shape[3] % 128 == 0 or not kv_quant)
            and all(
                isinstance(stacked.get(k), QuantTensor)
                for k in ("wqkv", "wo", "w1", "w3", "w2")
            )
            and layer_tail_qkv_supported(
                stacked["wo"], stacked["w1"], stacked["w3"], stacked["w2"],
                stacked["wqkv"],
            )
        )
        # ONE-launch decode layer: the whole-layer megakernel folds the
        # attention block INTO the tail kernel so its KV DMAs overlap the
        # wo weight stream (ops/pallas/layer_block.py; BREAKDOWN_7B.md
        # attribution). Engages on the INT8-KV serving config; the 2-launch
        # path below remains for fp32 caches and unsupported tilings.
        use_layer_block = False
        if use_tail_qkv and kv_quant:
            from llama2_tpu.ops.pallas.layer_block import (
                layer_block_supported,
            )

            # layer_block_supported is strict about hs/S 128-alignment even
            # in interpret mode (the q8 RMW windows require it either way)
            use_layer_block = layer_block_supported(
                stacked["wo"], stacked["w1"], stacked["w3"], stacked["w2"],
                stacked["wqkv"], config, x.shape[0], cache["k"].shape[3],
            )
        if use_layer_block:
            from llama2_tpu.ops.pallas.layer_block import layer_block_stacked
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

            B, T = x.shape[:2]
            D = config.dim
            H, KVH = config.n_heads, config.n_kv_heads
            pvec = jnp.broadcast_to(
                jnp.asarray(pos, jnp.int32).reshape(-1), (B,)
            )
            scale = 1.0 / (hs**0.5)
            qkv0 = quant_matmul_stacked(
                x, stacked["wqkv"], jnp.int32(0),
                rms_w=params["rms_att"][0], eps=config.norm_eps,
            )

            # scale caches ride the layer scan PRE-reshaped to the kernel's
            # 5-D layout: a per-layer jnp.reshape of a pallas-aliased carry
            # breaks XLA's in-place aliasing and copies the whole scale
            # array every layer (~130 us/layer measured at 1B scale)
            L_, Sc = config.n_layers, cache["k"].shape[3]
            caches = (
                caches[0],
                caches[1].reshape(L_, B, KVH, Sc // 128, 128),
                caches[2],
                caches[3].reshape(L_, B, KVH, Sc // 128, 128),
            )

            def lb(qkv, x2, caches, idx, with_qkv):
                return layer_block_stacked(
                    qkv[:, 0].reshape(B, H + 2 * KVH, hs), x2[:, 0],
                    caches[0], caches[1], caches[2], caches[3],
                    cos_il, sin_il, stacked["wo"], params["rms_ffn"],
                    stacked["w1"], stacked["w3"], stacked["w2"],
                    params["rms_att"], stacked["wqkv"], idx, pvec,
                    n_heads=H, eps=config.norm_eps, scale=scale,
                    with_qkv=with_qkv, scales_5d=True,
                )

            def dbody_block(carry, idx):
                x2, qkv, caches = carry
                out, qn, *caches = lb(qkv, x2, caches, idx, True)
                return (out[:, None], qn[:, None], tuple(caches)), None

            (x, qkv_last, caches), _ = jax.lax.scan(
                dbody_block, (x, qkv0, caches), idxs[:-1], unroll=unroll
            )
            out, _, *caches = lb(
                qkv_last, x, caches, jnp.int32(config.n_layers - 1), False
            )
            x = out[:, None]
            caches = (
                caches[0],
                caches[1].reshape(L_, B, KVH, Sc),
                caches[2],
                caches[3].reshape(L_, B, KVH, Sc),
            )
        elif use_tail_qkv:
            from llama2_tpu.ops.pallas.mlp_block import layer_tail_qkv_stacked
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

            B, T = x.shape[:2]
            D = config.dim
            H, KVH = config.n_heads, config.n_kv_heads
            pvec = jnp.broadcast_to(
                jnp.asarray(pos, jnp.int32).reshape(-1), (B,)
            )
            scale = 1.0 / (hs**0.5)
            qkv0 = quant_matmul_stacked(
                x, stacked["wqkv"], jnp.int32(0),
                rms_w=params["rms_att"][0], eps=config.norm_eps,
            )

            def fused_attention(qkv, caches, idx):
                qkv3 = qkv[:, 0].reshape(B, H + 2 * KVH, hs)
                if kv_quant:
                    from llama2_tpu.ops.pallas.attention_q8 import (
                        flash_decode_attention_q8_fused,
                    )

                    k_c, ks_c, v_c, vs_c = caches
                    att, k_c, ks_c, v_c, vs_c = (
                        flash_decode_attention_q8_fused(
                            qkv3, k_c, ks_c, v_c, vs_c, cos_il, sin_il,
                            idx, pvec, n_heads=H, scale=scale,
                        )
                    )
                    return att, (k_c, ks_c, v_c, vs_c)
                from llama2_tpu.ops.pallas.attention import (
                    flash_decode_attention_fused,
                )

                k_c, v_c = caches
                att, k_c, v_c = flash_decode_attention_fused(
                    qkv3, k_c, v_c, cos_il, sin_il, idx, pvec,
                    n_heads=H, scale=scale,
                )
                return att, (k_c, v_c)

            def dbody_tail(carry, idx):
                x, qkv, caches = carry
                att, caches = fused_attention(qkv, caches, idx)
                x, qkv = layer_tail_qkv_stacked(
                    att.reshape(B, T, D), x, stacked["wo"],
                    params["rms_ffn"], stacked["w1"], stacked["w3"],
                    stacked["w2"], params["rms_att"], stacked["wqkv"],
                    idx, config.norm_eps,
                )
                return (x, qkv, caches), None

            # scan the first L-1 layers; the LAST layer runs unrolled with
            # the no-qkv megakernel — the tail kernel's trailing phase would
            # stream a duplicate (clamped) Wqkv that no one consumes
            from llama2_tpu.ops.pallas.mlp_block import attn_mlp_block_stacked

            (x, qkv_last, caches), _ = jax.lax.scan(
                dbody_tail, (x, qkv0, caches), idxs[:-1], unroll=unroll
            )
            att, caches = fused_attention(
                qkv_last, caches, jnp.int32(config.n_layers - 1)
            )
            x = attn_mlp_block_stacked(
                att.reshape(B, T, D), x, stacked["wo"],
                params["rms_ffn"][config.n_layers - 1], stacked["w1"],
                stacked["w3"], stacked["w2"], jnp.int32(config.n_layers - 1),
                config.norm_eps,
            )
        else:

            def dbody(carry, xs):
                x, caches = carry
                idx, layer_params = xs
                lp = {**layer_params, **stacked}
                x, caches = _layer_decode_stacked(
                    x, lp, caches, idx, pos, cos, sin, config, precision,
                    backend, idx if stacked else None, cos_il, sin_il,
                    axis_name, ring,
                )
                return (x, caches), None

            (x, caches), _ = jax.lax.scan(
                dbody, (x, caches), (idxs, layer_stack), unroll=unroll
            )
        if kv_quant:
            new_cache = {
                "k": caches[0], "k_scale": caches[1],
                "v": caches[2], "v_scale": caches[3],
            }
        else:
            new_cache = {"k": caches[0], "v": caches[1]}
        return x, new_cache

    def body(carry, xs):
        x = carry
        if kv_quant:
            idx, layer_params, k_c, ks_c, v_c, vs_c = xs
        else:
            idx, layer_params, k_c, v_c = xs
            ks_c = vs_c = None
        lp = {**layer_params, **stacked}
        x, k_c, v_c, ks_c, vs_c = _layer(
            x, lp, k_c, v_c, pos, cos, sin, config, precision, backend,
            idx if stacked else None, ks_c, vs_c, axis_name, ring,
        )
        if kv_quant:
            return x, (k_c, ks_c, v_c, vs_c)
        return x, (k_c, v_c)

    idxs = jnp.arange(config.n_layers, dtype=jnp.int32)
    if kv_quant:
        xs = (idxs, layer_stack, cache["k"], cache["k_scale"],
              cache["v"], cache["v_scale"])
        x, (k_new, ks_new, v_new, vs_new) = jax.lax.scan(
            body, x, xs, unroll=unroll
        )
        new_cache = {
            "k": k_new, "k_scale": ks_new, "v": v_new, "v_scale": vs_new
        }
    else:
        x, (k_new, v_new) = jax.lax.scan(
            body, x, (idxs, layer_stack, cache["k"], cache["v"]), unroll=unroll
        )
        new_cache = {"k": k_new, "v": v_new}
    return x, new_cache


def logits_from_hidden(
    params: dict,
    hidden: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
    mesh=None,
):
    """Classifier head: ``hidden @ wcls`` → (.., vocab) float32 logits.

    ``mesh``: vocab-sharded classifier via shard_map — each shard runs the
    fused pallas dequant-matmul on its (D, V/tp) slice, then an all-gather
    rebuilds the full vocab row (Mosaic kernels are not GSPMD-partitionable,
    so the mesh path must be explicit; see parallel/tp.py).
    """
    from llama2_tpu.quant.q8 import QuantTensor

    w = params["wcls"]
    if mesh is not None and backend.startswith("pallas") and isinstance(w, QuantTensor):
        from llama2_tpu.parallel.tp import logits_sharded

        return logits_sharded(hidden, w, mesh, backend)
    return linear(hidden, w, precision, backend).astype(jnp.float32)
