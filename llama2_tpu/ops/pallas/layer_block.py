"""Whole-decoder-layer megakernel: attention + wo + FFN + next-qkv in ONE
launch over the INT8 KV cache.

The round-4 7B breakdown (BREAKDOWN_7B.md) attributed the whole gap between
the 98%-of-roofline weight stream and the 72%-of-roofline end-to-end step to
two things: the separate glue-fused attention launch (1.47 ms/step whose KV
DMAs run while the weight-stream pipe idles) and per-launch dispatch/XLA glue
(1.74 ms/step across 64 launches). This kernel removes both: the decode layer
becomes ONE launch, and the attention KV reads ride the same HBM pipe as the
Wo weight tiles.

Structure (grid ``(1, T, S)`` with ``S = s_wo + s13 + m (+ s_q)``, extending
mlp_block._kernel_wo_qkv):

* wo phase (t == 0, s < s_wo): step ``s`` FIRST computes flash attention for
  head-chunk ``s`` (the ``bk0/hs`` query heads whose outputs are rows
  ``[s*bk0, (s+1)*bk0)`` of Wo) by streaming that chunk's KV blocks with
  manual double-buffered DMAs, THEN accumulates ``r += att_chunk @ wo_tile_s``
  with per-group bf16 MXU dots. The KV DMAs for chunk ``s+1`` are prefetched
  from inside chunk ``s``'s block loop (a single ring across chunks), so KV
  streaming overlaps both attention compute and the blockspec weight-tile
  streams.
* step 0 prologue: RoPE (interleaved-pair, attention_q8._rope_interleaved),
  per-row K/V INT8 quantization, and the aligned read-modify-write cache
  append — all from the raw fused-QKV rows already in VMEM. The append is
  OFF the critical path: this step's row enters attention as a VIRTUAL row
  computed from the VMEM values (mask ``t < pos`` over cache blocks + one
  extra online-softmax update), so the RMW writes complete asynchronously
  any time before the wo phase ends.
* FFN + next-qkv phases: identical to mlp_block._kernel_wo_qkv.

Cache layout contract: ``(L, B, KVH, S, hs)`` int8 K/V with ``(L, B, KVH, S)``
f32 scales, S %% 128 == 0, hs %% 128 == 0 (the wrapper reshapes scales to
``(L, B, KVH, S/128, 128)`` so a head-chunk slice keeps the tiled last-two
dims legal). Everything appends in place via input/output aliasing — treat
cache inputs as consumed, scan-carry style.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import (
    cdiv,
    interpret_default,
    kv_scratch_rows,
)
from llama2_tpu.ops.pallas.mlp_block import (
    _pick_bkq,
    _plan,
    layer_tail_qkv_supported,
)
from llama2_tpu.ops.pallas.quant_matmul import _accum_fast, _pick_bk
from llama2_tpu.ops.pallas.attention_q8 import _rope_interleaved
from llama2_tpu.quant.q8 import QuantTensor

NEG_INF = float("-inf")

# ring-buffer budget for the interleaved attention's K+V double buffers —
# deliberately smaller than common.KV_SCRATCH_BUDGET because this kernel
# also holds the tail megakernel's weight tiles in VMEM
ATT_RING_BUDGET = 4 * 2**20


def _att_block_rows(S: int, B: int, HC: int, hs: int) -> int:
    """KV rows per ring block: largest 128-multiple dividing S whose
    2-slot K+V int8 buffers for (B, HC) head-chunks fit ATT_RING_BUDGET.
    Returns 0 when no legal block exists (caller falls back)."""
    cap = min(
        max(256, S // 8), S,
        kv_scratch_rows(B * HC, hs, 1, budget=ATT_RING_BUDGET, min_rows=0),
    )
    bs, k = 0, 1
    while 128 * k <= cap:
        if S % (128 * k) == 0:
            bs = 128 * k
        k += 1
    return bs


def layer_block_supported(wo, w1, w3, w2, wqkv, config, batch: int, S: int) -> bool:
    """Compiled-mode eligibility for the whole-layer megakernel."""
    if not layer_tail_qkv_supported(wo, w1, w3, w2, wqkv):
        return False
    H, KVH, hs = config.n_heads, config.n_kv_heads, config.head_size
    D = w1.q.shape[1]
    if H * hs != D or hs % 128 != 0 or S % 128 != 0:
        return False
    if hs % wo.group_size != 0:  # per-head wo row slices need whole groups
        return False
    bk0 = _pick_bk(D, wo.group_size, 512)
    if bk0 % hs != 0:
        return False
    CH = bk0 // hs  # query heads per wo K-tile
    GR = H // KVH  # GQA group
    if not (CH % GR == 0 or GR % CH == 0):
        return False
    HC = max(1, CH // GR)  # kv heads per chunk
    return _att_block_rows(S, batch, HC, hs) >= 128


def _kernel(
    pos_ref,  # (B,) int32 scalar prefetch
    l_ref,  # (1,) int32
    qkv_ref,  # (B, H + 2*KVH, hs) f32 VMEM — raw PRE-rope QKV rows
    x_ref,  # (B, D) VMEM — residual stream entering the layer
    cos_ref,  # (B, hs) f32 — interleaved-duplicated step rope rows
    sin_ref,
    *rest,  # [k,ks,v,vs HBM (aliased)] + weights + outputs + scratch
    eps: float, D: int, HD: int, Dq: int,
    G0: int, G1: int, G2: int, Gq: int,
    bk0: int, s_wo: int, bk1: int, s13: int, bk2: int, m: int, T: int,
    bh: int, bkq: int, s_q: int, with_qkv: bool,
    B: int, H: int, KVH: int, hs: int, CH: int, HC: int, QPC: int,
    bs: int, att_scale: float,
):
    # generic operand walk (in_specs order; clearer than one giant unpack)
    it = list(rest)
    k_hbm, ks_hbm, v_hbm, vs_hbm = it[:4]
    it = it[4:]
    (wo_ref, so_ref, rwf_ref,
     w1_ref, s1_ref, w3_ref, s3_ref, w2_ref, s2_ref) = it[:9]
    it = it[9:]
    rwa_ref = wq_ref = sq_ref = qo_ref = qacc_ref = None
    if with_qkv:
        rwa_ref, wq_ref, sq_ref = it[:3]
        it = it[3:]
    o_ref = it.pop(0)
    if with_qkv:
        qo_ref = it.pop(0)
    k_out, ks_out, v_out, vs_out = it[:4]
    it = it[4:]
    r_ref, xn_ref, h1_ref, h3_ref, acc_ref = it[:5]
    it = it[5:]
    if with_qkv:
        qacc_ref = it.pop(0)
    (qro_ref, snew_ref, vnew_ref, k_buf, ks_buf, v_buf, vs_buf,
     kwin, vwin, kswin, vswin, ring_k, ring_v, rmw_k, rmw_v) = it[:15]
    assert not it[15:], "operands left over"
    t = pl.program_id(1)
    s = pl.program_id(2)
    sp = s - s_wo
    sq = s - (s_wo + s13 + m)
    layer = l_ref[0]
    GR = H // KVH
    srows = bs // 128  # scale rows per block (128-lane tiles)

    # max position over the batch drives the shared ring block count; rows
    # with smaller pos are masked per-row (strict t < pos — this step's row
    # enters as the virtual row instead)
    mp = pos_ref[0]
    for b in range(1, B):
        mp = jnp.maximum(mp, pos_ref[b])
    nb = jnp.maximum(jax.lax.div(mp + (bs - 1), bs), 1)
    total_g = s_wo * nb

    def ring_issue(g):
        """Start the 4 DMAs of ring element g = chunk * nb + block."""
        c = jax.lax.div(g, nb)
        i = jax.lax.rem(g, nb)
        slot = jax.lax.rem(g, 2)
        kv0 = jax.lax.div(c * CH, GR)
        copies = (
            pltpu.make_async_copy(
                k_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC),
                         pl.ds(i * bs, bs), :],
                k_buf.at[slot], ring_k.at[slot, 0],
            ),
            pltpu.make_async_copy(
                ks_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC),
                          pl.ds(i * srows, srows), :],
                ks_buf.at[slot], ring_k.at[slot, 1],
            ),
            pltpu.make_async_copy(
                v_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC),
                         pl.ds(i * bs, bs), :],
                v_buf.at[slot], ring_v.at[slot, 0],
            ),
            pltpu.make_async_copy(
                vs_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC),
                          pl.ds(i * srows, srows), :],
                vs_buf.at[slot], ring_v.at[slot, 1],
            ),
        )
        for cp in copies:
            cp.start()

    def ring_wait(g):
        slot = jax.lax.rem(g, 2)
        kv0 = 0  # shapes only; offsets irrelevant for wait
        pltpu.make_async_copy(
            k_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC), pl.ds(0, bs), :],
            k_buf.at[slot], ring_k.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            ks_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC), pl.ds(0, srows), :],
            ks_buf.at[slot], ring_k.at[slot, 1],
        ).wait()
        pltpu.make_async_copy(
            v_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC), pl.ds(0, bs), :],
            v_buf.at[slot], ring_v.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            vs_out.at[layer, pl.ds(0, B), pl.ds(kv0, HC), pl.ds(0, srows), :],
            vs_buf.at[slot], ring_v.at[slot, 1],
        ).wait()

    # ---------------- step-0 prologue: rope + quantize + append ----------
    @pl.when((t == 0) & (s == 0))
    def _():
        ring_issue(jnp.int32(0))  # chunk 0 block 0 in flight ASAP
        r_ref[:] = x_ref[:].astype(jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

        qkv = qkv_ref[:].astype(jnp.float32)  # (B, H+2KVH, hs)
        cos = cos_ref[:][:, None, :]  # (B, 1, hs)
        sin = sin_ref[:][:, None, :]
        q = _rope_interleaved(qkv[:, :H, :], cos, sin)
        k = _rope_interleaved(qkv[:, H : H + KVH, :], cos, sin)
        v = qkv[:, H + KVH :, :]
        # net-zero circular roll: materializes the sliced rows through the
        # same vector-shuffle path RoPE gives k — the raw sublane-offset
        # slice feeding the append-merge select crashes the LLO lowering
        # (hardware bisect 2026-08-20); k is immune because _rope_interleaved
        # already rolls it
        v = pltpu.roll(pltpu.roll(v, shift=1, axis=2), shift=hs - 1, axis=2)

        # per-row symmetric int8 (attention_q8.quantize_kv_rows semantics)
        def quant(rows):  # (B, KVH, hs) -> int8 values + (B, KVH, 1) scales
            amax = jnp.max(jnp.abs(rows), axis=-1, keepdims=True)
            scale = amax / 127.0
            safe = jnp.maximum(scale, 1e-20)
            q8 = jnp.clip(jnp.round(rows / safe), -127, 127)
            return q8.astype(jnp.int8), scale

        k8, ksc = quant(k)
        v8, vsc = quant(v)
        k8f = k8.astype(jnp.float32)  # exact
        v8f = v8.astype(jnp.float32)

        # chunk-major stashes (static python loop — dynamic sublane slices of
        # head ranges are Mosaic-illegal, whole-leading-index loads are not)
        for c in range(s_wo):
            qc = q[:, c * CH : (c + 1) * CH, :].reshape(B * HC, QPC, hs)
            qro_ref[c] = qc.reshape(B * CH, hs)
            kv0 = (c * CH) // GR
            kc = k8f[:, kv0 : kv0 + HC, :].reshape(B * HC, 1, hs)
            # virtual-row scores for this step's K row, pre-scaled
            sn = jax.lax.dot_general(
                qc.astype(jnp.bfloat16), kc.astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[..., 0]  # (B*HC, QPC)
            kssc = ksc[:, kv0 : kv0 + HC, :].reshape(B * HC, 1)
            sn = sn * (kssc * att_scale)
            snew_ref[c] = jnp.pad(sn, ((0, 0), (0, 128 - QPC)),
                                  constant_values=NEG_INF)
            vd = (v8f * vsc)[:, kv0 : kv0 + HC, :]  # dequantized V row
            vnew_ref[c] = vd.reshape(B * HC, hs)

        # async append: read the aligned windows, merge this step's row,
        # write back; the writes are awaited at s == s_wo (nothing in the
        # attention reads row `pos` — it is the virtual row)
        for b in range(B):
            pos = pos_ref[b]
            a8 = (pos // 8) * 8
            r128 = pos // 128
            pltpu.make_async_copy(
                k_out.at[layer, b, :, pl.ds(a8, 8), :], kwin.at[b],
                rmw_k.at[b, 0],
            ).start()
            pltpu.make_async_copy(
                v_out.at[layer, b, :, pl.ds(a8, 8), :], vwin.at[b],
                rmw_v.at[b, 0],
            ).start()
            pltpu.make_async_copy(
                ks_out.at[layer, b, :, r128, :], kswin.at[b],
                rmw_k.at[b, 1],
            ).start()
            pltpu.make_async_copy(
                vs_out.at[layer, b, :, r128, :], vswin.at[b],
                rmw_v.at[b, 1],
            ).start()
        for b in range(B):
            pos = pos_ref[b]
            a8 = (pos // 8) * 8
            r128 = pos // 128
            pltpu.make_async_copy(
                k_out.at[layer, b, :, pl.ds(a8, 8), :], kwin.at[b],
                rmw_k.at[b, 0],
            ).wait()
            pltpu.make_async_copy(
                v_out.at[layer, b, :, pl.ds(a8, 8), :], vwin.at[b],
                rmw_v.at[b, 0],
            ).wait()
            pltpu.make_async_copy(
                ks_out.at[layer, b, :, r128, :], kswin.at[b],
                rmw_k.at[b, 1],
            ).wait()
            pltpu.make_async_copy(
                vs_out.at[layer, b, :, r128, :], vswin.at[b],
                rmw_v.at[b, 1],
            ).wait()

        # merge (batched selects — off8/off128 vary per row)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (B, KVH, 8, hs), 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, KVH, 128), 2)
        bi4 = jax.lax.broadcasted_iota(jnp.int32, (B, KVH, 8, hs), 0)
        bi3 = jax.lax.broadcasted_iota(jnp.int32, (B, KVH, 128), 0)
        off8 = jnp.zeros((B, KVH, 8, hs), jnp.int32)
        off128 = jnp.zeros((B, KVH, 128), jnp.int32)
        for b in range(B):
            pos = pos_ref[b]
            off8 = jnp.where(bi4 == b, pos - (pos // 8) * 8, off8)
            off128 = jnp.where(bi3 == b, pos - (pos // 128) * 128, off128)
        kwin[:] = jnp.where(row8 == off8, k8[:, :, None, :], kwin[:])
        vwin[:] = jnp.where(row8 == off8, v8[:, :, None, :], vwin[:])
        kswin[:] = jnp.where(lane == off128, ksc, kswin[:])
        vswin[:] = jnp.where(lane == off128, vsc, vswin[:])

        for b in range(B):
            pos = pos_ref[b]
            a8 = (pos // 8) * 8
            r128 = pos // 128
            pltpu.make_async_copy(
                kwin.at[b], k_out.at[layer, b, :, pl.ds(a8, 8), :],
                rmw_k.at[b, 0],
            ).start()
            pltpu.make_async_copy(
                vwin.at[b], v_out.at[layer, b, :, pl.ds(a8, 8), :],
                rmw_v.at[b, 0],
            ).start()
            pltpu.make_async_copy(
                kswin.at[b], ks_out.at[layer, b, :, r128, :],
                rmw_k.at[b, 1],
            ).start()
            pltpu.make_async_copy(
                vswin.at[b], vs_out.at[layer, b, :, r128, :],
                rmw_v.at[b, 1],
            ).start()

    # ---------------- wo phase: chunk attention + wo accumulate ----------
    @pl.when((t == 0) & (s < s_wo))
    def _():
        # per-row positions as a broadcastable block (strict < pos mask)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (B * HC, QPC, bs), 0)
        posb = jnp.zeros((B * HC, QPC, bs), jnp.int32)
        for b in range(B):
            posb = jnp.where(rowi // HC == b, pos_ref[b], posb)

        q = qro_ref[s].reshape(B * HC, QPC, hs).astype(jnp.bfloat16)
        g0 = s * nb

        def body(i, carry):
            mx, l, acc = carry
            g = g0 + i

            @pl.when(g + 1 < total_g)
            def _():
                ring_issue(g + 1)

            ring_wait(g)
            slot = jax.lax.rem(g, 2)
            k = k_buf[slot].reshape(B * HC, bs, hs).astype(jnp.bfloat16)
            ks = ks_buf[slot].reshape(B * HC, 1, bs)
            sc = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (B*HC, QPC, bs)
            sc = sc * (ks * att_scale)
            tpos = i * bs + jax.lax.broadcasted_iota(
                jnp.int32, (B * HC, QPC, bs), 2
            )
            sc = jnp.where(tpos < posb, sc, NEG_INF)

            # strict `t < pos` masking can leave a row with NO live entries
            # (pos == 0, or early blocks of short rows): m_new stays -inf and
            # exp(-inf - -inf) would NaN — the virtual row supplies the
            # first finite max later, so clamp these to zero contributions
            m_new = jnp.maximum(mx, jnp.max(sc, axis=2, keepdims=True))
            dead = m_new == NEG_INF
            alpha = jnp.where(dead, 0.0, jnp.exp(mx - m_new))
            p = jnp.where(dead, 0.0, jnp.exp(sc - m_new))
            l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
            v = v_buf[slot].reshape(B * HC, bs, hs).astype(jnp.bfloat16)
            vs = vs_buf[slot].reshape(B * HC, 1, bs)
            pv = jax.lax.dot_general(
                (p * vs).astype(jnp.bfloat16), v,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m0 = jnp.full((B * HC, QPC, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B * HC, QPC, 1), jnp.float32)
        acc0 = jnp.zeros((B * HC, QPC, hs), jnp.float32)
        mx, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))

        # virtual row: this step's K/V contribution from VMEM
        sn = snew_ref[s][:, :QPC][..., None]  # (B*HC, QPC, 1) pre-scaled
        m_f = jnp.maximum(mx, sn)
        alpha = jnp.exp(mx - m_f)
        p_new = jnp.exp(sn - m_f)
        l_f = l * alpha + p_new
        vd = vnew_ref[s][:, None, :]  # (B*HC, 1, hs) dequantized
        att = (acc * alpha + p_new * vd) / l_f  # (B*HC, QPC, hs)

        # r += att_chunk @ wo_tile_s with per-group bf16 dots, walking the
        # tile's rows head by head (quant_matmul._accum_fast semantics and
        # group order — group g of the tile is head c, sub-group g')
        att4 = att.reshape(B, HC, QPC, hs)
        r = r_ref[:]
        w = wo_ref[0]
        sg = so_ref[0]
        for c in range(CH):
            hc, qc = divmod(c, QPC)
            ab = att4[:, hc, qc, :].astype(jnp.bfloat16)
            for g in range(hs // G0):
                part = jax.lax.dot_general(
                    ab[:, g * G0 : (g + 1) * G0],
                    w[c * hs + g * G0 : c * hs + (g + 1) * G0, :].astype(
                        jnp.bfloat16
                    ),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                r = r + part * sg[c * (hs // G0) + g, :][None, :]
        r_ref[:] = r

    # ---------------- FFN + next-qkv phases (mlp_block._kernel_wo_qkv) ----
    @pl.when((t == 0) & (s == s_wo))
    def _():
        # the append writes must land before the kernel exits; everything
        # after here only reads weights
        for b in range(B):
            pos = pos_ref[b]
            a8 = (pos // 8) * 8
            r128 = pos // 128
            pltpu.make_async_copy(
                kwin.at[b], k_out.at[layer, b, :, pl.ds(a8, 8), :],
                rmw_k.at[b, 0],
            ).wait()
            pltpu.make_async_copy(
                vwin.at[b], v_out.at[layer, b, :, pl.ds(a8, 8), :],
                rmw_v.at[b, 0],
            ).wait()
            pltpu.make_async_copy(
                kswin.at[b], ks_out.at[layer, b, :, r128, :],
                rmw_k.at[b, 1],
            ).wait()
            pltpu.make_async_copy(
                vswin.at[b], vs_out.at[layer, b, :, r128, :],
                rmw_v.at[b, 1],
            ).wait()

        Kp1 = s13 * bk1
        rf = r_ref[:]
        ms = jnp.mean(rf * rf, axis=-1, keepdims=True)
        xn = rf * jax.lax.rsqrt(ms + eps) * rwf_ref[0].astype(jnp.float32)
        if Kp1 == D:
            xn_ref[:] = xn
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (xn.shape[0], Kp1), 1)
            xn_ref[:] = jnp.where(
                col < D, jnp.pad(xn, ((0, 0), (0, Kp1 - D))), 0.0
            )

    @pl.when(s == s_wo)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h3_ref[:] = jnp.zeros_like(h3_ref)

    @pl.when((s >= s_wo) & (sp < s13))
    def _():
        xk = xn_ref[:, pl.dslice(sp * bk1, bk1)]
        s1 = s1_ref[0]
        s3 = s3_ref[0]
        if s13 * bk1 > D:
            gid = sp * (bk1 // G1) + jax.lax.broadcasted_iota(
                jnp.int32, s1.shape, 0
            )
            s1 = jnp.where(gid < D // G1, s1, 0.0)
            s3 = jnp.where(gid < D // G1, s3, 0.0)
        if T * bh > HD:
            hid = t * bh + jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1)
            s1 = jnp.where(hid < HD, s1, 0.0)
            s3 = jnp.where(hid < HD, s3, 0.0)
        h1_ref[:] = _accum_fast(xk, w1_ref[0], s1, h1_ref[:], G1)
        h3_ref[:] = _accum_fast(xk, w3_ref[0], s3, h3_ref[:], G1)

    @pl.when(sp == s13)
    def _():
        h1 = h1_ref[:]
        h1_ref[:] = h1 * jax.nn.sigmoid(h1) * h3_ref[:]

    @pl.when((sp >= s13) & (sq < 0))
    def _():
        hk = h1_ref[:, pl.dslice((sp - s13) * bk2, bk2)]
        s2 = s2_ref[0]
        blk = jnp.minimum(t * m + (sp - s13), cdiv(HD, bk2) - 1)
        gid = blk * (bk2 // G2) + jax.lax.broadcasted_iota(
            jnp.int32, s2.shape, 0
        )
        s2 = jnp.where(gid < HD // G2, s2, 0.0)
        acc_ref[:] = _accum_fast(hk, w2_ref[0], s2, acc_ref[:], G2)

    if with_qkv:
        @pl.when((t == T - 1) & (sq == 0))
        def _():
            out = acc_ref[:] + r_ref[:]
            o_ref[:] = out.astype(o_ref.dtype)
            ms = jnp.mean(out * out, axis=-1, keepdims=True)
            xq = out * jax.lax.rsqrt(ms + eps) * rwa_ref[0].astype(
                jnp.float32
            )
            Kp1 = s13 * bk1
            if Kp1 == D:
                xn_ref[:] = xq
            else:
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (xq.shape[0], Kp1), 1
                )
                xn_ref[:] = jnp.where(
                    col < D, jnp.pad(xq, ((0, 0), (0, Kp1 - D))), 0.0
                )
            qacc_ref[:] = jnp.zeros_like(qacc_ref)

        @pl.when((t == T - 1) & (sq >= 0))
        def _():
            xk = xn_ref[:, pl.dslice(sq * bkq, bkq)]
            qacc_ref[:] = _accum_fast(
                xk, wq_ref[0], sq_ref[0], qacc_ref[:], Gq
            )

        @pl.when((t == T - 1) & (sq == s_q - 1))
        def _():
            qo_ref[:] = qacc_ref[:].astype(qo_ref.dtype)
    else:
        @pl.when((t == T - 1) & (s == s_wo + s13 + m - 1))
        def _():
            o_ref[:] = (acc_ref[:] + r_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "group0", "group1", "group2", "groupq", "n_heads",
        "att_scale", "with_qkv", "interpret", "m_cap",
    ),
    inline=True,
)
def _layer_block_2d(
    qkv3, x, cos_il, sin_il, k8, ks4, v8, vs4,
    qo_, so_, rms_ffn, q1, s1, q3, s3, q2, s2, rms_att, qq, sq_,
    layer, pos,
    eps: float, group0: int, group1: int, group2: int, groupq: int,
    n_heads: int, att_scale: float, with_qkv: bool, interpret: bool,
    m_cap: int | None,
):
    B, D = x.shape
    L, _, HD = q1.shape
    Dq = qq.shape[2]
    KVH, S, hs = k8.shape[2], k8.shape[3], k8.shape[4]
    H = n_heads
    GR = H // KVH
    bk0 = _pick_bk(D, group0, 512)
    s_wo = D // bk0
    CH = bk0 // hs
    HC = max(1, CH // GR)
    QPC = GR if GR <= CH else CH
    bs = _att_block_rows(S, B, HC, hs)
    srows = bs // 128
    bk1, s13, bk2, m, T, bh = _plan(D, HD, group1, group2)
    if m_cap is not None:  # test hook: force chunking on small shapes
        T = cdiv(cdiv(HD, bk2), m_cap)
        m = cdiv(cdiv(HD, bk2), T)
        bh = m * bk2
    bkq = _pick_bkq(D, Dq, groupq)
    s_q = D // bkq if with_qkv else 0
    S_grid = s_wo + s13 + m + s_q
    sg0, sg1, sg2 = bk0 // group0, bk1 // group1, bk2 // group2
    sgq = bkq // groupq
    n_sub = cdiv(HD, bk2)
    q_base = s_wo + s13 + m

    def wo_idx(i, t, s, pos_ref, l_ref):
        return (
            l_ref[0],
            jnp.where(t > 0, s_wo - 1, jnp.minimum(s, s_wo - 1)),
            0,
        )

    def w13_idx(i, t, s, pos_ref, l_ref):
        sp = jnp.clip(s - s_wo, 0, s13 - 1)
        return (l_ref[0], sp, t)

    def w2_idx(i, t, s, pos_ref, l_ref):
        sp = jnp.clip(s - s_wo, 0, s13 + m - 1)
        blk = jnp.where(sp < s13, t * m, t * m + (sp - s13))
        return (l_ref[0], jnp.minimum(blk, n_sub - 1), 0)

    def wq_idx(i, t, s, pos_ref, l_ref):
        sqs = jnp.where(t == T - 1, jnp.clip(s - q_base, 0, s_q - 1), 0)
        return (jnp.minimum(l_ref[0] + 1, L - 1), sqs, 0)

    def row_spec(width):
        # index map DEPENDS on grid dim 0 (always block 0 — the grid's dim-0
        # extent is 1): pallas marks constant-index windows
        # pipeline_mode=synchronous, which serializes the WHOLE kernel's
        # window pipeline — measured 3x on the weight phases (2026-08-20)
        return pl.BlockSpec(
            (B, width), lambda i, t, s, p, l: (i, 0), memory_space=pltpu.VMEM
        )

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [
        pl.BlockSpec((B, H + 2 * KVH, hs), lambda i, t, s, p, l: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # qkv3
        row_spec(D),  # x
        row_spec(hs),  # cos_il
        row_spec(hs),  # sin_il
        hbm, hbm, hbm, hbm,  # caches (aliased)
        pl.BlockSpec((1, bk0, D), wo_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sg0, D), wo_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), lambda i, t, s, p, l: (l[0], 0, 0),
                     memory_space=pltpu.VMEM),  # rms_ffn[l]
        pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk2, D), w2_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sg2, D), w2_idx, memory_space=pltpu.VMEM),
    ]
    operands = [qkv3, x, cos_il, sin_il, k8, ks4, v8, vs4,
                qo_, so_, rms_ffn.reshape(-1, 1, D),
                q1, s1, q3, s3, q2, s2]
    if with_qkv:
        in_specs += [
            pl.BlockSpec((1, 1, D), lambda i, t, s, p, l: (
                jnp.minimum(l[0] + 1, L - 1), 0, 0
            ), memory_space=pltpu.VMEM),  # rms_att[l+1]
            pl.BlockSpec((1, bkq, Dq), wq_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sgq, Dq), wq_idx, memory_space=pltpu.VMEM),
        ]
        operands += [rms_att.reshape(-1, 1, D), qq, sq_]

    out_specs = [row_spec(D)]
    out_shape = [jax.ShapeDtypeStruct((B, D), x.dtype)]
    if with_qkv:
        out_specs.append(row_spec(Dq))
        out_shape.append(jax.ShapeDtypeStruct((B, Dq), x.dtype))
    out_specs += [hbm, hbm, hbm, hbm]
    out_shape += [
        jax.ShapeDtypeStruct(k8.shape, k8.dtype),
        jax.ShapeDtypeStruct(ks4.shape, ks4.dtype),
        jax.ShapeDtypeStruct(v8.shape, v8.dtype),
        jax.ShapeDtypeStruct(vs4.shape, vs4.dtype),
    ]
    cache_out0 = 2 if with_qkv else 1
    # operand indices include the two scalar-prefetch args (pos=0, layer=1);
    # caches are operands 6..9
    aliases = {6 + j: cache_out0 + j for j in range(4)}

    scratch = [
        pltpu.VMEM((B, D), jnp.float32),  # r
        pltpu.VMEM((B, s13 * bk1), jnp.float32),  # xn
        pltpu.VMEM((B, bh), jnp.float32),  # h1 / swiglu product
        pltpu.VMEM((B, bh), jnp.float32),  # h3
        pltpu.VMEM((B, D), jnp.float32),  # out accumulator
    ]
    if with_qkv:
        scratch.append(pltpu.VMEM((B, Dq), jnp.float32))  # qacc
    scratch += [
        pltpu.VMEM((s_wo, B * CH, hs), jnp.float32),  # qro (chunk-major)
        pltpu.VMEM((s_wo, B * HC, 128), jnp.float32),  # snew (virtual row)
        pltpu.VMEM((s_wo, B * HC, hs), jnp.float32),  # vnew (dequantized)
        pltpu.VMEM((2, B, HC, bs, hs), jnp.int8),  # k ring
        pltpu.VMEM((2, B, HC, srows, 128), jnp.float32),  # k scales
        pltpu.VMEM((2, B, HC, bs, hs), jnp.int8),  # v ring
        pltpu.VMEM((2, B, HC, srows, 128), jnp.float32),  # v scales
        pltpu.VMEM((B, KVH, 8, hs), jnp.int8),  # k append window
        pltpu.VMEM((B, KVH, 8, hs), jnp.int8),  # v append window
        pltpu.VMEM((B, KVH, 128), jnp.float32),  # k scale window
        pltpu.VMEM((B, KVH, 128), jnp.float32),  # v scale window
        # DMA semaphores: K-side and V-side streams ride SEPARATE sem
        # arrays — a single (2, 4) array indexed by all four ring streams
        # trips a Mosaic lowering crash (lower_to_llo.cc d>>32 check) when
        # combined with this kernel's blockspec weight pipeline; split
        # arrays lower fine (bisected on hardware, 2026-08-20)
        pltpu.SemaphoreType.DMA((2, 2)),  # ring K / K-scales
        pltpu.SemaphoreType.DMA((2, 2)),  # ring V / V-scales
        pltpu.SemaphoreType.DMA((B, 2)),  # RMW K window / K scales
        pltpu.SemaphoreType.DMA((B, 2)),  # RMW V window / V scales
    ]

    ring_bytes = 2 * 2 * B * HC * bs * (hs + 4 * srows * 128 // bs)
    vmem_limit = int(
        1.05 * 2 * (
            (bk0 * D + 2 * bk1 * bh + bk2 * D + (bkq * Dq if with_qkv else 0))
            + 4 * (sg0 * D + 2 * sg1 * bh + sg2 * D
                   + (sgq * Dq if with_qkv else 0))
        )
        + 4 * B * (s13 * bk1 + 2 * bh + 4 * D + (2 * Dq if with_qkv else 0))
        + ring_bytes + 2 * B * KVH * (8 * hs + 4 * 128)
        + 4 * s_wo * B * (CH + 2 * HC) * hs
        + B * (H + 2 * KVH) * hs * 4
        + 4 * 1024 * 1024
    )

    outs = pl.pallas_call(
        functools.partial(
            _kernel, eps=eps, D=D, HD=HD, Dq=Dq,
            G0=group0, G1=group1, G2=group2, Gq=groupq,
            bk0=bk0, s_wo=s_wo, bk1=bk1, s13=s13, bk2=bk2, m=m, T=T, bh=bh,
            bkq=bkq, s_q=s_q, with_qkv=with_qkv,
            B=B, H=H, KVH=KVH, hs=hs, CH=CH, HC=HC, QPC=QPC,
            bs=bs, att_scale=att_scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1, T, S_grid),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * (D + 3 * HD + (Dq if with_qkv else 0)),
            bytes_accessed=D * D + 3 * D * HD
            + (D * Dq if with_qkv else 0) + B * KVH * S * hs // 4,
            transcendentals=B * HD,
        ),
        interpret=interpret,
    )(pos, layer, *operands)
    if with_qkv:
        out, qn, k8, ks4, v8, vs4 = outs
        return out, qn, k8, ks4, v8, vs4
    out, k8, ks4, v8, vs4 = outs
    return out, None, k8, ks4, v8, vs4


def layer_block_stacked(
    qkv3: jax.Array,  # (B, H + 2*KVH, hs) f32 — raw PRE-rope QKV rows
    x: jax.Array,  # (B, D) residual stream entering the layer
    k8: jax.Array,  # (L, B, KVH, S, hs) int8 — updated IN PLACE
    k_scale: jax.Array,  # (L, B, KVH, S) f32 — updated IN PLACE
    v8: jax.Array,
    v_scale: jax.Array,
    cos_il: jax.Array,  # (B, hs) pair-duplicated step rope rows
    sin_il: jax.Array,
    wo: QuantTensor,
    rms_ffn: jax.Array,  # (L, D)
    w1: QuantTensor,
    w3: QuantTensor,
    w2: QuantTensor,
    rms_att: jax.Array,  # (L, D) — indexed at l+1 (clamped)
    wqkv: QuantTensor,
    layer,
    pos,
    *,
    n_heads: int,
    eps: float = 1e-5,
    scale: float | None = None,
    with_qkv: bool = True,
    scales_5d: bool = False,
    interpret: bool | None = None,
    m_cap: int | None = None,
):
    """One whole decoder layer in ONE launch over the stacked INT8 cache:

        att  = flash_decode(rope(qkv3), cache; append in place)
        r    = x + att @ wo[l]
        out  = r + swiglu(rmsnorm(r, rms_ffn[l]) @ w1[l], ...) @ w2[l]
        qkv' = rmsnorm(out, rms_att[l+1]) @ wqkv[l+1]      (with_qkv)

    Returns ``(out, qkv' | None, k8, k_scale, v8, v_scale)`` with the caches
    updated in place — treat the inputs as consumed, scan-carry style.
    """
    B, rows, hs = qkv3.shape
    KVH, S = k8.shape[2], k8.shape[3]
    # scales_5d: k_scale/v_scale arrive PRE-reshaped (L, B, KVH, S/128, 128).
    # The per-call jnp.reshape of a scan-carried, pallas-aliased buffer
    # breaks XLA's in-place aliasing and costs a full scale-array copy per
    # LAYER (~130 us/layer at 1B scale, measured 2026-08-20); the decode
    # path reshapes ONCE per step outside the layer scan instead.
    if rows != n_heads + 2 * KVH:
        raise ValueError(f"qkv rows {rows} != H {n_heads} + 2*KVH {2 * KVH}")
    if hs % 128 != 0 or S % 128 != 0:
        raise ValueError("layer_block requires head_size and seq_len % 128")
    if interpret is None:
        interpret = interpret_default()
    if scale is None:
        scale = 1.0 / (hs**0.5)
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    layer_vec = jnp.asarray(layer, jnp.int32).reshape(1)
    L = k8.shape[0]
    # scales ride 5-D so a head-chunk slice keeps tiled last-two dims legal
    if scales_5d:
        ks4, vs4 = k_scale, v_scale
    else:
        ks4 = k_scale.reshape(L, B, KVH, S // 128, 128)
        vs4 = v_scale.reshape(L, B, KVH, S // 128, 128)
    out, qn, k8, ks4, v8, vs4 = _layer_block_2d(
        qkv3, x, cos_il, sin_il, k8, ks4, v8, vs4,
        wo.q, wo.scale, rms_ffn, w1.q, w1.scale, w3.q, w3.scale,
        w2.q, w2.scale, rms_att, wqkv.q, wqkv.scale,
        layer_vec, pos_vec,
        float(eps), wo.group_size, w1.group_size, w2.group_size,
        wqkv.group_size, n_heads, float(scale), with_qkv, interpret, m_cap,
    )
    if scales_5d:
        return out, qn, k8, ks4, v8, vs4
    return (
        out, qn, k8, ks4.reshape(L, B, KVH, S), v8,
        vs4.reshape(L, B, KVH, S),
    )
