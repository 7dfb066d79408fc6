"""Fused decode-MLP megakernel: rmsnorm + w1/w3 + swiglu + w2 + residual.

One ``pallas_call`` runs the whole FFN block of a decoder layer over
layer-stacked INT8 weights:

    out = x + swiglu(rmsnorm(x) @ W1, rmsnorm(x) @ W3) @ W2

The reference computes this as four separate passes (rmsnorm main.zig:398,
matmul_fused(2,{w1,w3}) main.zig:405-408, swiglu main.zig:411-416, w2 matvec
main.zig:418); the round-1 TPU design mirrored that as two quant-matmul
launches plus XLA rmsnorm/swiglu/residual ops. At Llama-7B decode shapes each
launch and each XLA fusion between launches carries a fixed dispatch cost
(~10-40 us) that the bandwidth-bound matvecs cannot hide — measured as the
bulk of the gap between ~97%%-of-roofline matmul kernels and a ~63%%
end-to-end step. Here the elementwise glue rides inside the weight-streaming
kernel: activations never return to HBM between the four stages (x, the
h1/h3 accumulators and the swiglu product live in VMEM scratch), and the
whole FFN block is a single launch streaming W1, W3 and W2 exactly once.

Grid ``(M/bm, T, s13 + m)``: for each hidden-chunk t of ``bh`` columns, the
first ``s13`` steps stream W1/W3 K-tiles and accumulate h1/h3 for that chunk
(per-group bf16 MXU dots, f32-scaled partials — quant_matmul's fast mode);
step ``s13`` applies swiglu to the finished chunk in VMEM; the remaining
``m`` steps stream the chunk's W2 row-tiles and accumulate the output.
rmsnorm runs once at the first step (x is one whole-row block in VMEM).
Ragged edges (a hidden size with no legal dividing tile, e.g. Llama-7B's
11008) use ceil grids with where-masked out-of-range scale groups, exactly
like quant_matmul's ragged-K path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import cdiv, interpret_default, round_up
from llama2_tpu.ops.pallas.quant_matmul import (
    _FAST_TILE_BYTES,
    _accum_fast,
    _pick_bk,
)
from llama2_tpu.quant.q8 import QuantTensor


def _plan(D: int, HD: int, G1: int, G2: int):
    """Tile plan: (bk1, s13, bk2, m, T, bh). See module docstring."""
    bk1 = _pick_bk(D, G1, 512)
    s13 = cdiv(D, bk1)
    bk2 = _pick_bk(HD, G2, 512)
    n_sub = cdiv(HD, bk2)
    # chunk width bh = m*bk2 capped so a (bk1, bh) int8 tile stays stream-
    # sized; T chunks ceil-cover HD with minimal over-read (<= bk2 slack)
    m_cap = max(1, _FAST_TILE_BYTES // max(bk1 * bk2, 1))
    T = cdiv(n_sub, m_cap)
    m = cdiv(n_sub, T)
    bh = m * bk2
    return bk1, s13, bk2, m, T, bh


def mlp_block_supported(w1, w3, w2) -> bool:
    """Compiled-mode eligibility (wrapper falls back outside these)."""
    if not all(isinstance(w, QuantTensor) for w in (w1, w3, w2)):
        return False
    if not (w1.q.ndim == w3.q.ndim == w2.q.ndim == 3):
        return False
    L, D, HD = w1.q.shape
    if w3.q.shape != (L, D, HD) or w2.q.shape != (L, HD, D):
        return False
    if w1.group_size != w3.group_size:
        return False
    if D % w1.group_size or HD % w2.group_size:
        return False
    # x block / w2 output lanes; whole-HD w13 tiles need 128-lane chunks
    _, _, _, _, _, bh = _plan(D, HD, w1.group_size, w2.group_size)
    return D % 128 == 0 and bh % 128 == 0


def _kernel(
    l_ref, x_ref, rw_ref, w1_ref, s1_ref, w3_ref, s3_ref, w2_ref, s2_ref,
    o_ref, xn_ref, h1_ref, h3_ref, acc_ref,
    *, eps: float, D: int, HD: int, G1: int, G2: int,
    bk1: int, s13: int, bk2: int, m: int, T: int, bh: int,
    residual: bool = True,
):
    t = pl.program_id(1)
    s = pl.program_id(2)
    S = s13 + m
    Kp1 = s13 * bk1  # xn scratch width (>= D when the K tiling is ragged)

    @pl.when((t == 0) & (s == 0))
    def _():
        # rmsnorm over the whole row block (x block spans all of D); eps
        # after the mean, f32 sum-of-squares (main.zig:452-454 semantics,
        # identical to ops.xla.rmsnorm)
        xf = x_ref[:].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(ms + eps) * rw_ref[:].astype(jnp.float32)
        if Kp1 == D:
            xn_ref[:] = xn
        else:
            # zero the ragged tail: garbage f32 in the pad columns would
            # poison the masked tail dot (0 * NaN = NaN)
            col = jax.lax.broadcasted_iota(jnp.int32, (xn.shape[0], Kp1), 1)
            xn_ref[:] = jnp.where(
                col < D, jnp.pad(xn, ((0, 0), (0, Kp1 - D))), 0.0
            )
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s == 0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h3_ref[:] = jnp.zeros_like(h3_ref)

    @pl.when(s < s13)
    def _():
        # stream W1/W3 K-tiles for hidden chunk t; mask scale rows past the
        # last real K-group (ragged D tiling) and scale columns past HD
        # (ceil hidden coverage) — OOB int8 weights decode finite and die
        # against the zeroed scales/xn columns
        xk = xn_ref[:, pl.dslice(s * bk1, bk1)]
        s1 = s1_ref[0]
        s3 = s3_ref[0]
        sg1 = bk1 // G1
        if s13 * bk1 > D:
            gid = s * sg1 + jax.lax.broadcasted_iota(jnp.int32, s1.shape, 0)
            s1 = jnp.where(gid < D // G1, s1, 0.0)
            s3 = jnp.where(gid < D // G1, s3, 0.0)
        if T * bh > HD:
            hid = t * bh + jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1)
            s1 = jnp.where(hid < HD, s1, 0.0)
            s3 = jnp.where(hid < HD, s3, 0.0)
        h1_ref[:] = _accum_fast(xk, w1_ref[0], s1, h1_ref[:], G1)
        h3_ref[:] = _accum_fast(xk, w3_ref[0], s3, h3_ref[:], G1)

    @pl.when(s == s13)
    def _():
        # swiglu on the finished chunk, in place (h1 becomes the product);
        # f32 throughout, matching ops.xla.swiglu
        h1 = h1_ref[:]
        h1_ref[:] = h1 * jax.nn.sigmoid(h1) * h3_ref[:]

    @pl.when(s >= s13)
    def _():
        # stream the chunk's W2 row-tiles; mask scale groups past HD/G2
        # (ragged tail AND the duplicate clamped block when T*m > n_sub —
        # its h columns are exact zeros, so masked scales keep 0*NaN out)
        hk = h1_ref[:, pl.dslice((s - s13) * bk2, bk2)]
        s2 = s2_ref[0]
        sg2 = bk2 // G2
        blk = jnp.minimum(t * m + (s - s13), cdiv(HD, bk2) - 1)
        gid = blk * sg2 + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0)
        s2 = jnp.where(gid < HD // G2, s2, 0.0)
        acc_ref[:] = _accum_fast(hk, w2_ref[0], s2, acc_ref[:], G2)

    @pl.when((t == T - 1) & (s == S - 1))
    def _():
        # under tensor parallelism the caller psums the partial output
        # across the model axis first and adds the residual after, so the
        # kernel must emit the bare FFN partial (residual=False)
        acc = acc_ref[:]
        if residual:
            acc = acc + x_ref[:].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "group1", "group2", "bm", "interpret", "m_cap",
                     "residual"),
    inline=True,
)
def _mlp_block_2d(
    x, rms_w, q1, s1, q3, s3, q2, s2, layer,
    eps: float, group1: int, group2: int, bm: int, interpret: bool,
    m_cap: int | None, residual: bool = True,
):
    M, D = x.shape
    L, _, HD = q1.shape
    bk1, s13, bk2, m, T, bh = _plan(D, HD, group1, group2)
    if m_cap is not None:  # test hook: force chunking on small shapes
        T = cdiv(cdiv(HD, bk2), m_cap)
        m = cdiv(cdiv(HD, bk2), T)
        bh = m * bk2
    S = s13 + m
    sg1, sg2 = bk1 // group1, bk2 // group2
    n_sub = cdiv(HD, bk2)

    def w13_idx(i, t, s, l_ref):
        return (l_ref[0], jnp.minimum(s, s13 - 1), t)

    def w2_idx(i, t, s, l_ref):
        # during the w13 phase prefetch the chunk's first W2 tile; clamp
        # fully-OOB trailing blocks onto the last real one (contribution is
        # exactly zero — see kernel mask note)
        blk = jnp.where(s < s13, t * m, t * m + (s - s13))
        return (l_ref[0], jnp.minimum(blk, n_sub - 1), 0)

    out = pl.pallas_call(
        functools.partial(
            _kernel, eps=eps, D=D, HD=HD, G1=group1, G2=group2,
            bk1=bk1, s13=s13, bk2=bk2, m=m, T=T, bh=bh, residual=residual,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(M, bm), T, S),
            in_specs=[
                pl.BlockSpec((bm, D), lambda i, t, s, l: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i, t, s, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk2, D), w2_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg2, D), w2_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, D), lambda i, t, s, l: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((bm, s13 * bk1), jnp.float32),  # xn
                pltpu.VMEM((bm, bh), jnp.float32),  # h1 / swiglu product
                pltpu.VMEM((bm, bh), jnp.float32),  # h3
                pltpu.VMEM((bm, D), jnp.float32),  # out accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * HD * 3,
            bytes_accessed=3 * D * HD
            + (D // group1) * HD * 8 + (HD // group2) * D * 4,
            transcendentals=M * HD,
        ),
        # the 7B tiling's double-buffered streams sit ~0.2%% over the
        # default 16 MiB scoped-vmem budget; lift the cap to what the
        # buffers actually need (w1+w3+w2 tiles + scales, x2 buffers, plus
        # scratch)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.05 * 2 * (
                (2 * bk1 * bh + bk2 * D)
                + 4 * (2 * (bk1 // group1) * bh + (bk2 // group2) * D)
            ) + 4 * bm * (s13 * bk1 + 2 * bh + 2 * D) + 2 * 1024 * 1024),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, rms_w.reshape(1, D),
      q1, s1, q3, s3, q2, s2)
    return out


def attn_mlp_block_supported(wo, w1, w3, w2) -> bool:
    """Compiled-mode eligibility for the wo-prepended megakernel."""
    if not mlp_block_supported(w1, w3, w2):
        return False
    if not isinstance(wo, QuantTensor) or wo.q.ndim != 3:
        return False
    L, D, HD = w1.q.shape
    if wo.q.shape[1] != wo.q.shape[2] or wo.q.shape[:2] != (L, D):
        return False
    bk0 = _pick_bk(D, wo.group_size, 512)
    # the wo phase keeps exact tiling (no ragged mask — D is the model dim,
    # 128-aligned in every real config)
    return D % bk0 == 0 and D % wo.group_size == 0


def _kernel_wo(
    l_ref, att_ref, x_ref, wo_ref, so_ref, rw_ref,
    w1_ref, s1_ref, w3_ref, s3_ref, w2_ref, s2_ref,
    o_ref, r_ref, xn_ref, h1_ref, h3_ref, acc_ref,
    *, eps: float, D: int, HD: int, G0: int, G1: int, G2: int,
    bk0: int, s_wo: int, bk1: int, s13: int, bk2: int, m: int, T: int,
    bh: int,
):
    """:func:`_kernel` with the attention-output projection prepended:

        r   = x + att @ Wo          (phase 0 — t == 0, s < s_wo)
        out = r + swiglu(rmsnorm(r) @ W1, ... @ W3) @ W2   (phases 1-3)

    One launch streams Wo, W1, W3 and W2 exactly once; ``r`` (the layer's
    residual stream after attention) lives in VMEM scratch. For t > 0 the
    first ``s_wo`` grid steps are no-ops with clamped index maps (no DMA is
    re-issued for an unchanged block), so the wasted steps cost only grid
    sequencing.
    """
    t = pl.program_id(1)
    s = pl.program_id(2)
    sp = s - s_wo  # phase-shifted step index for the FFN phases

    @pl.when((t == 0) & (s == 0))
    def _():
        r_ref[:] = x_ref[:].astype(jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((t == 0) & (s < s_wo))
    def _():
        ak = att_ref[:, pl.dslice(s * bk0, bk0)].astype(jnp.float32)
        r_ref[:] = _accum_fast(ak, wo_ref[0], so_ref[0], r_ref[:], G0)

    @pl.when((t == 0) & (s == s_wo))
    def _():
        # rmsnorm over the completed residual row (identical semantics to
        # _kernel's prologue, but on r instead of x)
        Kp1 = s13 * bk1
        rf = r_ref[:]
        ms = jnp.mean(rf * rf, axis=-1, keepdims=True)
        xn = rf * jax.lax.rsqrt(ms + eps) * rw_ref[:].astype(jnp.float32)
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

    @pl.when(sp >= s13)
    def _():
        hk = h1_ref[:, pl.dslice((sp - s13) * bk2, bk2)]
        s2 = s2_ref[0]
        blk = jnp.minimum(t * m + (sp - s13), cdiv(HD, bk2) - 1)
        gid = blk * (bk2 // G2) + jax.lax.broadcasted_iota(
            jnp.int32, s2.shape, 0
        )
        s2 = jnp.where(gid < HD // G2, s2, 0.0)
        acc_ref[:] = _accum_fast(hk, w2_ref[0], s2, acc_ref[:], G2)

    @pl.when((t == T - 1) & (s == s_wo + s13 + m - 1))
    def _():
        o_ref[:] = (acc_ref[:] + r_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "group0", "group1", "group2", "bm", "interpret", "m_cap"
    ),
    inline=True,
)
def _attn_mlp_block_2d(
    att, x, qo, so, rms_w, q1, s1, q3, s3, q2, s2, layer,
    eps: float, group0: int, group1: int, group2: int, bm: int,
    interpret: bool, m_cap: int | None,
):
    M, D = x.shape
    L, _, HD = q1.shape
    bk0 = _pick_bk(D, group0, 512)
    s_wo = D // bk0
    bk1, s13, bk2, m, T, bh = _plan(D, HD, group1, group2)
    if m_cap is not None:  # test hook: force chunking on small shapes
        T = cdiv(cdiv(HD, bk2), m_cap)
        m = cdiv(cdiv(HD, bk2), T)
        bh = m * bk2
    S = s_wo + s13 + m
    sg0, sg1, sg2 = bk0 // group0, bk1 // group1, bk2 // group2
    n_sub = cdiv(HD, bk2)

    def wo_idx(i, t, s, l_ref):
        # t == 0 streams the tiles; t > 0 pins the index to the last one so
        # the no-op phase steps re-issue no DMA (wo streams exactly once)
        return (
            l_ref[0],
            jnp.where(t > 0, s_wo - 1, jnp.minimum(s, s_wo - 1)),
            0,
        )

    def w13_idx(i, t, s, l_ref):
        sp = jnp.maximum(s - s_wo, 0)
        return (l_ref[0], jnp.minimum(sp, s13 - 1), t)

    def w2_idx(i, t, s, l_ref):
        sp = jnp.maximum(s - s_wo, 0)
        blk = jnp.where(sp < s13, t * m, t * m + (sp - s13))
        return (l_ref[0], jnp.minimum(blk, n_sub - 1), 0)

    def row_spec():
        return pl.BlockSpec(
            (bm, D), lambda i, t, s, l: (i, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(
            _kernel_wo, eps=eps, D=D, HD=HD, G0=group0, G1=group1, G2=group2,
            bk0=bk0, s_wo=s_wo, bk1=bk1, s13=s13, bk2=bk2, m=m, T=T, bh=bh,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(M, bm), T, S),
            in_specs=[
                row_spec(),  # att
                row_spec(),  # x
                pl.BlockSpec((1, bk0, D), wo_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg0, D), wo_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i, t, s, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk2, D), w2_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg2, D), w2_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=row_spec(),
            scratch_shapes=[
                pltpu.VMEM((bm, D), jnp.float32),  # r (post-wo residual)
                pltpu.VMEM((bm, s13 * bk1), jnp.float32),  # xn
                pltpu.VMEM((bm, bh), jnp.float32),  # h1 / swiglu product
                pltpu.VMEM((bm, bh), jnp.float32),  # h3
                pltpu.VMEM((bm, D), jnp.float32),  # out accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * (D + 3 * HD),
            bytes_accessed=D * D + 3 * D * HD
            + (D // group0) * D * 4 + (D // group1) * HD * 8
            + (HD // group2) * D * 4,
            transcendentals=M * HD,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.05 * 2 * (
                (bk0 * D + 2 * bk1 * bh + bk2 * D)
                + 4 * ((bk0 // group0) * D + 2 * (bk1 // group1) * bh
                       + (bk2 // group2) * D)
            ) + 4 * bm * (s13 * bk1 + 2 * bh + 4 * D) + 2 * 1024 * 1024),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), att, x,
      qo, so, rms_w.reshape(1, D), q1, s1, q3, s3, q2, s2)
    return out


def attn_mlp_block_stacked(
    att: jax.Array,
    x: jax.Array,
    wo: QuantTensor,
    rms_w: jax.Array,
    w1: QuantTensor,
    w3: QuantTensor,
    w2: QuantTensor,
    layer,
    eps: float = 1e-5,
    *,
    interpret: bool | None = None,
    m_cap: int | None = None,
) -> jax.Array:
    """``r + swiglu(rmsnorm(r) @ w1[l], ...) @ w2[l]`` with
    ``r = x + att @ wo[l]`` — the whole post-attention half of a decoder
    layer in ONE launch streaming Wo, W1, W3 and W2 exactly once.

    ``att/x (..., D)``; weights layer-stacked 3-D QuantTensors.
    """
    if not attn_mlp_block_supported(wo, w1, w3, w2):
        raise ValueError(
            "attn_mlp_block_stacked: unsupported shapes (use fallback)"
        )
    L, D, HD = w1.q.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    att2 = att.reshape(M, D)
    x2 = x.reshape(M, D)
    if interpret is None:
        interpret = interpret_default()
    bm = 8 if M <= 8 else min(round_up(M, 8), 256)
    Mp = round_up(M, bm)
    if Mp != M:
        att2 = jnp.pad(att2, ((0, Mp - M), (0, 0)))
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _attn_mlp_block_2d(
        att2, x2, wo.q, wo.scale, rms_w, w1.q, w1.scale, w3.q, w3.scale,
        w2.q, w2.scale, layer, float(eps), wo.group_size, w1.group_size,
        w2.group_size, bm, interpret, m_cap,
    )
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, D)


def _pick_bkq(D: int, Dq: int, Gq: int) -> int:
    """K tile for the next-qkv phase: whole groups, Mosaic-legal scale
    block (group count % 8 == 0, or the tile covers all of D), dividing D.
    The full qkv width Dq rides in one tile, so the byte cap is its OWN
    bound (8 MiB double-buffered — NOT _FAST_TILE_BYTES, whose 4 MiB cap
    would reject Llama-7B's (512, 12288) = 6 MiB tile and silently disable
    the whole two-launch layer)."""
    cap = min(D, max(512, Gq))  # whole-D stays reachable when Gq > 512
    bk = (cap // Gq) * Gq
    while bk >= Gq:
        if (
            D % bk == 0
            and ((bk // Gq) % 8 == 0 or bk == D)
            and bk * Dq <= 8 * 1024 * 1024
        ):
            return bk
        bk -= Gq
    return 0


def layer_tail_qkv_supported(wo, w1, w3, w2, wqkv) -> bool:
    """Compiled-mode eligibility for the wo+FFN+next-qkv megakernel."""
    if not attn_mlp_block_supported(wo, w1, w3, w2):
        return False
    if not isinstance(wqkv, QuantTensor) or wqkv.q.ndim != 3:
        return False
    L, D, HD = w1.q.shape
    Lq, Dk, Dq = wqkv.q.shape
    if (Lq, Dk) != (L, D) or Dq % 128 != 0 or D % wqkv.group_size != 0:
        return False
    return _pick_bkq(D, Dq, wqkv.group_size) > 0


def _kernel_wo_qkv(
    l_ref, att_ref, x_ref, wo_ref, so_ref, rwf_ref,
    w1_ref, s1_ref, w3_ref, s3_ref, w2_ref, s2_ref,
    rwa_ref, wq_ref, sq_ref,
    o_ref, qo_ref, r_ref, xn_ref, h1_ref, h3_ref, acc_ref, qacc_ref,
    *, eps: float, D: int, HD: int, Dq: int,
    G0: int, G1: int, G2: int, Gq: int,
    bk0: int, s_wo: int, bk1: int, s13: int, bk2: int, m: int, T: int,
    bh: int, bkq: int, s_q: int,
):
    """:func:`_kernel_wo` extended with a trailing phase that computes the
    NEXT layer's pre-rope QKV projection:

        r    = x + att @ Wo
        out  = r + swiglu(rmsnorm(r, rms_ffn[l]) @ W1, ...) @ W2
        qkv' = rmsnorm(out, rms_att[l+1]) @ Wqkv[l+1]

    One launch per decoder layer streams Wo, W1, W3, W2 AND the next
    layer's Wqkv exactly once — with the glue-fused attention kernel the
    whole decode layer is TWO launches. The qkv phase runs only at the
    last hidden chunk (out must be complete); earlier chunks' trailing
    steps are index-pinned no-ops. The rms arrays arrive layer-STACKED
    ((L, D)) because the kernel needs l's rms_ffn and l+1's rms_att.
    """
    t = pl.program_id(1)
    s = pl.program_id(2)
    sp = s - s_wo
    sq = s - (s_wo + s13 + m)

    @pl.when((t == 0) & (s == 0))
    def _():
        r_ref[:] = x_ref[:].astype(jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((t == 0) & (s < s_wo))
    def _():
        ak = att_ref[:, pl.dslice(s * bk0, bk0)].astype(jnp.float32)
        r_ref[:] = _accum_fast(ak, wo_ref[0], so_ref[0], r_ref[:], G0)

    @pl.when((t == 0) & (s == s_wo))
    def _():
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

    @pl.when((t == T - 1) & (sq == 0))
    def _():
        # out is complete: emit it, norm it for the next layer's qkv (xn is
        # free — the w13 phase is done for every chunk), zero the qkv acc
        out = acc_ref[:] + r_ref[:]
        o_ref[:] = out.astype(o_ref.dtype)
        ms = jnp.mean(out * out, axis=-1, keepdims=True)
        xq = out * jax.lax.rsqrt(ms + eps) * rwa_ref[0].astype(jnp.float32)
        Kp1 = s13 * bk1
        if Kp1 == D:
            xn_ref[:] = xq
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (xq.shape[0], Kp1), 1)
            xn_ref[:] = jnp.where(
                col < D, jnp.pad(xq, ((0, 0), (0, Kp1 - D))), 0.0
            )
        qacc_ref[:] = jnp.zeros_like(qacc_ref)

    @pl.when((t == T - 1) & (sq >= 0))
    def _():
        xk = xn_ref[:, pl.dslice(sq * bkq, bkq)]
        qacc_ref[:] = _accum_fast(xk, wq_ref[0], sq_ref[0], qacc_ref[:], Gq)

    @pl.when((t == T - 1) & (sq == s_q - 1))
    def _():
        qo_ref[:] = qacc_ref[:].astype(qo_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "group0", "group1", "group2", "groupq", "bm", "interpret",
        "m_cap",
    ),
    inline=True,
)
def _layer_tail_qkv_2d(
    att, x, qo_, so_, rms_ffn, q1, s1, q3, s3, q2, s2,
    rms_att, qq, sq_, layer,
    eps: float, group0: int, group1: int, group2: int, groupq: int,
    bm: int, interpret: bool, m_cap: int | None,
):
    M, D = x.shape
    L, _, HD = q1.shape
    Dq = qq.shape[2]
    bk0 = _pick_bk(D, group0, 512)
    s_wo = D // bk0
    bk1, s13, bk2, m, T, bh = _plan(D, HD, group1, group2)
    if m_cap is not None:  # test hook: force chunking on small shapes
        T = cdiv(cdiv(HD, bk2), m_cap)
        m = cdiv(cdiv(HD, bk2), T)
        bh = m * bk2
    bkq = _pick_bkq(D, Dq, groupq)
    s_q = D // bkq
    S = s_wo + s13 + m + s_q
    sg0, sg1, sg2 = bk0 // group0, bk1 // group1, bk2 // group2
    sgq = bkq // groupq
    n_sub = cdiv(HD, bk2)
    q_base = s_wo + s13 + m

    def wo_idx(i, t, s, l_ref):
        return (
            l_ref[0],
            jnp.where(t > 0, s_wo - 1, jnp.minimum(s, s_wo - 1)),
            0,
        )

    def w13_idx(i, t, s, l_ref):
        sp = jnp.clip(s - s_wo, 0, s13 - 1)
        return (l_ref[0], sp, t)

    def w2_idx(i, t, s, l_ref):
        sp = jnp.clip(s - s_wo, 0, s13 + m - 1)
        blk = jnp.where(sp < s13, t * m, t * m + (sp - s13))
        return (l_ref[0], jnp.minimum(blk, n_sub - 1), 0)

    def lq(l_ref):
        return jnp.minimum(l_ref[0] + 1, L - 1)

    def wq_idx(i, t, s, l_ref):
        # stream only during the last chunk's qkv phase; pinned elsewhere
        sq = jnp.where(t == T - 1, jnp.clip(s - q_base, 0, s_q - 1), 0)
        return (lq(l_ref), sq, 0)

    def row_spec(width):
        return pl.BlockSpec(
            (bm, width), lambda i, t, s, l: (i, 0), memory_space=pltpu.VMEM
        )

    out, qkv_next = pl.pallas_call(
        functools.partial(
            _kernel_wo_qkv, eps=eps, D=D, HD=HD, Dq=Dq,
            G0=group0, G1=group1, G2=group2, Gq=groupq,
            bk0=bk0, s_wo=s_wo, bk1=bk1, s13=s13, bk2=bk2, m=m, T=T, bh=bh,
            bkq=bkq, s_q=s_q,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(M, bm), T, S),
            in_specs=[
                row_spec(D),  # att
                row_spec(D),  # x
                pl.BlockSpec((1, bk0, D), wo_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg0, D), wo_idx, memory_space=pltpu.VMEM),
                # rms arrays ride (L, 1, D): a (1, D) block of an (L, D)
                # array has sublane dim 1 (< 8, not whole-L) — Mosaic-illegal
                pl.BlockSpec((1, 1, D), lambda i, t, s, l: (l[0], 0, 0),
                             memory_space=pltpu.VMEM),  # rms_ffn[l]
                pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg1, bh), w13_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk2, D), w2_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sg2, D), w2_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda i, t, s, l: (
                    jnp.minimum(l[0] + 1, q1.shape[0] - 1), 0, 0
                ), memory_space=pltpu.VMEM),  # rms_att[l+1]
                pl.BlockSpec((1, bkq, Dq), wq_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sgq, Dq), wq_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=[row_spec(D), row_spec(Dq)],
            scratch_shapes=[
                pltpu.VMEM((bm, D), jnp.float32),  # r
                pltpu.VMEM((bm, s13 * bk1), jnp.float32),  # xn (norm rows)
                pltpu.VMEM((bm, bh), jnp.float32),  # h1 / swiglu product
                pltpu.VMEM((bm, bh), jnp.float32),  # h3
                pltpu.VMEM((bm, D), jnp.float32),  # out accumulator
                pltpu.VMEM((bm, Dq), jnp.float32),  # qkv accumulator
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((M, D), x.dtype),
            jax.ShapeDtypeStruct((M, Dq), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * (D + 3 * HD + Dq),
            bytes_accessed=D * D + 3 * D * HD + D * Dq
            + (D // group0) * D * 4 + (D // group1) * HD * 8
            + (HD // group2) * D * 4 + (D // groupq) * Dq * 4,
            transcendentals=M * HD,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.05 * 2 * (
                (bk0 * D + 2 * bk1 * bh + bk2 * D + bkq * Dq)
                + 4 * ((bk0 // group0) * D + 2 * (bk1 // group1) * bh
                       + (bk2 // group2) * D + sgq * Dq)
            ) + 4 * bm * (s13 * bk1 + 2 * bh + 4 * D + 2 * Dq)
                + 2 * 1024 * 1024),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), att, x,
      qo_, so_, rms_ffn.reshape(-1, 1, D), q1, s1, q3, s3, q2, s2,
      rms_att.reshape(-1, 1, D), qq, sq_)
    return out, qkv_next


def layer_tail_qkv_stacked(
    att: jax.Array,
    x: jax.Array,
    wo: QuantTensor,
    rms_ffn: jax.Array,  # (L, D) — the kernel indexes layer l itself
    w1: QuantTensor,
    w3: QuantTensor,
    w2: QuantTensor,
    rms_att: jax.Array,  # (L, D) — indexed at l+1 (clamped)
    wqkv: QuantTensor,
    layer,
    eps: float = 1e-5,
    *,
    interpret: bool | None = None,
    m_cap: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Whole post-attention half of decoder layer ``l`` PLUS the next
    layer's pre-rope QKV projection, in one launch:

        r    = x + att @ wo[l]
        out  = r + swiglu(rmsnorm(r, rms_ffn[l]) @ w1[l], ...) @ w2[l]
        qkv' = rmsnorm(out, rms_att[l+1]) @ wqkv[l+1]

    Returns ``(out (..., D), qkv' (..., Dq))``. The caller threads qkv'
    through the layer scan's carry; the last layer's qkv' is discarded
    (the index clamps to L-1 — wasted stream traffic for one layer's Wqkv
    per step, bought against one fewer launch for EVERY layer).
    """
    if not layer_tail_qkv_supported(wo, w1, w3, w2, wqkv):
        raise ValueError(
            "layer_tail_qkv_stacked: unsupported shapes (use fallback)"
        )
    L, D, HD = w1.q.shape
    Dq = wqkv.q.shape[2]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    att2 = att.reshape(M, D)
    x2 = x.reshape(M, D)
    if interpret is None:
        interpret = interpret_default()
    bm = 8 if M <= 8 else min(round_up(M, 8), 256)
    Mp = round_up(M, bm)
    if Mp != M:
        att2 = jnp.pad(att2, ((0, Mp - M), (0, 0)))
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out, qn = _layer_tail_qkv_2d(
        att2, x2, wo.q, wo.scale, rms_ffn, w1.q, w1.scale, w3.q, w3.scale,
        w2.q, w2.scale, rms_att, wqkv.q, wqkv.scale, layer,
        float(eps), wo.group_size, w1.group_size, w2.group_size,
        wqkv.group_size, bm, interpret, m_cap,
    )
    if Mp != M:
        out, qn = out[:M], qn[:M]
    return out.reshape(*lead, D), qn.reshape(*lead, Dq)


def mlp_block_stacked(
    x: jax.Array,
    rms_w: jax.Array,
    w1: QuantTensor,
    w3: QuantTensor,
    w2: QuantTensor,
    layer,
    eps: float = 1e-5,
    *,
    interpret: bool | None = None,
    m_cap: int | None = None,
    residual: bool = True,
) -> jax.Array:
    """``x + swiglu(rmsnorm(x, rms_w) @ w1[layer], ... @ w3[layer]) @ w2[layer]``.

    One kernel launch for the whole FFN block; see module docstring.
    ``x (..., D)``; weights layer-stacked 3-D QuantTensors.

    ``residual=False`` emits the bare FFN output (no ``x +``): the
    tensor-parallel caller holds hidden-sharded w1/w3/w2 shards whose w2
    outputs are partial sums — it psums across the model axis and adds the
    residual itself (models/llama.py::_post_attention).
    """
    if not mlp_block_supported(w1, w3, w2):
        raise ValueError("mlp_block_stacked: unsupported shapes (use fallback)")
    L, D, HD = w1.q.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, D)
    if interpret is None:
        interpret = interpret_default()
    bm = 8 if M <= 8 else min(round_up(M, 8), 256)
    Mp = round_up(M, bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _mlp_block_2d(
        x2, rms_w, w1.q, w1.scale, w3.q, w3.scale, w2.q, w2.scale,
        layer, float(eps), w1.group_size, w2.group_size, bm, interpret, m_cap,
        residual,
    )
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, D)
