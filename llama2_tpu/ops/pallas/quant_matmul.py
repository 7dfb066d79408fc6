"""Fused INT8 dequant + matmul Pallas kernel — the north-star hot kernel.

``y (M, N) = x (M, K) @ dequant(Wq (K, N) int8, scale (K/G, N) f32)``

The TPU-native analog of the reference's ``matmul_fused`` (main.zig:530-605,
"~90% of total runtime"): where the reference fuses N weight matrices over one
read of ``x``, this kernel fuses the dequantize into the weight stream so the
int8 weights cross HBM→VMEM at 1 byte/element (4x less traffic than f32 — the
matvec is bandwidth-bound at decode, so this is the speed-of-light lever; see
BASELINE.md roofline target).

Layout: grid ``(M/bm, N/bn, K/bk)`` with K innermost; an f32 VMEM scratch
accumulates across K steps (init at k==0, emit at k==K-1), so the output tile
is written once. Pallas double-buffers the HBM→VMEM streams of x, Wq and
scale automatically from the BlockSpecs. Dequant runs on the VPU
(``int8 → f32 * scale``) and feeds the MXU dot. ``bk`` must be a multiple of
the quant group size so each K-tile sees whole groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import cdiv, interpret_default, round_up
from llama2_tpu.quant.q8 import QuantTensor


def _accum_accurate(x, w, s, acc, group_size: int):
    """f32 dequant on the VPU, HIGHEST-precision f32 dot.

    ``jnp.repeat`` = element-wise repeat (each group's scale over its G
    rows); NOT ``pltpu.repeat``, which tiles the whole array. HIGHEST:
    Mosaic otherwise lowers f32xf32 as one bf16 MXU pass.
    """
    wf = w.astype(jnp.float32) * jnp.repeat(s, group_size, axis=0)
    return acc + jax.lax.dot_general(
        x.astype(jnp.float32),
        wf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _accum_fast(x, w, s, acc, group_size: int):
    """Per-group bf16 MXU dots, f32 scales applied to the partials.

    The accurate variant is VPU-bound: int8→f32 convert + scale-repeat +
    elementwise dequant touch every weight element on the VPU before the MXU
    sees it (~32% of HBM roofline measured on v5e). Here int8→bf16 (EXACT —
    bf16's 8-bit mantissa covers [-127, 127]) is the only elementwise pass,
    and the per-(group, column) scale moves OUT of the contraction: for each
    quant group g, partial = x_g @ w_g on the MXU, then acc += partial *
    scale[g]. Measured 87-94% of HBM roofline on v5e.

    Numerics: x rounds to bf16, products accumulate in f32 → mean ~2e-3
    relative error, under the Q8 quantization noise itself and finer than
    llama2.c runq (which quantizes activations to int8, ~2x coarser).
    """
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    G = group_size
    for g in range(w.shape[0] // G):
        part = jax.lax.dot_general(
            xb[:, g * G : (g + 1) * G],
            wb[g * G : (g + 1) * G, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + part * s[g, :][None, :]
    return acc


def _make_kernel(accum, stacked: bool, norm: bool = False, resid: bool = False):
    """Build the pallas kernel; ``stacked`` variants take a scalar-prefetch
    layer index first and see weight/scale blocks with a leading unit dim.

    ``norm``: fuse an rmsnorm prologue — x arrives as ONE whole-K block plus
    an rms weight vector; the normed activation is computed once per row
    block into VMEM scratch and K-tiles are sliced from there (kills the
    separate XLA rmsnorm dispatch before every launch-bound decode matmul).
    ``resid``: fuse a residual add — an extra (bm, bn) input is added at the
    emit step (the ``x + att @ wo`` pattern without a separate XLA add).
    """

    def kernel(
        *refs, group_size: int, k_steps: int, groups_total=None,
        block_k: int = 0, eps: float = 1e-5, k_real: int = 0,
    ):
        refs = list(refs)
        if stacked:
            refs.pop(0)
        x_ref = refs.pop(0)
        w_ref = refs.pop(0)
        s_ref = refs.pop(0)
        rw_ref = refs.pop(0) if norm else None
        res_ref = refs.pop(0) if resid else None
        o_ref = refs.pop(0)
        xn_ref = refs.pop(0) if norm else None
        acc_ref = refs.pop(0)
        if stacked:
            w, s = w_ref[0], s_ref[0]
        else:
            w, s = w_ref[:], s_ref[:]
        j = pl.program_id(1)
        k = pl.program_id(2)

        if norm:
            @pl.when((j == 0) & (k == 0))
            def _():
                # eps after the mean, f32 (ops.xla.rmsnorm semantics)
                xf = x_ref[:].astype(jnp.float32)
                ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
                xn = xf * jax.lax.rsqrt(ms + eps) * rw_ref[:].astype(
                    jnp.float32
                )
                Kp = k_steps * block_k
                if Kp == k_real:
                    xn_ref[:] = xn
                else:
                    # zero the ragged tail (garbage would NaN the masked dot)
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (xn.shape[0], Kp), 1
                    )
                    xn_ref[:] = jnp.where(
                        col < k_real,
                        jnp.pad(xn, ((0, 0), (0, Kp - k_real))), 0.0,
                    )

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if groups_total is not None:
            # ragged K tiling: the last K tile reads past the array — weights
            # are int8 (any bits decode finite) and x is zero-padded by the
            # wrapper, but OOB SCALES can be arbitrary f32 bits (NaN), so
            # SELECT them to zero (a where never propagates the garbage)
            sg = s.shape[0]
            gid = k * sg + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(gid < groups_total, s, 0.0)
        xk = (
            xn_ref[:, pl.dslice(k * block_k, block_k)] if norm else x_ref[:]
        )
        acc_ref[:] = accum(xk, w, s, acc_ref[:], group_size)

        @pl.when(k == k_steps - 1)
        def _():
            out = acc_ref[:]
            if resid:
                out = out + res_ref[:].astype(jnp.float32)
            o_ref[:] = out.astype(o_ref.dtype)

    return kernel


_kernel = _make_kernel(_accum_accurate, stacked=False)
_kernel_fast = _make_kernel(_accum_fast, stacked=False)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "block_m", "block_n", "block_k", "interpret", "mode"
    ),
    inline=True,
)
def _quant_matmul_2d(
    x: jax.Array,
    q: jax.Array,
    scale: jax.Array,
    group_size: int,
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: bool,
    mode: str,
) -> jax.Array:
    M, K = x.shape
    Kq, N = q.shape
    k_steps = cdiv(Kq, block_k)
    grid = (cdiv(M, block_m), cdiv(N, block_n), k_steps)
    sg = block_k // group_size
    kern = _kernel_fast if mode == "fast" else _kernel
    groups_total = Kq // group_size if Kq % block_k else None

    out = pl.pallas_call(
        functools.partial(
            kern, group_size=group_size, k_steps=k_steps,
            groups_total=groups_total,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, block_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + (K // group_size) * N * 4 + M * N * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                block_m, block_k, block_n, sg, k_steps, False, False, block_k
            ),
        ),
        interpret=interpret,
    )(x, q, scale)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "block_m", "block_n", "block_k", "interpret", "mode",
        "eps",
    ),
    inline=True,
)
def _quant_matmul_stacked_2d(
    x: jax.Array,
    q3: jax.Array,  # (L, K, N) int8
    s3: jax.Array,  # (L, K/G, N) f32
    layer: jax.Array,  # () int32
    group_size: int,
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: bool,
    mode: str,
    rms_w: jax.Array | None = None,  # (1, K): fuse rmsnorm(x) prologue
    res: jax.Array | None = None,  # (M, N): fuse +residual epilogue
    eps: float = 1e-5,
) -> jax.Array:
    """Layer-indexed fused dequant-matmul over layer-STACKED weights.

    Inside a layer scan, feeding a dynamically-sliced weight to a pallas_call
    forces XLA to materialize the slice (pallas inputs cannot alias a slice)
    — a full extra read+write of every weight each token, measured ~2x
    slower end-to-end on a 22-layer INT8 model. Here the kernel receives the
    whole stacked array in HBM and the layer index rides the scalar-prefetch
    channel into the BlockSpec index_map, so tiles DMA straight from the
    stacked weights with no copy.

    Optional launch-count fusions (see _make_kernel): ``rms_w`` pulls the
    rmsnorm prologue into the kernel (x then arrives whole-K, normed once
    into scratch); ``res`` adds a residual at the emit step.
    """
    M, K = x.shape
    L, Kq, N = q3.shape
    norm, resid = rms_w is not None, res is not None
    k_steps = cdiv(Kq, block_k)
    grid = (cdiv(M, block_m), cdiv(N, block_n), k_steps)
    sg = block_k // group_size
    accum = _accum_fast if mode == "fast" else _accum_accurate
    kern = _make_kernel(accum, stacked=True, norm=norm, resid=resid)
    groups_total = Kq // group_size if Kq % block_k else None

    in_specs = [
        pl.BlockSpec(
            (block_m, K) if norm else (block_m, block_k),
            (lambda i, j, k, l_ref: (i, 0))
            if norm else (lambda i, j, k, l_ref: (i, k)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, block_k, block_n),
            lambda i, j, k, l_ref: (l_ref[0], k, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, sg, block_n),
            lambda i, j, k, l_ref: (l_ref[0], k, j),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [x, q3, s3]
    if norm:
        in_specs.append(
            pl.BlockSpec((1, K), lambda i, j, k, l_ref: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(rms_w)
    if resid:
        in_specs.append(
            pl.BlockSpec((block_m, block_n), lambda i, j, k, l_ref: (i, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(res)
    scratch = []
    if norm:
        scratch.append(pltpu.VMEM((block_m, k_steps * block_k), jnp.float32))
    scratch.append(pltpu.VMEM((block_m, block_n), jnp.float32))

    out = pl.pallas_call(
        functools.partial(
            kern, group_size=group_size, k_steps=k_steps,
            groups_total=groups_total, block_k=block_k, eps=eps, k_real=K,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (block_m, block_n),
                lambda i, j, k, l_ref: (i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N
            + (K // group_size) * N * 4 + M * N * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                block_m, block_k, block_n, sg, k_steps, norm, resid,
                K if norm else block_k
            ),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    return out


def quant_matmul_stacked(
    x: jax.Array,
    w: QuantTensor,  # 3D: q (L, K, N)
    layer,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
    mode: str = "fast",
    rms_w: jax.Array | None = None,
    eps: float = 1e-5,
    residual: jax.Array | None = None,
) -> jax.Array:
    """``x (..., K) @ w[layer]`` with no weight-slice copy (see the 2d fn).

    ``rms_w``: compute ``rmsnorm(x, rms_w, eps) @ w[layer]`` with the norm
    fused into the kernel (one launch for the decode rmsnorm+matmul pair);
    falls back to an XLA-side norm when K isn't 128-lane aligned.
    ``residual (..., N)``: fused ``+ residual`` at the emit step.
    """
    if w.q.ndim != 3:
        raise ValueError("quant_matmul_stacked expects a layer-stacked (3D) QuantTensor")
    if mode not in ("fast", "accurate"):
        raise ValueError(f"unknown mode {mode!r}")
    L, K, N = w.q.shape
    G = w.group_size
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    if interpret is None:
        interpret = interpret_default()

    if rms_w is not None and K % 128 != 0:
        # whole-K x block needs 128-aligned lanes; norm outside instead
        from llama2_tpu.ops import xla as _ops

        x2 = _ops.rmsnorm(x2, rms_w, eps)
        rms_w = None

    bm = block_m or (8 if M <= 8 else min(round_up(M, 8), 256))
    bk = _pick_bk(K, G, block_k)
    bn = _pick_bn(N, bk, block_n)

    res2 = None if residual is None else residual.reshape(M, N)
    Mp = round_up(M, bm)
    Kp = round_up(K, bk)  # ragged K tile: zero-pad x so OOB partials vanish
    if rms_w is not None:
        # the kernel's norm scratch handles the ragged tail; pad rows only
        if Mp != M:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    elif Mp != M or Kp != K:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    if res2 is not None and Mp != M:
        res2 = jnp.pad(res2, ((0, Mp - M), (0, 0)))
    out = _quant_matmul_stacked_2d(
        x2, w.q, w.scale, layer, G, bm, bn, bk, interpret, mode,
        rms_w=None if rms_w is None else rms_w.reshape(1, K),
        res=res2, eps=float(eps),
    )
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, N)


def _pick_bk(K: int, G: int, block_k: int) -> int:
    """Largest legal K tile: whole quant groups, and the scale block passes
    Mosaic's layout rule — its second-to-last dim (bk // G) must be a
    multiple of 8 OR the tile must cover all of K (block == whole array
    dim). Prefers a tile that divides K; when none exists (e.g. Llama-7B's
    hidden_dim 11008 with G=64 admits no 512-multiple divisor) it returns a
    RAGGED tile — the grid ceil-divides, the wrapper zero-pads x, and the
    kernel masks the out-of-range groups. One whole-K tile would be legal
    but serializes K/G tiny group-dots per grid step (measured 12%% of HBM
    roofline on the 7B w2)."""
    cap = min(block_k, K)
    bk = (cap // G) * G
    while bk >= G:
        if K % bk == 0 and (bk // G) % 8 == 0:
            return bk
        bk -= G
    # ragged only when the whole-K tile would serialize MANY group dots —
    # for short contractions (e.g. stories15M's 768/G=12 groups) whole-K is
    # faster than the ceil-grid's extra x padding and grid steps
    ragged = (cap // (8 * G)) * 8 * G
    if ragged >= 8 * G and K > ragged and K // G > 32:
        return ragged
    return K




def _vmem_limit(bm, bk, bn, sg, k_steps, norm, resid, xk_cols):
    """Scoped-VMEM request covering the double-buffered streams + scratch.

    The default 16 MB scoped budget fits decode rows (bm <= 8) everywhere,
    but a PREFILL chunk (bm = 128) against a wide fused projection (e.g.
    Llama-7B wqkv, N = 12288) wants ~24 MB — first hit by serving.py's
    warmup at 7B (compile-time "Ran out of memory in memory space vmem").
    """
    two_buf = 2 * (bm * xk_cols * 4 + bk * bn + sg * bn * 4 + bm * bn * 4)
    if resid:
        two_buf += 2 * bm * bn * 4
    scratch = bm * bn * 4 + (bm * k_steps * bk * 4 if norm else 0)
    # 1.2x + 4 MiB: the compiler's own accounting adds tile padding and
    # temporaries beyond the raw buffer arithmetic (measured ~15% over at
    # the 128 x 32000 classifier shape)
    return int(1.2 * (two_buf + scratch) + 4 * 1024 * 1024)

_FAST_TILE_BYTES = 4 * 1024 * 1024  # bn*bk int8 tile cap (x2 double-buffered)


def _pick_bn(N: int, bk: int, block_n: int | None) -> int:
    """Largest 128-multiple divisor of N whose (bn, bk) int8 tile fits.

    Bandwidth on v5e rises with tile size until the double-buffered weight
    DMA saturates HBM (measured: 256-col tiles 38%, ~5500-col tiles 87% of
    roofline), so prefer the biggest legal tile, not a fixed 512.
    """
    if block_n is not None:
        bn = min(block_n, N)
        while N % bn != 0:
            bn //= 2
        return max(bn, 128 if N % 128 == 0 else N)
    if N % 128 != 0:
        return N  # whole-array block (Mosaic requires 128 lanes or whole dim)
    cap = max(_FAST_TILE_BYTES // bk, 128)
    best = 128
    for bn in range(128, min(N, cap) + 1, 128):
        if N % bn == 0:
            best = bn
    return best


def quant_matmul(
    x: jax.Array,
    w: QuantTensor,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
    mode: str = "fast",
) -> jax.Array:
    """``x (..., K) @ w`` with fused dequantization. Returns (..., N).

    ``mode="fast"`` (default): per-group bf16 MXU dots, ~87% of HBM roofline,
    bf16-level activation rounding (see ``_kernel_fast``). ``mode="accurate"``:
    f32 dequant + HIGHEST-precision dot, bit-faithful to the XLA dequant
    oracle, ~32% of roofline — for parity tests and debugging.
    """
    if w.q.ndim != 2:
        raise ValueError("quant_matmul expects a 2D QuantTensor (use under scan)")
    if mode not in ("fast", "accurate"):
        raise ValueError(f"unknown mode {mode!r}")
    K, N = w.q.shape
    G = w.group_size
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)

    if interpret is None:
        interpret = interpret_default()

    bm = block_m or (8 if M <= 8 else min(round_up(M, 8), 256))
    bk = _pick_bk(K, G, block_k)
    bn = _pick_bn(N, bk, block_n)

    Mp = round_up(M, bm)
    Kp = round_up(K, bk)  # ragged K tile: zero-pad x so OOB partials vanish
    if Mp != M or Kp != K:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    out = _quant_matmul_2d(x2, w.q, w.scale, G, bm, bn, bk, interpret, mode)
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, N)
