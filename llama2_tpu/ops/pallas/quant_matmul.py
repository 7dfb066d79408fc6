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


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group_size: int, k_steps: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dequant: broadcast each group's scale over its group_size rows
    w = w_ref[:].astype(jnp.float32)  # (bk, bn) int8 -> f32
    scale = s_ref[:]  # (bk // G, bn)
    # jnp.repeat = element-wise repeat (each group's scale over its G rows);
    # NOT pltpu.repeat, which tiles the whole array.
    wf = w * jnp.repeat(scale, group_size, axis=0)
    # HIGHEST: Mosaic otherwise lowers f32xf32 as one bf16 MXU pass (~2e-3
    # rel err, on top of the Q8 noise). The extra passes are free at decode:
    # the kernel is HBM-bandwidth-bound.
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.float32),
        wf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(k == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "block_k", "interpret"),
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
) -> jax.Array:
    M, K = x.shape
    _, N = q.shape
    k_steps = cdiv(K, block_k)
    grid = (cdiv(M, block_m), cdiv(N, block_n), k_steps)
    sg = block_k // group_size

    out = pl.pallas_call(
        functools.partial(_kernel, group_size=group_size, k_steps=k_steps),
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
        interpret=interpret,
    )(x, q, scale)
    return out


def quant_matmul(
    x: jax.Array,
    w: QuantTensor,
    *,
    block_m: int | None = None,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """``x (..., K) @ w`` with fused dequantization. Returns (..., N)."""
    if w.q.ndim != 2:
        raise ValueError("quant_matmul expects a 2D QuantTensor (use under scan)")
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
    bk = min(block_k, K)
    # whole quant groups per K tile, lane-aligned
    bk = max(G, (bk // G) * G)
    while K % bk != 0:  # shrink to a divisor of K (K is a multiple of G)
        bk -= G
    bn = min(block_n, N)
    while N % bn != 0:
        bn //= 2
    bn = max(bn, 128 if N % 128 == 0 else N)

    Mp = round_up(M, bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _quant_matmul_2d(x2, w.q, w.scale, G, bm, bn, bk, interpret)
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, N)
