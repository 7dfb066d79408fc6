"""Fused RMS-norm Pallas kernel.

Analog of the reference's SIMD ``rmsnorm`` (main.zig:432-468): one pass
computes the sum of squares, ``1/sqrt(mean + 1e-5)`` (eps *after* the mean),
and the scale-by-weight — fused so the row is read once from VMEM. Rows
(tokens) tile over the grid; the feature dim stays whole per program (model
dims up to ~8k fit VMEM trivially).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import cdiv, interpret_default, round_up


def _kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(ms + eps)
    o_ref[:] = (x * inv).astype(o_ref.dtype) * w_ref[:]


@functools.partial(jax.jit, static_argnames=("block_rows", "eps", "interpret"), inline=True)
def _rmsnorm_2d(x, w, block_rows: int, eps: float, interpret: bool):
    R, D = x.shape
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(cdiv(R, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        interpret=interpret,
    )(x, w)
    return out


def rmsnorm(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-5,
    *,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused rmsnorm over the last axis; same contract as ops.xla.rmsnorm."""
    if interpret is None:
        interpret = interpret_default()
    lead = x.shape[:-1]
    D = x.shape[-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, D)
    br = min(block_rows, round_up(R, 8))
    Rp = round_up(R, br)
    if Rp != R:
        x2 = jnp.pad(x2, ((0, Rp - R), (0, 0)))
    out = _rmsnorm_2d(x2, weight.reshape(1, D), br, eps, interpret)
    if Rp != R:
        out = out[:R]
    return out.reshape(*lead, D)
