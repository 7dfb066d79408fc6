"""Fused SwiGLU gate Pallas kernel: ``silu(h1) * h3`` in one VMEM pass.

Analog of the reference's scalar SiLU loop + ``vector_mul``
(main.zig:411-416), fused so ``h1`` is read once: sigmoid, multiply, gate.
XLA usually fuses this too; the kernel exists for the kernels=pallas path and
as the roofline microbench subject (our benchmarks/ analog of
benchmarks/softmax.zig).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama2_tpu.ops.pallas.common import cdiv, interpret_default, round_up


def _kernel(h1_ref, h3_ref, o_ref):
    h1 = h1_ref[:].astype(jnp.float32)
    o_ref[:] = (h1 * jax.nn.sigmoid(h1)).astype(o_ref.dtype) * h3_ref[:]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"), inline=True)
def _swiglu_2d(h1, h3, block_rows: int, interpret: bool):
    R, D = h1.shape
    return pl.pallas_call(
        _kernel,
        grid=(cdiv(R, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), h1.dtype),
        interpret=interpret,
    )(h1, h3)


def swiglu(
    h1: jax.Array,
    h3: jax.Array,
    *,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused ``silu(h1) * h3``; same contract as ops.xla.swiglu."""
    if interpret is None:
        interpret = interpret_default()
    lead = h1.shape[:-1]
    D = h1.shape[-1]
    R = 1
    for d in lead:
        R *= d
    a, b = h1.reshape(R, D), h3.reshape(R, D)
    br = min(block_rows, round_up(R, 8))
    Rp = round_up(R, br)
    if Rp != R:
        a = jnp.pad(a, ((0, Rp - R), (0, 0)))
        b = jnp.pad(b, ((0, Rp - R), (0, 0)))
    out = _swiglu_2d(a, b, br, interpret)
    if Rp != R:
        out = out[:R]
    return out.reshape(*lead, D)
