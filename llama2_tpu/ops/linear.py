"""Matmul dispatch: fp dot / fused dequant-dot, XLA or Pallas backend.

Every weight-applying matmul in the model routes through :func:`linear` so
the INT8 path and the Pallas kernels are drop-in: a ``QuantTensor`` weight
dequantizes adjacent to the dot (XLA fuses the multiply into the matmul
prologue) or hits the fused Pallas dequant-matmul kernel with
``backend="pallas"``.

``backend`` is an explicit (trace-time static) argument, NOT mutable global
state: the model's jitted entry points cache compiled executables, so a
global flag flip would silently keep running the previously compiled path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama2_tpu.quant.q8 import QuantTensor, dequantize

BACKENDS = ("xla", "pallas")


def linear(
    x: jax.Array,
    w,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
) -> jax.Array:
    """``x (..., in) @ w (in, out)``; ``w`` may be fp Array or QuantTensor."""
    if isinstance(w, QuantTensor):
        if backend == "pallas":
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul

            return quant_matmul(x, w)
        return jnp.dot(x, dequantize(w, x.dtype), precision=precision)
    return jnp.dot(x, w, precision=precision)
