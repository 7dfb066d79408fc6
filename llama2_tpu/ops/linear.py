"""Matmul dispatch: fp dot / fused dequant-dot, XLA or Pallas backend.

Every weight-applying matmul in the model routes through :func:`linear` so
the INT8 path and the Pallas kernels are drop-in: a ``QuantTensor`` weight
dequantizes adjacent to the dot (XLA fuses the multiply into the matmul
prologue) or hits the fused Pallas dequant-matmul kernel when enabled via
:func:`set_backend` ("pallas").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama2_tpu.quant.q8 import QuantTensor, dequantize

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown linear backend {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def linear(x: jax.Array, w, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """``x (..., in) @ w (in, out)``; ``w`` may be fp Array or QuantTensor."""
    if isinstance(w, QuantTensor):
        if _BACKEND == "pallas" and x.ndim >= 2:
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul

            return quant_matmul(x, w)
        return jnp.dot(x, dequantize(w, x.dtype), precision=precision)
    return jnp.dot(x, w, precision=precision)
