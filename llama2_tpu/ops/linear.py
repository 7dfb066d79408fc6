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

BACKENDS = ("xla", "pallas", "pallas-accurate")


def _quant_mode(backend: str) -> str:
    """``pallas`` → the fast per-group-bf16 kernels (production path);
    ``pallas-accurate`` → f32-dequant HIGHEST-precision kernels, argmax
    token-exact vs the fp32 dequant oracle (exactness-sensitive runs and
    parity tests; ~3x slower on the weight stream — see quant_matmul.py)."""
    return "accurate" if backend == "pallas-accurate" else "fast"


def linear(
    x: jax.Array,
    w,
    precision=jax.lax.Precision.HIGHEST,
    backend: str = "xla",
    layer=None,
) -> jax.Array:
    """``x (..., in) @ w (in, out)``; ``w`` may be fp Array or QuantTensor.

    ``layer``: when ``w`` is a layer-STACKED (3D) QuantTensor, selects the
    layer inside the kernel — the layer scan passes the whole stack plus its
    index so the pallas kernel DMAs tiles straight from HBM instead of
    forcing XLA to materialize a sliced copy per trip (measured ~2x
    end-to-end on a 22-layer INT8 model).
    """
    if isinstance(w, QuantTensor):
        if w.q.ndim == 3 and layer is not None:
            if backend.startswith("pallas"):
                from llama2_tpu.ops.pallas.quant_matmul import quant_matmul_stacked

                return quant_matmul_stacked(x, w, layer, mode=_quant_mode(backend))
            wl = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, False), w
            )
            return jnp.dot(x, dequantize(wl, x.dtype), precision=precision)
        if backend.startswith("pallas"):
            from llama2_tpu.ops.pallas.quant_matmul import quant_matmul

            return quant_matmul(x, w, mode=_quant_mode(backend))
        return jnp.dot(x, dequantize(w, x.dtype), precision=precision)
    return jnp.dot(x, w, precision=precision)
