"""Weight-only group-quantized INT8 (Q8_0) — the llama2.c ``runq`` lineage.

Quantization scheme (capability extension required by the north star; the
reference itself is fp32-only, SURVEY.md section 5 footnote): symmetric int8
with one fp32 scale per group of ``group_size`` consecutive elements along the
**contraction (in-features) axis**, ``scale = max|x| / 127``, no zero point.
Stored as a :class:`QuantTensor` pytree leaf so quantized params flow through
jit/donation/sharding like any array.

The matmul contract: ``x (.., in) @ W -> (.., out)`` where W dequantizes to
``q.reshape(in/G, G, out) * scale[:, None, :]``. On the XLA path the dequant
is written adjacent to the dot so the compiler fuses it; the Pallas fused
dequant-matmul kernel (ops/pallas/quant_matmul.py) streams int8 from HBM and
dequantizes in VMEM — the speed-of-light path (~4x less HBM traffic than f32).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_GROUP_SIZE = 64  # llama2.c runq default


@partial(jax.tree_util.register_dataclass, data_fields=["q", "scale"], meta_fields=["group_size"])
@dataclasses.dataclass
class QuantTensor:
    """int8 values + per-group fp32 scales; groups along the in-features axis.

    ``q``: int8, shape (..., in, out) — same shape as the fp original.
    ``scale``: f32, shape (..., in/G, out).
    """

    q: jax.Array
    scale: jax.Array
    group_size: int

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # dtype quantized tensors *dequantize* to
        return self.scale.dtype


def quantize(w, group_size: int = DEFAULT_GROUP_SIZE, scale_dtype=jnp.float32) -> QuantTensor:
    """Group-quantize along axis -2 (in-features). Shape (..., in, out)."""
    w = np.asarray(w, dtype=np.float32)
    *lead, n_in, n_out = w.shape
    if n_in % group_size != 0:
        raise ValueError(f"in-features {n_in} not divisible by group size {group_size}")
    g = w.reshape(*lead, n_in // group_size, group_size, n_out)
    absmax = np.max(np.abs(g), axis=-2)  # (..., in/G, out)
    scale = absmax / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.rint(g / safe[..., None, :]).astype(np.int8)  # ties-to-even; llama2.c
    # uses roundf (ties away from zero) — differs on exact .5 ratios only,
    # within the Q8 quality budget (measured in tests/test_quant.py).
    return QuantTensor(
        q=jnp.asarray(q.reshape(w.shape)),
        scale=jnp.asarray(scale, scale_dtype),
        group_size=group_size,
    )


def dequantize(t: QuantTensor, dtype=jnp.float32) -> jax.Array:
    *lead, n_in, n_out = t.q.shape
    g = t.q.reshape(*lead, n_in // t.group_size, t.group_size, n_out)
    w = g.astype(t.scale.dtype) * t.scale[..., None, :]
    return w.reshape(t.q.shape).astype(dtype)


QUANTIZED_PARAMS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "wcls")


def quantize_params(
    params: dict, group_size: int = DEFAULT_GROUP_SIZE, keys=QUANTIZED_PARAMS
) -> dict:
    """Quantize the matmul weights; norms/embedding stay fp (llama2.c runq
    keeps rmsnorm weights fp32 too)."""
    out = dict(params)
    for k in keys:
        n_in = params[k].shape[-2]
        gs = group_size if n_in % group_size == 0 else int(np.gcd(n_in, group_size))
        out[k] = quantize(params[k], gs)
    return out
