"""Explicit collective matmul: ring-overlapped row-parallel linears.

SURVEY.md §7 hard part (e) / the north star's "collectives overlapped with
matmul compute": under plain GSPMD the row-parallel ``wo``/``w2`` matmuls end
in one ``all-reduce`` that XLA's latency-hiding scheduler may or may not
overlap. This module makes the overlap STRUCTURAL instead of hoping: the
all-reduce is decomposed into a ring reduce-scatter whose per-hop
``ppermute`` is data-independent of the chunk matmul issued in the same step
— every hop of communication has a co-scheduled dot the compiler can (and on
TPU does) run concurrently, because neither depends on the other:

    step t on device i:   acc  <- ppermute(acc)            (ICI, async)
                          part <- x @ w_local[:, chunk_t]  (MXU, independent)
                          acc  <- acc + part

The matmul work is identical to the naive partial-sum (each device still
multiplies its (in/tp, out) shard once, just column-chunk by column-chunk);
only the reduction is restructured. A trailing all-gather rebuilds the
replicated activation (decode-time activations are tiny next to weights).

Algorithm (ring reduce-scatter fused with the producing matmul): the
accumulator destined for device d starts at device (d+1) % tp and hops
forward through the ring, each visited device adding its own partial of out-chunk
C_d; after tp-1 hops it lands on d with all tp contributions. At step t
device i therefore computes its partial for chunk ``(i - 1 - t) % tp``.

Verified in tests/test_collective_matmul.py: numerically identical to the
psum formulation on the 8-device virtual mesh, and the lowered HLO is
asserted to contain the interleaved collective-permute/dot structure (the
overlap opportunity is a property of the dataflow graph, so it survives to
any backend's scheduler; single-chip environments cannot measure the ICI
overlap itself — see README "collective overlap" note).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from llama2_tpu.parallel.mesh import MODEL_AXIS


def ring_rs_matmul(x: jax.Array, w_local: jax.Array, axis: str, tp: int):
    """Row-parallel partial matmul + ring reduce-scatter, overlapped.

    Inside shard_map: ``x (..., in/tp)`` is this device's activation shard
    (or the full activation for a replicated x with in-sharded w — the caller
    slices), ``w_local (in/tp, out)`` its weight shard. Returns this device's
    fully-summed out-chunk ``(..., out/tp)``.
    """
    out = w_local.shape[-1]
    chunk = out // tp
    i = jax.lax.axis_index(axis)

    def chunk_dot(d):
        wc = jax.lax.dynamic_slice_in_dim(w_local, d * chunk, chunk, axis=-1)
        return jnp.dot(x, wc, precision=jax.lax.Precision.HIGHEST)

    fwd = [(j, (j + 1) % tp) for j in range(tp)]
    acc = chunk_dot((i - 1) % tp)
    for t in range(1, tp):
        # the ppermute and the chunk_dot below are data-independent:
        # structurally overlappable communication/compute
        acc = jax.lax.ppermute(acc, axis, perm=fwd)
        acc = acc + chunk_dot((i - 1 - t) % tp)
    return acc  # this device's out-chunk C_i, summed over all devices


def row_parallel_linear(
    x: jax.Array, w: jax.Array, mesh, axis: str = MODEL_AXIS
):
    """``y = x @ w`` with ``w (in, out)`` row-(in-)sharded over ``axis``,
    as a shard_map collective matmul; x and y replicated on ``axis``.

    Drop-in for the GSPMD row-parallel pattern (``linear`` + implicit psum):
    same math, explicit overlapped reduction. Requires ``in % tp == 0`` and
    ``out % tp == 0``.
    """
    tp = mesh.shape[axis]
    n_in, out = w.shape[-2], w.shape[-1]
    if tp == 1:
        return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)
    if n_in % tp or out % tp:
        raise ValueError(f"({n_in}, {out}) not divisible by tp={tp}")

    # batch/leading dims replicated; w in-sharded on the model axis
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    def run(x_full, w_local):
        xs = jax.lax.dynamic_slice_in_dim(
            x_full, jax.lax.axis_index(axis) * (n_in // tp), n_in // tp, -1
        )
        mine = ring_rs_matmul(xs, w_local, axis, tp)  # (..., out/tp)
        return _ring_all_gather(mine, axis, tp)

    return run(x, w)


def ring_linear_local(
    y: jax.Array, w, axis: str = MODEL_AXIS, layer=None,
    precision=jax.lax.Precision.HIGHEST,
):
    """Row-parallel linear for use INSIDE shard_map: ``y (..., in/tp)`` is
    this device's feature shard (e.g. the local attention heads' outputs),
    ``w (in/tp, out)`` its in-sharded weight shard; returns the fully
    reduced, replicated ``(..., out)``.

    This is the production wiring of the overlapped collective matmul into
    the sharded decoder layer (models/llama.py::_row_parallel with
    ``ring=True``, flag ``collective="ring"``): ring reduce-scatter fused
    with the chunked dots, then a ring all-gather. ``w`` may be a
    QuantTensor (dequantized locally — the ring form trades the fused
    dequant kernel for explicit overlap) and may be layer-stacked
    ``(L, in/tp, out)`` with ``layer`` the scan's index.
    """
    from llama2_tpu.quant.q8 import QuantTensor, dequantize

    tp = int(jax.lax.axis_size(axis))
    if isinstance(w, QuantTensor):
        if w.q.ndim == 3 and layer is not None:
            w = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, False), w
            )
        w = dequantize(w, y.dtype)
    elif w.ndim == 3 and layer is not None:
        w = jax.lax.dynamic_index_in_dim(w, layer, 0, False)
    if tp == 1:
        return jnp.dot(y, w, precision=precision)
    if w.shape[-1] % tp:
        # no even out-chunking: fall back to the plain psum reduction
        return jax.lax.psum(jnp.dot(y, w, precision=precision), axis)
    acc = ring_rs_matmul(y, w, axis, tp)
    return _ring_all_gather(acc, axis, tp)


def _ring_all_gather(chunk_i: jax.Array, axis: str, tp: int) -> jax.Array:
    """Rebuild the full out dim from per-device chunks; device i holds C_i.

    A ring all-gather (tp-1 ppermute hops) rather than one fused all-gather:
    each hop is again independent of the concatenation bookkeeping, and on
    multi-hop topologies rides neighbor ICI links.
    """
    i = jax.lax.axis_index(axis)
    fwd = [(j, (j + 1) % tp) for j in range(tp)]
    pieces = {0: chunk_i}
    moving = chunk_i
    for t in range(1, tp):
        moving = jax.lax.ppermute(moving, axis, perm=fwd)
        pieces[t] = moving  # originated at device (i - t) % tp
    # piece t holds chunk C_{(i-t) % tp}; place each at its true offset
    out = jnp.zeros(
        (*chunk_i.shape[:-1], chunk_i.shape[-1] * tp), chunk_i.dtype
    )
    for t in range(tp):
        src = (i - t) % tp
        out = jax.lax.dynamic_update_slice_in_dim(
            out, pieces[t], src * chunk_i.shape[-1], axis=-1
        )
    return out
