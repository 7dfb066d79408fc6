"""Tensor-parallel pallas execution: the shard_map composition layer.

Mosaic (pallas) kernels are not GSPMD-partitionable — under a plain jit over
a mesh, XLA cannot split a fused kernel across devices, which is why the
engines used to silently downgrade ``--kernels pallas`` to the XLA dequant
path whenever ``--mesh`` was set (≈9x slower on the weight stream). This
module composes them the explicit way instead, per the manual-partitioning
recipe: run the layer stack inside :func:`jax.shard_map`, hand every device
its OWN shard of the weights/KV cache, and let each shard run the exact
single-chip fused kernels on local shapes, with psum (or the overlapped
ring) reducing the row-parallel wo/w2 outputs across the model axis.

Shard layout (matching parallel/sharding.py's GSPMD specs, so the same
device_put params serve both paths):

* wqkv — SHARD-BLOCKED out-features (models/llama.py::fuse_layer_params
  ``shards=tp``): chunk ``s`` of the out axis is ``[q_s|k_s|v_s]``, a
  self-contained fused-QKV block for shard ``s``'s heads;
* w1/w3 column-parallel, wo/w2 row-parallel, scales sharded with their q;
* KV cache: kv-heads on ``model``, batch (slots) on ``data``;
* the per-shard view is a SMALLER LLAMA: ``config`` is rewritten with
  ``dim/tp, hidden_dim/tp, n_heads/tp, n_kv_heads/tp`` (head_size and the
  GQA ratio are invariant), so models/llama.py's layer code — including the
  glue-fused attention kernels and the FFN megakernel — runs unchanged.

Reference contract origin: SURVEY.md §5.8 (distributed backend) and
BASELINE config 5 (INT8 tensor-sharded serving); the blocked layout and
psum placement follow the Megatron pairing described in
parallel/sharding.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from llama2_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from llama2_tpu.parallel.sharding import cache_specs, leaf_spec
from llama2_tpu.quant.q8 import QuantTensor


def _batch_axis(n: int, mesh) -> str | None:
    """'data' when the batch divides the data axis, else replicate (e.g. the
    B=1 prefill plane — every data shard computes it identically)."""
    dp = mesh.shape[DATA_AXIS]
    if dp > 1 and n % dp == 0:
        return DATA_AXIS
    if dp > 1 and n > 1:
        # loud fallback: a ragged batch silently replicating over data means
        # every shard does the FULL batch's work (the engines always pass
        # divisible batches; this warns if a future caller doesn't)
        import warnings

        warnings.warn(
            f"batch {n} does not divide dp={dp}: replicating the batch over "
            "the data axis (every shard computes all rows)",
            stacklevel=3,
        )
    return None


def local_config(config, tp: int):
    """The per-shard model view: a 1/tp-width llama with identical
    head_size, GQA ratio, seq_len and vocab."""
    if tp == 1:
        return config
    return dataclasses.replace(
        config,
        dim=config.dim // tp,
        hidden_dim=config.hidden_dim // tp,
        n_heads=config.n_heads // tp,
        n_kv_heads=config.n_kv_heads // tp,
    )


def tp_pallas_supported(params: dict, config, mesh) -> tuple[bool, str]:
    """Can the fused INT8 pallas kernels run under this mesh via shard_map?

    ``params`` is the UNFUSED (9-key) tree as loaded. Requirements beyond
    the GSPMD path: every matmul weight is a layer-stacked QuantTensor whose
    q AND scale shards divide evenly on the model axis (a replicated scale
    would silently turn a partial sum into an over-counted one), and tp
    divides the head counts so each shard owns whole kv-head planes.
    Returns ``(ok, reason)`` — the engine logs the reason when falling back.
    """
    tp = mesh.shape[MODEL_AXIS]
    if tp == 1:
        return True, ""
    if config.n_heads % tp:
        return False, f"tp={tp} does not divide n_heads={config.n_heads}"
    if config.n_kv_heads % tp:
        return False, f"tp={tp} does not divide n_kv_heads={config.n_kv_heads}"
    if config.hidden_dim % tp:
        return False, f"tp={tp} does not divide hidden_dim={config.hidden_dim}"
    col = ("wq", "wk", "wv", "w1", "w3")
    row = ("wo", "w2")
    for k in col + row:
        w = params.get(k)
        if not (isinstance(w, QuantTensor) and w.q.ndim == 3):
            return False, f"{k} is not a layer-stacked QuantTensor"
        if k in col:
            if w.q.shape[-1] % tp or w.scale.shape[-1] % tp:
                return False, f"{k} out-features/scales not divisible by tp={tp}"
        else:
            if w.q.shape[1] % tp:
                return False, f"{k} in-features not divisible by tp={tp}"
            if w.scale.shape[1] % tp:
                # scale groups must split with the rows: a replicated scale
                # sidecar cannot pair with row-sharded q in a local kernel
                return False, f"{k} scale groups not divisible by tp={tp}"
    return True, ""


def tp_ring_supported(params: dict, config, mesh) -> tuple[bool, str]:
    """Eligibility for the explicit-ring (collective="ring") sharded layer:
    works for fp OR quantized weights (ring dots dequantize locally), needs
    only the head/hidden divisibility so shards own whole heads."""
    tp = mesh.shape[MODEL_AXIS]
    if tp == 1:
        return True, ""
    if config.n_heads % tp or config.n_kv_heads % tp:
        return False, f"tp={tp} does not divide the head counts"
    if config.hidden_dim % tp:
        return False, f"tp={tp} does not divide hidden_dim={config.hidden_dim}"
    for k in ("wq", "wk", "wv", "w1", "w3", "wo", "w2"):
        w = params.get(k)
        if w is None:
            return False, f"{k} missing (fused layouts not supported with ring)"
        if isinstance(w, QuantTensor):
            shape, sshape = w.q.shape, w.scale.shape
        else:
            shape, sshape = w.shape, None
        d = -1 if k in ("wq", "wk", "wv", "w1", "w3") else 1
        if shape[d] % tp:
            return False, f"{k} not divisible by tp={tp}"
        if sshape is not None and sshape[d] % tp:
            return False, f"{k} scales not divisible by tp={tp}"
    return True, ""


def _param_specs(params: dict, mesh) -> dict:
    """Per-leaf PartitionSpecs for the layer-region param subtree (q and
    scale of a QuantTensor spec'd individually, like shard_params does)."""
    return {
        k: jax.tree.map(lambda a, k=k: leaf_spec(k, a.shape, mesh), v)
        for k, v in params.items()
    }


def run_layers_sharded(
    run_layers,
    params: dict,
    cache: dict,
    x: jax.Array,
    pos,
    cos,
    sin,
    config,
    precision,
    backend: str,
    unroll: int,
    mesh,
    collective: str | None = None,
):
    """Run ``models.llama._run_layers`` under shard_map over ``mesh``.

    Inputs arrive with GSPMD shardings from engine init (shard_params /
    shard_cache); the in_specs here name the SAME layout, so entering the
    region moves no data. Inside, each device sees local shards and the
    layer code runs the single-chip kernels with ``axis_name=model`` psums
    (or the overlapped ring when ``collective='ring'``).
    """
    from llama2_tpu.models.llama import layer_keys

    tp = mesh.shape[MODEL_AXIS]
    ring = collective == "ring"
    region_params = {k: params[k] for k in layer_keys(params)}
    cfg_local = local_config(config, tp)
    bspec = _batch_axis(x.shape[0], mesh)

    pspecs = _param_specs(region_params, mesh)
    cspecs = cache_specs(cache, mesh)
    xspec = P(bspec, None, None)
    posspec = P() if jnp.ndim(pos) == 0 else P(bspec)
    # cos/sin: (T, hs/2) for scalar pos, (B, T, hs/2) per-row
    rspec = P(*([None] * cos.ndim)) if jnp.ndim(pos) == 0 else P(
        bspec, *([None] * (cos.ndim - 1))
    )

    def region(p, c, xx, pp, cc, ss):
        return run_layers(
            p, c, xx, pp, cc, ss, cfg_local, precision, backend, unroll,
            axis_name=MODEL_AXIS if tp > 1 else None, ring=ring,
        )

    return jax.shard_map(
        region,
        mesh=mesh,
        in_specs=(pspecs, cspecs, xspec, posspec, rspec, rspec),
        out_specs=(xspec, cspecs),
        check_vma=False,
    )(region_params, cache, x, pos, cos, sin)


def logits_sharded(hidden: jax.Array, wcls: QuantTensor, mesh, backend: str):
    """Vocab-sharded classifier head through the fused pallas dequant-matmul
    inside shard_map; output logits stay vocab-sharded on ``model`` (the
    sampling reductions become GSPMD collectives, as with the XLA path).
    Falls back to replicated weights (every shard computes the full vocab
    row) when the vocab doesn't split evenly."""
    from llama2_tpu.ops.linear import _quant_mode
    from llama2_tpu.ops.pallas.quant_matmul import quant_matmul

    tp = mesh.shape[MODEL_AXIS]
    split = tp > 1 and wcls.q.shape[-1] % tp == 0 and wcls.scale.shape[-1] % tp == 0
    if tp > 1 and not split:
        # loud fallback: every shard computes the FULL vocab matvec. Llama
        # vocabs (32000/32016) split by 2/4/8, so this is latent — pad the
        # vocab if a tp=6/12 deployment ever hits it.
        import warnings

        warnings.warn(
            f"vocab {wcls.q.shape[-1]} (scale groups {wcls.scale.shape[-1]}) "
            f"not divisible by tp={tp}: classifier head replicates (each "
            "shard computes the full vocab row)",
            stacklevel=2,
        )
    wspec = P(None, MODEL_AXIS) if split else P(None, None)
    bspec = _batch_axis(hidden.shape[0], mesh)
    hspec = P(bspec, *([None] * (hidden.ndim - 1)))
    ospec = P(bspec, *([None] * (hidden.ndim - 2)), MODEL_AXIS if split else None)
    mode = _quant_mode(backend)

    def region(h, q, s):
        return quant_matmul(
            h, QuantTensor(q=q, scale=s, group_size=wcls.group_size), mode=mode
        ).astype(jnp.float32)

    return jax.shard_map(
        region,
        mesh=mesh,
        in_specs=(hspec, wspec, wspec),
        out_specs=ospec,
        check_vma=False,
    )(hidden, wcls.q, wcls.scale)
