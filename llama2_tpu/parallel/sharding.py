"""Partition specs and sharding helpers for tensor/data parallel inference.

Sharding layout (SURVEY.md section 7 step 6, the scaling-book recipe — pick a
mesh, annotate shardings, let XLA insert collectives):

* column-parallel (shard out-features on ``model``): ``wq wk wv w1 w3`` — the
  activations they produce are head-/hidden-sharded, so attention and the
  SwiGLU gate run fully locally per shard;
* row-parallel (shard in-features on ``model``): ``wo w2`` — their outputs are
  partial sums; GSPMD inserts ONE all-reduce per block (the classic
  Megatron-style pairing), which XLA overlaps with adjacent compute under the
  latency-hiding scheduler;
* KV cache sharded over kv-heads on ``model`` and batch on ``data`` — each
  chip holds the KV slices for its own heads, so decode attention never
  communicates; when tp exceeds n_kv_heads the head-size dim picks up the
  remaining ways (MQA replication stays implicit via indexing);
* classifier ``wcls`` vocab-sharded on ``model``: logits come out
  vocab-sharded and the argmax/softmax reductions become XLA collectives;
* norms and the embedding table are replicated (tiny next to the matmuls).

Specs are divisibility-aware: a dimension is sharded on an axis only if the
axis size divides it (``device_put`` is strict about this); otherwise the
next-preferred dimension is tried, ending at replication, which is always
correct. For peak efficiency pick tp dividing n_kv_heads.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama2_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


def _shard_dim(shape: tuple[int, ...], ndim_specs: list, mesh: Mesh, axis: str, prefs):
    """Assign ``axis`` to the first preferred dim it divides; else replicate."""
    n = _axis_size(mesh, axis)
    for d in prefs:
        if d >= len(shape):  # e.g. 4-dim kv-quant scale planes
            continue
        if shape[d] % n == 0 and ndim_specs[d] is None:
            ndim_specs[d] = axis
            return


def _spec(shape: tuple[int, ...], mesh: Mesh, model_prefs, data_prefs=()) -> P:
    specs: list = [None] * len(shape)
    if data_prefs:
        _shard_dim(shape, specs, mesh, DATA_AXIS, data_prefs)
    if model_prefs:
        _shard_dim(shape, specs, mesh, MODEL_AXIS, model_prefs)
    return P(*specs)


# model-axis dim preferences per param name: column-parallel weights shard
# out-features (dim 2 of the layer-stacked (L, in, out)), row-parallel shard
# in-features (dim 1), the classifier is vocab-sharded; norms/embedding
# replicate. Fused launch groups inherit their constituents' orientation.
MODEL_PREFS: dict[str, tuple[int, ...]] = {
    "tok_emb": (),  # replicated; rows are gathered by token id
    "rms_att": (), "rms_ffn": (), "rms_final": (),
    "wq": (2,), "wk": (2,), "wv": (2,),   # (L, D, out) column-parallel
    "w1": (2,), "w3": (2,),
    "wqkv": (2,), "w13": (2,),
    "wo": (1,), "w2": (1,),               # (L, in, D) row-parallel
    "wcls": (1,),                          # (D, V) vocab-sharded
}


def leaf_spec(name: str, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Divisibility-aware spec for one array of param ``name`` — also correct
    for a QuantTensor's ``q``/``scale`` leaves individually (their dims scale
    together along the sharded axis only when divisible; else replicate)."""
    return _spec(shape, mesh, model_prefs=MODEL_PREFS.get(name, ()))


def param_specs(params: dict, mesh: Mesh) -> dict[str, P]:
    """Per-param PartitionSpec given actual shapes (divisibility-aware)."""
    return {k: leaf_spec(k, params[k].shape, mesh) for k in params}


def cache_specs(cache: dict, mesh: Mesh) -> dict[str, P]:
    # (n_layers, B, n_kv_heads, S, head_size): kv-heads on model (head_size
    # picks up the ways if tp > n_kv_heads), batch on data.
    return {
        k: _spec(v.shape, mesh, model_prefs=(2, 4), data_prefs=(1,))
        for k, v in cache.items()
    }


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Shard a param tree. QuantTensor leaves get their q/scale arrays
    spec'd INDIVIDUALLY: the scale sidecar's group axis is 1/group_size the
    q axis, so a spec computed from the logical shape can be illegal for it
    (e.g. w2 (L, 11008, D) row-shards 4-ways but its (L, 172, D) scales
    don't divide — the scale then replicates, which GSPMD handles fine in
    the dequant einsum)."""
    from llama2_tpu.quant.q8 import QuantTensor

    out = {}
    for k, v in params.items():
        if isinstance(v, QuantTensor):
            out[k] = QuantTensor(
                q=jax.device_put(
                    v.q, NamedSharding(mesh, leaf_spec(k, v.q.shape, mesh))
                ),
                scale=jax.device_put(
                    v.scale,
                    NamedSharding(mesh, leaf_spec(k, v.scale.shape, mesh)),
                ),
                group_size=v.group_size,
            )
        else:
            out[k] = jax.device_put(
                v, NamedSharding(mesh, leaf_spec(k, v.shape, mesh))
            )
    return out


def shard_cache(cache: dict, mesh: Mesh) -> dict:
    specs = cache_specs(cache, mesh)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in cache.items()
    }


def pool_specs(shapes: dict[str, tuple[int, ...]], mesh: Mesh) -> dict[str, P]:
    """Paged KV pool specs: (L, P, KVH, page, hs) pools shard kv-heads on
    ``model`` (head_size picks up extra ways, like the dense cache); the page
    axis is REPLICATED across ``data`` — pages are a shared allocator pool,
    any slot may hold any page, so there is no per-slot dim to shard. Scale
    pools (L, P, KVH, page) shard kv-heads only."""
    return {k: _spec(s, mesh, model_prefs=(2, 4)) for k, s in shapes.items()}


def shard_pool(pool, mesh: Mesh):
    """device_put a runtime/paged_cache.PagePool's device arrays."""
    import dataclasses

    arrays = {"k": pool.k, "v": pool.v}
    if pool.ks is not None:
        arrays.update(ks=pool.ks, vs=pool.vs)
    specs = pool_specs({k: v.shape for k, v in arrays.items()}, mesh)
    placed = {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in arrays.items()
    }
    return dataclasses.replace(pool, **placed)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
