"""On-disk param cache: directory of raw ``.npy`` tensors + ``meta.json``.

The 7B load-time story (SURVEY.md section 5, checkpoint row): converting a
llama2.c ``.bin`` costs a full parse + transpose + (for INT8) quantize every
start; this cache stores the final param tree — including ``QuantTensor``
leaves as ``<name>.q.npy`` / ``<name>.scale.npy`` pairs — so a restart
``np.load(mmap_mode="r")``s straight into device transfer with no fp32
intermediate copy.

    save_cache(dir, config, params)
    config, params, shared = load_cache(dir)

The generate CLI treats a directory checkpoint path as a cache
(``python -m llama2_tpu model-cache/ ...``) and can write one with
``--save-cache DIR``.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from llama2_tpu.config import ModelConfig
from llama2_tpu.quant.q8 import QuantTensor

_META = "meta.json"
FORMAT_VERSION = 1


def save_cache(
    path: str, config: ModelConfig, params: dict, shared: bool = False
) -> None:
    os.makedirs(path, exist_ok=True)
    meta = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(config),
        "shared": shared,  # classifier aliases the embedding (v0 sentinel)
        "tensors": {},
    }
    for name, value in params.items():
        if isinstance(value, QuantTensor):
            np.save(os.path.join(path, f"{name}.q.npy"), np.asarray(value.q))
            np.save(os.path.join(path, f"{name}.scale.npy"), np.asarray(value.scale))
            meta["tensors"][name] = {"kind": "q8", "group_size": value.group_size}
        else:
            np.save(os.path.join(path, f"{name}.npy"), np.asarray(value))
            meta["tensors"][name] = {"kind": "dense"}
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


def load_cache(path: str):
    """Returns ``(config, params, shared)``; arrays are mmapped (zero host
    copy until device transfer reads them)."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported cache version {meta.get('format_version')}")
    config = ModelConfig(**meta["config"])
    params = {}
    for name, info in meta["tensors"].items():
        if info["kind"] == "q8":
            params[name] = QuantTensor(
                q=np.load(os.path.join(path, f"{name}.q.npy"), mmap_mode="r"),
                scale=np.load(os.path.join(path, f"{name}.scale.npy"), mmap_mode="r"),
                group_size=info["group_size"],
            )
        else:
            params[name] = np.load(os.path.join(path, f"{name}.npy"), mmap_mode="r")
    return config, params, bool(meta.get("shared", False))


def is_cache_dir(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, _META))


def _leaf_files(path: str, meta: dict):
    """Yield ``(param_name, leaf_path, wrap)`` for every array file in the
    cache; ``wrap(dense, q, scale)`` rebuilds the param from loaded leaves."""
    for name, info in meta["tensors"].items():
        if info["kind"] == "q8":
            yield name, os.path.join(path, f"{name}.q.npy"), "q"
            yield name, os.path.join(path, f"{name}.scale.npy"), "scale"
        else:
            yield name, os.path.join(path, f"{name}.npy"), "dense"


def shard_read_plan(path: str, mesh) -> dict:
    """Planning view of :func:`load_cache_sharded`: bytes each DEVICE reads
    per tensor, ``{name: {device_index_in_mesh: nbytes}}``. A process loads
    only its own devices' shards, so its host traffic is the sum over its
    rows — the multi-host load contract, testable without multiple hosts."""
    from jax.sharding import NamedSharding

    from llama2_tpu.parallel.sharding import leaf_spec

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    devices = list(mesh.devices.flat)
    plan: dict = {}
    for name, leaf_path, _ in _leaf_files(path, meta):
        arr = np.load(leaf_path, mmap_mode="r")
        sharding = NamedSharding(mesh, leaf_spec(name, arr.shape, mesh))
        for dev, idx in sharding.devices_indices_map(arr.shape).items():
            nbytes = arr[idx].size * arr.dtype.itemsize
            plan.setdefault(leaf_path, {})[devices.index(dev)] = nbytes
    return plan


def load_cache_sharded(path: str, mesh):
    """Per-host sharded direct-to-device load (SURVEY.md section 5,
    checkpoint row): every tensor is mmapped, and each ADDRESSABLE device's
    shard slice is copied out of the mmap and placed on that device —
    the full tree is never materialized as one host copy, and under
    multi-controller JAX each process reads only its own devices' slices
    (contrast main.zig:955-964, which reads the whole checkpoint into host
    RAM — fine at 60 MB, not at 7 GB x N hosts).

    Returns ``(config, params, shared)`` with params as GLOBAL jax.Arrays
    sharded per parallel/sharding.py's layout (ready for the mesh-aware
    engine; re-sharding by the engine is a no-op).
    """
    import jax
    from jax.sharding import NamedSharding

    from llama2_tpu.parallel.sharding import leaf_spec

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported cache version {meta.get('format_version')}")
    config = ModelConfig(**meta["config"])

    def load_leaf(name: str, leaf_path: str):
        arr = np.load(leaf_path, mmap_mode="r")
        sharding = NamedSharding(mesh, leaf_spec(name, arr.shape, mesh))
        return jax.make_array_from_callback(
            arr.shape, sharding,
            # ascontiguousarray materializes ONLY this shard's bytes
            lambda idx, a=arr: np.ascontiguousarray(a[idx]),
        )

    params: dict = {}
    for name, info in meta["tensors"].items():
        if info["kind"] == "q8":
            params[name] = QuantTensor(
                q=load_leaf(name, os.path.join(path, f"{name}.q.npy")),
                scale=load_leaf(name, os.path.join(path, f"{name}.scale.npy")),
                group_size=info["group_size"],
            )
        else:
            params[name] = load_leaf(name, os.path.join(path, f"{name}.npy"))
    return config, params, bool(meta.get("shared", False))
