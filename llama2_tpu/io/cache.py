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
