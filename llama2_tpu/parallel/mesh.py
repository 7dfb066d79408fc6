"""Device mesh construction.

Two mesh axes cover the engine's parallelism (SURVEY.md section 5.7/5.8 —
the reference has none; this is a new first-class component):

* ``data``  — batch/data parallel: independent requests (continuous batching
  shards over this axis). Collectives: none in the forward pass.
* ``model`` — tensor parallel: attention heads / FFN hidden / vocab shards.
  Collectives: all-reduce on row-sharded matmul outputs, all-gather of
  vocab-sharded logits — inserted by GSPMD from the sharding annotations and
  carried over ICI when the mesh maps model-axis neighbors to intra-slice
  links (the default from ``mesh_utils.create_device_mesh``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
AXES = (DATA_AXIS, MODEL_AXIS)


def make_mesh(dp: int = 1, tp: int | None = None, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh. ``tp=None`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        if n % dp != 0:
            raise ValueError(f"{n} devices not divisible by dp={dp}")
        tp = n // dp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {n}")
    devices = np.asarray(devices[: dp * tp])
    try:
        grid = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    except (ValueError, NotImplementedError) as e:
        # CPU simulation / odd topologies have no ICI layout to optimize; on
        # real hardware a flat reshape can map the model axis across
        # non-adjacent links, so say it out loud rather than hide it
        if devices[0].platform != "cpu":
            import warnings

            warnings.warn(
                f"create_device_mesh failed ({e}); falling back to a "
                "topology-ignorant reshape — collectives may cross slow links"
            )
        grid = devices.reshape(dp, tp)
    return Mesh(grid, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), AXES)
