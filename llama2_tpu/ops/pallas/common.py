"""Shared helpers for the Pallas TPU kernels.

Kernels run compiled (Mosaic) on TPU and in interpreter mode on CPU — the
"checked build" (SURVEY.md section 5, race-detection row) and the way kernel
oracle tests run on CI without a chip.
"""

from __future__ import annotations

import jax


def interpret_default() -> bool:
    """Interpreter mode unless running on a real TPU backend."""
    return jax.default_backend() not in ("tpu", "axon")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# K+V double-buffer budget for the batched-head decode kernels. Mosaic's
# scoped-vmem stack limit is 16 MB; half is left for the q/out blocks, the
# in-kernel append windows, and compiler temporaries. Exceeding it is a
# compile-time OOM ("Ran out of memory in memory space vmem ... on stack"),
# hit in practice at 7B attention shapes (KVH=32, hs=128, f32, 512-row
# blocks = 32 MB of scratch).
KV_SCRATCH_BUDGET = 8 * 2**20


def kv_scratch_rows(
    kvh: int, hs: int, itemsize: int,
    budget: int = KV_SCRATCH_BUDGET, min_rows: int = 128,
) -> int:
    """Max KV rows per block for the batched-head kernels' VMEM scratch:
    2 pipeline buffers x (K and V) x kvh heads x rows x hs x itemsize must
    fit ``budget``. Never returns less than ``min_rows`` (the q8 kernels'
    lane granularity); shapes that still blow the scoped limit at min_rows
    need a head-split grid, which no supported config reaches."""
    return max(min_rows, budget // (4 * kvh * hs * itemsize))


def paged_scratch_fits(
    kvh: int, page: int, hs: int, itemsize: int,
    budget: int = KV_SCRATCH_BUDGET,
) -> bool:
    """Do the paged kernels' per-page K+V double buffers fit the scoped-vmem
    budget? (Their DMA unit is a whole page, so the only lever is page_size
    — the engine validates at init and falls back to XLA attention.)"""
    return 4 * kvh * page * hs * itemsize <= budget
