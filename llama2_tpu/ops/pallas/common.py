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


def decode_block_rows(
    S: int, kvh: int, hs: int, itemsize: int, block_s: int = 1024
) -> int:
    """KV rows per block for the batched-head f32/bf16 decode kernels
    (attention.py stacked/fused): start from the profile-chosen cap, clamp
    to the scoped-vmem budget, then halve until the block divides S. The
    single source of truth — the 7B compile gate asserts its output stays
    within :data:`KV_SCRATCH_BUDGET` (tests/test_compile_gate_7b.py)."""
    # sublane granularity is 8 for the fp kernels (block dims must be
    # (8k, 128k) or whole) — the 128 floor is the q8 RMW lane tile only.
    # Without the lower floor, 13B f32 shapes (KVH=40) blow the budget.
    bs = min(
        block_s, max(256, S // 4), S,
        kv_scratch_rows(kvh, hs, itemsize, min_rows=8),
    )
    if S % bs:
        # a non-dividing clamp (e.g. 204 at 13B bf16): normalize to the
        # largest power of two <= it, then halve until it divides S — the
        # raw halving loop could otherwise degrade to 1-row blocks
        p = 1
        while p * 2 <= bs:
            p *= 2
        bs = p
        while S % bs:
            bs //= 2
    return bs


def decode_block_rows_q8(S: int, kvh: int, hs: int, block_s: int = 1024) -> int:
    """INT8 twin of :func:`decode_block_rows` (attention_q8.py stacked/
    fused): blocks are 128-lane multiples (the RMW scale window is a whole
    lane tile), the largest one under the cap that divides S."""
    lane = 128
    cap = min(block_s, max(256, S // 8), S, kv_scratch_rows(kvh, hs, 1))
    bs = lane
    k = 1
    while True:
        cand = lane * k
        if cand > cap:
            break
        if S % cand == 0:
            bs = cand
        k += 1
    return bs


def paged_scratch_fits(
    kvh: int, page: int, hs: int, itemsize: int,
    budget: int = KV_SCRATCH_BUDGET,
) -> bool:
    """Do the paged kernels' per-page K+V double buffers fit the scoped-vmem
    budget? (Their DMA unit is a whole page, so the only lever is page_size
    — the engine validates at init and falls back to XLA attention.)"""
    return 4 * kvh * page * hs * itemsize <= budget
