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
