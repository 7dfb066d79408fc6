"""Paged KV cache: device page pools + host page allocator.

The serving-grade replacement for per-slot dense caches (the reference
preallocates `seq_len` per request, main.zig:151-152): K and V live in
per-layer page pools of ``(n_pages, KVH, page_size, hs)`` and every request
holds only the pages its current length needs. The allocator is plain host
bookkeeping (a free list — allocation happens at admission/retirement rate,
thousands of times slower than decode ticks); the device side sees only
int32 page tables, consumed by
:func:`llama2_tpu.ops.pallas.paged_attention.paged_decode_attention` or the
XLA gather fallback.

Writes go through ``write_segment`` (prefill: scatter T rows over the pages
they land in) and ``append`` (decode: one row per active slot per tick, a
batched scatter at (page_id, row) coordinates).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from llama2_tpu.config import ModelConfig


class OutOfPages(RuntimeError):
    pass


@dataclasses.dataclass
class PagePool:
    """Device pools (one per layer stacked on dim 0) + host free list.

    ``kv_quant`` pools hold int8 rows plus per-row f32 scales
    (``ks``/``vs``, shape (L, P, KVH, page)) — 4x the tokens per HBM byte,
    consumed by paged_attention.paged_decode_attention_q8_stacked."""

    k: jax.Array  # (L, P, KVH, page, hs) — f32/bf16, or int8 when quantized
    v: jax.Array
    page_size: int
    free: list[int]
    ks: jax.Array | None = None  # (L, P, KVH, page) f32 per-row scales
    vs: jax.Array | None = None

    @classmethod
    def create(
        cls,
        config: ModelConfig,
        n_pages: int,
        page_size: int = 256,
        dtype=jnp.float32,
        lane_pad: bool = False,
        kv_quant: bool = False,
    ) -> "PagePool":
        hs = config.head_size
        if lane_pad:
            hs = ((hs + 127) // 128) * 128
        shape = (config.n_layers, n_pages, config.n_kv_heads, page_size, hs)
        if kv_quant:
            sshape = shape[:-1]
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                ks=jnp.zeros(sshape, jnp.float32),
                vs=jnp.zeros(sshape, jnp.float32),
                page_size=page_size,
                free=list(range(n_pages - 1, -1, -1)),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            page_size=page_size,
            free=list(range(n_pages - 1, -1, -1)),
        )

    @property
    def kv_quant(self) -> bool:
        return self.ks is not None

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    def alloc(self, n: int) -> list[int]:
        if len(self.free) < n:
            raise OutOfPages(f"need {n} pages, {len(self.free)} free")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: list[int]) -> None:
        self.free.extend(pages)

    def pages_for(self, n_tokens: int) -> int:
        return max(1, -(-n_tokens // self.page_size))


class PrefixCache:
    """Host-side registry of FULL KV pages keyed by their causal token
    prefix (vLLM-style automatic prefix caching).

    A page covering positions [j*ps, (j+1)*ps) of a teacher-forced stream is
    a pure function of the first (j+1)*ps fed tokens, so that token prefix
    (as bytes) is the key. Only full pages are shared — a partial tail page
    is private to its request, and decode writes always land at positions
    >= the prompt length, so shared pages are never written again.

    Refcounts count the slots currently holding a page. At zero the page
    stays CACHED (not freed) and joins an LRU of evictable pages; the
    engine's allocator evicts from that LRU back to the free list only
    under memory pressure — the pool itself is the cache budget.
    """

    def __init__(self):
        self.key2page: dict[bytes, int] = {}
        self.page2key: dict[int, bytes] = {}
        self.refs: dict[int, int] = {}
        self._lru: dict[int, None] = {}  # insertion-ordered set of ref-0 pages
        self.hits = 0
        self.misses = 0

    def lookup(self, key: bytes) -> int | None:
        """Take a reference on the page for ``key`` if cached."""
        page = self.key2page.get(key)
        if page is None:
            self.misses += 1
            return None
        self.refs[page] += 1
        self._lru.pop(page, None)
        self.hits += 1
        return page

    def register(self, key: bytes, page: int) -> bool:
        """Register an owned page under ``key`` (the caller's ref counts)."""
        if key in self.key2page or page in self.page2key:
            return False
        self.key2page[key] = page
        self.page2key[page] = key
        self.refs[page] = 1
        return True

    def release(self, page: int) -> bool:
        """Drop one reference. True = the page stays cached (do NOT free)."""
        if page not in self.page2key:
            return False
        self.refs[page] -= 1
        if self.refs[page] == 0:
            self._lru[page] = None
        return True

    @property
    def evictable(self) -> int:
        return len(self._lru)

    def evict(self, n: int) -> list[int]:
        """Unregister up to ``n`` least-recently-idle pages; returns them
        (caller puts them back on the pool free list)."""
        out = []
        while self._lru and len(out) < n:
            page = next(iter(self._lru))  # oldest idle entry (insertion order)
            del self._lru[page]
            out.append(page)
            del self.key2page[self.page2key.pop(page)]
            del self.refs[page]
        return out

    def clear(self):
        self.key2page.clear()
        self.page2key.clear()
        self.refs.clear()
        self._lru.clear()


@jax.jit
def _write_rows(pool, rows, page_ids, row_ids):
    """Scatter rows (L, R, KVH, hs) into pool at (page_ids[r], row_ids[r])."""

    def per_row(pool, r):
        row = jax.lax.dynamic_index_in_dim(rows, r, 1, keepdims=False)  # (L,KVH,hs)
        upd = row[:, None, :, None, :]  # (L, 1, KVH, 1, hs)
        return jax.lax.dynamic_update_slice(
            pool, upd.astype(pool.dtype), (0, page_ids[r], 0, row_ids[r], 0)
        ), None

    pool, _ = jax.lax.scan(per_row, pool, jnp.arange(rows.shape[1]))
    return pool


@jax.jit
def _write_scale_rows(spool, srows, page_ids, row_ids):
    """Scatter per-row scales (L, R, KVH) into the (L, P, KVH, page) pool."""

    def per_row(spool, r):
        s = jax.lax.dynamic_index_in_dim(srows, r, 1, keepdims=False)  # (L,KVH)
        upd = s[:, None, :, None]  # (L, 1, KVH, 1)
        return jax.lax.dynamic_update_slice(
            spool, upd.astype(spool.dtype), (0, page_ids[r], 0, row_ids[r])
        ), None

    spool, _ = jax.lax.scan(per_row, spool, jnp.arange(srows.shape[1]))
    return spool


def _bucket(T: int) -> int:
    """Next power of two >= max(T, 32): bounds the jit specializations of
    ``_write_rows`` (its trace depends on the row count; every distinct
    prompt length would otherwise trigger a fresh compile — compiles are
    expensive enough on a remote-compile transport that admission must
    reuse a handful of shapes)."""
    b = 32
    while b < T:
        b *= 2
    return b


def write_segment(
    pool: PagePool,
    k_rows: jax.Array,  # (L, T, KVH, hs) new keys for positions pos0..pos0+T-1
    v_rows: jax.Array,
    table: np.ndarray,  # this slot's page table (host int32, logical order)
    pos0: int,
) -> PagePool:
    """Write a prefilled segment's KV rows through the slot's page table.

    Rows are padded up to a power-of-two bucket by REPEATING the last row at
    its own (page, row) coordinates — an idempotent rewrite — so row-count
    jit specializations stay logarithmic in seq_len.
    """
    T = k_rows.shape[1]
    logical = np.arange(pos0, pos0 + T)
    page_ids = table[logical // pool.page_size].astype(np.int32)
    row_ids = (logical % pool.page_size).astype(np.int32)
    pad = _bucket(T) - T
    if pad:
        k_rows = jnp.concatenate(
            [k_rows, jnp.repeat(k_rows[:, -1:], pad, axis=1)], axis=1
        )
        v_rows = jnp.concatenate(
            [v_rows, jnp.repeat(v_rows[:, -1:], pad, axis=1)], axis=1
        )
        page_ids = np.concatenate([page_ids, np.repeat(page_ids[-1:], pad)])
        row_ids = np.concatenate([row_ids, np.repeat(row_ids[-1:], pad)])
    page_ids = jnp.asarray(page_ids)
    row_ids = jnp.asarray(row_ids)
    return dataclasses.replace(
        pool,
        k=_write_rows(pool.k, k_rows, page_ids, row_ids),
        v=_write_rows(pool.v, v_rows, page_ids, row_ids),
    )


@jax.jit
def _append_rows(pool, rows, page_ids, row_ids, active):
    """Batched decode append: rows (L, B, KVH, hs) at per-slot coordinates.

    Inactive slots write to their own frozen (page, row) — same address every
    tick, harmless garbage a future tenant overwrites (the batch engine's
    established contract for inactive slots).
    """

    def per_slot(pool, b):
        row = jax.lax.dynamic_index_in_dim(rows, b, 1, keepdims=False)
        upd = row[:, None, :, None, :]
        return jax.lax.dynamic_update_slice(
            pool, upd.astype(pool.dtype), (0, page_ids[b], 0, row_ids[b], 0)
        ), None

    pool, _ = jax.lax.scan(per_slot, pool, jnp.arange(rows.shape[1]))
    return pool


def append(
    pool: PagePool,
    k_rows: jax.Array,  # (L, B, KVH, hs) one new row per slot
    v_rows: jax.Array,
    page_ids: jax.Array,  # (B,) physical page per slot (precomputed on host)
    row_ids: jax.Array,  # (B,) row within page
    active: jax.Array | None = None,
) -> PagePool:
    return dataclasses.replace(
        pool,
        k=_append_rows(pool.k, k_rows, page_ids, row_ids, active),
        v=_append_rows(pool.v, v_rows, page_ids, row_ids, active),
    )
