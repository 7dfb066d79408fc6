"""Continuous batching over a paged KV cache.

Same scheduler as :class:`llama2_tpu.runtime.batch_engine.BatchEngine` (it
subclasses it — admit/tick/retire, reference loop semantics), but KV lives in
page pools sized by *total tokens in flight* instead of ``batch_size *
seq_len``: a slot holds only the pages its current length needs, so many
short requests fit where the dense layout reserves worst-case.

Memory: dense = B*S rows; paged = n_pages*page_size rows, independently
chosen. Prefill stages through one dense plane (a single request's worst
case) and scatters into pages; decode appends one row per slot per tick and
allocates a page only when a slot crosses a page boundary. Memory pressure:
admission requires the prompt's pages plus one spare; a slot that still runs
dry mid-decode is preempted and recomputed after memory frees (vLLM's
recompute policy — cheaper than swapping on TPU), unless it is the only
active request, in which case the pool genuinely cannot hold it and it
finishes with the tokens it has.
"""

from __future__ import annotations

import queue
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llama2_tpu.config import ModelConfig
from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
from llama2_tpu.models.paged import paged_forward_step, paged_forward_window
from llama2_tpu.ops import sampling
from llama2_tpu.runtime.batch_engine import (
    BOS,
    BatchEngine,
    Request,
    _sample_batched,
    _slot_keys,
    _spec_commit,
    _spec_drafts,
)
from llama2_tpu.runtime.paged_cache import OutOfPages, PagePool


def _tick_paged_impl(
    params, k_pool, v_pool, table, tokens, pos, budget,
    page_ids, row_ids,  # (n_ticks, B): precomputed write coords per tick
    temperature, top_p, use_argmax, active, base_keys,
    *, config: ModelConfig, precision, backend: str,
    n_ticks: int = 1, stochastic: bool = True, unroll: int = 1,
    ks_pool=None, vs_pool=None,  # per-row scale pools (INT8 KV)
    axis_name=None, gather_logits: bool = False, ring: bool = False,
):
    """n_ticks paged decode steps per host sync (see batch_engine._tick for
    the freeze semantics — identical here, with page-table writes).

    Frozen slots keep scattering their stale K/V at the PRE-COMPUTED next
    coordinates — positions beyond their final pos inside their own pages,
    never attended and recycled at retire — so the write coords don't need
    per-slot branching on device.

    ``axis_name``/``gather_logits``: tensor-parallel mode inside shard_map
    (parallel/dp_paged.py) — ``config`` holds LOCAL head counts, the
    forward psums its row-parallel outputs over ``axis_name``, and with
    ``gather_logits`` the vocab-sharded classifier's local logits
    all-gather back to the full vocab row before sampling (every shard
    then samples the identical next token for its local slots).
    """
    kv_quant = ks_pool is not None

    def step(carry, i):
        if kv_quant:
            tokens, pos, budget, active, k_pool, ks_pool, v_pool, vs_pool = carry
            hidden, k_pool, ks_pool, v_pool, vs_pool = paged_forward_step(
                params, k_pool, v_pool, table, tokens, pos,
                page_ids[i], row_ids[i], config, precision, backend,
                unroll, ks_pool=ks_pool, vs_pool=vs_pool, axis_name=axis_name,
                ring=ring,
            )
        else:
            tokens, pos, budget, active, k_pool, v_pool = carry
            hidden, k_pool, v_pool = paged_forward_step(
                params, k_pool, v_pool, table, tokens, pos,
                page_ids[i], row_ids[i], config, precision, backend, unroll,
                axis_name=axis_name, ring=ring,
            )
        logits = logits_from_hidden(params, hidden[:, -1, :], precision, backend)
        if gather_logits:
            logits = jax.lax.all_gather(
                logits, axis_name, axis=-1, tiled=True
            )
        nxt = _sample_batched(
            logits, temperature, top_p, use_argmax,
            _slot_keys(base_keys, pos), stochastic,
        )
        emitted = jnp.where(active, nxt, -1)
        advance = active & (nxt != BOS)
        budget = jnp.where(advance, budget - 1, budget)
        pos = jnp.where(advance, jnp.minimum(pos + 1, config.seq_len - 1), pos)
        tokens = jnp.where(advance, nxt, tokens)
        # budget bounds the walk (steps <= seq_len); see batch_engine._tick
        active = advance & (budget > 0)
        if kv_quant:
            carry = (tokens, pos, budget, active, k_pool, ks_pool, v_pool, vs_pool)
        else:
            carry = (tokens, pos, budget, active, k_pool, v_pool)
        return carry, emitted

    if kv_quant:
        init = (tokens, pos, budget, active, k_pool, ks_pool, v_pool, vs_pool)
    else:
        init = (tokens, pos, budget, active, k_pool, v_pool)
    carry, emitted = jax.lax.scan(step, init, jnp.arange(n_ticks))
    if kv_quant:
        tokens, pos, budget, active, k_pool, ks_pool, v_pool, vs_pool = carry
    else:
        tokens, pos, budget, active, k_pool, v_pool = carry
    packed = jnp.concatenate(
        [emitted, tokens[None], pos[None], active.astype(jnp.int32)[None]],
        axis=0,
    )
    # budget returns separately so a pipelined caller can chain the next
    # window's inputs from DEVICE arrays (see BatchEngine._dispatch_tick)
    return packed, budget, k_pool, v_pool, ks_pool, vs_pool


_tick_paged = partial(
    jax.jit,
    static_argnames=(
        "config", "precision", "backend", "n_ticks", "stochastic", "unroll",
        "axis_name", "gather_logits", "ring",
    ),
    donate_argnames=("k_pool", "v_pool", "ks_pool", "vs_pool"),
)(_tick_paged_impl)


def _tick_spec_paged_impl(
    params, k_pool, v_pool, table, hist, tokens, pos, budget, active,
    *, config: ModelConfig, precision, backend: str,
    n_windows: int = 1, d: int = 4, unroll: int = 1,
    ks_pool=None, vs_pool=None,
    axis_name=None, gather_logits: bool = False, ring: bool = False,
):
    """Paged twin of ``batch_engine._tick_spec``: each window runs one
    (B, d) teacher-forced forward over the page pools
    (:func:`llama2_tpu.models.paged.paged_forward_window` — write coords
    come from the table on device) and commits the verified target prefix
    per slot via the shared draft/commit helpers, so streams are identical
    to the plain paged tick by the same per-slot argument.

    The host must back every slot's table for ``n_windows * d`` positions
    ahead of ``pos`` before dispatch (``PagedBatchEngine._grow_tables``);
    position overshoot past ``seq_len`` routes to the scratch page inside
    the window forward. Packed layout matches ``_tick_spec`` (emitted rows,
    then tokens/pos/active) so ``BatchEngine._replay`` applies unchanged.
    """
    B = tokens.shape[0]
    S = config.seq_len
    kv_quant = ks_pool is not None

    def window(carry, _):
        if kv_quant:
            hist, tokens, pos, budget, active, k_pool, ks_pool, v_pool, vs_pool = carry
        else:
            hist, tokens, pos, budget, active, k_pool, v_pool = carry
            ks_pool = vs_pool = None
        seg = _spec_drafts(hist, tokens, pos, d, S)  # (B, d)
        if kv_quant:
            hidden, k_pool, ks_pool, v_pool, vs_pool = paged_forward_window(
                params, k_pool, v_pool, table, seg, pos, config, precision,
                backend, unroll, ks_pool=ks_pool, vs_pool=vs_pool,
                axis_name=axis_name, ring=ring,
            )
        else:
            hidden, k_pool, v_pool = paged_forward_window(
                params, k_pool, v_pool, table, seg, pos, config, precision,
                backend, unroll, axis_name=axis_name, ring=ring,
            )
        logits = logits_from_hidden(params, hidden, precision, backend)
        if gather_logits:
            logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
        targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, d)
        hist, tokens, pos, budget, active, emitted = _spec_commit(
            seg, targets, hist, tokens, pos, budget, active, d, S
        )
        if kv_quant:
            carry = (hist, tokens, pos, budget, active,
                     k_pool, ks_pool, v_pool, vs_pool)
        else:
            carry = (hist, tokens, pos, budget, active, k_pool, v_pool)
        return carry, emitted.T  # (d, B)

    if kv_quant:
        init = (hist, tokens, pos, budget, active,
                k_pool, ks_pool, v_pool, vs_pool)
    else:
        init = (hist, tokens, pos, budget, active, k_pool, v_pool)
    carry, emitted = jax.lax.scan(window, init, None, length=n_windows)
    if kv_quant:
        hist, tokens, pos, budget, active, k_pool, ks_pool, v_pool, vs_pool = carry
    else:
        hist, tokens, pos, budget, active, k_pool, v_pool = carry
    emitted = emitted.reshape(n_windows * d, B)
    packed = jnp.concatenate(
        [emitted, tokens[None], pos[None], active.astype(jnp.int32)[None]],
        axis=0,
    )
    return packed, k_pool, v_pool, ks_pool, vs_pool


_tick_spec_paged = partial(
    jax.jit,
    static_argnames=(
        "config", "precision", "backend", "n_windows", "d", "unroll",
        "axis_name", "gather_logits", "ring",
    ),
    donate_argnames=("k_pool", "v_pool", "ks_pool", "vs_pool"),
)(_tick_spec_paged_impl)


def _stage_write_impl(
    k_pool, v_pool, staging_k, staging_v, page_ids, row_ids, row0=0,
    *, bucket: int,
):
    """Move ``bucket`` staging-plane rows starting at ``row0`` into pages.

    One jitted program per bucket size: slicing/transposing/scattering
    eagerly per request re-specialized on every distinct prompt length,
    which costs a fresh (remote) compile per admission. ``row0`` is traced
    (prefix-cache hits skip the shared prefix without new specializations).
    Rows past the real length carry garbage; the host routes their coords
    to the scratch page. staging_*: (L, 1, KVH, S, hs); page_ids/row_ids:
    (bucket,).
    """

    def rows_of(staging):
        r = jax.lax.dynamic_slice_in_dim(staging[:, 0], row0, bucket, axis=2)
        return r.transpose(0, 2, 1, 3)  # (L, bucket, KVH, hs)

    from llama2_tpu.runtime.paged_cache import _write_rows

    k_pool = _write_rows(k_pool, rows_of(staging_k), page_ids, row_ids)
    v_pool = _write_rows(v_pool, rows_of(staging_v), page_ids, row_ids)
    return k_pool, v_pool


_stage_write = partial(
    jax.jit,
    static_argnames=("bucket",),
    donate_argnames=("k_pool", "v_pool"),
)(_stage_write_impl)


def _stage_write_q8_impl(
    k_pool, ks_pool, v_pool, vs_pool, staging_k, staging_v,
    page_ids, row_ids, row0=0, *, bucket: int,
):
    """INT8 variant of :func:`_stage_write`: the fp staging plane's rows
    quantize per (row, kv-head) on the way into the int8 pools — prefill
    stays in fp (one dense plane), quantization happens exactly once."""
    from llama2_tpu.ops.pallas.attention_q8 import quantize_kv_rows
    from llama2_tpu.runtime.paged_cache import _write_rows, _write_scale_rows

    def rows_of(staging):
        r = jax.lax.dynamic_slice_in_dim(staging[:, 0], row0, bucket, axis=2)
        return r.transpose(0, 2, 1, 3)  # (L, bucket, KVH, hs)

    k8, k_sc = quantize_kv_rows(rows_of(staging_k))  # (L,b,KVH,hs), (L,b,KVH)
    v8, v_sc = quantize_kv_rows(rows_of(staging_v))
    k_pool = _write_rows(k_pool, k8, page_ids, row_ids)
    v_pool = _write_rows(v_pool, v8, page_ids, row_ids)
    ks_pool = _write_scale_rows(ks_pool, k_sc, page_ids, row_ids)
    vs_pool = _write_scale_rows(vs_pool, v_sc, page_ids, row_ids)
    return k_pool, ks_pool, v_pool, vs_pool


_stage_write_q8 = partial(
    jax.jit,
    static_argnames=("bucket",),
    donate_argnames=("k_pool", "ks_pool", "v_pool", "vs_pool"),
)(_stage_write_q8_impl)


def _gather_prefix_impl(
    staging_k, staging_v, k_pool, v_pool, table, *, n: int,
    ks_pool=None, vs_pool=None,
):
    """Copy ``n`` cached prefix pages into the staging plane's first n*page
    rows so suffix prefill can attend to the shared prefix (dequantizing
    int8 pools on the way — the same values decode attention reads).
    Specialized per page count only."""
    L, P, KVH, ps, hs = k_pool.shape

    def plane(pool, spool):
        g = pool[:, table]  # (L, n, KVH, ps, hs)
        if spool is not None:
            from llama2_tpu.ops.pallas.attention_q8 import dequantize_kv

            g = dequantize_kv(g, spool[:, table])
        return (
            g.transpose(0, 2, 1, 3, 4).reshape(L, KVH, n * ps, hs)
        )

    staging_k = jax.lax.dynamic_update_slice(
        staging_k, plane(k_pool, ks_pool)[:, None].astype(staging_k.dtype),
        (0, 0, 0, 0, 0),
    )
    staging_v = jax.lax.dynamic_update_slice(
        staging_v, plane(v_pool, vs_pool)[:, None].astype(staging_v.dtype),
        (0, 0, 0, 0, 0),
    )
    return staging_k, staging_v


_gather_prefix = partial(jax.jit, static_argnames=("n",))(_gather_prefix_impl)


class PagedBatchEngine(BatchEngine):
    """BatchEngine with a paged KV cache (slot planes -> page tables)."""

    _DENSE_CACHE = False  # pools replace slot planes; see BatchEngine
    _SHARD_MAP_TICKS = False  # flipped per instance in __init__ when the
    # (data, model) mesh path engages (parallel/dp_paged.py); an ineligible
    # mesh + pallas downgrades (loudly) to the XLA paged path

    def __init__(
        self,
        config: ModelConfig,
        params: dict,
        batch_size: int = 8,
        n_pages: int | None = None,
        page_size: int = 256,
        prefix_cache: bool = False,
        **kw,
    ):
        # mesh-sharded pool path (parallel/dp_paged.py): pools shard their
        # page axis over ``data`` with per-shard allocators AND their
        # kv-head axis over ``model`` — pool bytes scale 1/(dp*tp) per
        # device; ticks run the single-chip fused kernels per shard under
        # shard_map (psum on wo/w2 + one logits all-gather when tp > 1).
        # Decided BEFORE super().__init__ so the base class keeps
        # backend="pallas" instead of downgrading.
        if n_pages is None:
            n_pages = max(
                batch_size, (batch_size * config.seq_len) // (2 * page_size)
            )
        self._dp = 0  # data shards for the page allocators (0 = global)
        self._tp = 1  # model shards of the kv-head axis
        self._mesh_ticks = False  # ticks/stage/gather via shard_map builders
        mesh = kw.get("mesh")
        if mesh is not None:
            from llama2_tpu.parallel.dp_paged import dp_pool_supported
            from llama2_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            dp = mesh.shape.get(DATA_AXIS, 1)
            tp = mesh.shape.get(MODEL_AXIS, 1)
            n_try = -(-n_pages // dp) * dp  # round capacity hints up
            ok, why = dp_pool_supported(
                mesh, batch_size, n_try, config=config, params=params,
                backend=kw.get("backend", "xla"),
            )
            if ok:
                self._dp = dp if dp > 1 else 0
                self._tp = tp
                self._mesh_ticks = True
                n_pages = n_try
                # the base class re-runs tp_pallas_supported (same check
                # dp_pool_supported made for tp > 1) and sets fwd_mesh, so
                # pallas is NOT downgraded and prefill gets the shard_map
                # forward
                self._SHARD_MAP_TICKS = True
            elif dp > 1:
                import warnings

                warnings.warn(
                    f"paged pool REPLICATES over data (memory does not "
                    f"scale with dp): {why}",
                    stacklevel=2,
                )
        super().__init__(config, params, batch_size=batch_size, **kw)
        if (
            self.kv_quant
            and self.backend.startswith("pallas")
            and page_size % 128 != 0
        ):
            # the q8 paged kernel's RMW scale window is one 128-lane tile
            raise ValueError(
                "paged INT8 KV with pallas kernels requires "
                f"page_size % 128 == 0 (got {page_size})"
            )
        self.page_size = page_size
        self.pool = self._shard(PagePool.create(
            config, n_pages, page_size, self.dtype, lane_pad=self.lane_pad,
            kv_quant=self.kv_quant,
        ))
        # page 0 is the scratch page: inactive slots' table rows are all 0,
        # so their frozen-position decode writes land there and never corrupt
        # a live request's pages (the paged analog of the dense engine's
        # inactive-slot contract). Page ids are LOCAL under dp sharding —
        # each shard's own page 0 is its scratch page.
        self._init_free_lists()
        self.max_pages = -(-config.seq_len // page_size)
        self._tables = np.zeros((batch_size, self.max_pages), np.int32)
        self._slot_pages: list[list[int]] = [[] for _ in range(batch_size)]
        # pipelined-sync position projection (host _pos + dispatched windows)
        self._pos_ahead = self._pos.copy()
        # vLLM-style automatic prefix caching: full prompt-prefix pages are
        # shared across requests (runtime/paged_cache.PrefixCache). Pages
        # are shard-local under dp, so sharing is per data shard.
        from llama2_tpu.runtime.paged_cache import PrefixCache

        self.prefix = None
        if prefix_cache:
            # one cache per data shard under dp (pages are shard-local);
            # a single engine keeps the flat object (tests/metrics poke it)
            self.prefix = (
                [PrefixCache() for _ in range(self._dp)]
                if self._dp else PrefixCache()
            )
        self.metrics["prefix_hit_pages"] = 0
        # dense staging plane for prefill, sized ON DEMAND to the longest
        # admitted prompt (power-of-two buckets, min 128): a full-seq_len
        # fp32 plane costs 2.15 GB at 7B/S=2048 — HBM that belongs to the
        # page pool (it forced 128-row pages in the round-5 serving bench)
        self._staging = None
        # lazily-built shard_map programs for the dp path, keyed by statics
        self._dp_fns: dict = {}

    # ---- overrides ----

    def _shard(self, pool):
        """Shard the page pools over the engine's mesh: (page->data,
        kv-head->model) with per-shard allocators when the shard_map tick
        path is on (parallel/dp_paged.py), else kv-heads on model with the
        page axis replicated (parallel.sharding.pool_specs, GSPMD)."""
        if self.mesh is None:
            return pool
        if self._mesh_ticks:
            from llama2_tpu.parallel.dp_paged import shard_pool_dp

            return shard_pool_dp(pool, self.mesh)
        from llama2_tpu.parallel.sharding import shard_pool

        return shard_pool(pool, self.mesh)

    def _init_free_lists(self):
        """Host allocator state. Non-dp: one free list of global ids (page 0
        reserved as scratch). dp: per-shard lists of LOCAL ids, each shard's
        local page 0 reserved as its scratch page."""
        if self._dp:
            p_local = self.pool.n_pages // self._dp
            self._free = [
                list(range(p_local - 1, 0, -1)) for _ in range(self._dp)
            ]
            self.pool.free = []  # unused on the dp path
        else:
            self.pool.free = [p for p in self.pool.free if p != 0]

    def _shard_of(self, slot: int) -> int:
        """Data shard owning ``slot`` (slots shard in contiguous blocks,
        matching P('data') on the batch dim)."""
        return slot // (self.batch_size // self._dp) if self._dp else 0

    def _prefix_of(self, slot: int):
        if self.prefix is None:
            return None
        return self.prefix[self._shard_of(slot)] if self._dp else self.prefix

    @property
    def _capacity(self) -> int:
        """Pages one request can ever hold (its shard's pool minus scratch)."""
        n = self.pool.n_pages // self._dp if self._dp else self.pool.n_pages
        return n - 1

    def _rebuild(self):
        self.pool = self._shard(PagePool.create(
            self.config, self.pool.n_pages, self.page_size, self.dtype,
            lane_pad=self.lane_pad, kv_quant=self.kv_quant,
        ))
        self._init_free_lists()
        if self.prefix is not None:
            for pfx in (self.prefix if self._dp else [self.prefix]):
                pfx.clear()
        self._tables[:] = 0
        self._slot_pages = [[] for _ in range(self.batch_size)]
        self._staging = None

    def _ensure_staging(self, rows: int):
        """Grow the prefill staging plane to cover ``rows`` positions."""
        import dataclasses as _dc

        S = self.config.seq_len
        need = 128
        while need < min(rows, S):
            need *= 2
        need = min(need, S)
        cur = 0 if self._staging is None else self._staging["k"].shape[3]
        if cur < need:
            self._staging = self._shard_staging(
                init_cache(
                    _dc.replace(self.config, seq_len=need), 1, self.dtype,
                    lane_pad=self.lane_pad,
                )
            )
        return self._staging

    def _shard_staging(self, staging):
        if self.mesh is None:
            return staging
        from llama2_tpu.parallel.sharding import shard_cache

        return shard_cache(staging, self.mesh)

    def _alloc(self, n: int, slot: int) -> list[int]:
        """Allocate pages for ``slot`` (from its shard's pool under dp),
        evicting idle prefix-cache pages under pressure (refcount-0 pages
        return to the free list LRU-first)."""
        if self._dp:
            free = self._free[self._shard_of(slot)]
        else:
            free = self.pool.free
        pfx = self._prefix_of(slot)
        if pfx is not None and len(free) < n and pfx.evictable:
            free.extend(pfx.evict(n - len(free)))
        if len(free) < n:
            raise OutOfPages(f"need {n} pages, {len(free)} free")
        return [free.pop() for _ in range(n)]

    def _free_now(self, slot: int) -> int:
        """Pages obtainable right now for ``slot`` (its shard's free list +
        evictable cache)."""
        free = self._free[self._shard_of(slot)] if self._dp else self.pool.free
        pfx = self._prefix_of(slot)
        return len(free) + (pfx.evictable if pfx is not None else 0)

    def _release_pages(self, pages: list[int], slot: int) -> None:
        """Return ``slot``'s pages to its shard's pool; shared prefix pages
        stay cached."""
        free = self._free[self._shard_of(slot)] if self._dp else self.pool.free
        pfx = self._prefix_of(slot)
        if pfx is None:
            free.extend(pages)
            return
        free.extend(p for p in pages if not pfx.release(p))

    def _dp_prog(self, key, builder):
        """Cache of the dp path's shard_map programs (parallel/dp_paged.py),
        keyed by their static parameters."""
        fn = self._dp_fns.get(key)
        if fn is None:
            fn = self._dp_fns[key] = builder()
        return fn

    def _start_request(self, slot: int, req: Request):
        # prefill writes pools/tables/mirrors outside the pipelined chain:
        # flush any in-flight windows first (see BatchEngine._drain)
        self._drain(0)
        if req.admitted_at is None:  # re-admissions keep the first stamp
            req.admitted_at = time.perf_counter()
        if self._mesh_ticks:
            from llama2_tpu.parallel import dp_paged
        else:
            dp_paged = None
        # preempt-and-recompute re-admission: replay the already-emitted
        # stream (teacher-forced prefill of prompt + generated) so the
        # continuation resumes at the same position — a preempted sampled
        # request keeps its tokens instead of resampling from the prompt
        resume = req.ttft_s is not None and len(req.tokens) > len(req.prompt)
        prompt = req.prompt
        if resume:
            steps = req.steps
            feed = np.asarray([BOS] + req.tokens[:-1], dtype=np.int32)
        else:
            steps = req.gen.resolve_steps(self.config.seq_len)
            echo = prompt[: prompt.index(BOS)] if BOS in prompt else prompt
            if len(echo) >= steps or len(echo) < len(prompt):
                req.tokens = echo[: min(len(echo), steps)]
                self._finish(slot_req=req)
                return
            feed = np.asarray([BOS] + prompt, dtype=np.int32)

        # prefix-cache hits: longest chain of cached FULL pages matching the
        # feed (capped at len(feed)-1 so at least one token always prefills
        # and the first-token logits exist)
        ps = self.page_size
        hits: list[int] = []
        pfx = self._prefix_of(slot)
        if pfx is not None:
            while (len(hits) + 1) * ps <= len(feed) - 1:
                page = pfx.lookup(
                    feed[: (len(hits) + 1) * ps].tobytes()
                )
                if page is None:
                    break
                hits.append(page)
        p0 = len(hits) * ps

        # admission control: stream pages + one spare for decode growth.
        # ``need`` is what must come off the free list now (hit pages are
        # already resident and referenced); the can-NEVER-fit test uses the
        # stream's total residency, independent of hits.
        total = self.pool.pages_for(len(feed)) + 1
        need = total - len(hits)
        if total > self._capacity:  # shard pool minus the scratch page
            self._release_pages(hits, slot)
            if resume:
                # the grown stream genuinely cannot fit the pool even empty:
                # return the tokens it has rather than erroring them away
                self._finish(slot_req=req)
            else:
                req.result_q.put(
                    OutOfPages(
                        f"prompt needs {total} pages; pool holds "
                        f"{self.pool.n_pages - 1} — raise n_pages/page_size"
                    )
                )
            return
        if self._free_now(slot) < need:
            # not enough memory right now: retry ahead of newer arrivals
            # once running slots retire (capacity check rules out livelock)
            self._release_pages(hits, slot)
            self._requeue.append(req)
            return

        # prefill through the shared dense staging plane: stale rows from
        # the previous tenant are never read (attention masks to <= pos and
        # garbage rows past the prompt route to the scratch page). A cached
        # prefix is copied in first so the suffix attends to it; prefill
        # then starts at p0.
        staging = self._ensure_staging(len(feed))
        if p0:
            if self._mesh_ticks:
                fn = self._dp_prog(
                    ("gather", len(hits)),
                    lambda: dp_paged.build_gather_prefix_dp(
                        self.mesh, self.kv_quant, n=len(hits)
                    ),
                )
                args = [staging["k"], staging["v"], self.pool.k, self.pool.v,
                        jnp.asarray(np.asarray(hits, np.int32)),
                        jnp.int32(self._shard_of(slot))]
                if self.kv_quant:
                    args += [self.pool.ks, self.pool.vs]
                sk, sv = fn(*args)
            else:
                sk, sv = _gather_prefix(
                    staging["k"], staging["v"], self.pool.k, self.pool.v,
                    jnp.asarray(np.asarray(hits, np.int32)), n=len(hits),
                    ks_pool=self.pool.ks, vs_pool=self.pool.vs,
                )
            staging = {**staging, "k": sk, "v": sv}
            self.metrics["prefix_hit_pages"] += len(hits)
        pos = p0
        logits = None
        remaining = feed[p0:]
        from llama2_tpu.runtime.batch_engine import PREFILL_CHUNKS

        while len(remaining):
            for c in PREFILL_CHUNKS:
                if len(remaining) >= c:
                    seg = remaining[:c]
                    # mesh engines prefill through the SAME shard_map
                    # forward the dense engine uses (fwd_mesh set =>
                    # parallel/tp.run_layers_sharded: per-shard pallas
                    # kernels, psum reduces, tp-sharded staging heads;
                    # fwd_mesh None => plain forward, GSPMD from the input
                    # shardings — covers the XLA dp-only mesh)
                    hidden, staging = forward(
                        self.params, staging, jnp.asarray(seg[None, :]),
                        jnp.int32(pos), self.config, self.precision,
                        self.backend, 1, self.fwd_mesh,
                    )
                    logits = logits_from_hidden(
                        self.params, hidden[:, -1, :], self.precision,
                        self.backend, self.fwd_mesh,
                    )[0]
                    pos += len(seg)
                    remaining = remaining[len(seg):]
                    break

        # move the staged KV rows [p0, pos) into freshly allocated pages —
        # one jitted program per power-of-two bucket; garbage rows outside
        # the real range route to the scratch page (page 0). The slot's
        # logical table is hit pages followed by the new ones.
        import dataclasses as _dc

        from llama2_tpu.runtime.paged_cache import _bucket

        pages = self._alloc(self.pool.pages_for(pos) - len(hits), slot)
        full = hits + pages
        table = np.asarray(full, np.int32)
        bucket = min(_bucket(pos - p0), self.config.seq_len)
        # start the window at p0 when it fits, else shift it back (the rows
        # before p0 are already in shared pages; they mask to scratch)
        row0 = max(0, min(p0, self.config.seq_len - bucket))
        logical = row0 + np.arange(bucket)
        real = (logical >= p0) & (logical < pos)
        page_idx = np.minimum(logical // self.page_size, len(full) - 1)
        pids = np.where(real, table[page_idx], 0).astype(np.int32)
        rids = np.where(real, logical % self.page_size, 0).astype(np.int32)
        if self._mesh_ticks:
            # shard_map stage write: only slot's shard writes real coords,
            # other shards route the same rows to THEIR scratch page
            fn = self._dp_prog(
                ("stage", bucket),
                lambda: dp_paged.build_stage_write_dp(
                    self.mesh, self.kv_quant, bucket=bucket
                ),
            )
            shard = jnp.int32(self._shard_of(slot))
            if self.kv_quant:
                k_pool, ks_pool, v_pool, vs_pool = fn(
                    self.pool.k, self.pool.ks, self.pool.v, self.pool.vs,
                    staging["k"], staging["v"],
                    jnp.asarray(pids), jnp.asarray(rids), jnp.int32(row0),
                    shard,
                )
                self.pool = _dc.replace(
                    self.pool, k=k_pool, ks=ks_pool, v=v_pool, vs=vs_pool
                )
            else:
                k_pool, v_pool = fn(
                    self.pool.k, self.pool.v, staging["k"], staging["v"],
                    jnp.asarray(pids), jnp.asarray(rids), jnp.int32(row0),
                    shard,
                )
                self.pool = _dc.replace(self.pool, k=k_pool, v=v_pool)
        elif self.kv_quant:
            k_pool, ks_pool, v_pool, vs_pool = _stage_write_q8(
                self.pool.k, self.pool.ks, self.pool.v, self.pool.vs,
                staging["k"], staging["v"],
                jnp.asarray(pids), jnp.asarray(rids), jnp.int32(row0),
                bucket=bucket,
            )
            self.pool = _dc.replace(
                self.pool, k=k_pool, ks=ks_pool, v=v_pool, vs=vs_pool
            )
        else:
            k_pool, v_pool = _stage_write(
                self.pool.k, self.pool.v, staging["k"], staging["v"],
                jnp.asarray(pids), jnp.asarray(rids), jnp.int32(row0),
                bucket=bucket,
            )
            self.pool = _dc.replace(self.pool, k=k_pool, v=v_pool)

        # register this stream's newly-FULL pages so future admissions can
        # share them (a duplicate key means an identical prompt beat us to
        # it; that page stays private and frees normally at retire)
        if pfx is not None:
            for j in range(len(hits), pos // ps):
                pfx.register(feed[: (j + 1) * ps].tobytes(), full[j])

        if resume:
            first = req.tokens[-1]  # already emitted; its KV writes next tick
        else:
            first = self._sample_first(logits, req, pos - 1)
        first_admission = req.ttft_s is None  # preemption re-admits
        if first_admission:
            req.ttft_s = time.perf_counter() - req.submitted_at
        if not resume:
            req.tokens = list(prompt)
            req.steps = steps
            if first == BOS:
                self._release_pages(full, slot)
                self._finish(slot_req=req)
                return
            req.tokens.append(first)  # len(prompt) < steps here (echo check)
        if len(req.tokens) >= steps:
            self._release_pages(full, slot)
            self._finish(slot_req=req)
            return
        self.slots[slot] = req
        self._slot_pages[slot] = full
        self._tables[slot, : len(full)] = full
        self._tokens[slot] = first
        self._pos[slot] = pos
        self._seed_keys[slot] = self._request_key(req)
        self._temp[slot] = req.gen.temperature if req.gen.temperature > 0 else 1.0
        self._topp[slot] = min(max(req.gen.top_p, 0.0), 1.0)
        self._argmax[slot] = req.gen.temperature == 0.0
        if first_admission:
            self.metrics["requests"] += 1
            self.metrics["ttft"].append(req.ttft_s)
            qw = req.admitted_at - req.submitted_at
            self.metrics["queue_wait"].append(qw)
            self.metrics["prefill"].append(req.ttft_s - qw)

    def _grow_tables(self, K: int) -> None:
        """Ensure pages exist to cover each active slot's next K positions
        from the pipelined position projection (frozen slots still scatter
        at the precomputed coords — see _tick_paged — so the whole window
        must be backed). On memory pressure with windows in flight, flush
        the pipeline first (retires replayed there free pages, and pages
        must NEVER be released while an unread window may still write them)
        and retry before preempting."""
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            last_idx = min(
                (int(self._pos_ahead[slot]) + K - 1) // self.page_size,
                self.max_pages - 1,
            )
            need = last_idx + 1 - len(self._slot_pages[slot])
            if need > 0:
                try:
                    pgs = self._alloc(need, slot)
                except OutOfPages:
                    if self._inflight:
                        self._drain(0)
                        self._pos_ahead = self._pos.copy()
                        if self.slots[slot] is None:
                            continue  # retired during the flush
                        # the flush reset _pos_ahead: recompute the true
                        # requirement (the projected one was windows ahead)
                        last_idx = min(
                            (int(self._pos_ahead[slot]) + K - 1)
                            // self.page_size,
                            self.max_pages - 1,
                        )
                        need = last_idx + 1 - len(self._slot_pages[slot])
                        if need <= 0:
                            continue
                        try:
                            pgs = self._alloc(need, slot)
                        except OutOfPages:
                            self._preempt(slot, req)
                            continue
                    else:
                        self._preempt(slot, req)
                        continue
                base = len(self._slot_pages[slot])
                for j, pg in enumerate(pgs):
                    self._tables[slot, base + j] = pg
                self._slot_pages[slot].extend(pgs)

    def _preempt(self, slot: int, req):
        """Out of pages for ``slot`` (pipeline already flushed): vLLM-style
        preempt-and-recompute, or finish with what it has when alone."""
        self._release_slot(slot)
        others = any(
            r is not None and s != slot for s, r in enumerate(self.slots)
        )
        if others:
            # preempt-and-recompute: drop this request's pages, requeue it
            # (head of line) to restart once a retiring request frees
            # memory (recompute beats swapping on TPU: prefill is batched
            # MXU work, host transfers ride a slow link). req.tokens/steps
            # are KEPT: re-admission teacher-forces the emitted stream so
            # the continuation resumes in place.
            self.slots[slot] = None
            self._requeue.append(req)
            self.metrics["preempted"] += 1
        else:
            # alone and out of memory: the pool genuinely cannot hold this
            # request; return what it has
            self._finish(slot_req=req, slot=slot)

    def _decode_tick(self):
        active = np.asarray([r is not None for r in self.slots])
        if (
            self.spec_window
            and active.any()
            and not np.any(~self._argmax[active])
        ):
            self._spec_tick()
            return
        K = self.ticks_per_sync
        if self._chain is None:
            # fresh pipeline: the host mirrors are current
            self._pos_ahead = self._pos.copy()
        self._grow_tables(K)
        if not any(self.slots):
            self._drain(0)
            return
        self._dispatch_tick(np.asarray([r is not None for r in self.slots]))
        self._drain(self.pipeline_depth - 1)

    def _spec_tick(self):
        """Greedy speculative windows over the page pools (the paged twin of
        BatchEngine._decode_tick's spec branch): flush the pipeline (spec
        reads host histories and cannot chain), back every slot's table for
        the full window span — speculation's position advance is
        data-dependent, so the device computes write coords from the table
        and the host only guarantees the pages exist — then run the windows
        and replay the packed sync."""
        import dataclasses as _dc

        self._drain(0)
        self._pos_ahead = self._pos.copy()
        if not any(self.slots):
            return
        # a window span of pages must exist ahead of every active slot;
        # growth may preempt under memory pressure — recompute active after
        self._grow_tables(self.ticks_per_sync * self.spec_window)
        active = np.asarray([r is not None for r in self.slots])
        if not active.any():
            return
        S = self.config.seq_len
        hist = np.full((self.batch_size, S), -1, np.int32)
        for slot, req in enumerate(self.slots):
            if req is not None:
                hist[slot, : len(req.tokens)] = req.tokens[:S]
        statics = dict(
            config=self.config, precision=self.precision,
            backend=self.backend, n_windows=self.ticks_per_sync,
            d=self.spec_window, unroll=self.layer_unroll,
            ring=self.collective == "ring",
        )
        if self._mesh_ticks:
            from llama2_tpu.parallel import dp_paged

            fn = self._dp_prog(
                ("spec", self.ticks_per_sync, self.spec_window),
                lambda: dp_paged.build_spec_tick_dp(
                    self.mesh, self.params, self.kv_quant, **statics
                ),
            )
            pool_args = (
                (self.pool.k, self.pool.ks, self.pool.v, self.pool.vs)
                if self.kv_quant else (self.pool.k, self.pool.v)
            )
            packed, k_pool, v_pool, ks_pool, vs_pool = fn(
                self.params, *pool_args,
                jnp.asarray(self._tables), jnp.asarray(hist),
                jnp.asarray(self._tokens), jnp.asarray(self._pos),
                jnp.asarray(self._host_budget()), jnp.asarray(active),
            )
        else:
            packed, k_pool, v_pool, ks_pool, vs_pool = _tick_spec_paged(
                self.params, self.pool.k, self.pool.v,
                jnp.asarray(self._tables), jnp.asarray(hist),
                jnp.asarray(self._tokens), jnp.asarray(self._pos),
                jnp.asarray(self._host_budget()), jnp.asarray(active),
                ks_pool=self.pool.ks, vs_pool=self.pool.vs, **statics,
            )
        self.pool = _dc.replace(
            self.pool, k=k_pool, v=v_pool, ks=ks_pool, vs=vs_pool
        )
        self._replay(np.asarray(packed))
        self._pos_ahead = self._pos.copy()

    def _dispatch_tick(self, active: np.ndarray):
        """Paged twin of BatchEngine._dispatch_tick: window inputs chain
        from the previous window's device outputs; write coords project
        from the host-side position projection (frozen slots harmlessly
        overwrite ahead of their final pos, within their own pages)."""
        K = self.ticks_per_sync
        win = self._pos_ahead[None, :] + np.arange(K)[:, None]  # (K, B)
        win = np.minimum(win, self.config.seq_len - 1)
        page_ids = self._tables[
            np.arange(self.batch_size)[None, :], win // self.page_size
        ].astype(np.int32)
        row_ids = (win % self.page_size).astype(np.int32)
        if self._chain is not None:
            tokens, pos, budget, chain_active = self._chain
        else:
            tokens = jnp.asarray(self._tokens)
            pos = jnp.asarray(self._pos)
            budget = jnp.asarray(self._host_budget())
            chain_active = jnp.asarray(active)

        stochastic = bool(np.any(~self._argmax[active])) if active.any() else False
        statics = dict(
            config=self.config, precision=self.precision,
            backend=self.backend, n_ticks=K, stochastic=stochastic,
            unroll=self.layer_unroll, ring=self.collective == "ring",
        )
        if self._mesh_ticks:
            from llama2_tpu.parallel import dp_paged

            fn = self._dp_prog(
                ("tick", K, stochastic),
                lambda: dp_paged.build_tick_dp(
                    self.mesh, self.params, self.kv_quant, **statics
                ),
            )
            pool_args = (
                (self.pool.k, self.pool.ks, self.pool.v, self.pool.vs)
                if self.kv_quant else (self.pool.k, self.pool.v)
            )
            packed, budget, k_pool, v_pool, ks_pool, vs_pool = fn(
                self.params, *pool_args,
                jnp.asarray(self._tables), tokens, pos, budget,
                jnp.asarray(page_ids), jnp.asarray(row_ids),
                jnp.asarray(self._temp), jnp.asarray(self._topp),
                jnp.asarray(self._argmax), chain_active,
                jnp.asarray(self._seed_keys),
            )
        else:
            packed, budget, k_pool, v_pool, ks_pool, vs_pool = _tick_paged(
                self.params, self.pool.k, self.pool.v,
                jnp.asarray(self._tables), tokens, pos, budget,
                jnp.asarray(page_ids), jnp.asarray(row_ids),
                jnp.asarray(self._temp), jnp.asarray(self._topp),
                jnp.asarray(self._argmax), chain_active,
                jnp.asarray(self._seed_keys),
                ks_pool=self.pool.ks, vs_pool=self.pool.vs, **statics,
            )
        self.pool.k, self.pool.v = k_pool, v_pool
        self.pool.ks, self.pool.vs = ks_pool, vs_pool
        self._chain = (packed[-3], packed[-2], budget, packed[-1].astype(bool))
        self._inflight.append(packed)
        self._pos_ahead = np.minimum(
            self._pos_ahead + K, self.config.seq_len - 1
        )

    def _on_retire(self, slot: int) -> None:
        self._release_slot(slot)

    def _release_slot(self, slot: int):
        self._release_pages(self._slot_pages[slot], slot)
        self._slot_pages[slot] = []
        self._tables[slot, :] = 0
