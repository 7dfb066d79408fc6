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
from llama2_tpu.models.paged import paged_forward_step
from llama2_tpu.ops import sampling
from llama2_tpu.runtime.batch_engine import BOS, BatchEngine, Request
from llama2_tpu.runtime.paged_cache import OutOfPages, PagePool, write_segment


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend"),
    donate_argnames=("k_pool", "v_pool"),
)
def _tick_paged(
    params, k_pool, v_pool, table, tokens, pos, page_ids, row_ids,
    temperature, top_p, use_argmax, key,
    *, config: ModelConfig, precision, backend: str,
):
    hidden, k_pool, v_pool = paged_forward_step(
        params, k_pool, v_pool, table, tokens, pos, page_ids, row_ids,
        config, precision, backend,
    )
    logits = logits_from_hidden(params, hidden[:, -1, :], precision, backend)
    B = logits.shape[0]
    keys = jax.random.split(key, B)
    probs = sampling.probs_from_logits(logits, temperature[:, None])
    p_eff = jnp.where((top_p <= 0.0) | (top_p >= 1.0), 1.0, top_p)
    drawn = jax.vmap(sampling.sample_top_p)(probs, p_eff, keys)
    greedy = sampling.sample_argmax(logits)
    nxt = jnp.where(use_argmax, greedy, drawn)
    return nxt.astype(jnp.int32), k_pool, v_pool


class PagedBatchEngine(BatchEngine):
    """BatchEngine with a paged KV cache (slot planes -> page tables)."""

    def __init__(
        self,
        config: ModelConfig,
        params: dict,
        batch_size: int = 8,
        n_pages: int | None = None,
        page_size: int = 256,
        **kw,
    ):
        super().__init__(config, params, batch_size=batch_size, **kw)
        self.cache = None  # the dense slot cache is replaced by the pool
        self.page_size = page_size
        # default pool: half the dense layout's rows (the paging win)
        if n_pages is None:
            n_pages = max(
                batch_size, (batch_size * config.seq_len) // (2 * page_size)
            )
        self._lane_pad = (
            self.backend == "pallas" and config.head_size % 128 != 0
        )
        self.pool = PagePool.create(
            config, n_pages, page_size, self.dtype, lane_pad=self._lane_pad
        )
        # page 0 is the scratch page: inactive slots' table rows are all 0,
        # so their frozen-position decode writes land there and never corrupt
        # a live request's pages (the paged analog of the dense engine's
        # inactive-slot contract).
        self.pool.free = [p for p in self.pool.free if p != 0]
        self.max_pages = -(-config.seq_len // page_size)
        self._tables = np.zeros((batch_size, self.max_pages), np.int32)
        self._slot_pages: list[list[int]] = [[] for _ in range(batch_size)]
        # one dense staging plane for prefill (a single request's worst case)
        self._staging = init_cache(config, 1, self.dtype, lane_pad=self._lane_pad)

    # ---- overrides ----

    def _fail_all(self, err: Exception):
        for slot, req in enumerate(self.slots):
            if req is not None:
                req.result_q.put(err)
                self.slots[slot] = None
        while True:
            try:
                req = self.waiting.get_nowait()
            except queue.Empty:
                break
            req.result_q.put(err)
        self.pool = PagePool.create(
            self.config, self.pool.n_pages, self.page_size, self.dtype,
            lane_pad=self._lane_pad,
        )
        self.pool.free = [p for p in self.pool.free if p != 0]
        self._tables[:] = 0
        self._slot_pages = [[] for _ in range(self.batch_size)]

    def _start_request(self, slot: int, req: Request):
        steps = req.gen.resolve_steps(self.config.seq_len)
        prompt = req.prompt
        echo = prompt[: prompt.index(BOS)] if BOS in prompt else prompt
        if len(echo) >= steps or len(echo) < len(prompt):
            req.tokens = echo[: min(len(echo), steps)]
            self._finish(slot_req=req)
            return

        feed = np.asarray([BOS] + prompt, dtype=np.int32)
        # admission control: prompt pages + one spare for decode growth
        need = self.pool.pages_for(len(feed)) + 1
        if len(self.pool.free) < need:
            # not enough memory: requeue and let running slots retire first
            self.waiting.put(req)
            return

        # prefill through the dense staging plane (fresh per request)
        staging = jax.tree.map(jnp.zeros_like, self._staging)
        pos = 0
        logits = None
        remaining = feed
        from llama2_tpu.runtime.batch_engine import PREFILL_CHUNKS

        while len(remaining):
            for c in PREFILL_CHUNKS:
                if len(remaining) >= c:
                    seg = remaining[:c]
                    hidden, staging = forward(
                        self.params, staging, jnp.asarray(seg[None, :]),
                        jnp.int32(pos), self.config, self.precision,
                        self.backend,
                    )
                    logits = logits_from_hidden(
                        self.params, hidden[:, -1, :], self.precision,
                        self.backend,
                    )[0]
                    pos += len(seg)
                    remaining = remaining[len(seg):]
                    break

        # move the staged KV rows into freshly allocated pages
        pages = self.pool.alloc(self.pool.pages_for(pos))
        table = np.asarray(pages, np.int32)
        k_rows = jnp.transpose(  # (L, 1, KVH, S, hs) -> (L, T, KVH, hs)
            self._staging_rows(staging["k"], pos), (0, 2, 1, 3)
        )
        v_rows = jnp.transpose(
            self._staging_rows(staging["v"], pos), (0, 2, 1, 3)
        )
        self.pool = write_segment(self.pool, k_rows, v_rows, table, 0)

        first = self._sample_host(np.asarray(logits), req, pos - 1)
        req.ttft_s = time.perf_counter() - req.submitted_at
        req.tokens = list(prompt)
        req.steps = steps
        if first == BOS or pos >= steps:
            if first != BOS and pos < steps:
                req.tokens.append(first)
            self.pool.release(pages)
            self._finish(slot_req=req)
            return
        req.tokens.append(first)
        self.slots[slot] = req
        self._slot_pages[slot] = pages
        self._tables[slot, : len(pages)] = pages
        self._tokens[slot] = first
        self._pos[slot] = pos
        self._temp[slot] = req.gen.temperature if req.gen.temperature > 0 else 1.0
        self._topp[slot] = min(max(req.gen.top_p, 0.0), 1.0)
        self._argmax[slot] = req.gen.temperature == 0.0
        self.metrics["requests"] += 1
        self.metrics["ttft"].append(req.ttft_s)

    @staticmethod
    def _staging_rows(plane: jax.Array, T: int) -> jax.Array:
        """(L, 1, KVH, S, hs) -> (L, KVH, T, hs) first T positions."""
        return plane[:, 0, :, :T, :]

    def _decode_tick(self):
        # ensure the page for each active slot's write position exists
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            need_idx = int(self._pos[slot]) // self.page_size
            if need_idx >= len(self._slot_pages[slot]):
                try:
                    (pg,) = self.pool.alloc(1)
                except OutOfPages:
                    self._release_slot(slot)
                    others = any(
                        r is not None and s != slot
                        for s, r in enumerate(self.slots)
                    )
                    if others:
                        # preempt-and-recompute: drop this request's pages,
                        # requeue it to restart once a retiring request frees
                        # memory (recompute beats swapping on TPU: prefill is
                        # batched MXU work, host transfers ride a slow link)
                        self.slots[slot] = None
                        req.tokens = []
                        req.steps = 0
                        self.waiting.put(req)
                    else:
                        # alone and out of memory: the pool genuinely cannot
                        # hold this request; return what it has
                        self._finish(slot_req=req, slot=slot)
                    continue
                self._slot_pages[slot].append(pg)
                self._tables[slot, need_idx] = pg
        if not any(self.slots):
            return

        key = jax.random.fold_in(self._base_key, self._tick_idx)
        self._tick_idx += 1
        pos = jnp.asarray(self._pos)
        page_ids = jnp.asarray(
            self._tables[np.arange(self.batch_size), self._pos // self.page_size]
        )
        row_ids = jnp.asarray(self._pos % self.page_size, jnp.int32)
        nxt, k_pool, v_pool = _tick_paged(
            self.params, self.pool.k, self.pool.v,
            jnp.asarray(self._tables), jnp.asarray(self._tokens), pos,
            page_ids, row_ids,
            jnp.asarray(self._temp), jnp.asarray(self._topp),
            jnp.asarray(self._argmax), key,
            config=self.config, precision=self.precision,
            backend=self.backend,
        )
        self.pool.k, self.pool.v = k_pool, v_pool
        nxt = np.asarray(nxt)
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            self._pos[slot] += 1
            tok = int(nxt[slot])
            self.metrics["tokens"] += 1
            if tok == BOS:
                self._release_slot(slot)
                self._finish(slot_req=req, slot=slot)
                continue
            req.tokens.append(tok)
            self._tokens[slot] = tok
            if len(req.tokens) >= req.steps or self._pos[slot] + 1 >= self.config.seq_len:
                self._release_slot(slot)
                self._finish(slot_req=req, slot=slot)

    def _release_slot(self, slot: int):
        self.pool.release(self._slot_pages[slot])
        self._slot_pages[slot] = []
        self._tables[slot, :] = 0
