"""Paged continuous batching: token-identical to the dense engine, page
accounting under reuse, graceful behavior under memory pressure."""

import numpy as np
import pytest

from llama2_tpu.config import GenerationConfig
from llama2_tpu.io.checkpoint import load_checkpoint
from llama2_tpu.runtime.generator import Generator
from llama2_tpu.runtime.paged_engine import PagedBatchEngine


@pytest.fixture(scope="module")
def setup(tiny_checkpoint):
    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    ref = Generator(config, params)
    return config, params, ref


def test_paged_equals_single_stream(setup):
    config, params, ref = setup
    prompts = [[5, 17], [], [320, 9, 44], [7], [250, 4, 99, 2, 18]]
    gen = GenerationConfig(temperature=0.0, steps=24)
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = PagedBatchEngine(config, params, batch_size=3, page_size=8, n_pages=24)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for p, want, q in zip(prompts, expected, queues):
        got = q.get(timeout=60)
        assert got.tokens == want, f"prompt {p}: {got.tokens} != {want}"


def test_pages_released_on_retire(setup):
    config, params, _ = setup
    eng = PagedBatchEngine(config, params, batch_size=2, page_size=8, n_pages=16)
    free0 = len(eng.pool.free)
    gen = GenerationConfig(temperature=0.0, steps=10)
    queues = [eng.submit([i + 3], gen) for i in range(5)]
    eng.run_until_idle()
    for q in queues:
        q.get(timeout=60)
    assert len(eng.pool.free) == free0  # every page returned
    assert all(not p for p in eng._slot_pages)


def test_page_boundary_growth(setup):
    """Generation crossing page boundaries allocates and uses new pages."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=20)  # > 2 pages of 8
    want = ref.generate([9], gen).tokens
    eng = PagedBatchEngine(config, params, batch_size=1, page_size=8, n_pages=8)
    q = eng.submit([9], gen)
    eng.run_until_idle()
    assert q.get(timeout=60).tokens == want


def test_memory_pressure_requeues_admission(setup):
    """With pages for ~one request, requests are served one after another."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=12)
    prompts = [[4, 8, 15], [16, 23], [42]]
    expected = [ref.generate(p, gen).tokens for p in prompts]

    # 5 usable pages of 8 rows: enough for one 12-step request + spare only
    eng = PagedBatchEngine(config, params, batch_size=3, page_size=8, n_pages=6)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle(max_ticks=2000)
    for want, q in zip(expected, queues):
        assert q.get(timeout=60).tokens == want


def test_paged_multi_tick_token_identical(setup):
    """ticks_per_sync > 1 on the paged engine changes no emitted token."""
    config, params, ref = setup
    prompts = [[5, 17], [320, 9, 44], [7]]
    gen = GenerationConfig(temperature=0.0, steps=19)
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=8, n_pages=24,
        ticks_per_sync=8,
    )
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for p, want, q in zip(prompts, expected, queues):
        got = q.get(timeout=60)
        assert got.tokens == want, f"prompt {p}: {got.tokens} != {want}"
    assert all(not p for p in eng._slot_pages)  # pages all released


def test_scratch_page_never_allocated(setup):
    config, params, _ = setup
    eng = PagedBatchEngine(config, params, batch_size=2, page_size=8, n_pages=8)
    assert 0 not in eng.pool.free
    got = eng.pool.alloc(len(eng.pool.free))
    assert 0 not in got


def test_impossible_prompt_fails_fast(setup):
    """A prompt that can never fit the pool errors instead of spinning."""
    from llama2_tpu.runtime.paged_cache import OutOfPages

    config, params, _ = setup
    eng = PagedBatchEngine(config, params, batch_size=1, page_size=8, n_pages=4)
    q = eng.submit(list(range(2, 60)), GenerationConfig(temperature=0.0, steps=90))
    eng.run_until_idle(max_ticks=50)
    res = q.get(timeout=30)
    assert isinstance(res, OutOfPages)


@pytest.mark.parametrize("d,windows", [(4, 1), (4, 4), (8, 2)])
def test_paged_spec_token_identical(setup, d, windows):
    """Speculative windows over the page pools emit exactly the plain greedy
    streams — across slot reuse, page-boundary crossings mid-window, and
    varied lengths (page_size 8 < d*windows forces in-window growth)."""
    config, params, ref = setup
    prompts = [[5, 17], [], [320, 9, 44], [7], [250, 4, 99, 2, 18]]
    gen = GenerationConfig(temperature=0.0, steps=23)
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=8, n_pages=24,
        spec_window=d, ticks_per_sync=windows,
    )
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for p, want, q in zip(prompts, expected, queues):
        got = q.get(timeout=60).tokens
        assert got == want, f"prompt {p}: {got} != {want}"
    assert all(not p for p in eng._slot_pages)  # pages all released


def test_paged_spec_full_seq_len(setup):
    """steps == seq_len: draft windows overshoot past seq_len and must route
    to the scratch page without corrupting committed rows."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=0)  # model max
    want = ref.generate([9, 4], gen).tokens
    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=8,
        n_pages=2 * (config.seq_len // 8) + 4, spec_window=4,
        ticks_per_sync=8,
    )
    q = eng.submit([9, 4], gen)
    eng.run_until_idle()
    assert q.get(timeout=120).tokens == want


def test_paged_spec_int8_kv_matches_plain_paged(setup):
    """INT8 KV pools under speculation: committed rows quantize the same
    teacher-forced values the plain paged tick writes, so streams are
    token-identical to the plain INT8 paged engine."""
    config, params, _ = setup
    prompts = [[5, 17], [320, 9, 44], [7]]
    gen = GenerationConfig(temperature=0.0, steps=18)

    def serve(**kw):
        eng = PagedBatchEngine(
            config, params, batch_size=2, page_size=8, n_pages=24,
            kv_quant=True, **kw,
        )
        qs = [eng.submit(p, gen) for p in prompts]
        eng.run_until_idle()
        return [q.get(timeout=60).tokens for q in qs]

    assert serve(spec_window=4, ticks_per_sync=2) == serve()


def test_paged_spec_memory_pressure(setup):
    """Window-span page growth under a tiny pool preempts and recomputes;
    every stream still completes exactly."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=12)
    prompts = [[4, 8, 15], [16, 23], [42]]
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = PagedBatchEngine(
        config, params, batch_size=3, page_size=8, n_pages=6,
        spec_window=4, ticks_per_sync=2,
    )
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle(max_ticks=2000)
    for want, q in zip(expected, queues):
        assert q.get(timeout=60).tokens == want


def test_paged_spec_mixed_batch_falls_back(setup):
    """A stochastic request routes the sync through the plain paged tick;
    all streams stay correct."""
    config, params, ref = setup
    g_greedy = GenerationConfig(temperature=0.0, steps=16)
    g_sampled = GenerationConfig(temperature=0.9, top_p=0.9, steps=16, seed=3)
    want = ref.generate([5, 17], g_greedy).tokens

    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=8, n_pages=24, spec_window=4,
    )
    q1 = eng.submit([5, 17], g_greedy)
    q2 = eng.submit([7], g_sampled)
    eng.run_until_idle()
    assert q1.get(timeout=60).tokens == want
    r2 = q2.get(timeout=60)
    assert 1 <= len(r2.tokens) <= 16


def test_paged_spec_with_prefix_cache(setup):
    """Prefix sharing composes with speculative windows: identical prompts
    reuse cached pages and still emit the exact greedy stream."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=34)
    prompt = list(range(2, 22))  # > 2 full pages of 8
    want = ref.generate(prompt, gen).tokens

    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=8, n_pages=32,
        spec_window=4, ticks_per_sync=2, prefix_cache=True,
    )
    q1 = eng.submit(prompt, gen)
    q2 = eng.submit(prompt, gen)
    eng.run_until_idle()
    assert q1.get(timeout=60).tokens == want
    assert q2.get(timeout=60).tokens == want
    assert eng.metrics["prefix_hit_pages"] > 0


def test_paged_admission_boundary(setup):
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=3)
    want = ref.generate([5, 6], gen).tokens
    eng = PagedBatchEngine(config, params, batch_size=1, page_size=8, n_pages=8)
    q = eng.submit([5, 6], gen)
    eng.run_until_idle()
    assert q.get(timeout=60).tokens == want


def test_paged_engine_quantized_weights(setup):
    """INT8 stacked weights flow through the paged decode path (the layer
    index must reach every linear; a miss raises on 3D QuantTensors)."""
    from llama2_tpu.quant.q8 import quantize_params

    config, params, _ = setup
    qp = quantize_params(params)
    gen = GenerationConfig(temperature=0.0, steps=10)
    ref = Generator(config, qp).generate([7, 12], gen).tokens
    eng = PagedBatchEngine(config, qp, batch_size=2, page_size=8, n_pages=16)
    q = eng.submit([7, 12], gen)
    eng.run_until_idle()
    assert q.get(timeout=60).tokens == ref


def test_preemption_resumes_stream_in_place(setup):
    """A preempted request keeps its emitted tokens: re-admission replays
    prompt+generated (teacher-forced prefill) instead of restarting from the
    prompt, so the final stream extends the pre-preemption prefix verbatim
    (the vLLM recompute contract; ADVICE round-1 item 4)."""
    config, params, ref = setup

    snapshots = {}

    class Spy(PagedBatchEngine):
        def _decode_tick(self):
            before = {id(r): list(r.tokens) for r in self.slots if r is not None}
            n0 = self.metrics["preempted"]
            super()._decode_tick()
            if self.metrics["preempted"] > n0:
                for req in self._requeue:
                    snapshots.setdefault(id(req), list(req.tokens))

    # 9 usable pages of 4 rows = 36 rows; two 30-step streams need ~2x33
    gen = GenerationConfig(temperature=0.0, steps=30)
    prompts = [[4, 8], [15, 16]]
    expected = [ref.generate(p, gen).tokens for p in prompts]
    eng = Spy(config, params, batch_size=2, page_size=4, n_pages=10)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle(max_ticks=4000)
    results = [q.get(timeout=60) for q in queues]
    assert eng.metrics["preempted"] >= 1, "scenario must actually preempt"
    for want, got in zip(expected, results):
        assert got.tokens == want
    # every preempted request's final stream extends its snapshot verbatim
    assert snapshots
    all_tokens = [r.tokens for r in results]
    for snap in snapshots.values():
        assert any(t[: len(snap)] == snap for t in all_tokens)
    # metrics counted once per request despite re-admission
    assert eng.metrics["requests"] == len(prompts)
    assert len(eng.metrics["ttft"]) == len(prompts)


def test_preemption_threaded_loop_readmits(setup):
    """The background _loop gate must consider _requeue: a request requeued
    while all slots retire must still be re-admitted (ADVICE item 1)."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=30)
    prompts = [[4, 8], [15, 16]]
    expected = [ref.generate(p, gen).tokens for p in prompts]
    eng = PagedBatchEngine(config, params, batch_size=2, page_size=4, n_pages=10)
    eng.start()
    try:
        queues = [eng.submit(p, gen) for p in prompts]
        results = [q.get(timeout=120) for q in queues]
    finally:
        eng.stop()
    for want, got in zip(expected, results):
        assert not isinstance(got, Exception), got
        assert got.tokens == want


def test_fail_all_reaches_requeued_requests(setup):
    """_fail_all must deliver the error to requests parked in _requeue
    (ADVICE item 2) — in both engines."""
    import queue as _q

    from llama2_tpu.runtime.batch_engine import BatchEngine, Request

    config, params, _ = setup
    gen = GenerationConfig(temperature=0.0, steps=4)
    for eng in (
        BatchEngine(config, params, batch_size=1),
        PagedBatchEngine(config, params, batch_size=1, page_size=8, n_pages=8),
    ):
        req = Request(prompt=[5], gen=gen, result_q=_q.Queue())
        eng._requeue.append(req)
        boom = RuntimeError("backend lost")
        eng._fail_all(boom)
        assert req.result_q.get(timeout=5) is boom
        assert not eng._requeue


def test_paged_q8_engine_tracks_dense_q8(setup):
    """Paged INT8 KV serving vs the dense engine's INT8 KV cache: same
    per-row quantization (attention_q8.quantize_kv_rows) on both layouts, so
    the streams should agree near-totally (quantized decode paths may flip
    genuine near-ties; the dense engine quantizes prefill rows chunk-by-chunk
    while the paged engine quantizes once at stage time)."""
    from llama2_tpu.runtime.batch_engine import BatchEngine

    config, params, ref = setup
    prompts = [[5, 17], [], [320, 9, 44], [7]]
    gen = GenerationConfig(temperature=0.0, steps=20)

    dense = BatchEngine(config, params, batch_size=2, kv_quant=True)
    dq = [dense.submit(p, gen) for p in prompts]
    dense.run_until_idle()
    want = [q.get(timeout=60).tokens for q in dq]

    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=8, n_pages=24, kv_quant=True
    )
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    got = [q.get(timeout=60).tokens for q in queues]

    agree = tot = 0
    for w, g in zip(want, got):
        tot += max(len(w), len(g))
        agree += sum(a == b for a, b in zip(w, g))
    assert agree / max(tot, 1) >= 0.9, (want, got)


def test_prefix_cache_hits_are_token_identical(setup):
    """Automatic prefix caching: a repeated prompt re-uses the cached pages
    (prefill skips the shared prefix) and emits the exact same stream as the
    single-stream reference."""
    config, params, ref = setup
    prompt = [5, 17, 320, 9, 44, 7, 250, 4, 99, 2, 18, 31, 6, 77, 12]
    gen = GenerationConfig(temperature=0.0, steps=24)
    want = ref.generate(prompt, gen).tokens

    eng = PagedBatchEngine(
        config, params, batch_size=1, page_size=8, n_pages=24,
        prefix_cache=True,
    )
    q1 = eng.submit(prompt, gen)
    eng.run_until_idle()
    assert q1.get(timeout=60).tokens == want
    assert eng.metrics["prefix_hit_pages"] == 0  # cold cache
    assert eng.prefix.key2page  # prompt pages registered at retire

    q2 = eng.submit(prompt, gen)
    eng.run_until_idle()
    assert q2.get(timeout=60).tokens == want
    # BOS+15 tokens = 16 rows, hits capped at len(feed)-1 -> 1 full page
    assert eng.metrics["prefix_hit_pages"] >= 1
    assert eng.prefix.hits >= 1


def test_prefix_cache_shares_pages_across_live_slots(setup):
    """Two in-flight requests with the same prompt hold the SAME physical
    prefix pages (refcount 2), and decode growth never corrupts them."""
    config, params, ref = setup
    prompt = list(range(3, 3 + 20))
    gen = GenerationConfig(temperature=0.0, steps=32)
    want = ref.generate(prompt, gen).tokens

    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=8, n_pages=24,
        prefix_cache=True,
    )
    # admit both before ticking so they run concurrently
    queues = [eng.submit(prompt, gen) for _ in range(2)]
    eng._admit()
    shared = [
        p for p in eng._slot_pages[0]
        if p in eng._slot_pages[1] and p in eng.prefix.page2key
    ]
    assert shared, "second admission should reuse cached prefix pages"
    assert all(eng.prefix.refs[p] == 2 for p in shared)
    eng.run_until_idle()
    for q in queues:
        assert q.get(timeout=60).tokens == want
    # all refs dropped; shared pages stay cached (evictable), rest freed
    assert all(eng.prefix.refs[p] == 0 for p in eng.prefix.refs)
    usable = eng.pool.n_pages - 1  # minus scratch
    assert len(eng.pool.free) + len(eng.prefix.page2key) == usable


def test_prefix_cache_evicts_under_pressure(setup):
    """Idle cached pages return to the free list (LRU-first) when an
    admission or decode growth needs memory — caching never deadlocks the
    pool."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=12)
    # 7 usable pages of 4 rows; each ~12-token stream wants 4 pages
    eng = PagedBatchEngine(
        config, params, batch_size=1, page_size=4, n_pages=8,
        prefix_cache=True,
    )
    prompts = [list(range(2, 10)), list(range(40, 48)), list(range(80, 88))]
    for p in prompts:
        want = ref.generate(p, gen).tokens
        q = eng.submit(p, gen)
        eng.run_until_idle(max_ticks=2000)
        assert q.get(timeout=60).tokens == want
    # the pool cannot cache all three prompts' pages: eviction must have run
    usable = eng.pool.n_pages - 1
    assert len(eng.pool.free) + len(eng.prefix.page2key) == usable
    assert eng.prefix.evictable == len(eng.prefix.page2key)


def test_prefix_cache_q8_roundtrip(setup):
    """INT8 pools: cached prefix pages dequantize into the staging plane on
    a hit; the replayed stream stays near-identical to the cold run (the
    suffix attends to dequantized values, exactly what decode reads)."""
    config, params, _ = setup
    prompt = [5, 17, 320, 9, 44, 7, 250, 4, 99, 2, 18, 31, 6, 77, 12]
    gen = GenerationConfig(temperature=0.0, steps=20)
    eng = PagedBatchEngine(
        config, params, batch_size=1, page_size=8, n_pages=24,
        kv_quant=True, prefix_cache=True,
    )
    q1 = eng.submit(prompt, gen)
    eng.run_until_idle()
    cold = q1.get(timeout=60).tokens
    q2 = eng.submit(prompt, gen)
    eng.run_until_idle()
    warm = q2.get(timeout=60).tokens
    assert eng.metrics["prefix_hit_pages"] >= 1
    agree = sum(a == b for a, b in zip(cold, warm))
    assert agree / max(len(cold), len(warm), 1) >= 0.9, (cold, warm)


def test_paged_q8_preemption_completes(setup):
    """Memory pressure on the INT8 pools: preempt-and-recompute still
    completes every request and preserves each emitted prefix (recompute
    re-quantizes the replayed prefix, so post-resume continuations may
    legitimately differ from an unpreempted run — the vLLM recompute
    semantics under a lossy cache)."""
    config, params, ref = setup
    gen = GenerationConfig(temperature=0.0, steps=30)
    prompts = [[4, 8], [15, 16]]
    eng = PagedBatchEngine(
        config, params, batch_size=2, page_size=4, n_pages=10, kv_quant=True
    )
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle(max_ticks=4000)
    results = [q.get(timeout=60) for q in queues]
    for p, got in zip(prompts, results):
        assert not isinstance(got, Exception), got
        assert got.tokens[: len(p)] == p
        assert len(got.tokens) <= 30
    assert eng.metrics["requests"] == len(prompts)


def test_paged_pipeline_depth_does_not_change_streams(tiny_checkpoint):
    """Pipelined paged sync must be a pure latency optimization: streams
    identical at any depth, including under memory pressure (preemption
    flushes the pipeline before releasing pages)."""
    from llama2_tpu.io.checkpoint import load_checkpoint

    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    gen = GenerationConfig(temperature=0.0, steps=16)
    prompts = [[5, 7, 9], [3, 4], [11], [2, 6, 8, 10], [4, 12]]

    def serve(depth):
        eng = PagedBatchEngine(
            config, params, batch_size=2, page_size=8, n_pages=10,
            ticks_per_sync=3, pipeline_depth=depth,
        )
        qs = [eng.submit(p, gen) for p in prompts]
        eng.run_until_idle()
        out = [q.get(timeout=300).tokens for q in qs]
        return out, eng.metrics["preempted"]

    base, _ = serve(1)
    for depth in (2, 3):
        got, _ = serve(depth)
        assert got == base, depth


def test_preempted_sampled_stream_identical_to_unpreempted(setup):
    """A SAMPLED request preempted under memory pressure must produce the
    exact stream it would have produced un-preempted: the per-request PRNG
    base key pins to the Request at first admission and sampling keys fold
    by position, so recompute replays the same draws."""
    config, params, _ = setup
    gen = GenerationConfig(temperature=0.8, top_p=0.9, steps=24, seed=123)
    prompts = [[4, 8], [15, 16]]

    # roomy pool: no preemption — the reference streams
    roomy = PagedBatchEngine(config, params, batch_size=2, page_size=4,
                             n_pages=64)
    qs = [roomy.submit(p, gen) for p in prompts]
    roomy.run_until_idle(max_ticks=4000)
    want = [q.get(timeout=60).tokens for q in qs]

    # tight pool: forces preempt-and-recompute mid-stream
    tight = PagedBatchEngine(config, params, batch_size=2, page_size=4,
                             n_pages=9)
    qs = [tight.submit(p, gen) for p in prompts]
    tight.run_until_idle(max_ticks=4000)
    got = [q.get(timeout=60).tokens for q in qs]
    assert tight.metrics["preempted"] >= 1, "scenario must actually preempt"
    assert got == want
