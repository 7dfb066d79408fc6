"""Continuous batching tests: batched decode must equal single-stream decode.

Argmax is deterministic, so every request processed through the slot-based
engine must produce exactly the tokens the single-request Generator produces
— even when requests of different lengths share the batch and slots are
reused (BASELINE config 4's correctness core)."""

import numpy as np
import pytest

from llama2_tpu.config import GenerationConfig
from llama2_tpu.io.checkpoint import load_checkpoint
from llama2_tpu.runtime.batch_engine import BatchEngine
from llama2_tpu.runtime.generator import Generator


@pytest.fixture(scope="module")
def engine_and_ref(tiny_checkpoint):
    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    ref = Generator(config, params)
    return config, params, ref


def test_batched_equals_single_stream(engine_and_ref):
    config, params, ref = engine_and_ref
    prompts = [[5, 17], [], [320, 9, 44], [7], [250, 4, 99, 2, 18]]
    gen = GenerationConfig(temperature=0.0, steps=24)

    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = BatchEngine(config, params, batch_size=3)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    results = [q.get(timeout=60) for q in queues]

    for p, want, got in zip(prompts, expected, results):
        assert got.tokens == want, f"prompt {p}: {got.tokens} != {want}"


@pytest.mark.parametrize("ticks", [4, 16])
def test_multi_tick_sync_token_identical(engine_and_ref, ticks):
    """ticks_per_sync batches device steps per host sync without changing
    any emitted token (freeze logic moves on device)."""
    config, params, ref = engine_and_ref
    prompts = [[5, 17], [], [320, 9, 44], [7]]
    gen = GenerationConfig(temperature=0.0, steps=21)  # not a tick multiple
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = BatchEngine(config, params, batch_size=2, ticks_per_sync=ticks)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for p, want, q in zip(prompts, expected, queues):
        got = q.get(timeout=60)
        assert got.tokens == want, f"prompt {p}: {got.tokens} != {want}"


def test_more_requests_than_slots(engine_and_ref):
    config, params, ref = engine_and_ref
    gen = GenerationConfig(temperature=0.0, steps=12)
    prompts = [[i + 2] for i in range(7)]
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = BatchEngine(config, params, batch_size=2)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for want, q in zip(expected, queues):
        assert q.get(timeout=60).tokens == want


def test_degenerate_requests(engine_and_ref):
    config, params, _ = engine_and_ref
    eng = BatchEngine(config, params, batch_size=2)
    q1 = eng.submit(list(range(2, 40)), GenerationConfig(temperature=0.0, steps=8))
    q2 = eng.submit([5, 1, 9], GenerationConfig(temperature=0.0, steps=16))
    eng.run_until_idle()
    assert q1.get(timeout=60).tokens == list(range(2, 10))  # echo truncated
    assert q2.get(timeout=60).tokens == [5]  # BOS inside prompt stops


def test_sampled_requests_complete(engine_and_ref):
    config, params, _ = engine_and_ref
    eng = BatchEngine(config, params, batch_size=2)
    gen = GenerationConfig(temperature=0.9, top_p=0.9, steps=16, seed=3)
    queues = [eng.submit([7], gen) for _ in range(3)]
    eng.run_until_idle()
    for q in queues:
        res = q.get(timeout=60)
        assert 1 <= len(res.tokens) <= 16
        assert all(0 <= t < config.vocab_size for t in res.tokens)


def test_metrics(engine_and_ref):
    config, params, _ = engine_and_ref
    eng = BatchEngine(config, params, batch_size=2)
    for _ in range(3):
        eng.submit([9], GenerationConfig(temperature=0.0, steps=6))
    eng.run_until_idle()
    assert eng.metrics["requests"] == 3
    pct = eng.ttft_percentiles()
    assert pct["p50"] is not None and pct["p50"] > 0
    # TTFT decomposes into queue wait + prefill (VERDICT r4 #9): with 3
    # requests on 2 slots, the third request's wait is real queueing
    assert len(eng.metrics["queue_wait"]) == 3
    assert len(eng.metrics["prefill"]) == 3
    for ttft, qw, pf in zip(
        eng.metrics["ttft"], eng.metrics["queue_wait"], eng.metrics["prefill"]
    ):
        assert qw >= 0 and pf >= 0
        assert abs(ttft - (qw + pf)) < 1e-6
    assert pct["queue_wait_p50"] is not None
    assert pct["prefill_p50"] is not None and pct["prefill_p50"] > 0


def test_background_thread(engine_and_ref):
    config, params, _ = engine_and_ref
    eng = BatchEngine(config, params, batch_size=2)
    eng.start()
    try:
        res = eng.generate([5], GenerationConfig(temperature=0.0, steps=8), timeout=120)
        assert len(res.tokens) >= 1
    finally:
        eng.stop()


def _crashing_engine(config, params, crash_on_ticks, **kw):
    """Engine whose _decode_tick raises on the given (1-based) tick calls."""
    eng = BatchEngine(config, params, batch_size=2, **kw)
    orig = eng._decode_tick
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] in crash_on_ticks:
            raise RuntimeError(f"injected device loss (tick {calls['n']})")
        return orig()

    eng._decode_tick = flaky
    return eng


def test_engine_failure_requeues_and_resumes(engine_and_ref):
    """A crashed tick rebuilds device state and RE-QUEUES in-flight requests
    (deterministic re-init, SURVEY.md section 5 failure row): the caller gets
    a complete, token-identical result, not an error — and tokens emitted
    before the crash are kept (teacher-forced replay), not regenerated."""
    config, params, ref = engine_and_ref
    gen = GenerationConfig(temperature=0.0, steps=8)
    want = ref.generate([5], gen).tokens

    eng = _crashing_engine(config, params, crash_on_ticks={3})
    eng.start()
    try:
        res = eng.generate([5], gen, timeout=120)
        assert res.tokens == want
        assert eng.metrics["recoveries"] == 1
        assert eng.metrics["requests"] == 1  # re-admission not double-counted
    finally:
        eng.stop()


def test_engine_failure_max_retries_zero_fails_caller(engine_and_ref):
    config, params, _ = engine_and_ref
    eng = _crashing_engine(config, params, crash_on_ticks={1}, max_retries=0)
    eng.start()
    try:
        q = eng.submit([5], GenerationConfig(temperature=0.0, steps=8))
        res = q.get(timeout=120)
        assert isinstance(res, RuntimeError)
        # engine recovered: next request completes
        res2 = eng.generate(
            [5], GenerationConfig(temperature=0.0, steps=8), timeout=120
        )
        assert len(res2.tokens) >= 1
    finally:
        eng.stop()


def test_engine_persistent_failure_gives_up_after_retries(engine_and_ref):
    """A poison request (every tick crashes) is errored to its caller after
    max_retries re-executions instead of looping forever."""
    config, params, _ = engine_and_ref
    eng = _crashing_engine(
        config, params, crash_on_ticks=set(range(1, 100)), max_retries=2
    )
    eng.start()
    try:
        q = eng.submit([5], GenerationConfig(temperature=0.0, steps=8))
        res = q.get(timeout=120)
        assert isinstance(res, RuntimeError)
        assert eng.metrics["recoveries"] == 3  # initial + 2 retries
    finally:
        eng.stop()


def test_admission_boundary_prompt_one_below_steps(engine_and_ref):
    """len(prompt) == steps-1: exactly one sampled token is emitted (the
    admission used to finish before appending it)."""
    config, params, ref = engine_and_ref
    gen = GenerationConfig(temperature=0.0, steps=3)
    for prompt in ([5, 6], [7, 8]):
        want = ref.generate(prompt, gen).tokens
        eng = BatchEngine(config, params, batch_size=2)
        q = eng.submit(prompt, gen)
        eng.run_until_idle()
        assert q.get(timeout=60).tokens == want
        assert len(want) == 3  # prompt + the boundary token


@pytest.mark.parametrize("ticks", [1, 8])
def test_full_seq_len_generation_matches_generator(engine_and_ref, ticks):
    """steps == seq_len (-n 0 default): the device freeze must not cut the
    final token, and mid-window freezes must still retire the slot."""
    config, params, ref = engine_and_ref
    gen = GenerationConfig(temperature=0.0, steps=0)  # model max
    prompt = [9, 4]
    want = ref.generate(prompt, gen).tokens
    eng = BatchEngine(config, params, batch_size=2, ticks_per_sync=ticks)
    q = eng.submit(prompt, gen)
    eng.run_until_idle()
    got = q.get(timeout=120).tokens
    assert got == want, f"ticks={ticks}: {len(got)} vs {len(want)} tokens"


def test_engine_with_int8_kv_cache(engine_and_ref):
    """The int8 KV cache flows through batched prefill + multi-tick decode;
    tokens track the fp32-cache single stream closely (quant noise only)."""
    config, params, ref = engine_and_ref
    gen = GenerationConfig(temperature=0.0, steps=20)
    prompts = [[5, 17], [7], [320, 9, 44]]
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = BatchEngine(config, params, batch_size=2, kv_quant=True,
                      ticks_per_sync=4)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for want, q in zip(expected, queues):
        got = q.get(timeout=60).tokens
        agree = sum(a == b for a, b in zip(got, want)) / max(len(want), 1)
        assert agree >= 0.7, f"{agree=} {got=} {want=}"


@pytest.mark.parametrize("d,windows", [(4, 1), (4, 4), (8, 2)])
def test_spec_engine_token_identical(engine_and_ref, d, windows):
    """Speculative windows in the batch engine emit exactly the plain
    greedy streams, across slot reuse and varied lengths."""
    config, params, ref = engine_and_ref
    prompts = [[5, 17], [], [320, 9, 44], [7], [250, 4, 99, 2, 18]]
    gen = GenerationConfig(temperature=0.0, steps=23)
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = BatchEngine(
        config, params, batch_size=2, spec_window=d, ticks_per_sync=windows
    )
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for p, want, q in zip(prompts, expected, queues):
        got = q.get(timeout=60).tokens
        assert got == want, f"prompt {p}: {got} != {want}"


def test_spec_engine_full_seq_len(engine_and_ref):
    config, params, ref = engine_and_ref
    gen = GenerationConfig(temperature=0.0, steps=0)  # model max
    want = ref.generate([9, 4], gen).tokens
    eng = BatchEngine(config, params, batch_size=2, spec_window=4,
                      ticks_per_sync=8)
    q = eng.submit([9, 4], gen)
    eng.run_until_idle()
    assert q.get(timeout=120).tokens == want


def test_spec_engine_mixed_batch_falls_back(engine_and_ref):
    """A stochastic request in the batch routes the sync through the plain
    tick; all streams stay correct."""
    config, params, ref = engine_and_ref
    g_greedy = GenerationConfig(temperature=0.0, steps=16)
    g_sampled = GenerationConfig(temperature=0.9, top_p=0.9, steps=16, seed=3)
    want = ref.generate([5, 17], g_greedy).tokens

    eng = BatchEngine(config, params, batch_size=2, spec_window=4)
    q1 = eng.submit([5, 17], g_greedy)
    q2 = eng.submit([7], g_sampled)
    eng.run_until_idle()
    assert q1.get(timeout=60).tokens == want
    r2 = q2.get(timeout=60)
    assert 1 <= len(r2.tokens) <= 16


def test_pipeline_depth_does_not_change_streams(engine_and_ref):
    """Pipelined sync (dispatch window k+1 before reading window k) must be
    a pure latency optimization: token streams identical at any depth, with
    retires + follow-on admissions happening mid-pipeline."""
    config, params, _ = engine_and_ref
    gen = GenerationConfig(temperature=0.0, steps=12)
    prompts = [[5, 7, 9], [3, 4], [11], [2, 6, 8, 10], [4]]

    def serve(depth):
        eng = BatchEngine(
            config, params, batch_size=2, ticks_per_sync=3,
            pipeline_depth=depth,
        )
        qs = [eng.submit(p, gen) for p in prompts]
        eng.run_until_idle()
        return [q.get(timeout=300).tokens for q in qs]

    base = serve(1)
    assert serve(2) == base
    assert serve(3) == base


def test_pipeline_depth_invariant_for_sampled_streams(engine_and_ref):
    """Depth-invariance must also hold for stochastic sampling: keys are
    fold_in(PRNGKey(request_seed), position) per slot, independent of how
    windows are batched or pipelined."""
    config, params, _ = engine_and_ref
    gen = GenerationConfig(temperature=0.9, top_p=0.85, steps=10, seed=7)
    prompts = [[5, 17], [320, 9], [7]]

    def serve(depth):
        eng = BatchEngine(
            config, params, batch_size=2, ticks_per_sync=2,
            pipeline_depth=depth, default_seed=7,
        )
        qs = [eng.submit(p, gen) for p in prompts]
        eng.run_until_idle()
        return [q.get(timeout=300).tokens for q in qs]

    assert serve(3) == serve(1)


def test_host_prngkey_matches_jax():
    """_host_prngkey must stay byte-identical to jax.random.PRNGKey (seeded
    engine streams must keep matching the single-stream Generator's)."""
    import jax

    from llama2_tpu.runtime.batch_engine import _host_prngkey

    for seed in (0, 1, 42, 123, 2**31 - 1, -1, -42, 2**32 + 5):
        np.testing.assert_array_equal(
            _host_prngkey(seed), np.asarray(jax.random.PRNGKey(seed)), seed
        )


def test_precompile_streams_identical_and_aot_used(engine_and_ref, monkeypatch):
    """precompile() warms the compile cache and stores PREFILL executables;
    the decode tick dispatches through jit (round 5: a lower().compile()
    tick executable ran the megakernel path ~2.5x slower than the same
    program via jit, so only prefill — no megakernel, once per admission —
    keeps the stored-executable fast path). Streams stay token-identical
    and prefill must not re-enter the jit path."""
    import llama2_tpu.runtime.batch_engine as be

    config, params, ref = engine_and_ref
    prompts = [[5, 17], [], [320, 9, 44], [7]]
    gen = GenerationConfig(temperature=0.0, steps=18)
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = BatchEngine(config, params, batch_size=2, ticks_per_sync=4)
    eng.precompile(prompt_lens=[len(p) for p in prompts], stochastic=(False,))
    assert ("tick", False) not in eng._aot  # warm-only, jit dispatch
    assert any(k[0] == "prefill" for k in eng._aot)

    monkeypatch.setattr(
        be, "_write_prefill", lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("_write_prefill jit path entered despite precompile"))
    )
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    results = [q.get(timeout=120) for q in queues]
    for p, want, got in zip(prompts, expected, results):
        assert got.tokens == want, f"prompt {p}: {got.tokens} != {want}"


def test_precompile_spec_variant(engine_and_ref):
    """The speculative window program is AOT-buildable and token-identical."""
    config, params, ref = engine_and_ref
    prompts = [[5, 17], [320, 9, 44]]
    gen = GenerationConfig(temperature=0.0, steps=16)
    expected = [ref.generate(p, gen).tokens for p in prompts]

    eng = BatchEngine(
        config, params, batch_size=2, ticks_per_sync=2, spec_window=4
    )
    eng.precompile(prompt_lens=[len(p) for p in prompts], spec=True)
    assert ("spec",) not in eng._aot  # warm-only (see tick rationale)
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    for p, want, q in zip(prompts, expected, queues):
        got = q.get(timeout=120)
        assert got.tokens == want, f"prompt {p}: {got.tokens} != {want}"
