"""Slot-based continuous batching engine.

Capability extension over the reference (batch size is hard-coded 1 there by
the data layout, SURVEY.md section 5 footnote) and BASELINE config 4: decode
requests share one batched KV cache of ``batch_size`` slots; each tick runs
ONE jitted decode step for all active slots — every slot at its own position
(per-row ``pos`` threading through forward/attention) — then new requests are
admitted into freed slots with chunked prefill.

Scheduling model (host thread):
  admit: pop waiting requests, prefill their prompt into a free slot's cache
         plane (power-of-two chunk decomposition bounds jit specializations),
         echo the prompt per reference semantics;
  tick:  one batched decode step; per-slot sampling (argmax and top-p both
         computed on device, selected per slot by flag — sampler mode is a
         per-request runtime value here, unlike the CLI's static mode);
  retire: a slot frees when its request samples BOS (main.zig:1016-1019) or
         hits its step limit.

Inactive slots keep decoding garbage at a frozen position; their writes land
at cache positions a future tenant either overwrites (pos < its length) or
never attends (pos beyond its causal window), so no masking is needed.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llama2_tpu.config import GenerationConfig, ModelConfig
from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
from llama2_tpu.ops import sampling

BOS = 1

PREFILL_CHUNKS = (128, 32, 8, 1)  # greedy power-of-two-ish decomposition


@dataclasses.dataclass
class Request:
    prompt: list[int]
    gen: GenerationConfig
    result_q: "queue.Queue"
    submitted_at: float = dataclasses.field(default_factory=time.perf_counter)
    # filled by the engine:
    tokens: list[int] = dataclasses.field(default_factory=list)
    ttft_s: float | None = None
    admitted_at: float | None = None  # first pulled off the queue (TTFT =
    # queue wait [admitted_at - submitted_at] + prefill [ttft - queue wait])
    steps: int = 0
    retries: int = 0  # engine-recovery re-executions consumed
    sample_key: "np.ndarray | None" = None  # per-request PRNG base key


@dataclasses.dataclass
class BatchResult:
    tokens: list[int]
    prompt_len: int
    ttft_s: float
    total_s: float
    # TTFT split (VERDICT r4 #9): admission-queue wait vs prefill+first-token
    # work — under a request wave p50 TTFT is dominated by queueing, which
    # says nothing about prefill cost unless reported separately
    queue_wait_s: float = 0.0
    prefill_s: float = 0.0


@partial(jax.jit, static_argnames=("mode",))
def _first_token(logits, temperature, top_p, key, *, mode: int):
    """First-token sample on device: the host fetches 4 bytes, not the
    whole vocab row (a full-logits fetch costs RTT + transfer per
    admission on a remote transport)."""
    return sampling.sample(logits, mode, temperature, top_p, key)


def _sample_batched(logits, temperature, top_p, use_argmax, keys, stochastic=True):
    """Per-slot sampler: argmax or nucleus, selected by runtime flag.

    ``keys``: per-slot (B, 2) PRNG keys — derived as
    ``fold_in(PRNGKey(request_seed), position)`` so a request's stochastic
    stream depends only on its own seed and emitted length, never on slot
    placement, batch composition, window boundaries, or sync pipelining
    (the same scheme as the first-token sampler and the single-stream
    Generator). ``stochastic=False`` (static) skips the nucleus path
    entirely: the full-vocab sort costs ~4 ms/tick for 8 slots and would
    otherwise run (then be discarded by the where) even for all-argmax
    batches.
    """
    greedy = sampling.sample_argmax(logits)
    if not stochastic:
        return greedy
    probs = sampling.probs_from_logits(logits, temperature[:, None])
    # top_p in {0,1} degenerates to plain multinomial (nucleus = full vocab),
    # so one nucleus sampler covers both stochastic modes per slot.
    p_eff = jnp.where((top_p <= 0.0) | (top_p >= 1.0), 1.0, top_p)
    drawn = jax.vmap(sampling.sample_top_p)(probs, p_eff, keys)
    return jnp.where(use_argmax, greedy, drawn).astype(jnp.int32)


def _slot_keys(base_keys, pos):
    """Per-slot sampling keys at the slots' current input positions."""
    return jax.vmap(jax.random.fold_in)(base_keys, pos)


def _host_prngkey(seed: int) -> np.ndarray:
    """jax.random.PRNGKey(seed) built host-side (no device round trip).
    Without jax_enable_x64 the seed converts to 32 bits, so the default
    threefry key is ``[0, uint32(seed)]`` — layout equality with the jax
    version is asserted by tests (seeded engine streams must keep matching
    the Generator's)."""
    return np.array([0, int(seed) & 0xFFFFFFFF], dtype=np.uint32)


def _spec_drafts(hist, tokens, pos, d: int, S: int):
    """Per-slot prompt-lookup draft segments continuing ``tokens``.

    For each slot, find the latest occurrence of its last committed token in
    its own emitted history (strictly before the current position) and take
    the d-1 tokens that followed it as drafts; where no occurrence or history
    exists the draft degenerates to repeating the token (always verified
    against the real targets, so wrong drafts only cost acceptance). Returns
    the (B, d) window input ``[last_token, draft_1..draft_{d-1}]``.
    """
    idx = jnp.arange(S)

    def draft_row(h, tok, p):
        match = (h == tok) & (idx < p - 1)
        j = jnp.max(jnp.where(match, idx, -1))
        outs = []
        for k in range(d - 1):
            t = h[jnp.clip(j + 1 + k, 0, S - 1)]
            outs.append(jnp.where((j >= 0) & (t >= 0), t, tok))
        return jnp.stack(outs)

    drafts = jax.vmap(draft_row)(hist, tokens, pos)  # (B, d-1)
    return jnp.concatenate([tokens[:, None], drafts], axis=1)  # (B, d)


def _spec_commit(seg, targets, hist, tokens, pos, budget, active, d: int, S: int):
    """Verify a speculative window and commit the accepted prefix per slot.

    ``seg`` is the (B, d) window input, ``targets`` its (B, d) per-position
    argmaxes. Draft i is verified by target i-1; the emitted tokens are the
    target prefix whose draft inputs matched, truncated at BOS / budget /
    inactive. Returns the updated ``(hist, tokens, pos, budget, active)``
    carry plus ``emitted`` (B, d) int32 with -1 where nothing was emitted
    (BOS itself is emitted so the host replay can retire the slot).
    """
    ok = seg[:, 1:] == targets[:, :-1]  # draft i verified by target i-1
    acc = 1 + jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)

    emit_idx = jnp.arange(d)[None, :]
    is_bos = targets == BOS
    before_bos = (jnp.cumsum(is_bos.astype(jnp.int32), axis=1) - is_bos) == 0
    keep = (
        (emit_idx < acc[:, None])
        & before_bos
        & ~is_bos
        & (emit_idx < budget[:, None])
        & active[:, None]
    )
    n_emit = jnp.sum(keep.astype(jnp.int32), axis=1)  # (B,)
    saw_bos = jnp.any((emit_idx < acc[:, None]) & is_bos & active[:, None], axis=1)

    emitted = jnp.where(keep, targets, -1)  # (B, d)
    # BOS must reach the host replay so it can retire the slot
    emitted = jnp.where(
        (emit_idx == n_emit[:, None]) & saw_bos[:, None], BOS, emitted
    )

    def write_hist(h, em, p):
        def one(k, hh):
            return jnp.where(
                em[k] >= 0, hh.at[jnp.clip(p + k, 0, S - 1)].set(em[k]), hh
            )
        return jax.lax.fori_loop(0, d, one, h)

    hist = jax.vmap(write_hist)(hist, jnp.where(keep, targets, -1), pos)
    last = jnp.clip(n_emit - 1, 0, d - 1)
    new_tok = jnp.take_along_axis(targets, last[:, None], axis=1)[:, 0]
    tokens = jnp.where(n_emit > 0, new_tok, tokens)
    pos = jnp.where(active, jnp.minimum(pos + n_emit, S - 1), pos)
    budget = budget - n_emit
    active = active & ~saw_bos & (n_emit == acc) & (budget > 0)
    return hist, tokens, pos, budget, active, emitted


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend", "n_windows", "d",
                     "unroll", "mesh", "collective"),
    donate_argnames=("cache",),
)
def _tick_spec(
    params,
    cache,  # padded past seq_len by >= d rows (draft overshoot space)
    hist,  # (B, seq_len) int32: per-slot emitted stream (prompt + generated)
    tokens,  # (B,) last committed token per slot (its KV already written)
    pos,  # (B,) position of that token
    budget,  # (B,) tokens each slot may still emit
    active,  # (B,) bool
    *,
    config: ModelConfig,
    precision,
    backend: str,
    n_windows: int = 1,
    d: int = 4,
    unroll: int = 1,
    mesh=None,
    collective=None,
):
    """Batched greedy speculative decode: each window commits up to ``d``
    tokens per ACTIVE slot with one (B, d) forward.

    Per slot the window feeds [last_token, draft_1..draft_{d-1}] at
    positions pos..pos+d-1 (drafts continue the latest occurrence of
    last_token in the slot's own history — prompt-lookup); targets are the
    per-position argmaxes, and the emitted tokens are the target prefix
    whose draft inputs matched. Identical streams to the plain tick by the
    same argument as generator._spec_decode_loop, per slot.

    When it pays: speculation's win is amortizing the weight stream over
    committed tokens — which a FULL batch already does across slots.
    Measured on v5e at batch 8 it LOSES to the plain multi-tick sync
    (verify compute scales with d while acceptance varies); use it for
    low-concurrency greedy serving (few active slots), not saturated
    batches. Defaults off.

    Returns ``(packed, cache)``: packed rows = emitted (n_windows*d, B)
    then tokens, pos, active — ONE host fetch per sync.
    """
    B = tokens.shape[0]
    S = config.seq_len

    def window(carry, _):
        hist, tokens, pos, budget, active, cache = carry
        seg = _spec_drafts(hist, tokens, pos, d, S)  # (B, d)
        hidden, cache = forward(
            params, cache, seg, pos, config, precision, backend, unroll,
            mesh, collective,
        )
        logits = logits_from_hidden(params, hidden, precision, backend, mesh)
        targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, d)
        hist, tokens, pos, budget, active, emitted = _spec_commit(
            seg, targets, hist, tokens, pos, budget, active, d, S
        )
        return (hist, tokens, pos, budget, active, cache), emitted.T  # (d, B)

    carry = (hist, tokens, pos, budget, active, cache)
    (hist, tokens, pos, budget, active, cache), emitted = jax.lax.scan(
        window, carry, None, length=n_windows
    )
    emitted = emitted.reshape(n_windows * d, B)
    packed = jnp.concatenate(
        [emitted, tokens[None], pos[None], active.astype(jnp.int32)[None]],
        axis=0,
    )
    return packed, cache


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend", "n_ticks", "stochastic",
                     "unroll", "mesh", "collective"),
    donate_argnames=("cache",),
)
def _tick(
    params,
    cache,
    tokens,  # (B,) int32 current input token per slot
    pos,  # (B,) int32 position of that token
    budget,  # (B,) int32 tokens each slot may still emit
    temperature,  # (B,) f32
    top_p,  # (B,) f32
    use_argmax,  # (B,) bool
    active,  # (B,) bool
    base_keys,  # (B, 2) per-request PRNGKey(seed) — folded by position
    *,
    config: ModelConfig,
    precision,
    backend: str,
    n_ticks: int = 1,
    stochastic: bool = True,
    unroll: int = 1,
    mesh=None,
    collective=None,
):
    """Run ``n_ticks`` batched decode steps on device per host sync.

    Per-slot freeze logic lives on device so one host round trip can carry
    many tokens — essential when the host link is slow (this environment's
    TPU tunnel costs ~25 ms per sync) and a throughput win everywhere. A
    slot freezes when it samples BOS (main.zig:1016-1019), exhausts its
    emit budget, or hits seq_len; frozen slots keep rewriting the same KV
    position with the same token, which is idempotent.

    Returns ``(emitted (n_ticks, B) int32 [-1 where frozen], tokens, pos,
    budget, active, cache)``.
    """

    def step(carry, i):
        tokens, pos, budget, active, cache = carry
        hidden, cache = forward(
            params, cache, tokens[:, None], pos, config, precision, backend,
            unroll, mesh, collective,
        )
        logits = logits_from_hidden(
            params, hidden[:, -1, :], precision, backend, mesh
        )
        nxt = _sample_batched(
            logits, temperature, top_p, use_argmax,
            _slot_keys(base_keys, pos), stochastic,
        )
        emitted = jnp.where(active, nxt, -1)
        is_bos = nxt == BOS
        # advance active, non-BOS slots; freeze the rest where they stand
        advance = active & ~is_bos
        budget = jnp.where(advance, budget - 1, budget)
        pos = jnp.where(advance, jnp.minimum(pos + 1, config.seq_len - 1), pos)
        tokens = jnp.where(advance, nxt, tokens)
        # budget (= steps - emitted so far, steps <= seq_len) bounds the walk,
        # so no separate seq_len freeze: cutting at pos+1 == seq_len would
        # drop the final token of a full-length generation
        active = advance & (budget > 0)
        return (tokens, pos, budget, active, cache), emitted

    (tokens, pos, budget, active, cache), emitted = jax.lax.scan(
        step, (tokens, pos, budget, active, cache), jnp.arange(n_ticks)
    )
    # pack everything the host reads into ONE array: each np.asarray of a
    # device array is a full host round trip on a remote transport. budget
    # returns separately so a pipelined caller can chain the next tick's
    # inputs from DEVICE arrays without a host fetch (see _dispatch_tick).
    packed = jnp.concatenate(
        [emitted, tokens[None], pos[None], active.astype(jnp.int32)[None]],
        axis=0,
    )
    return packed, budget, cache


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend", "mesh", "collective"),
    donate_argnames=("cache",),
)
def _write_prefill(
    params, cache, seg, pos, slot, *, config, precision, backend, mesh=None,
    collective=None,
):
    """Prefill a (1, T) segment into batch slot ``slot``; returns last logits.

    Runs the segment with a batch of 1 against the slot's cache plane (gathered
    out, then scattered back) — each distinct segment length is one jit
    specialization, bounded by PREFILL_CHUNKS.
    """
    plane = {k: jax.lax.dynamic_slice_in_dim(v, slot, 1, axis=1) for k, v in cache.items()}
    hidden, plane = forward(
        params, plane, seg, pos, config, precision, backend, 1, mesh, collective
    )
    cache = {
        k: jax.lax.dynamic_update_slice_in_dim(cache[k], plane[k], slot, axis=1)
        for k in cache
    }
    logits = logits_from_hidden(params, hidden[:, -1, :], precision, backend, mesh)
    return logits[0], cache


class BatchEngine:
    """Continuous batching over a fixed pool of KV-cache slots."""

    _DENSE_CACHE = True  # PagedBatchEngine overrides: pools replace slots
    # ticks run the model through forward(), which can shard_map the fused
    # pallas kernels over a mesh (parallel/tp.py); the paged engine's ticks
    # drive the page-table kernels directly and override this off until its
    # own shard_map composition lands
    _SHARD_MAP_TICKS = True

    def __init__(
        self,
        config: ModelConfig,
        params: dict,
        batch_size: int = 8,
        dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        backend: str = "xla",
        default_seed: int = 0,
        ticks_per_sync: int = 1,
        kv_quant: bool = False,
        spec_window: int = 0,
        mesh=None,
        max_retries: int = 1,
        pipeline_depth: int = 2,
        collective: str | None = None,
    ):
        self.config = config
        self.batch_size = batch_size
        # mesh: a (data, model) jax.sharding.Mesh — params tensor-shard over
        # ``model`` (column/row-parallel + vocab-sharded classifier), the KV
        # cache over (batch→data, kv-heads→model), and every tick runs as one
        # GSPMD program over all devices. Slots ARE the data axis: continuous
        # batching of decode requests across chips/hosts (SURVEY.md §5.7/5.8;
        # the scheduler stays a single host-side control loop, the standard
        # JAX multi-controller pattern replicates it per process).
        self.mesh = mesh
        # failure recovery (SURVEY.md §5, failure row): how many times an
        # in-flight request is re-executed after an engine crash before the
        # error is returned to its caller (guards against poison requests)
        self.max_retries = max_retries
        # decode steps per host round trip: 1 = lowest streaming latency;
        # raise it when host<->device sync is expensive relative to a step
        # (new tokens then arrive in bursts of up to this size)
        self.ticks_per_sync = max(1, ticks_per_sync)
        self.precision = precision
        # fwd_mesh: the mesh handed to forward() — opts the tick into the
        # explicit shard_map path (parallel/tp.py) where the fused pallas
        # kernels run per-shard (Mosaic is not GSPMD-partitionable, so this
        # is the ONLY way --mesh composes with --kernels pallas). None keeps
        # the plain GSPMD program driven by input shardings.
        self.fwd_mesh = None
        if collective not in (None, "ring"):
            raise ValueError(f"unknown collective {collective!r}")
        self.collective = collective
        if mesh is not None and collective == "ring":
            if not self._SHARD_MAP_TICKS:
                # paged engines set _SHARD_MAP_TICKS when dp_pool_supported
                # accepts the mesh (pallas backend + shardable pools) —
                # the ring region only exists inside the shard_map ticks
                raise ValueError(
                    "collective='ring' on a paged engine requires the "
                    "shard_map tick path (backend='pallas' and a "
                    "dp_pool_supported mesh)"
                )
            from llama2_tpu.parallel.tp import tp_ring_supported

            ok, why = tp_ring_supported(params, config, mesh)
            if not ok:
                raise ValueError(f"collective='ring' unsupported here: {why}")
            self.fwd_mesh = mesh
        elif mesh is not None and backend.startswith("pallas"):
            from llama2_tpu.parallel.tp import tp_pallas_supported

            ok, why = (
                tp_pallas_supported(params, config, mesh)
                if self._SHARD_MAP_TICKS
                else (False, "paged ticks drive the page-table kernels "
                             "directly (shard_map composition pending)")
            )
            if ok:
                self.fwd_mesh = mesh
            else:
                # no silent downgrades: say exactly why the fast path is off
                import warnings

                warnings.warn(
                    f"--mesh with --kernels {backend}: fused kernels cannot "
                    f"shard this model ({why}); falling back to the XLA "
                    "dequant path (measured ~9x slower on the weight stream)",
                    stacklevel=2,
                )
                backend = "xla"
        self.backend = backend
        self.dtype = jnp.dtype(dtype)
        self.params = jax.tree.map(
            # read .dtype directly: np.asarray(a) here would pull a sharded
            # or mmapped leaf entirely onto the host just to inspect it
            lambda a: jnp.asarray(a, self.dtype)
            if np.issubdtype(np.dtype(a.dtype), np.floating)
            else jnp.asarray(a),
            params,
        )
        # fuse QKV / W1-W3 kernel launches on the quantized pallas path,
        # exactly as the single-stream Generator does (decode there is
        # launch-bound; one read of x across co-located matmuls)
        from llama2_tpu.quant.q8 import QuantTensor

        if backend.startswith("pallas") and isinstance(self.params.get("wq"), QuantTensor):
            from llama2_tpu.models.llama import fuse_layer_params
            from llama2_tpu.parallel.mesh import MODEL_AXIS

            # under the shard_map path the QKV fusion is SHARD-BLOCKED so
            # each model-axis shard holds a self-contained [q|k|v] block
            shards = (
                self.fwd_mesh.shape[MODEL_AXIS]
                if self.fwd_mesh is not None
                else 1
            )
            self.params = fuse_layer_params(self.params, backend, shards)
        if mesh is not None:
            from llama2_tpu.parallel.sharding import shard_params

            self.params = shard_params(self.params, mesh)
        self.lane_pad = backend.startswith("pallas") and config.head_size % 128 != 0
        # layer-scan unroll rule (see Generator): full for shallow models,
        # rolled for deep pallas-heavy bodies (CLAUDE.md)
        self.layer_unroll = config.n_layers if config.n_layers <= 8 else 1
        # int8 KV cache: 4x more slots per HBM byte (attention_q8 kernel)
        self.kv_quant = kv_quant
        # spec_window >= 2: greedy speculative windows (ticks_per_sync then
        # counts WINDOWS, each committing up to spec_window tokens/slot);
        # used only when every active slot is argmax, else the plain tick
        self.spec_window = spec_window if spec_window >= 2 else 0
        # subclasses with their own KV layout (paged) skip the dense cache:
        # a B*S allocation made only to be discarded is a needless HBM spike
        self.cache = self._make_cache() if self._DENSE_CACHE else None
        self.waiting: "queue.Queue[Request]" = queue.Queue()
        # requests bounced by admission (e.g. paged memory pressure) retry
        # BEFORE newer arrivals or a large request starves behind small ones
        self._requeue: list[Request] = []
        self.slots: list[Request | None] = [None] * batch_size
        # host mirrors of device state
        self._tokens = np.zeros(batch_size, np.int32)
        self._pos = np.zeros(batch_size, np.int32)
        self._temp = np.ones(batch_size, np.float32)
        self._topp = np.full(batch_size, 0.9, np.float32)
        self._argmax = np.zeros(batch_size, bool)
        self.default_seed = default_seed
        # per-slot PRNGKey(request_seed) mirrors: sampling keys fold these
        # by position, so stochastic streams are scheduler-independent
        self._seed_keys = np.array(
            jax.vmap(jax.random.PRNGKey)(jnp.zeros(batch_size, jnp.uint32))
        )
        self._admit_count = 0  # unseeded requests get a distinct derived seed
        # pipelined sync state: dispatched-but-unread packed outputs, and
        # the last window's (tokens, pos, budget, active) DEVICE arrays the
        # next window chains from (see _dispatch_tick/_drain)
        self._inflight: list = []
        self._chain: tuple | None = None
        self.pipeline_depth = max(1, pipeline_depth)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # AOT-compiled executables from precompile(), keyed by program +
        # static variant; dispatch paths prefer these over the jit cache
        self._aot: dict = {}
        self.metrics = {
            "requests": 0, "tokens": 0, "ttft": [], "queue_wait": [],
            "prefill": [], "preempted": 0,
        }
        self._sampler_dev = None  # cached device copies of _temp/_topp/...

    def precompile(self, prompt_lens=(), stochastic=(False,), spec=False):
        """AOT-compile the engine's device programs from shapes only and
        store the executables; the dispatch paths then call them directly.

        Why this exists: the h2d weight upload is dispatched asynchronously,
        but the first request wave serializes tracing + (remote) XLA/Mosaic
        compilation BEHIND the multi-GB transfer. Compilation needs shapes,
        not values, so calling this right after construction runs the
        minutes-scale big-model compiles concurrently with the upload
        (cold-start engineering; the reference's analogous contract is
        "read checkpoint, go", main.zig:955-967). The jit cache itself
        cannot be pre-warmed: ``lower().compile()`` does not populate the
        dispatch cache (measured on this JAX), hence stored executables.

        ``prompt_lens``: prompt lengths whose PREFILL_CHUNKS decomposition
        to compile. ``stochastic``: which plain-tick sampler variants to
        build. ``spec=True`` also builds the speculative window program.
        """
        if self.mesh is not None:
            import warnings

            warnings.warn(
                "precompile: mesh engines keep the jit-cache path (AOT "
                "executables bake input shardings)", stacklevel=2,
            )
            return
        if self.cache is None:
            raise NotImplementedError(
                "precompile covers the dense engine; the paged ticks have "
                "their own programs"
            )
        B = self.batch_size

        def sds(*shape, dtype=jnp.int32):
            return jax.ShapeDtypeStruct(shape, dtype)

        tree_sds = lambda t: jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, jnp.dtype(a.dtype)), t
        )
        p_s, c_s = tree_sds(self.params), tree_sds(self.cache)
        keys_s = sds(B, 2, dtype=jnp.uint32)
        b_s = sds(B, dtype=jnp.bool_)
        statics = dict(
            config=self.config, precision=self.precision,
            backend=self.backend, mesh=self.fwd_mesh,
            collective=self.collective,
        )
        # NOTE round 5: the executables are compiled for WARMTH (the remote
        # compile service caches by content, so the first jit call after
        # this is fast) but NOT stored for dispatch. An executable built by
        # ``lower().compile()`` from ShapeDtypeStructs runs the whole-layer
        # megakernel tick ~2.5x slower than the identical program through
        # the jit path (measured 6.9 vs 2.7 ms/step at 1B scale; concrete-
        # array lowering only halves the gap) — the AOT path misses
        # layout/donation decisions the jit path gets right. Steady-state
        # decode beats cold-start latency, so dispatch stays on jit.
        for st in stochastic:
            _tick.lower(
                p_s, c_s, sds(B), sds(B), sds(B),
                sds(B, dtype=jnp.float32), sds(B, dtype=jnp.float32),
                b_s, b_s, keys_s,
                n_ticks=self.ticks_per_sync, stochastic=bool(st),
                unroll=self.layer_unroll, **statics,
            ).compile()
        if spec and self.spec_window:
            _tick_spec.lower(
                p_s, c_s, sds(B, self.config.seq_len), sds(B), sds(B),
                sds(B), b_s,
                n_windows=self.ticks_per_sync, d=self.spec_window,
                unroll=self.layer_unroll, **statics,
            ).compile()
        chunks: set[int] = set()
        for plen in prompt_lens:
            rem = plen + 1  # BOS + prompt, the _start_request feed
            while rem:
                for c in PREFILL_CHUNKS:
                    if rem >= c:
                        chunks.add(c)
                        rem -= c
                        break
        for c in sorted(chunks):
            self._aot[("prefill", c)] = _write_prefill.lower(
                p_s, c_s, sds(1, c), sds(), sds(), **statics
            ).compile()

    def _make_cache(self):
        cache = init_cache(
            self.config, self.batch_size, self.dtype,
            lane_pad=self.lane_pad, kv_quant=self.kv_quant,
        )
        if self.spec_window:
            # pad past seq_len so a draft window starting at the final
            # position never clamps onto committed KV rows; on pallas the
            # pad rounds up to a 128 multiple or the flash kernels' block
            # pickers degrade/reject the length (see generator)
            pad = self.spec_window
            if self.backend.startswith("pallas"):
                pad = -(-max(pad, 128) // 128) * 128
            cache = {
                k: jnp.pad(
                    v, [(0, 0)] * 3 + [(0, pad)] + [(0, 0)] * (v.ndim - 4)
                )
                for k, v in cache.items()
            }
        if self.mesh is not None:
            from llama2_tpu.parallel.sharding import shard_cache

            cache = shard_cache(cache, self.mesh)
        return cache

    # ---- public API ----

    def submit(self, prompt_tokens: list[int], gen: GenerationConfig) -> "queue.Queue":
        """Enqueue a request; returns a queue that yields the BatchResult."""
        req = Request(prompt=list(prompt_tokens), gen=gen, result_q=queue.Queue())
        self.waiting.put(req)
        return req.result_q

    def generate(self, prompt_tokens, gen, timeout=600) -> BatchResult:
        res = self.submit(prompt_tokens, gen).get(timeout=timeout)
        if isinstance(res, Exception):
            raise res
        return res

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=30)

    def run_until_idle(self, max_ticks: int = 100_000):
        """Synchronous drive (tests / batch jobs): process queue to completion."""
        while (
            not self.waiting.empty()
            or self._requeue
            or any(self.slots)
            or self._inflight
        ) and max_ticks > 0:
            self._step()
            max_ticks -= 1

    # ---- engine internals ----

    def _loop(self):
        while not self._stop.is_set():
            if (
                self.waiting.empty()
                and not self._requeue
                and not any(self.slots)
                and not self._inflight
            ):
                time.sleep(0.001)
                continue
            try:
                self._step()
            except Exception as e:  # noqa: BLE001 — failure detection:
                # rebuild device state (weights are read-only; the cache is
                # the only mutable device state) and re-queue in-flight
                # requests for deterministic re-execution; a request that
                # exhausts max_retries gets the error instead
                # (SURVEY.md section 5, failure row).
                self._recover(e)

    def _recover(self, err: Exception):
        """Simulated/real backend loss mid-tick: drop the (possibly poisoned)
        device state, rebuild it, and re-queue the in-flight requests ahead
        of newer arrivals — re-admission teacher-forces each request's
        already-emitted stream so it resumes in place. The waiting queue is
        untouched (those requests held no device state)."""
        # count BEFORE delivering any error: a caller woken by result_q.put
        # may read metrics immediately
        self.metrics["recoveries"] = self.metrics.get("recoveries", 0) + 1
        survivors = []
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            self.slots[slot] = None
            if req.retries >= self.max_retries:
                req.result_q.put(err)
            else:
                req.retries += 1
                survivors.append(req)
        for req in self._requeue:
            # requeued-but-unadmitted requests held no device state; keep them
            survivors.append(req)
        self._requeue = survivors
        # pipelined syncs reference the poisoned device state: drop them
        self._inflight = []
        self._chain = None
        self._rebuild()

    def _rebuild(self):
        """Recreate all mutable device state after a failure."""
        self.cache = self._make_cache()
        self._sampler_dev = None

    def _fail_all(self, err: Exception):
        self._inflight = []  # references the device state being discarded
        self._chain = None
        for slot, req in enumerate(self.slots):
            if req is not None:
                req.result_q.put(err)
                self.slots[slot] = None
        for req in self._requeue:
            req.result_q.put(err)
        self._requeue.clear()
        while True:
            try:
                req = self.waiting.get_nowait()
            except queue.Empty:
                break
            req.result_q.put(err)
        self._rebuild()

    def _step(self):
        self._admit()
        if any(self.slots):
            self._decode_tick()
        elif self._inflight:
            self._drain(0)

    def _admit(self):
        for slot in range(self.batch_size):
            if self.slots[slot] is not None:
                continue
            if self._requeue:
                req = self._requeue.pop(0)
            else:
                try:
                    req = self.waiting.get_nowait()
                except queue.Empty:
                    return
            self._start_request(slot, req)

    def _start_request(self, slot: int, req: Request):
        # re-admission after preemption or engine recovery: replay the
        # already-emitted stream (teacher-forced prefill of prompt +
        # generated) so the continuation resumes at the same position
        # instead of resampling from the prompt
        # prefill edits device/host state outside the pipelined chain:
        # flush any in-flight syncs first (no-op in the common path — the
        # scheduler admits only after a retire was replayed)
        self._drain(0)
        if req.admitted_at is None:  # re-admissions keep the first stamp
            req.admitted_at = time.perf_counter()
        resume = req.ttft_s is not None and len(req.tokens) > len(req.prompt)
        prompt = req.prompt
        if resume:
            steps = req.steps
            feed = np.asarray([BOS] + req.tokens[:-1], dtype=np.int32)
        else:
            steps = req.gen.resolve_steps(self.config.seq_len)
            echo = prompt[: prompt.index(BOS)] if BOS in prompt else prompt
            if len(echo) >= steps or len(echo) < len(prompt):
                # degenerate: loop ends inside the prompt (reference semantics)
                req.tokens = echo[: min(len(echo), steps)]
                self._finish(slot_req=req)
                return
            feed = np.asarray([BOS] + prompt, dtype=np.int32)
        pos = 0
        logits = None
        remaining = feed
        while len(remaining):
            for c in PREFILL_CHUNKS:
                if len(remaining) >= c:
                    seg = remaining[:c]
                    pf_args = (
                        self.params,
                        self.cache,
                        jnp.asarray(seg[None, :]),
                        jnp.int32(pos),
                        jnp.int32(slot),
                    )
                    aot = self._aot.get(("prefill", c))
                    if aot is not None:
                        logits, self.cache = aot(*pf_args)
                    else:
                        logits, self.cache = _write_prefill(
                            *pf_args,
                            config=self.config,
                            precision=self.precision,
                            backend=self.backend,
                            mesh=self.fwd_mesh,
                            collective=self.collective,
                        )
                    pos += len(seg)
                    remaining = remaining[len(seg):]
                    break

        if resume:
            first = req.tokens[-1]  # already emitted; its KV writes next tick
        else:
            # sample the first generated token (device-side; main.zig:1002-1013)
            first = self._sample_first(logits, req, pos - 1)
        first_admission = req.ttft_s is None  # re-admission keeps its TTFT
        if first_admission:
            req.ttft_s = time.perf_counter() - req.submitted_at
        if not resume:
            req.tokens = list(prompt)
            req.steps = steps
            if first == BOS:
                self._finish(slot_req=req)
                return
            req.tokens.append(first)  # len(prompt) < steps here (echo check)
        if len(req.tokens) >= steps:
            self._finish(slot_req=req)
            return
        self.slots[slot] = req
        self._tokens[slot] = first
        self._pos[slot] = pos
        self._seed_keys[slot] = self._request_key(req)
        self._temp[slot] = req.gen.temperature if req.gen.temperature > 0 else 1.0
        self._topp[slot] = min(max(req.gen.top_p, 0.0), 1.0)
        self._argmax[slot] = req.gen.temperature == 0.0
        self._sampler_dev = None  # device mirror stale after admission
        if first_admission:
            self.metrics["requests"] += 1
            self.metrics["ttft"].append(req.ttft_s)
            qw = req.admitted_at - req.submitted_at
            self.metrics["queue_wait"].append(qw)
            self.metrics["prefill"].append(req.ttft_s - qw)

    def _sample_first(self, logits, req: Request, pos: int) -> int:
        """Sample the first generated token from device logits (scalar fetch)."""
        gen = req.gen
        mode = sampling.choose_mode(gen.temperature, gen.top_p)
        key = jax.random.fold_in(jnp.asarray(self._request_key(req)), pos)
        tok = _first_token(
            jnp.asarray(logits),
            jnp.float32(gen.temperature if gen.temperature > 0 else 1.0),
            jnp.float32(min(max(gen.top_p, 0.0), 1.0)),
            key,
            mode=mode,
        )
        return int(np.asarray(tok))

    def _decode_tick(self):
        active = np.asarray([r is not None for r in self.slots])
        if (
            self.spec_window
            and active.any()
            and not np.any(~self._argmax[active])
        ):
            # the speculative tick reads per-slot histories from the host —
            # it cannot chain on device, so flush any pipelined syncs first
            # (the replays may retire slots: recompute the mask after)
            self._drain(0)
            active = np.asarray([r is not None for r in self.slots])
            if not active.any():
                return
            budget = self._host_budget()
            S = self.config.seq_len
            hist = np.full((self.batch_size, S), -1, np.int32)
            for slot, req in enumerate(self.slots):
                if req is not None:
                    hist[slot, : len(req.tokens)] = req.tokens[:S]
            spec_args = (
                self.params,
                self.cache,
                jnp.asarray(hist),
                jnp.asarray(self._tokens),
                jnp.asarray(self._pos),
                jnp.asarray(budget),
                jnp.asarray(active),
            )
            aot = self._aot.get(("spec",))
            if aot is not None:
                packed, self.cache = aot(*spec_args)
            else:
                packed, self.cache = _tick_spec(
                    *spec_args,
                    config=self.config,
                    precision=self.precision,
                    backend=self.backend,
                    n_windows=self.ticks_per_sync,
                    d=self.spec_window,
                    unroll=self.layer_unroll,
                    mesh=self.fwd_mesh,
                    collective=self.collective,
                )
            self._replay(np.asarray(packed))
            return
        self._dispatch_tick(active)
        # pipelined sync: keep up to depth-1 dispatched-but-unread syncs in
        # flight so the host fetch (one full RTT on a remote transport)
        # overlaps the NEXT window's device execution
        self._drain(self.pipeline_depth - 1)

    def _request_key(self, req: Request) -> np.ndarray:
        """The request's PRNG base key: PRNGKey(seed) when seeded, else a
        distinct key derived from the engine seed and an admission counter.
        Pinned on the Request at FIRST admission so preemption/recovery
        re-admissions resume the SAME stochastic stream. Built HOST-side:
        np.asarray of a device PRNGKey costs a full fetch RTT per admission
        on a remote transport."""
        if req.sample_key is None:
            if req.gen.seed is not None:
                req.sample_key = _host_prngkey(req.gen.seed)
            else:
                # distinct per admission for a fixed engine seed (golden-
                # ratio hash); collisions with explicit user seeds are
                # possible and inconsequential
                req.sample_key = _host_prngkey(
                    self.default_seed * 0x9E3779B9 + 0x517CC1B7 + self._admit_count
                )
            self._admit_count += 1
        return req.sample_key

    def _host_budget(self) -> np.ndarray:
        return np.asarray(
            [
                (r.steps - len(r.tokens)) if r is not None else 0
                for r in self.slots
            ],
            np.int32,
        )

    def _dispatch_tick(self, active: np.ndarray):
        """Issue one n_ticks decode window. Inputs come from the device-side
        chain (the previous window's returned state, no host fetch) when one
        exists, else from the host mirrors; the device-side freeze logic
        (BOS/budget) makes dispatching ahead of the replay safe — a slot
        that retired in an unread window is frozen on device and emits -1.
        """
        if self._chain is not None:
            tokens, pos, budget, chain_active = self._chain
        else:
            tokens = jnp.asarray(self._tokens)
            pos = jnp.asarray(self._pos)
            budget = jnp.asarray(self._host_budget())
            chain_active = jnp.asarray(active)
        stochastic = bool(np.any(~self._argmax[active])) if active.any() else False
        if self._sampler_dev is None:
            # per-slot sampler state changes only at admission; uploading it
            # fresh every sync costs several small h2d transfers per window
            # on a high-RTT transport
            self._sampler_dev = (
                jnp.asarray(self._temp),
                jnp.asarray(self._topp),
                jnp.asarray(self._argmax),
                jnp.asarray(self._seed_keys),
            )
        temp_d, topp_d, argmax_d, keys_d = self._sampler_dev
        tick_args = (
            self.params,
            self.cache,
            tokens,
            pos,
            budget,
            temp_d,
            topp_d,
            argmax_d,
            chain_active,
            keys_d,
        )
        aot = self._aot.get(("tick", stochastic))
        if aot is not None:
            packed, budget, self.cache = aot(*tick_args)
        else:
            packed, budget, self.cache = _tick(
                *tick_args,
                config=self.config,
                precision=self.precision,
                backend=self.backend,
                n_ticks=self.ticks_per_sync,
                stochastic=stochastic,
                unroll=self.layer_unroll,
                mesh=self.fwd_mesh,
                collective=self.collective,
            )
        self._chain = (packed[-3], packed[-2], budget, packed[-1].astype(bool))
        self._inflight.append(packed)

    def _drain(self, keep: int = 0):
        """Fetch + replay in-flight syncs until at most ``keep`` remain.
        A full drain (keep=0) also drops the device-side input chain so the
        next dispatch re-reads the host mirrors (callers flush before any
        admission/prefill, which edits state outside the chain)."""
        while len(self._inflight) > keep:
            self._replay(np.asarray(self._inflight.pop(0)))
        if keep == 0:
            self._chain = None

    def _replay(self, packed: np.ndarray):
        """Apply one packed device sync: emitted rows then tokens/pos/active."""
        emitted = packed[:-3]
        self._tokens = packed[-3].copy()
        self._pos = packed[-2].copy()
        still_active = packed[-1].astype(bool)
        for t in range(emitted.shape[0]):
            for slot, req in enumerate(self.slots):
                if req is None:
                    continue
                tok = int(emitted[t, slot])
                if tok < 0:  # slot was frozen on device this tick
                    continue
                self.metrics["tokens"] += 1
                if tok == BOS:
                    self._finish(slot_req=req, slot=slot)
                    continue
                req.tokens.append(tok)
                if len(req.tokens) >= req.steps:
                    self._finish(slot_req=req, slot=slot)
        # a slot the device froze (e.g. budget exhausted mid-window) but the
        # replay didn't retire would never emit again: retire it now
        for slot, req in enumerate(self.slots):
            if req is not None and not still_active[slot]:
                self._finish(slot_req=req, slot=slot)

    def _finish(self, slot_req: Request, slot: int | None = None):
        if slot is not None:
            self._on_retire(slot)
            self.slots[slot] = None
        slot_req.result_q.put(
            BatchResult(
                tokens=slot_req.tokens,
                prompt_len=len(slot_req.prompt),
                ttft_s=slot_req.ttft_s or 0.0,
                total_s=time.perf_counter() - slot_req.submitted_at,
                queue_wait_s=(slot_req.admitted_at or slot_req.submitted_at)
                - slot_req.submitted_at,
                prefill_s=max(
                    0.0,
                    (slot_req.ttft_s or 0.0)
                    - ((slot_req.admitted_at or slot_req.submitted_at)
                       - slot_req.submitted_at),
                ),
            )
        )

    def _on_retire(self, slot: int) -> None:
        """Hook for subclasses (the paged engine releases the slot's pages)."""

    # ---- metrics ----

    def ttft_percentiles(self) -> dict:
        def pct(series):
            t = sorted(series)
            if not t:
                return None, None
            return t[len(t) // 2], t[min(len(t) - 1, int(len(t) * 0.95))]

        p50, p95 = pct(self.metrics["ttft"])
        qw50, qw95 = pct(self.metrics["queue_wait"])
        pf50, pf95 = pct(self.metrics["prefill"])
        return {
            "p50": p50, "p95": p95,
            "queue_wait_p50": qw50, "queue_wait_p95": qw95,
            "prefill_p50": pf50, "prefill_p95": pf95,
        }
