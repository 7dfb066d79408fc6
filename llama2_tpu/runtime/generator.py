"""Generation runtime: prefill + fully on-device decode loop.

TPU mapping of the reference's host generation loop (main.zig:987-1042): the
3.2→3.3 edge of SURVEY.md becomes the host→device boundary. The prompt is
prefilled as ONE batched segment on the MXU (the reference teacher-forces it
token-at-a-time; causal masking makes the math identical), then the decode
loop runs entirely on device inside a ``lax.while_loop`` — forward, sampling,
KV append, and the BOS stop check all stay on device, so a decode token costs
no host round-trip (SURVEY.md section 7 hard part (d)).

Loop semantics match the reference exactly: the effective sequence is
``[BOS] + prompt + generated``; prompt tokens are emitted verbatim (teacher
forcing); generation stops when the next token is BOS=1 (EOS id 2 is NOT
checked — main.zig:1016-1019); at most ``steps`` tokens are emitted. The
teacher-forced segment is resolved on host (it is data-independent), including
the degenerate cases: a BOS inside the prompt stops the loop there, and a
prompt at least ``steps`` long is echoed truncated with no sampling at all.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llama2_tpu.config import GenerationConfig, ModelConfig
from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
from llama2_tpu.ops import sampling

BOS = 1


@dataclasses.dataclass
class GenerateResult:
    tokens: list[int]  # emitted tokens (prompt echo + generated), BOS-stop applied
    prompt_len: int
    ttft_s: float  # time to first sampled token (prefill + first decode)
    total_s: float
    tokens_per_sec: float  # reference protocol: (emitted-1)/time-after-first (main.zig:1043-1047)


@partial(
    jax.jit,
    static_argnames=("config", "precision", "mode", "backend", "unroll"),
    donate_argnames=("cache",),
)
def _decode_loop(
    params,
    cache,
    logits0,
    start_pos,
    steps,
    temperature,
    top_p,
    key,
    *,
    config: ModelConfig,
    precision,
    mode: int,
    backend: str,
    unroll: int = 1,
):
    """On-device sampling loop from ``start_pos`` (its logits given).

    Iteration at position p: sample next token from the logits of position p,
    stop if it is BOS, record it at out_buf[p], then run one forward step for
    position p+1. ``steps`` is a dynamic scalar (< config.seq_len buffer
    size), so changing ``-n`` never recompiles. Returns ``(out_buf, cache)``;
    out_buf is int32 (seq_len,) padded with -1.

    The forward step runs UNconditionally (no ``lax.cond``): on the final
    iteration its logits are never sampled (the loop exits first) and its KV
    write lands at a position past the emitted sequence, which attention
    masks out — while a cond around a multi-MB carried cache was measured to
    cost ~140 us/iteration in branch-boundary copies on a v5e chip.
    """
    out_buf = jnp.full((config.seq_len,), -1, jnp.int32)

    def cond(state):
        pos, _, _, _, done = state
        return jnp.logical_and(pos < steps, jnp.logical_not(done))

    def body(state):
        pos, logits, cache, out_buf, _ = state
        nxt = sampling.sample(
            logits[0, -1, :], mode, temperature, top_p, jax.random.fold_in(key, pos)
        )
        stop = nxt == BOS
        out_buf = jnp.where(stop, out_buf, out_buf.at[pos].set(nxt))

        # Clamp the write position: at pos+1 == seq_len XLA would clamp the
        # dynamic_update_slice anyway; doing it explicitly documents that the
        # final trip may scribble one stale KV slot that is never attended.
        write_pos = jnp.minimum(pos + 1, config.seq_len - 1)
        hidden, cache = forward(
            params, cache, nxt[None, None], write_pos, config, precision,
            backend, unroll,
        )
        logits = logits_from_hidden(params, hidden, precision, backend)
        return pos + 1, logits, cache, out_buf, stop

    init = (start_pos, logits0, cache, out_buf, jnp.bool_(False))
    _, _, cache, out_buf, _ = jax.lax.while_loop(cond, body, init)
    return out_buf, cache


@partial(
    jax.jit,
    static_argnames=("config", "precision", "backend", "unroll", "d"),
    donate_argnames=("cache",),
)
def _spec_decode_loop(
    params,
    cache,  # KV cache padded past seq_len (draft overshoot space)
    logits0,
    out_buf0,  # (seq_len,) int32: prompt tokens at [0, start_pos), -1 after
    start_pos,
    steps,
    *,
    config: ModelConfig,
    precision,
    backend: str,
    unroll: int = 1,
    d: int = 4,
):
    """Greedy decode with EXACT self-speculation (prompt-lookup drafting).

    Each trip commits up to ``d`` tokens with ONE T=d forward pass: token 0
    is the argmax of the carried logits (always correct); tokens 1..d-1 are
    drafted by finding the latest occurrence of token 0 in the emitted
    history (prompt included) and proposing its continuation; the forward
    pass verifies drafts in parallel and the longest correct prefix is
    accepted. Weights stream once per trip instead of once per token, so
    throughput scales with the text's self-similarity while the token
    sequence is provably identical to plain greedy decoding.

    Numerics caveat: "identical" holds when the T=1 and T=d forwards agree
    on every argmax. On the fp32/XLA path they do (verified token-exact on
    v5e over 256 steps); the fast INT8 pallas kernels round activations to
    bf16 and the T=1/T=d attention kernels reduce in different orders, so a
    genuine near-tie (observed gap ~0.2%) can resolve differently — both
    streams are valid greedy decodes within kernel precision (the reference
    itself builds with fast-math, SURVEY.md section 2 numerics note).

    out_buf doubles as the lookup history: positions < start_pos hold the
    prompt, position p >= start_pos holds the token emitted at p.
    """
    S = config.seq_len
    idx = jnp.arange(S)

    def cond(state):
        pos, _, _, _, done = state
        return jnp.logical_and(pos < steps, jnp.logical_not(done))

    def body(state):
        pos, logits, cache, out_buf, _ = state
        first = jnp.argmax(logits[0, -1, :]).astype(jnp.int32)

        # prompt-lookup draft: continuation of the latest `first` in history
        match = (out_buf == first) & (idx < pos - 1)
        j = jnp.max(jnp.where(match, idx, -1))
        drafts = []
        for k in range(d - 1):
            t = out_buf[jnp.clip(j + 1 + k, 0, S - 1)]
            drafts.append(jnp.where((j >= 0) & (t >= 0), t, first))
        seg = jnp.concatenate([first[None], jnp.stack(drafts)])  # (d,)

        hidden, cache = forward(
            params, cache, seg[None, :], pos + 1, config, precision,
            backend, unroll,
        )
        lg = logits_from_hidden(params, hidden, precision, backend)
        targets = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)  # (d,)

        ok = seg[1:] == targets[:-1]
        acc = 1 + jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))

        emit_idx = jnp.arange(d)
        is_bos = seg == BOS
        before_bos = (jnp.cumsum(is_bos.astype(jnp.int32)) - is_bos) == 0
        keep = (
            (emit_idx < acc)
            & before_bos
            & ~is_bos
            & (pos + emit_idx < steps)  # reference's -n budget, exactly
        )
        n_emit = jnp.sum(keep.astype(jnp.int32))

        def write(k, ob):
            return jnp.where(
                keep[k], ob.at[jnp.clip(pos + k, 0, S - 1)].set(seg[k]), ob
            )

        out_buf = jax.lax.fori_loop(0, d, write, out_buf)
        last = jnp.clip(n_emit - 1, 0, d - 1)
        logits = jax.lax.dynamic_slice_in_dim(lg, last, 1, axis=1)
        # n_emit < acc iff a BOS or the -n budget cut the accepted prefix
        # (a BOS at index b < acc zeroes keep from b on, so n_emit <= b)
        done = n_emit < acc
        return pos + n_emit, logits, cache, out_buf, done

    init = (start_pos, logits0, cache, out_buf0, jnp.bool_(False))
    _, _, cache, out_buf, _ = jax.lax.while_loop(cond, body, init)
    return out_buf, cache


class Generator:
    """Owns jitted prefill/decode for one model; host API for the CLI/server."""

    def __init__(
        self,
        config: ModelConfig,
        params: dict,
        dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        backend: str = "xla",
        layer_unroll: int | None = None,
        kv_quant: bool = False,
        speculative: int = 0,
    ):
        self.config = config
        self.dtype = jnp.dtype(dtype)
        self.precision = precision
        self.backend = backend
        self.kv_quant = kv_quant
        # speculative >= 2: greedy decode commits up to this many tokens per
        # forward pass via prompt-lookup drafting — token stream provably
        # identical to plain greedy (argmax mode only; ignored otherwise)
        self.speculative = speculative
        # Fully unroll the layer scan for small models (scan-trip overhead
        # dominates there; measured 1.6x fp32 and 1.4x INT8 on stories15M).
        # Keep the rolled scan for deep models: the layer math amortizes the
        # trips, full unroll bloats compile time, and on pallas-kernel-heavy
        # deep bodies unrolling measured ~35% SLOWER (worse scheduling
        # around the kernel launches).
        self.layer_unroll = (
            layer_unroll
            if layer_unroll is not None
            else (config.n_layers if config.n_layers <= 8 else 1)
        )
        # flash decode kernel needs the cache head dim on whole 128-lane tiles
        self.lane_pad = backend.startswith("pallas") and config.head_size % 128 != 0
        self.params = jax.tree.map(
            # read .dtype directly: np.asarray(a) here would pull a sharded
            # or mmapped leaf entirely onto the host just to inspect it
            lambda a: jnp.asarray(a, self.dtype)
            if np.issubdtype(np.dtype(a.dtype), np.floating)
            else jnp.asarray(a),
            params,
        )
        # fuse QKV / W1-W3 kernel launches on the quantized pallas path
        # (decode there is launch-bound, not bandwidth-bound)
        from llama2_tpu.quant.q8 import QuantTensor

        if backend.startswith("pallas") and isinstance(self.params.get("wq"), QuantTensor):
            from llama2_tpu.models.llama import fuse_layer_params

            self.params = fuse_layer_params(self.params, backend)

    def _prefill(self, cache, tokens: np.ndarray, pos: int):
        """Run a (1, T) token segment; returns last-position logits + cache."""
        hidden, cache = forward(
            self.params,
            cache,
            jnp.asarray(tokens[None, :]),
            pos,
            self.config,
            self.precision,
            self.backend,
            self.layer_unroll,
        )
        logits = logits_from_hidden(
            self.params, hidden[:, -1:, :], self.precision, self.backend
        )
        return logits, cache

    def generate(
        self,
        prompt_tokens: list[int],
        gen: GenerationConfig,
        prefill_chunk: int | None = None,
    ) -> GenerateResult:
        """The reference generation loop, device-resident.

        ``prefill_chunk=1`` forces token-at-a-time prefill (parity debugging /
        the reference's exact schedule).
        """
        config = self.config
        steps = gen.resolve_steps(config.seq_len)
        seed = gen.seed if gen.seed is not None else time.time_ns() % (2**63)
        key = jax.random.PRNGKey(seed)
        mode = sampling.choose_mode(gen.temperature, gen.top_p)
        top_p = min(max(gen.top_p, 0.0), 1.0)  # clamped like main.zig:899

        # Host-resolved teacher forcing: the echoed prefix is the prompt up to
        # the first BOS (which stops the loop) and at most `steps` tokens.
        prompt = list(prompt_tokens)
        echo = prompt[: prompt.index(BOS)] if BOS in prompt else prompt
        if len(echo) >= steps or len(echo) < len(prompt):
            # Sampling never runs: the loop ends inside the prompt. The
            # reference still runs one forward per emitted token and reports
            # its after-first-token timer (main.zig:1039-1047), so mirror
            # that: prefill the echoed prefix for real and time it.
            emit = echo[: min(len(echo), steps)]
            t0 = time.perf_counter()
            if not emit:
                return GenerateResult(
                    tokens=[], prompt_len=len(prompt), ttft_s=0.0,
                    total_s=0.0, tokens_per_sec=0.0,
                )
            cache = init_cache(
                config, 1, self.dtype, lane_pad=self.lane_pad,
                kv_quant=self.kv_quant,
            )
            feed = np.asarray([BOS] + emit[:-1], dtype=np.int32)
            logits, cache = self._prefill(cache, feed[:1], 0)
            float(logits[0, -1, 0])  # scalar fetch = the honest sync here
            t_first = time.perf_counter()
            pos = 1
            chunk = prefill_chunk or max(1, len(feed) - 1)
            while pos < len(feed):
                seg = feed[pos : pos + chunk]
                logits, cache = self._prefill(cache, seg, pos)
                pos += len(seg)
            float(logits[0, -1, 0])
            t1 = time.perf_counter()
            n = len(emit)
            decode_s = t1 - t_first
            return GenerateResult(
                tokens=emit,
                prompt_len=len(prompt),
                ttft_s=t_first - t0,
                total_s=t1 - t0,
                tokens_per_sec=(n - 1) / decode_s if n > 1 and decode_s > 0 else 0.0,
            )

        spec = (
            self.speculative
            if self.speculative >= 2 and mode == sampling.ARGMAX
            else 0
        )
        t0 = time.perf_counter()
        cache = init_cache(
            config, 1, self.dtype, lane_pad=self.lane_pad,
            kv_quant=self.kv_quant,
        )
        if spec:
            # pad the cache past seq_len so a draft window starting at the
            # final position never clamps onto real KV rows; on pallas the
            # pad rounds UP to a 128 multiple so the padded length stays
            # tile-aligned for the flash kernels' block pickers
            pad = spec
            if self.backend.startswith("pallas"):
                pad = -(-max(spec, 128) // 128) * 128
            cache = {
                k: jnp.pad(v, [(0, 0)] * 3 + [(0, pad)] + [(0, 0)] * (v.ndim - 4))
                for k, v in cache.items()
            }
        feed = np.asarray([BOS] + prompt, dtype=np.int32)  # positions 0..P
        chunk = prefill_chunk or len(feed)
        pos = 0
        logits = None
        while pos < len(feed):
            seg = feed[pos : pos + chunk]
            logits, cache = self._prefill(cache, seg, pos)
            pos += len(seg)
        # real sync: block_until_ready does not block on this environment's
        # tunnel transport (CLAUDE.md); a scalar fetch is the sync idiom, so
        # ttft_s and the reference's after-first-token timer are honest
        float(logits[0, -1, 0])
        t_prefill = time.perf_counter()

        if spec:
            out_buf0 = jnp.asarray(
                np.concatenate(
                    [
                        np.asarray(prompt, np.int32),
                        np.full(config.seq_len - len(prompt), -1, np.int32),
                    ]
                )
            )
            out_buf, cache = _spec_decode_loop(
                self.params,
                cache,
                logits,
                out_buf0,
                jnp.int32(len(prompt)),
                jnp.int32(steps),
                config=config,
                precision=self.precision,
                backend=self.backend,
                unroll=self.layer_unroll,
                d=spec,
            )
            out = np.asarray(out_buf)[len(prompt):]
        else:
            out_buf, cache = _decode_loop(
                self.params,
                cache,
                logits,
                jnp.int32(len(prompt)),
                jnp.int32(steps),
                jnp.float32(gen.temperature if gen.temperature != 0 else 1.0),
                jnp.float32(top_p),
                key,
                config=config,
                precision=self.precision,
                mode=mode,
                backend=self.backend,
                unroll=self.layer_unroll,
            )
            out = np.asarray(out_buf)
        t1 = time.perf_counter()
        generated = [int(t) for t in out if t >= 0]
        tokens = prompt + generated
        n = len(tokens)
        decode_s = t1 - t_prefill
        tps = (n - 1) / decode_s if n > 1 and decode_s > 0 else 0.0
        return GenerateResult(
            tokens=tokens,
            prompt_len=len(prompt),
            ttft_s=t_prefill - t0,
            total_s=t1 - t0,
            tokens_per_sec=tps,
        )
