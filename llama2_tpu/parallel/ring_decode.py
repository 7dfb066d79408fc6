"""Sequence-sharded decode: greedy decoding over a seq-sharded KV cache.

Long-context scale-out for the DECODE phase (SURVEY.md §5, long-context row:
the reference caps context at one host's dense KV cache, main.zig:151-152;
``parallel/ring.py`` covers prefill). Here the KV cache's sequence axis is
sharded over a ``seq`` mesh axis, so the resident context scales linearly
with seq shards — contexts beyond one chip's HBM x TP.

Design — distributed flash-decode (a.k.a. tree attention), NOT a rotating
ring: decode attends ONE query against the whole cache, so rotating KV
chunks through every device (the prefill ring) would serialize S ppermute
hops per layer just to move a (B, H, hs) query's worth of work around. The
latency-optimal decode formulation keeps every KV shard resident and merges
per-shard online-softmax statistics instead:

* each seq shard owns rows ``[i*S/sp, (i+1)*S/sp)`` of every (batch,
  kv-head) cache plane and computes local scores/weighted-V over exactly its
  rows (global causal mask applied with global row indices);
* shards exchange three scalars-per-head — running max, denominator, and
  the weighted accumulator — via ``pmax``/``psum`` over the ``seq`` axis
  (one fused ICI all-reduce per layer, O(B*H*hs) bytes, independent of S);
* the merged result equals dense masked attention up to reduction order
  (the same online-softmax merge the Pallas flash kernels use per block).

Every position-local op (norms, QKV/FFN matmuls, RoPE, sampling) is
replicated across ``seq`` — decode is KV-bandwidth-bound at long context, and
replicated compute costs no communication. The KV append lands on the ONE
shard that owns the written row (ownership-masked dynamic_update_slice).

Composes with tensor parallelism on a second ``model`` axis (sp.make_sp_tp_mesh):
kv-heads shard over ``model`` exactly as in parallel/tp.py (the attention
merge only ever reduces over ``seq``), and the row-parallel wo/w2 outputs
psum over ``model`` — the two axes touch different tensors and commute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama2_tpu.config import ModelConfig
from llama2_tpu.models.llama import layer_keys
from llama2_tpu.ops import xla as ops
from llama2_tpu.ops.linear import linear
from llama2_tpu.parallel.mesh import MODEL_AXIS
from llama2_tpu.parallel.sp import SEQ_AXIS
from llama2_tpu.parallel.tp import local_config

NEG_INF = -1e30


def seq_decode_attention(
    q, k_cache, v_cache, pos, *, axis_name: str, s_local: int, scale: float,
    precision=jax.lax.Precision.HIGHEST,
):
    """GQA decode attention over a seq-sharded cache, merged across shards.

    q: (B, T, H, hs) — T is 1 (or a tiny verify window); k/v_cache:
    (B, KVH, S_local, hs), this shard's rows (global rows offset by
    ``axis_index * s_local``); ``pos`` scalar — the LAST query row's global
    position. Returns (B, T, H, hs) identical on every seq shard.
    """
    B, T, H, hs = q.shape
    KVH = k_cache.shape[1]
    G = H // KVH

    my = jax.lax.axis_index(axis_name)
    k_pos = my * s_local + jnp.arange(s_local)  # global row ids of this shard

    qg = q.reshape(B, T, KVH, G, hs)
    scores = jnp.einsum(
        "btkgd,bksd->bkgts", qg, k_cache, precision=precision
    ).astype(jnp.float32) * jnp.float32(scale)  # (B,KVH,G,T,S_local)

    # causal window [0, pos - (T-1) + t] per query row t, in GLOBAL rows
    q_pos = pos - (T - 1) + jnp.arange(T)
    mask = k_pos[None, :] <= q_pos[:, None]  # (T, S_local)
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)

    # local online-softmax statistics; a shard whose rows are all masked
    # contributes m_l = NEG_INF -> merge weight exp(NEG_INF - m_g) == 0
    # (shard 0 always holds row 0, so the global max is finite).
    m_l = scores.max(axis=-1)  # (B,KVH,G,T)
    p = jnp.where(mask[None, None, None], jnp.exp(scores - m_l[..., None]), 0.0)
    s_l = p.sum(axis=-1)
    acc_l = jnp.einsum(
        "bkgts,bksd->bkgtd", p.astype(v_cache.dtype), v_cache,
        precision=precision,
    ).astype(jnp.float32)

    m_g = jax.lax.pmax(m_l, axis_name)
    w = jnp.exp(m_l - m_g)
    s_g = jax.lax.psum(s_l * w, axis_name)
    acc_g = jax.lax.psum(acc_l * w[..., None], axis_name)
    out = acc_g / s_g[..., None]  # every query row attends >= row 0
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, hs).astype(q.dtype)


def _append_local(cache, rows, pos, *, my_off, s_local):
    """Write (B, KVH, T, hs) rows at global positions ``pos-(T-1)..pos`` into
    the shard's local plane iff this shard owns them (clamped dus + masked
    row select keeps the write branch-free; cf. models/llama.py:133-159)."""
    T = rows.shape[2]
    first = pos - (T - 1) - my_off  # local row of the window's first token
    if T == 1:
        idx = jnp.clip(first, 0, s_local - 1)
        cur = jax.lax.dynamic_slice(
            cache, (0, 0, idx, 0),
            (cache.shape[0], cache.shape[1], 1, cache.shape[3]),
        )
        own = (first >= 0) & (first < s_local)
        new = jnp.where(own, rows, cur)
        return jax.lax.dynamic_update_slice(cache, new, (0, 0, idx, 0))
    # T > 1 (verify windows): write per ROW, each with its own clamp and
    # ownership test, so a window straddling a seq-shard boundary leaves
    # exactly its owned rows on each neighbor (a single clamped window
    # write would disown straddling rows on BOTH shards)
    for t in range(T):
        r_local = first + t
        idx = jnp.clip(r_local, 0, s_local - 1)
        cur = jax.lax.dynamic_slice(
            cache, (0, 0, idx, 0),
            (cache.shape[0], cache.shape[1], 1, cache.shape[3]),
        )
        own = (r_local >= 0) & (r_local < s_local)
        new = jnp.where(own, rows[:, :, t : t + 1], cur)
        cache = jax.lax.dynamic_update_slice(cache, new, (0, 0, idx, 0))
    return cache


def _layer_seq(
    x, lp, k_c, v_c, pos, cos, sin, config: ModelConfig, precision,
    *, seq_axis: str, s_local: int, model_axis: str | None,
):
    """One decoder layer for a (B, T<=1..) decode step over seq-sharded KV.

    Mirrors the XLA branch of models/llama._layer (the behavioral contract —
    rmsnorm/RoPE/GQA semantics per SURVEY.md §2.5-2.8) with the cache write
    ownership-masked to this shard's rows and the attention merged across
    ``seq``. ``config`` holds LOCAL head counts when ``model_axis`` is set.
    """
    B, T, D = x.shape
    H, KVH, hs = config.n_heads, config.n_kv_heads, config.head_size

    xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
    q = linear(xb, lp["wq"], precision, "xla", None).reshape(B, T, H, hs)
    k = linear(xb, lp["wk"], precision, "xla", None).reshape(B, T, KVH, hs)
    v = linear(xb, lp["wv"], precision, "xla", None).reshape(B, T, KVH, hs)
    q = ops.apply_rope(q, cos, sin)
    k = ops.apply_rope(k, cos, sin)

    my_off = jax.lax.axis_index(seq_axis) * s_local
    k_c = _append_local(k_c, k.transpose(0, 2, 1, 3), pos, my_off=my_off, s_local=s_local)
    v_c = _append_local(v_c, v.transpose(0, 2, 1, 3), pos, my_off=my_off, s_local=s_local)

    att = seq_decode_attention(
        q, k_c, v_c, pos, axis_name=seq_axis, s_local=s_local,
        scale=1.0 / (hs**0.5), precision=precision,
    ).reshape(B, T, H * hs)

    wo_out = linear(att, lp["wo"], precision, "xla", None)
    if model_axis is not None:
        wo_out = jax.lax.psum(wo_out, model_axis)
    x = x + wo_out

    xb = ops.rmsnorm(x, lp["rms_ffn"], config.norm_eps)
    h1 = linear(xb, lp["w1"], precision, "xla", None)
    h3 = linear(xb, lp["w3"], precision, "xla", None)
    ffn = linear(ops.swiglu(h1, h3), lp["w2"], precision, "xla", None)
    if model_axis is not None:
        ffn = jax.lax.psum(ffn, model_axis)
    return x + ffn, k_c, v_c


def _forward_step_seq(
    params, cache_k, cache_v, token, pos, config, precision,
    *, seq_axis, s_local, model_axis, unroll: int = 1,
):
    """One T=1 forward step writing KV at global row ``pos``; returns
    (logits, caches). ``token``: (B,) int32."""
    x = jnp.take(params["tok_emb"], token[:, None], axis=0)  # (B,1,D)
    x = x.astype(params["wq"].dtype)
    cos, sin = ops.rope_angles(pos[None].astype(jnp.int32), config.head_size)
    cos, sin = cos[None], sin[None]  # (1,1,hs/2) broadcast over batch

    keys = layer_keys(params)
    layer_stack = {k: params[k] for k in keys}

    def body(x, xs):
        lp_kv = xs
        lp = {k: lp_kv[k] for k in keys}
        x, k_c, v_c = _layer_seq(
            x, lp, lp_kv["__k"], lp_kv["__v"], pos, cos, sin, config,
            precision, seq_axis=seq_axis, s_local=s_local,
            model_axis=model_axis,
        )
        return x, (k_c, v_c)

    xs = dict(layer_stack, __k=cache_k, __v=cache_v)
    x, (cache_k, cache_v) = jax.lax.scan(body, x, xs, unroll=unroll)
    x = ops.rmsnorm(x, params["rms_final"], config.norm_eps)
    wcls = params.get("wcls", params["tok_emb"].T)
    logits = linear(x[:, -1, :], wcls, precision, "xla", None)
    return logits.astype(jnp.float32), cache_k, cache_v


def _decode_scan(
    params, cache_k, cache_v, prompt_buf, prompt_len, temp, topp, use_argmax,
    base_keys, *, n_steps, stochastic, config, precision, seq_axis, s_local,
    model_axis, unroll,
):
    """Batched teacher-forced decode: step i feeds token_i at position i
    (writing its KV row), then token_{i+1} is the row's prompt token while
    inside its prompt else the sampled next (argmax first-max semantics or
    the reference's temperature/top-p policy, main.zig:715-798). Emits the
    token FED at each step — emitted[1:] mirrors the reference's output
    stream (prompt echo + generated), BOS handling on the host.

    ``prompt_len``: (B,) per-row prompt lengths (incl. BOS). Sampling keys
    fold ``base_keys[b]`` by the logits' position, the exact scheme of
    ``runtime.generator._decode_loop`` — a row seeded like a Generator run
    reproduces its stream token-for-token. Sampling runs on logits that are
    replicated across the mesh, so every shard picks the same token.
    """
    from llama2_tpu.runtime.batch_engine import _sample_batched, _slot_keys

    B = prompt_buf.shape[-1]

    def body(carry, i):
        token, cache_k, cache_v = carry
        logits, cache_k, cache_v = _forward_step_seq(
            params, cache_k, cache_v, token, i, config, precision,
            seq_axis=seq_axis, s_local=s_local, model_axis=model_axis,
            unroll=unroll,
        )
        keys = _slot_keys(base_keys, jnp.broadcast_to(i, (B,)))
        nxt = _sample_batched(logits, temp, topp, use_argmax, keys, stochastic)
        nxt = jnp.where(i + 1 < prompt_len, prompt_buf[i + 1], nxt)
        return (nxt, cache_k, cache_v), nxt

    tok0 = jnp.broadcast_to(prompt_buf[0].reshape(-1), (B,))
    (_, cache_k, cache_v), emitted = jax.lax.scan(
        body, (tok0, cache_k, cache_v), jnp.arange(n_steps)
    )
    return emitted.T, cache_k, cache_v  # (B, n_steps)


class SeqShardedDecoder:
    """Decoding with the KV cache sequence-sharded over ``seq`` (optionally
    x tensor-parallel over ``model``): batched prompts, the reference's
    full sampling policy (argmax / temperature / top-p, seeded), reachable
    from the CLI via ``--seq-shards``. fp/XLA path — the long-context
    memory win is the point; fused kernels stay single-shard (the engines
    cover that regime)."""

    def __init__(
        self,
        config: ModelConfig,
        params: dict,
        mesh: Mesh,
        precision=jax.lax.Precision.HIGHEST,
        unroll: int | None = None,
    ):
        if SEQ_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{SEQ_AXIS}' axis, got {mesh.axis_names}")
        self.sp = mesh.shape[SEQ_AXIS]
        self.tp = mesh.shape.get(MODEL_AXIS, 1)
        if config.seq_len % self.sp:
            raise ValueError(f"seq_len={config.seq_len} not divisible by sp={self.sp}")
        if self.tp > 1 and (config.n_heads % self.tp or config.n_kv_heads % self.tp):
            raise ValueError(f"tp={self.tp} does not divide the head counts")
        self.config = config
        self.mesh = mesh
        self.precision = precision
        self.s_local = config.seq_len // self.sp
        self.unroll = (
            unroll if unroll is not None
            else (config.n_layers if config.n_layers <= 8 else 1)
        )

        maxis = MODEL_AXIS if self.tp > 1 else None
        pspecs = {}
        for k, v in params.items():
            if k in ("wq", "wk", "wv", "w1", "w3") and maxis:
                pspecs[k] = P(None, None, MODEL_AXIS)
            elif k in ("wo", "w2") and maxis:
                pspecs[k] = P(None, MODEL_AXIS, None)
            else:
                pspecs[k] = P(*([None] * np.ndim(v)))  # replicated (incl. wcls)
        self.pspecs = pspecs
        self.params = {
            k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, pspecs[k]))
            for k, v in params.items()
        }
        # (L, B, KVH, S, hs): kv-heads on model, S on seq
        self.cspec = P(None, None, maxis, SEQ_AXIS, None)
        self._fns: dict[int, object] = {}  # jitted loop per n_steps

    def _cache(self, batch: int):
        c = self.config
        shape = (c.n_layers, batch, c.n_kv_heads, c.seq_len, c.head_size)
        z = jnp.zeros(shape, jnp.float32)
        s = NamedSharding(self.mesh, self.cspec)
        return jax.device_put(z, s), jax.device_put(z, s)

    def generate(self, prompt_tokens: list[int], n_steps: int) -> list[int]:
        """Greedy decode of one prompt (BOS-prefixed like the reference
        loop, main.zig:987-1019): returns emitted tokens (prompt echo +
        generated), truncated at the first emitted BOS."""
        from llama2_tpu.config import GenerationConfig

        return self.generate_batch(
            [prompt_tokens],
            GenerationConfig(temperature=0.0, steps=int(n_steps), seed=0),
        )[0]

    def generate_batch(
        self, prompts: list[list[int]], gen
    ) -> list[list[int]]:
        """Decode a batch of prompts with the reference's sampling policy
        (``gen``: a GenerationConfig — argmax at temperature 0, else
        temperature-scaled softmax with optional top-p, main.zig:1002-1013).

        Row ``b`` samples with ``PRNGKey(seed + b)`` folded by position —
        row 0 of a seeded run reproduces the single-stream Generator's
        stream for the same seed token-for-token (fp32/XLA numerics).
        Returns each row's emitted tokens (prompt echo + generated),
        truncated at its first emitted BOS."""
        import time

        from llama2_tpu.ops import sampling
        from llama2_tpu.tokenizer.tokenizer import BOS

        c = self.config
        B = len(prompts)
        n_steps = gen.resolve_steps(c.seq_len)
        buf = np.zeros((c.seq_len, B), np.int32)
        plens = np.zeros(B, np.int32)
        for b, p in enumerate(prompts):
            if len(p) + 1 > c.seq_len:
                # match the engines' admission-time capacity errors instead
                # of a numpy broadcast crash at the buffer fill below
                raise ValueError(
                    f"prompt of {len(p)} tokens (+ BOS) exceeds "
                    f"seq_len={c.seq_len}"
                )
            row = [BOS] + list(p)
            buf[: len(row), b] = row
            plens[b] = len(row)

        from llama2_tpu.runtime.batch_engine import _host_prngkey

        mode = sampling.choose_mode(gen.temperature, gen.top_p)
        stochastic = mode != sampling.ARGMAX
        seed = gen.seed if gen.seed is not None else time.time_ns() % (2**63)
        base_keys = np.stack([_host_prngkey(seed + b) for b in range(B)])
        temp = np.full(
            B, gen.temperature if gen.temperature > 0 else 1.0, np.float32
        )
        topp = np.full(B, min(max(gen.top_p, 0.0), 1.0), np.float32)
        argmax = np.full(B, gen.temperature == 0.0)

        fn = self._fns.get((n_steps, stochastic, B))
        if fn is None:
            region = partial(
                _decode_scan,
                n_steps=int(n_steps),
                stochastic=stochastic,
                config=local_config(c, self.tp),
                precision=self.precision,
                seq_axis=SEQ_AXIS,
                s_local=self.s_local,
                model_axis=MODEL_AXIS if self.tp > 1 else None,
                unroll=self.unroll,
            )
            rep1 = P(None)
            fn = self._fns[(n_steps, stochastic, B)] = jax.jit(
                jax.shard_map(
                    region,
                    mesh=self.mesh,
                    in_specs=(
                        self.pspecs, self.cspec, self.cspec,
                        P(None, None), rep1, rep1, rep1, rep1, P(None, None),
                    ),
                    out_specs=(P(None, None), self.cspec, self.cspec),
                    check_vma=False,
                ),
                donate_argnums=(1, 2),
            )
        ck, cv = self._cache(B)
        emitted, _, _ = fn(
            self.params, ck, cv, jnp.asarray(buf), jnp.asarray(plens),
            jnp.asarray(temp), jnp.asarray(topp), jnp.asarray(argmax),
            jnp.asarray(base_keys),
        )
        # emitted[b][i] is the token FED at step i+1, i.e. sequence positions
        # 1..n_steps — exactly the reference's printed stream (prompt echo +
        # generated, BOS at position 0 never printed; main.zig:995-1042).
        rows = np.asarray(emitted)
        out = []
        for b in range(B):
            toks = [int(t) for t in rows[b]]
            out.append(toks[: toks.index(BOS)] if BOS in toks else toks)
        return out
