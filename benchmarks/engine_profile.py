"""Decompose the batched decode tick: where does the engine's step time go?

Single-stream decode on a 0.25B INT8 model runs ~1 ms/step on v5e; the
batch-8 engine tick measured ~8 ms/step. This harness times the tick and its
components in isolation (same jit-scan-with-carry methodology as
benchmarks/kernels.py — RTT-calibrated, sequential dependency through the
carry) to locate the gap: per-row-pos KV scatter vs scalar-pos write, the
int8-KV quantize/attention, sampling, and backend choice.

    python benchmarks/engine_profile.py [--model 350m] [--batch 8] [--iters 32]
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from kernels import _rtt, _take  # noqa: E402  (benchmarks dir on path)


def _timed(run, iters):
    import jax.numpy as jnp

    fetch = lambda: np.asarray(jnp.sum(run()).astype(np.float32))
    fetch()  # compile + warm
    best = min(_take(fetch) for _ in range(3))
    return max(best - _rtt(), 1e-9) / iters


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="350m")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--pos0", type=int, default=64)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from llama2_tpu.config import ModelConfig
    from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
    from llama2_tpu.ops import sampling
    from llama2_tpu.tools.make_random_q8 import SHAPES, random_q8_params
    from benchmarks.bench7b import fuse_host

    config = ModelConfig(**SHAPES[args.model])
    params_q = fuse_host(random_q8_params(config, seed=0))
    params_q = jax.tree.map(jnp.asarray, params_q)
    B, K = args.batch, args.iters
    V = config.vocab_size

    def scan_steps(step_fn, cache, per_row_pos):
        """K sequential decode steps; carry = (tokens, pos, cache)."""
        pos0 = (
            jnp.full((B,), args.pos0, jnp.int32)
            if per_row_pos
            else jnp.int32(args.pos0)
        )

        @partial(jax.jit, donate_argnums=(1,))
        def run(params, cache):
            # params MUST be an argument: closing over them bakes the whole
            # weight tree into the HLO as constants (a 250 MB+ program that
            # the remote compile service rejects with HTTP 413)
            def body(carry, _):
                tokens, pos, cache = carry
                tokens, cache = step_fn(params, tokens, pos, cache)
                return (tokens, pos + 1, cache), ()

            (tokens, _, cache), _ = jax.lax.scan(
                body,
                (jnp.zeros((B,), jnp.int32) + 5, pos0, cache),
                None,
                length=K,
            )
            return tokens, cache

        # the cache is DONATED (like the engine's tick): thread the returned
        # buffer back in so each timed call updates in place
        holder = {"cache": cache}

        def go():
            tokens, new_cache = run(params_q, holder["cache"])
            holder["cache"] = new_cache
            return tokens

        return go

    def variant(name, backend, kv_quant, per_row_pos, sample):
        # lane_pad exactly like the engines do — without it a non-128 head
        # size silently measures the XLA dequant-fallback path (~4x slower),
        # which burned a day of round-2 profiling
        lane_pad = backend.startswith("pallas") and config.head_size % 128 != 0
        cache = init_cache(config, B, kv_quant=kv_quant, lane_pad=lane_pad)

        def step(params, tokens, pos, cache):
            hidden, cache = forward(
                params, cache, tokens[:, None], pos, config,
                jax.lax.Precision.HIGHEST, backend,
            )
            logits = logits_from_hidden(
                params, hidden[:, -1, :], jax.lax.Precision.HIGHEST, backend
            )
            if sample:
                nxt = sampling.sample_argmax(logits)
            else:
                nxt = jnp.argmax(logits[:, :8], axis=-1).astype(jnp.int32)
            return nxt % V, cache

        try:
            dt = _timed(scan_steps(step, cache, per_row_pos), K)
            print(f"{name:44s} {dt * 1e3:7.3f} ms/step")
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED: {type(e).__name__}: {e}")
            return None

    print(f"== engine tick decomposition: {args.model} B={B} K={K} "
          f"pos0={args.pos0} ==")
    variant("pallas kvq=int8 per-row-pos argmax (tick)", "pallas", True, True, True)
    variant("pallas kvq=int8 scalar-pos", "pallas", True, False, True)
    variant("pallas kvq=f32  per-row-pos", "pallas", False, True, True)
    variant("pallas kvq=f32  scalar-pos", "pallas", False, False, True)
    variant("pallas kvq=f32  scalar-pos no-argmax", "pallas", False, False, False)
    variant("xla    kvq=f32  per-row-pos", "xla", False, True, True)
    variant("xla    kvq=f32  scalar-pos", "xla", False, False, True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
