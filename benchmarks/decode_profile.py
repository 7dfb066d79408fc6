"""Decompose the per-token decode cost of the headline config.

Times each piece of the decode step separately (forward T=1, classifier
matvec, sampling, full fused while_loop iteration) so regressions in any one
show up directly; the analog of the reference's per-kernel `benchmarks/`
(benchmarks/rmsnorm.zig etc.) at the whole-step altitude.

Usage: python benchmarks/decode_profile.py [--backend xla|pallas]
       [--precision default|highest] [--dtype float32|bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="xla")
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    from __graft_entry__ import _flagship

    from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden
    from llama2_tpu.ops import sampling

    config, params = _flagship()
    dtype = jnp.dtype(args.dtype)
    precision = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[args.precision]
    params = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )
    cache = init_cache(config, 1, dtype)
    token = jnp.asarray([[7]], jnp.int32)

    nbytes = sum(
        a.nbytes for a in jax.tree.leaves(params) if a is not params["wcls"]
    )
    print(f"param bytes (excl aliased wcls): {nbytes/1e6:.1f} MB")

    fwd = jax.jit(
        lambda p, c, t: forward(p, c, t, 128, config, precision, args.backend)
    )
    t_fwd = timeit(fwd, params, cache, token)
    print(f"forward T=1 (6 layers)          : {t_fwd*1e6:8.1f} us")

    hidden, _ = fwd(params, cache, token)
    head = jax.jit(lambda p, h: logits_from_hidden(p, h, precision, args.backend))
    t_head = timeit(head, params, hidden)
    print(f"classifier head (288x32000)      : {t_head*1e6:8.1f} us")

    logits = head(params, hidden)
    samp = jax.jit(lambda l: sampling.sample_argmax(l[:, -1, :]))
    t_samp = timeit(samp, logits)
    print(f"argmax sample                    : {t_samp*1e6:8.1f} us")

    # full decode loop per-token cost (the number bench.py measures)
    from llama2_tpu.runtime.generator import Generator
    from llama2_tpu.config import GenerationConfig

    g = Generator(config, params, dtype=dtype, precision=precision,
                  backend=args.backend)
    gen = GenerationConfig(temperature=0.0, steps=256, seed=0)
    g.generate([], GenerationConfig(temperature=0.0, steps=4, seed=0))
    best = 0.0
    for _ in range(3):
        r = g.generate([], gen)
        best = max(best, r.tokens_per_sec)
    print(f"decode loop                      : {1e6/best:8.1f} us/token "
          f"({best:.0f} tok/s)")
    print(f"sum of pieces                    : {(t_fwd+t_head+t_samp)*1e6:8.1f} us")


if __name__ == "__main__":
    main()
