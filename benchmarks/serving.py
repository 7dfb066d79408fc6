"""Continuous-batching serving benchmark: throughput + TTFT percentiles.

BASELINE config 4's metric (p50 TTFT under continuous batching; the reference
has no serving mode at all). Drives the BatchEngine (dense or --paged) with a
synthetic open-loop workload of mixed-length prompts and reports aggregate
decode throughput, per-request latency and TTFT percentiles.

    python benchmarks/serving.py [--paged] [--batch-size 8] [--requests 32]
                                 [--steps 48] [--platform cpu]

``--compare`` measures the dense AND paged engines in one process under the
same load: the weight tree uploads ONCE and both engines reuse the device
arrays (on a tunneled TPU a 7 GB re-upload dwarfs the measurement), printing
both lines plus the paged/dense aggregate ratio (VERDICT r3 next-round 3).
``--suite`` runs the full round-5 measurement set on one upload: the
dense-vs-paged compare, a paged batch sweep (--sweep-batches), and
single-stream (batch-1) Generator decode plain and speculative — the direct
analog of the reference's headline tok/s (README.md:86-88).
``--cache-dir`` mmaps a prebuilt make_random_q8 cache instead of regenerating
random weights in-process (minutes at 7B scale).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--ticks-per-sync", type=int, default=1)
    ap.add_argument("--pipeline-depth", type=int, default=2)
    ap.add_argument("--spec", type=int, default=0)
    ap.add_argument("--kv-cache", default="f32", choices=("f32", "int8"))
    ap.add_argument("--kernels", default="xla", choices=("xla", "pallas"))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compare", action="store_true",
                    help="measure dense AND paged in one process (one weight "
                    "upload, shared device tree); prints both + the ratio")
    ap.add_argument("--suite", action="store_true",
                    help="one-upload round-5 set: compare + paged batch "
                    "sweep + batch-1 single-stream plain/spec")
    ap.add_argument("--skip-streams", action="store_true",
                    help="suite: skip the batch-1 stream legs")
    ap.add_argument("--skip-dense", action="store_true",
                    help="suite: skip the dense leg (reuse a ratio baseline "
                    "measured separately; frees 4.3 GB of HBM at 7B)")
    ap.add_argument("--sweep-batches", default="16,32",
                    help="paged batch sizes for --suite's sweep")
    ap.add_argument("--n-pages", type=int, default=None,
                    help="paged pool capacity override (pages)")
    ap.add_argument("--stream-steps", type=int, default=256,
                    help="decode steps for the batch-1 single-stream legs")
    ap.add_argument("--cache-dir", default=None,
                    help="load a prebuilt make_random_q8 cache dir (mmap) "
                    "instead of regenerating random weights in-process")
    ap.add_argument(
        "--model", default="flagship",
        help="flagship (stories15M-shaped fp32) or a make_random_q8 preset "
        "(350m/1b/7b: random INT8 at that scale — the production-shape "
        "paged-vs-dense comparison)",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from llama2_tpu.config import GenerationConfig

    if args.model == "flagship":
        from __graft_entry__ import _flagship

        config, params = _flagship()
    else:
        from benchmarks.bench7b import fuse_host

        if args.cache_dir:
            from llama2_tpu.io.cache import load_cache

            config, params, _ = load_cache(args.cache_dir)  # mmap
        else:
            from llama2_tpu.config import ModelConfig
            from llama2_tpu.tools.make_random_q8 import (
                SHAPES,
                random_q8_params,
            )

            config = ModelConfig(**SHAPES[args.model])
            params = random_q8_params(config, seed=args.seed)
        params = fuse_host(params)
    rng = np.random.default_rng(args.seed)

    if args.compare or args.suite:
        import gc

        def teardown(eng):
            # a 7B dense cache is 4.3 GB and the paged pool ~6.6 GB: the
            # next engine's allocation needs the previous one's buffers
            # actually RELEASED, not just python-unreferenced
            eng.cache = None
            if hasattr(eng, "pool"):
                eng.pool = None
            eng._chain = None
            eng._inflight = []
            eng._sampler_dev = None
            gc.collect()

        results = {}
        device_params = params
        if args.suite and not args.skip_streams:
            # streams first: they need only weights + one seq cache, so
            # they survive HBM pressure that can fail the paged legs
            device_params = jax.tree.map(jnp.asarray, device_params)
            _streams(config, device_params, args)
        kinds = ("paged",) if getattr(args, "skip_dense", False) else (
            "dense", "paged")
        for kind in kinds:
            live = sum(
                int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.live_arrays()
            )
            print(f"[suite] live device bytes before {kind}: "
                  f"{live/1e9:.2f} GB", flush=True)
            try:
                eng = _build(kind == "paged", config, device_params, args)
                device_params = eng.params
                results[kind] = _measure(eng, config, args, rng)
                teardown(eng)
                del eng
            except Exception as e:  # keep later legs alive (HBM pressure)
                print(f"leg[{kind}] FAILED: {type(e).__name__}: {e}",
                      flush=True)
        if "dense" in results and "paged" in results:
            ratio = results["paged"]["tok_s"] / results["dense"]["tok_s"]
            print(f"paged/dense aggregate: {ratio:.3f}", flush=True)
        if not args.suite:
            return
        # paged batch sweep: aggregate throughput scaling past the dense
        # engine's HBM ceiling (the dense int8-KV cache OOMs at batch 16
        # on 7B/seq 2048; the page pool sizes to the measured load)
        import dataclasses as _dc

        base_bs, base_req = args.batch_size, args.requests
        for bsz in [int(b) for b in args.sweep_batches.split(",") if b]:
            args = _dc.replace(args) if _dc.is_dataclass(args) else args
            args.batch_size, args.requests = bsz, 2 * bsz
            try:
                eng = _build(True, config, device_params, args)
                results[f"paged@{bsz}"] = _measure(eng, config, args, rng)
                teardown(eng)
                del eng
            except Exception as e:
                print(f"leg[paged@{bsz}] FAILED: {type(e).__name__}: {e}",
                      flush=True)
        args.batch_size, args.requests = base_bs, base_req
        return

    eng = _build(args.paged, config, params, args)
    _measure(eng, config, args, rng)


def _streams(config, device_params, args):
    """Batch-1 single-stream decode, plain + exact speculative (the
    reference's headline shape, README.md:86-88). Runs FIRST in the suite:
    it needs only weights + one seq cache, so it survives HBM pressure that
    can fail the paged legs."""
    import gc

    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.runtime.generator import Generator

    gen = GenerationConfig(temperature=0.0, steps=args.stream_steps, seed=0)
    warm = GenerationConfig(temperature=0.0, steps=4, seed=0)
    for name, spec_n in (("plain", 0), ("spec", 16)):
        g = Generator(
            config, device_params, backend=args.kernels,
            kv_quant=args.kv_cache == "int8", speculative=spec_n,
        )
        g.generate([], warm)
        best = 0.0
        ref = None
        for _ in range(3):
            r = g.generate([], gen)
            if ref is None:
                ref = r.tokens
            assert r.tokens == ref, "spec stream diverged from greedy"
            best = max(best, r.tokens_per_sec)
        print(
            f"single-stream[{name}] batch=1: {best:8.1f} tok/s "
            f"({len(ref)} tokens)", flush=True,
        )
        del g
        gc.collect()
    # the generators' donated cache buffers can be pinned by the jit
    # caches' most-recent-call references; drop them before the paged legs
    jax.clear_caches()
    gc.collect()


def _build(paged: bool, config, params, args):
    if paged:
        from llama2_tpu.runtime.paged_engine import PagedBatchEngine

        kw = {}
        if args.n_pages:
            kw["n_pages"] = args.n_pages
        return PagedBatchEngine(
            config, params, batch_size=args.batch_size,
            page_size=min(args.page_size, config.seq_len),
            ticks_per_sync=args.ticks_per_sync,
            pipeline_depth=args.pipeline_depth,
            backend=args.kernels,
            kv_quant=args.kv_cache == "int8",
            **kw,
        )
    from llama2_tpu.runtime.batch_engine import BatchEngine

    return BatchEngine(
        config, params, batch_size=args.batch_size,
        ticks_per_sync=args.ticks_per_sync,
        pipeline_depth=args.pipeline_depth,
        spec_window=args.spec,
        backend=args.kernels,
        kv_quant=args.kv_cache == "int8",
    )


def _measure(eng, config, args, rng) -> dict:
    from llama2_tpu.config import GenerationConfig

    paged = type(eng).__name__.startswith("Paged")

    # mixed-length prompts (tokens drawn uniformly; BOS excluded); prompt
    # must be shorter than steps or the request degenerates to a pure echo
    max_prompt = max(2, min(33, args.steps // 2))
    prompts = [
        rng.integers(2, config.vocab_size, rng.integers(1, max_prompt)).tolist()
        for _ in range(args.requests)
    ]
    gen = GenerationConfig(temperature=0.0, steps=args.steps, seed=0)

    # warmup: compile ALL prefill chunk sizes + the tick program before the
    # timer (run_until_idle drives the engine synchronously; generate()
    # alone would wait on a driver thread)
    from llama2_tpu.runtime.batch_engine import PREFILL_CHUNKS

    warm_len = min(sum(PREFILL_CHUNKS), config.seq_len - 8)
    for wl in (warm_len, 3):  # long (all chunks + big bucket) and short
        warm_prompt = rng.integers(2, config.vocab_size, wl).tolist()
        wq = eng.submit(
            warm_prompt, GenerationConfig(temperature=0.0, steps=wl + 4, seed=0)
        )
        eng.run_until_idle()
        wq.get(timeout=1200)

    t0 = time.perf_counter()
    queues = [eng.submit(p, gen) for p in prompts]
    eng.run_until_idle()
    results = [q.get(timeout=1200) for q in queues]
    wall = time.perf_counter() - t0

    total_tokens = sum(len(r.tokens) for r in results)
    lat = sorted(r.total_s for r in results)
    ttft = eng.ttft_percentiles()
    mode = ("paged" if paged else "dense") + f",K={args.ticks_per_sync},{args.kernels}"
    if args.kv_cache != "f32":
        mode += f",kv={args.kv_cache}"
    if args.spec:
        mode += f",spec={args.spec}"
    tok_s = total_tokens / wall
    print(
        f"serving[{mode}] batch={args.batch_size} requests={args.requests}: "
        f"{tok_s:8.1f} tok/s aggregate | "
        f"req p50 {lat[len(lat) // 2] * 1e3:7.1f} ms "
        f"p95 {lat[min(len(lat) - 1, int(len(lat) * 0.95))] * 1e3:7.1f} ms | "
        f"TTFT p50 {(ttft['p50'] or 0) * 1e3:6.1f} ms "
        f"p95 {(ttft['p95'] or 0) * 1e3:6.1f} ms"
    )
    return {
        "tok_s": tok_s,
        "ttft_p50": ttft["p50"],
        "ttft_p95": ttft["p95"],
    }


if __name__ == "__main__":
    main()
