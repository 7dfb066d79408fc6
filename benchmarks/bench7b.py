"""7B-class INT8 end-to-end serving benchmark (the north-star proof).

Protocol mirror of the reference's README.md:71-88 measurement, scaled to the
north star (BASELINE.md: Llama-2 7B INT8, >=85% of roofline): build a
Llama-2-7B-shaped INT8 model (random weights — decode bandwidth does not care
about values), load it through the on-disk param cache, serve it through the
continuous-batching engine on one chip, and report:

  * aggregate decode throughput (tok/s) + TTFT p50/p95 under a request wave;
  * steady-state per-decode-step latency with all slots active;
  * end-to-end %% of the HBM weight-stream roofline for the FULL decode step
    (every step must stream the whole ~6.6 GB INT8 weight set; the roofline
    step time is weight_bytes / HBM_BW) — both weights-only and weights+KV.

Prints one JSON line; run with --write to also update BENCH_7B.json.

    python benchmarks/bench7b.py --model 7b --batch 8 --steps 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819e9  # v5e HBM peak (16 GB @ 819 GB/s)


def fuse_host(params: dict) -> dict:
    """fuse_layer_params on HOST numpy (one read of x per co-located matmul,
    models/llama.py::fuse_layer_params) — fusing on device would transiently
    hold both the unfused and fused 7B trees in HBM."""
    from llama2_tpu.quant.q8 import QuantTensor

    def cat(*ws):
        assert len({w.group_size for w in ws}) == 1
        return QuantTensor(
            q=np.concatenate([np.asarray(w.q) for w in ws], axis=-1),
            scale=np.concatenate([np.asarray(w.scale) for w in ws], axis=-1),
            group_size=ws[0].group_size,
        )

    out = {k: v for k, v in params.items()
           if k not in ("wq", "wk", "wv", "w1", "w3")}
    out["wqkv"] = cat(params["wq"], params["wk"], params["wv"])
    from llama2_tpu.models.llama import use_mlp_block

    if use_mlp_block(params, "pallas"):
        # FFN runs as the fused megakernel — w1/w3 stay separate
        out["w1"], out["w3"] = params["w1"], params["w3"]
    else:
        out["w13"] = cat(params["w1"], params["w3"])
    return out


def stream_bytes_per_step(params) -> int:
    """Bytes every decode step must read from HBM for weights: all QuantTensor
    int8 + scales + the fp32 norms. The embedding gather reads B rows only."""
    from llama2_tpu.quant.q8 import QuantTensor

    total = 0
    for name, v in params.items():
        if isinstance(v, QuantTensor):
            total += np.asarray(v.q).nbytes + np.asarray(v.scale).nbytes
        elif name.startswith("rms"):
            total += np.asarray(v).nbytes
    return total


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b")
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batch-sweep", default=None,
                    help="comma list of batch sizes; params upload ONCE and "
                    "every size reuses the device tree (e.g. 8,16,32). One "
                    "JSON line per size; --write records the --batch entry")
    ap.add_argument("--steps", type=int, default=128, help="tokens per request")
    ap.add_argument("--ticks", type=int, default=32, help="ticks per host sync")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--prompt-len", type=int, default=16)
    ap.add_argument("--roofline-syncs", type=int, default=6)
    ap.add_argument("--write", action="store_true", help="update BENCH_7B.json")
    args = ap.parse_args(argv)

    from llama2_tpu.io.cache import is_cache_dir, load_cache
    from llama2_tpu.runtime.batch_engine import BatchEngine
    from llama2_tpu.tools.make_random_q8 import build

    cache_dir = args.cache_dir or f"/tmp/llama2_tpu_bench_{args.model}_q8"
    if not is_cache_dir(cache_dir):
        print(f"[bench7b] building random {args.model} INT8 cache at "
              f"{cache_dir} ...", file=sys.stderr)
        t0 = time.perf_counter()
        build(cache_dir, args.model, seq_len=args.seq_len)
        print(f"[bench7b] built in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    t0 = time.perf_counter()
    config, params, _ = load_cache(cache_dir)  # mmap: zero host fp32 copy
    params = fuse_host(params)
    wbytes = stream_bytes_per_step(params)
    print(f"[bench7b] {config}", file=sys.stderr)
    print(f"[bench7b] weight stream: {wbytes / 1e9:.2f} GB/step; uploading...",
          file=sys.stderr)

    batches = ([int(b) for b in args.batch_sweep.split(",")]
               if args.batch_sweep else [args.batch])
    device_params = params  # becomes the device tree after the first engine
    primary = None
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for batch in batches:
        # the dense int8-KV cache is (L, B, KVH, S, hs) x2 — refuse sweep
        # entries that cannot fit weights + cache in HBM (batch 16 at 7B
        # S=2048 wants 8.6 GB of cache on top of the 7 GB weight set)
        kv_bytes = (2 * config.n_layers * batch * config.n_kv_heads
                    * args.seq_len * (config.head_size + 4))
        if wbytes + kv_bytes > 15.0e9:
            print(f"[bench7b] SKIP batch {batch}: weights {wbytes/1e9:.1f} GB"
                  f" + dense KV cache {kv_bytes/1e9:.1f} GB exceeds HBM "
                  "(use the paged engine / smaller --seq-len for this point)",
                  file=sys.stderr)
            continue
        eng = BatchEngine(
            config, device_params, batch_size=batch, backend="pallas",
            kv_quant=True, ticks_per_sync=args.ticks,
        )
        # engine leaves are jnp arrays: later sweep entries reuse them as-is
        device_params = eng.params
        # cold-start overlap: the h2d upload above was dispatched async;
        # AOT-compile the serving programs NOW so the remote Mosaic compile
        # runs concurrently with the multi-GB transfer instead of
        # serializing behind it in the warmup wave
        t_pc = time.perf_counter()
        eng.precompile(prompt_lens=[args.prompt_len], stochastic=(False,))
        pc_s = time.perf_counter() - t_pc
        # force the upload + a scalar fetch so load time is measured honestly
        np.asarray(eng.params["rms_final"][:1])
        load_s = time.perf_counter() - t0
        print(f"[bench7b] load+upload(+compile overlap) {load_s:.1f}s "
              f"(precompile {pc_s:.1f}s, batch {batch})", file=sys.stderr)
        out = _measure(eng, config, wbytes, batch, load_s, args)
        out["precompile_s"] = round(pc_s, 1)
        print(json.dumps(out))
        if batch == args.batch or primary is None:
            primary = out
            if args.write:
                # write EAGERLY: a later sweep entry crashing (e.g. an HBM
                # OOM at a bigger batch) must not lose the primary result
                with open(os.path.join(root, "BENCH_7B.json"), "w") as f:
                    json.dump(primary, f, indent=1)
        del eng
        t0 = time.perf_counter()  # later entries report re-init only
    return 0


def _measure(eng, config, wbytes, batch, load_s, args) -> dict:
    from llama2_tpu.config import GenerationConfig

    rng = np.random.default_rng(0)
    gen = GenerationConfig(temperature=0.0, steps=args.steps, seed=0)

    def prompt():
        return [int(t) for t in rng.integers(3, config.vocab_size, args.prompt_len)]

    # ---- phase 0: warmup (absorbs prefill-chunk + tick compiles, which on
    # a remote Mosaic service cost minutes and would otherwise pollute the
    # measured wave's TTFT) ----
    print("[bench7b] warmup wave (first tick compiles; minutes on a remote "
          "Mosaic service)...", file=sys.stderr)
    t0 = time.perf_counter()
    warm = GenerationConfig(
        temperature=0.0, steps=2 * args.ticks + 2, seed=0
    )
    wq = [eng.submit(prompt(), warm) for _ in range(batch)]
    eng.run_until_idle()
    for q in wq:
        r = q.get(timeout=3600)
        if isinstance(r, Exception):
            raise r
    eng.metrics["requests"] = 0
    eng.metrics["tokens"] = 0
    eng.metrics["ttft"] = []
    eng.metrics["queue_wait"] = []
    eng.metrics["prefill"] = []
    warmup_s = time.perf_counter() - t0
    print(f"[bench7b] warmup done in {warmup_s:.1f}s", file=sys.stderr)

    # ---- phase 1: serving wave (steady-state: everything compiled) ----
    n_req = 2 * batch
    t0 = time.perf_counter()
    queues = [eng.submit(prompt(), gen) for _ in range(n_req)]
    eng.run_until_idle()
    results = [q.get(timeout=1200) for q in queues]
    wall = time.perf_counter() - t0
    for r in results:
        if isinstance(r, Exception):
            raise r
    emitted = sum(len(r.tokens) - args.prompt_len for r in results)
    agg_tok_s = emitted / wall
    pct = eng.ttft_percentiles()

    # ---- phase 2: steady-state roofline (all slots active, timed syncs) ----
    big = GenerationConfig(temperature=0.0, steps=config.seq_len - args.prompt_len - 8, seed=0)
    queues = [eng.submit(prompt(), big) for _ in range(batch)]
    eng._admit()
    assert all(s is not None for s in eng.slots), "roofline needs a full batch"
    eng._decode_tick()  # warm (already compiled in phase 1)
    t0 = time.perf_counter()
    for _ in range(args.roofline_syncs):
        eng._decode_tick()
    dt = time.perf_counter() - t0
    n_steps = args.roofline_syncs * args.ticks
    step_s = dt / n_steps
    # KV traffic actually read during the timed window (int8 K+V + scales);
    # per-step traffic grows linearly with pos, so the window mean is the
    # traffic at its midpoint position
    pos_mid = float(np.mean(eng._pos)) - n_steps / 2
    kv_row = config.n_kv_heads * ((config.head_size + 127) // 128 * 128)
    kv_bytes = batch * config.n_layers * pos_mid * (kv_row * 2 + 8)
    roof_w = (wbytes / HBM_GBPS) / step_s
    roof_wkv = ((wbytes + kv_bytes) / HBM_GBPS) / step_s
    # drain phase-2 requests (don't leave the engine mid-flight)
    for slot, req in enumerate(list(eng.slots)):
        if req is not None:
            eng.slots[slot] = None
            req.result_q.put(None)

    out = {
        "metric": f"llama_{args.model}_int8_serving_1chip",
        "tok_s": round(agg_tok_s, 1),
        "unit": "tok/s aggregate",
        "ttft_p50_s": round(pct["p50"], 3) if pct["p50"] else None,
        "ttft_p95_s": round(pct["p95"], 3) if pct["p95"] else None,
        # TTFT = queue wait + prefill; split so the prefill cost is
        # falsifiable independently of admission queueing (VERDICT r4 #9)
        "queue_wait_p50_s": round(pct["queue_wait_p50"], 3)
        if pct["queue_wait_p50"] else None,
        "prefill_p50_s": round(pct["prefill_p50"], 4)
        if pct["prefill_p50"] else None,
        "decode_step_ms": round(step_s * 1e3, 2),
        "weight_stream_gb": round(wbytes / 1e9, 2),
        "roofline_weight_pct": round(100 * roof_w, 1),
        "roofline_weight_kv_pct": round(100 * roof_wkv, 1),
        "batch": batch,
        "ticks_per_sync": args.ticks,
        "requests": n_req,
        "steps_per_request": args.steps,
        "load_upload_s": round(load_s, 1),
        "warmup_s": round(warmup_s, 1),
    }
    return out


if __name__ == "__main__":
    raise SystemExit(main())
