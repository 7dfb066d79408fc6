"""HTTP serving frontend over the continuous-batching engine.

Stdlib-only (ThreadingHTTPServer): the reference is a one-shot CLI
(SURVEY.md section 5, "any server/API mode: ABSENT"); this is the north-star
serving surface (BASELINE config 4) with p50/p95 TTFT metrics.

Endpoints:
  POST /generate  {"prompt": str, "temperature": f, "top_p": f, "steps": n,
                   "seed": n}  →  {"text", "tokens", "prompt_len",
                   "ttft_ms", "total_ms", "tokens_per_sec"}
  GET  /health    → {"status": "ok", "slots": N, "waiting": M}
  GET  /metrics   → request/token counters + TTFT percentiles

Run:  python -m llama2_tpu.runtime.server <checkpoint.bin> \
          [-z tokenizer.bin] [--port 8000] [--batch-size 8] [--quant int8] \
          [--paged [--page-size 256] [--pages N] [--prefix-cache]]
          [--ticks-per-sync K] [--pipeline-depth P] [--kv-cache f32|int8]
          [--spec N]
          [--kernels xla|pallas] [--mesh DPxTP] [--collective-matmul]
          [--precompile L1,L2,...]

``--paged`` switches the KV cache to the paged layout
(runtime/paged_engine.py): memory scales with tokens in flight instead of
batch_size * seq_len. ``--prefix-cache`` adds vLLM-style automatic prefix
caching: full prompt-prefix pages are shared across requests, so repeated
system prompts prefill only their unique suffix. ``--mesh 2x4`` serves over
a (data, model) device mesh: params tensor-shard over ``model``, slots over
``data``, every tick one program (parallel/sharding.py; with ``--kernels
pallas`` the tick runs the fused kernels per-shard inside shard_map —
parallel/tp.py). ``--collective-matmul`` swaps the row-parallel wo/w2
psums for the explicit overlapped ring (parallel/collective_matmul.py) —
on the dense engine and, via the shard_map paged ticks, on ``--paged``.
``--precompile 16,128`` AOT-compiles the decode tick and the prefill-chunk
programs for those prompt lengths at startup, overlapping the (remote,
minutes-scale at 7B) compiles with the asynchronous weight upload instead
of paying them on the first request (dense single-device engine).
"""

from __future__ import annotations

import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from llama2_tpu.config import GenerationConfig


class _Handler(BaseHTTPRequestHandler):
    engine = None  # set by serve()
    tokenizer = None

    def _send(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):
        eng = self.engine
        if self.path == "/health":
            self._send(
                200,
                {
                    "status": "ok",
                    "slots": eng.batch_size,
                    "active": sum(1 for s in eng.slots if s is not None),
                    "waiting": eng.waiting.qsize(),
                },
            )
        elif self.path == "/metrics":
            pct = eng.ttft_percentiles()
            out = {
                "requests": eng.metrics["requests"],
                "tokens": eng.metrics["tokens"],
                "ttft_p50_ms": None if pct["p50"] is None else pct["p50"] * 1e3,
                "ttft_p95_ms": None if pct["p95"] is None else pct["p95"] * 1e3,
                # TTFT = queue wait + prefill; under a request wave the p50
                # is queueing, so both series are reported separately
                "queue_wait_p50_ms": None if pct["queue_wait_p50"] is None
                else pct["queue_wait_p50"] * 1e3,
                "prefill_p50_ms": None if pct["prefill_p50"] is None
                else pct["prefill_p50"] * 1e3,
            }
            if getattr(eng, "prefix", None) is not None:
                out["prefix_hit_pages"] = eng.metrics["prefix_hit_pages"]
                out["prefix_cached_pages"] = len(eng.prefix.key2page)
            self._send(200, out)
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/generate":
            self._send(404, {"error": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._send(400, {"error": "invalid JSON body"})
            return
        if not isinstance(req, dict):
            self._send(400, {"error": "body must be a JSON object"})
            return

        prompt = req.get("prompt", "")
        if not isinstance(prompt, str):
            self._send(400, {"error": "prompt must be a string"})
            return
        try:
            seed = req.get("seed")
            if seed is not None:
                seed = int(seed)  # a bad seed must fail HERE, not on the
                # engine thread, where one request's error fails the batch
            gen = GenerationConfig(
                temperature=float(req.get("temperature", 1.0)),
                top_p=min(max(float(req.get("top_p", 0.9)), 0.0), 1.0),
                steps=int(req.get("steps", 0)),
                seed=seed,
            )
        except (TypeError, ValueError) as e:
            self._send(400, {"error": f"bad parameter: {e}"})
            return

        try:
            prompt_tokens = self.tokenizer.encode(prompt) if prompt else []
        except ValueError as e:
            self._send(400, {"error": str(e)})
            return

        try:
            res = self.engine.generate(prompt_tokens, gen, timeout=600)
        except Exception as e:  # noqa: BLE001 — surface engine errors as 500s
            self._send(500, {"error": str(e)})
            return

        text = self.tokenizer.decode(res.tokens).decode("utf-8", errors="replace")
        decode_s = max(res.total_s - res.ttft_s, 1e-9)
        self._send(
            200,
            {
                "text": text,
                "tokens": res.tokens,
                "prompt_len": res.prompt_len,
                "ttft_ms": res.ttft_s * 1e3,
                "total_ms": res.total_s * 1e3,
                "tokens_per_sec": max(len(res.tokens) - 1, 0) / decode_s,
            },
        )


def serve(engine, tokenizer, host: str = "127.0.0.1", port: int = 8000):
    """Start the engine thread + HTTP server (blocks)."""
    _Handler.engine = engine
    _Handler.tokenizer = tokenizer
    engine.start()
    httpd = ThreadingHTTPServer((host, port), _Handler)
    print(f"serving on http://{host}:{port} (slots={engine.batch_size})", file=sys.stderr)
    try:
        httpd.serve_forever()
    finally:
        engine.stop()


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = None
    tok_path = "tokenizer.bin"
    port = 8000
    host = "127.0.0.1"
    batch = 8
    quant = "none"
    dtype = "f32"
    platform = None
    paged = False
    page_size = 256
    n_pages = None
    prefix_cache = False
    ticks = 1
    pipeline_depth = 2
    kv_cache = "f32"
    spec = 0
    kernels = "xla"
    mesh_spec = None
    collective = None
    precompile = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-z":
            i += 1
            tok_path = argv[i]
        elif a == "--port":
            i += 1
            port = int(argv[i])
        elif a == "--host":
            i += 1
            host = argv[i]
        elif a == "--batch-size":
            i += 1
            batch = int(argv[i])
        elif a == "--quant":
            i += 1
            quant = argv[i]
        elif a == "--dtype":
            i += 1
            dtype = argv[i]
        elif a == "--platform":
            i += 1
            platform = argv[i]
        elif a == "--paged":
            paged = True
        elif a == "--prefix-cache":
            prefix_cache = True
        elif a == "--ticks-per-sync":
            i += 1
            ticks = int(argv[i])
        elif a == "--pipeline-depth":
            i += 1
            pipeline_depth = int(argv[i])
        elif a == "--kv-cache":
            i += 1
            kv_cache = argv[i]
            if kv_cache not in ("f32", "int8"):
                print("--kv-cache must be f32 or int8", file=sys.stderr)
                return 1
        elif a == "--spec":
            i += 1
            spec = int(argv[i])
            if spec < 0 or spec == 1 or spec > 64:
                print("--spec must be 0 or 2..64", file=sys.stderr)
                return 1
        elif a == "--kernels":
            i += 1
            kernels = argv[i]
            if kernels not in ("xla", "pallas"):
                print("--kernels must be xla or pallas", file=sys.stderr)
                return 1
        elif a == "--mesh":
            i += 1
            mesh_spec = argv[i]
        elif a == "--collective-matmul":
            # explicit overlapped ring for the row-parallel wo/w2 reduces
            # (parallel/collective_matmul.py); requires --mesh
            collective = "ring"
        elif a == "--precompile":
            # AOT-compile decode + prefill-chunk programs for the given
            # prompt lengths at startup, overlapping the (remote) compiles
            # with the async weight upload (dense single-device engine only)
            i += 1
            precompile = [int(v) for v in argv[i].split(",") if v]
        elif a == "--page-size":
            i += 1
            page_size = int(argv[i])
        elif a == "--pages":
            i += 1
            n_pages = int(argv[i])
        elif not a.startswith("-") and path is None:
            path = a
        else:
            print(f"unknown argument {a}", file=sys.stderr)
            return 1
        i += 1
    if path is None:
        print(__doc__, file=sys.stderr)
        return 1

    if prefix_cache and not paged:
        print("--prefix-cache requires --paged", file=sys.stderr)
        return 1
    if precompile is not None and (paged or mesh_spec is not None):
        print("--precompile covers the dense single-device engine",
              file=sys.stderr)
        return 1
    if collective and mesh_spec is None:
        print("--collective-matmul requires --mesh", file=sys.stderr)
        return 1
    if mesh_spec is not None:
        try:
            _dp, _tp = (int(v) for v in mesh_spec.lower().split("x"))
        except ValueError:
            print("--mesh must look like 2x4 (data x model)", file=sys.stderr)
            return 1

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from llama2_tpu.io import load_any
    from llama2_tpu.runtime.batch_engine import BatchEngine
    from llama2_tpu.tokenizer.fast import load_tokenizer

    mesh = None
    if mesh_spec is not None:
        from llama2_tpu.parallel.mesh import make_mesh

        try:
            mesh = make_mesh(_dp, _tp)
        except ValueError as e:
            print(f"--mesh {mesh_spec}: {e}", file=sys.stderr)
            return 1

    config, params, _ = load_any(path)
    tokenizer = load_tokenizer(tok_path, config.vocab_size)
    if quant == "int8":
        from llama2_tpu.quant.q8 import quantize_params

        params = quantize_params(params)
    if paged:
        from llama2_tpu.runtime.paged_engine import PagedBatchEngine

        engine = PagedBatchEngine(
            config,
            params,
            batch_size=batch,
            page_size=page_size,
            n_pages=n_pages,
            dtype=jnp.float32 if dtype == "f32" else jnp.bfloat16,
            ticks_per_sync=ticks,
            pipeline_depth=pipeline_depth,
            backend=kernels,
            kv_quant=kv_cache == "int8",
            spec_window=spec,
            mesh=mesh,
            prefix_cache=prefix_cache,
        )
    else:
        engine = BatchEngine(
            config,
            params,
            batch_size=batch,
            dtype=jnp.float32 if dtype == "f32" else jnp.bfloat16,
            ticks_per_sync=ticks,
            pipeline_depth=pipeline_depth,
            kv_quant=kv_cache == "int8",
            spec_window=spec,
            backend=kernels,
            mesh=mesh,
            collective=collective,
        )
        if precompile is not None:
            t0 = time.perf_counter()
            engine.precompile(
                prompt_lens=precompile, stochastic=(False, True),
                spec=spec > 0,
            )
            print(
                f"precompiled {len(engine._aot)} programs in "
                f"{time.perf_counter() - t0:.1f}s (overlapped with upload)",
                file=sys.stderr,
            )
    serve(engine, tokenizer, host, port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
