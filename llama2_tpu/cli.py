"""CLI mirroring the reference's surface (main.zig:800-934).

Same flags, same defaults-from-code (temperature 1.0, top-p 0.9 clamped,
seq-len 0 = model max, tokenizer path "tokenizer.bin", seed = wall clock),
same hand-rolled arg loop behaviors (unknown flag → usage; missing value /
unparseable value / duplicate checkpoint → error exit 1), same output framing,
and the same end-of-run `{d} tokens per second` verbose report.

TPU-specific extras use long-only flags so the reference surface stays clean:
``--dtype {f32,bf16}``, ``--quant {none,int8}``, ``--prefill-chunk N``,
``--profile DIR`` (jax.profiler trace).
"""

from __future__ import annotations

import sys

USAGE = """Usage:   llama2 <checkpoint> [options]
Example: llama2 checkpoint.bin -n 256 -i "Once upon a time"
Options:
 -h, --help                print this help message
 -t, --temperature <float> temperature, default 1.0 (0.0, 1]
 -p, --top-p <float>       p value in top-p (nucleus) sampling. default 0.9, 0 || 1 = off
 -n, --seq-len <int>       number of steps to run for, default 256. 0 = max_seq_len
 -i, --input <string>      input text for the prompt, default ""
 -s, --seed <int>          random seed, default to time
 -v, --verbose             print model info and tokens/s
 -z, --tokenizer <path>    path to the tokenizer to use, default to "tokenizer.bin"
TPU options:
 --dtype <f32|bf16>        compute/weight dtype, default f32 (f32 = parity mode)
 --quant <none|int8>       weight-only group-quantized INT8 path, default none
 --prefill-chunk <int>     prefill segment length, default whole prompt
 --profile <dir>           capture a jax.profiler trace of the run into <dir>
 --platform <name>         force a jax platform (e.g. cpu), default = env
 --kernels <xla|pallas|pallas-accurate>  quantized-matmul path, default xla
 --kv-cache <f32|int8>     KV cache storage (int8: 4x less attention traffic)
 --spec <int>              greedy speculative decoding window (exact; 0 = off)
 --save-cache <dir>        write the loaded params to a fast-load cache dir
 --warmup                  run a warmup generate so tokens/s excludes compile
 --seq-shards <int>        shard the KV cache's sequence axis over N devices
                           (distributed flash-decode; long-context contexts
                           beyond one chip's HBM; fp/XLA path)
"""


def _die(msg: str) -> "NoReturn":
    print(f"error: {msg}", file=sys.stderr)
    raise SystemExit(1)


def parse_args(argv: list[str]) -> dict | None:
    """Parse the reference's argv surface; returns None if usage was printed."""
    if len(argv) < 1:
        sys.stdout.write(USAGE)
        return None

    opts = {
        "bin_path": None,
        "input": None,
        "temperature": 1.0,
        "top_p": 0.9,
        "seq_len": 0,
        "tokenizer_path": "tokenizer.bin",
        "seed": None,
        "verbose": False,
        "dtype": "f32",
        "quant": "none",
        "kv_cache": "f32",
        "spec": 0,
        "prefill_chunk": None,
        "profile": None,
        "platform": None,
        "kernels": "xla",
        "save_cache": None,
        "warmup": False,
        "seq_shards": 0,
    }

    def take_value(i: int, name: str) -> tuple[str, int]:
        if i + 1 >= len(argv):
            _die(f"missing argument for {name}")
        return argv[i + 1], i + 1

    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg in ("-h", "--help"):
            sys.stdout.write(USAGE)
            return None
        if not arg.startswith("-"):
            if opts["bin_path"] is not None:
                _die("multiple checkpoint paths specified")
            opts["bin_path"] = arg
        elif arg in ("-t", "--temperature"):
            val, i = take_value(i, "temperature")
            try:
                opts["temperature"] = float(val)
            except ValueError:
                _die(f"unable to parse --temperature argument '{val}'")
        elif arg in ("-p", "--top-p"):
            val, i = take_value(i, "top-p")
            try:
                opts["top_p"] = min(max(float(val), 0.0), 1.0)
            except ValueError:
                _die(f"unable to parse --top-p argument '{val}'")
        elif arg in ("-n", "--seq-len"):
            val, i = take_value(i, "seq-len")
            try:
                opts["seq_len"] = int(val)
            except ValueError:
                _die(f"unable to parse --seq-len argument '{val}'")
        elif arg in ("-i", "--input"):
            opts["input"], i = take_value(i, "input")
        elif arg in ("-s", "--seed"):
            val, i = take_value(i, "seed")
            try:
                opts["seed"] = int(val)
            except ValueError:
                _die(f"unable to parse --seed argument '{val}'")
        elif arg in ("-z", "--tokenizer"):
            opts["tokenizer_path"], i = take_value(i, "tokenizer")
        elif arg in ("-v", "--verbose"):
            opts["verbose"] = True
        elif arg == "--dtype":
            val, i = take_value(i, "dtype")
            if val not in ("f32", "bf16"):
                _die(f"unable to parse --dtype argument '{val}'")
            opts["dtype"] = val
        elif arg == "--spec":
            val, i = take_value(i, "spec")
            try:
                opts["spec"] = int(val)
            except ValueError:
                _die(f"unable to parse --spec argument '{val}'")
            if opts["spec"] < 0 or opts["spec"] == 1 or opts["spec"] > 64:
                _die("--spec must be 0 (off) or 2..64 (draft window)")
        elif arg == "--kv-cache":
            val, i = take_value(i, "kv-cache")
            if val not in ("f32", "int8"):
                _die(f"unable to parse --kv-cache argument '{val}'")
            opts["kv_cache"] = val
        elif arg == "--quant":
            val, i = take_value(i, "quant")
            if val not in ("none", "int8"):
                _die(f"unable to parse --quant argument '{val}'")
            opts["quant"] = val
        elif arg == "--prefill-chunk":
            val, i = take_value(i, "prefill-chunk")
            try:
                opts["prefill_chunk"] = int(val)
            except ValueError:
                _die(f"unable to parse --prefill-chunk argument '{val}'")
            if opts["prefill_chunk"] < 1:
                _die("--prefill-chunk must be >= 1")
        elif arg == "--profile":
            opts["profile"], i = take_value(i, "profile")
        elif arg == "--platform":
            opts["platform"], i = take_value(i, "platform")
        elif arg == "--kernels":
            val, i = take_value(i, "kernels")
            if val not in ("xla", "pallas", "pallas-accurate"):
                _die(f"unable to parse --kernels argument '{val}'")
            opts["kernels"] = val
        elif arg == "--save-cache":
            opts["save_cache"], i = take_value(i, "save-cache")
        elif arg == "--seq-shards":
            val, i = take_value(i, "seq-shards")
            try:
                opts["seq_shards"] = int(val)
            except ValueError:
                _die(f"unable to parse --seq-shards argument '{val}'")
            if opts["seq_shards"] < 0:
                _die("--seq-shards must be >= 0")
        elif arg == "--warmup":
            opts["warmup"] = True
        else:
            print(f"error: unknown argument '{arg}'", file=sys.stderr)
            sys.stdout.write(USAGE)
            return None
        i += 1
    if opts["bin_path"] is None:
        sys.stdout.write(USAGE)
        return None
    return opts


def main(argv: list[str] | None = None) -> int:
    opts = parse_args(sys.argv[1:] if argv is None else argv)
    if opts is None:
        return 0

    # import lazily so `-h` costs nothing
    import jax

    if opts["platform"]:
        jax.config.update("jax_platforms", opts["platform"])
    import jax.numpy as jnp

    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.io import load_any
    from llama2_tpu.runtime.generator import Generator
    from llama2_tpu.tokenizer.fast import load_tokenizer
    from llama2_tpu.tokenizer.tokenizer import BOS

    def log(msg: str):
        if opts["verbose"]:
            print(msg, file=sys.stderr)

    config, params, shared = load_any(opts["bin_path"])
    log(f"config: {config}")
    log(f"shared weights: {shared}")
    log(f"temperature: {opts['temperature']}")
    log(f"top-p: {opts['top_p']}")
    log(f"devices: {jax.devices()}")
    log(f"dtype: {opts['dtype']}  quant: {opts['quant']}")
    log("")

    # native C++ encoder when buildable, byte-identical Python fallback
    tokenizer = load_tokenizer(opts["tokenizer_path"], config.vocab_size)

    prompt_tokens: list[int] = []
    if opts["input"]:
        prompt_tokens = tokenizer.encode(opts["input"])

    if opts["quant"] == "int8":
        from llama2_tpu.quant.q8 import QuantTensor, quantize_params

        if not any(isinstance(v, QuantTensor) for v in params.values()):
            params = quantize_params(params)
    if opts["save_cache"]:
        from llama2_tpu.io.cache import save_cache

        save_cache(opts["save_cache"], config, params, shared)
        log(f"wrote param cache to {opts['save_cache']}")
    dtype = jnp.float32 if opts["dtype"] == "f32" else jnp.bfloat16
    precision = (
        jax.lax.Precision.HIGHEST if opts["dtype"] == "f32" else jax.lax.Precision.DEFAULT
    )

    if opts["seq_shards"] >= 2:
        # distributed flash-decode: KV sequence axis sharded over a (seq,)
        # mesh — resident context scales with the shard count
        # (parallel/ring_decode.py). fp/XLA long-context path.
        return _run_seq_sharded(opts, config, params, tokenizer, log)

    generator = Generator(
        config, params, dtype=dtype, precision=precision,
        backend=opts["kernels"], kv_quant=opts["kv_cache"] == "int8",
        speculative=opts["spec"],
    )

    gen = GenerationConfig(
        temperature=opts["temperature"],
        top_p=opts["top_p"],
        steps=opts["seq_len"],
        seed=opts["seed"],
    )

    if opts["spec"] >= 2 and (opts["temperature"] != 0.0):
        print(
            "warning: --spec applies to greedy decoding only (-t 0); ignored",
            file=sys.stderr,
        )

    if opts["warmup"]:
        # must compile the SAME decode-loop specialization the timed run
        # uses: the sampler mode is a static jit argument
        generator.generate(
            [],
            GenerationConfig(
                temperature=opts["temperature"], top_p=opts["top_p"],
                steps=2, seed=0,
            ),
        )

    profile_dir = opts["profile"]
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        result = generator.generate(
            prompt_tokens, gen, prefill_chunk=opts["prefill_chunk"]
        )
    finally:
        if profile_dir:
            jax.profiler.stop_trace()

    sys.stdout.buffer.write(tokenizer.decode(result.tokens, first_prev=BOS))
    sys.stdout.buffer.flush()
    log(f"\n\n{int(result.tokens_per_sec)} tokens per second")
    log(f"ttft: {result.ttft_s * 1e3:.1f} ms")
    return 0


def _run_seq_sharded(opts, config, params, tokenizer, log) -> int:
    """`--seq-shards N` path: generate through the sequence-sharded decoder
    (parallel/ring_decode.SeqShardedDecoder) with the same sampling flags
    and output framing as the Generator path."""
    import time

    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.parallel.ring_decode import SeqShardedDecoder
    from llama2_tpu.parallel.sp import make_seq_mesh
    from llama2_tpu.quant.q8 import QuantTensor
    from llama2_tpu.tokenizer.tokenizer import BOS

    if any(isinstance(v, QuantTensor) for v in params.values()):
        _die(
            "--seq-shards runs the fp/XLA sequence-sharded decoder; "
            "--quant int8 is not supported on this path"
        )
    for flag, val, off in (
        ("--spec", opts["spec"], 0),
        ("--kv-cache", opts["kv_cache"], "f32"),
        ("--kernels", opts["kernels"], "xla"),
    ):
        if val != off:
            print(
                f"warning: {flag} does not apply to --seq-shards (fp/XLA "
                "distributed flash-decode); ignored",
                file=sys.stderr,
            )

    prompt_tokens: list[int] = []
    if opts["input"]:
        prompt_tokens = tokenizer.encode(opts["input"])
    gen = GenerationConfig(
        temperature=opts["temperature"],
        top_p=opts["top_p"],
        steps=opts["seq_len"],
        seed=opts["seed"],
    )
    decoder = SeqShardedDecoder(config, params, make_seq_mesh(opts["seq_shards"]))
    log(f"seq shards: {decoder.sp} (rows per shard: {decoder.s_local})")
    t0 = time.perf_counter()
    tokens = decoder.generate_batch([prompt_tokens], gen)[0]
    total_s = time.perf_counter() - t0
    sys.stdout.buffer.write(tokenizer.decode(tokens, first_prev=BOS))
    sys.stdout.buffer.flush()
    tps = (len(tokens) - 1) / total_s if len(tokens) > 1 and total_s > 0 else 0.0
    log(f"\n\n{int(tps)} tokens per second")
    return 0
