"""Headline benchmark: stories15M-shaped argmax decode throughput on one chip.

Mirrors the reference's protocol (README.md:71-88): 256 decode steps at
temperature 0, throughput = (emitted-1)/time-after-first-token; the reference
achieves 660 tok/s on a Ryzen 5900X single thread. stories15M.bin itself is
stripped from the snapshot, so weights are random with the exact stories15M
shapes — identical compute/bandwidth profile, and argmax decode cost does not
depend on weight values.

Prints ONE JSON line with three throughput figures so round-over-round
tracking can't be gamed by speculative-acceptance luck:
  value       — exact speculative decode (prompt-lookup drafts, parallel
                verify; stream asserted identical to plain greedy in-run)
  value_plain — the plain on-device decode loop (honest per-token latency)
  value_int8  — plain loop on the Q8_0-quantized model (fused Pallas kernels)

Measurement discipline (VERDICT r4 #5): the three variants are sampled
INTERLEAVED over N rounds and each reports median + spread, so a tunnel
drifting between variant blocks reads as spread instead of masquerading as
a regression (the r03→r04 "INT8 got slower than fp32" flip was exactly this
ambiguity).
"""

from __future__ import annotations

import json

BASELINE_TOK_S = 660.0  # reference argmax decode, README.md:86-88


def _interleaved(variants, gen, rounds):
    """Sample every variant once per round, in round-robin order.

    ``variants``: dict name -> (generator, ref_tokens | None). A variant
    whose stream diverges from its ref is marked invalid (None samples).
    Returns dict name -> list of tok/s samples (or None).
    """
    samples = {n: [] for n in variants}
    dead = set()
    for _ in range(rounds):
        for name, (g, ref) in variants.items():
            if name in dead:
                continue
            res = g.generate([], gen)
            if ref is not None and res.tokens != ref:
                dead.add(name)
                continue
            samples[name].append(res.tokens_per_sec)
    for name in dead:
        samples[name] = None
    return samples


def _stats(xs):
    if not xs:
        return 0.0, 0.0, 0.0
    s = sorted(xs)
    return s[len(s) // 2], s[-1], s[-1] - s[0]


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail FAST (with a clear message) when the TPU backend is unreachable:
    jax backend init retries indefinitely on a dead transport, which would
    otherwise hang this benchmark without explanation."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(
            "bench.py: TPU backend unreachable (probe timed out after "
            f"{timeout_s:.0f}s) — not a code failure; re-run when the "
            "device/tunnel is back.",
            file=sys.stderr,
        )
        raise SystemExit(1)
    if r.returncode != 0:
        print(
            "bench.py: TPU backend failed to initialize — not a code "
            f"failure; re-run when the device/tunnel is back.\n{r.stderr[-500:]}",
            file=sys.stderr,
        )
        raise SystemExit(1)


def main() -> None:
    _probe_backend()

    from __graft_entry__ import _flagship

    from llama2_tpu.config import GenerationConfig
    from llama2_tpu.quant.q8 import quantize_params
    from llama2_tpu.runtime.generator import Generator

    config, params = _flagship()
    gen = GenerationConfig(temperature=0.0, steps=256, seed=0)
    warm = GenerationConfig(temperature=0.0, steps=4, seed=0)

    # Plain on-device while_loop decode: the honest per-token latency figure.
    plain = Generator(config, params)
    plain.generate([], warm)
    ref_tokens = plain.generate([], gen).tokens

    # Exact speculative decoding (prompt-lookup drafts, parallel verify): a
    # pure wall-clock optimization — the emitted stream is asserted identical
    # to plain greedy on every run, with a plain fallback on any divergence.
    spec = Generator(config, params, speculative=16)
    spec.generate([], warm)

    # INT8: Q8_0 weights + fused dequant-matmul Pallas kernels, plain loop.
    variants = {"plain": (plain, None), "spec": (spec, ref_tokens)}
    try:
        q = Generator(config, quantize_params(params), backend="pallas")
        q.generate([], warm)
        variants["int8"] = (q, None)
    except Exception:
        pass  # INT8 is reported best-effort; the headline never blocks on it

    samples = _interleaved(variants, gen, rounds=7)
    p_med, p_best, p_spread = _stats(samples["plain"])
    s_med, s_best, s_spread = _stats(samples.get("spec") or [])
    i_med, i_best, i_spread = _stats(samples.get("int8") or [])
    if s_med == 0.0:  # spec diverged: fall back to plain (exactness first)
        s_med, s_best, s_spread = p_med, p_best, p_spread

    print(
        json.dumps(
            {
                "metric": "stories15M_decode_tok_s_argmax_1chip",
                "value": round(s_med, 1),
                "unit": "tok/s",
                "vs_baseline": round(s_med / BASELINE_TOK_S, 3),
                "value_plain": round(p_med, 1),
                "value_int8": round(i_med, 1),
                "n_tokens": len(ref_tokens),
                # interleaved-sample stats: median is the headline; spread
                # (max - min over the 7 rounds) bounds transport drift, so a
                # real regression is one that exceeds the spread
                "best": {"spec": round(s_best, 1), "plain": round(p_best, 1),
                         "int8": round(i_best, 1)},
                "spread": {"spec": round(s_spread, 1),
                           "plain": round(p_spread, 1),
                           "int8": round(i_spread, 1)},
                "rounds": 7,
            }
        )
    )


if __name__ == "__main__":
    main()
