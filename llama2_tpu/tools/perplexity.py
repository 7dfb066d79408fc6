"""Perplexity evaluation — the INT8 quality regression gate.

BASELINE target: INT8 perplexity within llama2.c ``runq``'s stated delta at
the same bit width. This tool computes token-level perplexity of a text under
a checkpoint (fp32 v0 or INT8 ak42 v2), teacher-forcing ``[BOS] + text``
through chunked prefill and scoring each next token.

    python -m llama2_tpu.tools.perplexity <ckpt.bin> -z tokenizer.bin \
        (-i "text" | -f file.txt) [--chunk 256] [--platform cpu]
"""

from __future__ import annotations

import sys

import numpy as np


def perplexity(config, params, tokens: list[int], chunk: int = 256, backend="xla"):
    """Mean NLL + perplexity of ``tokens`` under the model (BOS prepended)."""
    import jax
    import jax.numpy as jnp

    from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden

    feed = [1] + list(tokens)
    seq = min(len(feed), config.seq_len)
    feed = feed[:seq]
    cache = init_cache(config, 1)
    nll = []
    pos = 0
    while pos < seq - 1:
        n = min(chunk, seq - pos)  # positions pos .. pos+n-1
        hidden, cache = forward(
            params, cache, jnp.asarray([feed[pos : pos + n]]), pos, config
        )
        logits = logits_from_hidden(params, hidden)[0]  # (n, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # targets: the next fed token for every position except the last fed
        upto = min(n, seq - 1 - pos)
        targets = jnp.asarray(feed[pos + 1 : pos + 1 + upto])
        nll.append(-np.asarray(jnp.take_along_axis(logp[:upto], targets[:, None], 1))[:, 0])
        pos += n
    all_nll = np.concatenate(nll) if nll else np.zeros(0)
    mean = float(all_nll.mean()) if all_nll.size else float("nan")
    return {"nll": mean, "ppl": float(np.exp(mean)), "tokens": int(all_nll.size)}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    path = None
    tok_path = "tokenizer.bin"
    text = None
    chunk = 256
    platform = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-z":
            i += 1
            tok_path = argv[i]
        elif a == "-i":
            i += 1
            text = argv[i]
        elif a == "-f":
            i += 1
            text = open(argv[i], encoding="utf-8").read()
        elif a == "--chunk":
            i += 1
            chunk = int(argv[i])
        elif a == "--platform":
            i += 1
            platform = argv[i]
        elif not a.startswith("-") and path is None:
            path = a
        else:
            print(f"unknown argument {a}", file=sys.stderr)
            return 1
        i += 1
    if path is None or text is None:
        print(__doc__, file=sys.stderr)
        return 1

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    from llama2_tpu.io import load_any
    from llama2_tpu.tokenizer.fast import load_tokenizer

    config, params, _ = load_any(path)
    tokenizer = load_tokenizer(tok_path, config.vocab_size)
    tokens = tokenizer.encode(text)
    out = perplexity(config, params, tokens, chunk=chunk)
    print(f"tokens: {out['tokens']}  nll: {out['nll']:.4f}  ppl: {out['ppl']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
