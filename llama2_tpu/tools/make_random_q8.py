"""Build a random group-quantized INT8 model straight into a param-cache dir.

Decode throughput at a given shape does not depend on weight values (argmax
decode streams the same bytes either way), so a random INT8 model of the
exact Llama-2 shape is the honest way to measure the 7B serving path in an
environment without real weights (the reference snapshot itself ships no
model: /root/reference/.MISSING_LARGE_BLOBS).

Weights are generated directly as int8 + per-group scales in the engine's
(in, out) QuantTensor layout — never materializing an fp32 copy of the model
(a 7B fp32 tree is 27 GB of host RAM and would also quadruple the upload over
a slow host<->device link). Scales are sized so activations stay finite
through 32 layers (~N(0, 0.02) effective weights, Llama-like).

Usage:
    python -m llama2_tpu.tools.make_random_q8 /tmp/llama7b-q8 --model 7b
    python -m llama2_tpu.tools.make_random_q8 out/ --model 1b --seq-len 1024
"""

from __future__ import annotations

import argparse

import numpy as np

from llama2_tpu.config import ModelConfig
from llama2_tpu.io.cache import save_cache
from llama2_tpu.quant.q8 import QuantTensor

# Llama-2 family shapes (meta-llama configs; 7B: dim 4096, 32 layers, MHA,
# hidden 11008 = SwiGLU 2/3 rule rounded to 256)
SHAPES = {
    "7b": dict(dim=4096, hidden_dim=11008, n_layers=32, n_heads=32,
               n_kv_heads=32, vocab_size=32000, seq_len=2048),
    "1b": dict(dim=2048, hidden_dim=5632, n_layers=22, n_heads=32,
               n_kv_heads=4, vocab_size=32000, seq_len=2048),  # TinyLlama-1.1B
    "350m": dict(dim=1024, hidden_dim=2816, n_layers=16, n_heads=16,
                 n_kv_heads=16, vocab_size=32000, seq_len=1024),
    # CPU-interpret-sized shape for validating benchmark harnesses off-TPU
    # (hs=64 exercises the lane-pad path)
    "tiny": dict(dim=256, hidden_dim=512, n_layers=2, n_heads=4,
                 n_kv_heads=2, vocab_size=512, seq_len=256),
}


def random_q8_params(
    config: ModelConfig, group_size: int = 64, seed: int = 0
) -> dict:
    """Random INT8 param tree (numpy host arrays) in the engine layout."""
    rng = np.random.default_rng(seed)
    L, D, HD, V = (
        config.n_layers, config.dim, config.hidden_dim, config.vocab_size,
    )
    KV = config.kv_dim

    def qt(*shape):
        """QuantTensor of shape (..., in, out): random int8, jittered scales
        targeting an effective weight std of ~0.02 (Llama-scale)."""
        n_in = shape[-2]
        q = rng.integers(-127, 128, size=shape, dtype=np.int64).astype(np.int8)
        sshape = (*shape[:-2], n_in // group_size, shape[-1])
        # int8 uniform has std ~73; 0.02/73 ≈ 2.7e-4 nominal scale
        scale = (2.7e-4 * rng.uniform(0.7, 1.3, size=sshape)).astype(np.float32)
        return QuantTensor(q=q, scale=scale, group_size=group_size)

    def f32(*shape, loc=0.0, sd=0.02):
        return (loc + sd * rng.standard_normal(shape)).astype(np.float32)

    return {
        "tok_emb": f32(V, D),
        "rms_att": f32(L, D, loc=1.0),
        "wq": qt(L, D, D),
        "wk": qt(L, D, KV),
        "wv": qt(L, D, KV),
        "wo": qt(L, D, D),
        "rms_ffn": f32(L, D, loc=1.0),
        "w1": qt(L, D, HD),
        "w2": qt(L, HD, D),
        "w3": qt(L, D, HD),
        "rms_final": f32(D, loc=1.0),
        "wcls": qt(D, V),
    }


def build(out_dir: str, model: str = "7b", group_size: int = 64,
          seed: int = 0, seq_len: int | None = None) -> ModelConfig:
    shape = dict(SHAPES[model])
    if seq_len is not None:
        shape["seq_len"] = seq_len
    config = ModelConfig(**shape)
    params = random_q8_params(config, group_size, seed)
    save_cache(out_dir, config, params, shared=False)
    return config


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("out_dir")
    ap.add_argument("--model", choices=sorted(SHAPES), default="7b")
    ap.add_argument("--group-size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seq-len", type=int, default=None)
    args = ap.parse_args(argv)
    config = build(args.out_dir, args.model, args.group_size, args.seed,
                   args.seq_len)
    print(f"wrote {args.model} ({config}) cache to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
