"""Import a HuggingFace Llama checkpoint into this engine's formats.

Reference users get weights into llama2.c's ``.bin`` via that repo's export
script; this is the native equivalent: read a ``transformers``
``LlamaForCausalLM`` directory (or hub snapshot already on disk — this
environment has no egress) and write either a v0 ``.bin`` (fp32, byte-exact
format of SURVEY.md section 2.4a) or the fast-load param cache directory.

    python -m llama2_tpu.tools.import_hf <hf_dir> out.bin
    python -m llama2_tpu.tools.import_hf <hf_dir> out-cache/ --cache [--int8]

Weight mapping (HF -> engine layout, all matmuls transposed to
(in_features, out_features) — HF nn.Linear stores (out, in)):

    model.embed_tokens.weight           -> tok_emb         (V, D)
    layers.N.input_layernorm            -> rms_att[N]      (D,)
    layers.N.self_attn.{q,k,v,o}_proj   -> wq/wk/wv/wo[N]  (D, *) transposed
    layers.N.post_attention_layernorm   -> rms_ffn[N]      (D,)
    layers.N.mlp.{gate,down,up}_proj    -> w1/w2/w3[N]     transposed
    model.norm.weight                   -> rms_final       (D,)
    lm_head.weight                      -> wcls            (D, V) transposed
                                           (aliases tok_emb.T when tied)

RoPE note: HF Llama uses half-rotated ("rotate_half") RoPE while this engine
and llama2.c use interleaved pairs (main.zig:336-351). The difference is a
fixed permutation of the head dimension of wq/wk; we apply the standard
unpermute (llama2.c export script does the same) so the interleaved kernel
reproduces HF logits.
"""

from __future__ import annotations

import sys

import numpy as np

from llama2_tpu.config import ModelConfig


def _unpermute(w: np.ndarray, n_heads: int, dim_out: int) -> np.ndarray:
    """Invert HF's rotate_half head-dim permutation.

    HF stores q/k projections so that rotate_half (split the head in two
    contiguous halves) matches interleaved-pair RoPE on the ORIGINAL layout;
    to run interleaved RoPE we restore the original row order:
    out-row blocks per head go from (hs/2, 2) order back to (2, hs/2).
    ``w`` is HF layout (out=dim_out, in=D).
    """
    hs = dim_out // n_heads
    return (
        w.reshape(n_heads, 2, hs // 2, -1)
        .transpose(0, 2, 1, 3)
        .reshape(dim_out, -1)
    )


def import_hf(hf_dir: str) -> tuple[ModelConfig, dict, bool]:
    """Read a HF Llama model directory; returns (config, params, shared)."""
    import json
    import os

    cfg_path = os.path.join(hf_dir, "config.json")
    with open(cfg_path) as f:
        hf = json.load(f)
    if hf.get("model_type") not in (None, "llama"):
        raise ValueError(f"not a llama checkpoint: model_type={hf.get('model_type')}")

    config = ModelConfig(
        dim=hf["hidden_size"],
        hidden_dim=hf["intermediate_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=hf["num_attention_heads"],
        n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        vocab_size=hf["vocab_size"],
        seq_len=hf.get("max_position_embeddings", 2048),
        norm_eps=hf.get("rms_norm_eps", 1e-5),
    )

    sd = _load_state_dict(hf_dir)
    g = lambda name: np.asarray(sd[name], dtype=np.float32)

    L, D = config.n_layers, config.dim
    H, KVH, hs = config.n_heads, config.n_kv_heads, config.head_size
    p = "model."

    params: dict = {
        "tok_emb": g(p + "embed_tokens.weight"),
        "rms_final": g(p + "norm.weight"),
    }
    stack = lambda fn: np.stack([fn(i) for i in range(L)])
    params["rms_att"] = stack(lambda i: g(f"{p}layers.{i}.input_layernorm.weight"))
    params["rms_ffn"] = stack(
        lambda i: g(f"{p}layers.{i}.post_attention_layernorm.weight")
    )
    params["wq"] = stack(
        lambda i: _unpermute(
            g(f"{p}layers.{i}.self_attn.q_proj.weight"), H, H * hs
        ).T
    )
    params["wk"] = stack(
        lambda i: _unpermute(
            g(f"{p}layers.{i}.self_attn.k_proj.weight"), KVH, KVH * hs
        ).T
    )
    params["wv"] = stack(lambda i: g(f"{p}layers.{i}.self_attn.v_proj.weight").T)
    params["wo"] = stack(lambda i: g(f"{p}layers.{i}.self_attn.o_proj.weight").T)
    params["w1"] = stack(lambda i: g(f"{p}layers.{i}.mlp.gate_proj.weight").T)
    params["w2"] = stack(lambda i: g(f"{p}layers.{i}.mlp.down_proj.weight").T)
    params["w3"] = stack(lambda i: g(f"{p}layers.{i}.mlp.up_proj.weight").T)

    shared = hf.get("tie_word_embeddings", False) or "lm_head.weight" not in sd
    params["wcls"] = (
        params["tok_emb"].T if shared else g("lm_head.weight").T
    )
    params = {k: np.ascontiguousarray(v) for k, v in params.items()}
    return config, params, shared


def _load_state_dict(hf_dir: str) -> dict:
    """Load weights from safetensors shards or a torch .bin state dict."""
    import glob
    import os

    st = sorted(glob.glob(os.path.join(hf_dir, "*.safetensors")))
    if st:
        try:
            from safetensors.numpy import load_file
        except ImportError as e:  # pragma: no cover - env without safetensors
            raise RuntimeError("safetensors not available for this checkpoint") from e
        sd: dict = {}
        for shard in st:
            sd.update(load_file(shard))
        return sd
    bins = sorted(glob.glob(os.path.join(hf_dir, "pytorch_model*.bin")))
    if not bins:
        raise FileNotFoundError(f"no weights (*.safetensors / pytorch_model*.bin) in {hf_dir}")
    import torch

    sd = {}
    for shard in bins:
        part = torch.load(shard, map_location="cpu", weights_only=True)
        sd.update({k: v.float().numpy() for k, v in part.items()})
    return sd


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cache = "--cache" in argv
    int8 = "--int8" in argv
    argv = [a for a in argv if a not in ("--cache", "--int8")]
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 1
    src, dst = argv
    config, params, shared = import_hf(src)
    print(f"imported: {config} shared_weights={shared}")
    if cache:
        if int8:
            from llama2_tpu.quant.q8 import quantize_params

            params = quantize_params(params)
        from llama2_tpu.io.cache import save_cache

        save_cache(dst, config, params, shared)
    else:
        if int8:
            print("--int8 requires --cache (v0 .bin is fp32)", file=sys.stderr)
            return 1
        if config.norm_eps != 1e-5:
            print(
                f"warning: v0 .bin cannot store rms_norm_eps={config.norm_eps}"
                " (format has no field; loaders will use 1e-5). Use --cache"
                " to preserve it.",
                file=sys.stderr,
            )
        from llama2_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(dst, config, params, shared)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
