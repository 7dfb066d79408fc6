"""llama2_tpu — a TPU-native Llama-2 inference engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of cgbur/llama2.zig
(reference: /root/reference/src/main.zig): llama2.c ``.bin`` checkpoint loading,
``tokenizer.bin`` BPE tokenization, fp32 transformer forward pass with GQA/MQA
attention and a KV cache, and argmax / multinomial / top-p sampling — redesigned
TPU-first: functional state threaded through jitted steps, batched prefill on the
MXU, an on-device ``lax.while_loop`` decode loop, Pallas kernels for the hot ops,
INT8 weight-only quantization, and pjit mesh sharding for multi-chip scale-out.
"""

from llama2_tpu.config import ModelConfig, GenerationConfig
from llama2_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from llama2_tpu.tokenizer.tokenizer import Tokenizer

__version__ = "0.1.0"

__all__ = [
    "ModelConfig",
    "GenerationConfig",
    "load_checkpoint",
    "save_checkpoint",
    "Tokenizer",
]
