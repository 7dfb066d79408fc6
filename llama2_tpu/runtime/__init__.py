from llama2_tpu.runtime.generator import Generator, GenerateResult

__all__ = ["Generator", "GenerateResult"]
