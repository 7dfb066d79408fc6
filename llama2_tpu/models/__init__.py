from llama2_tpu.models.llama import forward, init_cache, logits_from_hidden

__all__ = ["forward", "init_cache", "logits_from_hidden"]
