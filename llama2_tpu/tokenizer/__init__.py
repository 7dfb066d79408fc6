from llama2_tpu.tokenizer.tokenizer import Tokenizer, decode_raw_byte

__all__ = ["Tokenizer", "decode_raw_byte"]
