"""Tokenizer golden tests.

Golden vectors come from the reference's ``bpe`` test (main.zig:1152-1180) and
its vocabulary-structure assertions, run against the shipped ``tokenizer.bin``
fixture (the one data fixture the reference commits).
"""

import pytest

from llama2_tpu.tokenizer.tokenizer import Tokenizer, decode_raw_byte, BOS


def test_vocab_structure(tokenizer):
    assert tokenizer.max_token_len == 27
    assert len(tokenizer.tokens) == 32000
    assert len(tokenizer.scores) == 32000
    assert tokenizer.lookup("æ") == 233
    assert tokenizer.lookup("a") == 100
    assert tokenizer.tokens[100] == b"a"


def test_golden_encode_english(tokenizer):
    text = "A man dying of thirst is suddenly a mineral water critic?"
    expected = [68, 767, 27116, 310, 266, 765, 338, 11584, 263, 1375, 13537, 4094, 11164, 66]
    assert tokenizer.encode(text) == expected


def test_golden_encode_cjk(tokenizer):
    assert tokenizer.encode("中") == [30275]


def test_encode_no_bos_no_dummy_prefix(tokenizer):
    # encode adds neither BOS/EOS nor a leading-space dummy prefix
    ids = tokenizer.encode("a")
    assert ids == [100]


def test_unknown_codepoint_raises(tokenizer):
    # no <0xXX> byte-fallback (main.zig:240-242): unknown codepoint is an error
    with pytest.raises(ValueError):
        tokenizer.encode("\U0001F600")  # emoji not in the 32k llama2 vocab


def test_encode_empty(tokenizer):
    assert tokenizer.encode("") == []


def test_raw_byte_decode():
    assert decode_raw_byte(b"<0x41>") == 0x41  # 'A', printable
    assert decode_raw_byte(b"<0x0A>") == 0x0A  # newline, whitespace
    assert decode_raw_byte(b"<0x00>") is None  # non-printable falls through
    assert decode_raw_byte(b"<0xG1>") is None  # bad hex
    assert decode_raw_byte(b"hello!") is None
    assert decode_raw_byte(b"<0x411>") is None  # wrong length


def test_decode_space_strip_after_bos(tokenizer):
    # after BOS, a leading space on the next token is stripped (main.zig:1022-1026)
    tid = tokenizer.lookup(" the")
    assert tid is not None
    assert tokenizer.decode_token(BOS, tid) == b"the"
    assert tokenizer.decode_token(0, tid) == b" the"


def test_decode_roundtrip_sentence(tokenizer):
    text = "Once upon a time"
    ids = tokenizer.encode(text)
    # generation prints with prev=BOS at the start, stripping the leading space
    assert tokenizer.decode(ids, first_prev=BOS) == b"Once upon a time"


def test_shipped_raw_byte_tokens_are_decoded(tokenizer):
    # tokens 3..258 in the shipped file are already-decoded raw bytes
    # (SURVEY.md section 2.4a): token 3 = 0x00, token 100+c for ASCII etc.
    assert tokenizer.tokens[3] == b"\x00"
    assert tokenizer.tokens[258] == "ÿ".encode("utf-8")
