"""Native C++ tokenizer: exact equivalence with the Python tokenizer."""

import random

import pytest

from conftest import TOKENIZER_BIN

fast = pytest.importorskip("llama2_tpu.tokenizer.fast")
from llama2_tpu.tokenizer.fast import FastTokenizer, FastTokenizerUnavailable


@pytest.fixture(scope="module")
def ftok():
    try:
        return FastTokenizer(TOKENIZER_BIN, 32000)
    except FastTokenizerUnavailable as e:
        pytest.skip(str(e))


def test_structure(ftok):
    assert ftok.max_token_len == 27
    assert ftok.vocab_size == 32000
    assert ftok.lookup("æ") == 233
    assert ftok.tokens[100] == b"a"


def test_golden_vectors(ftok):
    text = "A man dying of thirst is suddenly a mineral water critic?"
    expected = [68, 767, 27116, 310, 266, 765, 338, 11584, 263, 1375, 13537, 4094, 11164, 66]
    assert ftok.encode(text) == expected
    assert ftok.encode("中") == [30275]
    assert ftok.encode("") == []


def test_unknown_codepoint(ftok):
    with pytest.raises(ValueError):
        ftok.encode("😀")


def test_matches_python_on_random_text(ftok, tokenizer):
    rng = random.Random(0)
    corpus = (
        "Once upon a time, there was a little girl named Lily. "
        "She loved to play outside in the sunshine with 1234 friends; "
        "Zebras & émus aren't common—though café humour helps.\n\t"
    )
    for _ in range(50):
        n = rng.randint(0, len(corpus))
        start = rng.randint(0, len(corpus) - n)
        text = corpus[start : start + n]
        assert ftok.encode(text) == tokenizer.encode(text), repr(text)


def test_decode_matches_python(ftok, tokenizer):
    ids = tokenizer.encode("Once upon a time")
    assert ftok.decode(ids) == tokenizer.decode(ids)


def test_throughput_exceeds_python(ftok, tokenizer):
    import time

    text = "The quick brown fox jumps over the lazy dog. " * 40
    t0 = time.perf_counter()
    for _ in range(5):
        a = ftok.encode(text)
    fast_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        b = tokenizer.encode(text)
    py_t = time.perf_counter() - t0
    assert a == b
    assert fast_t < py_t, f"fast {fast_t:.3f}s vs python {py_t:.3f}s"
