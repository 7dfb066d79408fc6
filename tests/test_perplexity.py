"""Perplexity tool tests: oracle check + INT8 regression gate pattern."""

import numpy as np
import pytest

from llama2_tpu.io.checkpoint import load_checkpoint
from llama2_tpu.quant.q8 import quantize_params
from llama2_tpu.tools.perplexity import perplexity

from oracle import OracleModel


@pytest.fixture(scope="module")
def loaded(tiny_checkpoint):
    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    return path, config, params


def test_ppl_matches_oracle_nll(loaded):
    path, config, params = loaded
    tokens = [5, 17, 320, 9, 44]
    out = perplexity(config, params, tokens, chunk=3)
    # oracle NLL: teacher-force [BOS]+tokens, score each next token
    oracle = OracleModel(path)
    feed = [1] + tokens
    nlls = []
    for pos in range(len(feed) - 1):
        logits = oracle.forward(feed[pos], pos).astype(np.float64)
        logp = logits - logits.max()
        logp = logp - np.log(np.exp(logp).sum())
        nlls.append(-logp[feed[pos + 1]])
    assert out["tokens"] == len(nlls)
    assert out["nll"] == pytest.approx(float(np.mean(nlls)), rel=1e-4)


def test_chunking_invariance(loaded):
    _, config, params = loaded
    tokens = list(range(2, 30))
    a = perplexity(config, params, tokens, chunk=4)
    b = perplexity(config, params, tokens, chunk=64)
    assert a["nll"] == pytest.approx(b["nll"], rel=1e-5)


def test_int8_ppl_within_delta(loaded):
    """The quality gate: Q8 weight-only ppl within a few percent of fp32
    (llama2.c runq's published quality class)."""
    _, config, params = loaded
    tokens = list(range(2, 60))
    fp = perplexity(config, params, tokens)
    q8 = perplexity(config, quantize_params(params), tokens)
    assert q8["ppl"] == pytest.approx(fp["ppl"], rel=0.05), (fp, q8)
