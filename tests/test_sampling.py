"""Sampler tests: our TPU formulations vs the reference algorithms.

The reference (main.zig:715-798): argmax = first max; multinomial = CDF walk
with r<cdf; top-p = prefilter at (1-p)/(n-1), sort desc, smallest prefix with
cum>p, draw r*cum over the prefix. RNG streams differ by construction, so we
test (a) exact agreement of the *nucleus* (support set + cumulative mass) and
(b) exact agreement of the chosen index for a shared r in [0,1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama2_tpu.ops import sampling


def ref_top_p_nucleus(probs: np.ndarray, p: float):
    """The reference's nucleus construction, straight-line numpy."""
    n = probs.shape[0]
    cutoff = (1.0 - p) / (n - 1)
    survivors = [(v, i) for i, v in enumerate(probs) if v >= cutoff]
    survivors.sort(key=lambda t: -t[0])
    cum = 0.0
    cut = len(survivors) - 1
    for j, (v, _) in enumerate(survivors):
        cum += v
        if cum > p:
            cut = j
            break
    nucleus = survivors[: cut + 1]
    return nucleus, sum(v for v, _ in nucleus)


def ref_top_p_pick(probs: np.ndarray, p: float, r01: float) -> int:
    nucleus, cum = ref_top_p_nucleus(probs, p)
    r = r01 * cum
    cdf = 0.0
    for v, i in nucleus:
        cdf += v
        if r < cdf:
            return i
    return nucleus[-1][1]


def our_top_p_pick(probs: np.ndarray, p: float, r01: float) -> int:
    """Run sample_top_p's math with a pinned uniform draw."""
    V = probs.shape[0]
    sorted_probs, sorted_idx = jax.lax.top_k(jnp.asarray(probs), V)
    cdf = jnp.cumsum(sorted_probs)
    cutoff_index = jnp.minimum(jnp.sum(cdf <= p), V - 1)
    cum = cdf[cutoff_index]
    r = r01 * cum
    j = jnp.minimum(jnp.sum(cdf <= r), cutoff_index)
    return int(sorted_idx[j])


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("p", [0.1, 0.5, 0.9, 0.99])
def test_top_p_matches_reference_algorithm(seed, p):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal(257).astype(np.float32) * 3
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    for r01 in [0.0, 0.1, 0.37, 0.5, 0.75, 0.999]:
        ref = ref_top_p_pick(probs, p, r01)
        ours = our_top_p_pick(probs, p, r01)
        # ties in sorted order can permute equal-prob tokens; compare probs
        assert probs[ours] == pytest.approx(probs[ref], rel=1e-6), (
            f"seed={seed} p={p} r={r01}: ref {ref} ours {ours}"
        )


def test_top_p_nucleus_support():
    """Tokens outside the nucleus must never be sampled."""
    probs = np.array([0.5, 0.3, 0.15, 0.04, 0.01], dtype=np.float32)
    p = 0.8
    # nucleus: 0.5, 0.3 (cum 0.8 not > 0.8), +0.15 → cum 0.95 > 0.8 → {0,1,2}
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    draws = jax.jit(
        jax.vmap(lambda k: sampling.sample_top_p(jnp.asarray(probs), jnp.float32(p), k))
    )(keys)
    picks = set(np.asarray(draws).tolist())
    assert picks <= {0, 1, 2}
    assert picks == {0, 1, 2}  # all nucleus members reachable


def test_multinomial_cdf_semantics():
    probs = jnp.asarray([0.2, 0.5, 0.3], dtype=jnp.float32)
    # force r via a key search: instead validate distribution statistically
    keys = jax.random.split(jax.random.PRNGKey(1), 3000)
    draws = jax.jit(jax.vmap(lambda k: sampling.sample_multinomial(probs, k)))(keys)
    freq = np.bincount(np.asarray(draws), minlength=3) / 3000.0
    np.testing.assert_allclose(freq, [0.2, 0.5, 0.3], atol=0.03)


def test_argmax_first_max_wins():
    logits = jnp.asarray([1.0, 5.0, 5.0, 2.0])
    assert int(sampling.sample_argmax(logits)) == 1


def test_temperature_scaling():
    logits = jnp.asarray([0.0, 1.0])
    p_hot = sampling.probs_from_logits(logits, jnp.float32(10.0))
    p_cold = sampling.probs_from_logits(logits, jnp.float32(0.1))
    assert float(p_hot[0]) > 0.4  # high temp → near-uniform
    assert float(p_cold[0]) < 1e-3  # low temp → peaked


def test_mode_dispatch():
    assert sampling.choose_mode(0.0, 0.9) == sampling.ARGMAX
    assert sampling.choose_mode(1.0, 0.0) == sampling.MULTINOMIAL
    assert sampling.choose_mode(1.0, 1.0) == sampling.MULTINOMIAL
    assert sampling.choose_mode(0.8, 0.9) == sampling.TOP_P


def test_full_vocab_sort_equals_prefilter_sort():
    """The cutoff prefilter never changes the nucleus (proof in module doc)."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        logits = rng.standard_normal(512).astype(np.float32) * 4
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        p = 0.9
        nucleus, cum = ref_top_p_nucleus(probs, p)
        V = probs.shape[0]
        sp, si = jax.lax.top_k(jnp.asarray(probs), V)
        cdf = np.cumsum(np.asarray(sp))
        cut = int(np.minimum(np.sum(cdf <= p), V - 1))
        assert cut + 1 == len(nucleus)
        assert cdf[cut] == pytest.approx(cum, rel=1e-6)
