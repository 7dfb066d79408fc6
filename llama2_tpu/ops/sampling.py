"""On-device samplers: argmax, multinomial, top-p (nucleus).

Reference semantics (main.zig:715-798, 1002-1013):
  * ``temperature == 0`` → argmax over raw logits (first max wins);
  * else logits /= temperature, softmax the **full** vocab, then plain
    multinomial CDF walk if ``top_p in {0, 1}`` else top-p;
  * top-p: probabilities below ``(1-p)/(n-1)`` are provably outside the
    nucleus and are pre-filtered, survivors are sorted descending, the
    smallest prefix with cumulative prob > p is the nucleus, and the draw is
    ``r = U(0,1) * cumulative_prob`` walked over that prefix.

TPU-native formulation: the pre-filter + partial sort exists to make the CPU
sort cheap; with fixed shapes on TPU we sort the full vocab descending — every
non-survivor sorts after every survivor (all survivors >= cutoff > all
non-survivors) and the nucleus always ends inside the survivor prefix (the
non-survivor mass is < (n-1) * cutoff = 1-p, so survivor mass > p), so the
nucleus and draw are *identical* to the reference's. CDF walks become
``searchsorted`` (first index with cdf > r, i.e. the reference's ``r < cdf``).

RNG is ``jax.random`` (counter-based threefry), seeded from ``-s``; the
reference's xoshiro stream differs by construction, so cross-implementation
parity is defined at temperature 0 (SURVEY.md section 2, RNG note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ARGMAX = 0
MULTINOMIAL = 1
TOP_P = 2


def choose_mode(temperature: float, top_p: float) -> int:
    """The reference's sampler dispatch (main.zig:1002-1013)."""
    if temperature == 0.0:
        return ARGMAX
    if top_p == 0.0 or top_p == 1.0:
        return MULTINOMIAL
    return TOP_P


def sample_argmax(logits: jax.Array) -> jax.Array:
    """First-max argmax over raw logits (main.zig:715-726). (..., V) -> int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def probs_from_logits(logits: jax.Array, temperature: jax.Array) -> jax.Array:
    """Temperature-scale then softmax the full vocab (main.zig:1005-1009)."""
    logits = logits.astype(jnp.float32) / temperature
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def sample_multinomial(probs: jax.Array, key: jax.Array) -> jax.Array:
    """CDF walk: first index with cdf > r, fallback last (main.zig:728-743)."""
    cdf = jnp.cumsum(probs, axis=-1)
    r = jax.random.uniform(key, probs.shape[:-1] + (1,), dtype=jnp.float32)
    idx = jnp.sum(cdf <= r, axis=-1)  # == first index where cdf > r
    return jnp.minimum(idx, probs.shape[-1] - 1).astype(jnp.int32)


def sample_top_p(probs: jax.Array, p: jax.Array, key: jax.Array) -> jax.Array:
    """Nucleus sampling with the reference's exact nucleus construction.

    probs: (..., V) full-vocab probabilities (already softmaxed).
    """
    V = probs.shape[-1]
    # Descending sort with indices; jax.lax.top_k(k=V) is a full sort and is
    # stable (ties keep ascending index order), matching "first found wins".
    sorted_probs, sorted_idx = jax.lax.top_k(probs, V)
    cdf = jnp.cumsum(sorted_probs, axis=-1)

    # smallest prefix with cumulative prob > p → nucleus [0, cutoff_index]
    cutoff_index = jnp.sum(cdf <= p[..., None], axis=-1)
    cutoff_index = jnp.minimum(cutoff_index, V - 1)
    cum_prob = jnp.take_along_axis(cdf, cutoff_index[..., None], axis=-1)

    r = jax.random.uniform(key, probs.shape[:-1] + (1,), dtype=jnp.float32) * cum_prob
    j = jnp.sum(cdf <= r, axis=-1)  # first index where cdf > r
    j = jnp.minimum(j, cutoff_index)  # fallback: last nucleus element
    return jnp.take_along_axis(sorted_idx, j[..., None], axis=-1)[..., 0].astype(jnp.int32)


def sample(
    logits: jax.Array,
    mode: int,
    temperature: jax.Array,
    top_p: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """Dispatch on the (static) sampler mode. logits (..., V) -> int32 token."""
    if mode == ARGMAX:
        return sample_argmax(logits)
    probs = probs_from_logits(logits, temperature)
    if mode == MULTINOMIAL:
        return sample_multinomial(probs, key)
    return sample_top_p(probs, top_p, key)
