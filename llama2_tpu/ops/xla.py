"""XLA-path ops: the jnp reference implementations of the model's compute.

These mirror the *semantics* of the reference's SIMD kernels
(main.zig:432-713) in batched, MXU-friendly form; the Pallas kernels in
``llama2_tpu.ops.pallas`` are drop-in replacements for the hot ones and are
tested against these as oracles (the reference's scalar-oracle test pattern,
SURVEY.md section 4).

Conventions: activations are row vectors, shapes ``(batch, seq, dim)``;
weights are ``(in_features, out_features)`` (transposed from the reference's
row-major ``W(d,n) @ x`` layout at load time). ``precision`` threads through
every matmul: ``HIGHEST`` for the fp32 parity path, ``DEFAULT`` for bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMS norm with eps added *after* the mean (main.zig:452-454).

    Sum-of-squares is computed in float32 regardless of activation dtype.
    """
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(ms + eps)
    return (xf * inv).astype(x.dtype) * weight


def rope_angles(positions: jax.Array, head_size: int) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for interleaved-pair RoPE (main.zig:336-351).

    ``freq_j = 10000^(-2j/head_size)`` for pair index j; angle = pos * freq.
    Returns ``(cos, sin)`` of shape ``positions.shape + (head_size//2,)``,
    computed in float32 like the reference's per-step f32 cos/sin.
    """
    j = jnp.arange(0, head_size, 2, dtype=jnp.float32) / head_size
    freqs = 1.0 / (10000.0**j)  # (hs/2,)
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs ``(x[2j], x[2j+1])`` per head.

    ``x``: (B, T, H, hs); ``cos/sin``: (B, T, hs/2) or (T, hs/2), broadcast
    over heads — the reference uses the same per-pair frequency for every head
    (``i mod head_size``, main.zig:338).
    """
    shape = x.shape
    xr = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c = jnp.expand_dims(cos, -2)  # broadcast over heads axis
    s = jnp.expand_dims(sin, -2)
    r0 = x0 * c - x1 * s
    r1 = x0 * s + x1 * c
    return jnp.stack([r0, r1], axis=-1).reshape(shape).astype(x.dtype)


def attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    *,
    precision=jax.lax.Precision.HIGHEST,
    scale: float | None = None,
) -> jax.Array:
    """Causal GQA attention of T query tokens against the full KV cache.

    q: (B, T, H, hs); k_cache/v_cache: (B, KVH, S, hs); ``pos`` is the
    position of the first query token (queries occupy pos..pos+T-1), a scalar
    or a per-row (B,) vector (continuous batching: every slot at its own
    position). Scores scaled by 1/sqrt(hs); softmax (max-subtracted, f32)
    over the causal window [0, pos+t] per query t — causality via mask,
    matching the reference's by-construction window (main.zig:367-378).
    Returns (B,T,H,hs).
    """
    B, T, H, hs = q.shape
    KVH, S = k_cache.shape[1], k_cache.shape[2]
    G = H // KVH

    if scale is None:
        scale = 1.0 / (hs**0.5)  # hs may be lane-padded; callers pass the real scale
    qg = q.reshape(B, T, KVH, G, hs)
    scores = jnp.einsum(
        "btkgd,bksd->bkgts", qg, k_cache, precision=precision
    ).astype(jnp.float32)
    scores = scores * jnp.float32(scale)

    pos = jnp.asarray(pos)
    key_pos = jnp.arange(S)[None, :]  # (1, S)
    query_pos = pos[..., None, None] + jnp.arange(T)[:, None]  # (.., T, 1)
    mask = key_pos <= query_pos  # (T, S) or (B, T, S)
    if mask.ndim == 2:
        mask = mask[None]
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=-1).astype(q.dtype)

    out = jnp.einsum("bkgts,bksd->btkgd", att, v_cache, precision=precision)
    return out.reshape(B, T, H, hs)


def swiglu(h1: jax.Array, h3: jax.Array) -> jax.Array:
    """SwiGLU gate: ``silu(w1(x)) * w3(x)`` (main.zig:411-416)."""
    h1f = h1.astype(jnp.float32)
    return (h1f * jax.nn.sigmoid(h1f)).astype(h1.dtype) * h3


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Max-subtracted softmax (main.zig:687-706), f32 accumulation."""
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=axis, keepdims=True)
    e = jnp.exp(xf - m)
    return (e / jnp.sum(e, axis=axis, keepdims=True)).astype(x.dtype)
