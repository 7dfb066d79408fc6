"""Pipeline-parallel prefill: layers sharded over a ``stage`` mesh axis.

The third parallelism axis (SURVEY.md section 2: the reference has NONE; dp
and tp live in ``parallel/sharding.py``, sp in ``parallel/sp.py``). Useful
when a model's layer stack does not fit one chip's HBM: stage s owns layers
``[s*L/S, (s+1)*L/S)`` — the layer-stacked param arrays are simply sharded on
their leading (layer) dimension — and M microbatches of requests flow through
the stages GPipe-style:

    step t (0 <= t < M+S-1): stage s runs microbatch ``t - s`` (when valid)
    through its local layers, then hands its activation to stage s+1 via
    ``jax.lax.ppermute`` (one ICI hop; XLA overlaps the send with the next
    microbatch's compute). Bubble fraction is the usual (S-1)/(M+S-1).

Each microbatch is an independent (B, T) prefill from position 0 (requests
batched by the serving layer), so attention is segment-local dense causal —
no cross-stage attention traffic; the KV segments come out layer-sharded
exactly like the weights, which is the natural layout for a pipelined decode.

Decode stays single-stage here: per-token pipelining is latency-bound at
batch 1 (every hop adds ICI latency per token) — the engine uses pp for
prefill and dp/tp for decode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from llama2_tpu.config import ModelConfig
from llama2_tpu.models.llama import _LAYER_KEYS
from llama2_tpu.ops import xla as ops
from llama2_tpu.parallel.ring import dense_causal_attention

STAGE_AXIS = "stage"


def make_stage_mesh(pp: int | None = None, devices=None) -> Mesh:
    """A 1-D ``(stage,)`` mesh for pipeline-parallel prefill."""
    devices = devices if devices is not None else jax.devices()
    pp = pp if pp is not None else len(devices)
    return Mesh(np.asarray(devices[:pp]), (STAGE_AXIS,))


def make_pp_tp_mesh(pp: int, tp: int, devices=None) -> Mesh:
    """A 2-D ``(stage, model)`` mesh: pipeline stages of tensor-sharded
    layers (activations hop stages whole; each stage's matmuls all-reduce
    over its own model group)."""
    from llama2_tpu.parallel.mesh import MODEL_AXIS

    devices = devices if devices is not None else jax.devices()
    if pp * tp > len(devices):
        raise ValueError(f"mesh {pp}x{tp} needs {pp * tp} devices")
    grid = np.asarray(devices[: pp * tp]).reshape(pp, tp)
    return Mesh(grid, (STAGE_AXIS, MODEL_AXIS))


def _local_layers(x, stack, cos, sin, config: ModelConfig, precision,
                  model_axis: str | None = None):
    """Run this stage's layer slice over a (B, T) segment from position 0.

    With ``model_axis`` the weights are Megatron-sharded: local head/hidden
    slices with one all-reduce after wo and w2 (same pairing as
    parallel/sp.py)."""
    B, T, D = x.shape
    hs = config.head_size
    H_l = stack["wq"].shape[-1] // hs
    KVH_l = stack["wk"].shape[-1] // hs

    def reduce_block(y):
        return jax.lax.psum(y, model_axis) if model_axis else y

    def body(x, lp):
        xb = ops.rmsnorm(x, lp["rms_att"], config.norm_eps)
        mm = lambda a, w: jnp.einsum("btd,de->bte", a, w, precision=precision)
        q = mm(xb, lp["wq"]).reshape(B, T, H_l, hs)
        k = mm(xb, lp["wk"]).reshape(B, T, KVH_l, hs)
        v = mm(xb, lp["wv"]).reshape(B, T, KVH_l, hs)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        att = dense_causal_attention(q, k, v, scale=1.0 / hs**0.5)
        x = x + reduce_block(mm(att.reshape(B, T, H_l * hs), lp["wo"]))
        xb = ops.rmsnorm(x, lp["rms_ffn"], config.norm_eps)
        x = x + reduce_block(
            mm(ops.swiglu(mm(xb, lp["w1"]), mm(xb, lp["w3"])), lp["w2"])
        )
        return x, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    return jax.lax.scan(body, x, stack)


def _pp_forward_local(
    params: dict,
    tokens: jax.Array,  # (M, B, T) microbatches, replicated
    *,
    config: ModelConfig,
    precision,
    axis_name: str,
    n_stages: int,
    model_axis: str | None = None,
):
    S = n_stages
    my = jax.lax.axis_index(axis_name)
    M, B, T = tokens.shape
    D = config.dim
    KVH, hs = config.n_kv_heads, config.head_size
    L_local = params["wq"].shape[0]  # this stage's layer count

    positions = jnp.arange(T, dtype=jnp.int32)[None, :]
    cos, sin = ops.rope_angles(positions, hs)
    stack = {k: params[k] for k in _LAYER_KEYS}
    dtype = params["wq"].dtype
    if model_axis:
        KVH = stack["wk"].shape[-1] // hs  # local kv heads for the buffers

    axes = (axis_name, *((model_axis,) if model_axis else ()))
    var = lambda a: jax.lax.pcast(a, axes, to="varying")
    hidden_out = var(jnp.zeros((M, B, T, D), dtype))
    k_out = var(jnp.zeros((L_local, M, B, KVH, T, hs), dtype))
    v_out = var(jnp.zeros((L_local, M, B, KVH, T, hs), dtype))
    x_recv = var(jnp.zeros((B, T, D), dtype))

    fwd = [(i, (i + 1) % S) for i in range(S)]  # stage ring, last hop unused

    def step(carry, t):
        x_recv, hidden_out, k_out, v_out = carry
        mb = t - my  # microbatch this stage works on at step t
        valid = jnp.logical_and(mb >= 0, mb < M)
        mb_c = jnp.clip(mb, 0, M - 1)

        # stage 0 embeds its microbatch; later stages consume the received
        # activation from the previous step's hop
        emb = jnp.take(
            params["tok_emb"], tokens[mb_c], axis=0
        ).astype(dtype)
        x_in = jnp.where(my == 0, emb, x_recv)

        h, (k_seg, v_seg) = _local_layers(
            x_in, stack, cos, sin, config, precision, model_axis
        )

        # record KV for the microbatch (masked when this step is a bubble)
        upd = lambda buf, seg: jnp.where(
            valid,
            jax.lax.dynamic_update_slice(
                buf, seg[:, None], (0, mb_c, 0, 0, 0, 0)
            ),
            buf,
        )
        k_out = upd(k_out, k_seg)
        v_out = upd(v_out, v_seg)

        # last stage: record the final hidden; others: hand h downstream
        hidden_out = jnp.where(
            jnp.logical_and(valid, my == S - 1),
            jax.lax.dynamic_update_slice(hidden_out, h[None], (mb_c, 0, 0, 0)),
            hidden_out,
        )
        x_recv = jax.lax.ppermute(h, axis_name, fwd)
        return (x_recv, hidden_out, k_out, v_out), None

    carry = (x_recv, hidden_out, k_out, v_out)
    (x_recv, hidden_out, k_out, v_out), _ = jax.lax.scan(
        step, carry, jnp.arange(M + S - 1)
    )

    # hidden lives on the last stage only; make it replicated for the head
    hidden_out = jax.lax.psum(
        jnp.where(my == S - 1, hidden_out, jnp.zeros_like(hidden_out)),
        axis_name,
    )
    if model_axis:
        # h is numerically replicated across the model axis (every block
        # ended in a psum), but typed varying; select shard 0's copy and
        # psum — the sound way to re-establish invariance for the out_spec
        mi = jax.lax.axis_index(model_axis)
        hidden_out = jax.lax.psum(
            jnp.where(mi == 0, hidden_out, jnp.zeros_like(hidden_out)),
            model_axis,
        )
    hidden_out = ops.rmsnorm(hidden_out, params["rms_final"], config.norm_eps)
    return hidden_out, k_out, v_out


@partial(
    jax.jit,
    static_argnames=("config", "precision", "mesh", "axis_name", "model_axis"),
)
def pp_prefill(
    params: dict,
    tokens: jax.Array,  # (M, B, T): M microbatches
    config: ModelConfig,
    mesh: Mesh,
    precision=jax.lax.Precision.HIGHEST,
    axis_name: str = STAGE_AXIS,
    model_axis: str | None = None,
):
    """Pipelined prefill of M independent (B, T) segments from position 0.

    Returns ``(hidden, k_seg, v_seg)``: hidden (M, B, T, D) final-rmsnormed,
    replicated; k/v segments (L, M, B, KVH, T, hs) sharded over stages on the
    layer dim (and over ``model_axis`` on kv-heads when composed with tensor
    parallelism via :func:`make_pp_tp_mesh`). Layer-dim size must divide by
    the stage count; the model axis must divide n_heads/n_kv_heads.
    """
    S = mesh.shape[axis_name]
    L = config.n_layers
    if L % S != 0:
        raise ValueError(f"n_layers={L} not divisible by {S} stages")
    if model_axis:
        tp = mesh.shape[model_axis]
        if config.n_kv_heads % tp or config.n_heads % tp:
            raise ValueError(f"model axis {tp} must divide n_heads/n_kv_heads")

    ma = model_axis
    col = P(axis_name, None, ma)  # (L, D, out): stages on layers, tp on out
    row = P(axis_name, ma, None)
    param_specs = {
        "wq": col, "wk": col, "wv": col, "w1": col, "w3": col,
        "wo": row, "w2": row,
        "rms_att": P(axis_name), "rms_ffn": P(axis_name),
    }
    out_specs = (
        P(),
        P(axis_name, None, None, ma),  # k_seg (L, M, B, KVH, T, hs)
        P(axis_name, None, None, ma),
    )
    fn = shard_map(
        partial(
            _pp_forward_local,
            config=config,
            precision=precision,
            axis_name=axis_name,
            n_stages=S,
            model_axis=model_axis,
        ),
        mesh=mesh,
        in_specs=({k: param_specs.get(k, P()) for k in params}, P()),
        out_specs=out_specs,
    )
    return fn(params, tokens)
