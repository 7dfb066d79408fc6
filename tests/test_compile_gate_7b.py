"""7B-shape compile gate (VERDICT r3 next-round 5).

Round 3 discovered on hardware that the batched-head decode kernels
compile-OOM'd at flagship shapes (KVH=32, hs=128, f32 wanted 32 MB of
Mosaic scoped-vmem scratch against the 16 MB stack) — a regression class
nothing in CI could catch because no test exercised the block-picker math
or traced the kernels at 7B shapes. This file closes that hole on CPU:

* the block pickers (`ops.pallas.common.decode_block_rows[_q8]`, the single
  source of truth the kernel wrappers call) must choose blocks whose K+V
  double buffers fit ``KV_SCRATCH_BUDGET`` at every serving shape we claim;
* the stacked/fused dense and paged kernels must TRACE at 7B shapes
  (``jax.eval_shape`` — wrapper logic, BlockSpecs, and kernel jaxpr all run
  without allocating a 7B cache or needing a chip).

Budget rationale measured in commit d50ddc7; the scratch layout is
2 pipeline buffers x (K and V) x KVH x rows x hs x itemsize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama2_tpu.ops.pallas.common import (
    KV_SCRATCH_BUDGET,
    decode_block_rows,
    decode_block_rows_q8,
    kv_scratch_rows,
    paged_scratch_fits,
)

# (name, KVH, hs, S) — Llama-2 7B/13B at full context, 70B-style GQA,
# and a long-context stretch shape
SHAPES = [
    ("7b", 32, 128, 2048),
    ("13b", 40, 128, 2048),
    ("70b-gqa", 8, 128, 4096),
    ("7b-32k", 32, 128, 32768),
]


@pytest.mark.parametrize("name,kvh,hs,S", SHAPES)
@pytest.mark.parametrize("itemsize", [4, 2])  # f32 / bf16 caches
def test_block_picker_respects_vmem_budget(name, kvh, hs, S, itemsize):
    bs = decode_block_rows(S, kvh, hs, itemsize)
    assert 4 * kvh * bs * hs * itemsize <= KV_SCRATCH_BUDGET, (
        f"{name}: picked block {bs} rows blows the scoped-vmem budget"
    )
    assert S % bs == 0 and bs >= 1


@pytest.mark.parametrize("name,kvh,hs,S", SHAPES)
def test_block_picker_q8_respects_vmem_budget(name, kvh, hs, S):
    bs = decode_block_rows_q8(S, kvh, hs)
    assert 4 * kvh * bs * hs * 1 <= KV_SCRATCH_BUDGET
    assert S % bs == 0 and bs % 128 == 0  # RMW scale window = one lane tile


def test_7b_f32_scratch_is_the_measured_clamp():
    """The exact regression from d50ddc7: 7B f32 shapes must clamp to 128
    rows (512-row blocks = 32 MB of scratch = the observed compile OOM)."""
    assert kv_scratch_rows(32, 128, 4) == 128
    assert decode_block_rows(2048, 32, 128, 4) == 128
    # and the q8 cache (itemsize 1) gets the 4x larger block
    assert decode_block_rows_q8(2048, 32, 128) == 256


def test_paged_page_budgets_at_7b():
    """Whole pages are the paged kernels' DMA unit: q8 pages fit at 7B
    shapes; f32 pages at the default page_size=256 do NOT (the engine
    falls back to XLA paged attention there — loudly)."""
    assert paged_scratch_fits(32, 128, 128, 1)
    assert paged_scratch_fits(32, 256, 128, 1)
    assert paged_scratch_fits(32, 128, 128, 4)  # f32 fits at page 128
    assert not paged_scratch_fits(32, 256, 128, 4)


# ---- trace the kernels at 7B shapes (no allocation, no chip) ----

L, B, H, KVH, HS, S = 2, 8, 32, 32, 128, 2048


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def test_trace_stacked_f32_at_7b():
    from llama2_tpu.ops.pallas.attention import flash_decode_attention_stacked

    out = jax.eval_shape(
        lambda q, kc, vc, kn, vn, pos: flash_decode_attention_stacked(
            q, kc, vc, kn, vn, jnp.int32(1), pos
        ),
        _sds((B, H, HS)),
        _sds((L, B, KVH, S, HS)),
        _sds((L, B, KVH, S, HS)),
        _sds((B, KVH, 1, HS)),
        _sds((B, KVH, 1, HS)),
        _sds((B,), jnp.int32),
    )
    assert out[0].shape == (B, H, HS)


def test_trace_fused_f32_at_7b():
    from llama2_tpu.ops.pallas.attention import flash_decode_attention_fused

    out = jax.eval_shape(
        lambda qkv, kc, vc, c, s, pos: flash_decode_attention_fused(
            qkv, kc, vc, c, s, jnp.int32(1), pos, n_heads=H
        ),
        _sds((B, H + 2 * KVH, HS)),
        _sds((L, B, KVH, S, HS)),
        _sds((L, B, KVH, S, HS)),
        _sds((B, HS)),
        _sds((B, HS)),
        _sds((B,), jnp.int32),
    )
    assert out[0].shape == (B, H, HS)


def test_trace_stacked_q8_at_7b():
    from llama2_tpu.ops.pallas.attention_q8 import (
        flash_decode_attention_q8_stacked,
    )

    out = jax.eval_shape(
        lambda q, k8, ks, v8, vs, kn, ksn, vn, vsn, pos: (
            flash_decode_attention_q8_stacked(
                q, k8, ks, v8, vs, kn, ksn, vn, vsn, jnp.int32(1), pos
            )
        ),
        _sds((B, H, HS)),
        _sds((L, B, KVH, S, HS), jnp.int8),
        _sds((L, B, KVH, S)),
        _sds((L, B, KVH, S, HS), jnp.int8),
        _sds((L, B, KVH, S)),
        _sds((B, KVH, 1, HS), jnp.int8),
        _sds((B, KVH, 1)),
        _sds((B, KVH, 1, HS), jnp.int8),
        _sds((B, KVH, 1)),
        _sds((B,), jnp.int32),
    )
    assert out[0].shape == (B, H, HS)


def test_trace_fused_q8_at_7b():
    from llama2_tpu.ops.pallas.attention_q8 import (
        flash_decode_attention_q8_fused,
    )

    out = jax.eval_shape(
        lambda qkv, k8, ks, v8, vs, c, s, pos: (
            flash_decode_attention_q8_fused(
                qkv, k8, ks, v8, vs, c, s, jnp.int32(1), pos, n_heads=H
            )
        ),
        _sds((B, H + 2 * KVH, HS)),
        _sds((L, B, KVH, S, HS), jnp.int8),
        _sds((L, B, KVH, S)),
        _sds((L, B, KVH, S, HS), jnp.int8),
        _sds((L, B, KVH, S)),
        _sds((B, HS)),
        _sds((B, HS)),
        _sds((B,), jnp.int32),
    )
    assert out[0].shape == (B, H, HS)


@pytest.mark.parametrize("kv_quant", [False, True])
def test_trace_paged_fused_at_7b(kv_quant):
    # page sizes the budget test above proved legal per dtype
    page = 256 if kv_quant else 128
    n_pages, max_pages = 64, S // page
    table = _sds((B, max_pages), jnp.int32)
    pos = _sds((B,), jnp.int32)
    pids = _sds((B,), jnp.int32)
    rids = _sds((B,), jnp.int32)
    qkv = _sds((B, H + 2 * KVH, HS))
    cos = _sds((B, HS))
    if kv_quant:
        from llama2_tpu.ops.pallas.paged_attention import (
            paged_decode_attention_q8_fused,
        )

        pool = _sds((L, n_pages, KVH, page, HS), jnp.int8)
        spool = _sds((L, n_pages, KVH, page))
        out = jax.eval_shape(
            lambda qkv, kp, ksp, vp, vsp, t, c, s, pi, ri, pos: (
                paged_decode_attention_q8_fused(
                    qkv, kp, ksp, vp, vsp, t, c, s, pi, ri,
                    jnp.int32(1), pos, n_heads=H,
                )
            ),
            qkv, pool, spool, pool, spool, table, cos, cos, pids, rids, pos,
        )
    else:
        from llama2_tpu.ops.pallas.paged_attention import (
            paged_decode_attention_fused,
        )

        pool = _sds((L, n_pages, KVH, page, HS))
        out = jax.eval_shape(
            lambda qkv, kp, vp, t, c, s, pi, ri, pos: (
                paged_decode_attention_fused(
                    qkv, kp, vp, t, c, s, pi, ri, jnp.int32(1), pos,
                    n_heads=H,
                )
            ),
            qkv, pool, pool, table, cos, cos, pids, rids, pos,
        )
    assert out[0].shape == (B, H, HS)


def test_trace_layer_block_at_7b():
    """The whole-layer megakernel traces at 7B shapes, and its VMEM budget
    (weight double-buffers + attention ring + windows + row scratch) stays
    far inside the 128 MB device VMEM."""
    from llama2_tpu.ops.pallas.layer_block import (
        _att_block_rows,
        layer_block_stacked,
        layer_block_supported,
    )
    from llama2_tpu.config import ModelConfig
    from llama2_tpu.quant.q8 import QuantTensor

    D, HD, Dq, G = 4096, 11008, (H + 2 * KVH) * HS, 64
    cfg = ModelConfig(dim=D, hidden_dim=HD, n_layers=L, n_heads=H,
                      n_kv_heads=KVH, vocab_size=32000, seq_len=S)

    def qt(k, n):
        return QuantTensor(
            q=jax.ShapeDtypeStruct((L, k, n), jnp.int8),
            scale=jax.ShapeDtypeStruct((L, k // G, n), jnp.float32),
            group_size=G,
        )

    wo, w1, w3, w2 = qt(D, D), qt(D, HD), qt(D, HD), qt(HD, D)
    wqkv = qt(D, Dq)
    assert layer_block_supported(wo, w1, w3, w2, wqkv, cfg, B, S)
    # ring block must satisfy the q8 lane rule within its VMEM budget
    bs = _att_block_rows(S, B, 4, HS)
    assert bs >= 128 and bs % 128 == 0 and S % bs == 0

    for with_qkv in (True, False):
        out = jax.eval_shape(
            lambda qkv, x, k8, ks, v8, vs, c, s_, pos, wq=with_qkv: (
                layer_block_stacked(
                    qkv, x, k8, ks, v8, vs, c, s_, wo,
                    jax.ShapeDtypeStruct((L, D), jnp.float32), w1, w3, w2,
                    jax.ShapeDtypeStruct((L, D), jnp.float32), wqkv,
                    jnp.int32(1), pos, n_heads=H, with_qkv=wq,
                )
            ),
            _sds((B, H + 2 * KVH, HS)),
            _sds((B, D)),
            _sds((L, B, KVH, S, HS), jnp.int8),
            _sds((L, B, KVH, S)),
            _sds((L, B, KVH, S, HS), jnp.int8),
            _sds((L, B, KVH, S)),
            _sds((B, HS)),
            _sds((B, HS)),
            _sds((B,), jnp.int32),
        )
        assert out[0].shape == (B, D)
        if with_qkv:
            assert out[1].shape == (B, Dq)
        assert out[2].shape == (L, B, KVH, S, HS)
        assert out[3].shape == (L, B, KVH, S)
