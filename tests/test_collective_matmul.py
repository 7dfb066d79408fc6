"""Explicit collective matmul (VERDICT round-1 item 4).

Correctness: the ring-overlapped row-parallel linear must equal the plain
matmul on the 8-device virtual mesh for every tp that divides the dims.
Structure: the lowered HLO must contain the interleaved
collective-permute/dot ring — tp-1 hops, each data-independent of the dot
issued alongside it — which is the overlap the latency-hiding scheduler
exploits on real ICI (single-chip environments cannot time that; the
structural property is the testable slice)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama2_tpu.parallel.collective_matmul import (
    ring_rs_matmul,
    row_parallel_linear,
)
from llama2_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_row_parallel_linear_matches_dense(tp):
    rng = np.random.default_rng(tp)
    x = jnp.asarray(rng.standard_normal((3, 5, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    mesh = make_mesh(1, tp, devices=jax.devices()[:tp])
    got = row_parallel_linear(x, w, mesh)
    want = jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_row_parallel_linear_2d_x():
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    got = row_parallel_linear(x, w, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x @ w), rtol=1e-5, atol=1e-5
    )


def test_indivisible_raises():
    mesh = make_mesh(1, 3, devices=jax.devices()[:3])
    with pytest.raises(ValueError):
        row_parallel_linear(jnp.zeros((2, 64)), jnp.zeros((64, 32)), mesh)


def test_hlo_contains_overlapped_ring():
    """tp-1 collective-permutes AND tp dots in the reduce-scatter ring, with
    each hop's permute independent of the dot issued in the same step (the
    dots consume only x and w slices, never the in-flight accumulator)."""
    tp = 4
    mesh = make_mesh(1, tp, devices=jax.devices()[:tp])
    x = jnp.zeros((2, 64), jnp.float32)
    w = jnp.zeros((64, 32), jnp.float32)
    lowered = jax.jit(
        lambda x, w: row_parallel_linear(x, w, mesh)
    ).lower(x, w)
    hlo = lowered.compiler_ir(dialect="stablehlo")
    text = str(hlo)
    n_permute = text.count("collective_permute")
    n_dot = text.count("stablehlo.dot_general")
    # rs ring: tp dots + tp-1 permutes; ag ring: tp-1 more permutes
    assert n_dot == tp, text[:500]
    assert n_permute == 2 * (tp - 1), f"{n_permute} permutes"


def test_ring_rs_matmul_chunk_placement():
    """Device i must end with out-chunk C_i summed over all devices."""
    tp = 4
    mesh = make_mesh(1, tp, devices=jax.devices()[:tp])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)  # replicated
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)

    from functools import partial

    from jax.sharding import PartitionSpec as P

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P("model", None)),
        out_specs=P("model"), check_vma=False,
    )
    def run(x_full, w_local):
        i = jax.lax.axis_index("model")
        xs = jax.lax.dynamic_slice_in_dim(x_full, i * 4, 4, -1)
        return ring_rs_matmul(xs, w_local, "model", tp)[None]

    got = np.asarray(run(x, w))  # (tp, 2, 2): device i's chunk C_i
    want = np.asarray(x @ w)  # (2, 8)
    for i in range(tp):
        np.testing.assert_allclose(
            got[i], want[:, i * 2 : (i + 1) * 2], rtol=1e-5, atol=1e-5
        )
