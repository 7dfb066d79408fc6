"""Sequence-sharded decode (parallel/ring_decode.py): token parity vs the
single-chip Generator, seq-only and seq x tensor-parallel, on the virtual
8-device mesh. The long-context decode stretch path (SURVEY.md §5,
long-context row; VERDICT r2 next-round 8)."""

import numpy as np
import pytest

from conftest import random_params, tiny_config

from llama2_tpu.config import GenerationConfig
from llama2_tpu.parallel.ring_decode import SeqShardedDecoder
from llama2_tpu.parallel.sp import make_seq_mesh, make_sp_tp_mesh
from llama2_tpu.runtime.generator import Generator


def _reference_stream(config, params, prompt, steps):
    gen = GenerationConfig(temperature=0.0, steps=steps, seed=0)
    return Generator(config, params).generate(prompt, gen).tokens


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_seq_sharded_stream_parity(sp):
    config = tiny_config()
    params = random_params(config)
    prompt = [5, 9, 301, 77]
    steps = 40

    want = _reference_stream(config, params, prompt, steps)
    dec = SeqShardedDecoder(config, params, make_seq_mesh(sp))
    got = dec.generate(prompt, steps)
    assert got == want


def test_seq_x_tp_parity():
    config = tiny_config()
    params = random_params(config)
    prompt = [11, 42]
    steps = 32

    want = _reference_stream(config, params, prompt, steps)
    dec = SeqShardedDecoder(config, params, make_sp_tp_mesh(4, 2))
    got = dec.generate(prompt, steps)
    assert got == want


def test_cache_rows_scale_with_sp():
    """Each seq shard holds S/sp cache rows: the per-device KV bytes shrink
    ~1/sp — the point of the path (contexts beyond one chip's HBM x TP)."""
    config = tiny_config()
    params = random_params(config)
    dec = SeqShardedDecoder(config, params, make_seq_mesh(4))
    ck, _ = dec._cache(1)
    shard = ck.addressable_shards[0].data
    assert shard.shape[3] == config.seq_len // 4
    assert len({s.data.shape for s in ck.addressable_shards}) == 1


def test_empty_prompt_and_bos_stop():
    config = tiny_config()
    params = random_params(config)
    steps = 24
    want = _reference_stream(config, params, [], steps)
    dec = SeqShardedDecoder(config, params, make_seq_mesh(2))
    got = dec.generate([], steps)
    assert got == want


def test_indivisible_seq_len_rejected():
    config = tiny_config()  # seq_len 96; 96 % 5 != 0
    params = random_params(config)
    with pytest.raises(ValueError, match="not divisible"):
        SeqShardedDecoder(config, params, make_seq_mesh(5))


def test_append_local_straddle_window():
    """A T>1 verify window straddling a seq-shard boundary must leave each
    shard exactly the rows it owns (per-row writes; ADVICE r3: the clamped
    whole-window write disowned straddling rows on BOTH neighbors)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from llama2_tpu.parallel.ring_decode import _append_local
    from llama2_tpu.parallel.sp import SEQ_AXIS

    sp, S, T = 2, 16, 3
    s_local = S // sp
    mesh = make_seq_mesh(sp)
    cache = jnp.zeros((1, 1, S, 4), jnp.float32)
    # rows tagged 1..T so landing positions are observable
    rows = jnp.broadcast_to(
        jnp.arange(1.0, T + 1)[None, None, :, None], (1, 1, T, 4)
    )

    def region(c, r):
        my_off = jax.lax.axis_index(SEQ_AXIS) * s_local
        return _append_local(
            c, r, jnp.int32(8), my_off=my_off, s_local=s_local
        )  # global rows 6, 7, 8 — straddles the 8-row boundary

    out = jax.jit(
        jax.shard_map(
            region, mesh=mesh,
            in_specs=(P(None, None, SEQ_AXIS, None), P(None, None, None, None)),
            out_specs=P(None, None, SEQ_AXIS, None),
            check_vma=False,
        )
    )(cache, rows)
    got = np.asarray(out)[0, 0, :, 0]
    want = np.zeros(S, np.float32)
    want[6], want[7], want[8] = 1.0, 2.0, 3.0
    np.testing.assert_array_equal(got, want)


def test_overlong_prompt_rejected():
    """ADVICE r3: a prompt that cannot fit seq_len (with its BOS) must raise
    a descriptive error, not crash in the buffer fill."""
    config = tiny_config()
    params = random_params(config)
    dec = SeqShardedDecoder(config, params, make_seq_mesh(2))
    with pytest.raises(ValueError, match="exceeds"):
        dec.generate(list(range(3, 3 + config.seq_len)), 4)


def test_batched_streams_match_per_prompt_runs(monkeypatch=None):
    """generate_batch: every row's stream equals its own single-prompt
    greedy run — ragged prompt lengths teacher-force per row (VERDICT r3
    next-round 7: productized batch path)."""
    config = tiny_config()
    params = random_params(config)
    prompts = [[5, 9, 301, 77], [11], [], [42, 8, 13, 200, 6]]
    steps = 28
    dec = SeqShardedDecoder(config, params, make_seq_mesh(4))
    gen = GenerationConfig(temperature=0.0, steps=steps, seed=0)
    got = dec.generate_batch(prompts, gen)
    for p, row in zip(prompts, got):
        assert row == _reference_stream(config, params, p, steps), p


def test_sampled_stream_matches_generator():
    """Seeded temperature/top-p sampling on the seq-sharded path reproduces
    the single-stream Generator token-for-token (same fold-by-position key
    scheme; VERDICT r3 next-round 7: productized sampling)."""
    config = tiny_config()
    params = random_params(config)
    prompt = [5, 9, 301]
    gen = GenerationConfig(temperature=0.8, top_p=0.9, steps=24, seed=13)
    want = Generator(config, params).generate(prompt, gen).tokens
    dec = SeqShardedDecoder(config, params, make_seq_mesh(2))
    assert dec.generate_batch([prompt], gen)[0] == want


def test_sampled_batch_rows_have_distinct_streams():
    config = tiny_config()
    params = random_params(config)
    gen = GenerationConfig(temperature=1.0, top_p=0.9, steps=20, seed=3)
    dec = SeqShardedDecoder(config, params, make_seq_mesh(2))
    a, b = dec.generate_batch([[7, 7], [7, 7]], gen)
    assert a != b  # row b samples with PRNGKey(seed + b)


def test_cli_seq_shards_matches_plain(tmp_path, capsys):
    """--seq-shards N from the CLI prints the same bytes as the plain run
    (the decoder is reachable from a user surface, not just tests)."""
    import os

    from conftest import TOKENIZER_BIN

    from llama2_tpu.cli import main
    from llama2_tpu.io.checkpoint import save_checkpoint

    config = tiny_config()
    params = random_params(config)
    ckpt = os.path.join(tmp_path, "tiny.bin")
    save_checkpoint(ckpt, config, params, shared_weights=True)
    args = [ckpt, "-t", "0", "-n", "24", "-z", TOKENIZER_BIN]
    assert main(args) == 0
    want = capsys.readouterr().out
    assert main(args + ["--seq-shards", "2"]) == 0
    assert capsys.readouterr().out == want
