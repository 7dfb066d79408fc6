"""End-to-end CLI tests (subprocess, CPU backend)."""

import os
import subprocess
import sys

import pytest

from conftest import TOKENIZER_BIN

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=240):
    env = dict(os.environ)
    # Strip the axon sitecustomize so the subprocess really runs on CPU
    # (PYTHONPATH=/root/.axon_site registers the TPU backend at startup).
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.run(
        [sys.executable, "-m", "llama2_tpu", *args],
        capture_output=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


def test_no_args_prints_usage():
    r = run_cli()
    assert r.returncode == 0
    assert b"Usage:" in r.stdout


def test_help_flag():
    r = run_cli("-h")
    assert r.returncode == 0
    assert b"--temperature" in r.stdout


def test_unknown_flag_prints_usage():
    r = run_cli("ck.bin", "--bogus")
    assert b"unknown argument" in r.stderr
    assert b"Usage:" in r.stdout


def test_missing_value_errors():
    r = run_cli("ck.bin", "-t")
    assert r.returncode == 1
    assert b"missing argument" in r.stderr


def test_duplicate_checkpoint_errors():
    r = run_cli("a.bin", "b.bin")
    assert r.returncode == 1
    assert b"multiple checkpoint paths" in r.stderr


@pytest.mark.slow
def test_generate_argmax_end_to_end(tiny_checkpoint):
    path, config, _ = tiny_checkpoint
    # The tiny model's vocab is 512, so the tokenizer parses only the first
    # 512 entries of tokenizer.bin — exactly how the reference sizes its
    # tokenizer from the model header (main.zig:970).
    r = run_cli(path, "-t", "0", "-n", "24", "-z", TOKENIZER_BIN, "-v", "-s", "3")
    assert r.returncode == 0, r.stderr.decode()
    assert b"tokens per second" in r.stderr
    # deterministic: same args → same bytes
    r2 = run_cli(path, "-t", "0", "-n", "24", "-z", TOKENIZER_BIN, "-s", "4")
    assert r2.returncode == 0, r2.stderr.decode()
    assert r.stdout == r2.stdout
