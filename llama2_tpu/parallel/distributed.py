"""Multi-host initialization over DCN (SURVEY.md section 5.8 — new
first-class component; the reference is one memory space).

On a TPU pod slice each host runs the same program; ``jax.distributed``
wires the hosts' processes into one JAX runtime over DCN, after which
``jax.devices()`` spans the whole slice and a ``Mesh`` built from it carries
the ``model`` axis over ICI within a slice and (if sliced) ``data`` over DCN.

Usage (same command on every host; coordinator = host 0):

    from llama2_tpu.parallel import distributed
    distributed.initialize()          # env-driven (TPU metadata / JAX envs)
    # or explicitly:
    distributed.initialize("10.0.0.1:8476", num_processes=4, process_id=i)

Failure handling (implemented in ``runtime/batch_engine.py::_recover``,
tested by fault injection in tests/test_batch_engine.py): an error escaping
a tick — a lost backend surfaces as one — triggers rebuild of all mutable
device state (weights are read-only at inference; the KV cache/page pool is
recreated) and re-queues in-flight requests ahead of new arrivals;
re-admission teacher-forces each request's already-emitted tokens so it
resumes in place. ``max_retries`` bounds re-execution so a poison request is
errored to its caller instead of crash-looping. On a pod, a lost HOST
surfaces on the others as a coordination-service timeout from this module's
runtime; the per-process engine applies the same recovery after the process
set is re-established (coordinator restart — outside this module's scope).
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX; no-op when already initialized or 1 host."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # jax has used both "already initialized" and "should only be
        # called once." across versions; both mean we are done
        msg = str(e).lower()
        if "already initialized" not in msg and "only be called once" not in msg:
            raise
    except ValueError as e:
        # single host with no coordination env: jax raises
        # "coordinator_address should be defined" — the documented no-op
        if "coordinator_address" not in str(e):
            raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_local_batch(global_batch: int) -> int:
    """Split a global batch across hosts (continuous batching shards slots)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
