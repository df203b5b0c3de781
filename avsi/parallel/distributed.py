"""Multi-host (multi-process) initialization and per-host data sharding.

The reference has no distributed execution at all (SURVEY.md §2.4).  For
multi-host TPU slices: call `initialize()` once per process before any jax
use; collectives then ride ICI within a slice (and DCN across slices) via
the same `Mesh(('data',))` the single-host path uses — `mesh.get_mesh()`
already spans all global devices after initialization.

Data is sharded per host: each process reads only its own file shard
(`shard_files`), and `jax.make_array_from_process_local_data` assembles the
global batch.  For this workload (independent utterances, replicated
few-M-param models) there is nothing else to coordinate.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def active() -> bool:
    """True when running under a multi-process jax.distributed job."""
    return jax.process_count() > 1


def is_main() -> bool:
    """True on the process that owns file writes (checkpoints, logs, TB)."""
    return jax.process_index() == 0


def host_rows(global_array) -> np.ndarray:
    """This host's rows of a batch-sharded global array, in local row order.

    The inverse of `global_batch` for per-sample results: a jitted eval
    step over the global mesh returns arrays sharded along the batch axis;
    each host's addressable shards are exactly the rows it fed in (
    `make_array_from_process_local_data` places local data on local
    devices), so concatenating them by global row offset recovers the
    host-local batch this host can pair with its host-only metadata
    (labels, num_real)."""
    if not isinstance(global_array, jax.Array) or global_array.is_fully_addressable:
        return np.asarray(global_array)  # single-process: all rows are ours
    shards = sorted(
        global_array.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    seen = set()
    parts = []
    for s in shards:
        start = (s.index[0].start or 0) if s.index else 0
        if start in seen:  # replicas over a model axis duplicate rows
            continue
        seen.add(start)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def gather_hosts(values) -> np.ndarray:
    """Stack a small host-side float vector across processes: returns
    (process_count, len(values)), identical on every host.  Single-process:
    shape (1, len(values)).  The building block for cross-host metric
    reductions (sum/min/max) that must agree bitwise everywhere so that
    best-checkpoint and early-stop decisions stay in lockstep."""
    vec = np.asarray(values, dtype=np.float64).reshape(-1)
    if not active():
        return vec[None, :]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(vec), dtype=np.float64)


def allreduce_sum(values) -> np.ndarray:
    """Sum a small host-side float vector across processes (identical
    result on every host).  Single-process: identity."""
    return gather_hosts(values).sum(axis=0)


def assert_uniform(tag: str, payload: str) -> None:
    """Fail fast (everywhere) if `payload` differs across hosts — e.g. a
    batch compaction signature, so one host silently shipping a different
    dtype can never hang the collective that assembles the global batch."""
    if not active():
        return
    from jax.experimental import multihost_utils

    # int32 lanes: int64 would be silently truncated under jax_enable_x64=0
    digest = np.frombuffer(
        __import__("hashlib").sha256(payload.encode()).digest()[:8], np.int32
    )
    multihost_utils.assert_equal(
        digest, f"{tag} differs across hosts: {payload!r} (this host)"
    )


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection defaults."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_files(file_list: list[str], process_index: int | None = None,
                process_count: int | None = None) -> list[str]:
    """Deterministic per-host file shard (round-robin over sorted files).

    Raises when there are fewer files than processes: a host with an empty
    shard would fail (or hang in the first collective) asymmetrically long
    after startup — fail fast on every host instead, with the fix stated.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if len(file_list) < pc:
        raise ValueError(
            f"{len(file_list)} tfrecord file(s) cannot be sharded over {pc} "
            "processes — some hosts would get an empty shard; regroup the "
            "corpus into at least one file per host (tfrecords_grouping)"
        )
    return [f for i, f in enumerate(sorted(file_list)) if i % pc == pi]


def global_batch(local_batch: dict, mesh: Mesh, batch_keys) -> dict:
    """Assemble a global sharded batch from each host's local arrays."""
    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k in batch_keys:
        if k in local_batch:
            out[k] = jax.make_array_from_process_local_data(
                sharding, local_batch[k]
            )
    return out
