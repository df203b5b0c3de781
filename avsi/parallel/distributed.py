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

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
