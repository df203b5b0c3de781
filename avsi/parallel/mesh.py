"""Device mesh and data-parallel sharding.

The reference is strictly single-device (SURVEY.md §2.4: one tf.Session,
feed_dict batches, no tf.distribute).  This module is the TPU-native
replacement: a 1-D `data` mesh over the local slice, batches sharded along
it, parameters replicated, and gradients reduced by the XLA-inserted
all-reduce when the jitted train step runs under the mesh.

Utterances are independent and the largest model is a few M params, so
pure data parallelism is the right decomposition; TP/PP/SP would be
overhead at this scale (documented decision, SURVEY.md §2.4).  The mesh
axis is named "data" so a second axis (e.g. "model") can be added without
breaking the sharding helpers.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys carried to device; anything else (sample_paths, num_real) is host-only
DEVICE_BATCH_KEYS = (
    "sequence_lengths",
    "labels_lengths",
    "target_sources",
    "labels",
    "video_features",
    "masks",
    "embeddings",
)


def get_mesh(num_shards: int = 0, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = num_shards if num_shards > 0 else len(devices)
    return Mesh(np.array(devices[:n]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def device_batch(batch: dict) -> dict:
    """Strip host-only fields from a batch."""
    return {k: v for k, v in batch.items() if k in DEVICE_BATCH_KEYS}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded along the batch axis."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in device_batch(batch).items()}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def pad_batch_to(batch: dict, total: int) -> tuple[dict, int]:
    """Pad a host batch (repeat last sample) so its leading dim == total."""
    n = len(batch["sequence_lengths"])
    if n == total:
        return batch, n
    out = dict(batch)
    for k in DEVICE_BATCH_KEYS:
        if k in batch:
            v = batch[k]
            reps = np.concatenate([v, np.repeat(v[-1:], total - n, axis=0)], axis=0)
            out[k] = reps
    out["num_real"] = n
    return out, n
