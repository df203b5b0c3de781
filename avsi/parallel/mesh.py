"""Device mesh and data-parallel sharding.

The reference is strictly single-device (SURVEY.md §2.4: one tf.Session,
feed_dict batches, no tf.distribute).  This module is the TPU-native
replacement: a 1-D `data` mesh over the local slice, batches sharded along
it, parameters replicated, and gradients reduced by the XLA-inserted
all-reduce when the jitted train step runs under the mesh.

Utterances are independent and the largest model is a few M params, so
pure data parallelism is the right decomposition at reference scale;
TP/PP/SP would be overhead there (documented decision, SURVEY.md §2.4).
For scaled-up nets the mesh generalizes to 2-D `(data, model)`:
`get_mesh(model_shards=k)` adds a tensor-parallel axis and
`shard_state` places parameters/optimizer state Megatron-style —
gate/output dims column-sharded over `model`, contraction dims
row-sharded where the output dim does not divide — with XLA GSPMD
inserting the all-gathers/reduce-scatters.  Sharded == replicated
numerics are asserted in tests/test_parallel.py.
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
    "mask_frames",
    "embeddings",
)


def get_mesh(num_shards: int = 0, devices=None, model_shards: int = 1) -> Mesh:
    """1-D `data` mesh, or 2-D `(data, model)` when model_shards > 1.

    `num_shards` is the DATA-axis size (0 = as many as fit); the total
    device count used is data * model."""
    devices = list(devices if devices is not None else jax.devices())
    m = max(1, int(model_shards))
    if m == 1:
        n = num_shards if num_shards > 0 else len(devices)
        if n > len(devices):
            raise ValueError(
                f"mesh needs {n} data shards, have {len(devices)} devices"
            )
        return Mesh(np.array(devices[:n]), ("data",))
    n_data = num_shards if num_shards > 0 else max(1, len(devices) // m)
    total = n_data * m
    if total > len(devices):
        raise ValueError(
            f"mesh {n_data}x{m} needs {total} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices[:total]).reshape(n_data, m), ("data", "model"))


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


def param_spec(shape, n_model: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter-shaped leaf.

    Megatron-style uniform rule: column-shard the LAST axis over `model`
    when it divides evenly (LSTM gate dims 4H, dense output dims);
    otherwise row-shard the contraction axis of matrices whose output dim
    does not divide (e.g. the 257-bin head (2H, 257)), which makes XLA
    reduce partial products over `model`; small/indivisible leaves
    (scalars, 257-dim biases, optimizer counts) replicate."""
    if not shape:
        return P()
    if shape[-1] % n_model == 0 and shape[-1] >= 2 * n_model:
        return P(*([None] * (len(shape) - 1)), "model")
    if len(shape) >= 2 and shape[-2] % n_model == 0 and shape[-2] >= 2 * n_model:
        return P(*([None] * (len(shape) - 2)), "model", None)
    return P()


def shard_state(tree, mesh: Mesh):
    """Place params / optimizer state on the mesh.

    Replicates everything on a 1-D data mesh; on a `(data, model)` mesh,
    applies `param_spec` leaf-wise so the model axis holds a
    tensor-parallel shard of every large parameter (and of its adam
    moments, which share the tree structure)."""
    if "model" not in mesh.axis_names:
        return replicate(tree, mesh)
    n_model = int(mesh.shape["model"])

    def put(leaf):
        spec = param_spec(getattr(leaf, "shape", ()), n_model)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def compact_batch(batch: dict) -> dict:
    """Shrink a host batch before the host->device transfer.

    Two lossless compactions for the reference data model:
      * masks are pure time-gaps (every frequency bin zeroed together,
        dataset_generator.py:44-46) -> ship one int8 per frame
        ('mask_frames') instead of (T, F) float32;
      * waveforms hold int16-scale values (utils/wav.py convention) ->
        ship int16.
    ~5x fewer bytes per batch; `expand_batch` restores them inside the
    jitted step.  Falls back silently when an assumption does not hold.
    """
    out = device_batch(batch)
    m = out.get("masks")
    if m is not None and m.ndim == 3:
        m = np.asarray(m)
        mf = m[:, :, 0]
        mi = mf.astype(np.int8)
        # bin-uniform AND int8-round-trippable: a soft mask in (0,1) is
        # bin-uniform but would be truncated to zeros by the cast
        if np.array_equal(mi.astype(m.dtype), mf) and np.array_equal(
            m, np.broadcast_to(mf[:, :, None], m.shape)
        ):
            out["mask_frames"] = mi
            del out["masks"]
    w = out.get("target_sources")
    if w is not None:
        w = np.asarray(w)
        if w.dtype == np.float32 and np.abs(w).max() < 32767.5:
            wi = w.astype(np.int16)
            if np.array_equal(wi.astype(np.float32), w):
                out["target_sources"] = wi
    v = out.get("video_features")
    if v is not None and np.asarray(v).dtype == np.float32:
        # normalized motion vectors: f16 transport (5e-4 relative error)
        # halves the largest remaining transfer
        out["video_features"] = np.asarray(v).astype(np.float16)
    return out


def expand_batch(batch: dict, audio_feat_dim: int) -> dict:
    """Inverse of compact_batch, traced inside the jitted step."""
    import jax.numpy as jnp

    out = dict(batch)
    mf = out.pop("mask_frames", None)
    if mf is not None:
        out["masks"] = jnp.broadcast_to(
            mf.astype(jnp.float32)[:, :, None],
            (mf.shape[0], mf.shape[1], audio_feat_dim),
        )
    if out["target_sources"].dtype != jnp.float32:
        out["target_sources"] = out["target_sources"].astype(jnp.float32)
    if "video_features" in out and out["video_features"].dtype != jnp.float32:
        out["video_features"] = out["video_features"].astype(jnp.float32)
    return out
