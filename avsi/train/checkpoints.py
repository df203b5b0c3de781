"""Checkpointing: params (+ optimizer state) as flat npz archives.

Replaces tf.train.Saver with a transparent format: each leaf saved under
its tree path.  Three checkpoint roles mirror the reference
(SURVEY.md §5): periodic `ckpt` (every 1000 steps, training.py:266-268),
best-validation `sinet` (training.py:334-342) / `asrnet` (by val PER,
training_asr.py:307-312).  The checkpoint directory is self-contained:
config.txt plus the mu/sigma .npy stats are copied next to the weights
(training.py:121-127), so inference needs only the directory.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax


def _materialize(leaf) -> np.ndarray:
    """Leaf -> host numpy, multi-host safe.

    On a multi-process mesh a tensor-parallel shard may live on ANOTHER
    host's devices (`np.asarray` would throw on the non-addressable array);
    gather it collectively instead.  Every process must therefore reach
    this call — save_tree runs the flatten on all hosts and gates only the
    file write on process 0."""
    if (
        isinstance(leaf, jax.Array)
        and not leaf.is_fully_addressable
        and not leaf.is_fully_replicated
    ):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


def _flatten(tree) -> dict[str, np.ndarray]:
    pairs = [
        ("/".join(str(p).strip("[].'") for p in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]
    # start every addressable device->host copy before the first blocking
    # np.asarray: per-leaf synchronous fetches would pay the host-transfer
    # round-trip floor once PER LEAF (hundreds of leaves in params+opt
    # trees; the tunnel floor is ~34 ms — see CLAUDE.md)
    for _, leaf in pairs:
        if isinstance(leaf, jax.Array) and leaf.is_fully_addressable:
            leaf.copy_to_host_async()
    return {key: _materialize(leaf) for key, leaf in pairs}


def save_tree(path: str, tree, extra: dict | None = None) -> None:
    """Multi-host: all processes participate in the (collective) gather of
    non-addressable leaves; only process 0 writes the archive — callers on
    every host call save_tree unconditionally and point at a path that is
    shared (or process-0-local)."""
    flat = _flatten(tree)
    if jax.process_index() != 0:
        return
    if extra:
        flat.update({f"__extra__/{k}": np.asarray(v) for k, v in extra.items()})
    np.savez(path, **flat)


def _tree_from_npz(data, template, path: str):
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    flat = _flatten(template)
    keys = list(flat.keys())
    if len(keys) != len(leaves_t):
        raise ValueError("template flatten mismatch")
    leaves = []
    for key, leaf in zip(keys, leaves_t):
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs template {np.shape(leaf)}"
            )
        want = np.asarray(leaf).dtype
        if arr.dtype != want:
            # e.g. a float64 archive from external tooling must not
            # silently widen a float32 model (slow wide TPU compiles,
            # changed numerics) — load at the template's dtype
            arr = arr.astype(want)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_tree(path: str, template):
    """Load leaves into the structure of `template` (order-stable).
    Leaf dtypes follow the template (shape must match exactly)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        return _tree_from_npz(data, template, path)


def load_extra(path: str) -> dict:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        return {
            k.split("/", 1)[1]: data[k]
            for k in data.files
            if k.startswith("__extra__/")
        }


def save_checkpoint(
    ckpt_dir: str, name: str, params, opt_state=None, step: int = 0
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    prefix = os.path.join(ckpt_dir, name)
    save_tree(prefix, params, extra={"step": step})
    if opt_state is not None:
        save_tree(prefix + ".opt", opt_state)
    return prefix


def restore_checkpoint(ckpt_dir: str, name: str, params_template, opt_template=None):
    prefix = os.path.join(ckpt_dir, name)
    with np.load(prefix + ".npz") as data:  # one open for leaves + extras
        params = _tree_from_npz(data, params_template, prefix)
        step = int(data["__extra__/step"]) if "__extra__/step" in data else 0
    opt_state = None
    if opt_template is not None and os.path.isfile(prefix + ".opt.npz"):
        opt_state = load_tree(prefix + ".opt", opt_template)
    return params, opt_state, step


def write_meta(ckpt_dir: str, config: dict) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({k: v for k, v in config.items()}, f, indent=1, default=str)


def write_bundle(
    ckpt_dir: str, config_file: str, config: dict, feat_dim: int | None = None
) -> tuple:
    """Make `ckpt_dir` a self-contained inference bundle: config.txt plus
    the mu/sigma stats copied next to the weights (training.py:121-127) —
    the exact layout `load_model_bundle` reads.  Single source of truth
    for the layout (used by the trainer and by `import_tf`).  Returns the
    loaded (mean, std) stats so the caller need not re-read the .npy files."""
    import shutil

    from avsi.data import stats as stats_lib

    os.makedirs(ckpt_dir, exist_ok=True)
    dest = os.path.join(ckpt_dir, "config.txt")
    # resuming from the bundle's own config.txt must not self-copy
    # (reference guard: training.py:122-124)
    if os.path.abspath(config_file) != os.path.abspath(dest):
        shutil.copy(config_file, dest)
    stats = stats_lib.load_stats(
        config["audio_feat_mean"], config["audio_feat_std"], feat_dim=feat_dim
    )
    np.save(os.path.join(ckpt_dir, "audio_features_mean.npy"), stats[0])
    np.save(os.path.join(ckpt_dir, "audio_features_std.npy"), stats[1])
    return stats
