"""Checkpoint re-export / variable surgery.

Reference: `inference_model_generator.save_inference_model`
(`/root/reference/av_speech_inpainting/inference_model_generator.py:14-48`)
rebuilt the graph without a fixed batch size and re-saved — necessary only
because TF1 froze batch size and the CudnnLSTM training kernel into the
checkpoint.  In this framework one parameter tree serves any batch size and
both train/infer paths, so re-export reduces to a copy; it still exists for
CLI parity, and `rename_vars` reproduces `scripts/rename_vars_tf_ckp.py:9-34`
(key surgery inside a checkpoint).
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np


def save_inference_model(
    config_file: str, input_model: str, output_model: str, model_kind: str = "enh"
) -> None:
    """Copy a training checkpoint to an inference checkpoint path.

    `model_kind` ({enh, asr, enhasr}) is accepted for CLI parity with the
    reference (`speech_inpainting_main.py:96-101`) but is vestigial here by
    design: the reference needed it to rebuild the right TF graph without a
    fixed batch size (`inference_model_generator.py:14-48`), while avsi has
    no train/inference graph split — all kinds re-export identically.
    """
    src = input_model + ".npz"
    if not os.path.isfile(src):
        raise FileNotFoundError(
            f"no checkpoint at {src} — input_model must be the checkpoint "
            "prefix (e.g. <exp>/netmodel/sinet), not a directory"
        )
    os.makedirs(os.path.dirname(output_model) or ".", exist_ok=True)
    shutil.copy(src, output_model + ".npz")
    # optimizer state (.opt.npz) is deliberately dropped: inference
    # checkpoints carry weights only
    # carry the self-contained sidecars when exporting across directories
    src_dir = os.path.abspath(os.path.dirname(input_model))
    dst_dir = os.path.abspath(os.path.dirname(output_model))
    if src_dir != dst_dir:
        for name in ("config.txt", "audio_features_mean.npy", "audio_features_std.npy"):
            p = os.path.join(src_dir, name)
            if os.path.isfile(p):
                shutil.copy(p, os.path.join(dst_dir, name))
    print(f"Exported inference model to {output_model}.npz")


def rename_vars(
    checkpoint: str, out_checkpoint: str, pattern: str, replacement: str
) -> int:
    """Regex-rename leaf keys inside a checkpoint npz."""
    path = checkpoint if checkpoint.endswith(".npz") else checkpoint + ".npz"
    with np.load(path) as f:
        data = dict(f)
    renamed = {}
    changed = 0
    for k, v in data.items():
        nk = re.sub(pattern, replacement, k)
        if nk in renamed:
            raise ValueError(
                f"rename collision: two keys map to {nk!r} — a weight tensor "
                "would be silently dropped"
            )
        renamed[nk] = v
        changed += nk != k
    out = out_checkpoint if out_checkpoint.endswith(".npz") else out_checkpoint + ".npz"
    np.savez(out, **renamed)
    print(f"Renamed {changed} keys -> {out}")
    return changed
