"""ASR inference: restore `asrnet`, decode, write `.lbl` transcriptions.

Reference: `/root/reference/av_speech_inpainting/inference_asr.py:18-135` —
CTC decode, map labels -> phonemes, write `<audio_dir>/<sample>/<prefix>.lbl`
(comma-joined), report mean loss + PER; `--apply_mask` evaluates on masked
audio.  Decode defaults to the protocol-matched host beam search at the
reference's width 100 (the tf.nn.ctc_beam_search_decoder default used at
models_asr.py:135); `beam_width = 0` opts into greedy decode on device.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from avsi.data import phonemes as ph_lib
from avsi.data import reader as reader_lib
from avsi.data.tfrecord import list_tfrecord_files
from avsi.models import asr as asr_model
from avsi.ops import ctc as ctc_ops
from avsi.parallel import mesh as mesh_lib
from avsi.infer.inpaint import load_model_bundle


def make_asr_step(config, stats, apply_mask: bool, use_beam: bool):
    stats_j = (jnp.asarray(stats[0]), jnp.asarray(stats[1]))

    def step(params, batch):
        batch = mesh_lib.expand_batch(batch, int(config["audio_feat_dim"]))
        out = asr_model.forward(params, batch, config, stats_j, apply_mask=apply_mask)
        lengths = out.get("logit_lengths", batch["sequence_lengths"])
        # per-sequence loss so the host can drop pad_final filler rows
        loss_per_seq = ctc_ops.ctc_loss_per_seq(
            out["logits"], lengths, batch["labels"], batch["labels_lengths"]
        )
        # fetch only what the chosen decode path reads: full (B,T,C) logits
        # for host beam search, or the tiny greedy-decoded ids
        dec = out["logits"] if use_beam else asr_model.decode_greedy(out, batch)
        return dec, loss_per_seq, lengths

    return step


def infer(
    model_path: str,
    data_path_test: str,
    audio_path: str,
    out_file_prefix: str,
    dictionary_file: str,
    apply_mask: bool = False,
    norm: bool = True,
    batch_size: int = 1,
    beam_width: int = 100,
    lstm_impl: str = "auto",
) -> dict:
    batch_size = batch_size or 1
    config, stats, model, params = load_model_bundle(
        model_path, norm, is_asr=True, lstm_impl=lstm_impl
    )
    dictionary = ph_lib.load_dictionary(dictionary_file)
    dm = reader_lib.DataManager(
        num_audio_samples=config["audio_len"],
        audio_feat_size=config["audio_feat_dim"],
        video_feat_size=config["video_feat_dim"],
    )
    files = list_tfrecord_files(data_path_test)
    if not files:
        raise ValueError(f"no tfrecords under {data_path_test}")
    step = jax.jit(make_asr_step(config, stats, apply_mask, use_beam=beam_width > 0))

    total = 0
    losses = []
    decs, labs = [], []
    for batch in dm.prefetch_batches(files, batch_size, pad_final=True):
        n_real = batch.get("num_real", batch_size)
        dec, loss_per_seq, lengths = step(params, mesh_lib.compact_batch(batch))
        losses.extend(np.asarray(loss_per_seq)[:n_real].tolist())
        dec = np.asarray(dec)
        lengths = np.asarray(lengths)
        if beam_width > 0:
            beam_seqs = ctc_ops.beam_search_decode_batch(
                dec[:n_real], lengths[:n_real], beam_width
            )
        for i in range(n_real):
            if beam_width > 0:
                seq = beam_seqs[i]
            else:
                seq = [int(x) for x in dec[i] if x >= 0]
            sample_dir = batch["sample_paths"][i]
            text = ",".join(ph_lib.get_phonemes_from_labels(seq, dictionary))
            os.makedirs(os.path.join(audio_path, sample_dir), exist_ok=True)
            with open(
                os.path.join(audio_path, sample_dir, out_file_prefix + ".lbl"), "w"
            ) as f:
                f.write(text)
            decs.append(seq)
            ll = int(batch["labels_lengths"][i])
            labs.append([int(x) for x in batch["labels"][i][:ll]])
        total += n_real
    per = ctc_ops.per_metric(decs, labs)
    print(f"Wrote {total} transcriptions. Loss: {np.mean(losses):.5f}  PER: {per:.5f}")
    return {"num_samples": total, "loss": float(np.mean(losses)), "per": per}
