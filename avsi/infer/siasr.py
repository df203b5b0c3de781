"""Fused speech-inpainting -> ASR pipeline.

Reference: `/root/reference/av_speech_inpainting/inference_siasr_ctc.py:22-271`
(CLI-wired) and its non-CTC twin: two graphs in one session, with the
enhanced waveform made to take a device->host->device round trip between
them (:190-218 — SURVEY.md §3.3).  Here the SI forward, waveform
reconstruction, ASR feature extraction and CTC logits are ONE jitted
function with no host bounce; only the final decode/label mapping and file
writes run on the host.  Decode defaults to the host beam search at width
100 (the reference's ASR judge default, models_asr.py:135); `beam_width=0`
opts into greedy decode on device.

Outputs match the reference layout:
  `<audio_dir>/<sample>/enhanced/<prefix>.wav`
  `<audio_dir>/<sample>/transcriptions/<prefix>.lbl`
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from avsi.data import phonemes as ph_lib
from avsi.data import reader as reader_lib
from avsi.data.tfrecord import list_tfrecord_files
from avsi.infer import common
from avsi.infer.inpaint import load_model_bundle
from avsi.models import asr as asr_model
from avsi.ops import ctc as ctc_ops
from avsi.ops import postfilter as postfilter_ops
from avsi.parallel import mesh as mesh_lib
from avsi.utils import wav as wavio


def make_siasr_step(
    si_model, si_config, si_stats, asr_config, asr_stats,
    oracle_phase: bool, phase_recon: str, gl_iters: int, use_beam: bool,
    passthrough: bool = False, gap_atten: dict | None = None,
):
    si_stats_j = (jnp.asarray(si_stats[0]), jnp.asarray(si_stats[1]))
    asr_stats_j = (jnp.asarray(asr_stats[0]), jnp.asarray(asr_stats[1]))

    def step(si_params, asr_params, batch):
        batch = mesh_lib.expand_batch(batch, int(si_config["audio_feat_dim"]))
        out = si_model.forward(si_params, batch, si_config, si_stats_j, train=False)
        loss_ps, hole_ps = common.per_sample_losses(out, batch)
        if gap_atten:
            out = postfilter_ops.apply_gap_attenuation(
                out, batch, si_stats_j, **gap_atten
            )
        wav = common.reconstruct_waveform(
            si_model, out, batch, si_config, si_stats_j, oracle_phase,
            phase_recon, gl_iters,
        )
        if passthrough:
            # the judge hears what would be deployed
            wav = common.apply_passthrough(si_model, wav, batch)
        # feed the enhanced waveform straight into the ASR front-end
        asr_out = asr_model.forward(
            asr_params, batch, asr_config, asr_stats_j, audio_sources=wav
        )
        lengths = asr_out.get("logit_lengths", batch["sequence_lengths"])
        # int16 on device: halves the dominant device->host transfer
        # (inpaint.py does the same; the host writes int16 wavs anyway)
        wav_i16 = jnp.clip(wav, -32768, 32767).astype(jnp.int16)
        # fetch only what the chosen decode path reads: full (B,T,C) logits
        # for host beam search, or the tiny greedy-decoded ids
        dec = asr_out["logits"] if use_beam else asr_model.decode_greedy(asr_out, batch)
        return wav_i16, dec, lengths, loss_ps, hole_ps

    return step


def infer(
    model_path_si: str,
    model_path_asr: str,
    data_path_test: str,
    audio_path: str,
    out_file_prefix: str,
    dictionary_file: str,
    norm: bool = True,
    oracle_phase: bool = False,
    batch_size: int = 1,
    phase_recon: str = "gl",
    gl_iters: int = 50,
    beam_width: int = 100,  # reference ASR-judge default (models_asr.py:135)
    passthrough: bool = False,
    gap_atten: dict | None = None,
    lstm_impl: str = "auto",
) -> dict:
    batch_size = batch_size or 1
    si_config, si_stats, si_model, si_params = load_model_bundle(
        model_path_si, norm, lstm_impl=lstm_impl
    )
    asr_config, asr_stats, _asr_def, asr_params = load_model_bundle(
        model_path_asr, norm, is_asr=True, lstm_impl=lstm_impl
    )
    dictionary = ph_lib.load_dictionary(dictionary_file)
    dm = reader_lib.DataManager(
        num_audio_samples=si_config["audio_len"],
        audio_feat_size=si_config["audio_feat_dim"],
        video_feat_size=si_config["video_feat_dim"],
        with_embedding=si_model.needs_embeddings,
    )
    files = list_tfrecord_files(data_path_test)
    if not files:
        raise ValueError(f"no tfrecords under {data_path_test}")
    step = jax.jit(
        make_siasr_step(
            si_model, si_config, si_stats, asr_config, asr_stats,
            oracle_phase, phase_recon, gl_iters, use_beam=beam_width > 0,
            passthrough=passthrough, gap_atten=gap_atten,
        )
    )

    hop = si_model.frame_step
    total = 0
    losses, holes, decs, labs = [], [], [], []
    for batch in dm.prefetch_batches(files, batch_size, pad_final=True):
        n_real = batch.get("num_real", batch_size)
        wav, dec, lengths, loss_ps, hole_ps = step(
            si_params, asr_params, mesh_lib.compact_batch(batch)
        )
        wav, dec, lengths = np.asarray(wav), np.asarray(dec), np.asarray(lengths)
        losses.extend(np.asarray(loss_ps)[:n_real].tolist())
        holes.extend(np.asarray(hole_ps)[:n_real].tolist())
        if beam_width > 0:
            beam_seqs = ctc_ops.beam_search_decode_batch(
                dec[:n_real], lengths[:n_real], beam_width
            )
        for i in range(n_real):
            sample_dir = batch["sample_paths"][i]
            seq_len = int(batch["sequence_lengths"][i])
            enh_dir = os.path.join(audio_path, sample_dir, "enhanced")
            tr_dir = os.path.join(audio_path, sample_dir, "transcriptions")
            os.makedirs(enh_dir, exist_ok=True)
            os.makedirs(tr_dir, exist_ok=True)
            wavio.write_wav_int16(
                os.path.join(enh_dir, out_file_prefix + ".wav"),
                wav[i][: seq_len * hop],
            )
            if beam_width > 0:
                seq = beam_seqs[i]
            else:
                seq = [int(x) for x in dec[i] if x >= 0]
            with open(os.path.join(tr_dir, out_file_prefix + ".lbl"), "w") as f:
                f.write(",".join(ph_lib.get_phonemes_from_labels(seq, dictionary)))
            decs.append(seq)
            ll = int(batch["labels_lengths"][i])
            labs.append([int(x) for x in batch["labels"][i][:ll]])
        total += n_real
    per = ctc_ops.per_metric(decs, labs)
    print(
        f"Wrote {total} enhanced wavs + transcriptions. "
        f"Loss: {np.mean(losses):.5f}  Loss hole: {np.mean(holes):.5f}  PER: {per:.5f}"
    )
    return {
        "num_samples": total,
        "loss": float(np.mean(losses)),
        "loss_hole": float(np.mean(holes)),
        "per": per,
    }
