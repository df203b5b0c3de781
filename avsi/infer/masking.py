"""Oracle-mask baseline: reconstruct `masked.wav` (the corrupted anchor).

Reference: `/root/reference/av_speech_inpainting/masking.py:18-103` — apply
the T-F mask to the target STFT, reconstruct with oracle or masked phase,
write `<audio_dir>/<sample>/masked.wav`, report the oracle loss_hole
(mean |normalized log-spec| in the hole, masking.py:47-50).  Also the first
sanity check of the whole DSP chain (SURVEY.md §4).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from avsi.data import reader as reader_lib, stats as stats_lib
from avsi.data.tfrecord import list_tfrecord_files
from avsi.ops import stft as stft_ops
from avsi.parallel import mesh as mesh_lib
from avsi.utils import wav as wavio



def make_mask_step(num_audio_samples: int | None, stats, audio_feat_dim: int = 257,
                   frame_length: int = 384, frame_step: int = 192,
                   fft_length: int = 512):
    """num_audio_samples=None (var mode): the output length is derived from
    the batch's (padded) frame count — one compile per bucket shape."""
    mean = jnp.asarray(stats[0])
    std = jnp.asarray(stats[1])

    def step(batch, oracle_phase: bool):
        batch = mesh_lib.expand_batch(batch, audio_feat_dim)
        masks = batch["masks"]
        t, f = masks.shape[1], masks.shape[2]
        num_samples = num_audio_samples or t * frame_step
        re, im = stft_ops.stft_real_imag(
            batch["target_sources"], frame_length, frame_step, fft_length
        )
        re, im = re[:, :t, :f], im[:, :t, :f]
        mag = jnp.sqrt(re * re + im * im)
        masked_mag = mag * masks
        if not oracle_phase:
            re = re * masks
            im = im * masks
        nbins = fft_length // 2 + 1
        pad = nbins - f
        if pad > 0:
            zp = ((0, 0), (0, 0), (0, pad))
            masked_mag = jnp.pad(masked_mag, zp)
            re = jnp.pad(re, zp)
            im = jnp.pad(im, zp)
        # phase-free resynthesis (stft.waveform_from_mag_complex): same
        # math as arctan2 -> cos/sin, minus the transcendentals
        wav = stft_ops.waveform_from_mag_complex(
            masked_mag, re, im, num_samples=num_samples,
            frame_length=frame_length, frame_step=frame_step,
            fft_length=fft_length,
        )
        spec_norm = (jnp.log(mag + 1e-6) - mean) / std
        # per-sample hole loss: padded duplicates excluded host-side
        hole_ps = jnp.sum(jnp.abs(spec_norm) * (1 - masks), axis=(1, 2)) / jnp.maximum(
            jnp.sum(1 - masks, axis=(1, 2)), 1.0
        )
        wav_i16 = jnp.clip(wav, -32768, 32767).astype(jnp.int16)
        return wav_i16, hole_ps

    return step


def mask_app(
    data_path: str,
    audio_path: str,
    tfrecord_mode: str = "fixed",
    oracle_phase: bool = True,
    audio_feat_dim: int = 257,
    video_feat_dim: int = 136,
    num_audio_samples: int = 48000,
    batch_size: int = 1,
    feat_mean_file: str | None = None,
    feat_std_file: str | None = None,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
) -> dict:
    """Write masked.wav for every sample (deviation: the reference hard-codes
    the authors' cluster stats paths at masking.py:37-38; here they are
    arguments, identity-normalized when absent)."""
    batch_size = batch_size or 1
    if feat_mean_file and feat_std_file:
        stats = stats_lib.load_stats(
            feat_mean_file, feat_std_file, feat_dim=audio_feat_dim
        )
    else:
        stats = (np.zeros(audio_feat_dim, np.float32), np.ones(audio_feat_dim, np.float32))
    dm = reader_lib.DataManager(
        num_audio_samples=num_audio_samples,
        audio_feat_size=audio_feat_dim,
        video_feat_size=video_feat_dim,
        mode=tfrecord_mode,
        samples_per_frame=frame_step,
    )
    files = list_tfrecord_files(data_path)
    if not files:
        raise ValueError(f"no tfrecords under {data_path}")
    step = jax.jit(
        make_mask_step(
            num_audio_samples if tfrecord_mode == "fixed" else None,
            stats, audio_feat_dim, frame_length, frame_step, fft_length,
        ),
        static_argnums=1,
    )

    total = 0
    holes = []
    for batch in dm.prefetch_batches(files, batch_size, pad_final=True):
        n_real = batch.get("num_real", batch_size)
        wav, hole_ps = step(mesh_lib.compact_batch(batch), oracle_phase)
        wav = np.asarray(wav)
        holes.extend(np.asarray(hole_ps)[:n_real].tolist())
        for i in range(n_real):
            sample_dir = batch["sample_paths"][i]
            seq_len = int(batch["sequence_lengths"][i])
            os.makedirs(os.path.join(audio_path, sample_dir), exist_ok=True)
            wavio.write_wav_int16(
                os.path.join(audio_path, sample_dir, "masked.wav"),
                wav[i][: seq_len * frame_step],
            )
        total += n_real
    print(f"Written {total} masked wavs. Loss hole: {np.mean(holes):.5f}")
    return {"num_samples": total, "loss_hole": float(np.mean(holes))}
