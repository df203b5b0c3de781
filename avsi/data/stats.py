"""Offline feature statistics (per-bin mean/std for normalization).

Reference: `audio_feat_preprocessing.compute_mean_std_features`
(`/root/reference/av_speech_inpainting/audio_feat_preprocessing.py:23-129`):
walk a split's sample dirs, compute log-spectrograms (or fbanks / mfcc)
of `<file_prefix>.wav`, optionally apply the sample's mask, and save
`<out_prefix>_mean.npy` / `<out_prefix>_std.npy`.

Computed with the same jitted DSP ops the models use, batched on whatever
backend is active (CPU during preprocessing).
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np

from avsi.ops import mel as mel_ops
from avsi.ops import stft as stft_ops
from avsi.utils import wav as wavio


def _np_frames(wave: np.ndarray, fl: int, fs: int) -> np.ndarray:
    nf = -(-len(wave) // fs)
    pad = max(0, (nf - 1) * fs + fl - len(wave))
    xp = np.pad(wave.astype(np.float64), (0, pad))
    idx = np.arange(nf)[:, None] * fs + np.arange(fl)[None, :]
    return xp[idx]


def _features_for(wave: np.ndarray, feat_type: str, n_fft: int, window_size: int,
                  step_size: int, num_mel_bins: int, num_mfcc: int, n_delta: int,
                  sample_rate: int):
    """Pure-numpy twin of the on-device front-end (identical DFT/mel
    matrices).  This is offline host preprocessing: routing it through the
    accelerator would serialize thousands of tiny transfers."""
    fl = int(round(window_size / 1e3 * sample_rate))
    fs = int(round(step_size / 1e3 * sample_rate))
    frames = _np_frames(wave, fl, fs)
    dft = stft_ops._dft_matrix(fl, n_fft).astype(np.float64)
    out = frames @ dft
    nbins = n_fft // 2 + 1
    re, im = out[:, :nbins], out[:, nbins:]
    if feat_type == "spec":
        feats = np.log(np.hypot(re, im) + 1e-6)
    else:
        pow_spec = re * re + im * im
        melmat = mel_ops.linear_to_mel_matrix(
            num_mel_bins, nbins, sample_rate, 125.0, 7600.0
        ).astype(np.float64)
        fbanks = np.log(pow_spec @ melmat + 1e-6)
        if feat_type == "fbanks":
            feats = fbanks
        else:
            feats = fbanks @ mel_ops._dct2_matrix(num_mel_bins).astype(np.float64)[:, :num_mfcc]
    if n_delta > 0:
        full = [feats]
        cur = feats[None]
        for _ in range(n_delta):
            nxt = np.zeros_like(cur)
            padded = cur
            for i in range(1, 3):
                padded = np.pad(padded, [(0, 0), (1, 1), (0, 0)], mode="symmetric")
                nxt = nxt + i * (padded[:, i * 2 :, :] - padded[:, : -i * 2, :])
            cur = nxt / 10.0  # 2 * (1^2 + 2^2)
            full.append(cur[0])
        feats = np.concatenate(full, axis=1)
    return feats.astype(np.float32)


def compute_mean_std_features(
    audio_dir: str,
    file_prefix: str,
    out_prefix: str,
    feat_type: str = "spec",
    sample_rate: int = 16000,
    n_fft: int = 512,
    window_size: int = 24,
    step_size: int = 12,
    preemph: float = 0.0,
    num_mel_bins: int = 80,
    num_mfcc: int = 13,
    n_delta: int = 0,
    apply_mask: bool = False,
    save_feat: bool = False,
    ext: str = "wav",
) -> tuple[np.ndarray, np.ndarray]:
    """Accumulate per-bin mean/std over all `<dir>/<file_prefix>.<ext>`."""
    sample_dirs = sorted(
        d for d in glob(os.path.join(audio_dir, "*")) if os.path.isdir(d)
    )
    total = None
    total_sq = None
    count = 0
    for d in sample_dirs:
        path = os.path.join(d, f"{file_prefix}.{ext}")
        if not os.path.isfile(path):
            continue
        _, wave = wavio.read_wav_int16(path)
        if preemph > 0:
            wave = wave - preemph * np.concatenate([[0.0], wave[:-1]]).astype(wave.dtype)
        feats = _features_for(
            wave, feat_type, n_fft, window_size, step_size, num_mel_bins,
            num_mfcc, n_delta, sample_rate,
        )
        if apply_mask:
            mask = np.load(os.path.join(d, "mask.npy"))
            t = min(len(mask), len(feats))
            # reference truncates to the mask's bin count too
            # (audio_feat_preprocessing.py:90: discard last bins and frames)
            f_dim = min(mask.shape[1], feats.shape[1])
            sel = feats[:t, :f_dim][mask[:t, 0] > 0]
        else:
            sel = feats
        if save_feat:
            np.save(os.path.join(d, f"{file_prefix}.npy"), feats)
        if total is None:
            total = sel.sum(axis=0)
            total_sq = (sel**2).sum(axis=0)
        else:
            total += sel.sum(axis=0)
            total_sq += (sel**2).sum(axis=0)
        count += len(sel)
    if count == 0:
        raise ValueError(f"no samples found under {audio_dir}")
    mean = total / count
    std = np.sqrt(np.maximum(total_sq / count - mean**2, 1e-12))
    # Reference semantics (audio_feat_preprocessing.py:127-128): out_prefix
    # is relative to the audio dir; an absolute prefix passes through
    # (os.path.join drops the left side for absolute right sides).
    out_prefix = os.path.join(audio_dir, out_prefix)
    np.save(out_prefix + "_mean.npy", mean.astype(np.float32))
    np.save(out_prefix + "_std.npy", std.astype(np.float32))
    return mean, std


def load_stats(
    mean_path: str, std_path: str, feat_dim: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Load mean/std feature stats, optionally cut to `feat_dim` bins.

    The unet family runs a 129-bin STFT (n_fft=256) but models the first
    128 bins (`feat_dim = 128`, the documented unet.config workflow) — the
    models slice spectrograms to the first `feat_dim` bins, so the stats
    must be sliced identically or every (spec - mean) broadcast fails."""
    mean = np.load(mean_path).astype(np.float32)
    std = np.load(std_path).astype(np.float32)
    if feat_dim is not None and mean.shape[-1] != feat_dim:
        if mean.shape[-1] < feat_dim:
            raise ValueError(
                f"feature stats at {mean_path} have {mean.shape[-1]} bins "
                f"but the model needs {feat_dim}"
            )
        mean, std = mean[..., :feat_dim], std[..., :feat_dim]
    return mean, std
