"""Mel filterbank, MFCC and delta features (TPU matmul implementations).

Matches the reference ASR front-end
(`/root/reference/av_speech_inpainting/audio_processing.py:59-104`):
`tf.signal.linear_to_mel_weight_matrix` (HTK mel scale, DC bin zeroed),
`tf.signal.mfccs_from_log_mel_spectrograms` (unnormalized DCT-II scaled by
1/sqrt(2*N)), and the symmetric-padded regression delta features.
Golden-tested against tf.signal in tests/test_mel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_DOT_KW = dict(precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)


def hertz_to_mel(f):
    return 1127.0 * np.log1p(np.asarray(f, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=None)
def linear_to_mel_matrix(
    num_mel_bins: int = 80,
    num_spectrogram_bins: int = 257,
    sample_rate: int = 16000,
    lower_edge_hertz: float = 125.0,
    upper_edge_hertz: float = 7600.0,
) -> np.ndarray:
    """(num_spectrogram_bins, num_mel_bins) triangular filterbank, HTK mel."""
    nyquist = sample_rate / 2.0
    lin_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)
    spec_mel = hertz_to_mel(lin_freqs)[1:, None]  # DC bin excluded
    band_edges = np.linspace(
        hertz_to_mel(lower_edge_hertz), hertz_to_mel(upper_edge_hertz), num_mel_bins + 2
    )
    lower = band_edges[None, :-2]
    center = band_edges[None, 1:-1]
    upper = band_edges[None, 2:]
    lower_slopes = (spec_mel - lower) / (center - lower)
    upper_slopes = (upper - spec_mel) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    return np.pad(weights, [(1, 0), (0, 0)]).astype(np.float32)


def log_mel_spectrogram(
    spectrograms: jax.Array,
    sample_rate: int = 16000,
    num_spec_bins: int = 257,
    num_mel_bins: int = 80,
    lower_edge_freq: float = 125.0,
    upper_edge_freq: float | None = 7600.0,
    eps: float = 1e-6,
) -> jax.Array:
    """Reference `get_log_mel_spectrogram` (audio_processing.py:59-72)."""
    if upper_edge_freq is None:
        upper_edge_freq = sample_rate / 2
    mat = jnp.asarray(
        linear_to_mel_matrix(
            num_mel_bins, num_spec_bins, sample_rate, lower_edge_freq, upper_edge_freq
        )
    )
    mel = jnp.matmul(spectrograms, mat, **_DOT_KW)
    return jnp.log(mel + eps)


@functools.lru_cache(maxsize=None)
def _dct2_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II as (n, n) matmul, scaled by 1/sqrt(2n) like tf.signal."""
    k = np.arange(n, dtype=np.float64)[None, :]
    m = np.arange(n, dtype=np.float64)[:, None]
    mat = 2.0 * np.cos(np.pi * k * (2.0 * m + 1.0) / (2.0 * n))
    return (mat / np.sqrt(2.0 * n)).astype(np.float32)


def mfcc(log_mel_spectrograms: jax.Array, num_mfccs: int = 13) -> jax.Array:
    """Reference `get_mfcc` (audio_processing.py:75-82)."""
    n = log_mel_spectrograms.shape[-1]
    mat = jnp.asarray(_dct2_matrix(n))[:, :num_mfccs]
    return jnp.matmul(log_mel_spectrograms, mat, **_DOT_KW)


def delta(features: jax.Array, N: int = 2) -> jax.Array:
    """Regression deltas, reference `delta` (audio_processing.py:85-94).

    Note the reference re-pads the already-padded tensor on each loop
    iteration (SYMMETRIC), which this reproduces exactly.
    """
    denominator = 2 * sum(i**2 for i in range(1, N + 1))
    out = jnp.zeros_like(features)
    padded = features
    pad = [(0, 0), (1, 1), (0, 0)]
    for i in range(1, N + 1):
        padded = jnp.pad(padded, pad, mode="symmetric")
        out = out + i * (padded[:, i * 2 :, :] - padded[:, : -i * 2, :])
    return out / denominator


def add_delta_features(features: jax.Array, n_delta: int = 2, N: int = 2) -> jax.Array:
    """Reference `add_delta_features` (audio_processing.py:97-104)."""
    full = [features]
    cur = features
    for _ in range(n_delta):
        cur = delta(cur, N)
        full.append(cur)
    return jnp.concatenate(full, axis=2)
