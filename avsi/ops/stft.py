"""TPU-native STFT / iSTFT and spectrogram ops.

Semantics match the reference's TF1 DSP chain
(`/root/reference/av_speech_inpainting/audio_processing.py:25-164`):

  * `tf.contrib.signal.stft(pad_end=True)` framing: ``num_frames =
    ceil(n / frame_step)``, zero-padded at the end, periodic Hann analysis
    window, frames right-padded to ``fft_length`` before the DFT;
  * `tf.contrib.signal.inverse_stft` with
    ``inverse_stft_window_fn(frame_step)``: per-frame iDFT truncated to
    ``frame_length``, multiplied by the COLA-normalized synthesis window,
    then overlap-added.

Implementation is TPU-first: the windowed DFT and the windowed iDFT are
single real matmuls against precomputed ``(frame_length, 2*num_bins)`` /
``(2*num_bins, frame_length)`` matrices, so the whole transform runs on the
MXU and XLA fuses the surrounding elementwise work (log, masking,
normalization) into it.  Framing uses a reshape+concat (zero gathers) when
``frame_length == 2 * frame_step`` — true for both reference configs
(384/192 and 256/128) — with a static-gather fallback otherwise.

Golden-tested against `tf.signal` in tests/test_stft.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# DFT/iDFT matmul precision: HIGH = bf16_3x on TPU (f32 everywhere else —
# CPU ignores the flag, so the golden tests vs tf.signal are untouched).
# Measured r5 on v5e at the flagship shape: HIGHEST -> HIGH saves
# 0.70 ms/batch (-14% end-to-end inference) at 1.4e-5 RELATIVE STFT error
# — two orders below the <1e-3 front-end parity target and below int16
# quantization (3e-5 of full scale) on the reconstruction side.
_DOT_KW = dict(precision=jax.lax.Precision.HIGH, preferred_element_type=jnp.float32)


def hann_window(length: int, dtype=np.float64) -> np.ndarray:
    """Periodic Hann window, identical to tf.signal.hann_window(periodic=True)."""
    n = np.arange(length, dtype=dtype)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / length)


def num_frames_pad_end(num_samples: int, frame_step: int) -> int:
    """Frame count for pad_end=True framing (48000/192 -> 250)."""
    return -(-num_samples // frame_step)


def frame_signal(x: jax.Array, frame_length: int, frame_step: int) -> jax.Array:
    """Frame ``x`` (..., n) into (..., num_frames, frame_length), pad_end=True."""
    n = x.shape[-1]
    nf = num_frames_pad_end(n, frame_step)
    if frame_length == 2 * frame_step:
        # padded length = (nf - 1)*step + 2*step = (nf + 1) * step: pure reshape.
        pad = (nf + 1) * frame_step - n
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        segs = xp.reshape(x.shape[:-1] + (nf + 1, frame_step))
        return jnp.concatenate([segs[..., :-1, :], segs[..., 1:, :]], axis=-1)
    pad = max(0, (nf - 1) * frame_step + frame_length - n)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    idx = np.arange(nf)[:, None] * frame_step + np.arange(frame_length)[None, :]
    return xp[..., idx]


@functools.lru_cache(maxsize=None)
def _dft_matrix(frame_length: int, fft_length: int) -> np.ndarray:
    """(frame_length, 2*num_bins) windowed real-DFT matrix: [Re | Im] halves."""
    num_bins = fft_length // 2 + 1
    w = hann_window(frame_length)
    k = np.arange(frame_length, dtype=np.float64)[:, None]
    j = np.arange(num_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * j / fft_length
    re = w[:, None] * np.cos(ang)
    im = -w[:, None] * np.sin(ang)
    return np.concatenate([re, im], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _synthesis_window(frame_length: int, frame_step: int) -> np.ndarray:
    """tf.signal.inverse_stft_window_fn: fw / (overlapped sum of fw^2).

    Matches TF for any (frame_length, frame_step) pair, including
    non-divisible hops (e.g. 400/160): the squared window is zero-padded
    to a whole number of hops before folding.  Degenerate non-COLA
    configs (frame_step == frame_length with a Hann window) divide by
    zero at the window zeros exactly as TF does.
    """
    fw = hann_window(frame_length)
    overlaps = -(-frame_length // frame_step)
    denom = np.pad(fw**2, (0, overlaps * frame_step - frame_length))
    denom = denom.reshape(overlaps, frame_step).sum(axis=0)
    denom = np.tile(denom, overlaps)[:frame_length]
    return (fw / denom).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _idft_matrix(frame_length: int, fft_length: int, frame_step: int) -> np.ndarray:
    """(2*num_bins, frame_length) windowed inverse-rDFT matrix.

    Folds the 1/N iDFT scaling, hermitian doubling, truncation to
    frame_length, and the COLA synthesis window into one matrix.
    """
    num_bins = fft_length // 2 + 1
    sw = _synthesis_window(frame_length, frame_step)
    j = np.arange(num_bins, dtype=np.float64)[:, None]
    k = np.arange(frame_length, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j * k / fft_length
    c = np.full((num_bins, 1), 2.0)
    c[0, 0] = 1.0
    if fft_length % 2 == 0:
        c[-1, 0] = 1.0
    re = c * np.cos(ang) / fft_length * sw[None, :]
    im = -c * np.sin(ang) / fft_length * sw[None, :]
    return np.concatenate([re, im], axis=0).astype(np.float32)


def stft_real_imag(
    x: jax.Array,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """STFT as one MXU matmul. Returns (re, im), each (..., num_frames, bins)."""
    frames = frame_signal(x.astype(jnp.float32), frame_length, frame_step)
    mat = jnp.asarray(_dft_matrix(frame_length, fft_length))
    out = jnp.matmul(frames, mat, **_DOT_KW)
    num_bins = fft_length // 2 + 1
    return out[..., :num_bins], out[..., num_bins:]


def stft(
    x: jax.Array,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
) -> jax.Array:
    """Complex STFT (reference `get_stft`, audio_processing.py:25-42).

    Defaults are the inpainting config: 24 ms window / 12 ms hop @16 kHz,
    n_fft=512 -> (B, 250, 257) for 48 000-sample utterances.
    """
    re, im = stft_real_imag(x, frame_length, frame_step, fft_length)
    return jax.lax.complex(re, im)


def magnitude(re: jax.Array, im: jax.Array, eps: float = 0.0) -> jax.Array:
    return jnp.sqrt(re * re + im * im + eps)


def spectrogram(
    stfts: jax.Array, power: float = 1.0, log: bool = False, eps: float = 1e-6
) -> jax.Array:
    """Reference `get_spectrogram` (audio_processing.py:45-56)."""
    spec = jnp.abs(stfts)
    if power != 1:
        spec = spec**power
    if log:
        spec = jnp.log(spec + eps)
    return spec


def log_magnitude_spectrogram(
    x: jax.Array,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused wave -> (log|X|, re, im); the model front-end hot path."""
    re, im = stft_real_imag(x, frame_length, frame_step, fft_length)
    return jnp.log(magnitude(re, im) + eps), re, im


def overlap_add(frames: jax.Array, frame_step: int, num_samples: int) -> jax.Array:
    """Overlap-add (..., num_frames, frame_length) -> (..., num_samples)."""
    nf, fl = frames.shape[-2], frames.shape[-1]
    if fl == 2 * frame_step:
        first, second = frames[..., :frame_step], frames[..., frame_step:]
        zpad = [(0, 0)] * (frames.ndim - 2)
        ola = jnp.pad(first, zpad + [(0, 1), (0, 0)]) + jnp.pad(
            second, zpad + [(1, 0), (0, 0)]
        )
        out = ola.reshape(frames.shape[:-2] + ((nf + 1) * frame_step,))
        return out[..., :num_samples]
    total = (nf - 1) * frame_step + fl
    out = jnp.zeros(frames.shape[:-2] + (total,), frames.dtype)
    idx = np.arange(nf)[:, None] * frame_step + np.arange(fl)[None, :]
    out = out.at[..., idx].add(frames)
    return out[..., :num_samples]


def istft_real_imag(
    re: jax.Array,
    im: jax.Array,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
    num_samples: int = 0,
) -> jax.Array:
    """Inverse STFT (reference `reconstruct_sources`, audio_processing.py:145-157)."""
    mat = jnp.asarray(_idft_matrix(frame_length, fft_length, frame_step))
    coeffs = jnp.concatenate([re.astype(jnp.float32), im.astype(jnp.float32)], axis=-1)
    frames = jnp.matmul(coeffs, mat, **_DOT_KW)
    nf = re.shape[-2]
    total = (nf - 1) * frame_step + frame_length
    return overlap_add(frames, frame_step, num_samples if num_samples > 0 else total)


def istft(
    stfts: jax.Array,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
    num_samples: int = 0,
) -> jax.Array:
    return istft_real_imag(
        jnp.real(stfts), jnp.imag(stfts), frame_length, frame_step, fft_length, num_samples
    )


def waveform_from_mag_phase(
    mag: jax.Array,
    phase: jax.Array,
    num_samples: int = 48000,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
) -> jax.Array:
    """Reference `get_sources` (audio_processing.py:160-164): |X|,ang -> wave."""
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    return istft_real_imag(re, im, frame_length, frame_step, fft_length, num_samples)


def waveform_from_mag_complex(
    mag: jax.Array,
    re: jax.Array,
    im: jax.Array,
    num_samples: int = 48000,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
) -> jax.Array:
    """`waveform_from_mag_phase(mag, arctan2(im, re))` without the
    transcendental round-trip: the phase term only ever re-enters as
    (cos, sin) = (re, im)/|z|, so normalize the complex pair directly —
    one rsqrt per bin instead of arctan2 + cos + sin (three VPU
    transcendentals over B*T*F bins on the resynthesis hot path).
    Zero bins (|z| == 0, e.g. masked hole phase where re = im = +-0.0)
    reproduce IEEE arctan2 exactly — including the signed-zero case the
    reference convention quietly depends on: re * mask keeps re's SIGN in
    the zero, and arctan2(+-0, -0.0) = +-pi, so hole bins whose original
    real part was negative resynthesize with cos = -1 (i.e. -mag), not
    +mag.  (Caught by the streaming-vs-offline equivalence suite when a
    first version mapped every zero bin to angle 0.)"""
    p2 = re * re + im * im
    # rsqrt on the UNCLAMPED power (the discarded p2 == 0 lane yields inf,
    # masked by the where): a lower clamp would under-normalize subnormal
    # |z|^2 toward zero output where arctan2 still recovers the angle
    inv = jnp.where(p2 > 0.0, jax.lax.rsqrt(p2), 0.0)
    zero_c = jnp.where(jnp.signbit(re), -1.0, 1.0)
    c = jnp.where(p2 > 0.0, re * inv, zero_c)
    s = im * inv
    return istft_real_imag(
        mag * c, mag * s, frame_length, frame_step, fft_length, num_samples
    )


def preemphasis(x: jax.Array, alpha: float = 0.95) -> jax.Array:
    """Reference `preemphasis` (audio_processing.py:19-22)."""
    shifted = jnp.pad(x[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    return x - alpha * shifted
