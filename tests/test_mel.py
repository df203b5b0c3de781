"""Golden tests: mel filterbank / MFCC / deltas vs tf.signal.

Pins avsi.ops.mel to the reference ASR front-end semantics
(audio_processing.py:59-104): HTK mel (125-7600 Hz, 80 bins), DCT-II MFCC
with 1/sqrt(2N) scaling, and the reference's exact (re-padding) delta
recursion.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from avsi.ops import mel as avmel
from avsi.ops import stft as avstft

tf = pytest.importorskip("tensorflow")


def test_mel_matrix_matches_tf():
    got = avmel.linear_to_mel_matrix(80, 257, 16000, 125.0, 7600.0)
    want = tf.signal.linear_to_mel_weight_matrix(80, 257, 16000, 125.0, 7600.0).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_log_mel_chain_mae():
    rng = np.random.RandomState(0)
    wave = (rng.randn(2, 48000) * 0.1).astype(np.float32)
    s = tf.signal.stft(wave, fft_length=512, frame_length=384, frame_step=192, pad_end=True)
    pow_spec = tf.abs(s) ** 2
    m = tf.signal.linear_to_mel_weight_matrix(80, 257, 16000, 125.0, 7600.0)
    want = tf.math.log(tf.tensordot(pow_spec, m, axes=1) + 1e-6).numpy()

    re, im = avstft.stft_real_imag(wave)
    got = np.asarray(avmel.log_mel_spectrogram(np.asarray(re) ** 2 + np.asarray(im) ** 2))
    mae = np.abs(got - want).mean()
    assert mae < 1e-3, mae


def test_mfcc_matches_tf():
    rng = np.random.RandomState(1)
    log_mel = rng.randn(2, 50, 80).astype(np.float32)
    want = tf.signal.mfccs_from_log_mel_spectrograms(log_mel).numpy()[..., :13]
    got = np.asarray(avmel.mfcc(jnp.asarray(log_mel), 13))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_delta_matches_reference_formula():
    """Reproduce audio_processing.delta with numpy (incl. re-padding quirk)."""
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 20, 5).astype(np.float32)

    def ref_delta(features, N=2):
        denominator = 2 * sum(i**2 for i in range(1, N + 1))
        out = np.zeros_like(features)
        padded = features
        for i in range(1, N + 1):
            padded = np.pad(padded, [(0, 0), (1, 1), (0, 0)], mode="symmetric")
            out = out + i * (padded[:, i * 2 :, :] - padded[:, : -i * 2, :])
        return out / denominator

    got = np.asarray(avmel.delta(jnp.asarray(feats)))
    np.testing.assert_allclose(got, ref_delta(feats), atol=1e-5)

    got2 = np.asarray(avmel.add_delta_features(jnp.asarray(feats), n_delta=2))
    assert got2.shape == (2, 20, 15)
    np.testing.assert_allclose(got2[..., :5], feats, atol=0)
    np.testing.assert_allclose(got2[..., 5:10], ref_delta(feats), atol=1e-5)
