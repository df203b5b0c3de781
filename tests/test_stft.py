"""Golden-value tests: avsi.ops.stft vs tf.signal (the reference DSP).

The reference fuses tf.contrib.signal STFT/iSTFT into every model graph
(audio_processing.py:25-42,145-164); these tests pin our matmul-DFT
implementation to the exact TF semantics, including pad_end framing and
inverse_stft_window_fn COLA normalization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsi.ops import stft as avstft

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(0)
    return (rng.randn(3, 48000) * 0.1).astype(np.float32)


# third config: a standard 25 ms/10 ms hop where frame_length is NOT a
# multiple of frame_step (exercises the general synthesis-window fold)
CONFIGS = [(384, 192, 512), (256, 128, 256), (400, 160, 512)]


@pytest.mark.parametrize("fl,fs,nfft", CONFIGS)
def test_stft_matches_tf(wave, fl, fs, nfft):
    got = np.asarray(avstft.stft(wave, fl, fs, nfft))
    want = tf.signal.stft(
        wave, fft_length=nfft, frame_length=fl, frame_step=fs, pad_end=True
    ).numpy()
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("fl,fs,nfft", CONFIGS)
def test_istft_matches_tf(wave, fl, fs, nfft):
    spec = tf.signal.stft(
        wave, fft_length=nfft, frame_length=fl, frame_step=fs, pad_end=True
    ).numpy()
    got = np.asarray(avstft.istft(spec, fl, fs, nfft))
    want = tf.signal.inverse_stft(
        spec,
        frame_length=fl,
        frame_step=fs,
        window_fn=tf.signal.inverse_stft_window_fn(fs),
    ).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=0)


def test_log_spectrogram_mae(wave):
    """North-star target: <1e-3 log-spec MAE vs the TF reference chain."""
    s = tf.signal.stft(wave, fft_length=512, frame_length=384, frame_step=192, pad_end=True)
    want = np.log(np.abs(s.numpy()) + 1e-6)
    got, _, _ = avstft.log_magnitude_spectrogram(wave)
    mae = np.abs(np.asarray(got) - want).mean()
    assert mae < 1e-3, mae


def test_roundtrip_reconstruction(wave):
    """STFT -> iSTFT must reconstruct the interior of the signal exactly."""
    spec = avstft.stft(wave)
    rec = np.asarray(avstft.istft(spec, num_samples=48000))
    # first frame_length - frame_step samples lack full overlap coverage
    np.testing.assert_allclose(rec[:, 192:47800], wave[:, 192:47800], atol=1e-4)


def test_waveform_from_mag_phase(wave):
    re, im = avstft.stft_real_imag(wave)
    mag = np.hypot(np.asarray(re), np.asarray(im))
    phase = np.arctan2(np.asarray(im), np.asarray(re))
    rec = np.asarray(avstft.waveform_from_mag_phase(jnp.asarray(mag), jnp.asarray(phase)))
    assert rec.shape == (3, 48000)
    np.testing.assert_allclose(rec[:, 192:47800], wave[:, 192:47800], atol=1e-4)


def test_jit_and_grad():
    """The DSP chain must be jittable and differentiable (it sits inside the
    training step, as in reference models.py:30-35)."""
    x = jnp.ones((2, 48000)) * 0.01

    @jax.jit
    def loss(x):
        logmag, _, _ = avstft.log_magnitude_spectrogram(x)
        return jnp.mean(logmag)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_preemphasis_matches_reference_semantics():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 100).astype(np.float32))
    y = np.asarray(avstft.preemphasis(x, 0.95))
    xn = np.asarray(x)
    want = xn - 0.95 * np.concatenate([np.zeros((2, 1)), xn[:, :-1]], axis=1)
    np.testing.assert_allclose(y, want, atol=1e-6)


def test_waveform_from_mag_complex_equals_mag_phase():
    """The phase-free resynthesis (normalize the complex pair) must equal
    the arctan2 -> cos/sin path bin for bin — including zero bins, where
    arctan2(0, 0) = 0 means (cos, sin) = (1, 0)."""
    import jax.numpy as jnp

    from avsi.ops import stft as stft_ops

    rng = np.random.RandomState(11)
    b, t, f = 2, 12, 257
    re = rng.randn(b, t, f).astype(np.float32) * 100
    im = rng.randn(b, t, f).astype(np.float32) * 100
    mag = np.abs(rng.randn(b, t, f)).astype(np.float32) * 50
    # zero out a frame block via MULTIPLICATION (the masked-hole phase
    # convention): signed zeros survive, and arctan2(+-0, -0.0) = +-pi
    # flips those bins to -mag — the complex path must reproduce it
    re[:, 4:7] *= 0.0
    im[:, 4:7] *= 0.0
    assert np.signbit(re[:, 4:7]).any()  # the hostile case is present
    n = (t - 1) * 192 + 384
    ref = stft_ops.waveform_from_mag_phase(
        jnp.asarray(mag), jnp.arctan2(jnp.asarray(im), jnp.asarray(re)),
        num_samples=n, frame_length=384, frame_step=192, fft_length=512,
    )
    got = stft_ops.waveform_from_mag_complex(
        jnp.asarray(mag), jnp.asarray(re), jnp.asarray(im),
        num_samples=n, frame_length=384, frame_step=192, fft_length=512,
    )
    scale = np.abs(np.asarray(ref)).max() + 1e-9
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * scale, rtol=0
    )
