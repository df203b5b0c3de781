"""Tests for Griffin-Lim phase reconstruction and the native eval metrics."""

import numpy as np
import pytest

import jax.numpy as jnp

from avsi.eval import metrics
from avsi.ops import phase as phase_ops
from avsi.ops import stft as stft_ops


def _speechlike(n=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t)
    sig = sum(np.sin(2 * np.pi * 120 * k * t + rng.rand() * 6) / k for k in range(1, 6))
    return (3000 * env * sig + 20 * rng.randn(n)).astype(np.float32)


class TestGriffinLim:
    def test_improves_spectral_consistency_in_hole(self):
        """Success metric is spectral consistency: |STFT(x_rec)| must match
        the intended magnitude in the hole far better than the masked-phase
        baseline (waveform L1 is meaningless under phase shifts)."""
        wave = _speechlike()[None]
        re, im = stft_ops.stft_real_imag(wave)
        re, im = np.asarray(re), np.asarray(im)
        t, f = re.shape[1], re.shape[2]
        mask = np.ones((1, t, f), np.float32)
        mask[:, 30:45] = 0.0  # 15-frame hole
        mag = np.hypot(re, im)
        known_phase = np.arctan2(im, re)

        def hole_spec_err(x):
            r2, i2 = stft_ops.stft_real_imag(jnp.asarray(x))
            m2 = np.hypot(np.asarray(r2)[:, :t, :f], np.asarray(i2)[:, :t, :f])
            return float((np.abs(m2 - mag) * (1 - mask)).sum() / (1 - mask).sum())

        base = np.asarray(
            stft_ops.waveform_from_mag_phase(
                jnp.asarray(mag), jnp.asarray(known_phase * mask), num_samples=16000
            )
        )
        gl = np.asarray(
            phase_ops.griffin_lim_blend(
                jnp.asarray(mag), jnp.asarray(known_phase), jnp.asarray(mask),
                num_samples=16000, n_iters=40,
            )
        )
        err_base = hole_spec_err(base)
        err_gl = hole_spec_err(gl)
        assert err_gl < 0.25 * err_base, (err_gl, err_base)

    def test_extrapolate_recovers_stationary_tone(self):
        """A steady sinusoid's phase advances linearly per hop, so the
        phase-vocoder extrapolation should recover the hole phase almost
        exactly (no GL iterations at all)."""
        n = 16000
        t = np.arange(n) / 16000.0
        wave = (3000 * np.sin(2 * np.pi * 847.0 * t)).astype(np.float32)[None]
        re, im = stft_ops.stft_real_imag(wave)
        tt, f = re.shape[1], re.shape[2]
        mask = np.ones((1, tt, f), np.float32)
        mask[:, 30:45] = 0.0
        mag = np.hypot(np.asarray(re), np.asarray(im))
        true_phase = np.asarray(jnp.arctan2(im, re))
        est = np.asarray(
            phase_ops.extrapolate_phase(
                jnp.asarray(true_phase * mask), jnp.asarray(mask)
            )
        )
        # compare on the circle, weighted by magnitude (phase of near-zero
        # bins is noise), hole frames only
        w = mag[:, 30:45]
        err = np.abs(
            (est[:, 30:45] - true_phase[:, 30:45] + np.pi) % (2 * np.pi) - np.pi
        )
        werr = float((err * w).sum() / w.sum())
        assert werr < 0.15, werr  # radians; zero-init would be ~pi/2

    def test_extrapolate_boundary_gaps_use_nominal_advance(self):
        """Gaps touching the sequence boundary: frame 0 (resp. T-1) has no
        genuine previous (next) frame, so the degenerate self-pair there
        must NOT be taken as an advance measurement — a gap starting at
        frame 1 (ending at T-2) is continued with the bin's nominal hop
        advance omega, not a frozen phase (regression: the self-pair
        'measured' ~0 mod 2pi and froze the fill)."""
        t, f = 8, 4
        hop, n_fft = 192, 512
        omega = 2 * np.pi * np.arange(f) * hop / n_fft
        rng = np.random.RandomState(0)
        phase = np.tile(rng.uniform(-np.pi, np.pi, (1, 1, f)), (1, t, 1))

        # gap at frames 1..3: frames 1,2 are nearest the LEFT boundary
        # (frame 0), whose only available advance is the nominal omega
        mask = np.ones((1, t, f), np.float32)
        mask[:, 1:4] = 0.0
        est = np.asarray(
            phase_ops.extrapolate_phase(
                jnp.asarray(phase * mask, jnp.float32), jnp.asarray(mask), hop, n_fft
            )
        )
        for k in range(1, 3):  # frame 0 + k*omega, on the circle
            want = phase[0, 0] + k * omega
            err = np.abs((est[0, k] - want + np.pi) % (2 * np.pi) - np.pi)
            assert err.max() < 1e-4, (k, err)

        # gap at frames 4..6: frame 6 is strictly nearest the RIGHT
        # boundary (frame 7) — mirror case for the backward scan (frame 5
        # ties in distance and goes to the left extrapolation, which has
        # genuine in-segment measurements, so it is not asserted here)
        mask2 = np.ones((1, t, f), np.float32)
        mask2[:, 4:7] = 0.0
        est2 = np.asarray(
            phase_ops.extrapolate_phase(
                jnp.asarray(phase * mask2, jnp.float32), jnp.asarray(mask2), hop, n_fft
            )
        )
        want = phase[0, 0] - omega  # frame 7 - omega
        err = np.abs((est2[0, 6] - want + np.pi) % (2 * np.pi) - np.pi)
        assert err.max() < 1e-4, err

    def test_extrapolate_edge_holes_use_the_genuine_boundary(self):
        """A hole that INCLUDES frame 0 (resp. T-1) has only one genuine
        boundary; every hole frame must extrapolate from it, not from the
        synthetic zero-phase anchor the scan starts with on the edgeless
        side (regression: distance counters started at 0, so the front
        half of a leading hole took the uninformed left fill, error ~pi)."""
        t, f = 10, 4
        hop, n_fft = 192, 512
        omega = 2 * np.pi * np.arange(f) * hop / n_fft
        rng = np.random.RandomState(1)
        base = rng.uniform(-np.pi, np.pi, (1, 1, f))
        # constant-advance signal so the continuation is exactly linear
        phase = base + omega * np.arange(t)[None, :, None]

        # leading hole at frames 0..5; first known frame is 6
        mask = np.ones((1, t, f), np.float32)
        mask[:, :6] = 0.0
        est = np.asarray(
            phase_ops.extrapolate_phase(
                jnp.asarray(phase * mask, jnp.float32), jnp.asarray(mask), hop, n_fft
            )
        )
        for k in range(6):  # frame 6 - (6-k)*omega, on the circle
            want = phase[0, 6] - (6 - k) * omega
            err = np.abs((est[0, k] - want + np.pi) % (2 * np.pi) - np.pi)
            assert err.max() < 1e-4, (k, err)

        # trailing hole at frames 4..9; last known frame is 3
        mask2 = np.ones((1, t, f), np.float32)
        mask2[:, 4:] = 0.0
        est2 = np.asarray(
            phase_ops.extrapolate_phase(
                jnp.asarray(phase * mask2, jnp.float32), jnp.asarray(mask2), hop, n_fft
            )
        )
        for k in range(4, t):
            want = phase[0, 3] + (k - 3) * omega
            err = np.abs((est2[0, k] - want + np.pi) % (2 * np.pi) - np.pi)
            assert err.max() < 1e-4, (k, err)

    def test_extrapolate_passes_known_bins_through(self):
        wave = _speechlike(seed=3)[None]
        re, im = stft_ops.stft_real_imag(wave)
        tt, f = re.shape[1], re.shape[2]
        mask = np.ones((1, tt, f), np.float32)
        mask[:, 20:60] = 0.0
        phase = jnp.arctan2(im, re)
        est = np.asarray(phase_ops.extrapolate_phase(phase * mask, jnp.asarray(mask)))
        np.testing.assert_allclose(
            est * np.asarray(mask), np.asarray(phase * mask), atol=1e-6
        )

    def test_extrapolate_init_beats_zero_init(self):
        """At equal GL iterations the extrapolation init must land closer to
        the true waveform in the hole (same success metric as the phase-only
        study: spectral consistency is met by both, so compare waveform
        correlation with the target inside the gap)."""
        wave = _speechlike(seed=7)[None]
        re, im = stft_ops.stft_real_imag(wave)
        tt, f = re.shape[1], re.shape[2]
        mask = np.ones((1, tt, f), np.float32)
        mask[:, 30:55] = 0.0  # 25-frame hole (~300 ms)
        mag = jnp.hypot(re, im)
        phase = jnp.arctan2(im, re)

        def corr(x):
            seg = slice(30 * 192, 55 * 192)
            a, b = np.asarray(x)[0, seg], wave[0, seg]
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

        out = {
            k: corr(
                phase_ops.griffin_lim_blend(
                    mag, phase, jnp.asarray(mask), 16000, n_iters=10, init=k
                )
            )
            for k in ("extrapolate", "zero")
        }
        assert out["extrapolate"] > out["zero"] + 0.05, out

    def test_hole_mag_relax(self):
        """hole_mag_relax=0 must be bit-identical to the classic clamped GL
        (the knob is opt-in); relax>0 must (a) return finite audio, (b) keep
        the known region intact, and (c) move |STFT| in the hole away from
        the clamped magnitudes (the drift it is documented to introduce)."""
        wave = _speechlike(seed=11)[None]
        re, im = stft_ops.stft_real_imag(wave)
        t, f = re.shape[1], re.shape[2]
        mask = np.ones((1, t, f), np.float32)
        mask[:, 30:45] = 0.0
        mag = jnp.hypot(re, im)
        phase = jnp.arctan2(im, re)
        kw = dict(num_samples=16000, n_iters=10)
        base = np.asarray(
            phase_ops.griffin_lim_blend(mag, phase, jnp.asarray(mask), **kw)
        )
        off = np.asarray(
            phase_ops.griffin_lim_blend(
                mag, phase, jnp.asarray(mask), hole_mag_relax=0.0, **kw
            )
        )
        np.testing.assert_array_equal(base, off)
        rel = np.asarray(
            phase_ops.griffin_lim_blend(
                mag, phase, jnp.asarray(mask), hole_mag_relax=0.3, **kw
            )
        )
        assert np.isfinite(rel).all()
        assert not np.array_equal(rel, base)
        # known region still reconstructs the original closely
        seg = slice(5 * 192, 25 * 192)
        err = np.abs(rel[0, seg] - wave[0, seg]).mean() / np.abs(wave[0, seg]).mean()
        assert err < 0.05, err

    def test_preserves_known_region(self):
        wave = _speechlike(seed=1)[None]
        re, im = stft_ops.stft_real_imag(wave)
        t, f = re.shape[1], re.shape[2]
        mask = np.ones((1, t, f), np.float32)
        mask[:, 40:50] = 0.0
        mag = jnp.hypot(re, im)
        phase = jnp.arctan2(im, re)
        gl = np.asarray(
            phase_ops.griffin_lim_blend(mag, phase, jnp.asarray(mask), 16000, n_iters=10)
        )
        # far from the hole, reconstruction matches the original closely
        seg = slice(5 * 192, 30 * 192)
        rel = np.abs(gl[0, seg] - wave[0, seg]).mean() / np.abs(wave[0, seg]).mean()
        assert rel < 0.05, rel


class TestMetrics:
    def test_l1_zero_for_identical(self):
        x = _speechlike()
        assert metrics.l1_eval(x, x) == 0.0
        assert metrics.l2_eval(x, x) == 0.0
        assert metrics.l1_eval(x, x + 500) > 0

    def test_sisdr(self):
        x = _speechlike()
        assert metrics.sisdr_eval(x, x) > 60
        assert metrics.sisdr_eval(x, x * 0.5) > 60  # scale-invariant
        noisy = x + 0.5 * x.std() * np.random.RandomState(0).randn(len(x))
        v = metrics.sisdr_eval(x, noisy)
        assert 0 < v < 20

    def test_sdr(self):
        x = _speechlike()
        assert metrics.sdr_eval(x, x) > 40
        noisy = x + x.std() * np.random.RandomState(0).randn(len(x))
        assert metrics.sdr_eval(x, noisy) < 10
        assert np.isnan(metrics.sdr_eval(x, np.zeros_like(x)))
        # allowed distortion: a small delay-filter should barely hurt SDR
        delayed = np.roll(x, 3)
        assert metrics.sdr_eval(x, delayed) > 30

    def test_stoi(self):
        x = _speechlike(n=32000)
        self_score = metrics.stoi_eval(x, x, 16000)
        assert self_score > 0.99
        noise = x.std() * np.random.RandomState(1).randn(len(x))
        noisy_score = metrics.stoi_eval(x, x + 3 * noise, 16000)
        assert noisy_score < self_score - 0.1
        # zeroed gap reduces intelligibility
        gapped = x.copy()
        gapped[8000:20000] = 0
        assert metrics.stoi_eval(x, gapped, 16000) < self_score

    def test_pesq_graceful_without_binary(self):
        mos, lqo = metrics.pesq_eval("a.wav", "b.wav", "/nonexistent/pesq")
        assert np.isnan(mos)
