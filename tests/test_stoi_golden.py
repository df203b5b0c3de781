"""Pin `metrics.stoi_eval` to an independent STOI transcription.

The pystoi package (the reference's STOI source, `evaluation.py:10`) is not
installable in this environment, so no recorded pystoi outputs exist to pin
against.  Instead, `_stoi_independent` below is a deliberately literal,
loop-based transcription of the published algorithm (Taal, Hendriks,
Heusdens, Jensen, "An Algorithm for Intelligibility Prediction of
Time-Frequency Weighted Noisy Speech", IEEE TASLP 2011) following pystoi's
public conventions: 10 kHz internals, 256-sample Hann frames with hop 128
and the exclusive `range(0, len-framelen, hop)` frame grid, 40 dB
silent-frame removal on the clean signal with overlap-add restitching,
512-point FFT, 15 one-third-octave bands from 150 Hz with squared-distance
bin-edge rounding, 30-frame segments, -15 dB SDR clipping, and the
correlation average over segments x bands.  The production implementation
(vectorized, in avsi/eval/metrics.py) must agree to float tolerance on
every probe signal, so any refactor that changes the algorithm breaks this
test.
"""

import numpy as np
import pytest
from scipy.signal import resample_poly

from avsi.eval import metrics

EPS = float(np.finfo(np.float64).eps)


# ---------------------------------------------------------------------------
# independent transcription (scalar/loop style, no code shared with metrics)
# ---------------------------------------------------------------------------

def _frames_ref(x):
    w = np.hanning(258)[1:-1]
    out = []
    for start in range(0, len(x) - 256, 128):
        out.append(w * x[start : start + 256])
    return out


def _stoi_independent(x, y, fs):
    if fs != 10000:
        g = np.gcd(int(fs), 10000)
        x = resample_poly(x, 10000 // g, int(fs) // g)
        y = resample_poly(y, 10000 // g, int(fs) // g)

    # silent-frame removal with OLA restitching
    fx = _frames_ref(x)
    fy = _frames_ref(y)
    if not fx:
        return 1e-5
    energies = [20 * np.log10(np.sqrt(np.sum(f**2)) + EPS) for f in fx]
    emax = max(energies)
    kept = [i for i, e in enumerate(energies) if e - emax + 40.0 > 0]
    if not kept:
        return 1e-5
    n_sil = (len(kept) - 1) * 128 + 256
    x_sil = np.zeros(n_sil)
    y_sil = np.zeros(n_sil)
    for j, i in enumerate(kept):
        x_sil[j * 128 : j * 128 + 256] += fx[i]
        y_sil[j * 128 : j * 128 + 256] += fy[i]

    # STFT on the stitched signals
    fx = _frames_ref(x_sil)
    fy = _frames_ref(y_sil)
    if len(fx) < 30:
        return 1e-5
    X = [np.fft.rfft(f, 512) for f in fx]
    Y = [np.fft.rfft(f, 512) for f in fy]

    # one-third-octave band matrix
    f = np.linspace(0, 10000, 513)[:257]
    Xb = np.zeros((len(X), 15))
    Yb = np.zeros((len(Y), 15))
    for k in range(15):
        lo_hz = 150.0 * 2.0 ** ((2 * k - 1) / 6.0)
        hi_hz = 150.0 * 2.0 ** ((2 * k + 1) / 6.0)
        lo = int(np.argmin((f - lo_hz) ** 2))
        hi = int(np.argmin((f - hi_hz) ** 2))
        for m in range(len(X)):
            Xb[m, k] = np.sqrt(np.sum(np.abs(X[m][lo:hi]) ** 2))
            Yb[m, k] = np.sqrt(np.sum(np.abs(Y[m][lo:hi]) ** 2))

    # 30-frame segments, clipping, per-band correlations
    total = 0.0
    n_seg = 0
    clip = 10.0 ** (15.0 / 20.0)
    for m in range(30, len(Xb) + 1):
        n_seg += 1
        for k in range(15):
            xs = Xb[m - 30 : m, k]
            ys = Yb[m - 30 : m, k]
            alpha = np.sqrt(np.sum(xs**2)) / (np.sqrt(np.sum(ys**2)) + EPS)
            yp = np.minimum(ys * alpha, xs * (1 + clip))
            xs = xs - np.mean(xs)
            yp = yp - np.mean(yp)
            xs = xs / (np.sqrt(np.sum(xs**2)) + EPS)
            yp = yp / (np.sqrt(np.sum(yp**2)) + EPS)
            total += float(np.sum(xs * yp))
    return total / (n_seg * 15)


# ---------------------------------------------------------------------------
# probes
# ---------------------------------------------------------------------------

def _speechlike(n, fs, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    env = 0.4 + 0.6 * 0.5 * (1 + np.sin(2 * np.pi * 2.7 * t))
    sig = sum(
        np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6)) / (f0 / 130)
        for f0 in (130, 260, 390, 520, 1040, 2080)
    )
    return env * sig * 4000 + rng.normal(0, 10, n)


PROBES = []
_x16 = _speechlike(32000, 16000, 0)
_rng = np.random.default_rng(42)
PROBES.append(("clean16k", _x16, _x16.copy(), 16000))
PROBES.append(("noisy16k", _x16, _x16 + _rng.normal(0, _x16.std(), _x16.size), 16000))
_gap = _x16.copy()
_gap[8000:20000] = 0
PROBES.append(("gapped16k", _x16, _gap, 16000))
_x10 = _speechlike(25000, 10000, 1)
PROBES.append(("noisy10k", _x10, _x10 + _rng.normal(0, 2 * _x10.std(), _x10.size), 10000))
_sil = _speechlike(30000, 10000, 2)
_sil[:12000] *= 1e-4  # long quiet region exercises silent-frame removal
PROBES.append(("silenthead10k", _sil, _sil + _rng.normal(0, _sil.std(), _sil.size), 10000))
PROBES.append(("random10k", _rng.normal(0, 1000, 20000), _rng.normal(0, 1000, 20000), 10000))


@pytest.mark.parametrize("name,x,y,fs", PROBES, ids=[p[0] for p in PROBES])
def test_production_matches_independent_transcription(name, x, y, fs):
    prod = metrics.stoi_eval(x, y, fs)
    ref = _stoi_independent(x, y, fs)
    assert prod == pytest.approx(ref, abs=1e-10), (name, prod, ref)


def test_band_edges_match_published_layout():
    """First band centred at 150 Hz, 15th at 150*2^(14/3) ~ 3781 Hz."""
    obm = metrics._thirdoct(10000, 512, 15, 150)
    f = np.linspace(0, 10000, 513)[:257]
    first = f[obm[0].astype(bool)]
    last = f[obm[14].astype(bool)]
    assert 130 < first.min() and first.max() < 170
    assert 3350 < last.min() and last.max() < 4260
    # bands are contiguous, non-overlapping
    assert (obm.sum(0) <= 1).all()


def test_known_values_and_ordering():
    x = _speechlike(32000, 16000, 3)
    assert metrics.stoi_eval(x, x, 16000) > 0.999
    rng = np.random.default_rng(5)
    scores = [
        metrics.stoi_eval(x, x + s * x.std() * rng.normal(0, 1, x.size), 16000)
        for s in (0.3, 1.0, 3.0)
    ]
    assert scores[0] > scores[1] > scores[2]
    # all-zero input: every frame survives the relative-energy gate and all
    # correlations are zero (pystoi behavior); the harness maps <=1e-4 to NaN
    assert metrics.stoi_eval(np.zeros(32000), np.zeros(32000), 16000) <= 1e-4
    # too-short input degrades to the 1e-5 sentinel
    assert metrics.stoi_eval(np.zeros(100), np.zeros(100), 16000) == 1e-5
