"""Behavioral anchors for the native P.862 implementation.

No ITU binary or `pesq` package exists in this environment, so the
implementation (avsi/eval/pesq.py) is validated on the published behavior
of the standard rather than bit-parity: identity -> 4.5 raw MOS, level and
small-delay invariance (the algorithm's level/time alignment stages),
monotone degradation under additive white noise matching the published
narrowband MOS-vs-SNR curve, and monotone degradation under amplitude
quantization.  Holes (zeroed gaps) must score below clean but are NOT
required to be monotone in gap size — P.862 explicitly excludes "missing
speech" from its validated scope; STOI carries gap sensitivity in this
protocol (reference evaluation.py:63).
"""

import numpy as np
import pytest

from avsi.eval import metrics
from avsi.eval.pesq import pesq_measure

FS = 16000


@pytest.fixture(scope="module")
def clean():
    rng = np.random.default_rng(0)
    t = np.arange(3 * FS) / FS
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t)) ** 1.5
    x = np.zeros_like(t)
    for f0 in [120, 240, 360, 480, 800, 1200, 2000]:
        x += np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6)) / (f0 / 120)
    return x * env * 6000


def _noisy(clean, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    npow = np.mean(clean**2) / 10 ** (snr_db / 10)
    return clean + rng.normal(0, np.sqrt(npow), clean.shape)


def test_identity_is_ceiling(clean):
    raw, lqo = pesq_measure(clean, clean)
    assert raw == pytest.approx(4.5)
    assert 4.3 < lqo < 4.7


def test_gain_invariance(clean):
    assert pesq_measure(clean, clean * 4.0)[0] == pytest.approx(4.5)
    assert pesq_measure(clean, clean * 0.25)[0] == pytest.approx(4.5)


def test_small_delay_invariance(clean):
    shifted = np.concatenate([np.zeros(100), clean[:-100]])
    assert pesq_measure(clean, shifted)[0] > 4.4


def test_white_noise_curve_matches_published_shape(clean):
    raws = [pesq_measure(clean, _noisy(clean, snr))[0] for snr in (40, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(raws, raws[1:])), raws  # strictly monotone
    r40, r30, r20, r10, r0 = raws
    assert 3.7 < r40 <= 4.5
    assert 3.1 < r30 < 4.1
    assert 2.4 < r20 < 3.5
    assert 1.6 < r10 < 2.8
    assert r0 < 2.1


def test_quantization_monotone(clean):
    raws = []
    for bits in (12, 8, 6, 4):
        q = np.round(clean / 32768 * 2 ** (bits - 1)) * 32768 / 2 ** (bits - 1)
        raws.append(pesq_measure(clean, q)[0])
    assert all(a > b for a, b in zip(raws, raws[1:])), raws
    assert raws[0] > 4.2 and raws[-1] < 2.0


def test_zeroed_gap_scores_below_clean(clean):
    masked = clean.copy()
    masked[FS : FS + int(0.8 * FS)] = 0
    raw, _ = pesq_measure(clean, masked)
    assert 1.5 < raw < 4.2


def test_range_and_wb_mode(clean):
    raw, lqo = pesq_measure(clean, _noisy(clean, -5), mode="nb")
    assert -0.5 <= raw <= 4.5 and 1.0 <= lqo <= 5.0
    raw_wb, lqo_wb = pesq_measure(clean, clean, mode="wb")
    assert raw_wb == pytest.approx(4.5)
    assert 4.5 < lqo_wb < 4.8


def test_metrics_pesq_eval_native_dispatch(clean, tmp_path):
    from avsi.utils import wav as wavio

    ref = tmp_path / "ref.wav"
    deg = tmp_path / "deg.wav"
    wavio.write_wav_int16(str(ref), clean, FS)
    wavio.write_wav_int16(str(deg), _noisy(clean, 20), FS)
    mos, lqo = metrics.pesq_eval(str(ref), str(deg), None, "nb")
    assert 2.0 < mos < 3.8 and 1.5 < lqo < 4.0
    wb_lqo, none = metrics.pesq_eval(str(ref), str(deg), None, "wb")
    assert none is None and 1.5 < wb_lqo < 4.5
    # missing file degrades to NaN, like the reference's failed subprocess
    mos, lqo = metrics.pesq_eval(str(ref), str(tmp_path / "nope.wav"), None, "nb")
    assert np.isnan(mos) and np.isnan(lqo)


def test_xcorr_matches_direct_sums():
    """_xcorr (lag-bounded circular FFT) must equal the direct correlation
    sums it replaced, for every lag in range, incl. negative lags and
    zero-padding outside the support."""
    import numpy as np

    from avsi.eval import pesq as P

    rng = np.random.default_rng(3)
    for la, lv, lo, hi in ((300, 300, -80, 80), (500, 120, 0, 128),
                           (120, 500, -40, 10), (64, 64, -63, 63)):
        a = rng.standard_normal(la)
        v = rng.standard_normal(lv)
        got = P._xcorr(a, v, lo, hi)
        want = []
        for d in range(lo, hi + 1):
            s = 0.0
            for i in range(lv):
                j = i + d
                if 0 <= j < la:
                    s += v[i] * a[j]
            want.append(s)
        np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=1e-9)


def test_estimate_delay_short_overlap_lags_never_compete():
    """Lags whose overlap is under 100 ms were SKIPPED by the original
    scalar search; the vectorized search must preserve that (a zero-energy
    long-overlap lag still competes at v=0)."""
    import numpy as np

    from avsi.eval import pesq as P

    fs = 16000
    rng = np.random.default_rng(5)
    t = np.arange(2 * fs) / fs
    x = (np.sin(2 * np.pi * 170 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
         + 0.1 * rng.standard_normal(2 * fs)) * 3000
    d = P._estimate_delay(x, np.roll(x, 1234))
    assert d == 1234
    d = P._estimate_delay(x, np.roll(x, -2345))
    assert d == -2345
