"""Pin `avsi.eval.pesq` to an independent transcription (the
`test_stoi_golden.py` pattern, VERDICT r2 item #4).

The ITU PESQ binary (the reference's scorer, `eval_metrics.py:77-96`) is
not available here, so absolute-MOS agreement cannot be asserted against
it.  What CAN be pinned is the implementation itself: `_pesq_independent`
below is a deliberately literal, loop-based second transcription of the
exact perceptual model `avsi/eval/pesq.py` documents (P.862 pipeline with
the documented deviation: analytic Traunmüller/Terhardt Bark layout; the
independent transcription keeps a single global delay, which production's
split_align reduces to bit-identically on constant-delay material).  The
production implementation (vectorized) must agree to float tolerance on
every constant-delay probe — including shifted and MNRU-style
degradations — so a refactor that silently drifts MOS by more than ~1e-4
(let alone the 0.05 the round-2 verdict worried about) fails here.
Piecewise-delay probes (delay CHANGES mid-utterance) additionally pin the
split_align stage: production must recover most of the MOS the
global-only transcription loses.

Validity scope (also stated in BASELINE.md): within-protocol deltas
(PESQi) and cross-model comparisons are meaningful; absolute MOS values
are calibrated to published P.862 narrowband behavior via one fitted gain
(pesq.py:_SL_16K); absolute calibration vs the ITU binary is unverified
(binary unavailable here).
"""

import numpy as np
import pytest

from avsi.eval import pesq as pesq_mod

FS = 16000


# ---------------------------------------------------------------------------
# independent transcription (scalar/loop style; constants written out
# literally — any change to pesq.py's constants or pipeline breaks agreement)
# ---------------------------------------------------------------------------

def _bark_i(f):
    b = 26.81 * f / (1960.0 + f) - 0.53
    return b if b > 0.0 else 0.0


def _terhardt_i(f_hz):
    f = max(f_hz, 20.0) / 1000.0
    return 3.64 * f**-0.8 - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2) + 1e-3 * f**4


def _layout_i():
    n_bins = 257
    freqs = [k * FS / 512.0 for k in range(n_bins)]
    lo = _bark_i(freqs[1])
    hi = _bark_i(FS / 2.0)
    edges = [lo + (hi - lo) * j / 49.0 for j in range(50)]
    # bin -> band assignment: same right-side searchsorted convention
    band_of = []
    for k in range(n_bins):
        b = _bark_i(freqs[k])
        j = 0
        while j < 50 and edges[j] <= b:
            j += 1
        band_of.append(min(max(j - 1, 0), 48))
    centre_bark = [0.5 * (edges[j] + edges[j + 1]) for j in range(49)]
    width_bark = [edges[j + 1] - edges[j] for j in range(49)]
    centre_hz = [1960.0 * (c + 0.53) / (26.28 - c) for c in centre_bark]
    thr_db = [_terhardt_i(f) for f in centre_hz]
    tmin = min(thr_db)
    abs_thr = [0.25 * 10.0 ** ((t - tmin) / 10.0) for t in thr_db]
    gamma = []
    for c in centre_bark:
        h = min(6.0 / (c + 2.0), 2.0) if c < 4.0 else 1.0
        gamma.append(0.23 * h**0.15)
    return band_of, centre_bark, width_bark, abs_thr, gamma


_BAND_OF, _CB, _WB, _THR, _GAMMA = _layout_i()
_SP = 6.910853e-6
_SL = 1.866055e-1 * 5.977

_ALIGN = [(0, -500), (300, -500), (350, 0), (3250, 0), (3500, -500), (8000, -500)]
_IRS = [(0, -200), (50, -40), (100, -20), (125, -12), (160, -6), (200, 0),
        (250, 4), (300, 6), (350, 8), (400, 10), (500, 11), (600, 12),
        (800, 12), (1000, 12), (1300, 12), (1600, 12), (2000, 12), (2500, 12),
        (3000, 12), (3250, 12), (3500, 4), (4000, -200), (5000, -200),
        (6300, -200), (8000, -200)]


def _fft_filter_i(x, curve):
    n = len(x)
    nfft = 1
    while nfft < max(n, 2):
        nfft *= 2
    fx = [p[0] for p in curve]
    fy = [p[1] for p in curve]
    f = np.fft.rfftfreq(nfft, 1.0 / FS)
    gain = np.array([10.0 ** (np.interp(fi, fx, fy) / 20.0) for fi in f])
    return np.fft.irfft(np.fft.rfft(x, nfft) * gain, nfft)[:n]


def _fix_level_i(x):
    y = _fft_filter_i(x, _ALIGN)
    p = 0.0
    for v in y:
        p += v * v
    p = p / len(y) + 1e-20
    return x * np.sqrt(1e7 / p)


def _delay_i(ref, deg):
    unit = FS // 250
    n = min(len(ref), len(deg)) // unit
    if n < 8:
        return 0
    er = np.array([np.log(np.mean(ref[i * unit:(i + 1) * unit] ** 2) + 1e4)
                   for i in range(n)])
    ed = np.array([np.log(np.mean(deg[i * unit:(i + 1) * unit] ** 2) + 1e4)
                   for i in range(n)])
    er = er - er.mean()
    ed = ed - ed.mean()
    max_lag = min(n - 1, int(0.5 * 250))
    best_l, best_v = 0, -np.inf
    for lag in range(-max_lag, max_lag + 1):
        v = 0.0
        for i in range(n):
            j = i - lag  # corr[lag] = sum ed[i] * er[i - lag]
            if 0 <= j < n:
                v += ed[i] * er[j]
        if v > best_v:
            best_v, best_l = v, lag
    crude = best_l * unit
    span = unit
    lo = max(crude - span, -(len(deg) - 1))
    hi = min(crude + span, len(ref) - 1)
    rn = min(len(ref), len(deg), 4 * FS)
    r = ref[:rn]
    best, best_v = crude, -np.inf
    for d in range(lo, hi + 1):
        if d >= 0:
            a, b = r[: rn - d], deg[d : d + rn - d]
        else:
            a, b = r[-d:rn], deg[: rn + d]
        m = min(len(a), len(b))
        if m < FS // 10:
            continue
        v = float(np.dot(a[:m], b[:m]))
        if v > best_v:
            best_v, best = v, d
    return best


def _pp_i(x):
    w = np.array([0.5 * (1.0 - np.cos(2.0 * np.pi * k / 512.0)) for k in range(512)])
    n = (len(x) - 512) // 256 + 1
    out = np.zeros((max(n, 0), 49))
    for i in range(max(n, 0)):
        fr = x[i * 256 : i * 256 + 512] * w
        spec = np.abs(np.fft.rfft(fr)) ** 2
        for k in range(1, 257):  # DC excluded
            out[i, _BAND_OF[k]] += spec[k]
    return out * _SP


def _audible_i(row, factor=1.0):
    tot = 0.0
    for j in range(49):
        if row[j] > factor * _THR[j]:
            tot += row[j]
    return tot


def _loud_i(row):
    out = np.zeros(49)
    for j in range(49):
        if row[j] > _THR[j]:
            ratio = 0.5 + 0.5 * row[j] / _THR[j]
            out[j] = _SL * (_THR[j] / 0.5) ** _GAMMA[j] * (ratio ** _GAMMA[j] - 1.0)
    return out


def _plp_i(row, p):
    num, den = 0.0, 0.0
    for j in range(49):
        num += (abs(row[j]) * _WB[j]) ** p
        den += _WB[j]
    return (num / den) ** (1.0 / p)


def _lpq_i(d, p=6.0, q=2.0):
    n = len(d)
    if n == 0:
        return 0.0
    chunks = []
    i = 0
    while i < n:
        seg = d[i : i + 20]
        cnt = len(seg)
        s = 0.0
        for v in seg:
            s += v**p
        # zero-padding to the 20-frame grid does not change the sum
        chunks.append((s / cnt) ** (1.0 / p))
        i += 20
    acc = 0.0
    for c in chunks:
        acc += c**q
    return (acc / len(chunks)) ** (1.0 / q)


def _pesq_independent(ref, deg, mode="nb"):
    ref = np.asarray(ref, np.float64)
    deg = np.asarray(deg, np.float64)
    if len(ref) < 1024 or len(deg) < 1024:
        return float("nan"), float("nan")
    ref = _fix_level_i(ref)
    deg = _fix_level_i(deg)
    assert mode == "nb"
    ref = _fft_filter_i(ref, _IRS)
    deg = _fft_filter_i(deg, _IRS)

    delay = _delay_i(ref, deg)
    if delay >= 0:
        ref = ref[: len(deg) - delay or None]
        deg = deg[delay:]
    else:
        ref = ref[-delay:]
        deg = deg[: len(ref) + delay or None]
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    if n < 1024:
        return float("nan"), float("nan")

    pp_ref = _pp_i(ref)
    pp_deg = _pp_i(deg)
    nf = len(pp_ref)
    if nf == 0:
        return float("nan"), float("nan")

    audible_ref = np.array([_audible_i(pp_ref[i]) for i in range(nf)])
    active = [i for i in range(nf) if audible_ref[i] > 1e5]
    sel = active if active else list(range(nf))
    avg_ref = pp_ref[sel].mean(0)
    avg_deg = pp_deg[sel].mean(0)
    comp = np.array([min(max((avg_deg[j] + 1000.0) / (avg_ref[j] + 1000.0),
                             0.01), 100.0) for j in range(49)])
    mod_ref = pp_ref * comp[None, :]

    scale = np.zeros(nf)
    s = 0.0
    for i in range(nf):
        g = (_audible_i(mod_ref[i]) + 5e3) / (_audible_i(pp_deg[i]) + 5e3)
        s = g if i == 0 else 0.2 * s + 0.8 * g
        scale[i] = min(max(s, 3e-4), 5.0)
    mod_deg = pp_deg * scale[:, None]

    d_frames = np.zeros(nf)
    da_frames = np.zeros(nf)
    for i in range(nf):
        lr = _loud_i(mod_ref[i])
        ld = _loud_i(mod_deg[i])
        d = np.zeros(49)
        da = np.zeros(49)
        for j in range(49):
            diff = ld[j] - lr[j]
            m = 0.25 * min(ld[j], lr[j])
            if diff > m:
                d[j] = diff - m
            elif diff < -m:
                d[j] = diff + m
            asym = ((mod_deg[i, j] + 50.0) / (mod_ref[i, j] + 50.0)) ** 1.2
            asym = 0.0 if asym < 3.0 else min(asym, 12.0)
            da[j] = d[j] * asym
        h = ((audible_ref[i] + 1e5) / 1e7) ** 0.04
        d_frames[i] = min(_plp_i(d, 2.0) / h, 45.0)
        da_frames[i] = min(_plp_i(da, 1.0) / h, 180.0)

    raw = 4.5 - 0.1 * _lpq_i(d_frames) - 0.0309 * _lpq_i(da_frames)
    raw = float(min(max(raw, -0.5), 4.5))
    lqo = 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    return raw, float(lqo)


# ---------------------------------------------------------------------------
# probe signals
# ---------------------------------------------------------------------------

def _speechlike(n=FS * 2, seed=0, f0=120.0):
    """Harmonic tone with formant-ish envelope + syllabic AM (deterministic)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    x = np.zeros(n)
    for k in range(1, 16):
        f = k * f0
        amp = np.exp(-((f - 500.0) ** 2) / (2 * 700.0**2)) + 0.4 * np.exp(
            -((f - 1800.0) ** 2) / (2 * 500.0**2)
        )
        x += amp * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t + 0.7)
    return (x * am * 6000.0).astype(np.float64)


def _probes():
    rng = np.random.default_rng(42)
    clean = _speechlike()
    out = []
    for snr_db in (30.0, 20.0, 10.0):
        noise = rng.normal(size=len(clean))
        noise *= np.sqrt(np.mean(clean**2) / (10 ** (snr_db / 10.0)) / np.mean(noise**2))
        out.append((f"awgn_{int(snr_db)}dB", clean, clean + noise))
    # MNRU-style modulated noise (P.862's calibration degradation family)
    for q_db in (25.0, 15.0):
        noise = rng.normal(size=len(clean))
        deg = clean * (1.0 + 10 ** (-q_db / 20.0) * noise)
        out.append((f"mnru_q{int(q_db)}", clean, deg))
    # variable delay: degraded shifted by 777 samples (non-multiple of hop)
    noise = rng.normal(size=len(clean))
    noise *= np.sqrt(np.mean(clean**2) / 1e2 / np.mean(noise**2))
    deg = np.concatenate([np.zeros(777), clean + noise])
    out.append(("delayed_777", clean, deg))
    # time-gap hole (this corpus's actual degradation shape)
    deg = clean.copy()
    deg[FS // 2 : FS // 2 + (FS * 8) // 10] = 0.0
    out.append(("hole_800ms", clean, deg))
    # gain mismatch exercises the short-term gain compensation branch
    out.append(("gain_+6dB", clean, clean * 2.0))
    return out


PROBES = _probes()


@pytest.mark.parametrize("name,ref,deg", PROBES, ids=[p[0] for p in PROBES])
def test_production_matches_independent(name, ref, deg):
    raw_p, lqo_p = pesq_mod.pesq_measure(ref, deg, FS, mode="nb")
    raw_i, lqo_i = _pesq_independent(ref, deg, mode="nb")
    assert abs(raw_p - raw_i) < 1e-4, (name, raw_p, raw_i)
    assert abs(lqo_p - lqo_i) < 1e-4, (name, lqo_p, lqo_i)


def test_delay_invariance():
    """The global-delay estimator must recover a pure shift: scores with
    and without a 777-sample delay agree closely (for CONSTANT delay the
    global delay is exact and split_align applies no residuals)."""
    _, clean, deg = next(p for p in PROBES if p[0] == "awgn_20dB")
    raw0, _ = pesq_mod.pesq_measure(clean, deg, FS, mode="nb")
    rawd, _ = pesq_mod.pesq_measure(
        clean, np.concatenate([np.zeros(777), deg]), FS, mode="nb"
    )
    assert abs(raw0 - rawd) < 0.05


# ---------------------------------------------------------------------------
# piecewise (variable) delay: the split_align stage
# ---------------------------------------------------------------------------

def _burst_train(seed=3, dur=3.0):
    """Aperiodic speech-like probe: syllabic bursts with distinct f0s and
    random gaps.  Unlike `_speechlike` (single f0, near-periodic at both
    the pitch and the AM scale — hostile to any correlation aligner, real
    or ITU), its envelope and fine structure are informative, which is
    what the alignment stage actually keys on for real speech."""
    rng = np.random.default_rng(seed)
    n = int(FS * dur)
    x = np.zeros(n)
    pos = 0
    while pos < n - FS // 4:
        blen = int(rng.uniform(0.12, 0.3) * FS)
        f0 = rng.uniform(90, 250)
        t = np.arange(blen) / FS
        s = np.zeros(blen)
        for k in range(1, 12):
            f = k * f0
            if f > 7000:
                break
            amp = np.exp(-((f - rng.uniform(400, 900)) ** 2) / (2 * 700.0**2))
            s += amp * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        x[pos : pos + blen] += s * np.hanning(blen)
        pos += blen + int(rng.uniform(0.02, 0.12) * FS)
    return (x / np.max(np.abs(x)) * 9000.0).astype(np.float64)


@pytest.mark.parametrize("shift,min_gain", [(577, 0.1), (1200, 0.3), (2500, 0.5)])
def test_piecewise_delay_recovery(shift, min_gain):
    """A delay CHANGE mid-utterance (zeros inserted at the midpoint, so
    the two halves carry different delays) must be substantially repaired
    by split_align: production scores well above a global-only aligner,
    and never above the constant-delay score (no hallucinated quality)."""
    rng = np.random.default_rng(11)
    clean = _burst_train()
    noise = rng.normal(size=len(clean))
    noise *= np.sqrt(np.mean(clean**2) / 1e2 / np.mean(noise**2))  # 20 dB
    deg = clean + noise
    m = len(deg) // 2
    piece = np.concatenate([deg[:m], np.zeros(shift), deg[m:]])

    raw_const, _ = pesq_mod.pesq_measure(clean, deg, FS, mode="nb")
    raw_split, _ = pesq_mod.pesq_measure(clean, piece, FS, mode="nb")
    orig = pesq_mod._align_sections
    pesq_mod._align_sections = lambda r, d: d
    try:
        raw_global, _ = pesq_mod.pesq_measure(clean, piece, FS, mode="nb")
    finally:
        pesq_mod._align_sections = orig

    assert raw_split >= raw_global + min_gain, (raw_split, raw_global)
    assert raw_split <= raw_const + 0.05, (raw_split, raw_const)


def test_split_align_identity_on_aligned_material():
    """Sample-aligned pairs (this corpus) must pass through split_align
    bit-identically — no residual is confident enough to beat no-shift."""
    clean = _burst_train(seed=5)
    rng = np.random.default_rng(6)
    noise = rng.normal(size=len(clean))
    noise *= np.sqrt(np.mean(clean**2) / 1e2 / np.mean(noise**2))
    deg = clean + noise
    out = pesq_mod._align_sections(clean, deg)
    assert out is deg  # no copy made -> no section was shifted


def test_mnru_monotone():
    """Lower MNRU Q (more modulated noise) must score lower."""
    scores = {}
    for name, ref, deg in PROBES:
        if name.startswith("mnru"):
            scores[name] = pesq_mod.pesq_measure(ref, deg, FS, mode="nb")[0]
    assert scores["mnru_q25"] > scores["mnru_q15"]
