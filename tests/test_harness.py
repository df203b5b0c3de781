"""Eval-harness surface tests: CSV schemas, deltas, native PESQ columns.

Covers `speech_inpainting_eval` (reference evaluation.py:119-131 schema)
and `speech_enhancement_eval` (reference evaluation_asr.py:86-99 schema,
including its literal STOI_I header and absence of PER columns), plus the
avsi-extension SDR columns behind `with_sdr`.
"""

import csv
import os

import numpy as np
import pytest

from avsi.eval.harness import speech_enhancement_eval, speech_inpainting_eval
from avsi.utils import wav as wavio

FS = 16000


def _make_corpus(root, n=3):
    rng = np.random.default_rng(7)
    t = np.arange(2 * FS) / FS
    for i in range(n):
        d = root / f"sample_{i}"
        (d / "enhanced").mkdir(parents=True)
        (d / "transcriptions").mkdir()
        env = 0.5 * (1 + np.sin(2 * np.pi * (2 + i) * t))
        clean = env * sum(
            np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6)) for f0 in (150, 450, 900)
        ) * 5000
        masked = clean.copy()
        hole = slice(FS // 2, FS // 2 + FS // 2)  # 500 ms hole
        masked[hole] = 0
        # realistic inpainting output: exact outside the hole, mildly
        # imperfect inside it
        enhanced = clean.copy()
        enhanced[hole] = clean[hole] * 0.85 + rng.normal(
            0, clean.std() * 0.05, clean[hole].shape
        )
        wavio.write_wav_int16(str(d / "target.wav"), clean, FS)
        wavio.write_wav_int16(str(d / "masked.wav"), masked, FS)
        wavio.write_wav_int16(str(d / "enhanced" / "pref.wav"), enhanced, FS)
        (d / "transcription.lbl").write_text("b,ih,n,b,l,uw")
        (d / "transcriptions" / "pref.lbl").write_text("b,ih,n,l,uw")
        (d / "masked.lbl").write_text("b,n,uw")
    return root


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return _make_corpus(tmp_path_factory.mktemp("evalset"))


def _read_csv(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


class TestInpaintingEval:
    def test_full_schema_and_native_pesq(self, corpus):
        summary = speech_inpainting_eval(str(corpus), "pref", "res", masked_eval=True)
        header, rows = _read_csv(os.path.join(str(corpus), "res.csv"))
        assert header == ["SAMPLE", "L1_MASK", "L1_ENH", "PESQ_MASK", "PESQ_ENH",
                          "STOI_MASK", "STOI_ENH", "PER_MASK", "PER_ENH",
                          "L1r", "PESQi", "STOIi", "PERr", "LAB", "DEC_ENH", "DEC_MASK"]
        assert len(rows) == 3
        # native PESQ produces real numbers without a binary
        assert np.isfinite(summary["pesq_enhanced"][0])
        assert np.isfinite(summary["pesq_masked"][0])
        # lightly-noised enhanced beats the 500 ms hole on every delta
        assert summary["pesq_improvement"][0] > 0
        assert summary["stoi_improvement"][0] > 0
        assert summary["l1_reduction"][0] > 0
        assert summary["per_reduction"][0] > 0

    def test_sdr_columns_behind_flag(self, corpus):
        summary = speech_inpainting_eval(
            str(corpus), "pref", "res_sdr", masked_eval=True, with_sdr=True
        )
        header, _ = _read_csv(os.path.join(str(corpus), "res_sdr.csv"))
        for c in ("SDR_MASK", "SDR_ENH", "SISDR_MASK", "SISDR_ENH"):
            assert c in header
        # lightly-noised enhanced must beat the 500 ms hole on SDR too
        assert summary["sdr_enhanced"][0] > summary["sdr_masked"][0]
        assert summary["sisdr_enhanced"][0] > summary["sisdr_masked"][0]
        assert np.isfinite(summary["sdr_enhanced"][0])
        assert np.isfinite(summary["sisdr_enhanced"][0])


class TestEnhancementEval:
    def test_masked_schema_matches_reference(self, corpus):
        summary = speech_enhancement_eval(str(corpus), "pref", "asr_res", masked_eval=True)
        header, rows = _read_csv(os.path.join(str(corpus), "asr_res.csv"))
        # evaluation_asr.py:92 — PER-free, literal STOI_I improvement header
        assert header == ["SAMPLE", "L1_MASK", "L1_ENH", "PESQ_MASK", "PESQ_ENH",
                          "STOI_MASK", "STOI_ENH", "L1r", "PESQi", "STOI_I"]
        assert len(rows) == 3
        assert "per_enhanced" not in summary
        assert summary["stoi_improvement"][0] > 0

    def test_unmasked_schema(self, corpus):
        speech_enhancement_eval(str(corpus), "pref", "asr_nm", masked_eval=False)
        header, _ = _read_csv(os.path.join(str(corpus), "asr_nm.csv"))
        assert header == ["SAMPLE", "L1_ENH", "PESQ_ENH", "STOI_ENH"]

    def test_missing_transcriptions_are_fine(self, corpus, tmp_path):
        # enhancement eval never touches .lbl files: corpus without them works
        bare = _make_corpus(tmp_path / "bare", n=1)
        lbl = bare / "sample_0" / "transcription.lbl"
        os.remove(lbl)
        summary = speech_enhancement_eval(str(bare), "pref", "r", masked_eval=True)
        assert np.isfinite(summary["l1_enhanced"][0])


def test_partial_masked_corpus_keeps_per_summaries_finite(tmp_path):
    """A sample missing masked.wav yields a partial row; the PER summary
    columns must stay finite (regression: bare np.mean over a column with
    one NaN made 'Masked PER' and 'PER reduction' nan)."""
    root = _make_corpus(tmp_path / "c", n=3)
    os.remove(str(root / "sample_1" / "masked.wav"))
    summary = speech_inpainting_eval(str(root), "pref", "out", masked_eval=True)
    assert np.isfinite(summary["per_masked"][0])
    assert np.isfinite(summary["per_reduction"][0])


def test_sisdr_tolerates_length_mismatch(tmp_path):
    """sisdr_eval scores the common prefix instead of asserting equal
    lengths — a shorter masked.wav must not abort the whole eval run."""
    from avsi.eval import metrics

    rng = np.random.default_rng(3)
    x = rng.normal(size=4000)
    v = metrics.sisdr_eval(x, x[:3500] + rng.normal(0, 0.1, 3500))
    assert np.isfinite(v)
    # and with_sdr over a corpus whose masked.wav is shorter end-to-end
    root = _make_corpus(tmp_path / "c2", n=2)
    _, masked = wavio.read_wav_int16(str(root / "sample_0" / "masked.wav"))
    wavio.write_wav_int16(str(root / "sample_0" / "masked.wav"), masked[:-321], FS)
    summary = speech_inpainting_eval(
        str(root), "pref", "out", masked_eval=True, with_sdr=True
    )
    assert np.isfinite(summary["sisdr_enhanced"][0])
