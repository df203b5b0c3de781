"""Evaluation harness: walk sample dirs, score, aggregate, CSV.

Reference: `/root/reference/av_speech_inpainting/evaluation.py:14-131`
(speech_inpainting_eval) and `evaluation_asr.py:13-100`.  Same metric
surface (L1 log-spec distance, PESQ, STOI, PER), same improvement deltas vs
the masked baseline (PESQi / STOIi / L1r / PERr, evaluation.py:109-116),
same CSV schema.  Differences: no os.chdir side effects, per-sample work is
fanned out over a process pool (the reference spawns one serial PESQ
process per file — SURVEY.md §3.5), and missing PESQ binaries degrade to
NaN columns instead of failing.
"""

from __future__ import annotations

import csv
import os
from concurrent.futures import ProcessPoolExecutor
from glob import glob

import numpy as np

from avsi.eval import metrics
from avsi.ops.ctc import edit_distance
from avsi.utils import wav as wavio


def _eval_one(args):
    (ex_dir, enhanced_file, masked_eval, pesq_path, pesq_mode, n_fft,
     window_size, step_size) = args
    name = os.path.basename(ex_dir)
    try:
        sr, target = wavio.read_wav_int16(os.path.join(ex_dir, "target.wav"))
        _, enhanced = wavio.read_wav_int16(
            os.path.join(ex_dir, "enhanced", enhanced_file + ".wav")
        )
    except FileNotFoundError:
        return None
    n = min(len(target), len(enhanced))
    target, enhanced = target[:n], enhanced[:n]
    tr_path = os.path.join(ex_dir, "transcription.lbl")
    labels_text = open(tr_path).read() if os.path.isfile(tr_path) else ""
    labels = [x for x in labels_text.split(",") if x]
    dec_enh_path = os.path.join(ex_dir, "transcriptions", enhanced_file + ".lbl")
    if os.path.isfile(dec_enh_path):
        with open(dec_enh_path) as f:
            dec_enh_text = f.read()
    else:
        dec_enh_text = ""
    dec_enh = [x for x in dec_enh_text.split(",") if x]

    row = {
        "SAMPLE": name,
        "L1_ENH": metrics.l1_eval(target, enhanced, sr, n_fft, window_size, step_size),
        "PESQ_ENH": metrics.pesq_eval(
            os.path.join(ex_dir, "target.wav"),
            os.path.join(ex_dir, "enhanced", enhanced_file + ".wav"),
            pesq_path, pesq_mode,
        )[0] if pesq_path else np.nan,
        "STOI_ENH": metrics.stoi_eval(target, enhanced, sr),
        "PER_ENH": edit_distance(labels, dec_enh) / max(1, len(labels)),
        "LAB": labels_text,
        "DEC_ENH": dec_enh_text,
    }
    if masked_eval:
        try:
            _, masked = wavio.read_wav_int16(os.path.join(ex_dir, "masked.wav"))
        except FileNotFoundError:
            return row
        masked = masked[: len(target)]
        mask_lbl = os.path.join(ex_dir, "masked.lbl")
        dec_masked_text = open(mask_lbl).read() if os.path.isfile(mask_lbl) else ""
        dec_masked = [x for x in dec_masked_text.split(",") if x]
        row.update(
            {
                "L1_MASK": metrics.l1_eval(target, masked, sr, n_fft, window_size, step_size),
                "PESQ_MASK": metrics.pesq_eval(
                    os.path.join(ex_dir, "target.wav"),
                    os.path.join(ex_dir, "masked.wav"),
                    pesq_path, pesq_mode,
                )[0] if pesq_path else np.nan,
                "STOI_MASK": metrics.stoi_eval(target, masked, sr),
                "PER_MASK": edit_distance(labels, dec_masked) / max(1, len(labels)),
                "DEC_MASK": dec_masked_text,
            }
        )
    return row


def speech_inpainting_eval(
    test_audio_dir: str,
    enhanced_file: str,
    out_file: str,
    masked_eval: bool = True,
    pesq_path: str | None = None,
    pesq_mode: str = "nb",
    n_fft: int = 512,
    window_size: int = 25,
    step_size: int = 10,
    num_workers: int = 0,
) -> dict:
    sample_dirs = sorted(
        d for d in glob(os.path.join(test_audio_dir, "*")) if os.path.isdir(d)
    )
    print(f"Test dataset name: {test_audio_dir}")
    print(f"Enhanced file prefix: {enhanced_file}")
    print(f"Number of samples: {len(sample_dirs)}")

    work = [
        (d, enhanced_file, masked_eval, pesq_path, pesq_mode, n_fft, window_size, step_size)
        for d in sample_dirs
    ]
    if num_workers and num_workers > 1:
        with ProcessPoolExecutor(max_workers=num_workers) as pool:
            rows = list(pool.map(_eval_one, work))
    else:
        rows = [_eval_one(w) for w in work]
    rows = [r for r in rows if r is not None]
    if not rows:
        print("No evaluable samples found.")
        return {}

    def col(key):
        return np.asarray([r.get(key, np.nan) for r in rows], np.float64)

    def _nstats(a):
        a = np.asarray(a, np.float64)
        if not np.isfinite(a).any():
            return (float("nan"), float("nan"))  # e.g. PESQ without a binary
        return (float(np.nanmean(a)), float(np.nanstd(a)))

    summary = {}
    stoi_enh = np.where(col("STOI_ENH") <= 1e-4, np.nan, col("STOI_ENH"))
    summary["l1_enhanced"] = _nstats(col("L1_ENH"))
    summary["pesq_enhanced"] = _nstats(col("PESQ_ENH"))
    summary["stoi_enhanced"] = _nstats(stoi_enh)
    summary["per_enhanced"] = (np.mean(col("PER_ENH")), np.std(col("PER_ENH")))
    print("Enhanced L1 (spectrogram): {:.5f} ({:.5f})".format(*summary["l1_enhanced"]))
    print("Enhanced PESQ: {:.5f} ({:.5f})".format(*summary["pesq_enhanced"]))
    print("Enhanced STOI: {:.5f} ({:.5f})".format(*summary["stoi_enhanced"]))
    print("Enhanced PER: {:.5f} ({:.5f})".format(*summary["per_enhanced"]))

    has_masked = masked_eval and any("L1_MASK" in r for r in rows)
    if has_masked:
        stoi_mask = np.where(col("STOI_MASK") <= 1e-4, np.nan, col("STOI_MASK"))
        l1_r = col("L1_MASK") - col("L1_ENH")
        pesq_i = col("PESQ_ENH") - col("PESQ_MASK")
        stoi_i = stoi_enh - stoi_mask
        per_r = col("PER_MASK") - col("PER_ENH")
        for r, a, b, c, d in zip(rows, l1_r, pesq_i, stoi_i, per_r):
            r["L1r"], r["PESQi"], r["STOIi"], r["PERr"] = a, b, c, d
        summary["l1_masked"] = _nstats(col("L1_MASK"))
        summary["stoi_masked"] = _nstats(stoi_mask)
        summary["per_masked"] = (np.mean(col("PER_MASK")), np.std(col("PER_MASK")))
        summary["l1_reduction"] = _nstats(l1_r)
        summary["pesq_improvement"] = _nstats(pesq_i)
        summary["stoi_improvement"] = _nstats(stoi_i)
        summary["per_reduction"] = (np.mean(per_r), np.std(per_r))
        print("Masked L1 (spectrogram): {:.5f} ({:.5f})".format(*summary["l1_masked"]))
        print("Masked STOI: {:.5f} ({:.5f})".format(*summary["stoi_masked"]))
        print("Masked PER: {:.5f} ({:.5f})".format(*summary["per_masked"]))
        print("L1 (spectrogram) reduction: {:.5f} ({:.5f})".format(*summary["l1_reduction"]))
        print("PESQ improvement: {:.5f} ({:.5f})".format(*summary["pesq_improvement"]))
        print("STOI improvement: {:.5f} ({:.5f})".format(*summary["stoi_improvement"]))
        print("PER reduction: {:.5f} ({:.5f})".format(*summary["per_reduction"]))

    # CSV (evaluation.py:119-131 schema)
    results_file = os.path.join(test_audio_dir, out_file + ".csv")
    if has_masked:
        header = ["SAMPLE", "L1_MASK", "L1_ENH", "PESQ_MASK", "PESQ_ENH", "STOI_MASK",
                  "STOI_ENH", "PER_MASK", "PER_ENH", "L1r", "PESQi", "STOIi", "PERr",
                  "LAB", "DEC_ENH", "DEC_MASK"]
    else:
        header = ["SAMPLE", "L1_ENH", "PESQ_ENH", "STOI_ENH", "PER_ENH", "LAB", "DEC_ENH"]
    rows.sort(key=lambda r: r["SAMPLE"])
    with open(results_file, "w") as f:
        wr = csv.writer(f, lineterminator="\n")
        wr.writerow(header)
        for r in rows:
            wr.writerow([r.get(k, "") for k in header])
    print(f"Results written to {results_file}")
    return summary


def speech_enhancement_eval(
    test_audio_dir: str,
    enhanced_file: str,
    out_file: str,
    masked_eval: bool = True,
    pesq_path: str | None = None,
    pesq_mode: str = "nb",
    n_fft: int = 512,
    window_size: int = 25,
    step_size: int = 10,
    num_workers: int = 0,
) -> dict:
    """L1/PESQ/STOI-only variant (reference evaluation_asr.py:13-100 —
    same walk without PER/transcription columns)."""
    return speech_inpainting_eval(
        test_audio_dir, enhanced_file, out_file, masked_eval, pesq_path,
        pesq_mode, n_fft, window_size, step_size, num_workers,
    )
