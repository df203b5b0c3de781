"""Conformance-harness tests (avsi/eval/pesq_conformance.py).

The binary leg is skippable: it runs only when PESQ_BIN points at a real
ITU P.862 binary (none ships in this environment — BASELINE.md "PESQ
validity scope").  Everything else pins the harness itself so the
one-command conformance run works the day a binary appears.
"""

import os

import numpy as np
import pytest

from avsi.eval import pesq_conformance as conf


def test_battery_is_deterministic_and_complete():
    a = conf.probe_battery()
    b = conf.probe_battery()
    names = [p[0] for p in a]
    assert names == [p[0] for p in b]
    # the golden families: AWGN x3, MNRU x2, delay, hole, gain
    assert names == ["awgn_30dB", "awgn_20dB", "awgn_10dB", "mnru_q25",
                     "mnru_q15", "delayed_777", "hole_800ms", "gain_+6dB"]
    for (_, ra, da), (_, rb, db) in zip(a, b):
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(da, db)


def test_native_scoring_and_gain_override():
    probes = conf.probe_battery()[:3]  # the AWGN ladder
    base = conf.score_native(probes)
    assert all(np.isfinite(v) for v in base.values())
    # monotone in SNR
    assert base["awgn_30dB"] > base["awgn_20dB"] > base["awgn_10dB"]
    # the gain override changes scores and restores cleanly
    hi = conf.score_native(probes, gain=2 * conf.BASE_GAIN)
    assert hi["awgn_20dB"] != base["awgn_20dB"]
    again = conf.score_native(probes)
    assert again == base  # _SL_16K restored by the context manager


def test_score_binary_roundtrip_with_native_as_fake_binary(tmp_path):
    """score_binary's wav-writing path, exercised with pesq_eval's native
    fallback (pesq_bin_path=None) via a tiny shim — proves the files the
    harness writes are scoreable without needing the ITU binary."""
    from avsi.eval import metrics as metrics_lib
    from avsi.utils import wav as wavio

    probes = conf.probe_battery()[:1]
    name, ref, deg = probes[0]
    rp, dp = str(tmp_path / "r.wav"), str(tmp_path / "d.wav")
    wavio.write_wav_int16(rp, np.clip(ref, -32768, 32767), conf.FS)
    wavio.write_wav_int16(dp, np.clip(deg, -32768, 32767), conf.FS)
    raw, _ = metrics_lib.pesq_eval(rp, dp, pesq_bin_path=None, mode="nb")
    direct = conf.score_native(probes)[name]
    # int16 quantization through the wav round-trip only
    assert abs(raw - direct) < 0.05, (raw, direct)


@pytest.mark.skipif(
    not os.environ.get("PESQ_BIN"),
    reason="no ITU P.862 binary in this environment (set PESQ_BIN to run)",
)
def test_conformance_against_real_binary():
    report = conf.run(os.environ["PESQ_BIN"])
    assert report["refit_rms"] <= report["shipped_rms"]
    for probe, row in report["probes"].items():
        assert np.isfinite(row["binary"]), probe
    # the day this runs: within-protocol deltas should be small after refit
    assert report["refit_rms"] < 0.35, report


def test_run_end_to_end_with_shim_binary(tmp_path):
    """Full run() against a shim 'binary' that scores with the native
    model but speaks the ITU binary's CLI + output format — validates the
    subprocess invocation, the output-parsing regex, the delta table and
    the gain refit without the real binary.  Native-vs-native deltas are
    int16 wav quantization only, so the refit must keep the shipped gain."""
    import json
    import stat
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim = tmp_path / "pesq_shim.py"
    shim.write_text(
        "#!/usr/bin/env python\n"
        "import sys\n"
        f"sys.path.insert(0, {json.dumps(repo)})\n"
        "from avsi.eval.pesq import pesq_measure\n"
        "from avsi.utils import wav as wavio\n"
        "args = [a for a in sys.argv[1:] if not a.startswith('+')]\n"
        "_, ref = wavio.read_wav_int16(args[0])\n"
        "_, deg = wavio.read_wav_int16(args[1])\n"
        "raw, lqo = pesq_measure(ref, deg, 16000, 'nb')\n"
        "print('P.862 Prediction (Raw MOS, MOS-LQO):  = '\n"
        "      + ('%0.3f\\t%0.3f' % (raw, lqo)))\n"
    )
    runner = tmp_path / "pesq"
    runner.write_text(
        "#!/bin/sh\nexec " + sys.executable + " " + str(shim) + " \"$@\"\n"
    )
    runner.chmod(runner.stat().st_mode | stat.S_IEXEC)

    report = conf.run(str(runner), gain_grid=(3.0, conf.BASE_GAIN, 9.0))
    assert report["refit_gain"] == conf.BASE_GAIN
    assert report["shipped_rms"] < 0.05, report  # int16 round-trip only
    for row in report["probes"].values():
        assert abs(row["delta"]) < 0.1, report


def test_native_wb_mode_scores_on_lqo_scale():
    """r5 review regression: wb-mode native scores must be MOS-LQO (the
    scale the binary reports in wb), not raw P.862 MOS."""
    probes = conf.probe_battery()[:1]
    name = probes[0][0]
    from avsi.eval import pesq as pesq_mod

    raw, lqo = pesq_mod.pesq_measure(probes[0][1], probes[0][2], conf.FS,
                                     mode="wb")
    got = conf.score_native(probes, mode="wb")[name]
    assert got == lqo and got != raw
