"""Streaming transcripts on a functional CTC head (round-2 verdict item #6).

The drill flagship trained at the reference's ctc_loss=0.001
(training_ctc.py:88 default via config) never escapes CTC blank collapse
at drill scale (12 epochs / 10,240 utts: val_ctc falls 52->9 but greedy
decode stays empty, PER 1.0 — measured, see git history of lc_study).  To
MEASURE what live streaming transcription costs vs offline decode, the
head must first function, so this study warm-starts the capstone-recipe
flagship (`model_ckp`) and fine-tunes with ctc_loss raised to 0.05 —
a documented deviation whose only purpose is a functional head; the
sinet best-val policy remains hole-loss, so SI quality is guarded.

Then, on held-out test utterances, one pass measures:
  - offline:  jitted full-context forward -> greedy decode + masked-phase wavs
  - streaming: LC-BLSTM lockstep fleet at C=8/L=16 (288 ms latency) with
    incremental transcripts (stream_utterances_lockstep(transcript=True))
Rows: PER offline / streaming / stream-vs-offline, STOI offline / streaming
(matched masked-phase reconstruction on both paths).

Usage: python scripts/stream_transcripts.py [epochs] [n_utts]
Writes /dev/shm/grid_drill/stream_study.json.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lc_study import _collect, _mean_stoi, _offline_decode, _offline_wavs  # noqa: E402

D = "/dev/shm/grid_drill"


def main(epochs=60, n_utts=64, ctc_weight=0.05, chunk=8, look=16):
    from avsi import config as config_lib
    from avsi.infer import streaming
    from avsi.infer.inpaint import load_model_bundle
    from avsi.ops import ctc as ctc_ops
    from avsi.train import loop

    exp = os.path.join(D, "exp_si_ctc")
    ckpt = os.path.join(exp, "netmodel", "sinet.npz")
    if not os.path.exists(ckpt):
        base = config_lib.load_configfile(os.path.join(D, "exp_si.config"))
        cfg = dict(
            base,
            exp_folder=exp,
            model_ckp=os.path.join(D, "exp_si", "netmodel", "sinet"),
            ctc_loss=ctc_weight,
            max_n_epochs=int(epochs),
            n_earlystop_epochs=int(epochs),
        )
        cfgp = exp + ".config"
        config_lib.save_configfile(cfg, cfgp)
        print("=== fine-tuning CTC head:", cfgp, flush=True)
        summ = loop.train_or_exit(cfgp)
        print("fine-tune best_val", summ["best_val"], flush=True)

    config, stats, _, params = load_model_bundle(os.path.join(exp, "netmodel"), norm=True)
    files = sorted(glob.glob(os.path.join(D, "grouped", "test-set", "*.tfrecord")))[:12]
    waves, fmasks, vids, labels, batches = _collect(files, config, n_utts)

    out = {
        "study": "streaming transcripts at 288 ms (functional CTC head)",
        "model": config["model"],
        "ctc_weight": ctc_weight,
        "finetune_epochs": int(epochs),
        "chunk_frames": chunk,
        "lookahead_frames": look,
        "latency_ms": (chunk + look) * 12,
        "n_utts": int(len(waves)),
    }

    # offline ceilings (full bidirectional context); decode once, reused
    # below for the stream-vs-offline disagreement metric
    offline_dec = _offline_decode(config, stats, params, batches, n_utts)
    out["per_offline"] = ctc_ops.per_metric(offline_dec, labels)
    out["stoi_offline"] = _mean_stoi(
        waves, _offline_wavs(config, stats, params, batches, n_utts)
    )
    print("offline: PER", out["per_offline"], "STOI", out["stoi_offline"], flush=True)

    # live path: lockstep fleet, incremental transcripts
    cfg_s = {k: v for k, v in config.items() if k not in ("lc_chunk", "lc_lookahead")}
    wav_s, dec_s = streaming.stream_utterances_lockstep(
        cfg_s, stats, params, waves, fmasks, vids,
        chunk_frames=chunk, lookahead_frames=look, transcript=True,
    )
    out["per_streaming"] = ctc_ops.per_metric(dec_s, labels)
    out["stoi_streaming"] = _mean_stoi(waves, wav_s)
    out["per_stream_vs_offline"] = ctc_ops.per_metric(dec_s, offline_dec)
    print("streaming: PER", out["per_streaming"], "STOI", out["stoi_streaming"],
          "vs-offline", out["per_stream_vs_offline"], flush=True)

    with open(os.path.join(D, "stream_study.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    kw = {}
    if len(a) > 0:
        kw["epochs"] = int(a[0])
    if len(a) > 1:
        kw["n_utts"] = int(a[1])
    main(**kw)
