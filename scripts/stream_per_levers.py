"""Two levers on the streaming-transcript PER gap (follow-on to
stream_transcripts.py, which measured offline 0.168 vs streaming-288ms
0.274 on the functional-head flagship):

1. lookahead width: re-run the lockstep fleet at L = 16/32/48 (C=8) —
   no retraining, just more backward context per window (latency grows
   with L: (C+L)*12 ms).
2. LC fine-tune: continue exp_si_ctc for a few epochs with
   lc_chunk/lc_lookahead = the serving window (core.lc_bilstm_layer:
   train the exact function served) and re-measure streaming PER/STOI
   at 288 ms.

Usage: python scripts/stream_per_levers.py [epochs_lc] [n_utts]
Writes /dev/shm/grid_drill/stream_levers.json.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lc_study import _collect, _mean_stoi  # noqa: E402

D = "/dev/shm/grid_drill"


def _stream_eval(config, stats, params, waves, fmasks, vids, labels, chunk, look):
    from avsi.infer import streaming
    from avsi.ops import ctc as ctc_ops

    cfg_s = {k: v for k, v in config.items() if k not in ("lc_chunk", "lc_lookahead")}
    wav, dec = streaming.stream_utterances_lockstep(
        cfg_s, stats, params, waves, fmasks, vids,
        chunk_frames=chunk, lookahead_frames=look, transcript=True,
    )
    return _mean_stoi(waves, wav), ctc_ops.per_metric(dec, labels)


def main(epochs_lc=10, n_utts=64, chunk=8):
    from avsi import config as config_lib
    from avsi.infer.inpaint import load_model_bundle
    from avsi.train import loop

    base_dir = os.path.join(D, "exp_si_ctc")
    config, stats, _, params = load_model_bundle(
        os.path.join(base_dir, "netmodel"), norm=True)
    files = sorted(glob.glob(os.path.join(D, "grouped", "test-set", "*.tfrecord")))[:12]
    waves, fmasks, vids, labels, _ = _collect(files, config, n_utts)

    out = {"study": "streaming PER levers", "chunk_frames": chunk,
           "n_utts": int(len(waves))}

    # --- lever 1: lookahead sweep (eval-only)
    for look in (16, 32, 48):
        stoi, per = _stream_eval(
            config, stats, params, waves, fmasks, vids, labels, chunk, look)
        out[f"L{look}"] = {"latency_ms": (chunk + look) * 12,
                           "stoi": stoi, "per": per}
        print(f"L={look}: latency {(chunk+look)*12} ms STOI {stoi:.4f} PER {per:.4f}",
              flush=True)

    # --- lever 2: LC fine-tune at the serving window, then 288 ms again
    exp = os.path.join(D, "exp_si_ctc_lc")
    ckpt = os.path.join(exp, "netmodel", "sinet.npz")
    if not os.path.exists(ckpt):
        base = config_lib.load_configfile(base_dir + ".config")
        cfg = dict(
            base, exp_folder=exp,
            model_ckp=os.path.join(base_dir, "netmodel", "sinet"),
            lc_chunk=chunk, lc_lookahead=16,
            max_n_epochs=int(epochs_lc), n_earlystop_epochs=int(epochs_lc),
        )
        cfgp = exp + ".config"
        config_lib.save_configfile(cfg, cfgp)
        print("=== LC fine-tune:", cfgp, flush=True)
        summ = loop.train_or_exit(cfgp)
        print("lc best_val", summ["best_val"], flush=True)
    config_lc, stats_lc, _, params_lc = load_model_bundle(
        os.path.join(exp, "netmodel"), norm=True)
    stoi, per = _stream_eval(
        config_lc, stats_lc, params_lc, waves, fmasks, vids, labels, chunk, 16)
    out["lc_trained_L16"] = {"latency_ms": (chunk + 16) * 12,
                             "stoi": stoi, "per": per}
    print(f"LC-trained @288ms: STOI {stoi:.4f} PER {per:.4f}", flush=True)

    with open(os.path.join(D, "stream_levers.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    kw = {}
    if len(a) > 0:
        kw["epochs_lc"] = int(a[0])
    if len(a) > 1:
        kw["n_utts"] = int(a[1])
    main(**kw)
