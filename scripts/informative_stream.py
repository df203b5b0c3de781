"""Streaming + LC training on the STRONGEST model: the informative-video
AV flagship.

The streaming-transcript ladder (BASELINE.md, chain_rebuild_r3.json) was
measured on envelope-video corpora. This chain re-runs it on the
informative-video corpus built by scripts/informative_study.py — the
setting where the AV model decisively beats audio-only — to check the
round-3 headline (LC-trained 288 ms streaming matches/beats offline
decode) survives on a model whose video stream actually carries the
phonetic content being streamed.

Chain (reuses the study's exp_av-blstm-ssnn-ctc checkpoint + corpus):
  1. +60 epochs at ctc_loss=0.05 (the reference 0.001 head blank-collapses
     at scale — the documented stream_transcripts.py deviation)
  2. offline ceilings (full-context greedy PER + masked-phase STOI)
  3. untrained streaming at C=8/L=16 (288 ms)
  4. LC-exact fine-tune (10 epochs, window-space causal-ssnn trainer)
     -> streaming row at the trained window

Usage: python scripts/informative_stream.py [epochs_ctc] [epochs_lc] [n_utts]
                                              [corpus_dir]
Writes <corpus_dir>/informative_stream.json.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lc_study import _collect, _mean_stoi, _offline_decode, _offline_wavs  # noqa: E402
from stream_per_levers import _stream_eval  # noqa: E402

D = "/dev/shm/informative"


def main(epochs_ctc=60, epochs_lc=10, n_utts=64, chunk=8, look=16,
         dest=D):
    global D
    D = dest
    from avsi import config as config_lib
    from avsi.infer.inpaint import load_model_bundle
    from avsi.ops import ctc as ctc_ops
    from avsi.train import loop

    base_dir = os.path.join(D, "exp_av-blstm-ssnn-ctc")
    cache: dict = {}

    ctc_dir = os.path.join(D, "exp_av_ctc05")
    if not os.path.exists(os.path.join(ctc_dir, "netmodel", "sinet.npz")):
        base = config_lib.load_configfile(base_dir + ".config")
        cfg = dict(base, exp_folder=ctc_dir, ctc_loss=0.05,
                   model_ckp=os.path.join(base_dir, "netmodel", "sinet"),
                   max_n_epochs=int(epochs_ctc),
                   n_earlystop_epochs=int(epochs_ctc))
        cfgp = ctc_dir + ".config"
        config_lib.save_configfile(cfg, cfgp)
        print(f"=== ctc=0.05 fine-tune ({epochs_ctc} epochs) ===", flush=True)
        summ = loop.train_or_exit(cfgp, corpus_cache=cache)
        print("ctc05 best_val", summ["best_val"], flush=True)

    config, stats, _, params = load_model_bundle(
        os.path.join(ctc_dir, "netmodel"), norm=True)
    files = sorted(glob.glob(os.path.join(D, "grouped", "test-set",
                                          "*.tfrecord")))[:12]
    waves, fmasks, vids, labels, batches = _collect(files, config, n_utts)
    out = {"study": "streaming + LC on the informative-video AV flagship",
           "chunk_frames": chunk, "lookahead_frames": look,
           "latency_ms": (chunk + look) * 12, "n_utts": int(len(waves))}

    out["per_offline"] = ctc_ops.per_metric(
        _offline_decode(config, stats, params, batches, n_utts), labels)
    out["stoi_offline"] = _mean_stoi(
        waves, _offline_wavs(config, stats, params, batches, n_utts))
    print("offline: PER", out["per_offline"], "STOI", out["stoi_offline"],
          flush=True)

    stoi_s, per_s = _stream_eval(
        config, stats, params, waves, fmasks, vids, labels, chunk, look)
    out["streaming_untrained"] = {"stoi": stoi_s, "per": per_s}
    print(f"streaming untrained @{(chunk+look)*12}ms: STOI {stoi_s:.4f} "
          f"PER {per_s:.4f}", flush=True)

    lc_dir = os.path.join(D, "exp_av_ctc05_lc")
    if not os.path.exists(os.path.join(lc_dir, "netmodel", "sinet.npz")):
        base = config_lib.load_configfile(ctc_dir + ".config")
        cfg = dict(base, exp_folder=lc_dir,
                   model_ckp=os.path.join(ctc_dir, "netmodel", "sinet"),
                   lc_chunk=chunk, lc_lookahead=look,
                   max_n_epochs=int(epochs_lc),
                   n_earlystop_epochs=int(epochs_lc))
        cfgp = lc_dir + ".config"
        config_lib.save_configfile(cfg, cfgp)
        print(f"=== LC-exact fine-tune ({epochs_lc} epochs) ===", flush=True)
        summ = loop.train_or_exit(cfgp, corpus_cache=cache)
        print("lc best_val", summ["best_val"], flush=True)

    config_lc, stats_lc, _, params_lc = load_model_bundle(
        os.path.join(lc_dir, "netmodel"), norm=True)
    stoi_lc, per_lc = _stream_eval(
        config_lc, stats_lc, params_lc, waves, fmasks, vids, labels,
        chunk, look)
    out["streaming_lc_trained"] = {"stoi": stoi_lc, "per": per_lc}
    print(f"LC-trained @{(chunk+look)*12}ms: STOI {stoi_lc:.4f} "
          f"PER {per_lc:.4f}", flush=True)

    with open(os.path.join(D, "informative_stream.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("INFORMATIVE_STREAM " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if len(a) > 0 else 60,
         int(a[1]) if len(a) > 1 else 10,
         int(a[2]) if len(a) > 2 else 64,
         dest=a[3] if len(a) > 3 else D)
