"""Re-measure the LC-trained streaming row with the window-space LC
trainer (core.lc_blstm_stack).

The round-3 BASELINE row "LC-trained C=8/L=16" was fine-tuned with the
earlier per-layer LC composition, which for >=2-layer stacks diverged
from the served function at the windows' lookahead frames (upper layers
saw finalized lower-layer values instead of the window-local
recomputations the server feeds them) and at the zero-padded tail.  The
window-space rewrite makes train == serve bit-for-bit (see
tests/test_lc_training.py), so the fine-tune is repeated from the same
base checkpoint with everything else identical, and the 288 ms
streaming STOI/PER re-measured on the same 64 held-out utterances.

Usage: python scripts/lc_remeasure.py [epochs_lc] [n_utts]
Writes /dev/shm/grid_drill/stream_levers_exact.json.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lc_study import _collect, _mean_stoi  # noqa: E402
from stream_per_levers import _stream_eval  # noqa: E402

D = "/dev/shm/grid_drill"


def main(epochs_lc=10, n_utts=64, chunk=8, look=16, drill_dir=None):
    from avsi import config as config_lib
    from avsi.infer.inpaint import load_model_bundle
    from avsi.train import loop
    from avsi.ops import ctc as ctc_ops  # noqa: F401  (import check early)

    D = drill_dir or globals()["D"]
    base_dir = os.path.join(D, "exp_si_ctc")
    config, stats, _, params = load_model_bundle(
        os.path.join(base_dir, "netmodel"), norm=True)
    files = sorted(glob.glob(os.path.join(D, "grouped", "test-set", "*.tfrecord")))[:12]
    waves, fmasks, vids, labels, _ = _collect(files, config, n_utts)

    exp = os.path.join(D, "exp_si_ctc_lc_exact")
    ckpt = os.path.join(exp, "netmodel", "sinet.npz")
    if not os.path.exists(ckpt):
        base = config_lib.load_configfile(base_dir + ".config")
        cfg = dict(
            base, exp_folder=exp,
            model_ckp=os.path.join(base_dir, "netmodel", "sinet"),
            lc_chunk=chunk, lc_lookahead=look,
            max_n_epochs=int(epochs_lc), n_earlystop_epochs=int(epochs_lc),
        )
        cfgp = exp + ".config"
        config_lib.save_configfile(cfg, cfgp)
        print("=== LC fine-tune (window-space trainer):", cfgp, flush=True)
        summ = loop.train_or_exit(cfgp)
        print("lc best_val", summ["best_val"], flush=True)

    out = {"study": "LC fine-tune with the exact window-space trainer",
           "chunk_frames": chunk, "lookahead_frames": look,
           "latency_ms": (chunk + look) * 12, "epochs": int(epochs_lc),
           "n_utts": int(len(waves))}
    config_lc, stats_lc, _, params_lc = load_model_bundle(
        os.path.join(exp, "netmodel"), norm=True)
    stoi, per = _stream_eval(
        config_lc, stats_lc, params_lc, waves, fmasks, vids, labels, chunk, look)
    out["lc_exact_trained"] = {"stoi": stoi, "per": per}
    print(f"LC-exact-trained @{(chunk+look)*12}ms: STOI {stoi:.4f} PER {per:.4f}",
          flush=True)

    with open(os.path.join(D, "stream_levers_exact.json"), "w") as f:
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
