"""Rebuild the exp_si -> exp_si_ctc -> LC-exact chain on a fresh drill corpus.

The round-3 BASELINE row "LC-trained C=8/L=16, exact window-space trainer
(PER 0.191)" was measured BEFORE the causal-ssnn fix (the LC trainer then
conditioned the ssnn fold on the whole-utterance embedding; serving computes
it causally per window).  The drill corpus is seed-deterministic, so this
script reproduces the identical chain end-to-end and re-measures the row
with the trainer that now matches serving exactly:

  1. exp_si      — capstone-recipe flagship, 12 epochs, 10,240-utt subset
                   (grid_capstone.py cfg, same hyperparameters)
  2. exp_si_ctc  — +60 epochs at ctc_loss=0.05 (stream_transcripts.py recipe),
                   sharing exp_si's device-resident corpus upload
  3. lc_remeasure.main() — 10-epoch LC fine-tune (window-space trainer,
                   now causal-ssnn) + streaming STOI/PER on the same 64
                   held-out utterances

Usage: python scripts/rebuild_lc_chain.py [drill_dir]
Writes /dev/shm/grid_drill/stream_levers_exact.json (via lc_remeasure).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grid_capstone import make_subset  # noqa: E402
import lc_remeasure  # noqa: E402


def main(dest="/dev/shm/grid_drill"):
    from avsi import config as config_lib
    from avsi.train import loop

    grouped = os.path.join(dest, "grouped")
    train_root = make_subset(grouped, dest, 640, 16)
    spec = os.path.join(dest, "audio_spec")

    common = {
        "model": "av-blstm-ssnn-ctc", "audio_feat_dim": 257,
        "video_feat_dim": 136, "audio_len": 48000, "batch_size": 128,
        "net_dim": [250, 250, 250], "integration_layer": 0,
        "dropout_rate": 0.0, "optimizer_type": "adam",
        "starter_learning_rate": 0.001, "lr_decay": 1.0,
        "num_asr_labels": 33, "compute_dtype": "bfloat16",
        "device_cache_corpus": 1, "root_folder": train_root,
        "audio_feat_mean": spec + "_mean.npy",
        "audio_feat_std": spec + "_std.npy", "tb_media": 0,
    }
    cache: dict = {}

    si_dir = os.path.join(dest, "exp_si")
    if not os.path.exists(os.path.join(si_dir, "netmodel", "sinet.npz")):
        cfgp = os.path.join(dest, "exp_si.config")
        config_lib.save_configfile(
            dict(common, exp_folder=si_dir, ctc_loss=0.001,
                 max_n_epochs=12, n_earlystop_epochs=12), cfgp)
        t0 = time.time()
        print("=== training exp_si (12 epochs) ===", flush=True)
        summ = loop.train_or_exit(cfgp, corpus_cache=cache)
        print(f"exp_si best_val {summ['best_val']} ({time.time()-t0:.0f}s)",
              flush=True)

    ctc_dir = os.path.join(dest, "exp_si_ctc")
    if not os.path.exists(os.path.join(ctc_dir, "netmodel", "sinet.npz")):
        cfgp = os.path.join(dest, "exp_si_ctc.config")
        config_lib.save_configfile(
            dict(common, exp_folder=ctc_dir, ctc_loss=0.05,
                 model_ckp=os.path.join(si_dir, "netmodel", "sinet"),
                 max_n_epochs=60, n_earlystop_epochs=60), cfgp)
        t0 = time.time()
        print("=== fine-tuning exp_si_ctc (60 epochs, ctc=0.05) ===", flush=True)
        summ = loop.train_or_exit(cfgp, corpus_cache=cache)
        print(f"exp_si_ctc best_val {summ['best_val']} ({time.time()-t0:.0f}s)",
              flush=True)

    del cache
    print("=== LC re-measure (causal-ssnn window-space trainer) ===", flush=True)
    lc_remeasure.main(drill_dir=dest)


if __name__ == "__main__":
    main(*sys.argv[1:2])
