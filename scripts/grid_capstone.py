"""GRID-scale quality capstone: train + evaluate at the reference's corpus
size (29k train / 2k val / 2k test utterances, 800 ms gaps).

Runs on the corpus prepared by scripts/grid_drill.py (grouped TFRecords +
feature stats + kept syn/test-set sample dirs) and mirrors the round-1
quality_check_mtl.py protocol — ASR judge, MTL flagship, masking baseline,
fused SI->ASR inference, evaluation CSV — but at 29x the training-set size,
with the device-resident corpus cache (`device_cache_corpus=1`) so epochs
after the first run at device speed.

Usage: python scripts/grid_capstone.py [drill_dir] [epochs_si] [epochs_asr]
                                       [subset_train_files] [subset_val_files]
Prints CAPSTONE_SUMMARY <json> at the end.

The SI flagship and the ASR judge share ONE device-resident corpus upload
(loop.train's corpus_cache) — on a relayed host<->device link the upload
dominates everything else, so it is paid once.  subset_train_files > 0
trains on the first K grouped files (16 utterances each) instead of the
full 1815; evaluation always runs on the full held-out test split.
"""

import json
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_subset(grouped: str, dest: str, k_train: int, k_val: int) -> str:
    """Symlink the first K grouped TFRecord files per split (16 utts/file)."""
    sub = os.path.join(dest, f"grouped_sub_{k_train}_{k_val}")
    for split, k in (("training-set", k_train), ("validation-set", k_val)):
        sdir = os.path.join(sub, split)
        os.makedirs(sdir, exist_ok=True)
        for f in sorted(glob(os.path.join(grouped, split, "*.tfrecord")))[:k]:
            link = os.path.join(sdir, os.path.basename(f))
            if not os.path.exists(link):
                os.symlink(f, link)
    return sub


def main(dest="/dev/shm/grid_drill", epochs_si=10, epochs_asr=4,
         subset_train=0, subset_val=0):
    from avsi import config as config_lib
    from avsi.eval import harness
    from avsi.infer import asr as asr_infer, masking, siasr
    from avsi.train import loop

    grouped = os.path.join(dest, "grouped")
    train_root = grouped
    if subset_train:
        train_root = make_subset(grouped, dest, subset_train, subset_val or 16)
    test_tfr = os.path.join(grouped, "test-set")
    test_audio = os.path.join(dest, "syn", "test-set")
    dict_file = os.path.join(dest, "dictionary.txt")
    spec = os.path.join(dest, "audio_spec")
    fbanks = os.path.join(dest, "audio_fbanks")
    for req in (grouped, test_audio, dict_file, spec + "_mean.npy"):
        if not os.path.exists(req):
            raise SystemExit(f"missing {req} — run scripts/grid_drill.py first")

    def cfg(model, exp, mean, std, epochs, **kw):
        c = {
            "model": model, "audio_feat_dim": 257, "video_feat_dim": 136,
            "audio_len": 48000, "batch_size": 128, "net_dim": [250, 250, 250],
            "integration_layer": 0, "dropout_rate": 0.0,
            "max_n_epochs": int(epochs), "n_earlystop_epochs": int(epochs),
            "optimizer_type": "adam", "starter_learning_rate": 0.001,
            "lr_decay": 1.0, "num_asr_labels": 33, "ctc_loss": 0.001,
            "compute_dtype": "bfloat16", "device_cache_corpus": 1,
            "root_folder": train_root,
            "exp_folder": os.path.join(dest, exp),
            "audio_feat_mean": mean, "audio_feat_std": std, "tb_media": 0,
        }
        c.update(kw)
        p = os.path.join(dest, exp + ".config")
        config_lib.save_configfile(c, p)
        return p

    timings = {}

    corpus_cache: dict = {}  # ONE corpus upload shared by both trainings

    print("=== training ASR judge ===", flush=True)
    t0 = time.time()
    asr_cfg = cfg("a-blstm", "exp_asr", fbanks + "_mean.npy", fbanks + "_std.npy",
                  epochs_asr, net_dim=[250, 250], frame_stack=3)
    asr_summary = loop.train_or_exit(asr_cfg, is_asr=True, corpus_cache=corpus_cache)
    timings["asr_train_s"] = round(time.time() - t0, 1)

    print("=== training SI flagship (cached corpus) ===", flush=True)
    t0 = time.time()
    si_cfg = cfg("av-blstm-ssnn-ctc", "exp_si", spec + "_mean.npy",
                 spec + "_std.npy", epochs_si)
    si_summary = loop.train_or_exit(si_cfg, corpus_cache=corpus_cache)
    timings["si_train_s"] = round(time.time() - t0, 1)

    asr_ckpt = os.path.join(dest, "exp_asr", "netmodel")
    si_ckpt = os.path.join(dest, "exp_si", "netmodel")

    print("=== masking baseline (1980 test utterances) ===", flush=True)
    t0 = time.time()
    masking.mask_app(
        test_tfr, test_audio, oracle_phase=False, num_audio_samples=48000,
        batch_size=128,
        feat_mean_file=spec + "_mean.npy", feat_std_file=spec + "_std.npy",
    )
    timings["masking_s"] = round(time.time() - t0, 1)

    print("=== ASR on masked / clean audio ===", flush=True)
    t0 = time.time()
    masked_asr = asr_infer.infer(
        asr_ckpt, test_tfr, test_audio, "masked", dict_file,
        apply_mask=True, norm=True, batch_size=128,
    )
    clean_asr = asr_infer.infer(
        asr_ckpt, test_tfr, test_audio, "clean", dict_file,
        apply_mask=False, norm=True, batch_size=128,
    )
    timings["asr_infer_s"] = round(time.time() - t0, 1)

    print("=== fused SI->ASR inference ===", flush=True)
    t0 = time.time()
    siasr_res = siasr.infer(
        si_ckpt, asr_ckpt, test_tfr, test_audio, "mtl", dict_file,
        norm=True, batch_size=128, gl_iters=30,
    )
    timings["siasr_s"] = round(time.time() - t0, 1)

    print("=== evaluation (STOI/PESQ/L1/PER + masked deltas) ===", flush=True)
    t0 = time.time()
    eval_summary = harness.speech_inpainting_eval(
        test_audio, "mtl", os.path.join(dest, "capstone_eval"), masked_eval=True,
    )
    timings["eval_s"] = round(time.time() - t0, 1)

    out = {
        "asr_train": asr_summary,
        "si_train": si_summary,
        "per_clean": clean_asr["per"],
        "per_masked": masked_asr["per"],
        "per_enhanced": siasr_res["per"],
        "eval": {k: list(v) for k, v in eval_summary.items()},
        "timings": timings,
    }
    with open(os.path.join(dest, "capstone.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("CAPSTONE_SUMMARY " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        args[0] if args else "/dev/shm/grid_drill",
        int(args[1]) if len(args) > 1 else 10,
        int(args[2]) if len(args) > 2 else 4,
        int(args[3]) if len(args) > 3 else 0,
        int(args[4]) if len(args) > 4 else 0,
    )
