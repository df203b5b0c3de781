"""Fair quality anchor for `av-blstm-twosteps` (round-2 verdict item #5).

The round-2 anchor measured the two-steps composition on envelope-only
video, where its v-net input carries no phonetic content and the model
cannot win by design.  This study evaluates it where it is on-design: the
`video_informative` corpus (phoneme-coded mouth landmarks), long gaps —
the regime where the v-net's prediction actually carries the missing
content (reference StackedBLSTM2StepsModel, models.py:240-317).

Recipe: train the plain v-blstm vnet, then the frozen-vnet composition
(training.py:115-166 workflow), sharing ONE device-cached corpus upload;
infer on the held-out test set; evaluate STOI/PESQ/L1 vs the masked
baseline (PER-free schema — the corpus ships no ASR judge).

Usage: python scripts/twosteps_anchor.py [corpus_base] [epochs]
corpus_base defaults to /dev/shm/av_inf (the round-2 video_informative
corpus: 8 speakers x 250 train / 320 held-out test, 1600 ms gaps).
Writes <corpus_base>/twosteps_anchor.json.
"""

import json
import os
import sys


def main(base="/dev/shm/av_inf", epochs=20):
    from avsi import config as config_lib
    from avsi.eval import harness
    from avsi.infer import inpaint
    from avsi.train import loop

    common = {
        "audio_feat_dim": 257, "video_feat_dim": 136, "audio_len": 48000,
        "batch_size": 100, "net_dim": [250, 250, 250],
        "integration_layer": 0, "dropout_rate": 0.0,
        "max_n_epochs": int(epochs), "n_earlystop_epochs": int(epochs),
        "optimizer_type": "adam", "starter_learning_rate": 0.001,
        "lr_decay": 1.0, "compute_dtype": "bfloat16",
        "device_cache_corpus": 1, "tb_media": 0,
        "root_folder": os.path.join(base, "tfrecords"),
        "audio_feat_mean": os.path.join(base, "spec_mean.npy"),
        "audio_feat_std": os.path.join(base, "spec_std.npy"),
    }
    cache = {}
    vcfg = dict(common, model="v-blstm", exp_folder=os.path.join(base, "exp_v_plain"))
    vp = os.path.join(base, "exp_v_plain.config")
    config_lib.save_configfile(vcfg, vp)
    print("=== training vnet (v-blstm)", flush=True)
    vsum = loop.train_or_exit(vp, corpus_cache=cache)
    print("vnet best_val", vsum["best_val"], flush=True)

    tcfg = dict(
        common, model="av-blstm-twosteps",
        exp_folder=os.path.join(base, "exp_2steps"),
        model_ckp_vnet=os.path.join(base, "exp_v_plain", "netmodel", "sinet"),
    )
    tp = os.path.join(base, "exp_2steps.config")
    config_lib.save_configfile(tcfg, tp)
    print("=== training av-blstm-twosteps (frozen vnet)", flush=True)
    tsum = loop.train_or_exit(tp, corpus_cache=cache)
    print("twosteps best_val", tsum["best_val"], flush=True)

    print("=== inference on held-out test set", flush=True)
    res = inpaint.infer(
        os.path.join(base, "exp_2steps", "netmodel"),
        os.path.join(base, "tfrecords", "test-set"),
        os.path.join(base, "syn", "test-set"),
        "twosteps_fair", norm=True, batch_size=32,
        phase_recon="gl", gl_iters=50,
    )
    print("infer:", res, flush=True)

    print("=== evaluation (enhanced vs masked)", flush=True)
    summary = harness.speech_enhancement_eval(
        os.path.join(base, "syn", "test-set"), "twosteps_fair",
        os.path.join(base, "eval_twosteps_fair"),
        masked_eval=True, window_size=24, step_size=12, num_workers=4,
    )
    out = {
        "study": "twosteps fair anchor (video_informative, 1600 ms gaps)",
        "vnet_best_val": float(vsum["best_val"]),
        "twosteps_best_val": float(tsum["best_val"]),
        "eval": {k: list(map(float, v)) for k, v in summary.items()},
    }
    with open(os.path.join(base, "twosteps_anchor.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:] and [sys.argv[1]] or []),
         **({"epochs": int(sys.argv[2])} if len(sys.argv) > 2 else {}))
