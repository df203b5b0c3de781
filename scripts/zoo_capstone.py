"""Model-zoo leaderboard at GRID scale: train several zoo families to
convergence on the FULL drill training split (29k utterances, one shared
device-cached corpus upload) and evaluate each with the identical
capstone protocol (fused SI->ASR against the trained judge, full
1,980-utterance held-out test split, STOI/PESQ/L1/PER + masked deltas).

Complements scripts/grid_capstone.py (which trains the AV flagship +
judge): reuses its exp_asr judge and masked-baseline wavs, so run it
first. Models cover the zoo's main axes at the 257-bin geometry —
conditioning {none, ssnn} x loss {L1, L1+CTC} x inputs {a, av} + the
two-steps composition. (unet twins have their own 128-bin anchors;
-emb needs embedding TFRecords the drill corpus doesn't carry.)

Usage: python scripts/zoo_capstone.py [drill_dir] [epochs] [model ...]
Writes <drill_dir>/zoo_capstone.json and prints ZOO_SUMMARY <json>.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MODELS = (
    "a-blstm-ssnn-ctc",   # audio-only MTL (the demo's ao_mtl) at convergence
    "av-blstm",           # plain BLSTM baseline family
    "av-blstm-ssnn",      # speaker conditioning, no CTC head
    "av-blstm-twosteps",  # v-net -> av-net composition
)


def main(dest="/dev/shm/grid_drill", epochs=60, models=DEFAULT_MODELS):
    from avsi import config as config_lib
    from avsi.eval import harness
    from avsi.infer import siasr
    from avsi.train import loop

    grouped = os.path.join(dest, "grouped")
    test_tfr = os.path.join(grouped, "test-set")
    test_audio = os.path.join(dest, "syn", "test-set")
    dict_file = os.path.join(dest, "dictionary.txt")
    spec = os.path.join(dest, "audio_spec")
    asr_ckpt = os.path.join(dest, "exp_asr", "netmodel")
    for req in (grouped, test_audio, dict_file, spec + "_mean.npy",
                os.path.join(asr_ckpt, "asrnet.npz")):
        if not os.path.exists(req):
            raise SystemExit(
                f"missing {req} — run grid_drill.py + grid_capstone.py first")

    corpus_cache: dict = {}  # ONE upload shared by every family
    out: dict = {}

    def family_config(model, exp):
        return {
            "model": model, "audio_feat_dim": 257, "video_feat_dim": 136,
            "audio_len": 48000, "batch_size": 128, "net_dim": [250, 250, 250],
            "integration_layer": 0, "dropout_rate": 0.0,
            "max_n_epochs": int(epochs), "n_earlystop_epochs": int(epochs),
            "optimizer_type": "adam", "starter_learning_rate": 0.001,
            "lr_decay": 1.0, "num_asr_labels": 33, "ctc_loss": 0.001,
            "compute_dtype": "bfloat16", "device_cache_corpus": 1,
            "root_folder": grouped, "exp_folder": os.path.join(dest, exp),
            "audio_feat_mean": spec + "_mean.npy",
            "audio_feat_std": spec + "_std.npy", "tb_media": 0,
        }

    def train_family(model, exp, extra=None):
        cfg = family_config(model, exp)
        cfg.update(extra or {})
        cfgp = os.path.join(dest, exp + ".config")
        config_lib.save_configfile(cfg, cfgp)
        return loop.train_or_exit(cfgp, corpus_cache=corpus_cache)

    for model in models:
        exp = f"exp_zoo_{model}"
        extra = {}
        if model == "av-blstm-twosteps":
            # the composition NEEDS a pre-trained, frozen v-blstm restored
            # via model_ckp_vnet (reference training.py:115-116,153-159;
            # the recipe scripts/twosteps_anchor.py uses) — without it the
            # av-net trains on top of a random frozen video net
            vnet_ckpt = os.path.join(dest, "exp_zoo_vnet", "netmodel", "sinet")
            if not os.path.exists(vnet_ckpt + ".npz"):
                print(f"=== {model}: pre-training vnet (v-blstm) ===",
                      flush=True)
                vsum = train_family("v-blstm", "exp_zoo_vnet")
                print(f"vnet best_val {vsum['best_val']}", flush=True)
            extra["model_ckp_vnet"] = vnet_ckpt

        print(f"=== {model}: training ({epochs} epochs) ===", flush=True)
        t0 = time.time()
        summary = train_family(model, exp, extra)
        train_s = round(time.time() - t0, 1)

        print(f"=== {model}: fused SI->ASR on 1980 test utterances ===",
              flush=True)
        t0 = time.time()
        prefix = f"zoo_{model}"
        siasr_res = siasr.infer(
            os.path.join(dest, exp, "netmodel"), asr_ckpt, test_tfr,
            test_audio, prefix, dict_file, norm=True, batch_size=128,
            gl_iters=30,
        )
        infer_s = round(time.time() - t0, 1)

        print(f"=== {model}: evaluation ===", flush=True)
        t0 = time.time()
        ev = harness.speech_inpainting_eval(
            test_audio, prefix, os.path.join(dest, f"zoo_eval_{model}"),
            masked_eval=True,
        )
        out[model] = {
            "best_val": summary["best_val"],
            "best_epoch": summary["best_epoch"],
            "per_enhanced": siasr_res["per"],
            "eval": {k: list(v) for k, v in ev.items()},
            "timings": {"train_s": train_s, "infer_s": infer_s,
                        "eval_s": round(time.time() - t0, 1)},
        }
        with open(os.path.join(dest, "zoo_capstone.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(f"ZOO_ROW {model} " + json.dumps(out[model]), flush=True)

    print("ZOO_SUMMARY " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        args[0] if args else "/dev/shm/grid_drill",
        int(args[1]) if len(args) > 1 else 60,
        tuple(args[2:]) if len(args) > 2 else DEFAULT_MODELS,
    )
