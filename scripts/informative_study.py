"""AV > A at convergence with phoneme-informative video.

The full-29k zoo leaderboard (zoo_capstone_r3.json) showed that on
ENVELOPE-only video the converged audio-only MTL matches the AV families
to 0.003 STOI — the r2 +0.080 AV advantage was an undertraining
artifact. The paper's central claim (AV > A, its Tables 1-3) rests on
video that carries phoneme identity (lip shapes). This study builds a
mid-scale corpus with `video_informative=True` (each phoneme gets a
distinct mouth-landmark configuration — fixture.py) and trains the
audio-only and AV MTL flagships with the identical convergence recipe,
plus a fresh ASR judge, then runs the capstone protocol on the held-out
split.

Usage: python scripts/informative_study.py [--freeform] [dest] [epochs]
                                           [speakers]
                                           [train_utts val_utts test_utts]
--freeform swaps the reference's full-band time gaps for irregular
free-form T-F holes (same ~27% coverage; data/masks.get_freeform_mask) —
the anchor for the avsi mask_kind extension on the MAIN 257-bin BLSTM
family (the unet twins have their own in unet_freeform_r3.json).
Writes <dest>/informative_study.json and prints INFORMATIVE_SUMMARY.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(dest="/dev/shm/informative", epochs=60, speakers=33,
         utts=(300, 20, 20),
         models=("a-blstm-ssnn-ctc", "av-blstm-ssnn-ctc"),
         mask_kind="timegap"):
    from avsi import config as config_lib
    from avsi.data import stats as stats_lib
    from avsi.data.fixture import make_fixture
    from avsi.data.generator import group_tfrecords
    from avsi.eval import harness
    from avsi.infer import asr as asr_infer, masking, siasr
    from avsi.train import loop

    t_all = time.time()
    grouped = os.path.join(dest, "grouped")
    meta_path = os.path.join(dest, "corpus_meta.json")
    if os.path.isdir(grouped):
        # a pre-existing corpus is only reusable if it was built with the
        # SAME mask kind AND finished building — silently reusing a timegap
        # (or half-built) corpus for --freeform would mislabel the study
        meta = {"mask_kind": "timegap", "complete": True}  # pre-stamp corpora
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        built_kind = meta.get("mask_kind", "timegap")
        if built_kind != mask_kind:
            raise SystemExit(
                f"{dest} holds a {built_kind!r} corpus but this run wants "
                f"{mask_kind!r} — use a different dest or delete it"
            )
        if not meta.get("complete", False):
            raise SystemExit(
                f"{dest} holds an INCOMPLETE {built_kind!r} corpus (a prior "
                "build crashed mid-way) — delete it and rerun"
            )
    else:
        print(f"=== corpus: {speakers} speakers x {utts} (informative video) "
              "===", flush=True)
        # stamp the mask kind BEFORE building so a crash mid-build can never
        # leave a meta-less corpus a later run mistakes for timegap+complete
        with open(meta_path, "w") as f:
            json.dump({"mask_kind": mask_kind, "complete": False}, f)
        make_fixture(dest, n_speakers=speakers, n_samples=tuple(utts),
                     seed=21, gap_ms=800.0, gap_std_ms=100.0,
                     video_informative=True, mask_kind=mask_kind)
        src = os.path.join(dest, "syn", "training-set")
        stats_lib.compute_mean_std_features(
            src, "target", os.path.join(dest, "audio_spec"), feat_type="spec")
        stats_lib.compute_mean_std_features(
            src, "target", os.path.join(dest, "audio_fbanks"),
            feat_type="fbanks")
        for split in ("training-set", "validation-set", "test-set"):
            group_tfrecords(os.path.join(dest, "tfrecords", split),
                            os.path.join(grouped, split), group_size=16,
                            delete_input_dir=True)
        with open(meta_path, "w") as f:
            json.dump({"mask_kind": mask_kind, "complete": True}, f)
    print(f"corpus ready ({time.time()-t_all:.0f}s)", flush=True)

    spec = os.path.join(dest, "audio_spec")
    fbanks = os.path.join(dest, "audio_fbanks")
    test_tfr = os.path.join(grouped, "test-set")
    test_audio = os.path.join(dest, "syn", "test-set")
    dict_file = os.path.join(dest, "dictionary.txt")

    def cfg(model, exp, mean, std, n_epochs, **kw):
        c = {
            "model": model, "audio_feat_dim": 257, "video_feat_dim": 136,
            "audio_len": 48000, "batch_size": 128, "net_dim": [250, 250, 250],
            "integration_layer": 0, "dropout_rate": 0.0,
            "max_n_epochs": int(n_epochs), "n_earlystop_epochs": int(n_epochs),
            "optimizer_type": "adam", "starter_learning_rate": 0.001,
            "lr_decay": 1.0, "num_asr_labels": 33, "ctc_loss": 0.001,
            "compute_dtype": "bfloat16", "device_cache_corpus": 1,
            "root_folder": grouped, "exp_folder": os.path.join(dest, exp),
            "audio_feat_mean": mean, "audio_feat_std": std, "tb_media": 0,
        }
        c.update(kw)
        p = os.path.join(dest, exp + ".config")
        config_lib.save_configfile(c, p)
        return p

    cache: dict = {}
    out: dict = {"speakers": speakers, "utts": list(utts), "epochs": epochs,
                 "mask_kind": mask_kind}

    asr_ckpt = os.path.join(dest, "exp_asr", "netmodel")
    if os.path.exists(os.path.join(asr_ckpt, "asrnet.npz")):
        print("=== reusing trained ASR judge ===", flush=True)
        out["judge"] = {"note": "reused existing exp_asr checkpoint"}
    else:
        print("=== training ASR judge ===", flush=True)
        judge_cfg = cfg("a-blstm", "exp_asr", fbanks + "_mean.npy",
                        fbanks + "_std.npy", 8, net_dim=[250, 250],
                        frame_stack=3)
        out["judge"] = loop.train_or_exit(judge_cfg, is_asr=True,
                                          corpus_cache=cache)

    print("=== masking baseline ===", flush=True)
    masking.mask_app(
        test_tfr, test_audio, oracle_phase=False, num_audio_samples=48000,
        batch_size=128, feat_mean_file=spec + "_mean.npy",
        feat_std_file=spec + "_std.npy",
    )
    out["per_clean"] = asr_infer.infer(
        asr_ckpt, test_tfr, test_audio, "clean", dict_file,
        apply_mask=False, norm=True, batch_size=128)["per"]
    # judge the masked baseline too, or the harness's per_masked column
    # degenerates to 1.0 (no masked transcriptions on disk)
    out["per_masked"] = asr_infer.infer(
        asr_ckpt, test_tfr, test_audio, "masked", dict_file,
        apply_mask=True, norm=True, batch_size=128)["per"]

    for model in models:
        exp = f"exp_{model}"
        extra = {}
        if model == "av-blstm-twosteps":
            # the composition NEEDS a pre-trained frozen v-blstm restored via
            # model_ckp_vnet (reference training.py:115-116,153-159); without
            # it the av-net trains on a random frozen video net
            vnet_ckpt = os.path.join(dest, "exp_vnet", "netmodel", "sinet")
            if not os.path.exists(vnet_ckpt + ".npz"):
                print("=== pre-training vnet (v-blstm) ===", flush=True)
                vsum = loop.train_or_exit(
                    cfg("v-blstm", "exp_vnet", spec + "_mean.npy",
                        spec + "_std.npy", epochs),
                    corpus_cache=cache,
                )
                print(f"vnet best_val {vsum['best_val']}", flush=True)
            extra["model_ckp_vnet"] = vnet_ckpt
        print(f"=== {model}: {epochs} epochs ===", flush=True)
        t0 = time.time()
        summary = loop.train_or_exit(
            cfg(model, exp, spec + "_mean.npy", spec + "_std.npy", epochs,
                **extra),
            corpus_cache=cache,
        )
        prefix = f"inf_{model}"
        res = siasr.infer(
            os.path.join(dest, exp, "netmodel"), asr_ckpt, test_tfr,
            test_audio, prefix, dict_file, norm=True, batch_size=128,
            gl_iters=30,
        )
        ev = harness.speech_inpainting_eval(
            test_audio, prefix, os.path.join(dest, f"eval_{model}"),
            masked_eval=True,
        )
        out[model] = {
            "best_val": summary["best_val"], "best_epoch": summary["best_epoch"],
            "per_enhanced": res["per"],
            "eval": {k: list(v) for k, v in ev.items()},
            "wall_s": round(time.time() - t0, 1),
        }
        with open(os.path.join(dest, "informative_study.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(f"ROW {model} " + json.dumps(out[model]), flush=True)

    print("INFORMATIVE_SUMMARY " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    kind = "timegap"
    if a and a[0] == "--freeform":
        kind = "freeform"
        a = a[1:]
    if len(a) in (4, 5):
        # a partial utts triple would otherwise be silently dropped
        raise SystemExit(
            "usage: informative_study.py [dir] [epochs] [speakers] "
            "[train_utts val_utts test_utts] [model ...] — give all three "
            "utterance counts or none"
        )
    main(
        a[0] if a else "/dev/shm/informative",
        int(a[1]) if len(a) > 1 else 60,
        int(a[2]) if len(a) > 2 else 33,
        tuple(int(x) for x in a[3:6]) if len(a) > 5 else (300, 20, 20),
        tuple(a[6:]) if len(a) > 6 else
        ("a-blstm-ssnn-ctc", "av-blstm-ssnn-ctc"),
        mask_kind=kind,
    )
