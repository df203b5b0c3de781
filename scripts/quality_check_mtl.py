"""Full MTL pipeline quality gate: the reference's headline workflow.

Trains BOTH models and runs the complete chain on a synthetic phoneme-coded
corpus:
  1. ASR (`a-blstm`, log-mel front-end) on clean audio      -> asrnet
  2. SI flagship (`av-blstm-ssnn-ctc`, MTL)                 -> sinet
  3. oracle-mask baseline                                   -> masked.wav
  4. ASR on masked audio (`--apply_mask`)                   -> masked.lbl
  5. fused SI->ASR inference                                -> enhanced wav +
                                                               transcriptions/
  6. evaluation with PER columns                            -> PERr etc.

This exercises training_asr, training(_ctc), masking, inference_asr,
inference_siasr and evaluation end-to-end (= the reference's
inference_siasr_eval_batch.sh flow).

Usage: python scripts/quality_check_mtl.py [workdir] [epochs]
"""

import json
import os
import sys



def main(workdir="/tmp/avsi_mtl", epochs=30):
    from avsi import config as config_lib
    from avsi.data import fixture, stats as stats_lib
    from avsi.eval import harness
    from avsi.infer import asr as asr_infer, masking, siasr
    from avsi.train import loop

    os.makedirs(workdir, exist_ok=True)
    paths = fixture.make_fixture(
        workdir, n_speakers=2, n_samples=40, audio_len_ms=3000,
        gap_ms=400.0, gap_std_ms=50.0,
    )
    spec_prefix = os.path.join(workdir, "spec_norm")
    fb_prefix = os.path.join(workdir, "fbanks_norm")
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", spec_prefix, "spec", window_size=24, step_size=12
    )
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", fb_prefix, "fbanks", window_size=24, step_size=12
    )

    def cfg(model, exp, mean, std, **kw):
        c = {
            "model": model, "audio_feat_dim": 257, "video_feat_dim": 136,
            "audio_len": 48000, "batch_size": 8, "net_dim": [250, 250, 250],
            "integration_layer": 0, "dropout_rate": 0.0,
            "max_n_epochs": int(epochs), "n_earlystop_epochs": int(epochs),
            "optimizer_type": "adam", "starter_learning_rate": 0.001,
            "lr_decay": 1.0, "num_asr_labels": 33, "ctc_loss": 0.001,
            "root_folder": paths["tfrecords"],
            "exp_folder": os.path.join(workdir, exp),
            "audio_feat_mean": mean, "audio_feat_std": std, "tb_media": 0,
        }
        c.update(kw)
        p = os.path.join(workdir, exp + ".config")
        config_lib.save_configfile(c, p)
        return p

    print("=== training ASR ===", flush=True)
    asr_cfg = cfg("a-blstm", "exp_asr", fb_prefix + "_mean.npy", fb_prefix + "_std.npy",
                  net_dim=[250, 250])
    asr_summary = loop.train_or_exit(asr_cfg, is_asr=True)

    print("=== training SI (MTL flagship) ===", flush=True)
    si_cfg = cfg("av-blstm-ssnn-ctc", "exp_si", spec_prefix + "_mean.npy",
                 spec_prefix + "_std.npy")
    si_summary = loop.train_or_exit(si_cfg)

    test_tfr = os.path.join(paths["tfrecords"], "test-set")
    test_audio = os.path.join(workdir, "syn", "test-set")
    dict_file = paths["dictionary"]
    asr_ckpt = os.path.join(workdir, "exp_asr", "netmodel")
    si_ckpt = os.path.join(workdir, "exp_si", "netmodel")

    print("=== masking baseline ===", flush=True)
    masking.mask_app(
        test_tfr, test_audio, oracle_phase=False, num_audio_samples=48000,
        batch_size=8,
        feat_mean_file=spec_prefix + "_mean.npy", feat_std_file=spec_prefix + "_std.npy",
    )
    print("=== ASR on masked audio ===", flush=True)
    masked_asr = asr_infer.infer(
        asr_ckpt, test_tfr, test_audio, "masked", dict_file,
        apply_mask=True, norm=True, batch_size=8,
    )
    print("=== ASR on clean audio (upper anchor) ===", flush=True)
    clean_asr = asr_infer.infer(
        asr_ckpt, test_tfr, test_audio, "clean", dict_file,
        apply_mask=False, norm=True, batch_size=8,
    )
    print("=== fused SI->ASR ===", flush=True)
    siasr_res = siasr.infer(
        si_ckpt, asr_ckpt, test_tfr, test_audio, "mtl", dict_file,
        norm=True, batch_size=8, gl_iters=30,
    )
    print("=== evaluation ===", flush=True)
    eval_summary = harness.speech_inpainting_eval(
        test_audio, "mtl", "mtl_eval", masked_eval=True,
    )
    out = {
        "asr_train": asr_summary,
        "si_train": si_summary,
        "per_clean": clean_asr["per"],
        "per_masked": masked_asr["per"],
        "per_enhanced": siasr_res["per"],
        "eval": {k: list(v) for k, v in eval_summary.items()},
    }
    with open(os.path.join(workdir, "quality_mtl.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("MTL_QUALITY_SUMMARY " + json.dumps(out))
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        args[0] if args else "/tmp/avsi_mtl",
        int(args[1]) if len(args) > 1 else 30,
    )
