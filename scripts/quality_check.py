"""Quality gate: train a production-size model on a synthetic corpus and
verify the inpainting beats the masked baseline on STOI / L1 (and PESQ
when a binary is available).

This measures the anchors BASELINE.md calls for (the reference repo ships
no numbers): masked-baseline vs enhanced metrics on held-out samples, the
L1r / STOIi improvement deltas, at a configurable gap size.

Usage: python scripts/quality_check.py [workdir] [model] [epochs] [gap_ms]
Writes a JSON summary to <workdir>/quality.json.
"""

import json
import os
import sys



def main(workdir="/tmp/avsi_quality", model="av-blstm", epochs=25, gap_ms=400.0):
    from avsi import config as config_lib
    from avsi.data import fixture, stats as stats_lib
    from avsi.eval import harness
    from avsi.infer import inpaint, masking
    from avsi.train import loop

    os.makedirs(workdir, exist_ok=True)
    paths = fixture.make_fixture(
        workdir, n_speakers=2, n_samples=24, audio_len_ms=3000,
        gap_ms=gap_ms, gap_std_ms=gap_ms / 8,
    )
    stats_prefix = os.path.join(workdir, "spec_norm")
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", stats_prefix, "spec",
        window_size=24, step_size=12,
    )

    cfg = {
        "model": model, "audio_feat_dim": 257, "video_feat_dim": 136,
        "audio_len": 48000, "batch_size": 8, "net_dim": [250, 250, 250],
        "integration_layer": 0, "dropout_rate": 0.0, "max_n_epochs": int(epochs),
        "n_earlystop_epochs": int(epochs), "optimizer_type": "adam",
        "starter_learning_rate": 0.001, "lr_decay": 1.0,
        "num_asr_labels": 33, "ctc_loss": 0.001,
        "root_folder": paths["tfrecords"], "exp_folder": os.path.join(workdir, "exp"),
        "audio_feat_mean": stats_prefix + "_mean.npy",
        "audio_feat_std": stats_prefix + "_std.npy",
        "tb_media": 0,
    }
    cfg_path = os.path.join(workdir, "train.config")
    config_lib.save_configfile(cfg, cfg_path)
    train_summary = loop.train_or_exit(cfg_path)

    test_tfr = os.path.join(paths["tfrecords"], "test-set")
    test_audio = os.path.join(workdir, "syn", "test-set")
    mask_res = masking.mask_app(
        test_tfr, test_audio, oracle_phase=False, num_audio_samples=48000,
        batch_size=8,
        feat_mean_file=stats_prefix + "_mean.npy",
        feat_std_file=stats_prefix + "_std.npy",
    )
    inf_res = inpaint.infer(
        os.path.join(workdir, "exp", "netmodel"), test_tfr, test_audio,
        "qcheck", norm=True, batch_size=8, phase_recon="gl", gl_iters=30,
    )
    # PER-free surface: no ASR runs here, so the PER columns of
    # speech_inpainting_eval would degenerate to 1.0 and pollute quality.json
    eval_summary = harness.speech_enhancement_eval(
        test_audio, "qcheck", "qcheck_eval", masked_eval=True,
    )
    out = {
        "train": train_summary,
        "masked_loss_hole": mask_res["loss_hole"],
        "model_loss_hole": inf_res["loss_hole"],
        "eval": {k: list(v) for k, v in eval_summary.items()},
    }
    with open(os.path.join(workdir, "quality.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("QUALITY_SUMMARY " + json.dumps(out))
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        args[0] if len(args) > 0 else "/tmp/avsi_quality",
        args[1] if len(args) > 1 else "av-blstm",
        int(args[2]) if len(args) > 2 else 25,
        float(args[3]) if len(args) > 3 else 400.0,
    )
