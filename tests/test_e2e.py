"""Full-pipeline end-to-end test through the CLI surface.

fixture -> stats -> train (SI + ASR) -> masking -> inference ->
inference_asr (masked + enhanced) -> inference_siasr -> evaluation.
This is the reference's whole workflow (SURVEY.md §3) on a synthetic
corpus, driven through the same subcommand surface as
speech_inpainting_main.py.
"""

import os
import shutil

import numpy as np
import pytest

from avsi import cli
from avsi import config as config_lib


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("e2e"))
    cli.main(["fixture", "-d", d, "-ns", "1", "-num", "5", "-al", "600",
              "-gm", "150", "-gs", "20"])
    cli.main([
        "audio_preprocessing", "-a", os.path.join(d, "syn", "training-set"),
        "-p", "target", "-o", os.path.join(d, "spec_norm"), "-t", "spec",
        "-ws", "24", "-ss", "12", "-fs", "512",
    ])
    cli.main([
        "audio_preprocessing", "-a", os.path.join(d, "syn", "training-set"),
        "-p", "target", "-o", os.path.join(d, "fbanks_norm"), "-t", "fbanks",
        "-ws", "24", "-ss", "12", "-fs", "512",
    ])
    return d


def _train(workdir, model, exp_name, is_asr=False, **kw):
    cfg = {
        "model": model,
        "audio_feat_dim": 257,
        "video_feat_dim": 136,
        "audio_len": 9600,
        "batch_size": 2,
        "net_dim": [16, 16],
        "dropout_rate": 0.0,
        "max_n_epochs": 2,
        "n_earlystop_epochs": 5,
        "optimizer_type": "adam",
        "starter_learning_rate": 0.003,
        "lr_decay": 1.0,
        "root_folder": os.path.join(workdir, "tfrecords"),
        "exp_folder": os.path.join(workdir, exp_name),
        "audio_feat_mean": os.path.join(
            workdir, ("fbanks_norm" if is_asr else "spec_norm") + "_mean.npy"
        ),
        "audio_feat_std": os.path.join(
            workdir, ("fbanks_norm" if is_asr else "spec_norm") + "_std.npy"
        ),
    }
    cfg.update(kw)
    path = os.path.join(workdir, exp_name + ".config")
    config_lib.save_configfile(cfg, path)
    cli.main(["training_asr" if is_asr else "training", "--config", path])
    return os.path.join(workdir, exp_name, "netmodel")


def test_full_pipeline(workdir):
    test_tfrecords = os.path.join(workdir, "tfrecords", "test-set")
    test_audio = os.path.join(workdir, "syn", "test-set")

    # 1. oracle-mask baseline (masking.py equivalent)
    cli.main([
        "masking", "-d", test_tfrecords, "-ad", test_audio,
        "-ns", "9600", "-bs", "2",
        "--feat_mean", os.path.join(workdir, "spec_norm_mean.npy"),
        "--feat_std", os.path.join(workdir, "spec_norm_std.npy"),
    ])
    sample_dirs = sorted(
        d for d in os.listdir(test_audio)
        if os.path.isdir(os.path.join(test_audio, d))
    )
    assert sample_dirs
    for s in sample_dirs:
        assert os.path.isfile(os.path.join(test_audio, s, "masked.wav"))

    # 2. train SI model + run inference
    si_ckpt = _train(workdir, "av-blstm", "exp_si")
    cli.main([
        "inference", "-d", test_tfrecords, "-ad", test_audio, "-ef", "avsi_test",
        "-m", si_ckpt, "-n", "-bs", "2", "--gl_iters", "8",
    ])
    for s in sample_dirs:
        wav_path = os.path.join(test_audio, s, "enhanced", "avsi_test.wav")
        assert os.path.isfile(wav_path)
        from avsi.utils import wav as wavio

        _, data = wavio.read_wav_int16(wav_path)
        assert len(data) == 50 * 192  # seq_len * 192 trim (inference.py:160)
        assert np.abs(data).max() > 0

    # 3. train ASR + transcribe masked and enhanced audio
    asr_ckpt = _train(workdir, "a-blstm", "exp_asr", is_asr=True)
    dict_file = os.path.join(workdir, "dictionary.txt")
    cli.main([
        "inference_asr", "-d", test_tfrecords, "-ad", test_audio, "-ef", "masked",
        "-m", asr_ckpt, "-n", "-am", "-bs", "2", "-df", dict_file,
    ])
    for s in sample_dirs:
        assert os.path.isfile(os.path.join(test_audio, s, "masked.lbl"))

    # 4. fused SI->ASR (writes enhanced wav + transcriptions/<prefix>.lbl)
    cli.main([
        "inference_siasr", "-d", test_tfrecords, "-ad", test_audio,
        "-ef", "avsi_test", "-ms", si_ckpt, "-mr", asr_ckpt, "-n",
        "-bs", "2", "-df", dict_file, "--gl_iters", "4",
    ])
    for s in sample_dirs:
        assert os.path.isfile(
            os.path.join(test_audio, s, "transcriptions", "avsi_test.lbl")
        )

    # 5. evaluation with masked baseline comparison -> CSV
    cli.main([
        "evaluation", "-ed", test_audio, "-ef", "avsi_test", "-o", "eval_out", "-me",
    ])
    csv_path = os.path.join(test_audio, "eval_out.csv")
    assert os.path.isfile(csv_path)
    header = open(csv_path).readline().strip().split(",")
    assert header[:4] == ["SAMPLE", "L1_MASK", "L1_ENH", "PESQ_MASK"]
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 1 + len(sample_dirs)

    # 6. checkpoint re-export CLI
    out_model = os.path.join(workdir, "exported", "sinet_infer")
    cli.main([
        "inference_model_generation", "--config", os.path.join(si_ckpt, "config.txt"),
        "--input_model", os.path.join(si_ckpt, "sinet"),
        "--output_model", out_model,
    ])
    assert os.path.isfile(out_model + ".npz")


def test_tfrecords_grouping(workdir):
    src = os.path.join(workdir, "tfrecords", "validation-set")
    dst = os.path.join(workdir, "tfrecords", "validation-grouped")
    cli.main(["tfrecords_grouping", "-i", src, "-o", dst, "-gs", "2"])
    from avsi.data.tfrecord import list_tfrecord_files, read_records

    files = list_tfrecord_files(dst)
    assert len(files) == 3  # 5 samples / group_size 2 -> 3 files
    n = sum(len(list(read_records(f))) for f in files)
    assert n == 5
