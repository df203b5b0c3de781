"""Every inpainting model in the zoo trains one epoch through the real
trainer on the fixture corpus (the reference's 15-way dispatch + unet +
twosteps), plus the ASR trainer. Catches wiring regressions unit shapes
miss (optimizer masks, reader embedding plumbing, checkpoint writes)."""

import os

import numpy as np
import pytest

from avsi import config as config_lib
from avsi.data import fixture, stats as stats_lib
from avsi.models import registry
from avsi.train import loop


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zoo"))
    paths = fixture.make_fixture(
        d, n_speakers=1, n_samples=4, audio_len_ms=600, gap_ms=150.0,
        gap_std_ms=20.0, with_embeddings=True,
    )
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", os.path.join(d, "sn"), "spec",
        window_size=24, step_size=12,
    )
    paths["mean"] = os.path.join(d, "sn_mean.npy")
    paths["std"] = os.path.join(d, "sn_std.npy")
    paths["base"] = d
    return paths


@pytest.mark.parametrize("model", registry.BLSTM_NAMES + ["av-blstm-twosteps"])
def test_one_epoch(corpus, tmp_path, model):
    cfg = {
        "model": model, "audio_feat_dim": 257, "video_feat_dim": 136,
        "audio_len": 9600, "batch_size": 2, "net_dim": [8, 8],
        "integration_layer": 1 if "ssnn" in model or "emb" in model else 0,
        "dropout_rate": 0.0, "max_n_epochs": 1, "n_earlystop_epochs": 3,
        "optimizer_type": "adam", "starter_learning_rate": 0.003,
        "lr_decay": 1.0, "num_asr_labels": 33, "ctc_loss": 0.001,
        "root_folder": corpus["tfrecords"], "exp_folder": str(tmp_path / "exp"),
        "audio_feat_mean": corpus["mean"], "audio_feat_std": corpus["std"],
        "tb_media": 0,
    }
    path = str(tmp_path / "c.config")
    config_lib.save_configfile(cfg, path)
    summary = loop.train(path)
    assert np.isfinite(summary["best_val"]), model
    assert os.path.isfile(str(tmp_path / "exp" / "netmodel" / "sinet.npz"))
