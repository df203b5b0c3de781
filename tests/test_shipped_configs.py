"""The shipped example configs (scripts/config/*.config — the reference's
scripts/config/ quickstart surface) must parse, validate, and actually
train. Guards VERDICT r2 gap #2: a new user must be able to run
`scripts/training.sh scripts/config/blstm.config` after `fixture`."""

import glob
import os

import numpy as np
import pytest

from avsi import config as config_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "scripts", "config", "*.config")))


def test_configs_ship():
    names = {os.path.basename(p) for p in CONFIGS}
    # the reference ships exactly these four (scripts/config/)
    assert {"blstm.config", "blstm_asr.config", "blstm_ctc.config",
            "unet.config"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_config_parses_and_validates(path):
    cfg = config_lib.load_configfile(path)
    checked = config_lib.check_trainconfiguration(dict(cfg))
    assert checked["model"]
    assert checked["audio_feat_mean"] and checked["audio_feat_std"]
    # every shipped config mirrors the reference's optimizer defaults
    assert checked["optimizer_type"] == "adam"
    assert checked["starter_learning_rate"] == 0.001


def test_blstm_config_trains_on_fixture(tmp_path):
    """One real epoch from the shipped blstm.config hyperparameters (only
    the corpus/output paths and epoch count are rewritten, plus a reduced
    net so the 3-layer GRID-size stack does not dominate CI wall time)."""
    from avsi.data import fixture, stats as stats_lib
    from avsi.train import loop

    cfg = config_lib.load_configfile(
        os.path.join(REPO, "scripts", "config", "blstm.config")
    )
    d = str(tmp_path / "fix")
    paths = fixture.make_fixture(d, n_speakers=2, n_samples=4,
                                 audio_len_ms=3000, gap_ms=400.0)
    stats_prefix = os.path.join(d, "spec_norm")
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", stats_prefix, "spec",
        window_size=24, step_size=12,
    )
    cfg.update(
        root_folder=paths["tfrecords"],
        exp_folder=str(tmp_path / "exp"),
        audio_feat_mean=stats_prefix + "_mean.npy",
        audio_feat_std=stats_prefix + "_std.npy",
        max_n_epochs=1,
        net_dim=[16, 16, 16],
        tb_media=0,
    )
    p = str(tmp_path / "train.config")
    config_lib.save_configfile(cfg, p)
    summary = loop.train(p)
    assert np.isfinite(summary["best_val"])
    assert os.path.isfile(str(tmp_path / "exp" / "netmodel" / "sinet.npz"))


def test_unet_config_documented_workflow(tmp_path):
    """The unet.config header's documented corpus chain must work verbatim:
    fixture at the unet mask geometry (8 ms hop, 128 bins) + 256-point STFT
    stats (129 bins, cut to feat_dim automatically). Guards two real
    breaks: the generator's hardcoded 12 ms/257 mask layout and the
    129-vs-128 stats mismatch."""
    from avsi.data import fixture, stats as stats_lib
    from avsi.train import loop

    cfg = config_lib.load_configfile(
        os.path.join(REPO, "scripts", "config", "unet.config")
    )
    d = str(tmp_path / "fix")
    paths = fixture.make_fixture(
        d, n_speakers=1, n_samples=4, audio_len_ms=1024, gap_ms=200.0,
        gap_std_ms=30.0, mask_hop_ms=8, mask_frame_dim=128,
    )
    stats_prefix = os.path.join(d, "spec_norm")
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", stats_prefix, "spec",
        window_size=16, step_size=8, n_fft=256,
    )
    assert np.load(stats_prefix + "_mean.npy").shape == (129,)
    cfg.update(
        model="unet-pconv",
        root_folder=paths["tfrecords"],
        exp_folder=str(tmp_path / "exp"),
        audio_feat_mean=stats_prefix + "_mean.npy",
        audio_feat_std=stats_prefix + "_std.npy",
        max_n_epochs=1,
        batch_size=2,
        tb_media=0,
    )
    p = str(tmp_path / "train.config")
    config_lib.save_configfile(cfg, p)
    summary = loop.train(p)
    assert np.isfinite(summary["best_val"])
    # the bundle ships feat_dim-cut stats
    mean = np.load(str(tmp_path / "exp" / "netmodel" / "audio_features_mean.npy"))
    assert mean.shape == (128,)
