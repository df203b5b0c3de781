"""Config parser/validator tests (reference config_utils.py semantics)."""

import numpy as np
import pytest

from avsi import config as cfg


def _write(tmp_path, text):
    p = tmp_path / "c.config"
    p.write_text(text)
    return str(p)


def test_parses_reference_syntax(tmp_path):
    path = _write(
        tmp_path,
        "# comment\n"
        "model = av-blstm\n"
        "net_dim = [250, 250, 250]\n"
        "audio_len = 48000\n"
        "starter_learning_rate = 0.001\n"
        "root_folder = /data/GRID/tfrecords\n"
        "audio_feat_mean = /data/mean.npy\n",
    )
    c = cfg.load_configfile(path)
    assert c["model"] == "av-blstm"
    assert c["net_dim"] == [250, 250, 250]
    assert c["audio_len"] == 48000
    assert c["starter_learning_rate"] == 0.001
    assert c["root_folder"] == "/data/GRID/tfrecords"


def test_rejects_space_in_value(tmp_path):
    with pytest.raises(ValueError):
        cfg.load_configfile(_write(tmp_path, "model = a blstm\n"))


def test_check_defaults(tmp_path):
    c = {
        "root_folder": "/x",
        "exp_folder": "/y",
        "model": "a-blstm",
        "net_dim": [250, 250],
        "audio_feat_mean": "/m.npy",
        "audio_feat_std": "/s.npy",
        "audio_len": 48000,
    }
    out = cfg.check_trainconfiguration(c)
    assert out["audio_feat_dim"] == 257
    assert out["video_feat_dim"] == 136
    assert out["num_asr_labels"] == 34  # 33 + blank
    assert out["ctc_loss"] == 1.0
    assert out["optimizer_type"] == "adam"
    assert out["batch_size"] == 1
    assert out["integration_layer"] == 0


def test_missing_required_raises():
    with pytest.raises(ValueError):
        cfg.check_trainconfiguration({"exp_folder": "/y"})


def test_unet_alias_keys():
    c = {
        "root_folder": "/x",
        "exp_folder": "/y",
        "model": "unet",
        "net_dim": [1],
        "feat_dim": 128,
        "feat_mean": "/m.npy",
        "feat_std": "/s.npy",
        "audio_len": 16384,
    }
    out = cfg.check_trainconfiguration(c)
    assert out["audio_feat_dim"] == 128
    assert out["audio_feat_mean"] == "/m.npy"


def test_save_roundtrip(tmp_path):
    c = {"model": "a-blstm", "net_dim": [250, 250], "audio_len": 48000}
    p = str(tmp_path / "out.config")
    cfg.save_configfile(c, p)
    back = cfg.load_configfile(p)
    assert back == c


def test_save_roundtrip_alnum_string(tmp_path):
    # "bfloat16" mixes letters+digits: raw it would hit the parser's
    # literal_eval branch and raise; save must repr-quote it
    c = {"compute_dtype": "bfloat16", "root_folder": "/data/run2", "seed": 0}
    p = str(tmp_path / "out.config")
    cfg.save_configfile(c, p)
    back = cfg.load_configfile(p)
    assert back == c


def test_identifier_scalar_with_digits_loads_as_string(tmp_path):
    """`compute_dtype = bfloat16` must parse (avsi extension; the reference
    parser would reject digit-containing unquoted scalars — documented
    deviation)."""
    p = tmp_path / "c.config"
    p.write_text("compute_dtype = bfloat16\nnet_dim = [8]\n")
    out = cfg.load_configfile(str(p))
    assert out["compute_dtype"] == "bfloat16"
    # genuinely malformed values still error
    p2 = tmp_path / "bad.config"
    p2.write_text("x = 3..5e\n")
    with pytest.raises(ValueError):
        cfg.load_configfile(str(p2))
