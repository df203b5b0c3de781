"""Coverage for checkpoint surgery (C24/C26) and profiling utilities."""

import os

import pytest
import time

import numpy as np

from avsi.infer import export
from avsi.train import checkpoints
from avsi.utils.profiling import StepTimer


def test_rename_vars(tmp_path):
    tree = {"v-blstm": {"w": np.ones((2, 2))}, "head": {"b": np.zeros(3)}}
    checkpoints.save_tree(str(tmp_path / "ck"), tree)
    changed = export.rename_vars(
        str(tmp_path / "ck"), str(tmp_path / "ck2"), r"^v-blstm/", "vnet/"
    )
    assert changed == 1
    data = np.load(str(tmp_path / "ck2.npz"))
    assert "vnet/w" in data.files and "head/b" in data.files
    np.testing.assert_array_equal(data["vnet/w"], tree["v-blstm"]["w"])


def test_save_inference_model_copies_sidecars(tmp_path):
    src = tmp_path / "train"
    dst = tmp_path / "infer"
    src.mkdir()
    checkpoints.save_checkpoint(str(src), "sinet", {"w": np.ones(2)}, opt_state={"m": np.zeros(2)})
    (src / "config.txt").write_text("model = a-blstm\n")
    np.save(str(src / "audio_features_mean.npy"), np.zeros(3))
    np.save(str(src / "audio_features_std.npy"), np.ones(3))
    export.save_inference_model(
        str(src / "config.txt"), str(src / "sinet"), str(dst / "sinet")
    )
    assert os.path.isfile(str(dst / "sinet.npz"))
    assert not os.path.isfile(str(dst / "sinet.opt.npz"))  # optimizer dropped
    assert os.path.isfile(str(dst / "config.txt"))
    assert os.path.isfile(str(dst / "audio_features_mean.npy"))


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t:
            time.sleep(0.002)
    s = t.summary()
    assert s["steps"] == 5
    assert 0.001 < s["p50_s"] < 0.1
    assert s["p99_s"] >= s["p50_s"]
    assert StepTimer().summary() == {}


def test_save_inference_model_missing_source_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        export.save_inference_model(
            "unused", str(tmp_path / "nope" / "sinet"), str(tmp_path / "out" / "infer")
        )


def test_rename_vars_collision_raises(tmp_path):
    src = str(tmp_path / "ck")
    np.savez(src + ".npz", **{"blstm_1/w": np.ones(2), "blstm_2/w": np.zeros(2)})
    with pytest.raises(ValueError, match="collision"):
        export.rename_vars(src, str(tmp_path / "out"), r"blstm_[12]", "blstm")


def test_read_wav_uint8_recentered(tmp_path):
    from scipy.io import wavfile

    from avsi.utils import wav as wavio

    data = np.array([128, 255, 0, 128], dtype=np.uint8)  # silence, +max, -max
    wavfile.write(str(tmp_path / "u8.wav"), 16000, data)
    _, out = wavio.read_wav_int16(str(tmp_path / "u8.wav"))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, [0.0, 32512.0, -32768.0, 0.0])
