"""Fuzz the native C++ TFRecord/proto parser: malformed input must yield
error codes (or clean skips), never crashes or uninitialized output."""

import numpy as np
import pytest

from avsi.data import native_loader, tfrecord as tfr

pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="no native toolchain"
)


def _valid_record():
    rng = np.random.RandomState(0)
    return tfr.serialize_sample_fixed(
        seq_len=50, lab_len=3,
        target_audio_wav=rng.randn(9600).astype(np.float32),
        video_features=rng.randn(50, 136).astype(np.float32),
        mask=np.ones((50, 257), np.float32),
        labels=np.zeros(50, np.float32),
        sample_path="s1_fuzz",
    )


def _try_load(path):
    try:
        native_loader.load_file_records(
            path, 4, num_audio_samples=9600, t_frames=50
        )
        return "ok"
    except ValueError:
        return "error"


def test_random_bytes(tmp_path):
    rng = np.random.RandomState(1)
    for i in range(50):
        p = str(tmp_path / f"r{i}.tfrecord")
        with open(p, "wb") as f:
            f.write(rng.bytes(int(rng.randint(0, 4096))))
        assert _try_load(p) in ("ok", "error")  # no crash


def test_bit_flips_in_valid_record(tmp_path):
    rec = _valid_record()
    base = str(tmp_path / "base.tfrecord")
    with tfr.TFRecordWriter(base) as w:
        w.write(rec)
    blob = bytearray(open(base, "rb").read())
    rng = np.random.RandomState(2)
    for i in range(60):
        mutated = bytearray(blob)
        for _ in range(int(rng.randint(1, 8))):
            pos = int(rng.randint(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.randint(0, 8))
        p = str(tmp_path / f"m{i}.tfrecord")
        with open(p, "wb") as f:
            f.write(bytes(mutated))
        assert _try_load(p) in ("ok", "error")


def test_truncations(tmp_path):
    rec = _valid_record()
    base = str(tmp_path / "base.tfrecord")
    with tfr.TFRecordWriter(base) as w:
        w.write(rec)
    blob = open(base, "rb").read()
    for cut in (0, 1, 7, 8, 12, 100, len(blob) // 2, len(blob) - 5):
        p = str(tmp_path / f"t{cut}.tfrecord")
        with open(p, "wb") as f:
            f.write(blob[:cut])
        assert _try_load(p) in ("ok", "error")


def test_wrong_dims_rejected(tmp_path):
    """A structurally valid record with mismatched dims must error, not
    leave np.empty garbage."""
    rec = _valid_record()
    p = str(tmp_path / "v.tfrecord")
    with tfr.TFRecordWriter(p) as w:
        w.write(rec)
    with pytest.raises(ValueError):
        native_loader.load_file_records(p, 4, num_audio_samples=48000, t_frames=50)
    with pytest.raises(ValueError):
        native_loader.load_file_records(p, 4, num_audio_samples=9600, t_frames=250)
    with pytest.raises(ValueError):
        native_loader.load_file_records(
            p, 4, num_audio_samples=9600, t_frames=50, emb_dim=512
        )


def test_python_codec_fuzz():
    """The pure-python decoder must also never crash on garbage."""
    rng = np.random.RandomState(3)
    for _ in range(100):
        blob = rng.bytes(int(rng.randint(0, 1024)))
        try:
            tfr.decode_sequence_example(blob)
        except (ValueError, IndexError, UnicodeDecodeError):
            pass
