"""Variable-length (`var`) TFRecord mode: codec, padded reader, CLI.

Reference: serialize_sample_var (tfrecord_utils.py:44-70 — unrunnable as
written; the intended schema is defined by the reader at
dataset_reader.py:82-99) and the padded_batch path (dataset_reader.py:53-55).
Covers byte-compatibility in both directions with tf.train, the padded
DataManager batches (bucket-rounded frame counts — documented TPU-first
deviation from exact-max padding), and the masking CLI end to end in var
mode.
"""

import os

import numpy as np
import pytest

from avsi.data import reader as reader_lib
from avsi.data import tfrecord as tfr


def _var_sample(t_frames, seed=0, lab_len=3):
    rng = np.random.RandomState(seed)
    return dict(
        seq_len=t_frames,
        lab_len=lab_len,
        target_audio_wav=rng.randn(t_frames * 192).astype(np.float32),
        video_features=rng.randn(t_frames, 136).astype(np.float32),
        mask=(rng.rand(t_frames, 257) > 0.2).astype(np.float32),
        labels=np.arange(lab_len, dtype=np.float32) + 1,
        sample_path=f"s1_var_{t_frames}",
    )


class TestVarCodec:
    def test_roundtrip_own_codec(self, tmp_path):
        s = _var_sample(40)
        rec = tfr.serialize_sample_var(**s)
        path = str(tmp_path / "v.tfrecord")
        with tfr.TFRecordWriter(path) as w:
            w.write(rec)
        out = tfr.parse_sample_var(next(iter(tfr.read_records(path, verify_crc=True))))
        assert out["sequence_length"] == 40
        assert out["labels_length"] == 3
        assert out["sample_path"] == s["sample_path"]
        np.testing.assert_array_equal(out["target_audio_wav"], s["target_audio_wav"])
        np.testing.assert_array_equal(out["video_features"], s["video_features"])
        np.testing.assert_array_equal(out["mask"], s["mask"])
        np.testing.assert_array_equal(out["labels"], s["labels"])

    def test_tf_parses_our_var_records(self):
        """The reference var reader schema (dataset_reader.py:82-99) must
        accept our bytes."""
        tf = pytest.importorskip("tensorflow")
        s = _var_sample(17, seed=1)
        rec = tfr.serialize_sample_var(**s)
        ctx, seq = tf.io.parse_single_sequence_example(
            rec,
            context_features={
                "sequence_length": tf.io.FixedLenFeature([], tf.int64),
                "labels_length": tf.io.FixedLenFeature([], tf.int64),
            },
            sequence_features={
                "target_audio_wav": tf.io.FixedLenSequenceFeature([], tf.float32),
                "sample_path": tf.io.FixedLenSequenceFeature([], tf.int64),
                "labels": tf.io.FixedLenSequenceFeature([], tf.float32),
                "video_features": tf.io.FixedLenSequenceFeature([136], tf.float32),
                "mask": tf.io.FixedLenSequenceFeature([257], tf.float32),
            },
        )
        assert int(ctx["sequence_length"]) == 17
        np.testing.assert_allclose(
            seq["target_audio_wav"].numpy(), s["target_audio_wav"]
        )
        np.testing.assert_allclose(seq["video_features"].numpy(), s["video_features"])
        np.testing.assert_allclose(seq["mask"].numpy(), s["mask"])
        decoded_path = "".join(chr(c) for c in seq["sample_path"].numpy())
        assert decoded_path == s["sample_path"]

    def test_we_parse_tf_var_records(self):
        """And we parse bytes built with tf.train the way the reference
        writer intended (tfrecord_utils.py:44-70 with its name bugs fixed)."""
        tf = pytest.importorskip("tensorflow")
        s = _var_sample(9, seed=2)
        ex = tf.train.SequenceExample()
        ex.context.feature["sequence_length"].int64_list.value.append(s["seq_len"])
        ex.context.feature["labels_length"].int64_list.value.append(s["lab_len"])
        for x in s["target_audio_wav"]:
            ex.feature_lists.feature_list["target_audio_wav"].feature.add().float_list.value.append(x)
        for row in s["video_features"]:
            ex.feature_lists.feature_list["video_features"].feature.add().float_list.value.extend(row)
        for row in s["mask"]:
            ex.feature_lists.feature_list["mask"].feature.add().float_list.value.extend(row)
        for x in s["labels"]:
            ex.feature_lists.feature_list["labels"].feature.add().float_list.value.append(x)
        for ch in s["sample_path"]:
            ex.feature_lists.feature_list["sample_path"].feature.add().int64_list.value.append(ord(ch))
        out = tfr.parse_sample_var(ex.SerializeToString())
        assert out["sample_path"] == s["sample_path"]
        np.testing.assert_allclose(out["target_audio_wav"], s["target_audio_wav"])
        np.testing.assert_allclose(out["mask"], s["mask"])
        np.testing.assert_allclose(out["labels"], s["labels"])


class TestVarReader:
    def _write_corpus(self, tmp_path, lengths):
        paths = []
        for i, t in enumerate(lengths):
            p = str(tmp_path / f"data_{i:03d}.tfrecord")
            with tfr.TFRecordWriter(p) as w:
                w.write(tfr.serialize_sample_var(**_var_sample(t, seed=i, lab_len=2 + i)))
            paths.append(p)
        return paths

    def test_padded_batches_bucket_rounded(self, tmp_path):
        files = self._write_corpus(tmp_path, [37, 12, 60, 55])
        dm = reader_lib.DataManager(mode="var", pad_frames_multiple=25)
        batches = list(dm.batches(files, batch_size=2))
        assert len(batches) == 2
        b0, b1 = batches
        # batch 0: max(37,12) -> 50 frames; batch 1: max(60,55) -> 75
        assert b0["masks"].shape == (2, 50, 257)
        assert b1["masks"].shape == (2, 75, 257)
        assert b0["target_sources"].shape == (2, 50 * 192)
        assert b0["video_features"].shape == (2, 50, 136)
        # sequence_lengths carry the true lengths
        np.testing.assert_array_equal(b0["sequence_lengths"], [37, 12])
        # padding region is zeros
        assert not b0["masks"][1, 12:].any()
        assert not b0["target_sources"][1, 12 * 192 :].any()
        # labels padded to batch max true length
        np.testing.assert_array_equal(b0["labels_lengths"], [2, 3])
        assert b0["labels"].shape[1] == 3

    def test_pad_final_and_num_real(self, tmp_path):
        files = self._write_corpus(tmp_path, [30, 30, 45])
        dm = reader_lib.DataManager(mode="var")
        batches = list(dm.batches(files, batch_size=2, pad_final=True))
        assert batches[-1]["num_real"] == 1
        assert batches[-1]["masks"].shape[0] == 2

    def test_mode_validation(self):
        with pytest.raises(ValueError):
            reader_lib.DataManager(mode="bogus")


class TestVarCli:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        from avsi import cli

        d = str(tmp_path_factory.mktemp("varfix"))
        cli.main(["fixture", "-d", d, "-ns", "1", "-num", "3", "-al", "600",
                  "-gm", "150", "-gs", "20"])
        cli.main(["tfrecords_generator", "-m", "var", "-a", os.path.join(d, "syn"),
                  "-d", os.path.join(d, "tfrec_var"), "-df",
                  os.path.join(d, "dictionary.txt")])
        return d

    def test_generator_wrote_var_records(self, corpus):
        files = tfr.list_tfrecord_files(os.path.join(corpus, "tfrec_var", "test-set"))
        assert files
        s = tfr.parse_sample_var(next(iter(tfr.read_records(files[0]))))
        assert s["mask"].shape[1] == 257
        assert len(s["target_audio_wav"]) == s["mask"].shape[0] * 192

    def test_masking_var_mode(self, corpus):
        from avsi import cli
        from avsi.utils import wav as wavio

        test_audio = os.path.join(corpus, "syn", "test-set")
        cli.main(["masking", "-d", os.path.join(corpus, "tfrec_var", "test-set"),
                  "-ad", test_audio, "-m", "var", "-bs", "2"])
        dirs = sorted(
            x for x in os.listdir(test_audio)
            if os.path.isdir(os.path.join(test_audio, x))
        )
        assert dirs
        for sdir in dirs:
            path = os.path.join(test_audio, sdir, "masked.wav")
            assert os.path.isfile(path)
            _, data = wavio.read_wav_int16(path)
            assert len(data) == 50 * 192  # 600 ms -> 50 frames * 192
            assert np.abs(data).max() > 0
