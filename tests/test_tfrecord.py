"""Golden tests: the pure-python TFRecord/SequenceExample codec vs tf.train.

Ensures corpora written by avsi are byte-level parseable by the reference's
tf.data pipeline (dataset_reader.py:62-79) and vice versa.
"""

import numpy as np
import pytest

from avsi.data import tfrecord as tfr

tf = pytest.importorskip("tensorflow")


def _sample():
    rng = np.random.RandomState(0)
    return dict(
        seq_len=250,
        lab_len=3,
        target_audio_wav=rng.randn(480).astype(np.float32),
        video_features=rng.randn(25, 136).astype(np.float32),
        mask=(rng.rand(25, 257) > 0.2).astype(np.float32),
        labels=np.pad(np.array([4.0, 7.0, 1.0], np.float32), (0, 47)),
        sample_path="s1_bbaf2n_800_1",
    )


def test_roundtrip_own_codec(tmp_path):
    s = _sample()
    rec = tfr.serialize_sample_fixed(**s)
    path = str(tmp_path / "x.tfrecord")
    with tfr.TFRecordWriter(path) as w:
        w.write(rec)
    records = list(tfr.read_records(path, verify_crc=True))
    assert len(records) == 1
    out = tfr.parse_sample_fixed(records[0])
    assert out["sequence_length"] == 250
    assert out["labels_length"] == 3
    assert out["sample_path"] == s["sample_path"]
    np.testing.assert_array_equal(out["target_audio_wav"], s["target_audio_wav"])
    np.testing.assert_array_equal(out["video_features"], s["video_features"])
    np.testing.assert_array_equal(out["mask"], s["mask"])
    np.testing.assert_array_equal(out["labels"], s["labels"])


def test_tf_parses_our_records(tmp_path):
    """The reference parser (tf.io.parse_single_sequence_example) must accept
    our bytes — this is the corpus-compatibility contract."""
    s = _sample()
    rec = tfr.serialize_sample_fixed(**s)
    ctx, seq = tf.io.parse_single_sequence_example(
        rec,
        context_features={
            "sequence_length": tf.io.FixedLenFeature([], tf.int64),
            "labels_length": tf.io.FixedLenFeature([], tf.int64),
            "target_audio_wav": tf.io.FixedLenFeature([480], tf.float32),
            "sample_path": tf.io.VarLenFeature(tf.string),
        },
        sequence_features={
            "labels": tf.io.FixedLenSequenceFeature([], tf.float32),
            "video_features": tf.io.FixedLenSequenceFeature([136], tf.float32),
            "mask": tf.io.FixedLenSequenceFeature([257], tf.float32),
        },
    )
    assert int(ctx["sequence_length"]) == 250
    np.testing.assert_allclose(ctx["target_audio_wav"].numpy(), s["target_audio_wav"])
    np.testing.assert_allclose(seq["video_features"].numpy(), s["video_features"])
    np.testing.assert_allclose(seq["mask"].numpy(), s["mask"])
    assert ctx["sample_path"].values.numpy()[0].decode() == s["sample_path"]


def test_we_parse_tf_records(tmp_path):
    """And we must parse bytes produced by tf.train (reference writer)."""
    s = _sample()
    ex = tf.train.SequenceExample()
    ex.context.feature["sequence_length"].int64_list.value.append(s["seq_len"])
    ex.context.feature["labels_length"].int64_list.value.append(s["lab_len"])
    ex.context.feature["target_audio_wav"].float_list.value.extend(s["target_audio_wav"])
    ex.context.feature["sample_path"].bytes_list.value.append(s["sample_path"].encode())
    for row in s["video_features"]:
        ex.feature_lists.feature_list["video_features"].feature.add().float_list.value.extend(row)
    for row in s["mask"]:
        ex.feature_lists.feature_list["mask"].feature.add().float_list.value.extend(row)
    for lab in s["labels"]:
        ex.feature_lists.feature_list["labels"].feature.add().float_list.value.append(lab)

    path = str(tmp_path / "tf.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())

    records = list(tfr.read_records(path, verify_crc=True))
    out = tfr.parse_sample_fixed(records[0])
    assert out["sequence_length"] == 250
    np.testing.assert_allclose(out["target_audio_wav"], s["target_audio_wav"], atol=1e-6)
    np.testing.assert_allclose(out["video_features"], s["video_features"], atol=1e-6)
    np.testing.assert_allclose(out["labels"], s["labels"])
    assert out["sample_path"] == s["sample_path"]


def test_embedding_variant():
    s = _sample()
    emb = np.random.RandomState(1).randn(512).astype(np.float32)
    rec = tfr.serialize_sample_fixed(embedding=emb, **s)
    out = tfr.parse_sample_fixed(rec, with_embedding=True)
    np.testing.assert_array_equal(out["embedding"], emb)


def test_group_tfrecords_raw_passthrough(tmp_path):
    """Grouping re-packs framed records verbatim: grouped files carry
    byte-identical records with valid CRCs, in jittered-length order."""
    import os

    from avsi.data import generator
    from avsi.data.tfrecord import TFRecordWriter, read_records

    src = tmp_path / "in"
    src.mkdir()
    rng = np.random.RandomState(0)
    originals = []
    for i in range(7):
        rec = tfr.serialize_sample_fixed(
            5, 2, rng.randn(64).astype(np.float32),
            rng.randn(5, 4).astype(np.float32),
            np.ones((5, 4), np.float32),
            np.arange(6, dtype=np.float32), f"s{i}",
        )
        originals.append(rec)
        with TFRecordWriter(str(src / f"data_{i:05d}.tfrecord")) as w:
            w.write(rec)
    np.save(str(src / "seq_lengths.npy"), np.full(7, 5))

    out = tmp_path / "out"
    generator.group_tfrecords(str(src), str(out), group_size=3)
    files = sorted(f for f in os.listdir(out) if f.endswith(".tfrecord"))
    assert len(files) == 3  # 3 + 3 + 1
    grouped = []
    for f in files:
        grouped += list(read_records(str(out / f), verify_crc=True))
    assert sorted(grouped) == sorted(originals)
    assert (out / "seq_lengths.npy").exists()


def test_vectorized_feature_list_byte_identical():
    """_feature_list_float_rows is a pure speedup: byte-identical to the
    generic per-row encoding it replaced in serialize_sample_{fixed,var}."""
    rng = np.random.RandomState(3)
    for arr in (
        rng.randn(250, 257).astype(np.float32),
        rng.randn(250, 136).astype(np.float64),  # float64 input path
        rng.randn(50),  # 1-D (labels / var-mode wav)
        np.zeros((0, 7), np.float32),  # empty
    ):
        fast = tfr._feature_list_float_rows(arr)
        rows = np.asarray(arr, np.float32)
        rows = rows[:, None] if rows.ndim == 1 else rows
        slow = tfr.encode_feature_list([tfr.feature_floats(r) for r in rows])
        assert fast == slow
