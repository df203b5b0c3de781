"""Native C++ TFRecord loader: parity with the pure-Python codec."""

import os
import time

import numpy as np
import pytest

from avsi.data import native_loader, reader, tfrecord as tfr


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("native"))
    rng = np.random.RandomState(0)
    paths = []
    for i in range(7):
        rec = tfr.serialize_sample_fixed(
            seq_len=50,
            lab_len=4,
            target_audio_wav=rng.randn(9600).astype(np.float32),
            video_features=rng.randn(50, 136).astype(np.float32),
            mask=(rng.rand(50, 257) > 0.2).astype(np.float32),
            labels=np.pad(rng.randint(0, 33, 4).astype(np.float32), (0, 46)),
            sample_path=f"s1_utt{i:02d}_800_1",
            embedding=rng.randn(512).astype(np.float32),
        )
        p = os.path.join(d, f"data_{i:05d}.tfrecord")
        with tfr.TFRecordWriter(p) as w:
            w.write(rec)
        paths.append(p)
    return paths


def test_native_available():
    assert native_loader.is_available(), "g++ build of the native loader failed"


def test_native_matches_python(corpus):
    batch = native_loader.load_batch(
        corpus[:4], num_audio_samples=9600, t_frames=50, emb_dim=512,
        verify_crc=True,
    )
    for i, path in enumerate(corpus[:4]):
        want = tfr.parse_sample_fixed(
            next(iter(tfr.read_records(path))), with_embedding=True
        )
        assert batch["sequence_lengths"][i] == want["sequence_length"]
        assert batch["labels_lengths"][i] == want["labels_length"]
        assert batch["sample_paths"][i] == want["sample_path"]
        np.testing.assert_array_equal(batch["target_sources"][i], want["target_audio_wav"])
        np.testing.assert_array_equal(batch["video_features"][i], want["video_features"])
        np.testing.assert_array_equal(batch["masks"][i], want["mask"])
        np.testing.assert_array_equal(batch["labels"][i], want["labels"])
        np.testing.assert_array_equal(batch["embeddings"][i], want["embedding"])


def test_reader_uses_native_path(corpus):
    dm = reader.DataManager(num_audio_samples=9600, with_embedding=True)
    assert dm.use_native
    batches = list(dm.batches(corpus, batch_size=4, pad_final=True))
    assert dm._native_probe  # probe succeeded -> native path taken
    assert len(batches) == 2
    assert batches[0]["target_sources"].shape == (4, 9600)
    assert batches[1]["num_real"] == 3
    # python fallback yields identical content
    dm_py = reader.DataManager(num_audio_samples=9600, with_embedding=True, use_native=False)
    py = list(dm_py.batches(corpus, batch_size=4, pad_final=True))
    np.testing.assert_array_equal(py[0]["masks"], batches[0]["masks"])
    np.testing.assert_array_equal(py[1]["target_sources"], batches[1]["target_sources"])
    assert py[0]["sample_paths"] == batches[0]["sample_paths"]


def test_native_corrupt_file_raises(corpus, tmp_path):
    bad = str(tmp_path / "bad.tfrecord")
    with open(corpus[0], "rb") as f:
        blob = f.read()
    with open(bad, "wb") as f:
        f.write(blob[:20])
    with pytest.raises(ValueError):
        native_loader.load_batch([bad], num_audio_samples=9600, t_frames=50)


def test_grouped_records_native(corpus, tmp_path):
    """Grouped (multi-record) files: native path matches the Python codec."""
    grouped = str(tmp_path / "grouped.tfrecord")
    with tfr.TFRecordWriter(grouped) as w:
        for p in corpus[:5]:
            for rec in tfr.read_records(p):
                w.write(rec)
    recs = native_loader.load_file_records(
        grouped, 64, num_audio_samples=9600, t_frames=50, emb_dim=512
    )
    assert len(recs["sequence_lengths"]) == 5
    want = tfr.parse_sample_fixed(
        next(iter(tfr.read_records(corpus[2]))), with_embedding=True
    )
    np.testing.assert_array_equal(recs["target_sources"][2], want["target_audio_wav"])
    assert recs["sample_paths"][2] == want["sample_path"]

    # DataManager grouped-native path end-to-end
    dm = reader.DataManager(num_audio_samples=9600, with_embedding=True)
    batches = list(dm.batches([grouped, grouped], batch_size=4, pad_final=True))
    assert dm._native_probe and dm._native_probe[2] == 5
    assert len(batches) == 3  # 10 samples / 4
    assert batches[0]["target_sources"].shape == (4, 9600)
    assert batches[2]["num_real"] == 2
    # matches the python fallback exactly
    dm_py = reader.DataManager(num_audio_samples=9600, with_embedding=True, use_native=False)
    py = list(dm_py.batches([grouped, grouped], batch_size=4, pad_final=True))
    np.testing.assert_array_equal(py[1]["masks"], batches[1]["masks"])
    assert py[0]["sample_paths"] == batches[0]["sample_paths"]


def test_grouped_readahead_order_and_parity(corpus, tmp_path):
    """Threaded grouped read-ahead yields identical batches in identical
    order to the sequential path (deterministic input pipeline)."""
    groups = []
    for g in range(4):
        p = str(tmp_path / f"g{g}.tfrecord")
        with tfr.TFRecordWriter(p) as w:
            for src in corpus[g : g + 3]:
                for rec in tfr.read_records(src):
                    w.write(rec)
        groups.append(p)
    dm_seq = reader.DataManager(
        num_audio_samples=9600, with_embedding=True, native_readahead=1
    )
    dm_par = reader.DataManager(
        num_audio_samples=9600, with_embedding=True, native_readahead=4
    )
    seq = list(dm_seq.batches(groups, batch_size=5, pad_final=True))
    par = list(dm_par.batches(groups, batch_size=5, pad_final=True))
    assert dm_par.use_native and len(seq) == len(par) > 0
    for a, b in zip(seq, par):
        assert a["sample_paths"] == b["sample_paths"]
        assert a["num_real"] == b["num_real"]
        for k in ("target_sources", "masks", "video_features", "labels"):
            np.testing.assert_array_equal(a[k], b[k])


def test_ordered_pool_map_propagates_errors():
    def boom(x):
        if x == 3:
            raise ValueError("x3")
        return x * 2

    with pytest.raises(ValueError, match="x3"):
        list(reader._ordered_pool_map(boom, range(6), workers=3))
    assert list(reader._ordered_pool_map(boom, [1, 2], workers=3)) == [2, 4]
    assert list(reader._ordered_pool_map(boom, range(3), workers=1)) == [0, 2, 4]


def test_native_faster_than_python(corpus):
    files = corpus * 12  # 84 parses
    dm_py = reader.DataManager(num_audio_samples=9600, with_embedding=True, use_native=False)

    t0 = time.time()
    for _ in dm_py.batches(files, batch_size=7):
        pass
    t_py = time.time() - t0

    t0 = time.time()
    for _ in range(len(files) // 7):
        native_loader.load_batch(
            files[:7], num_audio_samples=9600, t_frames=50, emb_dim=512
        )
    t_nat = time.time() - t0
    # the C++ loader must be significantly faster (typically 10x+)
    assert t_nat < t_py / 2, (t_nat, t_py)


def test_multi_record_file_in_single_path_errors(corpus, tmp_path):
    """A corpus whose probe file has 1 record but another file holds several
    must FAIL LOUDLY on the single-record native path — before the -6 check
    the extra records silently vanished from the epoch."""
    multi = str(tmp_path / "multi.tfrecord")
    with tfr.TFRecordWriter(multi) as w:
        for p in corpus[:3]:
            w.write(next(iter(tfr.read_records(p))))
    with pytest.raises(ValueError, match="more than one record"):
        native_loader.load_batch(
            [corpus[0], multi], num_audio_samples=9600, t_frames=50,
            emb_dim=512,
        )


def test_overlong_feature_rejected(corpus):
    """A record whose wav holds MORE floats than expected must error (-5),
    not silently truncate to the expected count and pass validation."""
    with pytest.raises(ValueError, match="-5"):
        native_loader.load_batch(
            corpus[:2], num_audio_samples=4800, t_frames=50, emb_dim=512,
        )


def test_grouped_trailing_garbage_rejected(corpus, tmp_path):
    """Trailing bytes after the last full record = truncated file: the
    python codec raises, so the native grouped parser must too."""
    bad = str(tmp_path / "trail.tfrecord")
    with tfr.TFRecordWriter(bad) as w:
        w.write(next(iter(tfr.read_records(corpus[0]))))
    with open(bad, "ab") as f:
        f.write(b"\x01\x02\x03")  # a partial next-record header
    with pytest.raises(ValueError, match="-3"):
        native_loader.load_file_records(
            bad, 4, num_audio_samples=9600, t_frames=50, emb_dim=512,
        )


def test_ctc_decode_never_truncates():
    """The collapsed hypothesis of a 300-frame alternating-argmax sequence
    is 300 labels; the old fixed max_out=256 silently returned a prefix."""
    t_len, c = 300, 3
    logits = np.full((t_len, c), -10.0, np.float32)
    for t in range(t_len):
        logits[t, t % 2] = 10.0  # alternate classes 0/1, never blank (2)
    dec = native_loader.ctc_beam_search(logits, t_len, beam_width=4)
    if dec is None:
        pytest.skip("native ctc unavailable")
    assert len(dec) == t_len


def test_prefetch_abandoned_consumer_releases_worker(corpus):
    """Breaking out of prefetch_batches must not leave the worker thread
    blocked forever on the bounded queue."""
    import threading

    dm = reader.DataManager(num_audio_samples=9600, with_embedding=True)
    before = {t.ident for t in threading.enumerate()}
    gen = dm.prefetch_batches(list(corpus), 2)
    next(gen)
    gen.close()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, f"prefetch worker leaked: {alive}"


def test_mixed_group_sizes_all_records_seen(corpus, tmp_path):
    """Grouped native path with files of DIFFERENT record counts (1, 2, 4):
    every record must appear exactly once per epoch."""
    d = tmp_path / "mixed"
    d.mkdir()
    sizes = [4, 1, 2]
    idx = 0
    for j, size in enumerate(sizes):
        with tfr.TFRecordWriter(str(d / f"g{j}.tfrecord")) as w:
            for _ in range(size):
                w.write(next(iter(tfr.read_records(corpus[idx % len(corpus)]))))
                idx += 1
    files = sorted(str(p) for p in d.iterdir())
    dm = reader.DataManager(num_audio_samples=9600, with_embedding=True)
    got = [
        p for b in dm.batches(files, 3)
        for p in b["sample_paths"][: b["num_real"]]
    ]
    assert len(got) == sum(sizes)
