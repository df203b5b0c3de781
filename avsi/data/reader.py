"""Batched TFRecord reading for training / inference.

Replaces the reference `DataManager`
(`/root/reference/av_speech_inpainting/dataset_reader.py:12-99` and the
`_emb` twin) with a host-side numpy pipeline: files are parsed with the
pure-python codec (data/tfrecord.py), shuffled per epoch, stacked into
fixed-shape batches, and handed to jitted steps as numpy (JAX moves them to
device; there is no feed_dict round-trip — SURVEY.md §3.1).

A background prefetch thread overlaps parsing with device compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from avsi.data import tfrecord as tfr

BATCH_KEYS = (
    "sequence_lengths",
    "labels_lengths",
    "target_sources",
    "labels",
    "video_features",
    "masks",
)


class DataManager:
    """Reads fixed-mode sample TFRecords into batches."""

    def __init__(
        self,
        num_audio_samples: int = 48000,
        audio_feat_size: int = 257,
        video_feat_size: int = 136,
        with_embedding: bool = False,
        seed: int | None = None,
    ):
        self.num_audio_samples = num_audio_samples
        self.audio_feat_size = audio_feat_size
        self.video_feat_size = video_feat_size
        self.with_embedding = with_embedding
        self.rng = np.random.default_rng(seed)

    def _iter_samples(self, file_list: list[str]):
        for path in file_list:
            for record in tfr.read_records(path):
                yield tfr.parse_sample_fixed(record, self.with_embedding)

    def _stack(self, samples: list[dict]) -> dict:
        batch = {
            "sequence_lengths": np.asarray(
                [s["sequence_length"] for s in samples], np.int32
            ),
            "labels_lengths": np.asarray(
                [s["labels_length"] for s in samples], np.int32
            ),
            "target_sources": np.stack([s["target_audio_wav"] for s in samples]),
            "labels": np.stack([s["labels"] for s in samples]),
            "video_features": np.stack([s["video_features"] for s in samples]),
            "masks": np.stack([s["mask"] for s in samples]),
            "sample_paths": [s["sample_path"] for s in samples],
        }
        if self.with_embedding:
            batch["embeddings"] = np.stack([s["embedding"] for s in samples])
        return batch

    def batches(
        self,
        file_list: list[str],
        batch_size: int,
        shuffle: bool = False,
        drop_remainder: bool = False,
        pad_final: bool = False,
    ):
        """Yield batches for one epoch.

        pad_final: repeat the last sample to fill a fixed-shape final batch
        (jit-friendly: a single compiled shape); 'num_real' marks validity.
        """
        files = list(file_list)
        if shuffle:
            self.rng.shuffle(files)
        buf: list[dict] = []
        for sample in self._iter_samples(files):
            buf.append(sample)
            if len(buf) == batch_size:
                batch = self._stack(buf)
                batch["num_real"] = batch_size
                yield batch
                buf = []
        if buf and not drop_remainder:
            n_real = len(buf)
            if pad_final:
                while len(buf) < batch_size:
                    buf.append(buf[-1])
            batch = self._stack(buf)
            batch["num_real"] = n_real
            yield batch

    def prefetch_batches(self, *args, prefetch: int = 2, **kwargs):
        """batches() with a background parsing thread."""
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        sentinel = object()
        err: list[BaseException] = []

        def worker():
            try:
                for b in self.batches(*args, **kwargs):
                    q.put(b)
            except BaseException as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item

    def count_samples(self, file_list: list[str]) -> int:
        return sum(1 for _ in self._iter_samples(file_list))
