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

import os
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from avsi.data import native_loader
from avsi.data import tfrecord as tfr

BATCH_KEYS = (
    "sequence_lengths",
    "labels_lengths",
    "target_sources",
    "labels",
    "video_features",
    "masks",
)


_POOL_END = object()


def _ordered_pool_map(fn, items, workers: int):
    """Map fn over items with `workers` threads, yielding results in input
    order; keeps at most 2*workers results in flight (bounded memory)."""
    if workers <= 1:
        for item in items:
            yield fn(item)
        return
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures: deque = deque()
        it = iter(items)
        exhausted = False
        while True:
            while not exhausted and len(futures) < 2 * workers:
                item = next(it, _POOL_END)
                if item is _POOL_END:
                    exhausted = True
                else:
                    futures.append(ex.submit(fn, item))
            if not futures:
                return
            yield futures.popleft().result()


class DataManager:
    """Reads sample TFRecords into batches.

    mode='fixed' (default): every sample has identical shapes; batches are
    plain stacks (reference dataset_reader.py:62-79).
    mode='var': samples have per-utterance lengths; batches are padded to
    the longest sample in the batch, with the frame count rounded up to
    `pad_frames_multiple` (reference padded_batch, dataset_reader.py:53-55,
    82-99).  The rounding is a TPU-first deviation: tf.data pads to the
    exact batch max, which under jit would compile one program per distinct
    batch length — bucketing to multiples (default 25 frames = 300 ms)
    bounds the number of compiled shapes.  `num_real`/`sequence_lengths`
    mark validity exactly as in fixed mode.
    """

    def __init__(
        self,
        num_audio_samples: int = 48000,
        audio_feat_size: int = 257,
        video_feat_size: int = 136,
        with_embedding: bool = False,
        seed: int | None = None,
        use_native: bool | None = None,
        mode: str = "fixed",
        samples_per_frame: int = 192,
        pad_frames_multiple: int = 25,
        native_readahead: int | None = None,
    ):
        if mode not in ("fixed", "var"):
            raise ValueError(f"unknown tfrecord mode {mode!r}")
        self.num_audio_samples = num_audio_samples
        self.audio_feat_size = audio_feat_size
        self.video_feat_size = video_feat_size
        self.with_embedding = with_embedding
        self.mode = mode
        self.samples_per_frame = samples_per_frame
        self.pad_frames_multiple = max(1, pad_frames_multiple)
        self.rng = np.random.default_rng(seed)
        # grouped-file parse parallelism (0/1 = sequential)
        if native_readahead is None:
            native_readahead = min(4, os.cpu_count() or 1)
        self.native_readahead = max(1, int(native_readahead))
        # native C++ loader: auto-enable when built/buildable (use_native=None);
        # fixed-layout only — var mode always uses the python codec
        self.use_native = mode == "fixed" and (
            native_loader.is_available() if use_native is None else use_native
        )
        # layout probes keyed by the probed file path: one DataManager can
        # serve different corpora (e.g. single-record train + grouped val)
        self._native_probes: dict[str, tuple] = {}
        self._native_probe: tuple | None = None  # last probe (tests inspect)

    def _probe_native(self, path: str) -> tuple:
        """Probe a file list's first file for layout: (t_frames, emb_dim,
        records_per_file, num_labels), or () when the native layout does
        not apply. Returned (not read back from shared state): concurrent
        batches() generators over different corpora must each use their own
        probe, so the tuple is threaded through explicitly."""
        if path not in self._native_probes:
            try:
                records = list(tfr.read_records(path))
                sample = tfr.parse_sample_fixed(records[0], self.with_embedding)
                emb_dim = len(sample.get("embedding", ())) if self.with_embedding else 0
                ok = (
                    len(sample["target_audio_wav"]) == self.num_audio_samples
                    and sample["mask"].shape[1] == self.audio_feat_size
                    and sample["video_features"].shape[1] == self.video_feat_size
                    and (not self.with_embedding or emb_dim > 0)
                )
                probe = (
                    (sample["mask"].shape[0], emb_dim, len(records),
                     len(sample["labels"]))
                    if ok else ()
                )
            except Exception:
                probe = ()
            self._native_probes[path] = probe
        probe = self._native_probes[path]
        self._native_probe = probe  # last probe (tests inspect)
        return probe

    def _iter_samples(self, file_list: list[str]):
        parse = (
            tfr.parse_sample_fixed if self.mode == "fixed" else tfr.parse_sample_var
        )
        for path in file_list:
            for record in tfr.read_records(path):
                yield parse(record, self.with_embedding)

    def _stack(self, samples: list[dict]) -> dict:
        if self.mode == "var":
            return self._stack_var(samples)
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

    def _stack_var(self, samples: list[dict]) -> dict:
        """Padded batch: frames rounded up to pad_frames_multiple, waveform
        padded to frames * samples_per_frame, labels to the batch max."""
        mult = self.pad_frames_multiple
        t_max = max(s["mask"].shape[0] for s in samples)
        t_pad = -(-t_max // mult) * mult
        wav_pad = max(
            t_pad * self.samples_per_frame,
            max(len(s["target_audio_wav"]) for s in samples),
        )
        lab_pad = max(1, max(len(s["labels"]) for s in samples))

        def pad_to(a, n, axis=0):
            width = [(0, 0)] * a.ndim
            width[axis] = (0, n - a.shape[axis])
            return np.pad(a, width)

        batch = {
            "sequence_lengths": np.asarray(
                [s["sequence_length"] for s in samples], np.int32
            ),
            "labels_lengths": np.asarray(
                [s["labels_length"] for s in samples], np.int32
            ),
            "target_sources": np.stack(
                [pad_to(s["target_audio_wav"], wav_pad) for s in samples]
            ),
            "labels": np.stack([pad_to(s["labels"], lab_pad) for s in samples]),
            "video_features": np.stack(
                [pad_to(s["video_features"], t_pad) for s in samples]
            ),
            "masks": np.stack([pad_to(s["mask"], t_pad) for s in samples]),
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
        # probe BEFORE shuffling on a stable representative (one probe per
        # corpus, not one per epoch)
        probe = (
            self._probe_native(min(files))
            if files and self.use_native else ()
        )
        if shuffle:
            self.rng.shuffle(files)
        if probe:
            if probe[2] == 1:
                # the native parser errors (-6) on any multi-record file it
                # meets here, so a mixed corpus fails loudly, never silently
                # dropping records past the first
                yield from self._native_batches(
                    files, batch_size, drop_remainder, pad_final, probe
                )
            else:
                yield from self._native_batches_grouped(
                    files, batch_size, drop_remainder, pad_final, probe
                )
            return
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

    def _native_batches_grouped(self, files, batch_size, drop_remainder,
                                 pad_final, probe):
        """Grouped corpora (group_tfrecords output): parse each file's
        records natively, re-batch on the host.

        Files are parsed by a small thread pool ahead of consumption
        (`native_readahead` workers): the ctypes call releases the GIL, so
        on a multi-core host parsing scales with cores while batch order
        stays deterministic (futures are consumed in submission order)."""
        t_frames, emb_dim, per_file, num_labels = probe
        cap = max(64, per_file * 4)
        keys = [k for k in BATCH_KEYS] + (["embeddings"] if self.with_embedding else [])
        pending: list[dict] = []

        def make_batch(samples, n_real):
            batch = {k: np.stack([s[k] for s in samples]) for k in keys}
            batch["sample_paths"] = [s["sample_paths"] for s in samples]
            batch["num_real"] = n_real
            return batch

        def parse(path):
            c = cap
            while True:  # a file larger than the probe suggested grows the
                try:     # buffers instead of erroring (counts may vary)
                    return native_loader.load_file_records(
                        path, c,
                        num_audio_samples=self.num_audio_samples,
                        t_frames=t_frames,
                        audio_dim=self.audio_feat_size,
                        video_dim=self.video_feat_size,
                        num_labels=num_labels,
                        emb_dim=emb_dim,
                    )
                except ValueError as e:
                    if "more than" not in str(e) or c > 1 << 20:
                        raise
                    c *= 4

        for recs in _ordered_pool_map(parse, files, self.native_readahead):
            n = len(recs["sequence_lengths"])
            for i in range(n):
                sample = {k: recs[k][i] for k in keys}
                sample["sample_paths"] = recs["sample_paths"][i]
                pending.append(sample)
            while len(pending) >= batch_size:
                yield make_batch(pending[:batch_size], batch_size)
                pending = pending[batch_size:]
        if pending and not drop_remainder:
            n_real = len(pending)
            if pad_final:
                pending = pending + [pending[-1]] * (batch_size - n_real)
            yield make_batch(pending, n_real)

    def _native_batches(self, files, batch_size, drop_remainder, pad_final,
                        probe):
        t_frames, emb_dim, _, num_labels = probe
        for i in range(0, len(files), batch_size):
            group = files[i : i + batch_size]
            n_real = len(group)
            if n_real < batch_size:
                if drop_remainder:
                    return
                if pad_final:
                    group = group + [group[-1]] * (batch_size - n_real)
            batch = native_loader.load_batch(
                group,
                num_audio_samples=self.num_audio_samples,
                t_frames=t_frames,
                audio_dim=self.audio_feat_size,
                video_dim=self.video_feat_size,
                num_labels=num_labels,
                emb_dim=emb_dim,
            )
            if not self.with_embedding:
                batch.pop("embeddings", None)
            batch["num_real"] = n_real
            yield batch

    def prefetch_batches(self, *args, prefetch: int = 2, **kwargs):
        """batches() with a background parsing thread.

        The worker checks a stop flag around its bounded q.put so an
        abandoned generator (consumer breaks out / is GC'd) releases the
        thread and its buffered batches instead of blocking on the full
        queue forever."""
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        sentinel = object()
        err: list[BaseException] = []
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self.batches(*args, **kwargs):
                    if not put(b):
                        return
            except BaseException as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()

    def count_samples(self, file_list: list[str]) -> int:
        return sum(1 for _ in self._iter_samples(file_list))
