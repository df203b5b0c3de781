"""ctypes bindings for the C++ TFRecord batch loader (native/avsi_loader.cc).

The shared library is built lazily with g++ on first use and cached next to
the source; everything degrades to the pure-Python codec when a toolchain
is unavailable (`is_available()` -> False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libavsi_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "avsi_loader.cc")
_SRC_CTC = os.path.join(_NATIVE_DIR, "avsi_ctc.cc")

_lock = threading.Lock()
_lib = None
_tried = False

_ERROR_CODES = {
    -1: "cannot open/read file",
    -2: "malformed protobuf",
    -3: "truncated/corrupt TFRecord framing",
    -4: "crc32c mismatch",
    -5: "feature missing or element count differs from expected dims",
    -6: "file holds more than one record (single-sample layout expected)",
}


def _build() -> bool:
    # Link to a per-process temp path and publish with an atomic rename:
    # concurrent builders each replace the final .so with a complete file
    # (never a half-written ELF), and a process that already dlopen'd the
    # old library keeps its mapped inode (an in-place `-o libavsi_loader.so`
    # truncates the live mapping -> SIGBUS on the next page fault).
    srcs = [p for p in (_SRC_PATH, _SRC_CTC) if os.path.isfile(p)]
    tmp = f"{_SO_PATH}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             *srcs, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO_PATH)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = not os.path.isfile(_SO_PATH) or any(
            os.path.isfile(src) and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
            for src in (_SRC_PATH, _SRC_CTC)
        )
        if stale:
            if not os.path.isfile(_SRC_PATH) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.avsi_load_batch.restype = ctypes.c_int
        lib.avsi_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ] + [ctypes.c_void_p] * 8
        lib.avsi_parse_file_multi.restype = ctypes.c_int
        lib.avsi_parse_file_multi.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ] + [ctypes.c_void_p] * 8
        if hasattr(lib, "avsi_ctc_beam_search"):
            lib.avsi_ctc_beam_search.restype = ctypes.c_int
            lib.avsi_ctc_beam_search.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
            ]
        if hasattr(lib, "avsi_ctc_beam_search_batch"):
            lib.avsi_ctc_beam_search_batch.restype = ctypes.c_int
            lib.avsi_ctc_beam_search_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int,
            ]
        _lib = lib
        return _lib


def ctc_beam_search(logits: np.ndarray, seq_len: int, beam_width: int = 20,
                    max_out: int = 256) -> list[int] | None:
    """Native CTC prefix beam search for one sequence; None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "avsi_ctc_beam_search"):
        return None
    logits = np.ascontiguousarray(logits, np.float32)
    t_len, c = logits.shape
    # a collapsed CTC hypothesis never exceeds the frame count, so sizing
    # the buffer to t_len makes silent truncation impossible (the python
    # fallback returns the full sequence; parity requires we do too)
    max_out = max(int(max_out), t_len + 1)
    out = np.empty((max_out,), np.int32)
    rc = lib.avsi_ctc_beam_search(
        logits.ctypes.data_as(ctypes.c_void_p), t_len, c, seq_len,
        beam_width, out.ctypes.data_as(ctypes.c_void_p), max_out,
    )
    if rc < 0:
        return None
    return [int(x) for x in out[:rc]]


def ctc_beam_search_batch(logits: np.ndarray, seq_lens, beam_width: int = 20,
                          max_out: int = 256, num_threads: int = 0):
    """Native threaded batch decode; list of label lists, or None.

    logits: (B, T, C) float32; seq_lens: (B,) valid frame counts.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "avsi_ctc_beam_search_batch"):
        return None
    logits = np.ascontiguousarray(logits, np.float32)
    b, t_len, c = logits.shape
    max_out = max(int(max_out), t_len + 1)  # see ctc_beam_search
    seq_lens = np.ascontiguousarray(seq_lens, np.int64)
    out = np.empty((b, max_out), np.int32)
    out_lens = np.empty((b,), np.int32)
    if num_threads <= 0:
        num_threads = min(b, os.cpu_count() or 1)
    rc = lib.avsi_ctc_beam_search_batch(
        logits.ctypes.data_as(ctypes.c_void_p), b, t_len, c,
        seq_lens.ctypes.data_as(ctypes.c_void_p), beam_width,
        out.ctypes.data_as(ctypes.c_void_p), max_out,
        out_lens.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    if rc < 0 or (out_lens < 0).any():
        return None
    return [[int(x) for x in out[i, : out_lens[i]]] for i in range(b)]


def is_available() -> bool:
    return _load() is not None


def load_batch(
    paths: list[str],
    num_audio_samples: int,
    t_frames: int,
    audio_dim: int = 257,
    video_dim: int = 136,
    num_labels: int = 50,
    emb_dim: int = 0,
    threads: int = 0,
    verify_crc: bool = False,
) -> dict:
    """Parse one TFRecord file per path into a stacked batch dict."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no toolchain?)")
    n = len(paths)
    if threads <= 0:
        threads = min(n, os.cpu_count() or 4)
    wav = np.empty((n, num_audio_samples), np.float32)
    video = np.empty((n, t_frames, video_dim), np.float32)
    mask = np.empty((n, t_frames, audio_dim), np.float32)
    labels = np.empty((n, num_labels), np.float32)
    emb = np.empty((n, emb_dim), np.float32) if emb_dim else None
    seq_lens = np.empty((n,), np.int32)
    lab_lens = np.empty((n,), np.int32)
    path_buf = ctypes.create_string_buffer(n * 256)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    rc = lib.avsi_load_batch(
        c_paths, n, threads, num_audio_samples, t_frames, audio_dim,
        video_dim, num_labels, emb_dim, int(verify_crc),
        ptr(wav), ptr(video), ptr(mask), ptr(labels), ptr(emb),
        ptr(seq_lens), ptr(lab_lens),
        ctypes.cast(path_buf, ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(
            f"native loader failed with code {rc} ({_ERROR_CODES.get(rc, 'unknown')}) "
            f"on batch {paths[:2]}... — pass use_native=False to read this "
            "corpus through the pure-Python codec"
        )
    sample_paths = [
        path_buf.raw[i * 256 : (i + 1) * 256].split(b"\x00", 1)[0].decode(errors="replace")
        for i in range(n)
    ]
    out = {
        "sequence_lengths": seq_lens,
        "labels_lengths": lab_lens,
        "target_sources": wav,
        "labels": labels,
        "video_features": video,
        "masks": mask,
        "sample_paths": sample_paths,
    }
    if emb is not None:
        out["embeddings"] = emb
    return out


def load_file_records(
    path: str,
    max_samples: int,
    num_audio_samples: int,
    t_frames: int,
    audio_dim: int = 257,
    video_dim: int = 136,
    num_labels: int = 50,
    emb_dim: int = 0,
    verify_crc: bool = False,
) -> dict:
    """Parse all records of ONE (possibly grouped) TFRecord file.

    Returns the same dict as load_batch with leading dim = record count.
    Raises if the file holds more than max_samples records.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no toolchain?)")
    cap = max_samples + 1  # detect overflow
    wav = np.empty((cap, num_audio_samples), np.float32)
    video = np.empty((cap, t_frames, video_dim), np.float32)
    mask = np.empty((cap, t_frames, audio_dim), np.float32)
    labels = np.empty((cap, num_labels), np.float32)
    emb = np.empty((cap, emb_dim), np.float32) if emb_dim else None
    seq_lens = np.empty((cap,), np.int32)
    lab_lens = np.empty((cap,), np.int32)
    path_buf = ctypes.create_string_buffer(cap * 256)

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    rc = lib.avsi_parse_file_multi(
        path.encode(), int(verify_crc), num_audio_samples, t_frames,
        audio_dim, video_dim, num_labels, emb_dim, 0, cap,
        ptr(wav), ptr(video), ptr(mask), ptr(labels), ptr(emb),
        ptr(seq_lens), ptr(lab_lens), ctypes.cast(path_buf, ctypes.c_void_p),
    )
    if rc < 0:
        raise ValueError(
            f"native loader failed with code {rc} "
            f"({_ERROR_CODES.get(rc, 'unknown')}) on {path}"
        )
    if rc > max_samples:
        raise ValueError(f"{path} holds more than {max_samples} records")
    n = rc
    # copy to exact-size arrays: callers (reader._native_batches_grouped)
    # keep per-sample slices alive across files, and a view would pin the
    # whole oversized (max_samples+1)-row parse buffer for as long as any
    # slice lives — several times the actual data in steady state
    out = {
        "sequence_lengths": seq_lens[:n].copy(),
        "labels_lengths": lab_lens[:n].copy(),
        "target_sources": wav[:n].copy(),
        "labels": labels[:n].copy(),
        "video_features": video[:n].copy(),
        "masks": mask[:n].copy(),
        "sample_paths": [
            path_buf.raw[i * 256 : (i + 1) * 256].split(b"\x00", 1)[0].decode(errors="replace")
            for i in range(n)
        ],
    }
    if emb is not None:
        out["embeddings"] = emb[:n].copy()
    return out
