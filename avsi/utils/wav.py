"""WAV I/O helpers.

The reference reads waves as raw int16 sample values (pydub
`get_array_of_samples`, tfrecord_utils.py:82-83) and writes enhanced audio
as int16 (inference.py:162).  We keep that convention: waveforms flow
through the pipeline as float32 arrays holding int16-scale values.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile


def read_wav_int16(path: str) -> tuple[int, np.ndarray]:
    """Read a wav as float32 int16-scale samples (mono)."""
    sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    if data.dtype == np.int16:
        out = data.astype(np.float32)
    elif data.dtype == np.int32:
        out = (data / 65536.0).astype(np.float32)
    elif data.dtype in (np.float32, np.float64):
        out = (data * 32767.0).astype(np.float32)
    elif data.dtype == np.uint8:
        # 8-bit PCM is unsigned with 128 = silence: recenter and rescale
        out = ((data.astype(np.float32) - 128.0) * 256.0)
    else:
        out = data.astype(np.float32)
    return sr, out


def write_wav_int16(path: str, data: np.ndarray, sample_rate: int = 16000) -> None:
    wavfile.write(path, sample_rate, np.clip(data, -32768, 32767).astype(np.int16))
