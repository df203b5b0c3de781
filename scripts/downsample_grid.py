"""Downsample GRID speaker audio 50 kHz -> 16 kHz.

Reference: `/root/reference/scripts/downsampling_grid.py:8-31` (speakers
s1..s34, writes `s<N>_16kHz/` next to the originals).

Usage: python scripts/downsample_grid.py <grid_root> [first_spk last_spk]
"""

import os
import sys
from glob import glob

import numpy as np
from scipy import signal
from scipy.io import wavfile


def downsample_speaker(grid_root: str, spk: int, target_rate: int = 16000) -> int:
    src_dir = os.path.join(grid_root, f"s{spk}", f"s{spk}_50kHz")
    if not os.path.isdir(src_dir):
        src_dir = os.path.join(grid_root, f"s{spk}")
    out_dir = os.path.join(grid_root, f"s{spk}", f"s{spk}_16kHz")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for path in sorted(glob(os.path.join(src_dir, "*.wav"))):
        sr, data = wavfile.read(path)
        if data.ndim > 1:
            data = data[:, 0]
        num = int(target_rate * len(data) / sr)
        out = signal.resample(data.astype(np.float64), num) if sr != target_rate else data
        wavfile.write(
            os.path.join(out_dir, os.path.basename(path)),
            target_rate,
            np.clip(out, -32768, 32767).astype(np.int16),
        )
        n += 1
    return n


if __name__ == "__main__":
    root = sys.argv[1]
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 34
    for spk in range(lo, hi + 1):
        if os.path.isdir(os.path.join(root, f"s{spk}")):
            n = downsample_speaker(root, spk)
            print(f"s{spk}: {n} files")
