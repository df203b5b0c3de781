"""Audio/video frame-rate alignment.

Reference: `/root/reference/av_speech_inpainting/av_sync.py` — upsamples
75-frame (25 fps) landmark features to the 250-frame STFT rate via linear
time interpolation (the reference used the now-removed
`scipy.interpolate.interp2d(kind='linear')`, which for full-grid queries is
exactly per-column 1-D linear interpolation), replicates the first frame
when 70<=frames<75, and rejects corrupt inputs.
"""

from __future__ import annotations

import numpy as np


def inc_fps(frames: np.ndarray, target_len: int) -> np.ndarray:
    """Linear-interpolate (T, D) features to (target_len, D) along time."""
    y = np.arange(frames.shape[0], dtype=np.float64)
    y_inc = np.linspace(0, len(frames) * (1 - 1 / target_len), target_len)
    # interp2d clamps queries outside the grid to the boundary values
    y_inc = np.clip(y_inc, y[0], y[-1])
    out = np.empty((target_len, frames.shape[1]), dtype=np.float64)
    for d in range(frames.shape[1]):
        out[:, d] = np.interp(y_inc, y, frames[:, d])
    return out


def sync_audio_visual_features(
    mask: np.ndarray,
    video_features: np.ndarray,
    tot_frames: int | None = None,
    min_frames: int | None = None,
    pad: str = "start",
):
    """Reference `sync_audio_visual_features` (av_sync.py:15-40)."""
    if video_features.ndim != 2 or (
        min_frames is not None and video_features.shape[0] < min_frames
    ):
        return None
    if tot_frames is not None and video_features.shape[0] < tot_frames:
        n_rep = tot_frames - video_features.shape[0]
        rep = np.tile(video_features[0], (n_rep, 1))
        if pad == "start":
            video_features = np.vstack((rep, video_features))
        elif pad == "end":
            video_features = np.vstack((video_features, rep))

    video_features = inc_fps(video_features, len(mask))
    if len(mask) == len(video_features):
        return video_features
    return None
