"""Face-landmark feature math (host-side, numpy).

Numerical parts of `/root/reference/av_speech_inpainting/face_landmarks.py`:
anchor-landmark normalization (:20-27) and Δ-motion vectors (:30-39).
The dlib/OpenCV video extraction itself is optional (see extract.py); the
TFRecord schema is the contract, so CI uses synthetic landmarks.
"""

from __future__ import annotations

import numpy as np

FACIAL_LANDMARKS_IDXS = {
    "mouth": (48, 68),
    "right_eyebrow": (17, 22),
    "left_eyebrow": (22, 27),
    "right_eye": (36, 42),
    "left_eye": (42, 48),
    "nose": (27, 36),
    "jaw": (0, 17),
}


def adjust_landmarks(landmarks: np.ndarray, anchor_landmark: int = 33) -> np.ndarray:
    """Subtract the anchor landmark (nose tip #33) and drop its coords."""
    adjusted = landmarks - np.expand_dims(landmarks[:, anchor_landmark], axis=1)
    deleted = list(range(anchor_landmark * 2, landmarks.size, 136)) + list(
        range(anchor_landmark * 2 + 1, landmarks.size, 136)
    )
    return np.delete(adjusted, deleted)


def get_motion_vector(
    landmarks: np.ndarray, delta: int = 1, anchor_landmark: int = -1
) -> np.ndarray:
    """First/second-order landmark motion (face_landmarks.py:30-39)."""
    features = landmarks
    if anchor_landmark >= 0:
        features = adjust_landmarks(landmarks, anchor_landmark)
    if delta > 0:
        features = np.zeros_like(landmarks)
        features[1:] = landmarks[1:] - landmarks[:-1]
        if delta == 2:
            features = features[1:] - features[:-1]
    return features
