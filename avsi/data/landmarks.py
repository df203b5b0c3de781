"""Face-landmark feature math + debug overlay renderer (host-side, numpy).

Numerical parts of `/root/reference/av_speech_inpainting/face_landmarks.py`:
anchor-landmark normalization (:20-27) and Δ-motion vectors (:30-39).
The dlib/OpenCV video extraction itself is optional (see extract.py); the
TFRecord schema is the contract, so CI uses synthetic landmarks.

`render_landmark_frames` is the offline equivalent of the reference's
interactive `show_face_landmarks` debug visualizer (:97-180): the same
per-region polylines (jaw/brows/nose open, eyes/mouth-loops closed, the
nose and mouth closing segments included) and per-point dots, rasterized
in pure numpy onto grayscale frames instead of cv2.imshow windows — a
headless framework cannot pop X11 windows, so the overlays are returned
as arrays and optionally written as PNG frame files."""

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


def _draw_segment(img: np.ndarray, p0, p1, value: int) -> None:
    """Rasterize one line segment (dense linspace sampling, clipped)."""
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 1
    xs = np.linspace(p0[0], p1[0], n).round().astype(int)
    ys = np.linspace(p0[1], p1[1], n).round().astype(int)
    ok = (xs >= 0) & (xs < img.shape[1]) & (ys >= 0) & (ys < img.shape[0])
    img[ys[ok], xs[ok]] = value


def _region_segments(pts: np.ndarray, name: str):
    """Index pairs to connect for one facial region — exactly the segments
    the reference draws (face_landmarks.py:131-163)."""
    n = len(pts)
    if name in ("jaw", "right_eyebrow", "left_eyebrow"):
        return [(i - 1, i) for i in range(1, n)]
    if name in ("right_eye", "left_eye"):  # closed loop (starts at pts[-1])
        return [(i - 1, i) for i in range(n)]
    if name == "nose":  # open polyline + bridge->nostril closing segment
        return [(i - 1, i) for i in range(1, n)] + [(n - 1, 3)]
    if name == "mouth":  # outer loop 0..11 + inner loop 12..end, both closed
        return (
            [(i, i + 1) for i in range(11)] + [(0, 11)]
            + [(i, i + 1) for i in range(12, n - 1)] + [(12, n - 1)]
        )
    return []


def render_landmark_frames(
    landmarks: np.ndarray,
    size: int = 240,
    full_draw: bool = False,
    backgrounds: np.ndarray | None = None,
    dot_radius: int = 1,
) -> np.ndarray:
    """Render landmark overlays for every frame; returns (T, H, W) uint8.

    landmarks: (T, 136) or (T, 68, 2) point coordinates. Without
    `backgrounds` (T, H, W grayscale video frames) the canvas is white and
    the points are scaled jointly across frames to fit with a 10% margin
    (synthetic landmarks have no pixel scale); with backgrounds the raw
    pixel coordinates are used, like the reference overlay.
    """
    lm = np.asarray(landmarks, np.float64).reshape(len(landmarks), 68, 2)
    if len(lm) == 0:  # e.g. no face detected anywhere: nothing to draw
        return np.zeros((0, size, size), np.uint8)
    if backgrounds is not None:
        frames = np.asarray(backgrounds, np.uint8).copy()
        if frames.ndim != 3 or len(frames) != len(lm):
            raise ValueError("backgrounds must be (T, H, W) matching landmarks")
        pts_all = lm
    else:
        frames = np.full((len(lm), size, size), 255, np.uint8)
        lo = lm.reshape(-1, 2).min(axis=0)
        hi = lm.reshape(-1, 2).max(axis=0)
        scale = 0.8 * size / max(float((hi - lo).max()), 1e-9)
        pts_all = (lm - lo) * scale + 0.1 * size
    for frame, pts in zip(frames, pts_all):
        if full_draw:
            for name, (j, k) in FACIAL_LANDMARKS_IDXS.items():
                region = pts[j:k]
                for a, b in _region_segments(region, name):
                    _draw_segment(frame, region[a], region[b], 128)
        for x, y in pts:  # dots last, like the reference (drawn over lines)
            xi, yi = int(round(x)), int(round(y))
            y0, y1 = max(yi - dot_radius, 0), min(yi + dot_radius + 1, frame.shape[0])
            x0, x1 = max(xi - dot_radius, 0), min(xi + dot_radius + 1, frame.shape[1])
            frame[y0:y1, x0:x1] = 0
    return frames


def save_landmark_overlays(frames: np.ndarray, out_dir: str) -> list[str]:
    """Write rendered overlay frames as frame_%04d.png files."""
    import os

    from avsi.train.tb import _png_grayscale

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, frame in enumerate(frames):
        p = os.path.join(out_dir, f"frame_{i:04d}.png")
        with open(p, "wb") as f:
            f.write(_png_grayscale(frame))
        paths.append(p)
    return paths


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
