"""dlib/OpenCV face-landmark extraction (offline video preprocessing).

Reference: `/root/reference/av_speech_inpainting/face_landmarks.py:42-238`.
This stays host-side CPU work (SURVEY.md §2.3); dlib/OpenCV are optional —
the import is deferred and a clear error names the missing dependency.  The
TFRecord schema is the contract, so the rest of the framework (and CI) runs
on synthetic landmarks when these libraries are absent.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np

from avsi.data.landmarks import get_motion_vector


def _require_cv():
    try:
        import cv2
        import dlib
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "video_preprocessing requires the optional host-side dependencies "
            "dlib and opencv-python (cv2); they are not part of the TPU "
            "compute path. Install them or provide precomputed landmarks."
        ) from e
    return cv2, dlib


def extract_face_landmarks(video_filename: str, predictor_params: str, refresh_size: int = 8):
    """Frontal-face detector + 68-pt predictor + correlation tracker
    (re-detect every `refresh_size` frames or when tracking quality < 8.75,
    face_landmarks.py:42-94)."""
    cv2, dlib = _require_cv()
    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(predictor_params)
    tracker = dlib.correlation_tracker()

    cap = cv2.VideoCapture(video_filename)
    tracking_face = False
    since_detect = 0
    landmarks, face_rects = [], []
    rect = None
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if tracking_face and since_detect < refresh_size:
            if tracker.update(gray) >= 8.75:
                since_detect += 1
            else:
                tracking_face = False
        if not (tracking_face and since_detect < refresh_size):
            since_detect = 0
            rects = detector(gray, 1)
            if rects:
                rect = rects[0]
                tracker.start_track(frame, rect)
                tracking_face = True
        if rect:
            shape = predictor(gray, rect)
            pts = np.array([[p.x, p.y] for p in shape.parts()])
            landmarks.append(pts)
            face_rects.append(
                (rect.left(), rect.top(), rect.width(), rect.height())
            )
    cap.release()
    return np.array(landmarks), np.array(face_rects)


def show_face_landmarks(
    video_filename: str, predictor_params: str, out_dir: str,
    full_draw: bool = False, bb_draw: bool = False, frame_draw: bool = True,
    refresh_size: int = 8,
) -> list[str]:
    """Offline equivalent of the reference debug overlay visualizer
    (face_landmarks.py:97-180): extract landmarks from the video, draw the
    same region polylines/dots/bounding boxes, and write PNG frames to
    `out_dir` instead of cv2.imshow-ing them (headless environments)."""
    cv2, _ = _require_cv()
    from avsi.data.landmarks import render_landmark_frames, save_landmark_overlays

    lm, rects = extract_face_landmarks(video_filename, predictor_params, refresh_size)
    if lm.size == 0:  # no face in the whole video: nothing to draw
        print(f"Skipped {video_filename}: no face detected")
        return []
    cap = cv2.VideoCapture(video_filename)
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
    cap.release()
    # landmarks run contiguously from the FIRST detection to the last
    # frame (extract appends for every frame once `rect` is set), so
    # landmark i belongs to frame n_frames - len(lm) + i — pairing with
    # the first len(lm) frames would misalign overlays whenever early
    # frames had no face
    start = max(0, len(frames) - len(lm))
    bg = np.stack(frames[start:]) if frames else None
    if bg is not None and not frame_draw:
        # reference blanks the frame but keeps video dims + raw pixel
        # coords (face_landmarks.py:119-120)
        bg = np.full_like(bg, 255)
    lm = lm[: len(bg)] if bg is not None else lm
    out = render_landmark_frames(lm, full_draw=full_draw, backgrounds=bg)
    if bb_draw and bg is not None:
        h_img, w_img = out.shape[1:]
        for img, (x, y, w, h) in zip(out, rects):
            x0, x1 = np.clip([x, x + w], 0, w_img - 1)
            y0, y1 = np.clip([y, y + h], 0, h_img - 1)
            img[y0 : y1 + 1, [x0, x1]] = 0
            img[[y0, y1], x0 : x1 + 1] = 0
    return save_landmark_overlays(out, out_dir)


def save_face_landmarks_speaker(
    data_dir: str, n_speaker: int, video_dir: str, dest_dir: str,
    predictor_params: str, ext: str = "mpg",
):
    """Per-speaker extraction + motion-vector stats
    (face_landmarks.py:183-225)."""
    spk_dir = os.path.join(data_dir, f"s{n_speaker}")
    videos = sorted(glob(os.path.join(spk_dir, video_dir, f"*.{ext}")))
    out_dir = os.path.join(spk_dir, dest_dir)
    os.makedirs(out_dir, exist_ok=True)
    all_motion = []
    for video in videos:
        name = os.path.splitext(os.path.basename(video))[0]
        lm, _ = extract_face_landmarks(video, predictor_params)
        if lm.size == 0:
            print(f"Skipped {video}: no face detected")
            continue
        flat = lm.reshape(len(lm), -1).astype(np.float64)
        np.save(os.path.join(out_dir, name + ".npy"), flat)
        all_motion.append(get_motion_vector(flat, delta=1))
    if all_motion:
        stacked = np.concatenate(all_motion, axis=0)
        np.save(os.path.join(out_dir, "video_feat_mean.npy"), stacked.mean(axis=0))
        np.save(os.path.join(out_dir, "video_feat_std.npy"), stacked.std(axis=0) + 1e-8)


def save_face_landmarks(
    data_dir: str, speaker_ids: list[int], video_dir: str, dest_dir: str,
    predictor_params: str, ext: str = "mpg",
):
    """CLI entry (face_landmarks.py:228-238)."""
    for spk in speaker_ids:
        print(f"Extracting landmarks for speaker {spk}...")
        save_face_landmarks_speaker(
            data_dir, spk, video_dir, dest_dir, predictor_params, ext
        )
