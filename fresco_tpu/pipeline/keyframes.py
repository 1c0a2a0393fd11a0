"""Keyframe selection by maximal inter-frame motion.

Equivalent of reference src/keyframe_selection.py:20-60: keyframes are
greedily inserted at the frame of maximal MSE between consecutive
blurred/downscaled frames, subject to a minimum interval, until no
interval exceeds ``maxinterv``.  Host-side (video decode is IO-bound);
the per-frame MSE reduction is vectorized with numpy.
"""
from __future__ import annotations

import numpy as np

from fresco_tpu.ops.image import resize_image, gaussian_blur9

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _max_interval(keys: list[int]) -> int:
    return max((b - a for a, b in zip(keys, keys[1:])), default=1)


def select_keyframes_from_errors(
    err: np.ndarray, mininterv: int, maxinterv: int
) -> list[int]:
    """Greedy keyframe insertion given per-frame motion errors.

    err[i] = motion error between frame i-1 and i (err[0] == 0).
    Mirrors keyframe_selection.py:43-53.
    """
    err = np.asarray(err, dtype=np.float64).copy()
    n_frames = len(err)
    keys = [0, n_frames - 1]
    err[0:mininterv] = -1
    err[len(err) - mininterv :] = -1
    while _max_interval(keys) > maxinterv:
        ind = int(np.argmax(err))
        if err[ind] == -1:
            break
        err[max(ind - mininterv, 0) : ind + mininterv] = -1
        # insert keeping sorted order (keyframe_selection.py:6-10)
        for i, k in enumerate(keys):
            if ind < k:
                keys.insert(i, ind)
                break
    return keys


def frame_motion_errors(frames: list[np.ndarray], resolution: int = 512) -> np.ndarray:
    """MSE between consecutive blurred, resized frames in [-1,1] range."""
    err = [0.0]
    prev = None
    for f in frames:
        img = gaussian_blur9(resize_image(f, resolution))
        cur = img.astype(np.float64) / 255.0 * 2.0 - 1.0
        if prev is not None:
            err.append(float(np.mean((cur - prev) ** 2)))
        prev = cur
    return np.asarray(err)


def select_keyframes(
    video_path: str,
    lastframen: int = int(1e10),
    mininterv: int = 5,
    maxinterv: int = 20,
) -> list[int]:
    """Pick keyframe indices from a video file (keyframe_selection.py:20-60)."""
    if maxinterv == mininterv:
        return list(range(0, lastframen, mininterv))
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 unavailable")
    cap = cv2.VideoCapture(video_path)
    n_frames = max(1, min(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)), lastframen))
    frames = []
    for _ in range(n_frames):
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    err = frame_motion_errors(frames)
    return select_keyframes_from_errors(err, mininterv, maxinterv)
