"""Small shared helper for reading clip frames in benches/tools.

bench.py, scripts/bench_full_pipeline.py, and scripts/warm_cache.py all
need "first N RGB frames of a clip, or a fallback" — one home for the
cv2 plumbing instead of three drifting copies.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

#: repo root (this file lives at fresco_tpu/utils/clips.py)
_REPO_ROOT = Path(__file__).resolve().parents[2]


def bundled_clip(name: str) -> str:
    """Path to a bundled demo clip (``data/<name>`` in this repo —
    the four reference demo videos ship with the repo so benches and
    the parity sweep run standalone).  Falls back to the reference
    checkout's copy when the repo-local file is absent."""
    local = _REPO_ROOT / "data" / name
    if local.exists():
        return str(local)
    return f"/root/reference/data/{name}"


def read_frames(path: str, count: int, stride: int = 1) -> list | None:
    """Up to ``count`` RGB uint8 frames sampled every ``stride`` frames.

    Returns None when the clip can't be opened (missing file, cv2
    unavailable) or yields no frames — callers fall back to synthetic
    data.  May return fewer than ``count`` frames on short clips."""
    try:
        import cv2
    except Exception:  # pragma: no cover - cv2 is baked into this env
        return None
    cap = cv2.VideoCapture(path)
    frames: list = []
    i = 0
    while len(frames) < count:
        ok, f = cap.read()
        if not ok:
            break
        if i % stride == 0:
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        i += 1
    cap.release()
    return frames or None
