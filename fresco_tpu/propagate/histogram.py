"""Lab-space contrast-preserving histogram blend.

Equivalent of reference src/ebsynth/blender/histogram_blend.py: both
propagated candidates are normalized to a common Lab target
distribution, combined with contrast restoration, then matched to the
min-error image's statistics.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _transform(x, mean, std, t_mean, t_std):
    return (x.astype(np.float32) - mean) * t_std / std + t_mean


def histogram_blend(
    a: np.ndarray,
    b: np.ndarray,
    min_error: np.ndarray,
    weight1: float = 0.5,
    weight2: float = 0.5,
) -> np.ndarray:
    """a/b/min_error: uint8 BGR images.  Returns uint8 BGR blend
    (histogram_blend.py:19-50)."""
    lab = lambda x: cv2.cvtColor(x, cv2.COLOR_BGR2Lab)
    a_l, b_l, me_l = lab(a), lab(b), lab(min_error)
    stats = lambda x: (np.mean(x, axis=(0, 1)), np.std(x, axis=(0, 1)))
    a_m, a_s = stats(a_l)
    b_m, b_s = stats(b_l)
    me_m, me_s = stats(me_l)

    t_mean = np.full((3,), 0.5 * 256, np.float32)
    t_std = np.full((3,), 256 / 36, np.float32)
    a_n = _transform(a_l, a_m, a_s, t_mean, t_std)
    b_n = _transform(b_l, b_m, b_s, t_mean, t_std)
    ab = (a_n * weight1 + b_n * weight2 - 0.5 * 256) / 0.5 + 0.5 * 256
    ab_m, ab_s = stats(ab)
    ab = _transform(ab, ab_m, ab_s, me_m, me_s)
    ab = np.clip(np.round(ab), 0, 255).astype(np.uint8)
    return cv2.cvtColor(ab, cv2.COLOR_Lab2BGR)
