"""Image/tensor conventions and host-side preprocessing.

NHWC equivalents of reference src/utils.py:8-49.  Host-side (numpy/cv2)
resizing keeps cv2's LANCZOS4/AREA kernels for bit-parity with the
reference's frame preparation (utils.py:39-49); everything after that
point lives on device.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

try:  # cv2 is available in this image; gate anyway for minimal installs
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def uint8_to_unit_range(img: np.ndarray) -> jnp.ndarray:
    """uint8 [H,W,C] (or [B,H,W,C]) -> float32 [-1,1] [B,H,W,C].

    Equivalent of reference utils.py:8-12 (NHWC instead of NCHW).
    """
    x = jnp.asarray(img, dtype=jnp.float32) / 255.0 * 2.0 - 1.0
    if x.ndim == 3:
        x = x[None]
    return x


def unit_range_to_uint8(x) -> np.ndarray:
    """float [-1,1] [B,H,W,C] -> uint8 [B,H,W,C] (utils.py:17-21)."""
    img = np.asarray(jnp.clip(x / 2 + 0.5, 0.0, 1.0), dtype=np.float32)
    return np.round(img * 255.0).astype(np.uint8)


def resolution_to_64(h: int, w: int, resolution: int = 512) -> tuple[int, int]:
    """Scale (h, w) so the short side ≈ resolution, rounded to /64.

    Equivalent of reference utils.py:39-47.
    """
    k = float(resolution) / min(h, w)
    h2 = int(np.round(h * k / 64.0)) * 64
    w2 = int(np.round(w * k / 64.0)) * 64
    return h2, w2


def resize_image(img: np.ndarray, resolution: int = 512) -> np.ndarray:
    """Host-side resize of an HWC uint8 frame (utils.py:39-49)."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 unavailable")
    h, w = img.shape[:2]
    h2, w2 = resolution_to_64(h, w, resolution)
    k = float(resolution) / min(h, w)
    interp = cv2.INTER_LANCZOS4 if k > 1 else cv2.INTER_AREA
    return cv2.resize(img, (w2, h2), interpolation=interp)


def gaussian_blur9(img: np.ndarray) -> np.ndarray:
    """9x9 sigma-auto Gaussian blur (keyframe selection preprocessing,
    reference src/keyframe_selection.py:33)."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 unavailable")
    return cv2.GaussianBlur(img, (9, 9), 0.0)
