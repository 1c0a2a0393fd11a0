"""FreeU: free-lunch UNet enhancement (backbone scaling + skip FFT filter).

Equivalent of reference src/free_lunch_utils.py: inside the UNet decoder,
(a) the first half of the backbone channels are scaled by a mean-modulated
factor b, and (b) the skip connection is low-pass filtered in Fourier
space with scale s (free_lunch_utils.py:25-52,108-184).  Here these are
pure functions called from the UNet up-blocks (no monkey-patching).
"""
from __future__ import annotations

import jax.numpy as jnp


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale low-frequency components of NHWC ``x`` by ``scale``.

    Equivalent of reference free_lunch_utils.py:25-52 (Fourier_filter),
    NHWC and fp32 FFT (TPU FFT runs in fp32).
    """
    orig_dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    h, w = x.shape[1:3]
    cy, cx = h // 2, w // 2
    # reference slices [c-thr, c+thr) (free_lunch_utils.py:44-46)
    yy = (jnp.arange(h) - cy)[:, None]
    xx = (jnp.arange(w) - cx)[None, :]
    low = (yy >= -threshold) & (yy < threshold) & (xx >= -threshold) & (xx < threshold)
    mask = jnp.where(low, scale, 1.0)[None, :, :, None]
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(orig_dtype)


def apply_freeu_to_skip(
    hidden: jnp.ndarray,
    skip: jnp.ndarray,
    b: float,
    s: float,
    num_backbone_channels: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply FreeU to a (backbone hidden, skip) pair at one up-block stage.

    Mirrors free_lunch_utils.py:120-139: the first ``num_backbone_channels``
    channels of ``hidden`` are scaled by a per-sample mean-modulated b;
    ``skip``'s low frequencies (threshold 1) are scaled by s.
    """
    c = num_backbone_channels
    hidden_mean = jnp.mean(hidden, axis=-1, keepdims=True)  # [B,H,W,1]
    hmin = jnp.min(hidden_mean, axis=(1, 2), keepdims=True)
    hmax = jnp.max(hidden_mean, axis=(1, 2), keepdims=True)
    hidden_mean = (hidden_mean - hmin) / (hmax - hmin + 1e-12)
    scale = (b - 1.0) * hidden_mean + 1.0
    scaled = jnp.concatenate(
        [hidden[..., :c] * scale.astype(hidden.dtype), hidden[..., c:]], axis=-1
    )
    skip = fourier_filter(skip, threshold=1, scale=s)
    return scaled, skip
