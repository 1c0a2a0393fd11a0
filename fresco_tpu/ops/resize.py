"""Bilinear resize and pooling matching torch ``F.interpolate`` semantics.

The FRESCO math depends on torch's exact (non-antialiased) bilinear
resize in several places — flow rescaling (reference src/flow_utils.py:26,
src/diffusion_hacked.py:439-442), attention-mask construction
(diffusion_hacked.py:937) and occlusion max-pool downsampling.  XLA's
``jax.image.resize`` antialiases on downsample, so we implement the
source-coordinate gather directly (separable along H then W), which also
maps well to the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_resize(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    out_pos = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        scale = (in_size - 1) / max(out_size - 1, 1)
        src = out_pos * scale
    else:
        scale = in_size / out_size
        src = jnp.maximum((out_pos + 0.5) * scale - 0.5, 0.0)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0.astype(jnp.float32)).astype(x.dtype)
    w0 = (1.0 - w1).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    g0 = jnp.take(x, i0, axis=axis)
    g1 = jnp.take(x, i1, axis=axis)
    return g0 * w0.reshape(shape) + g1 * w1.reshape(shape)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    *,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear-resize NHWC (or [...,H,W,C]) ``x`` to ``out_hw``.

    Matches torch F.interpolate(mode='bilinear', antialias=False) for both
    align_corners settings (used at reference geometry/flow_utils call
    sites).  H is axis -3 and W is axis -2.
    """
    x = _axis_resize(x, x.ndim - 3, out_hw[0], align_corners)
    x = _axis_resize(x, x.ndim - 2, out_hw[1], align_corners)
    return x


def max_pool2d(x: jnp.ndarray, kernel: int, stride: int | None = None) -> jnp.ndarray:
    """Max-pool NHWC ``x`` (torch F.max_pool2d equivalent, VALID padding).

    Used for occlusion-mask downsampling (reference
    src/diffusion_hacked.py:440,442 and src/flow_utils.py:27,31).
    """
    stride = stride or kernel
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int | None = None) -> jnp.ndarray:
    """Average-pool NHWC ``x`` (VALID padding)."""
    stride = stride or kernel
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kernel, kernel, 1), (1, stride, stride, 1), "VALID"
    )
    return summed / (kernel * kernel)
