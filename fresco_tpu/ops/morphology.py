"""Mask dilation (NHWC).

Equivalent of reference src/utils.py:81-93 (``Dilate``): a k×k box
filter over a replicate-padded mask, clamped to [0, 1].  For {0,1}
masks this is a morphological dilation.  Expressed as a separable
reduce-window sum, which XLA fuses into two cheap VPU passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dilate(x: jnp.ndarray, kernel_size: int = 7) -> jnp.ndarray:
    """Box-dilate NHWC mask ``x`` with replicate padding; clamp to [0,1]."""
    pad = (kernel_size - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    s = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, kernel_size, 1, 1), (1, 1, 1, 1), "VALID"
    )
    s = jax.lax.reduce_window(
        s, 0.0, jax.lax.add, (1, 1, kernel_size, 1), (1, 1, 1, 1), "VALID"
    )
    return jnp.clip(s, 0.0, 1.0)
