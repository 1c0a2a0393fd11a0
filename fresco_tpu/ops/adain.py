"""Adaptive instance normalization (NHWC).

Equivalent of reference src/utils.py:58-78.  The ``chunk=2`` variant
shares statistics across the CFG pair (uncond/cond halves of the batch):
the reference concatenates the two halves along W before computing
per-(N/2, C) statistics and then repeats them — here expressed directly
as a reshape.
"""
from __future__ import annotations

import jax.numpy as jnp


def calc_mean_std(feat: jnp.ndarray, eps: float = 1e-5, chunk: int = 1):
    """Per-sample, per-channel mean/std of NHWC ``feat``.

    Returns ([N,1,1,C], [N,1,1,C]).  With chunk=2 the two batch halves
    share statistics (reference utils.py:58-67).  Variance uses the
    unbiased estimator to match ``torch.var``.
    """
    n, h, w, c = feat.shape
    g = feat.reshape(chunk, n // chunk, h * w, c)
    g = jnp.moveaxis(g, 0, 2).reshape(n // chunk, chunk * h * w, c)
    mean = jnp.mean(g, axis=1)
    count = g.shape[1]
    var = jnp.sum((g - mean[:, None, :]) ** 2, axis=1) / max(count - 1, 1)
    std = jnp.sqrt(var + eps)
    mean = jnp.tile(mean, (chunk, 1))[:, None, None, :]
    std = jnp.tile(std, (chunk, 1))[:, None, None, :]
    return mean, std


def adain(
    content: jnp.ndarray,
    style: jnp.ndarray,
    style_eps: float = 1e-5,
) -> jnp.ndarray:
    """Re-normalize ``content`` to ``style``'s instance statistics.

    Equivalent of reference utils.py:70-78 (used to renormalize optimized
    decoder features back to the pre-optimization statistics,
    diffusion_hacked.py:488).

    Reference quirk, reproduced for parity: utils.py:73 calls
    ``calc_mean_std(style_feat, chunk)`` — the second positional arg of
    calc_mean_std is *eps*, so the intended chunk lands in eps and the
    style std is computed as sqrt(var + chunk).  With the default chunk=1
    (the only call site, diffusion_hacked.py:488) the style statistics
    use eps=1.0 while content statistics use eps=1e-5.  Pass
    ``style_eps=1.0`` to match (guidance.py does); style chunking itself
    is never exercised by the reference, so there is no chunk parameter
    here — use calc_mean_std(chunk=...) directly if ever needed.
    """
    style_mean, style_std = calc_mean_std(style, eps=style_eps)
    content_mean, content_std = calc_mean_std(content)
    normalized = (content - content_mean) / content_std
    return normalized * style_std + style_mean
