"""HED edge detector (ControlNet's Apache-2 variant), Flax/NHWC.

Equivalent of reference src/ControlNet/annotator/hed/__init__.py:17-78:
5 VGG-style double/triple conv blocks with per-block 1-channel
projections; the edge map is sigmoid(mean of the 5 upsampled
projections).  RGB input in [0, 255] minus a learned per-channel bias.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fresco_tpu.ops.resize import max_pool2d, resize_bilinear


class _Block(nn.Module):
    out_ch: int
    layers: int
    down: bool

    @nn.compact
    def __call__(self, x):
        if self.down:
            x = max_pool2d(x, 2)
        for i in range(self.layers):
            x = nn.Conv(self.out_ch, (3, 3), padding=1, name=f"convs_{i}")(x)
            x = nn.relu(x)
        proj = nn.Conv(1, (1, 1), name="projection")(x)
        return x, proj


class HED(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, H, W, 3] RGB in [0,255].  Returns edge map [B, H, W]
        in [0,1] (sigmoid of the mean of the 5 projections, resized)."""
        b, h, w, _ = x.shape
        norm = self.param("norm", nn.initializers.zeros, (1, 1, 1, 3))
        hfeat = x - norm
        specs = [(64, 2, False), (128, 2, True), (256, 3, True),
                 (512, 3, True), (512, 3, True)]
        projections = []
        for i, (ch, layers, down) in enumerate(specs):
            hfeat, proj = _Block(ch, layers, down, name=f"block{i+1}")(hfeat)
            projections.append(proj)
        ups = [resize_bilinear(p, (h, w)) for p in projections]
        mean = jnp.mean(jnp.stack(ups, axis=0), axis=0)[..., 0]
        return jax.nn.sigmoid(mean)


def convert_hed(sd) -> dict:
    """torch ControlNetHED.pth state dict -> flax params."""
    from fresco_tpu.models.convert import _Builder, _np

    b = _Builder(sd)
    tree = b.tree
    tree["norm"] = _np(sd["norm"]).transpose(0, 2, 3, 1)
    for blk in range(1, 6):
        i = 0
        while b.has(f"block{blk}.convs.{i}.weight"):
            b.raw_conv(f"block{blk}/convs_{i}", f"block{blk}.convs.{i}")
            i += 1
        b.raw_conv(f"block{blk}/projection", f"block{blk}.projection")
    return b.tree


def hed_detector(hed: HED, params, img: np.ndarray) -> np.ndarray:
    """Host-convenience wrapper matching HEDdetector.__call__ (uint8 in,
    uint8 edge out)."""
    x = jnp.asarray(img, jnp.float32)[None]
    edge = np.asarray(hed.apply(params, x))[0]
    return np.clip(edge * 255.0, 0, 255).astype(np.uint8)
