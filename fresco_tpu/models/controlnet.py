"""ControlNet (lllyasviel/sd-controlnet-{hed,depth,canny} family), Flax/NHWC.

Equivalent of the diffusers ``ControlNetModel`` the reference drives per
denoise step (reference src/pipe_FRESCO.py:184-196): a copy of the UNet
encoder+mid conditioned on an edge/depth map through a small conv
embedding, emitting zero-conv residuals for every UNet skip plus the mid
block.  Shares block modules with fresco_tpu.models.unet.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fresco_tpu.models.layers import Conv2d, TimestepEmbedding, timestep_embedding
from fresco_tpu.models.unet import (
    Downsample,
    ResnetBlock,
    Transformer2D,
    UNetConfig,
)


class ControlNetConditioningEmbedding(nn.Module):
    """Maps the [0,1] RGB condition image to the latent resolution."""

    out_ch: int
    dtype: jnp.dtype
    block_channels: tuple[int, ...] = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, cond):
        h = Conv2d(self.block_channels[0], dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_channels) - 1):
            h = Conv2d(self.block_channels[i], dtype=self.dtype, name=f"blocks_{2*i}")(h)
            h = nn.silu(h)
            h = Conv2d(
                self.block_channels[i + 1], stride=2, dtype=self.dtype,
                name=f"blocks_{2*i+1}",
            )(h)
            h = nn.silu(h)
        # zero-initialized output conv
        h = nn.Conv(
            self.out_ch, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )(h)
        return h


class ControlNet(nn.Module):
    cfg: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.bfloat16
    cond_embed_channels: tuple[int, ...] = (16, 32, 96, 256)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        cond: jnp.ndarray,
        conditioning_scale: jnp.ndarray | float = 1.0,
        *,
        cond_is_embedded: bool = False,
    ) -> tuple[Sequence[jnp.ndarray], jnp.ndarray]:
        """sample [B,h,w,4]; cond [B,8h,8w,3] in [0,1] — or, with
        ``cond_is_embedded=True``, the precomputed latent-resolution
        embedding from :meth:`embed_cond`.

        The conditioning embedding depends only on the (fixed per batch)
        control image — the reference recomputes it every denoise step
        (pipe_FRESCO.py:188-196); here the sampler hoists it out of the
        scanned loop.

        Returns (down_residuals, mid_residual) scaled by
        ``conditioning_scale`` (pipe_FRESCO.py:193).
        """
        c = self.cfg
        chans = c.block_out_channels
        context = encoder_hidden_states.astype(self.dtype)

        t = jnp.broadcast_to(jnp.atleast_1d(timestep), (sample.shape[0],))
        temb = timestep_embedding(t, chans[0])
        temb = TimestepEmbedding(chans[0] * 4, self.dtype, name="time_embedding")(temb)

        h = Conv2d(chans[0], dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        if cond_is_embedded:
            h = h + cond.astype(self.dtype)
        else:
            h = h + ControlNetConditioningEmbedding(
                chans[0], self.dtype, self.cond_embed_channels,
                name="controlnet_cond_embedding",
            )(cond.astype(self.dtype))

        residuals = [h]
        for i, ch in enumerate(chans):
            has_attn = i < len(chans) - 1
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, c.norm_groups, self.dtype, name=f"down_{i}_res_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(
                        c.attention_heads, c.norm_groups, self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, context, None, -1)
                residuals.append(h)
            if i < len(chans) - 1:
                h = Downsample(ch, self.dtype, name=f"down_{i}_downsample")(h)
                residuals.append(h)

        h = ResnetBlock(chans[-1], c.norm_groups, self.dtype, name="mid_res_0")(h, temb)
        h = Transformer2D(
            c.attention_heads, c.norm_groups, self.dtype, name="mid_attn"
        )(h, context, None, -1)
        h = ResnetBlock(chans[-1], c.norm_groups, self.dtype, name="mid_res_1")(h, temb)

        # zero convs (1x1), zero-initialized
        down_out = []
        for idx, r in enumerate(residuals):
            z = nn.Dense(
                r.shape[-1], dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name=f"controlnet_down_blocks_{idx}",
            )(r)
            down_out.append(z * conditioning_scale)
        mid_out = nn.Dense(
            h.shape[-1], dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="controlnet_mid_block",
        )(h) * conditioning_scale
        return tuple(down_out), mid_out


def embed_cond(controlnet: ControlNet, params: dict, cond: jnp.ndarray):
    """Apply just the conditioning embedding (params live under the
    'controlnet_cond_embedding' scope).  Used by the sampler to hoist the
    edge-image conv stack out of the denoise loop."""
    emb = ControlNetConditioningEmbedding(
        controlnet.cfg.block_out_channels[0],
        controlnet.dtype,
        controlnet.cond_embed_channels,
    )
    sub = params["params"]["controlnet_cond_embedding"]
    return emb.apply({"params": sub}, cond.astype(controlnet.dtype))
