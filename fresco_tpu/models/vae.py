"""AutoencoderKL (the SD 1.5 VAE), Flax/NHWC.

Equivalent of the diffusers ``AutoencoderKL`` the reference loads as
``stabilityai/sd-vae-ft-mse`` (reference run_fresco.py:75): encoder /
decoder ResNet stacks with one single-head mid-block attention, diagonal
Gaussian latents, scaling factor 0.18215.  The mid attention runs at
(H/8)·(W/8) tokens and goes through the Pallas flash kernel.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from fresco_tpu.attention.flash import flash_attention
from fresco_tpu.models.layers import Conv2d, GroupNorm32


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215

    @staticmethod
    def tiny() -> "VAEConfig":
        # 4 blocks = 3 downsamples, keeping the real /8 latent ratio
        return VAEConfig(
            block_out_channels=(8, 8, 16, 16), layers_per_block=1, norm_groups=4
        )


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Dense(self.out_ch, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class MidAttention(nn.Module):
    """Single-head full self-attention over spatial tokens."""

    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = GroupNorm32(self.groups, epsilon=1e-6, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        o = flash_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return res + o.reshape(b, h, w, c)


class Downsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # diffusers uses asymmetric (0,1) padding for the stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_ch, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return Conv2d(self.out_ch, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = Conv2d(c.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, c.norm_groups, self.dtype, name=f"down_{i}_res_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                h = Downsample(ch, self.dtype, name=f"down_{i}_downsample")(h)
        ch = c.block_out_channels[-1]
        h = ResnetBlock(ch, c.norm_groups, self.dtype, name="mid_res_0")(h)
        h = MidAttention(c.norm_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, c.norm_groups, self.dtype, name="mid_res_1")(h)
        h = GroupNorm32(c.norm_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = Conv2d(2 * c.latent_channels, dtype=self.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        chans = list(reversed(c.block_out_channels))
        h = Conv2d(chans[0], dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(chans[0], c.norm_groups, self.dtype, name="mid_res_0")(h)
        h = MidAttention(c.norm_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(chans[0], c.norm_groups, self.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(chans):
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock(ch, c.norm_groups, self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                h = Upsample(ch, self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(c.norm_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = Conv2d(c.in_channels, dtype=self.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Dense(2 * self.cfg.latent_channels, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.cfg.latent_channels, dtype=self.dtype)

    def encode_moments(self, x):
        """x [B,H,W,3] in [-1,1] -> (mean, logvar) [B,H/8,W/8,4] each."""
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None, sample: bool = True):
        """Encode to a *scaled* latent (includes scaling_factor).

        The reference samples the posterior (pipe_FRESCO.py:160); pass
        ``sample=False`` for the deterministic mean.
        """
        mean, logvar = self.encode_moments(x)
        wd = jnp.promote_types(mean.dtype, jnp.float32)  # f64 passes through
        if sample:
            if rng is None:
                raise ValueError("rng required when sampling the posterior")
            std = jnp.exp(0.5 * logvar.astype(wd))
            noise = jax.random.normal(rng, mean.shape, dtype=wd)
            z = mean.astype(wd) + std * noise
        else:
            z = mean.astype(wd)
        return (z * self.cfg.scaling_factor).astype(self.dtype)

    def decode(self, z):
        """Decode a scaled latent to an image in [-1,1] (unclamped)."""
        z = (z / self.cfg.scaling_factor).astype(self.dtype)
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample: bool = False):
        z = self.encode(x, rng=rng, sample=sample)
        return self.decode(z)
