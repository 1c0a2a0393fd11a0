"""Shared NN building blocks for the SD model family (Flax linen, NHWC).

TPU conventions: convolutions in NHWC (XLA's native TPU layout),
GroupNorm/softmax in fp32, matmuls in the module dtype (bf16 by default)
with fp32 accumulation via ``preferred_element_type`` inside attention.
"""
from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class GroupNorm32(nn.Module):
    """GroupNorm computed in AT LEAST fp32: bf16 inputs upcast to fp32
    (the reference's mixed-precision convention); float64 inputs stay
    float64 so the f64 sharding-validation mode keeps its reduction
    noise at 1e-16 (see parallel/smoke.py)."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        work = jnp.promote_types(orig, jnp.float32)
        out = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=work
        )(x.astype(work))
        return out.astype(orig)


def timestep_embedding(
    t: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding
    semantics used by the SD1.5 UNet: flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP over the sinusoidal embedding."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb.astype(self.dtype))
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class Conv2d(nn.Module):
    """NHWC conv with torch-compatible parameter naming."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dtype=self.dtype,
            use_bias=self.use_bias,
        )(x)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


ACTIVATIONS: dict[str, Callable] = {
    "silu": nn.silu,
    "gelu": nn.gelu,
    "quick_gelu": quick_gelu,
    "relu": nn.relu,
}
