"""CLIP text encoder (SD 1.5's openai/clip-vit-large-patch14 text tower).

Flax re-implementation of the encoder the reference obtains through
diffusers' StableDiffusionPipeline (reference run_fresco.py:76,190-196 —
prompt encoding with CFG).  Causal-masked transformer, quick-GELU,
final layer norm; ``clip_skip`` exposes penultimate-layer outputs for
community SD checkpoints.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from fresco_tpu.models.layers import quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=77,
        )


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        d = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            return t.reshape(*t.shape[:2], c.num_heads, d).transpose(0, 2, 1, 3)

        s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) * (d**-0.5)
        s = jnp.where(causal_mask, s.astype(jnp.float32), -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(x.shape)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(o)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, clip_skip: int = 0):
        """input_ids: int32 [B, T].  Returns hidden states [B, T, C]."""
        c = self.cfg
        b, t = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=self.dtype,
            name="position_embedding",
        )(jnp.arange(t)[None])
        x = tok + pos
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]
        outputs = []
        for i in range(c.num_layers):
            x = CLIPLayer(c, self.dtype, name=f"layers_{i}")(x, causal)
            outputs.append(x)
        if clip_skip > 0:
            x = outputs[-(clip_skip + 1)]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
        return x
