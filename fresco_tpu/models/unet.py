"""SD 1.5 UNet2DConditionModel, Flax/NHWC, with first-class FRESCO hooks.

Functional re-design of what the reference reaches by monkey-patching
diffusers (reference src/diffusion_hacked.py:491-816 ``my_forward`` and
:390-403 ``apply_FRESCO_attn``):

  * self-attention layers in the last two up blocks take a
    ``FrescoAttnParams`` pytree and run the FRESCO attention variants
    (fresco_tpu.attention) instead of being monkey-patched processors;
  * a ``guidance_fn(stage, x)`` hook runs before each decoder stage —
    the feature-optimization + background-smoothing insertion point
    (diffusion_hacked.py:773-779);
  * ``return_up_features`` returns the decoder features entering each up
    block (diffusion_hacked.py:760,773-774) for the reference pass that
    builds gram matrices;
  * ControlNet residuals are explicit inputs (diffusion_hacked.py:704-754);
  * FreeU is a config flag applied inside the up blocks
    (src/free_lunch_utils.py), not a forward patch.

TPU notes: NHWC convs, bf16 params/compute with fp32 GroupNorm/softmax;
attention uses the Pallas flash kernel through fresco_self_attention.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fresco_tpu.attention.fresco_attention import (
    FrescoAttnParams,
    fresco_self_attention,
    _merge_heads,
    _split_heads,
)
from fresco_tpu.models.layers import (
    Conv2d,
    GroupNorm32,
    TimestepEmbedding,
    timestep_embedding,
)
from fresco_tpu.ops.freeu import apply_freeu_to_skip


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8
    norm_groups: int = 32
    # which up blocks get FRESCO attention: the last two (reference
    # up_blocks.2/3, diffusion_hacked.py:398)
    fresco_up_blocks: tuple[int, ...] = (2, 3)
    use_freeu: bool = False
    freeu_b1: float = 1.2
    freeu_b2: float = 1.5
    freeu_s1: float = 1.0
    freeu_s2: float = 1.0

    @staticmethod
    def tiny() -> "UNetConfig":
        return UNetConfig(
            block_out_channels=(8, 16),
            layers_per_block=1,
            cross_attention_dim=16,
            attention_heads=2,
            norm_groups=4,
            fresco_up_blocks=(1,),
        )

    @property
    def num_blocks(self) -> int:
        return len(self.block_out_channels)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm32(self.groups, name="norm1")(x)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm32(self.groups, name="norm2")(h)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Dense(self.out_ch, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class GEGLU(nn.Module):
    inner: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu: diffusers GEGLU uses F.gelu, not the tanh approx
        return h * nn.gelu(gate, approximate=False)


class CrossAttention(nn.Module):
    """Text cross-attention (keys/values from CLIP embeddings)."""

    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context):
        c = x.shape[-1]
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(context)
        # context is 77 tokens: tiny keys, plain fused SDPA is optimal
        qh, kh, vh = (_split_heads(t, self.heads) for t in (q, k, v))
        d = qh.shape[-1]
        sd = jnp.promote_types(qh.dtype, jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(sd) * (d**-0.5)
        p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vh.dtype)
        o = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", p, vh))
        return nn.Dense(c, dtype=self.dtype, name="to_out")(o)


class SelfAttention(nn.Module):
    """Self-attention with optional FRESCO variants."""

    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, fresco: FrescoAttnParams | None, layer_index: int):
        c = x.shape[-1]
        wq = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")
        wk = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")
        wv = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")
        wo = nn.Dense(c, dtype=self.dtype, name="to_out")
        if layer_index >= 0:
            # reference pass: capture the (post-norm) hidden states the
            # spatial-guided attention replays (diffusion_hacked.py:206-207,
            # 256-261).  Collected via apply(mutable=['intermediates']).
            self.sow("intermediates", "fresco_ref", x)
        return fresco_self_attention(x, wq, wk, wv, wo, self.heads, fresco, layer_index)



def _layer_norm_32(name: str, x):
    """LayerNorm in at-least-fp32 (f64 passes through for the sharding-
    validation mode — channel reductions must not reintroduce f32
    reassociation noise there)."""
    work = jnp.promote_types(x.dtype, jnp.float32)
    return nn.LayerNorm(epsilon=1e-5, dtype=work, name=name)(
        x.astype(work)
    ).astype(x.dtype)


class BasicTransformerBlock(nn.Module):
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context, fresco, layer_index):
        h = _layer_norm_32("norm1", x)
        x = x + SelfAttention(self.heads, self.dtype, name="attn1")(h, fresco, layer_index)
        h = _layer_norm_32("norm2", x)
        x = x + CrossAttention(self.heads, self.dtype, name="attn2")(h, context)
        h = _layer_norm_32("norm3", x)
        inner = x.shape[-1] * 4
        h = GEGLU(inner, self.dtype, name="ff_geglu")(h)
        x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: norm + 1x1 in-proj, one basic block, out-proj."""

    heads: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context, fresco, layer_index):
        b, h, w, c = x.shape
        res = x
        y = GroupNorm32(self.groups, epsilon=1e-6, name="norm")(x)
        y = nn.Dense(c, dtype=self.dtype, name="proj_in")(y.reshape(b, h * w, c))
        y = BasicTransformerBlock(self.heads, self.dtype, name="block")(
            y, context, fresco, layer_index
        )
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return res + y.reshape(b, h, w, c)


class Downsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.out_ch, stride=2, dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        import jax

        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return Conv2d(self.out_ch, dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        *,
        controlnet_residuals: tuple[Sequence[jnp.ndarray], jnp.ndarray] | None = None,
        fresco: FrescoAttnParams | None = None,
        guidance_fn: Callable[[int, jnp.ndarray], jnp.ndarray] | None = None,
        return_up_features: bool = False,
    ):
        """sample [B,h,w,4]; timestep scalar or [B]; text [B,77,768].

        ``controlnet_residuals`` = (down_residuals, mid_residual) as
        produced by ControlNet (added at skip consumption and mid output,
        diffusion_hacked.py:704-754).  ``guidance_fn(stage, x)`` is the
        FRESCO feature-optimization hook run before up-block ``stage``.
        """
        c = self.cfg
        n_layers = c.layers_per_block
        chans = c.block_out_channels
        context = encoder_hidden_states.astype(self.dtype)

        t = jnp.broadcast_to(jnp.atleast_1d(timestep), (sample.shape[0],))
        temb = timestep_embedding(t, chans[0])
        temb = TimestepEmbedding(chans[0] * 4, self.dtype, name="time_embedding")(temb)

        h = Conv2d(chans[0], dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        skips = [h]

        # --- down blocks: CrossAttn x (n-1), plain last ---
        fresco_layer = 0  # index into fresco.ref_features (up blocks only)
        for i, ch in enumerate(chans):
            has_attn = i < len(chans) - 1
            for j in range(n_layers):
                h = ResnetBlock(ch, c.norm_groups, self.dtype, name=f"down_{i}_res_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(
                        c.attention_heads, c.norm_groups, self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, context, None, -1)
                skips.append(h)
            if i < len(chans) - 1:
                h = Downsample(ch, self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # --- mid ---
        h = ResnetBlock(chans[-1], c.norm_groups, self.dtype, name="mid_res_0")(h, temb)
        h = Transformer2D(
            c.attention_heads, c.norm_groups, self.dtype, name="mid_attn"
        )(h, context, None, -1)
        h = ResnetBlock(chans[-1], c.norm_groups, self.dtype, name="mid_res_1")(h, temb)

        if controlnet_residuals is not None:
            down_res, mid_res = controlnet_residuals
            skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_res)]
            h = h + mid_res.astype(h.dtype)

        # --- up blocks ---
        up_features = []
        rev = list(reversed(chans))
        for i, ch in enumerate(rev):
            if return_up_features:
                up_features.append(h)
            if guidance_fn is not None:
                h = guidance_fn(i, h)
            has_attn = i > 0
            blk_fresco = fresco if (has_attn and i in c.fresco_up_blocks) else None
            for j in range(n_layers + 1):
                skip = skips.pop()
                if c.use_freeu:
                    if h.shape[-1] == chans[-1]:
                        h, skip = apply_freeu_to_skip(
                            h, skip, c.freeu_b1, c.freeu_s1, chans[-1] // 2
                        )
                    elif h.shape[-1] == chans[-2]:
                        h, skip = apply_freeu_to_skip(
                            h, skip, c.freeu_b2, c.freeu_s2, chans[-2] // 2
                        )
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResnetBlock(ch, c.norm_groups, self.dtype, name=f"up_{i}_res_{j}")(h, temb)
                if has_attn:
                    is_fresco_layer = i in c.fresco_up_blocks
                    h = Transformer2D(
                        c.attention_heads, c.norm_groups, self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(h, context, blk_fresco, fresco_layer if is_fresco_layer else -1)
                    if is_fresco_layer:
                        fresco_layer += 1
            if i < len(rev) - 1:
                h = Upsample(ch, self.dtype, name=f"up_{i}_upsample")(h)

        h = GroupNorm32(c.norm_groups, name="conv_norm_out")(h)
        h = nn.silu(h)
        eps = Conv2d(c.out_channels, dtype=self.dtype, name="conv_out")(h)

        if return_up_features:
            return eps, tuple(up_features)
        return eps

    @staticmethod
    def num_fresco_layers(cfg: UNetConfig) -> int:
        """How many self-attn layers consume fresco.ref_features."""
        return sum(
            (cfg.layers_per_block + 1)
            for i in cfg.fresco_up_blocks
            if i > 0
        )
