"""GMFlow optical flow (transformer matching), Flax/NHWC.

Re-implementation of the flow estimator the reference vendors
(reference src/ebsynth/deps/gmflow/gmflow/ — gmflow.py:92-170 forward,
backbone.py:39-117, transformer.py, matching.py:7-36) in the
configuration FRESCO uses everywhere: num_scales=1, feature_channels=128,
6 transformer layers, swin attention with attn_splits=2, global
correlation (corr_radius=-1), global flow propagation (prop_radius=-1),
bidirectional prediction (diffusion_hacked.py:916-917).

TPU notes: window partition is a reshape/transpose (free under XLA);
the HW×HW global correlation + softmax-argmax matching are plain MXU
matmuls; everything is batched over both frame-pair directions at once.
"""
from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from fresco_tpu.ops.warp import coords_grid


@dataclasses.dataclass(frozen=True)
class GMFlowConfig:
    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    attn_splits: int = 2
    upsample_factor: int = 8

    @staticmethod
    def tiny() -> "GMFlowConfig":
        return GMFlowConfig(feature_channels=16, num_transformer_layers=2)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free InstanceNorm over spatial dims (torch default)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, name="downsample")(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """7x7/s2 stem + 3 residual stages to 1/8 resolution (backbone.py:39-117)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        dims = [max(self.out_dim // 2, 4), max(self.out_dim * 3 // 4, 6), self.out_dim]
        h = nn.Conv(dims[0], (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        h = nn.relu(instance_norm(h))
        h = ResidualBlock(dims[0], 1, name="layer1_0")(h)
        h = ResidualBlock(dims[0], 1, name="layer1_1")(h)
        h = ResidualBlock(dims[1], 2, name="layer2_0")(h)
        h = ResidualBlock(dims[1], 1, name="layer2_1")(h)
        h = ResidualBlock(dims[2], 2, name="layer3_0")(h)
        h = ResidualBlock(dims[2], 1, name="layer3_1")(h)
        return nn.Conv(self.out_dim, (1, 1), name="conv2")(h)


def split_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*k*k, H/k, W/k, C] (utils.py:5-30 order)."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_windows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    bkk, h, w, c = x.shape
    b = bkk // (k * k)
    x = x.reshape(b, k, k, h, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * h, k * w, c)


def sine_position_embedding(h: int, w: int, num_feats: int) -> jnp.ndarray:
    """DETR sine embedding (position.py:9-46), normalized, [H, W, 2*num_feats]."""
    scale = 2 * math.pi
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0)
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0)
    y = y / (y[-1] + 1e-6) * scale
    x = x / (x[-1] + 1e-6) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    pos_x = x[None, :, None] / dim_t  # [1, W, F]
    pos_y = y[:, None, None] / dim_t  # [H, 1, F]
    pos_x = jnp.broadcast_to(pos_x, (h, w, num_feats))
    pos_y = jnp.broadcast_to(pos_y, (h, w, num_feats))

    def interleave(p):
        s = jnp.sin(p[..., 0::2])
        c = jnp.cos(p[..., 1::2])
        return jnp.stack([s, c], axis=-1).reshape(h, w, -1)

    return jnp.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)


def shifted_window_mask(h: int, w: int, k: int) -> jnp.ndarray:
    """Swin SW-MSA additive mask [k*k, hw_win, hw_win] (transformer.py:19-43)."""
    import numpy as np

    wh, ww = h // k, w // k
    sh, sw = wh // 2, ww // 2
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[hs, ws] = cnt
            cnt += 1
    # numpy window partition (static, built at trace time)
    win = (
        img.reshape(k, wh, k, ww).transpose(0, 2, 1, 3).reshape(k * k, wh * ww)
    )
    diff = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)


def window_attention(
    q, k_, v, *, num_splits: int, h: int, w: int, with_shift: bool, attn_mask=None
):
    """Single-head (shifted-)window attention over [B, HW, C] tokens
    (transformer.py:46-105)."""
    b, _, c = q.shape
    scale = c**-0.5

    def to_img(t):
        return t.reshape(b, h, w, c)

    q, k_, v = to_img(q), to_img(k_), to_img(v)
    if with_shift:
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        q = jnp.roll(q, (-sh, -sw), axis=(1, 2))
        k_ = jnp.roll(k_, (-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, (-sh, -sw), axis=(1, 2))
    qs = split_windows(q, num_splits).reshape(b * num_splits**2, -1, c)
    ks = split_windows(k_, num_splits).reshape(b * num_splits**2, -1, c)
    vs = split_windows(v, num_splits).reshape(b * num_splits**2, -1, c)
    s = jnp.einsum("bqc,bkc->bqk", qs, ks).astype(jnp.float32) * scale
    if with_shift:
        s = s + jnp.tile(attn_mask, (b, 1, 1))
    p = jax.nn.softmax(s, axis=-1).astype(vs.dtype)
    out = jnp.einsum("bqk,bkc->bqc", p, vs)
    out = merge_windows(out.reshape(b * num_splits**2, h // num_splits, w // num_splits, c), num_splits)
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(b, h * w, c)


def full_attention(q, k_, v):
    c = q.shape[-1]
    s = jnp.einsum("bqc,bkc->bqk", q, k_).astype(jnp.float32) * (c**-0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", p, v)


class TransformerLayer(nn.Module):
    """(shifted-)window attention + optional FFN (transformer.py:108-185)."""

    no_ffn: bool = False
    ffn_expansion: int = 4
    with_shift: bool = False

    @nn.compact
    def __call__(self, source, target, *, h, w, num_splits, attn_mask):
        c = source.shape[-1]
        q = nn.Dense(c, use_bias=False, name="q_proj")(source)
        k_ = nn.Dense(c, use_bias=False, name="k_proj")(target)
        v = nn.Dense(c, use_bias=False, name="v_proj")(target)
        if num_splits > 1:
            msg = window_attention(
                q, k_, v, num_splits=num_splits, h=h, w=w,
                with_shift=self.with_shift, attn_mask=attn_mask,
            )
        else:
            msg = full_attention(q, k_, v)
        msg = nn.Dense(c, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, name="norm1")(msg)
        if not self.no_ffn:
            msg = jnp.concatenate([source, msg], axis=-1)
            msg = nn.Dense(2 * c * self.ffn_expansion, use_bias=False, name="mlp_0")(msg)
            msg = nn.gelu(msg, approximate=False)
            msg = nn.Dense(c, use_bias=False, name="mlp_2")(msg)
            msg = nn.LayerNorm(epsilon=1e-5, name="norm2")(msg)
        return source + msg


class FeatureTransformer(nn.Module):
    """6 blocks of (self-attn, cross-attn+FFN), odd blocks shifted
    (transformer.py:243-322)."""

    num_layers: int
    ffn_expansion: int

    @nn.compact
    def __call__(self, feat0, feat1, *, num_splits: int):
        b, h, w, c = feat0.shape
        attn_mask = (
            shifted_window_mask(h, w, num_splits) if num_splits > 1 else None
        )
        concat0 = jnp.concatenate([feat0, feat1], axis=0).reshape(2 * b, h * w, c)
        concat1 = jnp.concatenate([feat1, feat0], axis=0).reshape(2 * b, h * w, c)
        kw = dict(h=h, w=w, num_splits=num_splits, attn_mask=attn_mask)
        for i in range(self.num_layers):
            shift = i % 2 == 1
            concat0 = TransformerLayer(
                no_ffn=True, ffn_expansion=self.ffn_expansion, with_shift=shift,
                name=f"layers_{i}_self_attn",
            )(concat0, concat0, **kw)
            concat0 = TransformerLayer(
                no_ffn=False, ffn_expansion=self.ffn_expansion, with_shift=shift,
                name=f"layers_{i}_cross_attn_ffn",
            )(concat0, concat1, **kw)
            f0, f1 = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([f1, f0], axis=0)
        f0, f1 = jnp.split(concat0, 2, axis=0)
        return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)


def global_correlation_softmax(feat0, feat1, bidir: bool):
    """Softmax-argmax global matching (matching.py:7-36); NHWC inputs.

    Returns flow [B(*2), h, w, 2] with (dx, dy) channels.
    """
    b, h, w, c = feat0.shape
    f0 = feat0.reshape(b, h * w, c)
    f1 = feat1.reshape(b, h * w, c)
    corr = jnp.einsum(
        "bic,bjc->bij", f0, f1, preferred_element_type=jnp.float32
    ) / (c**0.5)
    grid = coords_grid(h, w).reshape(1, h * w, 2)
    if bidir:
        corr = jnp.concatenate([corr, corr.transpose(0, 2, 1)], axis=0)
        b = 2 * b
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum("bij,bjc->bic", prob, jnp.tile(grid, (b, 1, 1)))
    flow = correspondence.reshape(b, h, w, 2) - coords_grid(h, w)[None]
    return flow


class FeatureFlowAttention(nn.Module):
    """Global flow propagation: q=k=feature projections, v=flow
    (transformer.py:325-374; reproduces the reference's key=k_proj(q_proj(x))
    quirk so converted weights match)."""

    @nn.compact
    def __call__(self, feature, flow):
        b, h, w, c = feature.shape
        q = nn.Dense(c, name="q_proj")(feature.reshape(b, h * w, c))
        k_ = nn.Dense(c, name="k_proj")(q)
        v = flow.reshape(b, h * w, 2)
        s = jnp.einsum("bqc,bkc->bqk", q, k_).astype(jnp.float32) / (c**0.5)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", p, v.astype(jnp.float32))
        return out.reshape(b, h, w, 2)


class GMFlow(nn.Module):
    cfg: GMFlowConfig = GMFlowConfig()

    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """img0/img1: [B, H, W, 3] in [0, 255].  Returns bidirectional
        flow [2B, H, W, 2]: fwd (img0->img1) then bwd (gmflow.py:92-170
        with pred_bidir_flow=True)."""
        c = self.cfg
        mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
        std = jnp.asarray([0.229, 0.224, 0.225]) * 255.0
        x = jnp.concatenate([img0, img1], axis=0)
        x = (x - mean) / std

        feat = CNNEncoder(c.feature_channels, name="backbone")(x)
        b = img0.shape[0]
        feat0, feat1 = feat[:b], feat[b:]

        # window-split sine position embedding (utils.py:66-86)
        h, w = feat0.shape[1:3]
        k = c.attn_splits
        pos = sine_position_embedding(h // k, w // k, c.feature_channels // 2)
        pos_full = merge_windows(
            jnp.tile(pos[None], (k * k, 1, 1, 1)), k
        )  # [1*k*k,...] -> [1, h, w, C]
        feat0 = feat0 + pos_full
        feat1 = feat1 + pos_full

        feat0, feat1 = FeatureTransformer(
            c.num_transformer_layers, c.ffn_dim_expansion, name="transformer"
        )(feat0, feat1, num_splits=k)

        flow = global_correlation_softmax(feat0, feat1, bidir=True)  # [2B,h,w,2]

        # propagation over both directions (gmflow.py:155-160)
        feat_cat = jnp.concatenate([feat0, feat1], axis=0)
        flow = FeatureFlowAttention(name="feature_flow_attn")(feat_cat, flow)

        # convex upsampling x8 (gmflow.py:67-90)
        up = c.upsample_factor
        concat = jnp.concatenate([flow, feat_cat], axis=-1)
        mask = nn.Conv(256, (3, 3), padding=1, name="upsampler_0")(concat)
        mask = nn.relu(mask)
        mask = nn.Conv(up * up * 9, (1, 1), name="upsampler_2")(mask)
        bb, hh, ww, _ = flow.shape
        mask = mask.reshape(bb, hh, ww, 9, up * up)
        mask = jax.nn.softmax(mask, axis=3)

        # 3x3 neighborhoods of the coarse flow (torch F.unfold equivalent)
        flow_pad = jnp.pad(flow * up, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = [
            flow_pad[:, i : i + hh, j : j + ww, :] for i in range(3) for j in range(3)
        ]
        patches = jnp.stack(patches, axis=3)  # [B, h, w, 9, 2]
        up_flow = jnp.einsum("bhwku,bhwkc->bhwuc", mask, patches)
        up_flow = up_flow.reshape(bb, hh, ww, up, up, 2)
        up_flow = up_flow.transpose(0, 1, 3, 2, 4, 5).reshape(bb, hh * up, ww * up, 2)
        return up_flow
