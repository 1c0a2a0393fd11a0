"""MiDaS DPT-hybrid depth estimator, Flax/NHWC.

Equivalent of the reference's depth annotator
(reference src/ControlNet/annotator/midas/: MidasDetector __init__.py:12-44,
DPTDepthModel midas/dpt_depth.py:26-110, vitb_rn50_384 backbone
midas/vit.py:343-491, fusion blocks midas/blocks.py:231-340):

  * BiT ResNetV2-50 stem (weight-standardized convs + GroupNorm,
    pre-activation bottlenecks, stages [3, 4, 9]) feeding 1/16 tokens to
    a ViT-B/16 (12 blocks, 768d, learned pos-embed bilinearly resized to
    the input grid — vit.py:100-147 forward_flex);
  * DPT reassembly: stage-0/1 features at 1/4 and 1/8 taken directly;
    ViT blocks 8 and 11 tokens with 'project' readout -> 1/16 and 1/32;
  * refinement: per-scale 3x3 reduce to 256ch + 4 fusion blocks
    (ResidualConvUnit_custom, align_corners=True upsample, 1x1 out conv);
  * head: 3x3 -> x2 up -> 3x3 -> ReLU -> 1x1 -> ReLU (non-negative).

The reference imports timm (unavailable here); this is a standalone
implementation with a converter for the dpt_hybrid-midas checkpoint's
timm key layout.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fresco_tpu.ops.resize import resize_bilinear


class StdConv(nn.Module):
    """Weight-standardized conv (BiT); eps 1e-6 = timm StdConv2d default
    (timm standardizes via batch_norm over the flattened kernel with
    biased variance, reproduced here)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int | str = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        mean = jnp.mean(k, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(k, axis=(0, 1, 2), keepdims=True)
        k = (k - mean) * jax.lax.rsqrt(var + 1e-6)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * 2
        out = jax.lax.conv_general_dilated(
            x, k, (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


def _gn(x, name_scope, module, groups=32):
    return module(x)


class GN(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        g = min(self.groups, x.shape[-1])
        return nn.GroupNorm(num_groups=g, epsilon=1e-5)(x)


class PreActBottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        pre = nn.relu(GN(name="norm1")(x))
        shortcut = x
        if self.has_downsample:
            shortcut = StdConv(self.out, 1, self.stride, 0, name="downsample_conv")(pre)
        h = StdConv(self.mid, 1, 1, 0, name="conv1")(pre)
        h = nn.relu(GN(name="norm2")(h))
        h = StdConv(self.mid, 3, self.stride, 1, name="conv2")(h)
        h = nn.relu(GN(name="norm3")(h))
        h = StdConv(self.out, 1, 1, 0, name="conv3")(h)
        return h + shortcut


class ResNetV2Stem(nn.Module):
    """BiT-R50 trunk (3 stages); returns (stage0 1/4, stage1 1/8, stage2 1/16)."""

    widths: tuple[int, ...] = (256, 512, 1024)
    depths: tuple[int, ...] = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        h = StdConv(64, 7, 2, 3, name="stem_conv")(x)
        h = nn.relu(GN(name="stem_norm")(h))
        # 'same' max pool 3x3/2 (timm stem pool)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        feats = []
        for si, (w, d) in enumerate(zip(self.widths, self.depths)):
            stride = 1 if si == 0 else 2
            for b in range(d):
                h = PreActBottleneck(
                    w // 4, w, stride if b == 0 else 1, has_downsample=(b == 0),
                    name=f"stage{si}_block{b}",
                )(h)
            feats.append(h)
        return feats


class ViTBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    mlp: int = 3072

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(self.dim * 3, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = self.dim // self.heads

        def heads_split(t):
            return t.reshape(*t.shape[:2], self.heads, d).transpose(0, 2, 1, 3)

        s = jnp.einsum(
            "bhqd,bhkd->bhqk", heads_split(q), heads_split(k)
        ).astype(jnp.float32) * (d**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, heads_split(v))
        o = o.transpose(0, 2, 1, 3).reshape(x.shape)
        x = x + nn.Dense(self.dim, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.mlp, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class ResidualConvUnit(nn.Module):
    features: int = 256

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return h + x


class FusionBlock(nn.Module):
    """FeatureFusionBlock_custom (blocks.py:291-340), bn=False,
    align_corners=True."""

    features: int = 256

    @nn.compact
    def __call__(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, name="res1")(skip)
        out = ResidualConvUnit(self.features, name="res2")(out)
        b, h, w, c = out.shape
        out = resize_bilinear(out, (h * 2, w * 2), align_corners=True)
        return nn.Conv(self.features, (1, 1), name="out_conv")(out)


class DPTHybridDepth(nn.Module):
    vit_dim: int = 768
    vit_depth: int = 12
    hooks: tuple[int, int] = (8, 11)
    features: int = 256
    grid_size_train: int = 24  # 384/16, the checkpoint's pos-embed grid
    stem_widths: tuple[int, ...] = (256, 512, 1024)
    stem_depths: tuple[int, ...] = (3, 4, 9)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, H, W, 3] in [-1, 1] (the detector feeds img/127.5 - 1,
        annotator/midas/__init__.py:22).  H, W must be /32.
        Returns depth [B, H, W] (refinenet1 and the head each upsample x2
        from the 1/4-resolution fusion path)."""
        b, H, W, _ = x.shape
        gh, gw = H // 16, W // 16

        s0, s1, s2 = ResNetV2Stem(
            self.stem_widths, self.stem_depths, name="backbone"
        )(x)

        tokens = nn.Conv(
            self.vit_dim, (1, 1), name="patch_proj"
        )(s2).reshape(b, gh * gw, self.vit_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.vit_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.grid_size_train**2 + 1, self.vit_dim),
        )
        # bilinear pos-embed resize to the input grid (vit.py:100-115)
        pos_tok = pos_embed[:, :1]
        pos_grid = pos_embed[0, 1:].reshape(
            1, self.grid_size_train, self.grid_size_train, self.vit_dim
        )
        pos_grid = resize_bilinear(pos_grid, (gh, gw)).reshape(
            1, gh * gw, self.vit_dim
        )
        tokens = jnp.concatenate(
            [jnp.tile(cls_token, (b, 1, 1)), tokens], axis=1
        ) + jnp.concatenate([pos_tok, pos_grid], axis=1)

        hook_feats = {}
        h = tokens
        n_heads = max(self.vit_dim // 64, 1)
        for i in range(self.vit_depth):
            h = ViTBlock(
                self.vit_dim, heads=n_heads, mlp=self.vit_dim * 4,
                name=f"block_{i}",
            )(h)
            if i in self.hooks:
                hook_feats[i] = h
        # (final LayerNorm 'norm' exists in the checkpoint but the hooks
        # fire before it — vit.py:195-198; kept for conversion fidelity)
        _ = nn.LayerNorm(epsilon=1e-6, name="vit_norm")(h)

        def readout_project(t, name):
            # 'project' readout (vit.py:31-42)
            cls = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
            cat = jnp.concatenate([t[:, 1:], cls], axis=-1)
            proj = nn.Dense(self.vit_dim, name=name)(cat)
            return nn.gelu(proj, approximate=False).reshape(
                b, gh, gw, self.vit_dim
            )

        l3 = readout_project(hook_feats[self.hooks[0]], "readout3")
        l3 = nn.Conv(self.vit_dim, (1, 1), name="post3_conv")(l3)
        l4 = readout_project(hook_feats[self.hooks[1]], "readout4")
        l4 = nn.Conv(self.vit_dim, (1, 1), name="post4_conv")(l4)
        l4 = nn.Conv(self.vit_dim, (3, 3), strides=2, padding=1, name="post4_down")(l4)

        f = self.features
        r1 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer1_rn")(s0)
        r2 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer2_rn")(s1)
        r3 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer3_rn")(l3)
        r4 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer4_rn")(l4)

        p4 = FusionBlock(f, name="refinenet4")(r4)
        p3 = FusionBlock(f, name="refinenet3")(p4, r3)
        p2 = FusionBlock(f, name="refinenet2")(p3, r2)
        p1 = FusionBlock(f, name="refinenet1")(p2, r1)

        h = nn.Conv(f // 2, (3, 3), padding=1, name="head_conv1")(p1)
        hh, ww = h.shape[1:3]
        h = resize_bilinear(h, (hh * 2, ww * 2), align_corners=True)
        h = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3")(h)
        h = nn.relu(h)  # non_negative
        return h[..., 0]


def convert_dpt_hybrid(sd, stem_depths=(3, 4, 9), vit_depth=12) -> dict:
    """dpt_hybrid-midas checkpoint (timm layout) -> flax params."""
    from fresco_tpu.models.convert import _Builder, _np, _set

    b = _Builder(sd)
    t = b.tree
    p = "pretrained.model."

    def stdconv(dst, src):
        _set(t, f"{dst}/kernel", _np(b.sd[f"{src}.weight"]).transpose(2, 3, 1, 0))
        if f"{src}.bias" in b.sd:
            _set(t, f"{dst}/bias", _np(b.sd[f"{src}.bias"]))

    def gn(dst, src):
        _set(t, f"{dst}/GroupNorm_0/scale", _np(b.sd[f"{src}.weight"]))
        _set(t, f"{dst}/GroupNorm_0/bias", _np(b.sd[f"{src}.bias"]))

    bb = f"{p}patch_embed.backbone."
    stdconv("backbone/stem_conv", f"{bb}stem.conv")
    gn("backbone/stem_norm", f"{bb}stem.norm")
    for si, depth in enumerate(stem_depths):
        for bi in range(depth):
            s = f"{bb}stages.{si}.blocks.{bi}"
            d = f"backbone/stage{si}_block{bi}"
            for c in ("conv1", "conv2", "conv3"):
                stdconv(f"{d}/{c}", f"{s}.{c}")
            for n in ("norm1", "norm2", "norm3"):
                gn(f"{d}/{n}", f"{s}.{n}")
            if f"{s}.downsample.conv.weight" in b.sd:
                stdconv(f"{d}/downsample_conv", f"{s}.downsample.conv")
    b.raw_conv("patch_proj", f"{p}patch_embed.proj")
    t["cls_token"] = _np(b.sd[f"{p}cls_token"])
    t["pos_embed"] = _np(b.sd[f"{p}pos_embed"])
    for i in range(vit_depth):
        s = f"{p}blocks.{i}"
        d = f"block_{i}"
        for ln in ("norm1", "norm2"):
            _set(t, f"{d}/{ln}/scale", _np(b.sd[f"{s}.{ln}.weight"]))
            _set(t, f"{d}/{ln}/bias", _np(b.sd[f"{s}.{ln}.bias"]))
        b.dense(f"{d}/qkv", f"{s}.attn.qkv")
        b.dense(f"{d}/proj", f"{s}.attn.proj")
        b.dense(f"{d}/fc1", f"{s}.mlp.fc1")
        b.dense(f"{d}/fc2", f"{s}.mlp.fc2")
    _set(t, "vit_norm/scale", _np(b.sd[f"{p}norm.weight"]))
    _set(t, "vit_norm/bias", _np(b.sd[f"{p}norm.bias"]))

    # act_postprocess 3/4: [0]=readout project, [3]=1x1 conv, ([4]=down)
    b.dense("readout3", "pretrained.act_postprocess3.0.project.0")
    b.raw_conv("post3_conv", "pretrained.act_postprocess3.3")
    b.dense("readout4", "pretrained.act_postprocess4.0.project.0")
    b.raw_conv("post4_conv", "pretrained.act_postprocess4.3")
    b.raw_conv("post4_down", "pretrained.act_postprocess4.4")

    for i in range(1, 5):
        b.raw_conv(f"layer{i}_rn", f"scratch.layer{i}_rn")
    for i in range(1, 5):
        s = f"scratch.refinenet{i}"
        d = f"refinenet{i}"
        # refinenet4 has no skip input, so its resConfUnit1 exists in the
        # checkpoint but is unused (dpt_depth.py:78) — skip it.
        units = [("resConfUnit2", "res2")] if i == 4 else [
            ("resConfUnit1", "res1"), ("resConfUnit2", "res2")
        ]
        for unit, dn in units:
            b.raw_conv(f"{d}/{dn}/conv1", f"{s}.{unit}.conv1")
            b.raw_conv(f"{d}/{dn}/conv2", f"{s}.{unit}.conv2")
        b.raw_conv(f"{d}/out_conv", f"{s}.out_conv")
    b.raw_conv("head_conv1", "scratch.output_conv.0")
    b.raw_conv("head_conv2", "scratch.output_conv.2")
    b.raw_conv("head_conv3", "scratch.output_conv.4")
    return t


def midas_detector(model: DPTHybridDepth, params, img: np.ndarray):
    """uint8 RGB HWC -> (depth_image uint8, normal_image uint8).

    Mirrors MidasDetector.__call__ (annotator/midas/__init__.py:17-42)."""
    import cv2

    h, w = img.shape[:2]
    # pad to /32 for the backbone grid
    H = -(-h // 32) * 32
    W = -(-w // 32) * 32
    x = np.zeros((H, W, 3), np.float32)
    x[:h, :w] = img.astype(np.float32) / 127.5 - 1.0
    depth = np.asarray(model.apply(params, jnp.asarray(x)[None]))[0]
    depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_LINEAR)

    a = np.pi * 2.0
    bg_th = 0.1
    d = depth - depth.min()
    d = d / max(d.max(), 1e-6)
    depth_image = (d * 255.0).clip(0, 255).astype(np.uint8)

    gx = cv2.Sobel(depth, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(depth, cv2.CV_32F, 0, 1, ksize=3)
    z = np.ones_like(gx) * a
    gx[d < bg_th] = 0
    gy[d < bg_th] = 0
    normal = np.stack([gx, gy, z], axis=2)
    normal /= np.sum(normal**2.0, axis=2, keepdims=True) ** 0.5
    normal_image = (normal * 127.5 + 127.5).clip(0, 255).astype(np.uint8)
    return depth_image, normal_image
