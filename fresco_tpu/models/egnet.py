"""EGNet salient-object detection (ResNet-50 variant), Flax/NHWC.

Equivalent of reference src/EGNet/model.py (build_model('resnet'),
TUN_bone.forward :167-174) with the frozen-BatchNorm ResNet-50 backbone
(src/EGNet/resnet.py): features at [1/2, 1/4, 1/8, 1/16, 1/16] ->
ConvertLayer 1x1s -> MergeLayer1 (top-down saliency features + edge
feature) -> MergeLayer2 (cross-fused final scores).  FRESCO consumes
only the final fused score ``up_sal_final[-1]`` (src/utils.py:98-99);
all heads are still produced for completeness.

Inference-only: BatchNorms are folded running-stats affine transforms
(the reference freezes them too, resnet.py:116-117).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fresco_tpu.ops.resize import resize_bilinear


class FrozenBN(nn.Module):
    """BatchNorm in eval mode: y = (x-mean)/sqrt(var+eps)*scale + bias."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def _maxpool_ceil(x, k=3, s=2, p=1):
    """torch MaxPool2d(k, s, p, ceil_mode=True) equivalent (resnet.py:120)."""
    n_h, n_w = x.shape[1:3]
    out_h = -(-(n_h + 2 * p - k) // s) + 1
    out_w = -(-(n_w + 2 * p - k) // s) + 1
    pad_h = (out_h - 1) * s + k - n_h - p
    pad_w = (out_w - 1) * s + k - n_w - p
    xp = jnp.pad(
        x, ((0, 0), (p, pad_h), (p, pad_w), (0, 0)),
        constant_values=-jnp.inf,
    )
    return jax.lax.reduce_window(
        xp, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                      name="conv1")(x)
        out = nn.relu(FrozenBN(name="bn1")(out))
        pad = self.dilation
        out = nn.Conv(self.planes, (3, 3), padding=pad,
                      kernel_dilation=self.dilation, use_bias=False,
                      name="conv2")(out)
        out = nn.relu(FrozenBN(name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBN(name="bn3")(out)
        if self.has_downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                        use_bias=False, name="downsample_conv")(x)
            x = FrozenBN(name="downsample_bn")(x)
        return nn.relu(x + out)


class ResNet50Backbone(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        h = nn.relu(FrozenBN(name="bn1")(h))
        feats.append(h)
        h = _maxpool_ceil(h)
        specs = [  # (planes, blocks, stride, dilation)
            (64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 2, 1), (512, 3, 1, 2),
        ]
        for li, (planes, blocks, stride, dil) in enumerate(specs, start=1):
            for b in range(blocks):
                has_ds = b == 0  # first blocks always get a projection here
                h = Bottleneck(
                    planes, stride if b == 0 else 1, dil, has_ds,
                    name=f"layer{li}_{b}",
                )(h)
            feats.append(h)
        return feats


class _ConvRelu(nn.Module):
    out_ch: int
    kernel: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        return nn.relu(
            nn.Conv(self.out_ch, (self.kernel, self.kernel), padding=pad,
                    use_bias=self.use_bias, name="conv")(x)
        )


class _UpBlock(nn.Module):
    """3x (conv k + relu) (model.py:50)."""

    ch: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        for i in range(3):
            x = nn.relu(
                nn.Conv(self.ch, (self.kernel, self.kernel), padding=pad,
                        name=f"conv_{i}")(x)
            )
        return x


def _up(x, size_hw):
    return resize_bilinear(x, size_hw, align_corners=True)


class EGNet(nn.Module):
    """Returns (up_edge, up_sal, up_sal_final) like TUN_bone.forward."""

    # config_resnet (model.py:15)
    convert_out: tuple = (128, 256, 512, 512, 512)
    merge1: tuple = (
        (128, 256, 128, 3), (256, 512, 256, 3), (512, 0, 512, 5),
        (512, 0, 512, 5), (512, 0, 512, 7),
    )
    merge2_ch: int = 128
    merge2_in: tuple = (256, 512, 512, 512)

    @nn.compact
    def __call__(self, x):
        x_size = x.shape[1:3]
        feats = ResNet50Backbone(name="base")(x)
        conv = [
            _ConvRelu(self.convert_out[i], name=f"convert_{i}")(feats[i])
            for i in range(5)
        ]

        # ---- MergeLayer1 (model.py:55-87) ----
        num_f = 5
        up_sal, sal_feature = [], []
        tmp = _UpBlock(self.merge1[4][2], self.merge1[4][3], name="m1_up_4")(conv[4])
        sal_feature.append(tmp)
        u = tmp
        up_sal.append(_up(nn.Conv(1, (3, 3), padding=1, name="m1_score_4")(tmp), x_size))
        for j in range(2, num_f):
            i = num_f - j  # 3, 2, 1
            if conv[i].shape[-1] < u.shape[-1]:
                u = conv[i] + _up(
                    _ConvRelu(self.merge1[i][0], name=f"m1_trans_{i}")(u),
                    conv[i].shape[1:3],
                )
            else:
                u = conv[i] + _up(u, conv[i].shape[1:3])
            tmp = _UpBlock(self.merge1[i][2], self.merge1[i][3], name=f"m1_up_{i}")(u)
            u = tmp
            sal_feature.append(tmp)
            up_sal.append(
                _up(nn.Conv(1, (3, 3), padding=1, name=f"m1_score_{i}")(tmp), x_size)
            )
        u = conv[0] + _up(
            _ConvRelu(128, name="m1_trans_final")(sal_feature[0]),
            conv[0].shape[1:3],
        )
        edge_feat = _UpBlock(self.merge1[0][2], self.merge1[0][3], name="m1_up_0")(u)
        up_edge = [
            _up(nn.Conv(1, (3, 3), padding=1, name="m1_score_0")(edge_feat), x_size)
        ]

        # ---- MergeLayer2 (model.py:114-135) ----
        kernels = [3, 5, 5, 7]
        sal_rev = sal_feature[::-1]
        up_score, tmp_features = [], []
        for j in range(4):
            t = _up(
                _ConvRelu(self.merge2_ch, name=f"m2_trans_{j}")(sal_rev[j]),
                edge_feat.shape[1:3],
            ) + edge_feat
            tf = _UpBlock(self.merge2_ch, kernels[j], name=f"m2_up_{j}")(t)
            up_score.append(
                _up(nn.Conv(1, (3, 3), padding=1, name=f"m2_score_{j}")(tf), x_size)
            )
            tmp_features.append(tf)
        acc = tmp_features[0]
        for tf in tmp_features[1:]:
            acc = nn.relu(acc + _up(tf, tmp_features[0].shape[1:3]))
        final = nn.Conv(self.merge2_ch, (5, 5), padding=2, name="m2_final_0")(acc)
        final = nn.relu(final)
        final = nn.Conv(1, (3, 3), padding=1, name="m2_final_1")(final)
        up_score.append(_up(final, x_size))

        return up_edge, up_sal, up_score


SOD_MEAN_BGR = np.array([104.00699, 116.66877, 122.67892], np.float32)


def saliency_input(imgs_rgb: np.ndarray) -> jnp.ndarray:
    """Preprocess uint8 RGB frames for EGNet (reference src/utils.py:26-31:
    BGR mean subtraction, 0.5x bilinear downscale)."""
    x = imgs_rgb[..., ::-1].astype(np.float32) - SOD_MEAN_BGR
    h, w = x.shape[1:3]
    return resize_bilinear(jnp.asarray(x), (h // 2, w // 2))


def make_saliency_fn(egnet: EGNet, params, dilate_kernel=7, dtype=None):
    """Jitted end-to-end background-mask fn: imgs_rgb [F,H,W,3] uint8 ->
    [F, H/2, W/2, 1] float32 mask (same math as
    ``saliency_background_mask``).

    One compiled program instead of the eager per-op dispatch: XLA
    fuses conv+BN+relu chains and dead-code-eliminates the up_edge /
    up_sal heads (and their full-resolution resizes) that FRESCO never
    consumes (reference src/utils.py:98-99 reads only
    ``up_sal_final[-1]``).  Params are passed as arguments, not closure
    constants, so the remote-compile upload stays small."""
    from fresco_tpu.ops.morphology import dilate

    @jax.jit
    def _mask(p, x):
        if dtype is not None:
            x = x.astype(dtype)
        _, _, up_score = egnet.apply(p, x)
        sal = jax.nn.sigmoid(up_score[-1].astype(jnp.float32))
        return 1.0 - dilate(sal, dilate_kernel)

    return lambda imgs_rgb: _mask(params, saliency_input(np.asarray(imgs_rgb)))


def saliency_background_mask(egnet: EGNet, params, imgs_rgb, dilate_kernel=7,
                             dtype=None):
    """Background mask = 1 - dilate(sigmoid(final score))
    (reference src/utils.py:95-102).  Returns [F, h/2, w/2, 1] float32.

    ``dtype``: optional compute dtype for the EGNet forward (params must
    already be cast to match — config.aux_dtype); sigmoid + dilation
    run f32 either way."""
    from fresco_tpu.ops.morphology import dilate

    x = saliency_input(np.asarray(imgs_rgb))
    if dtype is not None:
        x = jnp.asarray(x, dtype)
    _, _, up_score = egnet.apply(params, x)
    sal = jax.nn.sigmoid(up_score[-1].astype(jnp.float32))
    return 1.0 - dilate(sal, dilate_kernel)


def convert_egnet(sd) -> dict:
    """torch epoch_resnet.pth state dict -> flax params tree."""
    from fresco_tpu.models.convert import _Builder, _np

    b = _Builder(sd)

    def bn(dst, src):
        for a, t in (("scale", "weight"), ("bias", "bias"),
                     ("mean", "running_mean"), ("var", "running_var")):
            from fresco_tpu.models.convert import _set

            _set(b.tree, f"{dst}/{a}", _np(sd[f"{src}.{t}"]))

    p = "base."
    b.raw_conv("base/conv1", f"{p}conv1")
    bn("base/bn1", f"{p}bn1")
    blocks = [3, 4, 6, 3]
    for li in range(1, 5):
        for bi in range(blocks[li - 1]):
            s = f"{p}layer{li}.{bi}"
            d = f"base/layer{li}_{bi}"
            for c in ("conv1", "conv2", "conv3"):
                b.raw_conv(f"{d}/{c}", f"{s}.{c}")
            for n in ("bn1", "bn2", "bn3"):
                bn(f"{d}/{n}", f"{s}.{n}")
            if f"{s}.downsample.0.weight" in b.sd:
                b.raw_conv(f"{d}/downsample_conv", f"{s}.downsample.0")
                bn(f"{d}/downsample_bn", f"{s}.downsample.1")

    for i in range(5):
        b.raw_conv(f"convert_{i}/conv", f"convert.convert0.{i}.0")

    # merge1: up blocks (3 convs each), scores, trans
    for i in range(5):
        for j in range(3):
            b.raw_conv(f"m1_up_{i}/conv_{j}", f"merge1.up.{i}.{2*j}")
        b.raw_conv(f"m1_score_{i}", f"merge1.score.{i}")
    # trans.0 exists in the checkpoint but is unused by the forward pass
    # (model.py:67-74 only reaches trans[1] and trans[-1])
    b.raw_conv("m1_trans_1/conv", "merge1.trans.1.0")
    b.raw_conv("m1_trans_final/conv", "merge1.trans.2.0")

    for j in range(4):
        b.raw_conv(f"m2_trans_{j}/conv", f"merge2.trans.0.{j}.0")
        for k in range(3):
            b.raw_conv(f"m2_up_{j}/conv_{k}", f"merge2.up.0.{j}.{2*k}")
        b.raw_conv(f"m2_score_{j}", f"merge2.score.0.{j}")
    b.raw_conv("m2_final_0", "merge2.final_score.0")
    b.raw_conv("m2_final_1", "merge2.final_score.2")
    return b.tree
