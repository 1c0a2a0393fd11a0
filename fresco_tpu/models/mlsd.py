"""M-LSD line detection (MobileNetV2 FPN), Flax/NHWC.

Equivalent of the reference's MLSD annotator (reference
src/ControlNet/annotator/mlsd/__init__.py:21-43 MLSDdetector,
models/mbv2_mlsd_large.py MobileV2_MLSD_Large, utils.py:19-86
deccode_output_score_and_ptss + pred_lines).

TPU re-design: inference-only, so every Conv+BatchNorm pair is FOLDED
into a biased conv at conversion time (no BN at runtime); the score/
displacement decoding (sigmoid -> 5x5 max-pool NMS -> top-k) runs as one
jitted program; only the final thresholded line rasterization happens on
host (data-dependent line count).
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fresco_tpu.ops.resize import resize_bilinear

# MobileNetV2 inverted-residual settings actually used by MLSD
# (mbv2_mlsd_large.py:174-181): (expand t, out c, repeats n, stride s)
_IR_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                (6, 64, 4, 2), (6, 96, 3, 1))
_FPN_SELECTED = (1, 3, 6, 10, 13)


class ConvBNReLU(nn.Module):
    """Conv (+folded BN) + ReLU6 with the TFLite stride-2 padding
    (mbv2_mlsd_large.py:94-121: stride 2 pads (0,1,0,1) then VALID)."""

    out: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        if self.stride == 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            p = (self.kernel - 1) // 2
            pad = [(p, p)] * 2
        x = nn.Conv(
            self.out, (self.kernel, self.kernel), strides=(self.stride,) * 2,
            padding=pad, feature_group_count=self.groups, name="conv",
        )(x)
        return jnp.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        hidden = int(round(self.inp * self.expand))
        h = x
        if self.expand != 1:
            h = ConvBNReLU(hidden, kernel=1, name="expand")(h)
        h = ConvBNReLU(hidden, 3, self.stride, groups=hidden, name="dw")(h)
        h = nn.Conv(self.oup, (1, 1), name="pw")(h)  # folded BN -> bias
        if self.stride == 1 and self.inp == self.oup:
            return x + h
        return h


class _ConvBnAct(nn.Module):
    """3x3/1x1 conv (+folded BN) + plain ReLU for the FPN blocks."""

    out: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(
            self.out, (self.kernel, self.kernel), padding=[(p, p)] * 2,
            kernel_dilation=(self.dilation,) * 2, name="conv",
        )(x)
        return nn.relu(x)


class BlockTypeA(nn.Module):
    out_c1: int
    out_c2: int
    upscale: bool = True

    @nn.compact
    def __call__(self, a, b):
        b = _ConvBnAct(self.out_c2, kernel=1, name="conv1")(b)
        a = _ConvBnAct(self.out_c1, kernel=1, name="conv2")(a)
        if self.upscale:
            bh, bw = b.shape[1:3]
            b = resize_bilinear(b, (bh * 2, bw * 2), align_corners=True)
        return jnp.concatenate([a, b], axis=-1)


class BlockTypeB(nn.Module):
    out_c: int

    @nn.compact
    def __call__(self, x):
        x = _ConvBnAct(x.shape[-1], name="conv1")(x) + x
        return _ConvBnAct(self.out_c, name="conv2")(x)


class BlockTypeC(nn.Module):
    out_c: int

    @nn.compact
    def __call__(self, x):
        x = _ConvBnAct(x.shape[-1], dilation=5, name="conv1")(x)
        x = _ConvBnAct(x.shape[-1], name="conv2")(x)
        return nn.Conv(self.out_c, (1, 1), name="conv3")(x)


class MLSDLarge(nn.Module):
    """MobileV2_MLSD_Large (mbv2_mlsd_large.py:247-291).

    Input [B, H, W, 4] = RGB+ones in [-1, 1] (utils.py:54-59); output
    [B, H/2, W/2, 9]: channel 0 = center logit, 1:5 = displacements
    (channels 7..15 of the 16-ch head, :289-291)."""

    @nn.compact
    def __call__(self, x):
        h = ConvBNReLU(32, stride=2, name="features_0")(x)
        feats = {}
        idx = 1
        cin = 32
        for t, c, n, s in _IR_SETTINGS:
            for i in range(n):
                h = InvertedResidual(
                    cin, c, s if i == 0 else 1, t, name=f"features_{idx}"
                )(h)
                cin = c
                if idx in _FPN_SELECTED:
                    feats[idx] = h
                idx += 1
        c1, c2, c3, c4, c5 = (feats[i] for i in _FPN_SELECTED)

        x = BlockTypeA(64, 64, upscale=False, name="block15")(c4, c5)
        x = BlockTypeB(64, name="block16")(x)
        x = BlockTypeA(64, 64, name="block17")(c3, x)
        x = BlockTypeB(64, name="block18")(x)
        x = BlockTypeA(64, 64, name="block19")(c2, x)
        x = BlockTypeB(64, name="block20")(x)
        x = BlockTypeA(64, 64, name="block21")(c1, x)
        x = BlockTypeB(64, name="block22")(x)
        x = BlockTypeC(16, name="block23")(x)
        return x[..., 7:]


@functools.partial(jax.jit, static_argnames=("topk", "ksize"))
def decode_center_displacement(out, topk: int = 200, ksize: int = 3):
    """utils.py:19-44 deccode_output_score_and_ptss, device-side.

    out [1, h, w, 9] -> (scores [topk], yx int32 [topk, 2],
    displacement [h, w, 4])."""
    heat = jax.nn.sigmoid(out[0, :, :, 0])
    pad = (ksize - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (ksize, ksize), (1, 1),
        [(pad, pad), (pad, pad)],
    )
    heat = jnp.where(hmax == heat, heat, 0.0)
    w = heat.shape[1]
    scores, idx = jax.lax.top_k(heat.reshape(-1), topk)
    yx = jnp.stack([idx // w, idx % w], axis=-1)
    return scores, yx, out[0, :, :, 1:5]


def pred_lines(img_rgb: np.ndarray, model: MLSDLarge, params,
               input_shape=(512, 512), score_thr=0.10, dist_thr=20.0):
    """utils.py:47-86: resize, run, decode, threshold -> lines [N, 4]."""
    import cv2

    h, w = img_rgb.shape[:2]
    resized = cv2.resize(
        img_rgb, (input_shape[1], input_shape[0]), interpolation=cv2.INTER_AREA
    )
    x = np.concatenate(
        [resized, np.ones([*input_shape, 1])], axis=-1
    ).astype(np.float32) / 127.5 - 1.0
    out = model.apply(params, jnp.asarray(x)[None])
    scores, yx, disp = decode_center_displacement(out, 200, 3)
    scores, yx, disp = map(np.asarray, (scores, yx, disp))

    start, end = disp[:, :, :2], disp[:, :, 2:]
    dist_map = np.sqrt(np.sum((start - end) ** 2, axis=-1))
    segs = []
    for (y, xx), s in zip(yx, scores):
        if s > score_thr and dist_map[y, xx] > dist_thr:
            dxs, dys, dxe, dye = disp[y, xx]
            segs.append([xx + dxs, y + dys, xx + dxe, y + dye])
    if not segs:
        return np.zeros((0, 4), np.float32)
    lines = 2 * np.asarray(segs, np.float32)  # decode res -> input res
    lines[:, 0::2] *= w / input_shape[1]
    lines[:, 1::2] *= h / input_shape[0]
    return lines


def mlsd_detector(model, params, img_rgb: np.ndarray,
                  thr_v: float = 0.1, thr_d: float = 0.1,
                  input_shape=(512, 512)) -> np.ndarray:
    """MLSDdetector.__call__ (mlsd/__init__.py:31-43): rasterize lines."""
    import cv2

    out = np.zeros_like(img_rgb)
    try:
        for x0, y0, x1, y1 in pred_lines(
            img_rgb, model, params, input_shape, thr_v, thr_d
        ):
            cv2.line(
                out, (int(x0), int(y0)), (int(x1), int(y1)), (255, 255, 255), 1
            )
    except Exception:
        pass
    return out[:, :, 0]


# ------------------------------------------------------------- conversion
def _fold_bn(w_oihw, sd, bn_prefix, conv_bias=None, eps=1e-5):
    from fresco_tpu.models.convert import _np

    g = _np(sd[f"{bn_prefix}.weight"]).astype(np.float64)
    b = _np(sd[f"{bn_prefix}.bias"]).astype(np.float64)
    mu = _np(sd[f"{bn_prefix}.running_mean"]).astype(np.float64)
    var = _np(sd[f"{bn_prefix}.running_var"]).astype(np.float64)
    scale = g / np.sqrt(var + eps)
    w = w_oihw.astype(np.float64) * scale[:, None, None, None]
    b0 = 0.0 if conv_bias is None else _np(conv_bias).astype(np.float64)
    return w.astype(np.float32), ((b0 - mu) * scale + b).astype(np.float32)


def convert_mlsd(sd) -> dict:
    """mlsd_large_512_fp32.pth (torch layout) -> folded-BN flax params."""
    from fresco_tpu.models.convert import _np, _set

    tree: dict = {}

    def fold(dst, conv_key, bn_key):
        w, b = _fold_bn(
            _np(sd[f"{conv_key}.weight"]), sd, bn_key,
            conv_bias=sd.get(f"{conv_key}.bias"),
        )
        _set(tree, f"{dst}/kernel", w.transpose(2, 3, 1, 0))
        _set(tree, f"{dst}/bias", b)

    def plain(dst, conv_key):
        _set(tree, f"{dst}/kernel", _np(sd[f"{conv_key}.weight"]).transpose(2, 3, 1, 0))
        if f"{conv_key}.bias" in sd:
            _set(tree, f"{dst}/bias", _np(sd[f"{conv_key}.bias"]))

    bb = "backbone.features"
    fold("features_0/conv", f"{bb}.0.0", f"{bb}.0.1")
    idx = 1
    for t, c, n, s in _IR_SETTINGS:
        for i in range(n):
            base = f"{bb}.{idx}.conv"
            d = f"features_{idx}"
            if t == 1:  # no expand: conv.0=dw, conv.1=pw, conv.2=bn
                fold(f"{d}/dw/conv", f"{base}.0.0", f"{base}.0.1")
                w, b = _fold_bn(_np(sd[f"{base}.1.weight"]), sd, f"{base}.2")
                _set(tree, f"{d}/pw/kernel", w.transpose(2, 3, 1, 0))
                _set(tree, f"{d}/pw/bias", b)
            else:  # conv.0=expand, conv.1=dw, conv.2=pw, conv.3=bn
                fold(f"{d}/expand/conv", f"{base}.0.0", f"{base}.0.1")
                fold(f"{d}/dw/conv", f"{base}.1.0", f"{base}.1.1")
                w, b = _fold_bn(_np(sd[f"{base}.2.weight"]), sd, f"{base}.3")
                _set(tree, f"{d}/pw/kernel", w.transpose(2, 3, 1, 0))
                _set(tree, f"{d}/pw/bias", b)
            idx += 1

    for blk in range(15, 23):
        name = f"block{blk}"
        for cv in ("conv1", "conv2"):
            fold(f"{name}/{cv}/conv", f"{name}.{cv}.0", f"{name}.{cv}.1")
    for cv in ("conv1", "conv2"):
        fold(f"block23/{cv}/conv", f"block23.{cv}.0", f"block23.{cv}.1")
    plain("block23/conv3", "block23.conv3")
    return tree
