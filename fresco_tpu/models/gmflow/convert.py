"""torch GMFlow checkpoint (gmflow_sintel-*.pth) -> Flax params.

Maps the reference's module names (src/ebsynth/deps/gmflow/gmflow/) onto
fresco_tpu.models.gmflow.  Conv kernels OIHW->HWIO, linear weights
transposed; InstanceNorms are affine-free (no params).
"""
from __future__ import annotations

from typing import Mapping

from fresco_tpu.models.convert import _Builder


def convert_gmflow(sd: Mapping) -> dict:
    b = _Builder(sd)

    def resblock(dst, src):
        b.raw_conv(f"{dst}/conv1", f"{src}.conv1")
        b.raw_conv(f"{dst}/conv2", f"{src}.conv2")
        if b.has(f"{src}.downsample.0.weight"):
            b.raw_conv(f"{dst}/downsample", f"{src}.downsample.0")

    b.raw_conv("backbone/conv1", "backbone.conv1")
    for layer in (1, 2, 3):
        for j in (0, 1):
            resblock(f"backbone/layer{layer}_{j}", f"backbone.layer{layer}.{j}")
    b.raw_conv("backbone/conv2", "backbone.conv2")

    i = 0
    while b.has(f"transformer.layers.{i}.self_attn.q_proj.weight"):
        for part in ("self_attn", "cross_attn_ffn"):
            s = f"transformer.layers.{i}.{part}"
            d = f"transformer/layers_{i}_{part}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                b.dense(f"{d}/{proj}", f"{s}.{proj}")
            b.norm(f"{d}/norm1", f"{s}.norm1", wrapped=False)
            if part == "cross_attn_ffn":
                b.dense(f"{d}/mlp_0", f"{s}.mlp.0")
                b.dense(f"{d}/mlp_2", f"{s}.mlp.2")
                b.norm(f"{d}/norm2", f"{s}.norm2", wrapped=False)
        i += 1

    b.dense("feature_flow_attn/q_proj", "feature_flow_attn.q_proj")
    b.dense("feature_flow_attn/k_proj", "feature_flow_attn.k_proj")
    b.raw_conv("upsampler_0", "upsampler.0")
    b.raw_conv("upsampler_2", "upsampler.2")
    return b.tree
