"""PyTorch checkpoint -> Flax parameter conversion.

The reference loads all weights through torch/diffusers/transformers
(reference run_fresco.py:47-76, install.py:52-95).  This module maps
those state dicts onto the fresco_tpu Flax modules: OIHW conv kernels ->
HWIO, linear weights transposed, 1x1 convs -> Dense kernels, norm
weight/bias -> scale/bias.  Works from a raw ``state_dict``-like mapping
(torch tensors or numpy arrays), so checkpoints can be read with
``safetensors.numpy`` without torch at all.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from fresco_tpu.models.unet import UNetConfig
from fresco_tpu.models.vae import VAEConfig
from fresco_tpu.models.clip_text import CLIPTextConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(t) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def conv1x1_as_dense(t) -> np.ndarray:
    """[O, I, 1, 1] -> [I, O]."""
    w = _np(t)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return w.transpose(1, 0)


def dense_kernel(t) -> np.ndarray:
    return _np(t).transpose(1, 0)


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


class _Builder:
    def __init__(self, sd: Mapping[str, Any]):
        self.sd = dict(sd)
        self.tree: dict = {}
        self.used: set[str] = set()

    def check_all_used(self, ignore: tuple[str, ...] = ()):
        """Raise if any checkpoint key was not consumed (strict mode:
        catches silent key-mapping gaps in the converters)."""
        left = [
            k for k in self.sd
            if k not in self.used and not any(s in k for s in ignore)
        ]
        if left:
            raise ValueError(
                f"{len(left)} checkpoint keys not consumed by the converter, "
                f"e.g. {sorted(left)[:8]}"
            )

    def _get(self, key: str):
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def conv(self, dst: str, src: str):
        _set(self.tree, f"{dst}/Conv_0/kernel", conv_kernel(self._get(f"{src}.weight")))
        if f"{src}.bias" in self.sd:
            _set(self.tree, f"{dst}/Conv_0/bias", _np(self._get(f"{src}.bias")))

    def raw_conv(self, dst: str, src: str):
        """Conv without the Conv2d wrapper (module named directly)."""
        _set(self.tree, f"{dst}/kernel", conv_kernel(self._get(f"{src}.weight")))
        if f"{src}.bias" in self.sd:
            _set(self.tree, f"{dst}/bias", _np(self._get(f"{src}.bias")))

    def dense(self, dst: str, src: str, from_conv1x1: bool = False):
        w = self._get(f"{src}.weight")
        k = conv1x1_as_dense(w) if from_conv1x1 or _np(w).ndim == 4 else dense_kernel(w)
        _set(self.tree, f"{dst}/kernel", k)
        if f"{src}.bias" in self.sd:
            _set(self.tree, f"{dst}/bias", _np(self._get(f"{src}.bias")))

    def norm(self, dst: str, src: str, wrapped: bool = True):
        sub = f"{dst}/GroupNorm_0" if wrapped else dst
        _set(self.tree, f"{sub}/scale", _np(self._get(f"{src}.weight")))
        _set(self.tree, f"{sub}/bias", _np(self._get(f"{src}.bias")))

    def embed(self, dst: str, src: str):
        _set(self.tree, f"{dst}/embedding", _np(self._get(f"{src}.weight")))


def _convert_resnet(b: _Builder, dst: str, src: str):
    b.norm(f"{dst}/norm1", f"{src}.norm1")
    b.conv(f"{dst}/conv1", f"{src}.conv1")
    b.dense(f"{dst}/time_emb_proj", f"{src}.time_emb_proj")
    b.norm(f"{dst}/norm2", f"{src}.norm2")
    b.conv(f"{dst}/conv2", f"{src}.conv2")
    if b.has(f"{src}.conv_shortcut.weight"):
        b.dense(f"{dst}/conv_shortcut", f"{src}.conv_shortcut", from_conv1x1=True)


def _convert_vae_resnet(b: _Builder, dst: str, src: str):
    b.norm(f"{dst}/norm1", f"{src}.norm1")
    b.conv(f"{dst}/conv1", f"{src}.conv1")
    b.norm(f"{dst}/norm2", f"{src}.norm2")
    b.conv(f"{dst}/conv2", f"{src}.conv2")
    for sc in ("conv_shortcut", "nin_shortcut"):
        if b.has(f"{src}.{sc}.weight"):
            b.dense(f"{dst}/conv_shortcut", f"{src}.{sc}", from_conv1x1=True)


def _convert_transformer2d(b: _Builder, dst: str, src: str):
    b.norm(f"{dst}/norm", f"{src}.norm")
    b.dense(f"{dst}/proj_in", f"{src}.proj_in")
    blk = f"{src}.transformer_blocks.0"
    d = f"{dst}/block"
    for ln in ("norm1", "norm2", "norm3"):
        b.norm(f"{d}/{ln}", f"{blk}.{ln}", wrapped=False)
    for attn, names in (("attn1", "attn1"), ("attn2", "attn2")):
        b.dense(f"{d}/{attn}/to_q", f"{blk}.{names}.to_q")
        b.dense(f"{d}/{attn}/to_k", f"{blk}.{names}.to_k")
        b.dense(f"{d}/{attn}/to_v", f"{blk}.{names}.to_v")
        b.dense(f"{d}/{attn}/to_out", f"{blk}.{names}.to_out.0")
    b.dense(f"{d}/ff_geglu/proj", f"{blk}.ff.net.0.proj")
    b.dense(f"{d}/ff_out", f"{blk}.ff.net.2")
    b.dense(f"{dst}/proj_out", f"{src}.proj_out")


def _convert_unet_encoder(b: _Builder, cfg: UNetConfig, prefix: str = ""):
    """Shared by UNet and ControlNet: conv_in, time emb, down blocks, mid."""
    b.conv("conv_in", f"{prefix}conv_in")
    b.dense("time_embedding/linear_1", f"{prefix}time_embedding.linear_1")
    b.dense("time_embedding/linear_2", f"{prefix}time_embedding.linear_2")
    n = cfg.layers_per_block
    for i in range(len(cfg.block_out_channels)):
        has_attn = i < len(cfg.block_out_channels) - 1
        for j in range(n):
            _convert_resnet(b, f"down_{i}_res_{j}", f"{prefix}down_blocks.{i}.resnets.{j}")
            if has_attn:
                _convert_transformer2d(
                    b, f"down_{i}_attn_{j}", f"{prefix}down_blocks.{i}.attentions.{j}"
                )
        if i < len(cfg.block_out_channels) - 1:
            b.conv(
                f"down_{i}_downsample/conv",
                f"{prefix}down_blocks.{i}.downsamplers.0.conv",
            )
    _convert_resnet(b, "mid_res_0", f"{prefix}mid_block.resnets.0")
    _convert_transformer2d(b, "mid_attn", f"{prefix}mid_block.attentions.0")
    _convert_resnet(b, "mid_res_1", f"{prefix}mid_block.resnets.1")


def convert_unet(
    sd: Mapping[str, Any], cfg: UNetConfig = UNetConfig(), strict: bool = False
) -> dict:
    """diffusers UNet2DConditionModel state dict -> flax params tree."""
    b = _Builder(sd)
    _convert_unet_encoder(b, cfg)
    n = cfg.layers_per_block
    num_blocks = len(cfg.block_out_channels)
    for i in range(num_blocks):
        has_attn = i > 0
        for j in range(n + 1):
            _convert_resnet(b, f"up_{i}_res_{j}", f"up_blocks.{i}.resnets.{j}")
            if has_attn:
                _convert_transformer2d(
                    b, f"up_{i}_attn_{j}", f"up_blocks.{i}.attentions.{j}"
                )
        if i < num_blocks - 1:
            b.conv(f"up_{i}_upsample/conv", f"up_blocks.{i}.upsamplers.0.conv")
    b.norm("conv_norm_out", "conv_norm_out")
    b.conv("conv_out", "conv_out")
    if strict:
        b.check_all_used()
    return b.tree


def convert_controlnet(
    sd: Mapping[str, Any], cfg: UNetConfig = UNetConfig(), strict: bool = False
) -> dict:
    """diffusers ControlNetModel state dict -> flax params tree."""
    b = _Builder(sd)
    _convert_unet_encoder(b, cfg)
    ce = "controlnet_cond_embedding"
    b.conv(f"{ce}/conv_in", f"{ce}.conv_in")
    i = 0
    while b.has(f"{ce}.blocks.{i}.weight"):
        # blocks use the Conv2d wrapper (params under blocks_i/Conv_0/)
        b.conv(f"{ce}/blocks_{i}", f"{ce}.blocks.{i}")
        i += 1
    b.raw_conv(f"{ce}/conv_out", f"{ce}.conv_out")
    i = 0
    while b.has(f"controlnet_down_blocks.{i}.weight"):
        b.dense(f"controlnet_down_blocks_{i}", f"controlnet_down_blocks.{i}", from_conv1x1=True)
        i += 1
    b.dense("controlnet_mid_block", "controlnet_mid_block", from_conv1x1=True)
    if strict:
        b.check_all_used()
    return b.tree


def convert_vae(
    sd: Mapping[str, Any], cfg: VAEConfig = VAEConfig(), strict: bool = False
) -> dict:
    """diffusers AutoencoderKL state dict -> flax params tree."""
    b = _Builder(sd)

    def attn(dst, src):
        b.norm(f"{dst}/group_norm", f"{src}.group_norm")
        # modern diffusers uses to_q/.../to_out.0; old uses query/key/value/proj_attn
        if b.has(f"{src}.to_q.weight"):
            names = [("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"), ("to_out", "to_out.0")]
        else:
            names = [("to_q", "query"), ("to_k", "key"), ("to_v", "value"), ("to_out", "proj_attn")]
        for dname, sname in names:
            b.dense(f"{dst}/{dname}", f"{src}.{sname}")

    for side, blocks in (("encoder", "down_blocks"), ("decoder", "up_blocks")):
        b.conv(f"{side}/conv_in", f"{side}.conv_in")
        num = len(cfg.block_out_channels)
        layers = cfg.layers_per_block if side == "encoder" else cfg.layers_per_block + 1
        for i in range(num):
            for j in range(layers):
                _convert_vae_resnet(
                    b, f"{side}/{'down' if side=='encoder' else 'up'}_{i}_res_{j}",
                    f"{side}.{blocks}.{i}.resnets.{j}",
                )
            if i < num - 1:
                if side == "encoder":
                    b.raw_conv(
                        f"{side}/down_{i}_downsample/conv",
                        f"{side}.{blocks}.{i}.downsamplers.0.conv",
                    )
                else:
                    b.conv(
                        f"{side}/up_{i}_upsample/conv",
                        f"{side}.{blocks}.{i}.upsamplers.0.conv",
                    )
        _convert_vae_resnet(b, f"{side}/mid_res_0", f"{side}.mid_block.resnets.0")
        attn(f"{side}/mid_attn", f"{side}.mid_block.attentions.0")
        _convert_vae_resnet(b, f"{side}/mid_res_1", f"{side}.mid_block.resnets.1")
        b.norm(f"{side}/conv_norm_out", f"{side}.conv_norm_out")
        b.conv(f"{side}/conv_out", f"{side}.conv_out")
    b.dense("quant_conv", "quant_conv", from_conv1x1=True)
    b.dense("post_quant_conv", "post_quant_conv", from_conv1x1=True)
    if strict:
        b.check_all_used()
    return b.tree


def convert_clip_text(
    sd: Mapping[str, Any], cfg: CLIPTextConfig = CLIPTextConfig()
) -> dict:
    """transformers CLIPTextModel state dict -> flax params tree."""
    b = _Builder(sd)
    p = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    b.embed("token_embedding", f"{p}embeddings.token_embedding")
    b.embed("position_embedding", f"{p}embeddings.position_embedding")
    for i in range(cfg.num_layers):
        s = f"{p}encoder.layers.{i}"
        d = f"layers_{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            b.norm(f"{d}/{ln}", f"{s}.{ln}", wrapped=False)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            b.dense(f"{d}/self_attn/{proj}", f"{s}.self_attn.{proj}")
        b.dense(f"{d}/mlp_fc1", f"{s}.mlp.fc1")
        b.dense(f"{d}/mlp_fc2", f"{s}.mlp.fc2")
    b.norm("final_layer_norm", f"{p}final_layer_norm", wrapped=False)
    return b.tree


def convert_clip_vision(sd: Mapping[str, Any], cfg=None) -> dict:
    """transformers CLIPVisionModel (or CLIPModel) state dict -> flax
    params tree for ``clip_vision.CLIPVisionEncoder``.

    Accepts either a bare vision tower (``vision_model.`` prefix, as
    CLIPVisionModel saves) or a full CLIPModel checkpoint, in which case
    ``visual_projection`` is converted too (enables ``project=True``
    image embeddings for the BASELINE.md frame-similarity metric)."""
    from fresco_tpu.models.clip_vision import CLIPVisionConfig

    cfg = cfg or CLIPVisionConfig()
    b = _Builder(sd)
    p = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    b.raw_conv("patch_embedding", f"{p}embeddings.patch_embedding")
    _set(b.tree, "class_embedding", _np(b._get(f"{p}embeddings.class_embedding")))
    b.embed("position_embedding", f"{p}embeddings.position_embedding")
    b.norm("pre_layrnorm", f"{p}pre_layrnorm", wrapped=False)
    for i in range(cfg.num_layers):
        s = f"{p}encoder.layers.{i}"
        d = f"layers_{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            b.norm(f"{d}/{ln}", f"{s}.{ln}", wrapped=False)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            b.dense(f"{d}/self_attn/{proj}", f"{s}.self_attn.{proj}")
        b.dense(f"{d}/mlp_fc1", f"{s}.mlp.fc1")
        b.dense(f"{d}/mlp_fc2", f"{s}.mlp.fc2")
    b.norm("post_layernorm", f"{p}post_layernorm", wrapped=False)
    if b.has("visual_projection.weight"):
        b.dense("visual_projection", "visual_projection")
    return b.tree


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth/.bin/.safetensors checkpoint into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and all(
        hasattr(v, "numpy") for v in sd["model"].values()
    ):
        sd = sd["model"]
    return {k: _np(v) for k, v in sd.items()}
