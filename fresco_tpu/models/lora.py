"""LoRA checkpoint merging (kohya/diffusers format) into Flax params.

The reference's WebUI path supports community SD bases with LoRA
(BASELINE.json config 5; diffusers handles it there).  Here LoRA deltas
are merged into the converted Flax parameter tree at load time:
W <- W + scale * (alpha/r) * up @ down, which keeps the runtime path
identical (no extra matmuls per step — optimal for TPU serving).
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np

from fresco_tpu.models.convert import _np


# kohya module-name fragments -> (converter dst template)
_ATTN = ("attn1", "attn2")
_PROJS = ("to_q", "to_k", "to_v", "to_out_0")


def _flax_path_for(module: str) -> list[str] | None:
    """kohya module name (underscored diffusers path) -> flax tree path.

    e.g. 'lora_unet_up_blocks_2_attentions_1_transformer_blocks_0_attn1_to_q'
    -> ['up_2_attn_1', 'block', 'attn1', 'to_q'].
    """
    m = re.match(
        r"lora_unet_(down|up)_blocks_(\d+)_attentions_(\d+)"
        r"_transformer_blocks_0_(attn\d|ff)_(.+)",
        module,
    )
    if m:
        side, bi, ai, sub, leaf = m.groups()
        base = f"{side}_{bi}_attn_{ai}"
        if sub.startswith("attn"):
            leaf = leaf.replace("to_out_0", "to_out")
            return [base, "block", sub, leaf]
        if leaf == "net_0_proj":
            return [base, "block", "ff_geglu", "proj"]
        if leaf == "net_2":
            return [base, "block", "ff_out"]
        return None
    m = re.match(
        r"lora_unet_mid_block_attentions_0_transformer_blocks_0_(attn\d|ff)_(.+)",
        module,
    )
    if m:
        sub, leaf = m.groups()
        if sub.startswith("attn"):
            leaf = leaf.replace("to_out_0", "to_out")
            return ["mid_attn", "block", sub, leaf]
        if leaf == "net_0_proj":
            return ["mid_attn", "block", "ff_geglu", "proj"]
        if leaf == "net_2":
            return ["mid_attn", "block", "ff_out"]
    m = re.match(r"lora_te_text_model_encoder_layers_(\d+)_(.+)", module)
    if m:
        li, leaf = m.groups()
        leaf = leaf.replace("self_attn_", "self_attn/").replace("mlp_fc", "mlp_fc")
        return [f"layers_{li}"] + leaf.split("/")
    return None


def merge_lora(
    params: dict,
    lora_sd: Mapping[str, np.ndarray],
    scale: float = 1.0,
    target: str = "lora_unet_",
) -> tuple[dict, int]:
    """Merge LoRA deltas into a flax params['params'] tree in place-ish.

    Returns (params, merged_count).  Unmatched modules are skipped (and
    counted in the remainder).
    """
    tree = params["params"] if "params" in params else params
    modules = {}
    for k in lora_sd:
        if not k.startswith(target) or ".lora_down" not in k:
            continue
        modules[k.split(".lora_down")[0]] = True

    merged = 0
    for mod in modules:
        path = _flax_path_for(mod)
        if path is None:
            continue
        node = tree
        ok = True
        for p in path:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok or "kernel" not in node:
            continue
        down = _np(lora_sd[f"{mod}.lora_down.weight"]).astype(np.float32)
        up = _np(lora_sd[f"{mod}.lora_up.weight"]).astype(np.float32)
        alpha_key = f"{mod}.alpha"
        r = down.shape[0]
        alpha = float(_np(lora_sd[alpha_key])) if alpha_key in lora_sd else float(r)
        delta = (up @ down) * (alpha / r) * scale  # [out, in]
        kernel = node["kernel"]
        node["kernel"] = (
            np.asarray(kernel, np.float32) + delta.transpose(1, 0)
        ).astype(np.asarray(kernel).dtype)
        merged += 1
    return params, merged
