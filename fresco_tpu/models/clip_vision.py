"""CLIP vision encoder (ViT image tower) for frame-similarity metrics.

The reference publishes only qualitative results; BASELINE.md's
acceptance metrics include CLIP frame similarity, which needs the image
tower that the text-only ``clip_text.py`` lacks (VERDICT r2 item 6).
Flax re-implementation of the HF ``CLIPVisionTransformer`` (the
openai/clip-vit-large-patch14 family SD 1.5 pairs with): conv patch
embedding + class token + learned positions, pre-LN, non-causal
transformer layers (same block as the text tower), post-LN pooled
output, optional projection to the shared image/text space.

Conventions: NHWC input images; ``image_embeddings`` handles the CLIP
pixel normalization from [-1, 1] RGB (repo convention, CLAUDE.md).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from fresco_tpu.models.clip_text import CLIPLayer, CLIPTextConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
            image_size=32, patch_size=8, projection_dim=16,
        )

    def as_text_cfg(self) -> CLIPTextConfig:
        """Adapter so the shared CLIPLayer block can be reused."""
        return CLIPTextConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            layer_norm_eps=self.layer_norm_eps,
        )


# CLIP pixel normalization (HF CLIPImageProcessor constants)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, project: bool = False):
        """pixels: [B, H, W, 3] CLIP-normalized, H = W = cfg.image_size.

        Returns the pooled embedding [B, C] (post-LN class token), or its
        projection to the shared space [B, projection_dim] when
        ``project`` (requires CLIPModel-style ``visual_projection``
        weights)."""
        c = self.cfg
        b = pixels.shape[0]
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixels)
        x = x.reshape(b, -1, c.hidden_size)  # [B, P, C] row-major patches
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.hidden_size)), x],
            axis=1,
        )
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = nn.Embed(
            n_pos, c.hidden_size, dtype=self.dtype, name="position_embedding"
        )(jnp.arange(x.shape[1])[None])
        x = x + pos
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm"
        )(x)  # [sic] HF parameter name
        tc = c.as_text_cfg()
        full = jnp.ones((1, 1, x.shape[1], x.shape[1]), dtype=bool)
        for i in range(c.num_layers):
            x = CLIPLayer(tc, self.dtype, name=f"layers_{i}")(x, full)
        pooled = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(x[:, 0])
        if project:
            pooled = nn.Dense(
                c.projection_dim, use_bias=False, dtype=self.dtype,
                name="visual_projection",
            )(pooled)
        return pooled


def infer_vision_config(sd) -> CLIPVisionConfig:
    """Derive a CLIPVisionConfig from a checkpoint's tensor shapes, so
    any CLIP vision variant (L/14, B/32, B/16, ...) loads without a
    hand-matched config.  Accepts CLIPVisionModel or CLIPModel layouts."""
    import numpy as np

    p = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    patch_w = np.asarray(sd[f"{p}embeddings.patch_embedding.weight"])
    hidden, _, patch, _ = patch_w.shape  # torch OIHW
    n_pos = np.asarray(sd[f"{p}embeddings.position_embedding.weight"]).shape[0]
    image_size = int(round((n_pos - 1) ** 0.5)) * patch
    n_layers = 1 + max(
        int(k.split("encoder.layers.")[1].split(".")[0])
        for k in sd
        if "encoder.layers." in k
    )
    inter = np.asarray(sd[f"{p}encoder.layers.0.mlp.fc1.weight"]).shape[0]
    proj = sd.get("visual_projection.weight")
    proj_dim = np.asarray(proj).shape[0] if proj is not None else hidden
    # heads are not recoverable from fused-QKV checkpoint shapes; the
    # known HF CLIP vision towers pin them per hidden size (ViT-B 768/12,
    # ViT-L 1024/16, ViT-H 1280/16 head_dim 80, ViT-bigG 1664/16 head_dim
    # 104) — the //64 heuristic silently mis-grouped the >=1280 variants
    heads = {768: 12, 1024: 16, 1280: 16, 1664: 16}.get(
        hidden, max(hidden // 64, 1)
    )
    return CLIPVisionConfig(
        hidden_size=hidden, num_layers=n_layers, num_heads=heads,
        intermediate_size=inter, image_size=image_size, patch_size=patch,
        projection_dim=proj_dim,
    )


def preprocess_unit_images(
    images: jnp.ndarray, image_size: int
) -> jnp.ndarray:
    """[-1, 1] RGB [B, H, W, 3] -> CLIP-normalized [B, S, S, 3].

    Bilinear resize to the tower's square input + CLIP mean/std — the
    HF processor's center-crop is skipped (frames are already the
    content of interest)."""
    from fresco_tpu.ops.resize import resize_bilinear

    x = (images + 1.0) / 2.0
    x = resize_bilinear(x, (image_size, image_size))
    mean = jnp.asarray(_CLIP_MEAN, x.dtype)
    std = jnp.asarray(_CLIP_STD, x.dtype)
    return (x - mean) / std


def image_embeddings(model, params, images: jnp.ndarray,
                     project: bool = True) -> jnp.ndarray:
    """L2-normalized CLIP embeddings for [-1,1] RGB frames [B,H,W,3]."""
    x = preprocess_unit_images(images, model.cfg.image_size)
    emb = model.apply(params, x, project=project)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
