"""CLIP vision tower golden vs transformers.CLIPVisionModel.

transformers IS available offline (CLAUDE.md), so the image tower is
goldened against the real HF implementation with random weights at tiny
dims — the converter + Flax forward must reproduce the torch pooled
output and the projected embedding (VERDICT r2 item 6 done-criterion).
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fresco_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionEncoder,
    image_embeddings,
    preprocess_unit_images,
)
from fresco_tpu.models.convert import convert_clip_vision

CFG = CLIPVisionConfig.tiny()  # hidden 32, 2 layers, 4 heads, img 32, patch 8


def _hf_vision_model():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        intermediate_size=CFG.intermediate_size,
        image_size=CFG.image_size,
        patch_size=CFG.patch_size,
        projection_dim=CFG.projection_dim,
        layer_norm_eps=CFG.layer_norm_eps,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    return transformers.CLIPVisionModel(hf_cfg).eval()


def test_pooled_output_matches_hf(rng):
    model = _hf_vision_model()
    pixels = rng.standard_normal((2, CFG.image_size, CFG.image_size, 3)).astype(
        np.float32
    )

    with torch.no_grad():
        ref = model(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).pooler_output.numpy()

    params = {"params": convert_clip_vision(model.state_dict(), CFG)}
    out = np.asarray(CLIPVisionEncoder(CFG).apply(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_projected_embeddings_with_full_clip_keys(rng):
    """visual_projection from a CLIPModel-style checkpoint converts and
    applies (project=True path used by the frame-similarity metric)."""
    model = _hf_vision_model()
    sd = {f"vision_model.{k}": v for k, v in model.vision_model.state_dict().items()}
    torch.manual_seed(1)
    proj = torch.nn.Linear(CFG.hidden_size, CFG.projection_dim, bias=False)
    sd["visual_projection.weight"] = proj.weight.detach()

    pixels = rng.standard_normal((3, CFG.image_size, CFG.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        pooled = model(torch.from_numpy(pixels.transpose(0, 3, 1, 2))).pooler_output
        ref = proj(pooled).numpy()

    params = {"params": convert_clip_vision(sd, CFG)}
    out = np.asarray(
        CLIPVisionEncoder(CFG).apply(params, jnp.asarray(pixels), project=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_image_embeddings_normalized(rng):
    model = _hf_vision_model()
    params = {"params": convert_clip_vision(model.state_dict(), CFG)}
    imgs = jnp.asarray(
        rng.uniform(-1, 1, (2, 48, 40, 3)).astype(np.float32)
    )  # non-square, non-CLIP-size: exercises the resize path
    enc = CLIPVisionEncoder(CFG)
    emb = np.asarray(image_embeddings(enc, params, imgs, project=False))
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=-1), np.ones(2), atol=1e-5
    )
    pre = preprocess_unit_images(imgs, CFG.image_size)
    assert pre.shape == (2, CFG.image_size, CFG.image_size, 3)


def test_make_clip_image_encoder_from_checkpoint(tmp_path, rng):
    """metrics.make_clip_image_encoder: config inferred from checkpoint
    shapes (any CLIP vision variant), embeddings L2-normalized, and the
    similarity metric switches to the real tower."""
    from fresco_tpu.metrics import clip_frame_similarity, make_clip_image_encoder
    from fresco_tpu.models.clip_vision import infer_vision_config

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=1,
        intermediate_size=128, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    path = str(tmp_path / "clip_vision.bin")
    torch.save(model.state_dict(), path)

    cfg = infer_vision_config(model.state_dict())
    assert (cfg.hidden_size, cfg.num_layers, cfg.num_heads) == (64, 2, 1)
    assert (cfg.image_size, cfg.patch_size) == (32, 8)
    assert cfg.intermediate_size == 128

    enc = make_clip_image_encoder(path)
    assert enc is not None
    encode, params = enc
    frames = rng.integers(0, 255, (3, 40, 48, 3)).astype(np.float32)
    emb = np.asarray(encode(params, jnp.asarray(frames)))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    sim = clip_frame_similarity(jnp.asarray(frames), encode, params)
    assert np.isfinite(sim) and -1.0 <= sim <= 1.0

    assert make_clip_image_encoder(str(tmp_path / "missing.bin")) is None
