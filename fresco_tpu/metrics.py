"""Temporal-consistency metrics for parity evaluation.

BASELINE.md's acceptance metrics: flow-warp error under GMFlow flow and
CLIP frame-to-frame similarity.  The reference publishes no harness for
these (SURVEY.md §6) — this module is the rebuild's measurement side.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fresco_tpu.ops.warp import flow_warp, forward_backward_consistency


def warp_error(
    frames: jnp.ndarray,
    flow_fn,
) -> float:
    """Mean abs error between each frame and its flow-warped successor,
    on non-occluded pixels.  frames [F, H, W, 3] in [0, 255]; flow_fn as
    in pipeline.prepare.interframe_params."""
    f = frames.shape[0]
    rolled = jnp.roll(frames, -1, axis=0)
    flow = flow_fn(frames, rolled)
    fwd, bwd = flow[:f], flow[f:]
    _, bwd_occ = forward_backward_consistency(fwd, bwd)
    warped = flow_warp(frames, bwd)  # frame i warped onto frame i+1's grid
    valid = (1.0 - bwd_occ)[..., None]
    err = jnp.abs(rolled - warped) * valid
    # exclude the wraparound pair (last -> first) from BOTH sums: the
    # artificial pair's (usually much lower) valid count would otherwise
    # bias the mean through a uniform f/(f-1) correction
    denom = jnp.maximum(jnp.sum(valid[: f - 1]) * 3, 1.0)
    return float(jnp.sum(err[: f - 1]) / denom)


def clip_frame_similarity(
    frames: jnp.ndarray, image_encoder=None, params=None
) -> float:
    """Mean cosine similarity of consecutive frame embeddings.

    With no CLIP image tower available (offline), falls back to a
    downsampled-pixel cosine — a weaker but monotone proxy; pass a real
    encoder for the published metric.
    """
    if image_encoder is not None:
        emb = image_encoder(params, frames)
    else:
        from fresco_tpu.ops.resize import avg_pool2d

        x = avg_pool2d(frames.astype(jnp.float32), 8)
        emb = x.reshape(x.shape[0], -1)
        emb = emb - emb.mean(axis=1, keepdims=True)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    sims = jnp.sum(emb[:-1] * emb[1:], axis=-1)
    return float(jnp.mean(sims))


def make_clip_image_encoder(ckpt_path: str | None):
    """(encoder_fn, params) for ``clip_frame_similarity`` from a
    transformers CLIPVisionModel/CLIPModel checkpoint, or None when the
    checkpoint is absent (offline) — callers fall back to the pixel
    proxy.  encoder_fn(params, frames_255) -> L2-normalized [F, D]."""
    import os

    if not ckpt_path or not os.path.exists(ckpt_path):
        return None
    import jax

    from fresco_tpu.models import convert as C
    from fresco_tpu.models.clip_vision import (
        CLIPVisionEncoder, image_embeddings, infer_vision_config,
    )

    sd = C.load_torch_state_dict(ckpt_path)
    cfg = infer_vision_config(sd)
    model = CLIPVisionEncoder(cfg)
    params = {"params": C.convert_clip_vision(sd, cfg)}
    project = "visual_projection" in params["params"]

    @jax.jit
    def encode(p, frames_255):
        return image_embeddings(
            model, p, frames_255 / 127.5 - 1.0, project=project
        )

    return encode, params


def evaluate_translation(
    out_frames: np.ndarray, flow_fn, clip_encoder=None
) -> dict:
    """Standard report for a translated clip (uint8 [F, H, W, 3]).

    ``clip_encoder``: optional (encoder_fn, params) from
    ``make_clip_image_encoder`` — real CLIP frame similarity when
    weights exist, pixel-cosine proxy otherwise."""
    x = jnp.asarray(out_frames, jnp.float32)
    enc, params = clip_encoder if clip_encoder else (None, None)
    return {
        "warp_error": warp_error(x, flow_fn),
        "frame_similarity": clip_frame_similarity(x, enc, params),
        "frame_similarity_is_clip": bool(enc),
    }
