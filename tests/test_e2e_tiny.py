"""End-to-end smoke: full FRESCO pipeline with tiny random models at 64px
on the bundled music.mp4 clip — exercises keyframe selection, GMFlow
param prep, trajectory construction, the jitted scan sampler with all
FRESCO mechanisms, inter-batch propagation, and PNG output.

This is the rebuild's analog of the reference's config-driven smoke run
(README.md:67-71), shrunk to CPU scale (SURVEY.md §4).
"""
import os
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from fresco_tpu.core.config import FrescoConfig

MUSIC = "/root/reference/data/music.mp4"


@pytest.mark.slow
def test_full_pipeline_tiny(tmp_path):
    if not os.path.exists(MUSIC):
        pytest.skip("demo clip not mounted")
    cfg = FrescoConfig(
        file_path=MUSIC,
        save_path=str(tmp_path) + "/",
        mininterv=60,
        maxinterv=60,  # uniform stride -> few keyframes
        resolution=64,
        batch_size=8,
        num_inference_steps=8,
        num_warmup_steps=2,
        end_opt_step=4,
        bg_smoothing_steps=(6, 7),
        opt_iters=2,
        use_controlnet=True,
        controlnet_type="canny",
        use_saliency=True,
        prompt="a cartoon",
        dtype="float32",
    )
    from fresco_tpu.pipeline.runner import FrescoPipeline

    pipe = FrescoPipeline(cfg, tiny=True)
    # dummy saliency (no EGNet weights): uniform half-background mask
    pipe.bundle.saliency_fn = lambda imgs: jnp.full(
        (imgs.shape[0], imgs.shape[1], imgs.shape[2], 1), 0.5
    )
    keys = pipe.translate_keyframes(verbose=False)

    assert len(keys) >= 2
    out = sorted(pathlib.Path(tmp_path, "keys").glob("*.png"))
    assert len(out) == len(keys)
    video_frames = sorted(pathlib.Path(tmp_path, "video").glob("*.png"))
    assert len(video_frames) > len(keys)

    # outputs must be valid images
    import PIL.Image

    img = np.asarray(PIL.Image.open(out[0]))
    assert img.shape == (64, 64, 3)
    assert img.dtype == np.uint8

    # resume affordance: with every keyframe PNG present, reuse=True
    # must skip translation entirely (no sampler dispatch) and return
    # the same key indices
    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("translate must be skipped on resume")

    pipe._prepare_batch = _boom
    pipe._run_batch = _boom
    keys2 = pipe.translate_keyframes(verbose=False, reuse=True)
    assert keys2 == keys
