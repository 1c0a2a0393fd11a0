"""LoRA merging and sampler long-video propagation semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.models.unet import UNet2DCondition, UNetConfig


def test_lora_merge_applies_delta(rng):
    from fresco_tpu.models.lora import merge_lora

    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    params = unet.init(jax.random.key(0), x, jnp.int32(0), ctx)
    kernel_before = np.asarray(
        params["params"]["down_0_attn_0"]["block"]["attn1"]["to_q"]["kernel"]
    ).copy()

    c = kernel_before.shape[0]
    r = 2
    lora_sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": rng.standard_normal((r, c)).astype(np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": rng.standard_normal((c, r)).astype(np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".alpha": np.float32(r),
    }
    params, merged = merge_lora(params, lora_sd, scale=0.5)
    assert merged == 1
    kernel_after = np.asarray(
        params["params"]["down_0_attn_0"]["block"]["attn1"]["to_q"]["kernel"]
    )
    up = lora_sd[[k for k in lora_sd if "lora_up" in k][0]]
    down = lora_sd[[k for k in lora_sd if "lora_down" in k][0]]
    expected = kernel_before + 0.5 * (up @ down).T
    np.testing.assert_allclose(kernel_after, expected, atol=1e-6)


@pytest.mark.slow
def test_lora_path_in_config_changes_unet_params(tmp_path, rng):
    """Pipeline-level wiring: a kohya checkpoint at config.lora_path must
    change the loaded UNet parameters (reference WebUI community-base
    path, webUI.py:429-434)."""
    torch = pytest.importorskip("torch")
    from fresco_tpu.core.config import FrescoConfig
    from fresco_tpu.pipeline.runner import build_models

    base = build_models(FrescoConfig(), tiny=True, seed=0)
    k_before = np.asarray(
        base.params["unet"]["params"]["up_1_attn_0"]["block"]["attn1"]["to_q"][
            "kernel"
        ]
    ).copy()

    c = k_before.shape[0]
    r = 2
    mod = "lora_unet_up_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q"
    lora = {
        f"{mod}.lora_down.weight": torch.randn(r, c),
        f"{mod}.lora_up.weight": torch.randn(c, r),
        f"{mod}.alpha": torch.tensor(float(r)),
    }
    path = tmp_path / "lora.pth"
    torch.save(lora, str(path))

    cfg = FrescoConfig(lora_path=str(path), lora_scale=0.7)
    merged = build_models(cfg, tiny=True, seed=0)
    k_after = np.asarray(
        merged.params["unet"]["params"]["up_1_attn_0"]["block"]["attn1"]["to_q"][
            "kernel"
        ]
    )
    delta = (lora[f"{mod}.lora_up.weight"].numpy()
             @ lora[f"{mod}.lora_down.weight"].numpy()).T * 0.7
    np.testing.assert_allclose(k_after, k_before + delta, atol=1e-5)


@pytest.mark.slow
def test_sampler_record_restore_roundtrip(rng):
    """Propagation mode must pin the two anchor frames to the recorded
    latents of the previous batch (pipe_FRESCO.py:175-179 semantics)."""
    from fresco_tpu.diffusion.sampler import (
        FrescoSampler, FrescoState, SamplerConfig,
    )
    from fresco_tpu.diffusion.scheduler import DDPMScheduler
    from fresco_tpu.models.controlnet import ControlNet
    from fresco_tpu.models.vae import AutoencoderKL, VAEConfig

    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg, dtype=jnp.float32)
    vae = AutoencoderKL(VAEConfig.tiny(), dtype=jnp.float32)
    cnet = ControlNet(ucfg, dtype=jnp.float32, cond_embed_channels=(4, 4, 8, 8))
    sched = DDPMScheduler(num_inference_steps=4)
    sampler = FrescoSampler(unet, vae, cnet, sched)

    f, H, W = 3, 32, 32
    key = jax.random.key(0)
    frames = jnp.asarray(rng.uniform(-1, 1, (f, H, W, 3)), jnp.float32)
    embeds = jnp.asarray(
        rng.standard_normal((2 * f, 7, ucfg.cross_attention_dim)), jnp.float32
    )
    params = {
        "unet": unet.init(key, jnp.zeros((1, 4, 4, 4)), jnp.int32(0), embeds[:1]),
        "vae": vae.init(key, jnp.zeros((1, 32, 32, 3))),
        "controlnet": cnet.init(
            key, jnp.zeros((1, 4, 4, 4)), jnp.int32(0), embeds[:1],
            jnp.zeros((1, 32, 32, 3)),
        ),
    }
    cfg1 = SamplerConfig(
        num_inference_steps=4, num_warmup_steps=1, use_controlnet=False,
        bg_smoothing_steps=(), do_opt=False, propagation_mode=False,
    )
    cond = jnp.full((4,), 0.7)
    latents1, record = sampler.sample(
        params, frames, embeds, None, cond, FrescoState(), None, key, cfg1
    )
    assert record.shape == (3, 2, 4, 4, 4)

    cfg2 = SamplerConfig(
        num_inference_steps=4, num_warmup_steps=1, use_controlnet=False,
        bg_smoothing_steps=(), do_opt=False, propagation_mode=True,
    )
    latents2, record2 = sampler.sample(
        params, frames, embeds, None, cond, FrescoState(), record, key, cfg2
    )
    # the new record's first anchor equals the restored first anchor
    np.testing.assert_allclose(
        np.asarray(record2[:, 0]), np.asarray(record[:, 0]), atol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(latents2)))


def test_sampler_negative_warmup_pure_noise(rng):
    """x0_strength > 1 gives num_warmup_steps < 0: the reference then
    IGNORES the input frames (pure Gaussian init) and runs the full step
    schedule (pipe_FRESCO.py:155-157)."""
    from fresco_tpu.diffusion.sampler import (
        FrescoSampler, FrescoState, SamplerConfig,
    )
    from fresco_tpu.diffusion.scheduler import DDPMScheduler
    from fresco_tpu.models.controlnet import ControlNet
    from fresco_tpu.models.vae import AutoencoderKL, VAEConfig

    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg, dtype=jnp.float32)
    vae = AutoencoderKL(VAEConfig.tiny(), dtype=jnp.float32)
    cnet = ControlNet(ucfg, dtype=jnp.float32, cond_embed_channels=(4, 4, 8, 8))
    sched = DDPMScheduler(num_inference_steps=4)
    sampler = FrescoSampler(unet, vae, cnet, sched)

    f, H, W = 2, 32, 32
    key = jax.random.key(0)
    frames_a = jnp.asarray(rng.uniform(-1, 1, (f, H, W, 3)), jnp.float32)
    frames_b = -frames_a  # very different content
    embeds = jnp.asarray(
        rng.standard_normal((2 * f, 7, ucfg.cross_attention_dim)), jnp.float32
    )
    params = {
        "unet": unet.init(key, jnp.zeros((1, 4, 4, 4)), jnp.int32(0), embeds[:1]),
        "vae": vae.init(key, jnp.zeros((1, 32, 32, 3))),
        "controlnet": cnet.init(
            key, jnp.zeros((1, 4, 4, 4)), jnp.int32(0), embeds[:1],
            jnp.zeros((1, 32, 32, 3)),
        ),
    }
    cfg = SamplerConfig(
        num_inference_steps=4, num_warmup_steps=-1, use_controlnet=False,
        bg_smoothing_steps=(), do_opt=False,
    )
    cond = jnp.full((4,), 0.7)
    out_a, rec = sampler.sample(
        params, frames_a, embeds, None, cond, FrescoState(), None, key, cfg
    )
    out_b, _ = sampler.sample(
        params, frames_b, embeds, None, cond, FrescoState(), None, key, cfg
    )
    # all 4 steps ran (record covers the full schedule), input ignored
    assert rec.shape[0] == 4
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(out_a)))
