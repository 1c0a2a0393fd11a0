"""Shape/behavior tests for the Flax model stack on tiny configs, plus
numerical parity of the CLIP text encoder against transformers (torch)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.attention.fresco_attention import FrescoAttnParams
from fresco_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from fresco_tpu.models.controlnet import ControlNet
from fresco_tpu.models.unet import UNet2DCondition, UNetConfig
from fresco_tpu.models.vae import AutoencoderKL, VAEConfig


def test_vae_roundtrip_shapes(rng):
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = vae.init(jax.random.key(0), x)
    z = vae.apply(params, x, method=vae.encode, sample=False)
    assert z.shape == (2, 4, 4, cfg.latent_channels)  # /8 like SD
    img = vae.apply(params, z, method=vae.decode)
    assert img.shape == x.shape


def test_unet_forward_and_hooks(rng):
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    b, h, w = 4, 8, 8  # chunk=2, F=2
    x = jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 7, cfg.cross_attention_dim)), jnp.float32)
    params = unet.init(jax.random.key(0), x, jnp.int32(10), ctx)

    eps = unet.apply(params, x, jnp.int32(10), ctx)
    assert eps.shape == x.shape

    # up features hook
    eps2, feats = unet.apply(params, x, jnp.int32(10), ctx, return_up_features=True)
    assert len(feats) == len(cfg.block_out_channels)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), atol=1e-5)

    # guidance hook is called per stage and can modify features
    calls = []

    def gfn(stage, s):
        calls.append(stage)
        return s * 1.0

    unet.apply(params, x, jnp.int32(10), ctx, guidance_fn=gfn)
    assert calls == [0, 1]


def _fresco_params_for(cfg, b, h, w):
    f = b // 2
    # fresco block is up block 1 in tiny cfg -> hw at input resolution h*w
    hw = h * w
    n_layers = UNet2DCondition.num_fresco_layers(cfg)
    ref = tuple(
        jnp.zeros((b, hw, cfg.block_out_channels[0]), jnp.float32)
        for _ in range(n_layers)
    )
    cf = {hw: jnp.ones((f, hw), dtype=bool)}
    fwd = jnp.tile(jnp.arange(hw, dtype=jnp.int32)[None], (f, 1))
    traj = {hw: (fwd, fwd, jnp.ones((hw, f, f), dtype=bool))}
    return FrescoAttnParams(
        cf_masks=cf,
        ref_features=ref,
        trajectories=traj,
        use_intra=jnp.array(True),
        use_inter=jnp.array(True),
        chunk=2,
    )


def test_unet_with_fresco_params(rng):
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    b, h, w = 4, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 7, cfg.cross_attention_dim)), jnp.float32)
    params = unet.init(jax.random.key(0), x, jnp.int32(10), ctx)

    fresco = _fresco_params_for(cfg, b, h, w)
    eps = unet.apply(params, x, jnp.int32(10), ctx, fresco=fresco)
    assert eps.shape == x.shape
    assert np.all(np.isfinite(np.asarray(eps)))

    # with gates off, cross-frame attention still applies (static), so the
    # output differs from the no-fresco path only via cf attention
    fresco_off = fresco.replace(use_intra=jnp.array(False), use_inter=jnp.array(False))
    eps_off = unet.apply(params, x, jnp.int32(10), ctx, fresco=fresco_off)
    assert np.all(np.isfinite(np.asarray(eps_off)))


def test_controlnet_residual_shapes(rng):
    cfg = UNetConfig.tiny()
    cnet = ControlNet(cfg, dtype=jnp.float32, cond_embed_channels=(4, 8))
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    b, h, w = 2, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)
    cond = jnp.asarray(rng.uniform(0, 1, (b, h * 2, w * 2, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 7, cfg.cross_attention_dim)), jnp.float32)

    cparams = cnet.init(jax.random.key(0), x, jnp.int32(10), ctx, cond)
    down, mid = cnet.apply(cparams, x, jnp.int32(10), ctx, cond, 0.7)
    # zero-initialized projections -> residuals must be exactly zero
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0

    uparams = unet.init(jax.random.key(1), x, jnp.int32(10), ctx)
    eps = unet.apply(
        uparams, x, jnp.int32(10), ctx, controlnet_residuals=(down, mid)
    )
    assert eps.shape == x.shape


def test_clip_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from fresco_tpu.models.convert import convert_clip_text

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
    )
    torch_model = transformers.CLIPTextModel(hf_cfg).eval()
    ids = rng.integers(0, 100, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).last_hidden_state.numpy()

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64,
    )
    enc = CLIPTextEncoder(cfg, dtype=jnp.float32)
    params = {"params": convert_clip_text(torch_model.state_dict(), cfg)}
    out = np.asarray(enc.apply(params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
