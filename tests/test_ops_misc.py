"""Tests for AdaIN, dilation, FreeU filter, image conventions, config."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from fresco_tpu.core.config import (  # noqa: E402
    FrescoConfig,
    keyframe_sublists,
    load_config,
)
from fresco_tpu.ops.adain import adain, calc_mean_std  # noqa: E402
from fresco_tpu.ops.freeu import fourier_filter  # noqa: E402
from fresco_tpu.ops.image import (  # noqa: E402
    resolution_to_64,
    uint8_to_unit_range,
    unit_range_to_uint8,
)
from fresco_tpu.ops.morphology import dilate  # noqa: E402


def _torch_calc_mean_std(feat, eps=1e-5, chunk=1):
    # direct transcription of reference utils.py:58-67 (NCHW)
    size = feat.size()
    if chunk == 2:
        feat = torch.cat(feat.chunk(2), dim=3)
    N, C = size[:2]
    feat_var = feat.reshape(N // chunk, C, -1).var(dim=2) + eps
    feat_std = feat_var.sqrt().reshape(N // chunk, C, 1, 1)
    feat_mean = feat.reshape(N // chunk, C, -1).mean(dim=2).reshape(N // chunk, C, 1, 1)
    return feat_mean.repeat(chunk, 1, 1, 1), feat_std.repeat(chunk, 1, 1, 1)


@pytest.mark.parametrize("chunk", [1, 2])
def test_calc_mean_std_matches_reference_math(rng, chunk):
    x = rng.standard_normal((4, 5, 6, 3)).astype(np.float32)  # NHWC
    mean, std = calc_mean_std(jnp.asarray(x), chunk=chunk)
    tmean, tstd = _torch_calc_mean_std(
        torch.from_numpy(x).permute(0, 3, 1, 2), chunk=chunk
    )
    np.testing.assert_allclose(
        np.asarray(mean)[:, 0, 0, :], tmean[:, :, 0, 0].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(std)[:, 0, 0, :], tstd[:, :, 0, 0].numpy(), atol=1e-5
    )


def test_adain_transfers_stats(rng):
    content = rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 3 + 1
    style = rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 0.5 - 2
    out = np.asarray(adain(jnp.asarray(content), jnp.asarray(style)))
    sm, ss = calc_mean_std(jnp.asarray(style))
    om, os_ = calc_mean_std(jnp.asarray(out))
    np.testing.assert_allclose(np.asarray(om), np.asarray(sm), atol=1e-4)
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ss), rtol=1e-3)


def test_dilate_matches_reference_math(rng):
    x = (rng.uniform(0, 1, (1, 10, 12, 1)) > 0.8).astype(np.float32)
    ours = np.asarray(dilate(jnp.asarray(x), 7))
    # reference utils.py:81-93: replicate pad + 7x7 ones conv + clamp
    xp = TF.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (3, 3, 3, 3), "replicate")
    theirs = torch.clamp(
        TF.conv2d(xp, torch.ones(1, 1, 7, 7)), 0, 1
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_fourier_filter_matches_reference_math(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(fourier_filter(jnp.asarray(x), threshold=1, scale=0.5))
    # reference free_lunch_utils.py:25-52 (NCHW)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    x_freq = torch.fft.fftn(xt, dim=(-2, -1))
    x_freq = torch.fft.fftshift(x_freq, dim=(-2, -1))
    B, C, H, W = x_freq.shape
    mask = torch.ones((B, C, H, W))
    crow, ccol = H // 2, W // 2
    mask[..., crow - 1 : crow + 1, ccol - 1 : ccol + 1] = 0.5
    x_freq = x_freq * mask
    x_freq = torch.fft.ifftshift(x_freq, dim=(-2, -1))
    theirs = torch.fft.ifftn(x_freq, dim=(-2, -1)).real.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_image_roundtrip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 10
    x = uint8_to_unit_range(img)
    assert x.shape == (1, 2, 3, 3)
    back = unit_range_to_uint8(x)[0]
    np.testing.assert_array_equal(back, img)


def test_resolution_to_64():
    assert resolution_to_64(720, 1280, 512) == (512, 896)
    assert resolution_to_64(512, 512, 512) == (512, 512)


def test_config_loads_reference_yaml(tmp_path):
    import pathlib

    ref_cfg = pathlib.Path("/root/reference/config/config_music.yaml")
    if not ref_cfg.exists():
        pytest.skip("reference configs not mounted")
    cfg = load_config(str(ref_cfg))
    assert cfg.batch_size == 8
    assert cfg.num_inference_steps == 20
    assert cfg.num_warmup_steps == 3
    assert cfg.use_saliency is True  # maps the reference's 'use_salinecy'
    assert cfg.controlnet_type == "hed"
    assert cfg.mininterv == 10 and cfg.maxinterv == 30


def test_keyframe_sublists_matches_reference_batching():
    # mirror of run_fresco.py:145-154 on a representative key list
    keys = list(range(0, 73, 8))  # 10 keys
    subs = keyframe_sublists(keys, batch_size=8)
    flat = [k for s in subs for k in s]
    assert flat == keys
    assert subs[0][:2] == [0, 8]
    assert all(len(s) >= 3 for s in subs[1:])
    # every batch fits in batch_size (first has 2 anchors, later get +2 refs)
    assert len(subs[0]) <= 8
    assert all(len(s) <= 6 for s in subs[1:])


def test_config_loads_all_reference_yamls():
    """All four demo configs (BASELINE.md's benchmark set) must load with
    sane values — not just config_music."""
    import pathlib

    base = pathlib.Path("/root/reference/config")
    if not base.exists():
        pytest.skip("reference configs not mounted")
    for name in ("config_music", "config_dog", "config_boxer", "config_carturn"):
        cfg = load_config(str(base / f"{name}.yaml"))
        assert cfg.batch_size == 8, name
        assert cfg.num_inference_steps == 20, name
        assert 0 < cfg.mininterv <= cfg.maxinterv, name
        assert cfg.controlnet_type in ("hed", "canny", "depth"), name
        assert cfg.prompt, name
