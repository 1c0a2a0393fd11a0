"""DPT-hybrid shape/property tests (no timm/checkpoint available offline;
weight-layout conversion exercised against a synthetic timm-style state
dict)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.models.midas import DPTHybridDepth, convert_dpt_hybrid


def test_dpt_tiny_forward_shapes(rng):
    model = DPTHybridDepth(
        vit_dim=32, vit_depth=2, hooks=(0, 1), features=16, grid_size_train=4
    )
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    depth = model.apply(params, x)
    assert depth.shape == (1, 64, 64)  # full resolution (fusion x2 + head x2)
    assert float(depth.min()) >= 0.0  # non-negative head


def test_dpt_nonsquare_input(rng):
    model = DPTHybridDepth(
        vit_dim=32, vit_depth=2, hooks=(0, 1), features=16, grid_size_train=4
    )
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    depth = model.apply(params, x)
    assert depth.shape == (1, 64, 96)


def _synthetic_timm_sd(rng):
    """Minimal timm-layout state dict for the converter (vit_dim=32,
    2 blocks, tiny ResNetV2 r50-layout)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)

    def convb(name, o, i, k):
        conv(name, o, i, k)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def dense(name, o, i):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    p = "pretrained.model."
    bb = f"{p}patch_embed.backbone."
    conv(f"{bb}stem.conv", 64, 3, 7)
    norm(f"{bb}stem.norm", 64)
    widths = (256, 512, 1024)
    chans_in = (64, 256, 512)
    for si, depth_ in enumerate((3, 4, 9)):
        for bi in range(depth_):
            s = f"{bb}stages.{si}.blocks.{bi}"
            cin = chans_in[si] if bi == 0 else widths[si]
            w = widths[si]
            norm(f"{s}.norm1", cin)
            conv(f"{s}.conv1", w // 4, cin, 1)
            norm(f"{s}.norm2", w // 4)
            conv(f"{s}.conv2", w // 4, w // 4, 3)
            norm(f"{s}.norm3", w // 4)
            conv(f"{s}.conv3", w, w // 4, 1)
            if bi == 0:
                conv(f"{s}.downsample.conv", w, cin, 1)
    convb(f"{p}patch_embed.proj", 768, 1024, 1)
    sd[f"{p}cls_token"] = np.zeros((1, 1, 768), np.float32)
    sd[f"{p}pos_embed"] = np.zeros((1, 24 * 24 + 1, 768), np.float32)
    for i in range(12):
        s = f"{p}blocks.{i}"
        norm(f"{s}.norm1", 768)
        dense(f"{s}.attn.qkv", 3 * 768, 768)
        dense(f"{s}.attn.proj", 768, 768)
        norm(f"{s}.norm2", 768)
        dense(f"{s}.mlp.fc1", 3072, 768)
        dense(f"{s}.mlp.fc2", 768, 3072)
    norm(f"{p}norm", 768)
    dense("pretrained.act_postprocess3.0.project.0", 768, 1536)
    convb("pretrained.act_postprocess3.3", 768, 768, 1)
    dense("pretrained.act_postprocess4.0.project.0", 768, 1536)
    convb("pretrained.act_postprocess4.3", 768, 768, 1)
    convb("pretrained.act_postprocess4.4", 768, 768, 3)
    for i, cin in zip(range(1, 5), (256, 512, 768, 768)):
        conv(f"scratch.layer{i}_rn", 256, cin, 3)
    for i in range(1, 5):
        s = f"scratch.refinenet{i}"
        for unit in ("resConfUnit1", "resConfUnit2"):
            convb(f"{s}.{unit}.conv1", 256, 256, 3)
            convb(f"{s}.{unit}.conv2", 256, 256, 3)
        convb(f"{s}.out_conv", 256, 256, 1)
    convb("scratch.output_conv.0", 128, 256, 3)
    convb("scratch.output_conv.2", 32, 128, 3)
    convb("scratch.output_conv.4", 1, 32, 1)
    return sd


@pytest.mark.slow
def test_dpt_converter_matches_full_param_structure(rng):
    """The converted tree must exactly match the full-size model's param
    structure (names and shapes)."""
    sd = _synthetic_timm_sd(np.random.default_rng(0))
    tree = convert_dpt_hybrid(sd)

    model = DPTHybridDepth()
    x = jnp.zeros((1, 64, 64, 3))
    ref = model.init(jax.random.key(0), x)["params"]

    def flat(t, prefix=""):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = np.asarray(v).shape
        return out

    ref_f = flat(ref)
    got_f = flat(tree)
    missing = set(ref_f) - set(got_f)
    extra = set(got_f) - set(ref_f)
    assert not missing, f"missing params: {sorted(missing)[:10]}"
    assert not extra, f"extra params: {sorted(extra)[:10]}"
    mismatched = {k for k in ref_f if ref_f[k] != got_f[k]}
    assert not mismatched, {k: (ref_f[k], got_f[k]) for k in list(mismatched)[:5]}

    # and the converted params must actually run
    depth = model.apply({"params": tree}, jnp.zeros((1, 64, 64, 3)))
    assert depth.shape == (1, 64, 64)
