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


# --------------------------------------------------------------------------
# Forward-parity golden: a torch mini DPT-hybrid replicating the reference's
# module behavior (annotator/midas/midas/vit.py:343-491 backbone wiring,
# dpt_depth.py:26-110 fusion/head, timm StdConv/PreActBottleneck semantics)
# with the timm checkpoint key layout, converted and compared numerically.
# --------------------------------------------------------------------------

_T_WIDTHS = (32, 64, 128)
_T_DEPTHS = (1, 1, 2)
_T_DIM = 64
_T_VIT_DEPTH = 3
_T_HOOKS = (1, 2)
_T_FEATURES = 32
_T_GRID = 8


def _build_torch_dpt():
    torch = pytest.importorskip("torch")
    nn, F = torch.nn, torch.nn.functional

    class WSConv2d(nn.Conv2d):
        def forward(self, x):
            w = self.weight
            v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
            w = (w - m) / torch.sqrt(v + 1e-6)
            return F.conv2d(x, w, self.bias, self.stride, self.padding)

    def gn(c):
        return nn.GroupNorm(min(32, c), c)

    class TBlockRN(nn.Module):
        def __init__(self, cin, w, stride):
            super().__init__()
            mid = w // 4
            self.norm1 = gn(cin)
            self.conv1 = WSConv2d(cin, mid, 1, bias=False)
            self.norm2 = gn(mid)
            self.conv2 = WSConv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
            self.norm3 = gn(mid)
            self.conv3 = WSConv2d(mid, w, 1, bias=False)
            if stride != 1 or cin != w:
                ds = nn.Module()
                ds.conv = WSConv2d(cin, w, 1, stride=stride, bias=False)
                self.downsample = ds

        def forward(self, x):
            pre = F.relu(self.norm1(x))
            sc = self.downsample.conv(pre) if hasattr(self, "downsample") else x
            h = self.conv1(pre)
            h = self.conv2(F.relu(self.norm2(h)))
            h = self.conv3(F.relu(self.norm3(h)))
            return h + sc

    class TVitAttn(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)

        def forward(self, x):
            b, s, d = x.shape
            q, k, v = self.qkv(x).chunk(3, dim=-1)
            att = torch.softmax(q @ k.transpose(1, 2) / d**0.5, dim=-1)
            return self.proj(att @ v)

    class TVitBlock(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.norm1 = nn.LayerNorm(d, eps=1e-6)
            self.attn = TVitAttn(d)
            self.norm2 = nn.LayerNorm(d, eps=1e-6)
            mlp = nn.Module()
            mlp.fc1 = nn.Linear(d, 4 * d)
            mlp.fc2 = nn.Linear(4 * d, d)
            self.mlp = mlp

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
            return x + h

    class TProjectReadout(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.project = nn.Sequential(nn.Linear(2 * d, d), nn.GELU())

        def forward(self, t):
            cls = t[:, :1].expand_as(t[:, 1:])
            return self.project(torch.cat([t[:, 1:], cls], dim=-1))

    class TRCU(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.conv1 = nn.Conv2d(f, f, 3, padding=1)
            self.conv2 = nn.Conv2d(f, f, 3, padding=1)

        def forward(self, x):
            h = self.conv2(F.relu(self.conv1(F.relu(x))))
            return h + x

    class TFusion(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.resConfUnit1 = TRCU(f)
            self.resConfUnit2 = TRCU(f)
            self.out_conv = nn.Conv2d(f, f, 1)

        def forward(self, x, skip=None):
            out = x if skip is None else x + self.resConfUnit1(skip)
            out = self.resConfUnit2(out)
            out = F.interpolate(
                out, scale_factor=2, mode="bilinear", align_corners=True
            )
            return self.out_conv(out)

    class TDPT(nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            d, f = _T_DIM, _T_FEATURES
            stem = nn.Module()
            stem.conv = WSConv2d(3, 64, 7, stride=2, padding=3, bias=False)
            stem.norm = gn(64)
            stages = nn.ModuleList()
            cin = 64
            for si, (w, dep) in enumerate(zip(_T_WIDTHS, _T_DEPTHS)):
                st = nn.Module()
                st.blocks = nn.ModuleList(
                    [
                        TBlockRN(cin if b == 0 else w, w,
                                 (1 if si == 0 else 2) if b == 0 else 1)
                        for b in range(dep)
                    ]
                )
                stages.append(st)
                cin = w
            backbone = nn.Module()
            backbone.stem = stem
            backbone.stages = stages
            patch_embed = nn.Module()
            patch_embed.backbone = backbone
            patch_embed.proj = nn.Conv2d(_T_WIDTHS[-1], d, 1)
            model = nn.Module()
            model.patch_embed = patch_embed
            model.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.5)
            model.pos_embed = nn.Parameter(torch.randn(1, _T_GRID**2 + 1, d) * 0.5)
            model.blocks = nn.ModuleList([TVitBlock(d) for _ in range(_T_VIT_DEPTH)])
            model.norm = nn.LayerNorm(d, eps=1e-6)
            pretrained = nn.Module()
            pretrained.model = model
            pretrained.act_postprocess3 = nn.Sequential(
                TProjectReadout(d), nn.Identity(), nn.Identity(), nn.Conv2d(d, d, 1)
            )
            pretrained.act_postprocess4 = nn.Sequential(
                TProjectReadout(d), nn.Identity(), nn.Identity(), nn.Conv2d(d, d, 1),
                nn.Conv2d(d, d, 3, stride=2, padding=1),
            )
            self.pretrained = pretrained
            scratch = nn.Module()
            scratch.layer1_rn = nn.Conv2d(_T_WIDTHS[0], f, 3, padding=1, bias=False)
            scratch.layer2_rn = nn.Conv2d(_T_WIDTHS[1], f, 3, padding=1, bias=False)
            scratch.layer3_rn = nn.Conv2d(d, f, 3, padding=1, bias=False)
            scratch.layer4_rn = nn.Conv2d(d, f, 3, padding=1, bias=False)
            scratch.refinenet1 = TFusion(f)
            scratch.refinenet2 = TFusion(f)
            scratch.refinenet3 = TFusion(f)
            scratch.refinenet4 = TFusion(f)
            scratch.output_conv = nn.Sequential(
                nn.Conv2d(f, f // 2, 3, padding=1), nn.Identity(),
                nn.Conv2d(f // 2, 32, 3, padding=1), nn.ReLU(),
                nn.Conv2d(32, 1, 1), nn.ReLU(),
            )
            self.scratch = scratch

        def forward(self, x):
            m = self.pretrained.model
            b, _, H, W = x.shape
            gh, gw = H // 16, W // 16
            # backbone
            h = m.patch_embed.backbone.stem.conv(x)
            h = F.relu(m.patch_embed.backbone.stem.norm(h))
            h = F.max_pool2d(h, 3, 2, padding=1)
            feats = []
            for st in m.patch_embed.backbone.stages:
                for blk in st.blocks:
                    h = blk(h)
                feats.append(h)
            s0, s1, s2 = feats
            tokens = m.patch_embed.proj(s2).flatten(2).transpose(1, 2)
            # pos-embed resize (vit.py:100-115)
            pe_tok = m.pos_embed[:, :1]
            pe_grid = m.pos_embed[0, 1:].reshape(1, _T_GRID, _T_GRID, -1)
            pe_grid = F.interpolate(
                pe_grid.permute(0, 3, 1, 2), size=(gh, gw), mode="bilinear"
            )
            pe_grid = pe_grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
            tokens = torch.cat([m.cls_token.expand(b, -1, -1), tokens], dim=1)
            tokens = tokens + torch.cat([pe_tok, pe_grid], dim=1)
            hooked = {}
            t = tokens
            for i, blk in enumerate(m.blocks):
                t = blk(t)
                if i in _T_HOOKS:
                    hooked[i] = t
            _ = m.norm(t)  # hooks fire pre-norm (vit.py:195-198)

            def unflatten(t):
                return t.transpose(1, 2).reshape(b, -1, gh, gw)

            pp3, pp4 = self.pretrained.act_postprocess3, self.pretrained.act_postprocess4
            l3 = pp3[3](unflatten(pp3[0](hooked[_T_HOOKS[0]])))
            l4 = pp4[4](pp4[3](unflatten(pp4[0](hooked[_T_HOOKS[1]]))))

            sc = self.scratch
            r1, r2 = sc.layer1_rn(s0), sc.layer2_rn(s1)
            r3, r4 = sc.layer3_rn(l3), sc.layer4_rn(l4)
            p4 = sc.refinenet4(r4)
            p3 = sc.refinenet3(p4, r3)
            p2 = sc.refinenet2(p3, r2)
            p1 = sc.refinenet1(p2, r1)
            oc = sc.output_conv
            h = oc[0](p1)
            h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
            h = F.relu(oc[2](h))
            h = F.relu(oc[4](h))
            return h[:, 0]

    return TDPT().eval()


@pytest.mark.slow
def test_dpt_forward_parity_vs_torch_mini(rng):
    torch = pytest.importorskip("torch")
    tm = _build_torch_dpt()
    sd = {k: v for k, v in tm.state_dict().items()}
    tree = convert_dpt_hybrid(sd, stem_depths=_T_DEPTHS, vit_depth=_T_VIT_DEPTH)

    model = DPTHybridDepth(
        vit_dim=_T_DIM, vit_depth=_T_VIT_DEPTH, hooks=_T_HOOKS,
        features=_T_FEATURES, grid_size_train=_T_GRID,
        stem_widths=_T_WIDTHS, stem_depths=_T_DEPTHS,
    )
    x = torch.rand(2, 3, 96, 96) * 2 - 1  # grid 6x6 exercises pos-embed resize
    with torch.no_grad():
        want = tm(x).numpy()
    got = model.apply(
        {"params": tree}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=5e-4)
