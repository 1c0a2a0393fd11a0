"""Golden tests for the SD-family checkpoint converters.

The reference loads SD1.5/ControlNet/VAE through diffusers
(reference run_fresco.py:59-89); diffusers is not installed here, so these
tests build *torch mini-models* whose module names replicate the diffusers
checkpoint layout exactly (the technique of tests/test_midas.py).  Their
``state_dict()`` is fed through convert_unet/convert_vae/convert_controlnet
and the converted Flax model must match the torch forward numerically —
catching key-mapping, transpose, and scaling regressions end to end.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from fresco_tpu.models.convert import (
    convert_controlnet,
    convert_unet,
    convert_vae,
)
from fresco_tpu.models.controlnet import ControlNet
from fresco_tpu.models.unet import UNet2DCondition, UNetConfig
from fresco_tpu.models.vae import AutoencoderKL, VAEConfig

UCFG = UNetConfig.tiny()       # blocks (8,16), 1 layer, ctx 16, heads 2, g 4
VCFG = VAEConfig.tiny()        # blocks (8,8,16,16), 1 layer, g 4
COND_EMBED = (4, 4, 8, 8)

# Full SD1.5 topology at reduced width (VERDICT r3 missing #5): the REAL
# key patterns — 4 down blocks with the last attention-free
# (CrossAttnDownBlock2D x3 + DownBlock2D), layers_per_block=2, the
# repeated last width (320,640,1280,1280 -> 8,16,32,32) and its up-block
# skip-channel schedule, 77-token context — so the first real-checkpoint
# load (reference run_fresco.py:59-89) exercises no unseen pattern.
FULL_UCFG = UNetConfig(
    block_out_channels=(8, 16, 32, 32),
    layers_per_block=2,
    cross_attention_dim=24,
    attention_heads=2,
    norm_groups=4,
    fresco_up_blocks=(2, 3),
)
FULL_VCFG = VAEConfig(
    block_out_channels=(8, 16, 32, 32), layers_per_block=2, norm_groups=4
)
FULL_COND_EMBED = (4, 8, 16, 32)   # real (16,32,96,256) shape-pattern


def t_timestep_embedding(t, dim):
    """diffusers get_timestep_embedding (flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TResnet(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TAttention(nn.Module):
    def __init__(self, c, heads, ctx_dim):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(c, c, bias=False)
        self.to_k = nn.Linear(ctx_dim, c, bias=False)
        self.to_v = nn.Linear(ctx_dim, c, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, c = x.shape
        h = self.heads
        q = self.to_q(x).view(b, s, h, c // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, c)
        return self.to_out[0](o)


class TGEGLU(nn.Module):
    def __init__(self, c, inner):
        super().__init__()
        self.proj = nn.Linear(c, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.net = nn.ModuleList(
            [TGEGLU(c, c * 4), nn.Identity(), nn.Linear(c * 4, c)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasicBlock(nn.Module):
    def __init__(self, c, heads, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.attn1 = TAttention(c, heads, c)
        self.norm2 = nn.LayerNorm(c)
        self.attn2 = TAttention(c, heads, ctx_dim)
        self.norm3 = nn.LayerNorm(c)
        self.ff = TFeedForward(c)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class TTransformer2D(nn.Module):
    def __init__(self, c, heads, ctx_dim, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList([TBasicBlock(c, heads, ctx_dim)])
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.transformer_blocks[0](y, ctx)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return res + self.proj_out(y)


class TDownsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUpsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TDownBlock(nn.Module):
    def __init__(self, cin, cout, temb, groups, heads, ctx, n, attn, down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout, temb, groups) for j in range(n)]
        )
        if attn:
            self.attentions = nn.ModuleList(
                [TTransformer2D(cout, heads, ctx, groups) for _ in range(n)]
            )
        if down:
            self.downsamplers = nn.ModuleList([TDownsample(cout)])


class TMidBlock(nn.Module):
    def __init__(self, c, temb, groups, heads, ctx):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(c, c, temb, groups), TResnet(c, c, temb, groups)]
        )
        self.attentions = nn.ModuleList([TTransformer2D(c, heads, ctx, groups)])

    def forward(self, h, temb, ctx):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h, ctx)
        return self.resnets[1](h, temb)


class TUpBlock(nn.Module):
    def __init__(self, in_chs, cout, temb, groups, heads, ctx, attn, up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin, cout, temb, groups) for cin in in_chs]
        )
        if attn:
            self.attentions = nn.ModuleList(
                [TTransformer2D(cout, heads, ctx, groups) for _ in in_chs]
            )
        if up:
            self.upsamplers = nn.ModuleList([TUpsample(cout)])


class TTimeEmbedding(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = nn.Linear(cin, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, emb):
        return self.linear_2(F.silu(self.linear_1(emb)))


def _build_encoder_modules(m: nn.Module, cfg: UNetConfig):
    """Shared torch encoder structure for UNet + ControlNet minis."""
    chans = cfg.block_out_channels
    temb = chans[0] * 4
    g, heads, ctx, n = cfg.norm_groups, cfg.attention_heads, cfg.cross_attention_dim, cfg.layers_per_block
    m.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
    m.time_embedding = TTimeEmbedding(chans[0], temb)
    m.down_blocks = nn.ModuleList()
    cin = chans[0]
    for i, ch in enumerate(chans):
        last = i == len(chans) - 1
        m.down_blocks.append(
            TDownBlock(cin, ch, temb, g, heads, ctx, n, attn=not last, down=not last)
        )
        cin = ch
    m.mid_block = TMidBlock(chans[-1], temb, g, heads, ctx)


def _encoder_forward(m: nn.Module, cfg: UNetConfig, sample, t, ctx):
    chans = cfg.block_out_channels
    temb = m.time_embedding(t_timestep_embedding(t, chans[0]))
    h = m.conv_in(sample)
    skips = [h]
    for i, blk in enumerate(m.down_blocks):
        last = i == len(chans) - 1
        for j, res in enumerate(blk.resnets):
            h = res(h, temb)
            if not last:
                h = blk.attentions[j](h, ctx)
            skips.append(h)
        if not last:
            h = blk.downsamplers[0](h)
            skips.append(h)
    h = m.mid_block(h, temb, ctx)
    return h, skips, temb


class TUNet(nn.Module):
    """diffusers-layout UNet2DConditionModel mini (tiny config)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        _build_encoder_modules(self, cfg)
        chans = cfg.block_out_channels
        temb = chans[0] * 4
        g, heads, ctx, n = cfg.norm_groups, cfg.attention_heads, cfg.cross_attention_dim, cfg.layers_per_block

        # mirror the flax up-block skip-channel arithmetic
        skip_chs = [chans[0]]
        for i, ch in enumerate(chans):
            skip_chs += [ch] * n
            if i < len(chans) - 1:
                skip_chs.append(ch)
        rev = list(reversed(chans))
        self.up_blocks = nn.ModuleList()
        hch = chans[-1]
        for i, ch in enumerate(rev):
            in_chs = []
            for j in range(n + 1):
                in_chs.append(hch + skip_chs.pop())
                hch = ch
            self.up_blocks.append(
                TUpBlock(in_chs, ch, temb, g, heads, ctx,
                         attn=i > 0, up=i < len(rev) - 1)
            )
        self.conv_norm_out = nn.GroupNorm(g, chans[0])
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, t, ctx):
        h, skips, temb = _encoder_forward(self, self.cfg, sample, t, ctx)
        for i, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(torch.cat([h, skips.pop()], dim=1), temb)
                if i > 0:
                    h = blk.attentions[j](h, ctx)
            if i < len(self.up_blocks) - 1:
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TCondEmbedding(nn.Module):
    def __init__(self, out_ch, block_channels):
        super().__init__()
        self.conv_in = nn.Conv2d(3, block_channels[0], 3, padding=1)
        blocks = []
        for i in range(len(block_channels) - 1):
            blocks.append(nn.Conv2d(block_channels[i], block_channels[i], 3, padding=1))
            blocks.append(
                nn.Conv2d(block_channels[i], block_channels[i + 1], 3, padding=1, stride=2)
            )
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(block_channels[-1], out_ch, 3, padding=1)

    def forward(self, x):
        h = F.silu(self.conv_in(x))
        for b in self.blocks:
            h = F.silu(b(h))
        return self.conv_out(h)


class TControlNet(nn.Module):
    def __init__(self, cfg: UNetConfig, cond_channels):
        super().__init__()
        self.cfg = cfg
        _build_encoder_modules(self, cfg)
        chans = cfg.block_out_channels
        self.controlnet_cond_embedding = TCondEmbedding(chans[0], cond_channels)
        skip_chs = [chans[0]]
        for i, ch in enumerate(chans):
            skip_chs += [ch] * cfg.layers_per_block
            if i < len(chans) - 1:
                skip_chs.append(ch)
        self.controlnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in skip_chs]
        )
        self.controlnet_mid_block = nn.Conv2d(chans[-1], chans[-1], 1)

    def forward(self, sample, t, ctx, cond, scale):
        chans = self.cfg.block_out_channels
        temb = self.time_embedding(t_timestep_embedding(t, chans[0]))
        h = self.conv_in(sample) + self.controlnet_cond_embedding(cond)
        residuals = [h]
        for i, blk in enumerate(self.down_blocks):
            last = i == len(chans) - 1
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if not last:
                    h = blk.attentions[j](h, ctx)
                residuals.append(h)
            if not last:
                h = blk.downsamplers[0](h)
                residuals.append(h)
        h = self.mid_block(h, temb, ctx)
        down = [z(r) * scale for z, r in zip(self.controlnet_down_blocks, residuals)]
        return down, self.controlnet_mid_block(h) * scale


# ---------------------------------------------------------------- VAE minis
class TVAEResnet(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TVAEAttention(nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        att = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        o = self.to_out[0](att @ v)
        return x + o.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TVAEDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TVAEBlock(nn.Module):
    def __init__(self, cin, cout, groups, n, down=False, up=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TVAEResnet(cin if j == 0 else cout, cout, groups) for j in range(n)]
        )
        if down:
            self.downsamplers = nn.ModuleList([TVAEDown(cout)])
        if up:
            self.upsamplers = nn.ModuleList([TUpsample(cout)])


class TVAEMid(nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TVAEResnet(c, c, groups), TVAEResnet(c, c, groups)]
        )
        self.attentions = nn.ModuleList([TVAEAttention(c, groups)])

    def forward(self, h):
        return self.resnets[1](self.attentions[0](self.resnets[0](h)))


class TEncoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        chans = cfg.block_out_channels
        g, n = cfg.norm_groups, cfg.layers_per_block
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            self.down_blocks.append(
                TVAEBlock(cin, ch, g, n, down=i < len(chans) - 1)
            )
            cin = ch
        self.mid_block = TVAEMid(chans[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for i, blk in enumerate(self.down_blocks):
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TDecoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        chans = list(reversed(cfg.block_out_channels))
        g, n = cfg.norm_groups, cfg.layers_per_block + 1
        self.conv_in = nn.Conv2d(cfg.latent_channels, chans[0], 3, padding=1)
        self.mid_block = TVAEMid(chans[0], g)
        self.up_blocks = nn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            self.up_blocks.append(TVAEBlock(cin, ch, g, n, up=i < len(chans) - 1))
            cin = ch
        self.conv_norm_out = nn.GroupNorm(g, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], cfg.in_channels, 3, padding=1)

    def forward(self, z):
        h = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAE(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)


# -------------------------------------------------------------------- tests
def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw_np(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.fixture(autouse=True)
def _torch_seed():
    torch.manual_seed(0)


@pytest.mark.parametrize(
    "cfg,tokens", [(UCFG, 7), (FULL_UCFG, 77)], ids=["tiny", "full-topo"]
)
def test_convert_unet_full_forward_parity(cfg, tokens):
    tm = TUNet(cfg).eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    # strict=True + shape-tree equality with init = bijection: every
    # torch key consumed AND every flax param filled at the init shape
    params = {"params": convert_unet(sd, cfg, strict=True)}

    res = 8 * 2 ** (len(cfg.block_out_channels) - 2)
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    # structure/shape agreement with init
    ref = unet.init(
        jax.random.key(0), jnp.zeros((1, res, res, 4)), jnp.int32(0),
        jnp.zeros((1, tokens, cfg.cross_attention_dim)),
    )
    conv_shapes = jax.tree_util.tree_map(jnp.shape, params)
    init_shapes = jax.tree_util.tree_map(jnp.shape, ref)
    assert conv_shapes == init_shapes

    x = torch.randn(2, 4, res, res)
    ctx = torch.randn(2, tokens, cfg.cross_attention_dim)
    t = torch.tensor([301, 301])
    with torch.no_grad():
        want = tm(x, t, ctx).numpy()
    got = unet.apply(params, _nhwc(x), jnp.int32(301), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(_nchw_np(got), want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize(
    "cfg,cond_embed,tokens",
    [(UCFG, COND_EMBED, 7), (FULL_UCFG, FULL_COND_EMBED, 77)],
    ids=["tiny", "full-topo"],
)
def test_convert_controlnet_full_forward_parity(cfg, cond_embed, tokens):
    tm = TControlNet(cfg, cond_embed).eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    params = {"params": convert_controlnet(sd, cfg, strict=True)}

    res = 8 * 2 ** (len(cfg.block_out_channels) - 2)
    cnet = ControlNet(cfg, dtype=jnp.float32, cond_embed_channels=cond_embed)
    ref = cnet.init(
        jax.random.key(0), jnp.zeros((1, res, res, 4)), jnp.int32(0),
        jnp.zeros((1, tokens, cfg.cross_attention_dim)),
        jnp.zeros((1, 8 * res, 8 * res, 3)),
    )
    assert jax.tree_util.tree_map(jnp.shape, params) == jax.tree_util.tree_map(
        jnp.shape, ref
    )

    x = torch.randn(2, 4, res, res)
    ctx = torch.randn(2, tokens, cfg.cross_attention_dim)
    cond = torch.rand(2, 3, 8 * res, 8 * res)
    t = torch.tensor([123, 123])
    with torch.no_grad():
        want_down, want_mid = tm(x, t, ctx, cond, 0.7)
    got_down, got_mid = cnet.apply(
        params, _nhwc(x), jnp.int32(123), jnp.asarray(ctx.numpy()), _nhwc(cond), 0.7
    )
    assert len(got_down) == len(want_down)
    for g, w in zip(got_down, want_down):
        np.testing.assert_allclose(_nchw_np(g), w.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(_nchw_np(got_mid), want_mid.numpy(), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize(
    "vcfg", [VCFG, FULL_VCFG], ids=["tiny", "full-topo"]
)
def test_convert_vae_full_forward_parity(vcfg):
    tm = TVAE(vcfg).eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    params = {"params": convert_vae(sd, vcfg, strict=True)}

    vae = AutoencoderKL(vcfg, dtype=jnp.float32)
    ref = vae.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    assert jax.tree_util.tree_map(jnp.shape, params) == jax.tree_util.tree_map(
        jnp.shape, ref
    )

    x = torch.rand(2, 3, 32, 32) * 2 - 1
    with torch.no_grad():
        want_moments = tm.quant_conv(tm.encoder(x)).numpy()
    mean, logvar = vae.apply(params, _nhwc(x), method=vae.encode_moments)
    got = np.concatenate([_nchw_np(mean), _nchw_np(logvar)], axis=1)
    want_mean, want_logvar = np.split(want_moments, 2, axis=1)
    want = np.concatenate(
        [want_mean, np.clip(want_logvar, -30.0, 20.0)], axis=1
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    z = torch.randn(2, 4, 4, 4)
    with torch.no_grad():
        want_img = tm.decoder(tm.post_quant_conv(z)).numpy()
    got_img = vae.apply(
        params, jnp.asarray(_nhwc(z)) * vcfg.scaling_factor, method=vae.decode
    )
    np.testing.assert_allclose(_nchw_np(got_img), want_img, atol=2e-4, rtol=2e-4)
