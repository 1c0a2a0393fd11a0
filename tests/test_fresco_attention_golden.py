"""Golden parity of the FRESCO attention variants against the reference's
actual FRESCOAttnProcessor2_0 (src/diffusion_hacked.py:142-387), imported
read-only with diffusers stubbed out, driven through a minimal torch
Attention mock with shared random weights."""
import pathlib
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fresco_tpu.attention.fresco_attention import (  # noqa: E402
    FrescoAttnParams,
    fresco_self_attention,
)

REFERENCE = pathlib.Path("/root/reference")


def _import_reference_processor():
    if not REFERENCE.exists():
        pytest.skip("reference not mounted")
    # stub the diffusers imports the module needs (read-only study import)
    diffusers = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    unet_mod = types.ModuleType("diffusers.models.unet_2d_condition")
    unet_mod.UNet2DConditionOutput = object
    attn_mod = types.ModuleType("diffusers.models.attention_processor")
    attn_mod.AttnProcessor2_0 = object
    sys.modules.setdefault("diffusers", diffusers)
    sys.modules.setdefault("diffusers.models", models)
    sys.modules.setdefault("diffusers.models.unet_2d_condition", unet_mod)
    sys.modules.setdefault("diffusers.models.attention_processor", attn_mod)
    for p in (str(REFERENCE), str(REFERENCE / "src/ebsynth/deps/gmflow")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    return importlib.import_module("src.diffusion_hacked")


class _MockAttention(torch.nn.Module):
    """Just enough of diffusers' Attention for the processor."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = torch.nn.Linear(dim, dim, bias=False)
        self.to_k = torch.nn.Linear(dim, dim, bias=False)
        self.to_v = torch.nn.Linear(dim, dim, bias=False)
        self.to_out = torch.nn.ModuleList(
            [torch.nn.Linear(dim, dim), torch.nn.Identity()]
        )
        self.spatial_norm = None
        self.group_norm = None
        self.norm_cross = False
        self.residual_connection = False
        self.rescale_output_factor = 1.0


def _wrap_dense(w, b=None):
    class D:
        def __init__(s):
            s.kernel = w

        def __call__(s, x):
            out = x @ jnp.asarray(w)
            if b is not None:
                out = out + jnp.asarray(b)
            return out

    return D()


@pytest.fixture(scope="module")
def setup():
    dh = _import_reference_processor()
    torch.manual_seed(0)
    dim, heads, f, hw = 16, 2, 3, 8
    attn = _MockAttention(dim, heads).eval()
    proc = dh.FRESCOAttnProcessor2_0(2, dh.AttentionControl())

    wq = attn.to_q.weight.detach().numpy().T
    wk = attn.to_k.weight.detach().numpy().T
    wv = attn.to_v.weight.detach().numpy().T
    wo = attn.to_out[0].weight.detach().numpy().T
    bo = attn.to_out[0].bias.detach().numpy()
    mine = dict(
        wq=_wrap_dense(wq), wk=_wrap_dense(wk), wv=_wrap_dense(wv),
        wo=_wrap_dense(wo, bo),
    )
    return dh, attn, proc, mine, (dim, heads, f, hw)


def _run_mine(x, mine, heads, fresco):
    return np.asarray(
        fresco_self_attention(
            jnp.asarray(x), mine["wq"], mine["wk"], mine["wv"], mine["wo"],
            heads, fresco, 0,
        )
    )


def test_cross_frame_attention_matches_reference(setup, rng):
    dh, attn, proc, mine, (dim, heads, f, hw) = setup
    x = rng.standard_normal((2 * f, hw, dim)).astype(np.float32)
    mask_np = rng.uniform(0, 1, (f, hw)) > 0.4
    mask_np[0] = True

    proc.controller.disable_controller()
    proc.controller.attn_mask = None
    proc.controller.enable_cfattn([torch.from_numpy(mask_np)])
    with torch.no_grad():
        ref = proc(attn, torch.from_numpy(x)).numpy()

    fresco = FrescoAttnParams(
        cf_masks={hw: jnp.asarray(mask_np)}, chunk=2,
        use_intra=jnp.array(False), use_inter=jnp.array(False),
    )
    out = _run_mine(x, mine, heads, fresco)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_cross_frame_maskless_matches_reference(setup, rng):
    """Maskless mode: K/V from frame 0 only (diffusion_hacked.py:236-244)."""
    dh, attn, proc, mine, (dim, heads, f, hw) = setup
    x = rng.standard_normal((2 * f, hw, dim)).astype(np.float32)

    proc.controller.disable_controller()
    proc.controller.attn_mask = None
    proc.controller.use_cfattn = True
    with torch.no_grad():
        ref = proc(attn, torch.from_numpy(x)).numpy()

    # my API: an entry with None mask means frame-0-only keys
    fresco = FrescoAttnParams(
        cf_masks={hw: None}, chunk=2,
        use_intra=jnp.array(False), use_inter=jnp.array(False),
    )
    out = _run_mine(x, mine, heads, fresco)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_spatial_guided_matches_reference(setup, rng):
    dh, attn, proc, mine, (dim, heads, f, hw) = setup
    x = rng.standard_normal((2 * f, hw, dim)).astype(np.float32)
    ref_feat = rng.standard_normal((2 * f, hw, dim)).astype(np.float32)

    proc.controller.disable_controller()
    proc.controller.clear_store()
    proc.controller.enable_store()
    with torch.no_grad():
        proc(attn, torch.from_numpy(ref_feat))  # store pass
    proc.controller.disable_store()
    proc.controller.enable_intraattn()
    proc.controller.attn_mask = None
    proc.controller.use_cfattn = False
    with torch.no_grad():
        ref = proc(attn, torch.from_numpy(x)).numpy()

    # my side: spatial-guided + plain self-attention (no cf): emulate the
    # reference's "intra without cf" by a full self-mask per frame
    from fresco_tpu.attention.flash import naive_attention
    from fresco_tpu.attention.fresco_attention import (
        spatial_guided_query, _split_heads, _merge_heads,
    )

    q = mine["wq"](jnp.asarray(x))
    k = mine["wk"](jnp.asarray(x))
    v = mine["wv"](jnp.asarray(x))
    rq = mine["wq"](jnp.asarray(ref_feat))
    rk = mine["wk"](jnp.asarray(ref_feat))
    q2 = spatial_guided_query(q, rq, rk, heads, 0.2)
    out = naive_attention(
        _split_heads(q2, heads), _split_heads(k, heads), _split_heads(v, heads)
    )
    out = np.asarray(mine["wo"](_merge_heads(out)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_trajectory_attention_matches_reference(setup, rng):
    dh, attn, proc, mine, (dim, heads, f, hw) = setup
    x = rng.standard_normal((2 * f, hw, dim)).astype(np.float32)

    # random permutation trajectories + random mask
    fwd = np.stack([rng.permutation(hw) for _ in range(f)]).astype(np.int64)
    bwd = np.stack([np.argsort(m) for m in fwd]).astype(np.int64)
    tmask = rng.uniform(0, 1, (hw, f, f)) > 0.3
    tmask |= np.eye(f, dtype=bool)[None]

    proc.controller.disable_controller()
    proc.controller.enable_interattn(
        {
            "fwd_mappings": [torch.from_numpy(fwd)[:, None, :]],
            "bwd_mappings": [torch.from_numpy(bwd)[:, None, :]],
            "interattn_masks": [torch.from_numpy(tmask)[:, None]],
        }
    )
    proc.controller.attn_mask = None
    proc.controller.use_cfattn = False
    with torch.no_grad():
        ref = proc(attn, torch.from_numpy(x)).numpy()

    fresco = FrescoAttnParams(
        cf_masks=None,
        trajectories={
            hw: (
                jnp.asarray(fwd, jnp.int32),
                jnp.asarray(bwd, jnp.int32),
                jnp.asarray(tmask),
            )
        },
        chunk=2,
        use_intra=jnp.array(False),
        use_inter=jnp.array(True),
    )
    # no cf: plain self-attention then trajectory; my fresco_self_attention
    # with cf_masks=None does plain attention for the main pass
    out = _run_mine(x, mine, heads, fresco)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
