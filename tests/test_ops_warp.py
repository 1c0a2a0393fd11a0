"""Golden tests for warp/resize ops against torch (CPU) semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from fresco_tpu.ops.warp import (  # noqa: E402
    bilinear_sample,
    coords_grid,
    flow_warp,
    forward_backward_consistency,
)
from fresco_tpu.ops.resize import resize_bilinear, max_pool2d  # noqa: E402


def _torch_flow_warp(feature_nchw, flow_2chw):
    b, c, h, w = feature_nchw.shape
    ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack([xs, ys], dim=0).float()[None] + flow_2chw
    x_grid = 2 * grid[:, 0] / (w - 1) - 1
    y_grid = 2 * grid[:, 1] / (h - 1) - 1
    g = torch.stack([x_grid, y_grid], dim=-1)
    return TF.grid_sample(
        feature_nchw, g, mode="bilinear", padding_mode="zeros", align_corners=True
    )


def test_flow_warp_matches_torch_grid_sample(rng):
    b, h, w, c = 2, 13, 17, 3
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 3).astype(np.float32)

    ours = np.asarray(flow_warp(jnp.asarray(feat), jnp.asarray(flow)))
    theirs = (
        _torch_flow_warp(
            torch.from_numpy(feat).permute(0, 3, 1, 2),
            torch.from_numpy(flow).permute(0, 3, 1, 2),
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_bilinear_sample_border_mode(rng):
    b, h, w, c = 1, 8, 8, 2
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (rng.uniform(-3, 11, (b, 5, 6, 2))).astype(np.float32)
    ours = np.asarray(
        bilinear_sample(jnp.asarray(feat), jnp.asarray(coords), padding_mode="border")
    )
    x_grid = 2 * coords[..., 0] / (w - 1) - 1
    y_grid = 2 * coords[..., 1] / (h - 1) - 1
    g = torch.from_numpy(np.stack([x_grid, y_grid], axis=-1))
    theirs = (
        TF.grid_sample(
            torch.from_numpy(feat).permute(0, 3, 1, 2),
            g,
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_identity_flow_is_identity(rng):
    feat = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
    out = np.asarray(flow_warp(jnp.asarray(feat), jnp.zeros((1, 6, 7, 2))))
    np.testing.assert_allclose(out, feat, atol=1e-6)


def test_fb_consistency_matches_torch_reference(rng):
    """Against a direct torch implementation of UnFlow's check
    (reference geometry.py:76-97 semantics)."""
    b, h, w = 2, 12, 10
    fwd = (rng.standard_normal((b, h, w, 2)) * 2).astype(np.float32)
    bwd = (rng.standard_normal((b, h, w, 2)) * 2).astype(np.float32)

    fwd_occ, bwd_occ = forward_backward_consistency(jnp.asarray(fwd), jnp.asarray(bwd))

    tf_fwd = torch.from_numpy(fwd).permute(0, 3, 1, 2)
    tf_bwd = torch.from_numpy(bwd).permute(0, 3, 1, 2)
    flow_mag = torch.norm(tf_fwd, dim=1) + torch.norm(tf_bwd, dim=1)
    warped_bwd = _torch_flow_warp(tf_bwd, tf_fwd)
    warped_fwd = _torch_flow_warp(tf_fwd, tf_bwd)
    diff_fwd = torch.norm(tf_fwd + warped_bwd, dim=1)
    diff_bwd = torch.norm(tf_bwd + warped_fwd, dim=1)
    thr = 0.01 * flow_mag + 0.5
    np.testing.assert_array_equal(
        np.asarray(fwd_occ), (diff_fwd > thr).float().numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(bwd_occ), (diff_bwd > thr).float().numpy()
    )


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("out_hw", [(7, 9), (24, 40), (6, 6)])
def test_resize_bilinear_matches_torch(rng, align_corners, out_hw):
    x = rng.standard_normal((2, 12, 20, 3)).astype(np.float32)
    ours = np.asarray(
        resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners)
    )
    theirs = (
        TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=align_corners,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    ours = np.asarray(max_pool2d(jnp.asarray(x), 4))
    theirs = (
        TF.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 4)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_coords_grid_channels():
    g = np.asarray(coords_grid(3, 4))
    assert g.shape == (3, 4, 2)
    np.testing.assert_array_equal(g[..., 0], np.tile(np.arange(4), (3, 1)))
    np.testing.assert_array_equal(g[..., 1], np.tile(np.arange(3)[:, None], (1, 4)))
