"""Optical-flow warping and consistency ops (NHWC, TPU-friendly).

Equivalents of the reference's gmflow geometry helpers
(reference src/ebsynth/deps/gmflow/gmflow/geometry.py:5-97), re-designed
for NHWC layout and XLA: the bilinear sampler is expressed as four
clipped gathers + masked lerp (vectorizes onto the VPU; no
data-dependent shapes), matching ``torch.nn.functional.grid_sample``
with ``align_corners=True, padding_mode='zeros'`` bit-for-bit in fp32.

Conventions:
  * features: [B, H, W, C]
  * flow:     [B, H, W, 2], channels (dx, dy)
  * occlusion: [B, H, W] float, 1 == occluded
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinate grid [H, W, 2] with channels (x, y)."""
    y = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    x = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return jnp.stack([x, y], axis=-1)


def bilinear_sample(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    *,
    padding_mode: str = "zeros",
    return_mask: bool = False,
):
    """Sample ``img`` [B,H,W,C] at pixel coordinates ``coords`` [B,h,w,2] (x,y).

    Matches torch grid_sample(align_corners=True) semantics after the
    reference's pixel->[-1,1] normalization (geometry.py:41-60): i.e.
    coordinates are in *pixel* units of the input image.
    """
    b, h_in, w_in, c = img.shape
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        in_bounds = (xi >= 0) & (xi <= w_in - 1) & (yi >= 0) & (yi <= h_in - 1)
        xc = jnp.clip(xi, 0, w_in - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h_in - 1).astype(jnp.int32)
        # flat gather over H*W keeps a single gather op per corner
        flat = img.reshape(b, h_in * w_in, c)
        idx = yc * w_in + xc  # [B, h, w]
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        if padding_mode == "zeros":
            vals = vals * in_bounds[..., None].astype(img.dtype)
        elif padding_mode == "border":
            pass  # clipped gather already replicates the border
        else:
            raise ValueError(padding_mode)
        return vals

    out = (
        gather(y0, x0) * (wx0 * wy0)[..., None]
        + gather(y0, x1) * (wx1 * wy0)[..., None]
        + gather(y1, x0) * (wx0 * wy1)[..., None]
        + gather(y1, x1) * (wx1 * wy1)[..., None]
    ).astype(img.dtype)

    if return_mask:
        mask = (x >= 0) & (x <= w_in - 1) & (y >= 0) & (y <= h_in - 1)
        return out, mask
    return out


def flow_warp(
    feature: jnp.ndarray,
    flow: jnp.ndarray,
    *,
    padding_mode: str = "zeros",
    return_mask: bool = False,
):
    """Backward-warp ``feature`` [B,H,W,C] by ``flow`` [B,H,W,2].

    out[p] = feature[p + flow[p]] — equivalent of reference
    geometry.py:66-73.
    """
    b, h, w, _ = feature.shape
    grid = coords_grid(h, w, flow.dtype)[None] + flow
    return bilinear_sample(
        feature, grid, padding_mode=padding_mode, return_mask=return_mask
    )


def forward_backward_consistency(
    fwd_flow: jnp.ndarray,
    bwd_flow: jnp.ndarray,
    alpha: float = 0.01,
    beta: float = 0.5,
):
    """UnFlow forward-backward consistency occlusion masks.

    Equivalent of reference geometry.py:76-97.  Returns (fwd_occ, bwd_occ)
    as float [B, H, W] with 1 == occluded.
    """
    def _norm(f):
        return jnp.sqrt(jnp.sum(f * f, axis=-1))

    flow_mag = _norm(fwd_flow) + _norm(bwd_flow)
    warped_bwd = flow_warp(bwd_flow, fwd_flow)
    warped_fwd = flow_warp(fwd_flow, bwd_flow)
    diff_fwd = _norm(fwd_flow + warped_bwd)
    diff_bwd = _norm(bwd_flow + warped_fwd)
    threshold = alpha * flow_mag + beta
    fwd_occ = (diff_fwd > threshold).astype(fwd_flow.dtype)
    bwd_occ = (diff_bwd > threshold).astype(bwd_flow.dtype)
    return fwd_occ, bwd_occ
