"""Background smoothing: flow-warp fusion of the non-salient region.

Equivalent of reference src/flow_utils.py:18-53 ``warp_tensor``: chain-warp
each frame's feature/image into the next and blend in the background
(non-salient ∧ non-occluded) region; finally warp frame-0 into the last
frame via the wraparound forward flow.  The chain is sequential over
frames by construction (frame i+1 consumes the *already fused* frame i),
but the batch is ≤8 frames so it unrolls into a short static chain of
fused warp+lerp ops.

Layouts: sample [B,Hs,Ws,C] with B = chunk*N (CFG chunking),
flows ([N,H,W,2] fwd, [N,H,W,2] bwd) where entry i connects frame i and
frame (i+1) % N (the reference's roll-by-one pairing,
diffusion_hacked.py:914-917); occs similarly [N,H,W]; saliency [N,h,w,1]
*background* mask (1 == background).
"""
from __future__ import annotations

import jax.numpy as jnp

from fresco_tpu.ops.warp import flow_warp
from fresco_tpu.ops.resize import resize_bilinear, max_pool2d
from fresco_tpu.ops.morphology import dilate


# Reference flow_utils.py:28-33: Dilate(kernel_size=13) on the
# full-resolution occlusion.  Module constant rather than a per-call
# magic number (CLAUDE.md convention); override via the parameter.
FULL_RES_OCC_DILATE = 13


def prepare_flow_for_scale(flow, occ, target_hw, *, dilate_full_res: bool = True,
                           dilate_kernel: int = FULL_RES_OCC_DILATE):
    """Rescale a full-res flow/occlusion pair to a feature resolution.

    flow: [N,H,W,2] -> [N,h,w,2] (values scaled); occ: [N,H,W] -> [N,h,w,1]
    via max-pool (occlusion is sticky).  At scale 1 the occlusion gets a
    ``dilate_kernel`` dilation instead (flow_utils.py:28-33).
    """
    H = flow.shape[1]
    h, w = target_hw
    scale = h / H
    if scale == 1.0:
        occ_s = occ[..., None]
        if dilate_full_res:
            occ_s = dilate(occ_s, dilate_kernel)
        return flow, occ_s
    kernel = int(round(1.0 / scale))
    flow_s = resize_bilinear(flow * scale, (h, w))
    occ_s = max_pool2d(occ[..., None], kernel)
    return flow_s, occ_s


def warp_and_fuse(
    sample: jnp.ndarray,
    fwd_flow: jnp.ndarray,
    bwd_flow: jnp.ndarray,
    fwd_occ: jnp.ndarray,
    bwd_occ: jnp.ndarray,
    saliency: jnp.ndarray,
    chunk: int = 2,
) -> jnp.ndarray:
    """Fuse the background region of consecutive frames by flow warping.

    Equivalent of reference flow_utils.py:18-53 (warp_tensor).  ``saliency``
    here is the *background* mask at any resolution ([N,hs,ws,1]); flows
    at full video resolution.
    """
    n = sample.shape[0] // chunk
    h, w = sample.shape[1:3]
    bwd_flow_s, bwd_occ_s = prepare_flow_for_scale(bwd_flow, bwd_occ, (h, w))
    fwd_flow_s, fwd_occ_s = prepare_flow_for_scale(fwd_flow, fwd_occ, (h, w))
    wd = jnp.promote_types(sample.dtype, jnp.float32)
    sal = resize_bilinear(saliency, (h, w)).astype(wd)

    warp_sal = flow_warp(sal, bwd_flow_s)  # [N,h,w,1]
    warp_sal_wrap = flow_warp(sal[0:1], fwd_flow_s[n - 1 : n])  # [1,h,w,1]

    latent = sample.astype(wd)
    frames = [latent[i] for i in range(latent.shape[0])]
    for j in range(chunk):
        for ii in range(n - 1):
            i = n * j + ii
            warped = flow_warp(frames[i][None], bwd_flow_s[ii : ii + 1])[0]
            m = (1.0 - bwd_occ_s[ii]) * sal[ii + 1] * warp_sal[ii]
            frames[i + 1] = frames[i + 1] * (1.0 - m) + warped * m
        # wraparound: fuse frame 0 of the chunk into the last frame
        i0 = n * j
        warped = flow_warp(frames[i0][None], fwd_flow_s[n - 1 : n])[0]
        m = (1.0 - fwd_occ_s[n - 1]) * sal[n - 1] * warp_sal_wrap[0]
        frames[i0 + n - 1] = frames[i0 + n - 1] * (1.0 - m) + warped * m

    return jnp.stack(frames).astype(sample.dtype)
