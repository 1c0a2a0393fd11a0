"""Guide-channel construction for patch synthesis.

Equivalent of reference src/ebsynth/blender/guide.py: four guides with
weights [color 6, edge 0.5, temporal 0.5, positional 2]
(video_blend.py:89).  Host-side (cv2) like the reference — inpainting
and saturating uint8 filter arithmetic have no XLA analog worth building;
the synthesis itself runs on TPU.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


GUIDE_WEIGHTS = dict(color=6.0, edge=0.5, temporal=0.5, positional=2.0)


def edge_guide(img: np.ndarray) -> np.ndarray:
    """4-neighbor Laplacian with cv2 saturating arithmetic (guide.py:72-76)."""
    k = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]])
    return cv2.filter2D(img, -1, k)


def positional_first(h: int, w: int) -> np.ndarray:
    """Coordinate image: channels (0, x-ramp, y-ramp) (guide.py:52-60,
    BGR in the reference; channel order only needs to be consistent)."""
    ys = np.linspace(0, 1, h)
    xs = np.linspace(0, 1, w)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    r = (yy * 255).astype(np.uint8)
    g = (xx * 255).astype(np.uint8)
    b = np.zeros_like(r)
    return np.stack([b, g, r], axis=2)


def warp_nearest(img: np.ndarray, bwd_flow: np.ndarray) -> np.ndarray:
    """Nearest-neighbor backward warp with cv2.remap (host equivalent of
    flow/flow_utils.py:228-242).  Bool masks ride a float round-trip the
    same way the reference's warp does (cv2.remap rejects bool)."""
    h, w = img.shape[:2]
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    mapx = xs + bwd_flow[..., 0]
    mapy = ys + bwd_flow[..., 1]
    if img.dtype == np.bool_:
        out = cv2.remap(img.astype(np.float32), mapx, mapy,
                        cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT)
        return out > 0.5
    return cv2.remap(img, mapx, mapy, cv2.INTER_NEAREST,
                     borderMode=cv2.BORDER_CONSTANT)


def inpaint_occluded(
    img: np.ndarray, occ_mask: np.ndarray, method: str = "pushpull"
) -> np.ndarray:
    """Fill occluded regions of a guide image (guide.py:40,99-101).

    The reference TELEA-inpaints with radius 30 — measured 4.6 s per
    512x640 call on one host core (the reference amortizes it over 8
    worker processes), which dominated the whole propagation stage
    (~18 s/frame of pure inpainting).  Default ``pushpull`` is a
    pyramid fill (average-downsample valid pixels, upsample into holes)
    — a few cv2.resize passes (~10 ms) producing smooth hole content,
    which is all a soft guide channel needs.  ``method="telea"`` keeps
    the reference's exact algorithm."""
    mask = occ_mask > 0
    if method == "telea":
        return cv2.inpaint(img, mask.astype(np.uint8) * 255, 30,
                           cv2.INPAINT_TELEA)
    valid = (~mask).astype(np.float32)
    acc = img.astype(np.float32) * valid[..., None]
    cnt = valid
    stack = []
    while min(acc.shape[:2]) > 1:
        stack.append((acc, cnt))
        nh, nw = max(acc.shape[0] // 2, 1), max(acc.shape[1] // 2, 1)
        acc = cv2.resize(acc, (nw, nh), interpolation=cv2.INTER_AREA)
        cnt = cv2.resize(cnt, (nw, nh), interpolation=cv2.INTER_AREA)
    fill = acc / np.maximum(cnt, 1e-6)[..., None]
    for acc_l, cnt_l in reversed(stack):
        fill = cv2.resize(fill, (acc_l.shape[1], acc_l.shape[0]),
                          interpolation=cv2.INTER_LINEAR)
        have = cnt_l > 1e-6
        lvl = acc_l / np.maximum(cnt_l, 1e-6)[..., None]
        fill = np.where(have[..., None], lvl, fill)
    out = np.where(mask[..., None], np.clip(fill, 0, 255), img)
    return out.astype(img.dtype)


def positional_chain(
    h: int, w: int, bwd_flows: list[np.ndarray], occs: list[np.ndarray],
    method: str = "pushpull",
) -> list[np.ndarray]:
    """Coordinate image warped along the flow chain with inpainting
    (guide.py:26-49).  Returns interval+1 guides."""
    imgs = [positional_first(h, w)]
    for flow, occ in zip(bwd_flows, occs):
        cur = warp_nearest(imgs[-1], flow).astype(np.uint8)
        cur = inpaint_occluded(cur, occ, method=method)
        imgs.append(cur)
    return imgs


def temporal_guide(
    prev_stylized: np.ndarray, bwd_flow: np.ndarray, occ: np.ndarray,
    method: str = "pushpull",
) -> np.ndarray:
    """Previous stylized frame warped forward + inpainted (guide.py:79-104)."""
    warped = warp_nearest(prev_stylized, bwd_flow).astype(np.uint8)
    return inpaint_occluded(warped, occ, method=method)
