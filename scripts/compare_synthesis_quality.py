"""Jump-flood (TPU) vs serpentine (C++) synthesis quality on real frames.

Propagates a known deterministic 'style' (channel-swap + invert) of one
music.mp4 frame to the next frame with the real guide stack (weights
reference video_blend.py:89).  Because the style transform is
deterministic, the true answer T(frame1) is known, so each backend gets
an absolute PSNR — the documented equivalence bound for the jump-flood
re-design of the reference's serpentine PatchMatch
(reference src/ebsynth/deps/ebsynth/src/ebsynth_cpu.cpp:530-662).

Usage: python scripts/compare_synthesis_quality.py [--res 256] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fresco_tpu.utils.clips import bundled_clip

CLIP = bundled_clip("music.mp4")


def psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10.0 * np.log10(255.0**2 / max(mse, 1e-9))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frame-gap", type=int, default=2)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp
    import numpy as np

    from fresco_tpu.propagate.guides import GUIDE_WEIGHTS, edge_guide, positional_chain
    from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize

    cap = cv2.VideoCapture(CLIP)
    ok0, f0 = cap.read()
    for _ in range(args.frame_gap):
        ok1, f1 = cap.read()
    cap.release()
    assert ok0 and ok1
    rs = lambda x: cv2.resize(x, (args.res, args.res))
    f0, f1 = rs(f0), rs(f1)

    style = lambda x: (255 - x[..., ::-1]).astype(np.float32)  # deterministic
    key0 = style(f0)
    gt1 = style(f1)

    h, w = f0.shape[:2]
    pos = positional_chain(h, w, [np.zeros((h, w, 2), np.float32)],
                           [np.zeros((h, w), np.float32)])
    src = np.concatenate(
        [f0.astype(np.float32), edge_guide(f0), key0, pos[0]], axis=-1
    )
    tgt = np.concatenate(
        [f1.astype(np.float32), edge_guide(f1), key0, pos[1]], axis=-1
    )
    wpc = np.concatenate([
        np.full(3, GUIDE_WEIGHTS["color"] / 3),
        np.full(3, GUIDE_WEIGHTS["edge"] / 3),
        np.full(3, GUIDE_WEIGHTS["temporal"] / 3),
        np.full(3, GUIDE_WEIGHTS["positional"] / 3),
    ]).astype(np.float32)

    cfg = PatchMatchConfig()  # CLI-parity: patch 5, pm 6, sv 12, uni 3500
    out = {}
    for backend in ("native", "tpu"):
        t0 = time.perf_counter()
        o, e, _ = synthesize(
            jnp.asarray(key0), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(wpc), cfg, rng=jax.random.key(0), backend=backend,
        )
        o = np.clip(np.asarray(o), 0, 255)
        out[backend] = dict(
            psnr_vs_truth=round(psnr(o, gt1), 2),
            mean_error=round(float(np.mean(np.asarray(e))), 1),
            seconds=round(time.perf_counter() - t0, 1),
            _img=o,
        )
        print(f"[compare] {backend}: {out[backend]}", file=sys.stderr, flush=True)

    cross = psnr(out["tpu"]["_img"], out["native"]["_img"])
    for v in out.values():
        v.pop("_img")
    print(json.dumps({
        "res": args.res,
        "native": out["native"],
        "jumpflood": out["tpu"],
        "psnr_between_backends": round(cross, 2),
        "delta_db": round(
            out["tpu"]["psnr_vs_truth"] - out["native"]["psnr_vs_truth"], 2
        ),
    }))


if __name__ == "__main__":
    main()
