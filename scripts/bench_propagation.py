"""Propagation-stage timing on the real chip.

Measures the guided patch-synthesis hot path (synthesize / the batched
chain pair) at video resolution on real frames — the number that decides
how much a Pallas patch-synthesis kernel can buy (PERF.md queue).

Usage: python scripts/bench_propagation.py [--res 512] [--batch 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fresco_tpu.utils.clips import bundled_clip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2,
                    help="parallel synthesis jobs (fwd+bwd chains)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import cv2
    import jax.numpy as jnp
    import numpy as np

    from fresco_tpu.propagate.guides import (
        GUIDE_WEIGHTS, edge_guide, positional_first,
    )
    from fresco_tpu.propagate.patchmatch import PatchMatchConfig
    from fresco_tpu.propagate.rejected import synthesize_batch

    cap = cv2.VideoCapture(bundled_clip("music.mp4"))
    ok1, f0 = cap.read()
    ok2, f1 = cap.read()
    cap.release()
    assert ok1 and ok2
    r = args.res
    f0 = cv2.resize(f0, (r, r)).astype(np.float32)
    f1 = cv2.resize(f1, (r, r)).astype(np.float32)

    # synthetic stylized key (timing only); guide stacks mirror
    # video_blend._synthesize_chain_pair: color/edge/temporal/positional
    style = np.clip(f0 * 0.8 + 30, 0, 255).astype(np.float32)
    pos = positional_first(r, r)
    src = np.concatenate([f0, edge_guide(f0), style, pos], -1).astype(np.float32)
    tgt = np.concatenate([f1, edge_guide(f1), style, pos], -1).astype(np.float32)
    gw = np.concatenate([
        np.full(3, GUIDE_WEIGHTS["color"] / 3),
        np.full(3, GUIDE_WEIGHTS["edge"] / 3),
        np.full(3, GUIDE_WEIGHTS["temporal"] / 3),
        np.full(3, GUIDE_WEIGHTS["positional"] / 3),
    ]).astype(np.float32)

    cfg = PatchMatchConfig()  # CLI-parity: patch 5, pm 6, sv 12, uni 3500
    b = args.batch
    styles = jnp.asarray(np.stack([style] * b))
    sgs = jnp.asarray(np.stack([src] * b))
    tgs = jnp.asarray(np.stack([tgt] * b))

    t0 = time.perf_counter()
    out, err, nnf = synthesize_batch(styles, sgs, tgs, jnp.asarray(gw), cfg)
    np.asarray(out)
    print(f"[prop] compile+run1: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out, err, nnf = synthesize_batch(styles, sgs, tgs, jnp.asarray(gw), cfg)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / args.iters
    import json

    print(json.dumps({
        "metric": f"patch-synthesis sec/frame @{r}px (batch {b})",
        "value": round(dt / b, 3),
        "unit": "sec/frame",
        "batch_seconds": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
