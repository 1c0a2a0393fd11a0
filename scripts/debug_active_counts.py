"""Measure the stop-threshold freeze trajectory on real frames.

Prints, per pyramid level, the active-pixel count of every search-vote
iteration (-1 = skipped by the whole-level early exit).  This decides
whether an active-pixel compaction tier (gathering only unfrozen rows)
can cut the per-candidate row-gather wall (PERF.md, bench_gather.py:
the gather cost is per-ROW, so it scales linearly with the active set).

Usage: python scripts/debug_active_counts.py [--res 512]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fresco_tpu.utils.clips import bundled_clip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()

    import jax

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import cv2
    import jax.numpy as jnp

    from fresco_tpu.propagate.guides import (
        GUIDE_WEIGHTS, edge_guide, positional_first,
    )
    from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize

    cap = cv2.VideoCapture(bundled_clip("music.mp4"))
    ok1, f0 = cap.read()
    ok2, f1 = cap.read()
    cap.release()
    assert ok1 and ok2
    r = args.res
    f0 = cv2.resize(f0, (r, r)).astype(np.float32)
    f1 = cv2.resize(f1, (r, r)).astype(np.float32)

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

    cfg = PatchMatchConfig()  # CLI-parity defaults
    t0 = time.perf_counter()
    out, err, nnf, counts = synthesize(
        jnp.asarray(style), jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(gw), cfg, rng=jax.random.key(0), debug_counts=True,
    )
    counts = [np.asarray(c) for c in counts]
    print(f"[active] wall {time.perf_counter()-t0:.1f}s "
          f"(includes compile)", flush=True)
    for li, c in enumerate(counts):
        total = None
        # active counts are <= level pixel count; print fractions vs max
        mx = int(c.max())
        frac = ", ".join(
            "skip" if v < 0 else f"{v} ({v/mx:.0%})" for v in c.tolist()
        )
        print(f"[active] level {li}: {frac}", flush=True)


if __name__ == "__main__":
    main()
