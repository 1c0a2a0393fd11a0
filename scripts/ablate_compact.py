"""A/B the freeze-compaction tiers (PatchMatchConfig.compact_tiers).

Measures, tiers on vs off:
  * wall seconds/frame for a single-job 512px synthesis (the e2e shape)
  * PSNR vs known truth at 256px (compare_synthesis_quality methodology:
    deterministic style transform => the true answer is known)

Usage: python scripts/ablate_compact.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fresco_tpu.utils.clips import bundled_clip

CLIP = bundled_clip("music.mp4")


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10.0 * np.log10(255.0**2 / max(mse, 1e-9))


def guide_stack(f0, f1, key0):
    import cv2  # noqa: F401

    from fresco_tpu.propagate.guides import (
        GUIDE_WEIGHTS, edge_guide, positional_chain,
    )

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
    return src, tgt, wpc


def main():
    import jax

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import cv2
    import jax.numpy as jnp

    from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize

    cap = cv2.VideoCapture(CLIP)
    ok0, f0_raw = cap.read()
    cap.read()
    ok1, f1_raw = cap.read()
    cap.release()
    assert ok0 and ok1

    results = {}
    for name, tiers in (("off", ()), ("on", (4, 16))):
        cfg = PatchMatchConfig(compact_tiers=tiers)

        # quality at 256 (known truth)
        rs = lambda x, r: cv2.resize(x, (r, r))
        f0, f1 = rs(f0_raw, 256), rs(f1_raw, 256)
        style = lambda x: (255 - x[..., ::-1]).astype(np.float32)
        key0, gt1 = style(f0), style(f1)
        src, tgt, wpc = guide_stack(f0, f1, key0)
        o, _, _ = synthesize(
            jnp.asarray(key0), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(wpc), cfg, rng=jax.random.key(0),
        )
        q = psnr(np.clip(np.asarray(o), 0, 255), gt1)

        # wall at 512 (the e2e shape)
        f0, f1 = rs(f0_raw, 512), rs(f1_raw, 512)
        key0 = style(f0)
        src, tgt, wpc = guide_stack(f0, f1, key0)
        args = (jnp.asarray(key0), jnp.asarray(src), jnp.asarray(tgt),
                jnp.asarray(wpc))
        t0 = time.perf_counter()
        o, _, _ = synthesize(*args, cfg, rng=jax.random.key(0))
        np.asarray(o)
        t_first = time.perf_counter() - t0
        walls = []
        for it in range(3):
            t0 = time.perf_counter()
            o, _, _ = synthesize(*args, cfg, rng=jax.random.key(it))
            np.asarray(o)
            walls.append(time.perf_counter() - t0)
        results[name] = dict(
            psnr_vs_truth_256=round(q, 2),
            sec_per_frame_512=round(min(walls), 2),
            first=round(t_first, 1),
        )
        print(f"[ablate] tiers {name}: {results[name]}",
              file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
