"""A/B the uint8 gather table (PatchMatchConfig.table_dtype).

VERDICT r3 #7: high-churn (noise-like) styles defeat the freeze tiers,
so full-grid row gathers dominate and the gather has a measured width
cost (3.7 ms @128 lanes vs 5.6 @384, PERF.md) — storing the pre-stacked
patch table in uint8 halves the row bytes.  Done criterion: noise-like
synthesis <= 6.5 s/frame @512x640 with PSNR within 0.1 dB.

Measures, for table_dtype bfloat16 vs uint8:
  * PSNR vs known truth at 256px (deterministic smooth style —
    ablate_compact methodology)
  * wall sec/frame at 512x640 with a NOISE style (the high-churn case)

Usage: python scripts/ablate_table_u8.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ablate_compact import CLIP, guide_stack, psnr  # noqa: E402


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
    for name in ("bfloat16", "uint8"):
        cfg = PatchMatchConfig(table_dtype=name)

        # quality at 256 (known truth, smooth deterministic style)
        rs = lambda x, wh: cv2.resize(x, wh)
        f0, f1 = rs(f0_raw, (256, 256)), rs(f1_raw, (256, 256))
        style = lambda x: (255 - x[..., ::-1]).astype(np.float32)
        key0, gt1 = style(f0), style(f1)
        src, tgt, wpc = guide_stack(f0, f1, key0)
        o, _, _ = synthesize(
            jnp.asarray(key0), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(wpc), cfg, rng=jax.random.key(0),
        )
        q = psnr(np.clip(np.asarray(o), 0, 255), gt1)

        # wall at 512x640 with a NOISE style (high-churn: freeze tiers
        # mostly idle, full-grid gathers dominate — the e2e worst case)
        f0, f1 = rs(f0_raw, (512, 640)), rs(f1_raw, (512, 640))
        nrng = np.random.default_rng(0)
        key0 = nrng.uniform(0, 255, f0.shape).astype(np.float32)
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
            noise_sec_per_frame_512x640=round(min(walls), 2),
            first=round(t_first, 1),
        )
        print(f"[table_u8] {name}: {results[name]}",
              file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
