"""Prime the persistent XLA compile cache for a FRESCO config.

First compiles of the SD1.5-sized sampler take ~20-30 min on this
remote-compile setup (PERF.md); the persistent cache
(fresco_tpu/core/cache.py) makes every later process start fast.  This
tool pays that cost once, offline, for every program a real run of the
given config will need — keyframe translation (both the first-batch and
propagation-mode sampler programs), the prep passes, decode — using
synthetic frames at the config's exact (resolution, batch) shapes.

    python scripts/warm_cache.py config/config_music.yaml
    python scripts/warm_cache.py --res 512 --frames 8   # config-less

Run several configs in parallel processes to overlap their remote
compiles (the compile service is concurrent; one process compiles its
programs serially).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--res", type=int, default=None,
                    help="override resolution (default: the config's; "
                         "512 when config-less)")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--no-synthesis", action="store_true",
                    help="skip the patch-synthesis pyramid priming")
    args = ap.parse_args()

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    import jax

    from fresco_tpu.core.config import FrescoConfig, load_config
    from fresco_tpu.pipeline.runner import FrescoPipeline

    if args.config:
        cfg = load_config(args.config)
        cfg = cfg.replace(resolution=args.res or cfg.resolution)
    else:
        cfg = FrescoConfig(
            resolution=args.res or 512, batch_size=args.frames,
            controlnet_type="canny", prompt="warmup",
        )

    t0 = time.time()
    pipe = FrescoPipeline(cfg, tiny=False)
    print(f"[warm] models built {time.time()-t0:.0f}s", flush=True)

    import jax.numpy as jnp

    if pipe.bundle.saliency_fn is None and cfg.use_saliency:
        pipe.bundle.saliency_fn = lambda imgs: jnp.full(
            (imgs.shape[0], imgs.shape[1] // 8, imgs.shape[2] // 8, 1), 0.5
        )

    rng = np.random.default_rng(0)
    n = cfg.batch_size
    # real frames when the config names a clip: the cf attention auto
    # key cap sizes its compaction (and therefore the compiled program)
    # from the MEASURED valid-key count, so synthetic-noise masks would
    # prime programs a real run never executes
    from fresco_tpu.utils.clips import read_frames

    imgs = None
    vid = read_frames(str(cfg.file_path), n, stride=5)
    if vid:
        from fresco_tpu.ops.image import resize_image

        imgs = [
            resize_image(vid[min(i, len(vid) - 1)], cfg.resolution)
            for i in range(n)
        ]
        print(f"[warm] using {n} real frames from {cfg.file_path}",
              flush=True)
    if imgs is None:
        imgs = [
            rng.integers(0, 255, (cfg.resolution, cfg.resolution, 3))
            .astype(np.uint8)
            for _ in range(n)
        ]
    # Flow source: leave the bundle's own (GMFlow — checkpoint weights
    # when present, the init weights otherwise), because that is exactly
    # what cli.run_config's keyframe path executes: warmed programs must
    # BE the run's programs, including the full-res GMFlow forward and
    # the auto-cap attention program its masks select.  (An earlier
    # Farneback substitution here primed a different interframe program
    # than the offline run compiles.)

    prompts = ["warmup"] * n
    key = jax.random.key(0)

    t0 = time.time()
    latents, record = pipe._translate_batch(imgs, prompts, [""] * n, None, False, key)
    jax.block_until_ready(latents)
    print(f"[warm] first-batch program compiled+ran {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    latents2, _ = pipe._translate_batch(imgs, prompts, [""] * n, record, True, key)
    jax.block_until_ready(latents2)
    print(f"[warm] propagation-mode program compiled+ran {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    np.asarray(pipe._decode_jit(pipe.bundle.params, latents))
    print(f"[warm] decode compiled+ran {time.time()-t0:.0f}s", flush=True)

    # patch-synthesis pyramid at the TRUE video frame shape (resolution
    # applies to the short side, so e.g. a 4:5 clip at 512 runs 512x640
    # programs; the freeze-compaction tiers compile 1 + len(tiers) pm
    # scans per level — priming them here is most of a first
    # propagation run's latency)
    if not args.no_synthesis:
        from fresco_tpu.ops.image import resize_image
        from fresco_tpu.propagate.patchmatch import (
            PatchMatchConfig, synthesize,
        )

        h = w = cfg.resolution
        first = read_frames(str(cfg.file_path), 1)
        if first:
            h, w = resize_image(first[0], cfg.resolution).shape[:2]
        t0 = time.time()
        style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        guides = rng.uniform(0, 255, (h, w, 12)).astype(np.float32)
        out, _, _ = synthesize(
            jnp.asarray(style), jnp.asarray(guides), jnp.asarray(guides),
            jnp.full((12,), 0.5), PatchMatchConfig(), rng=jax.random.key(0),
        )
        np.asarray(out)
        print(f"[warm] synthesis pyramid ({h}x{w}) compiled+ran "
              f"{time.time()-t0:.0f}s", flush=True)
    print("[warm] cache primed for this (config, resolution, batch)")


if __name__ == "__main__":
    main()
