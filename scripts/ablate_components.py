"""Time each FRESCO mechanism in isolation on the chip.

The full pipeline measured 0.093 kf/s at 4 frames (PERF.md) vs a ~2 TFLOP
speed-of-light step — this script pinpoints the consumer by compiling and
timing each component as its own small program:

  base      one UNet+ControlNet CFG step, no FRESCO
  cf        + cross-frame flash attention (F*hw keys, ~25% valid mask)
  traj      + trajectory (FLATTEN) attention
  intra     + spatial-guided attention
  opt3      optimize_feature alone, stage-3 shape (hw=4096, C=320)
  opt2      optimize_feature alone, stage-2 shape (hw=1024, C=640)
  bg        VAE decode+encode roundtrip (background smoothing), per-frame

Usage: python scripts/ablate_components.py [--frames 4] [--res 512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=3, warmup=1):
    import numpy as np

    for _ in range(warmup):
        out = fn(*args)
    leaf = [x for x in __import__("jax").tree_util.tree_leaves(out)][0]
    _ = np.asarray(leaf).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = [x for x in __import__("jax").tree_util.tree_leaves(out)][0]
    _ = np.asarray(leaf).ravel()[0]
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from fresco_tpu.attention.fresco_attention import FrescoAttnParams
    from fresco_tpu.models.controlnet import ControlNet
    from fresco_tpu.models.unet import UNet2DCondition, UNetConfig
    from fresco_tpu.models.vae import AutoencoderKL, VAEConfig

    f = args.frames
    h = w = args.res // 8
    hw1, hw0 = (h // 2) * (w // 2), h * w  # 1/16 and 1/8 scales
    results = {}
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    rng = jax.random.key(0)
    ucfg = UNetConfig()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    cnet = ControlNet(ucfg, dtype=jnp.bfloat16)

    latents = jax.random.normal(rng, (2 * f, h, w, 4), jnp.bfloat16)
    ctx = jax.random.normal(rng, (2 * f, 77, 768), jnp.bfloat16)
    edges = jax.random.uniform(rng, (2 * f, args.res, args.res, 3), jnp.bfloat16)

    t0 = time.perf_counter()
    uparams = jax.jit(unet.init)(rng, latents[:1], jnp.int32(0), ctx[:1])
    cparams = jax.jit(cnet.init)(rng, latents[:1], jnp.int32(0), ctx[:1], edges[:1])
    jax.block_until_ready(uparams["params"]["conv_in"]["Conv_0"]["kernel"])
    print(f"[ablate] init {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    # FRESCO inputs
    rngs = jax.random.split(rng, 8)
    occ_frac = 0.15
    cf_masks = {}
    for hwx in (hw0, hw1, hw1 // 4):
        m = jax.random.uniform(rngs[0], (f, hwx)) < occ_frac
        cf_masks[hwx] = m.at[0].set(True)
    n_fresco = UNet2DCondition.num_fresco_layers(ucfg)
    ref_features = tuple(
        jax.random.normal(
            rngs[1], (2 * f, hw1 if i < 3 else hw0, 640 if i < 3 else 320),
            jnp.bfloat16,
        )
        for i in range(n_fresco)
    )
    trajectories = {}
    for hwx in (hw0, hw1):
        perm = jnp.tile(jnp.arange(hwx)[None], (f, 1))
        trajectories[hwx] = (perm, perm, jnp.ones((hwx, f, f), bool))

    def step(attn):
        def run(uparams, cparams, latents, ctx, edges):
            ctrl = cnet.apply(cparams, latents, jnp.int32(500), ctx, edges, 0.7)
            eps = unet.apply(
                uparams, latents, jnp.int32(500), ctx,
                controlnet_residuals=ctrl, fresco=attn,
            )
            e0, e1 = jnp.split(eps, 2, axis=0)
            return e0 + 7.5 * (e1 - e0)
        return jax.jit(run)

    variants = {
        "base": None,
        "cf": FrescoAttnParams(cf_masks=cf_masks, chunk=2),
        "traj": FrescoAttnParams(
            trajectories=trajectories, use_inter=jnp.array(True), chunk=2
        ),
        "intra": FrescoAttnParams(
            ref_features=ref_features, use_intra=jnp.array(True), chunk=2
        ),
    }
    for name, attn in variants.items():
        if not want(name):
            continue
        t0 = time.perf_counter()
        dt = timeit(step(attn), uparams, cparams, latents, ctx, edges)
        results[name] = round(dt, 4)
        print(
            f"[ablate] {name}: {dt*1000:.0f} ms/step "
            f"(compile+3 runs took {time.perf_counter()-t0:.0f}s)",
            file=sys.stderr, flush=True,
        )

    # feature optimization alone (20 Adam iters, one stage)
    from fresco_tpu.diffusion.guidance import GuidanceConfig, optimize_feature

    gcfg = GuidanceConfig(iters=20)
    fwd_flow = jax.random.normal(rngs[2], (f, args.res, args.res, 2)) * 4
    bwd_flow = jax.random.normal(rngs[3], (f, args.res, args.res, 2)) * 4
    occ = (jax.random.uniform(rngs[4], (f, args.res, args.res, 1)) < 0.2).astype(
        jnp.float32
    )
    for name, (hwx, C, sh, gc) in {
        "opt3": (hw0, 320, (2 * f, h, w, 320), gcfg),
        "opt2": (hw1, 640, (2 * f, h // 2, w // 2, 640), gcfg),
        "opt3_spatial": (
            hw0, 320, (2 * f, h, w, 320),
            GuidanceConfig(iters=20, optimize_temporal=False),
        ),
        "opt3_temporal": (
            hw0, 320, (2 * f, h, w, 320),
            GuidanceConfig(iters=20, intra_weight=0.0),
        ),
        "opt3_1iter": (
            hw0, 320, (2 * f, h, w, 320), GuidanceConfig(iters=1),
        ),
        "opt3_5iter": (
            hw0, 320, (2 * f, h, w, 320), GuidanceConfig(iters=5),
        ),
    }.items():
        if not want(name):
            continue
        feat = jax.random.normal(rngs[5], sh, jnp.bfloat16)
        vref = jax.random.normal(rngs[6], (2 * f, hwx, C), jnp.float32)
        vref = vref / jnp.linalg.norm(vref, axis=-1, keepdims=True)
        corr = vref.astype(jnp.bfloat16)  # factored reference correlations
        run = jax.jit(
            lambda x, c, gc=gc: optimize_feature(
                x, fwd_flow, bwd_flow, occ[..., 0], occ[..., 0], c, gc
            )
        )
        t0 = time.perf_counter()
        dt = timeit(run, feat, corr)
        results[name] = round(dt, 4)
        print(
            f"[ablate] {name}: {dt*1000:.0f} ms/20-iter-opt "
            f"(compile+runs {time.perf_counter()-t0:.0f}s)",
            file=sys.stderr, flush=True,
        )

    # background smoothing VAE roundtrip
    if want("bg"):
        vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
        img = jax.random.uniform(rng, (1, args.res, args.res, 3), jnp.float32)
        vparams = jax.jit(vae.init)(rng, img)
        x0 = jax.random.normal(rng, (f, h, w, 4), jnp.float32)

        def bg(vparams, x0):
            imgs = jax.lax.map(
                lambda z: vae.apply(vparams, z[None], method=vae.decode)[0], x0
            )
            return jax.lax.map(
                lambda z: vae.apply(
                    vparams, z[None], rng=jax.random.key(1), method=vae.encode
                )[0],
                imgs,
            )

        t0 = time.perf_counter()
        dt = timeit(jax.jit(bg), vparams, x0)
        results["bg"] = round(dt, 4)
        print(
            f"[ablate] bg: {dt*1000:.0f} ms/roundtrip "
            f"(compile+runs {time.perf_counter()-t0:.0f}s)",
            file=sys.stderr, flush=True,
        )

    print(json.dumps({"frames": f, "res": args.res, "seconds": results}))


if __name__ == "__main__":
    main()
