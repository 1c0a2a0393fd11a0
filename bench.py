"""Benchmark: FRESCO keyframe translation throughput on one TPU chip.

Measures the full-size (SD1.5 + ControlNet, 512px, CFG) denoise step —
the dominant cost of keyframe translation (SURVEY.md §3.1) — and
extrapolates keyframes/sec for the reference's standard setting of 20
DDPM steps with warmup 3 (17 executed UNet+ControlNet steps per batch,
config/config_music.yaml).

Baseline: the reference publishes no numbers (BASELINE.md).  We use a
measured-elsewhere A100 fp16 estimate for the same workload as the
provisional ``vs_baseline`` denominator: SD1.5+ControlNet+CFG at 512px
runs ~11 it/s per image on A100 => 8-frame batch at 17 steps ≈ 12.4 s
≈ 0.65 keyframes/sec *without* FRESCO overheads; FRESCO's published
repo is substantially slower due to the in-loop optimization.  We
conservatively use 0.65 kf/s as the A100 proxy until a measured
reference baseline exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

A100_PROXY_KEYFRAMES_PER_SEC = 0.65


def main():
    import jax

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from fresco_tpu.models.controlnet import ControlNet
    from fresco_tpu.models.unet import UNet2DCondition, UNetConfig

    ucfg = UNetConfig()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    controlnet = ControlNet(ucfg, dtype=jnp.bfloat16)

    f = 8  # keyframe batch (config_music.yaml batch_size)
    h = w = 64  # latents for 512px
    steps_executed = 17  # 20 inference steps, warmup 3

    rng = jax.random.key(0)
    latents = jax.random.normal(rng, (2 * f, h, w, 4), jnp.bfloat16)
    ctx = jax.random.normal(rng, (2 * f, 77, 768), jnp.bfloat16)
    edges = jax.random.uniform(rng, (2 * f, 512, 512, 3), jnp.bfloat16)

    t0 = time.perf_counter()
    uparams = jax.jit(unet.init)(rng, latents[:1], jnp.int32(0), ctx[:1])
    cparams = jax.jit(controlnet.init)(
        rng, latents[:1], jnp.int32(0), ctx[:1], edges[:1]
    )
    jax.block_until_ready((uparams, cparams))
    import sys
    print(f"[bench] init in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    import sys

    @jax.jit
    def ctrl_step(latents, t):
        return controlnet.apply(cparams, latents, t, ctx, edges, 0.7)

    @jax.jit
    def unet_step(latents, t, ctrl):
        eps = unet.apply(uparams, latents, t, ctx, controlnet_residuals=ctrl)
        e0, e1 = jnp.split(eps, 2, axis=0)
        guided = e0 + 7.5 * (e1 - e0)
        return jnp.concatenate([guided, guided], axis=0)

    def step(latents, t):
        return unet_step(latents, t, ctrl_step(latents, t))

    # compile + warmup (split programs compile/cache independently)
    t0 = time.perf_counter()
    c = ctrl_step(latents, jnp.int32(801))
    jax.block_until_ready(c)
    print(f"[bench] controlnet compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = unet_step(latents, jnp.int32(801), c)
    out.block_until_ready()
    print(f"[bench] unet compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    n_iter = 6
    t0 = time.perf_counter()
    x = latents
    for i in range(n_iter):
        x = step(x, jnp.int32(801 - i * 50))
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    keyframes_per_sec = f / (dt * steps_executed)
    print(
        json.dumps(
            {
                "metric": "keyframes/sec/chip @512px SD1.5+ControlNet 20-step",
                "value": round(keyframes_per_sec, 4),
                "unit": "keyframes/sec",
                "vs_baseline": round(
                    keyframes_per_sec / A100_PROXY_KEYFRAMES_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
