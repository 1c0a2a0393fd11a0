"""Benchmark: FRESCO keyframe translation throughput on one TPU chip.

Measures the scanned 17-step denoise loop (SD1.5 UNet + ControlNet,
512px, CFG batch 8 keyframes) — the dominant cost of keyframe
translation (SURVEY.md §3.1) and exactly how the framework runs it: the
whole loop is ONE jitted program (lax.scan), so per-step dispatch
overhead doesn't exist (measured ~13s/step of pure handle-marshaling on
this tunneled setup when stepping from Python — the reference's
per-step host loop pays the analogous torch dispatch cost).

Baseline: the reference publishes no numbers (BASELINE.md).  We use an
A100 fp16 proxy for the same workload: SD1.5+ControlNet+CFG at 512px
~11 it/s single image => 8-frame batch, 17 steps ≈ 0.65 keyframes/sec
*without* FRESCO overheads.  vs_baseline = measured / 0.65.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

A100_PROXY_KEYFRAMES_PER_SEC = 0.65


def main():
    import jax

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

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
    print(f"[bench] init in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    ts = jnp.asarray(np.arange(steps_executed, dtype=np.int32)[::-1] * 50 + 1)

    @jax.jit
    def denoise_loop(uparams, cparams, latents, ctx, edges):
        """The full 17-step loop as one program (mirrors the sampler)."""

        def body(lat, t):
            ctrl = controlnet.apply(cparams, lat, t, ctx, edges, 0.7)
            eps = unet.apply(uparams, lat, t, ctx, controlnet_residuals=ctrl)
            e0, e1 = jnp.split(eps, 2, axis=0)
            guided = e0 + 7.5 * (e1 - e0)
            lat = jnp.concatenate([guided, guided], axis=0) * 0.99 + lat * 0.01
            return lat, ()

        out, _ = jax.lax.scan(body, latents, ts)
        return out

    t0 = time.perf_counter()
    out = denoise_loop(uparams, cparams, latents, ctx, edges)
    _ = np.asarray(out[0, 0, 0, 0])  # host fetch forces true completion
    print(
        f"[bench] loop compiled+run1 in {time.perf_counter()-t0:.0f}s",
        file=sys.stderr, flush=True,
    )

    n_iter = 3
    t0 = time.perf_counter()
    x = latents
    for _ in range(n_iter):
        x = denoise_loop(uparams, cparams, x, ctx, edges)
    _ = np.asarray(x[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / n_iter

    keyframes_per_sec = f / dt
    print(
        json.dumps(
            {
                "metric": "keyframes/sec/chip @512px SD1.5+ControlNet 17-step loop",
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
