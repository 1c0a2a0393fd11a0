"""Attribute the full-FRESCO batch wall per phase with real device
round-trips (force_fetch sync): where do the 12.7 s go?"""
import sys, time

sys.path.insert(0, "/root/repo")
from fresco_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import bench  # repo-root bench.py helpers
import jax


def main():
    import jax.numpy as jnp
    from fresco_tpu.core.config import FrescoConfig
    from fresco_tpu.pipeline.runner import FrescoPipeline
    from fresco_tpu.utils.classic_flow import make_flow_fn

    RES, FRAMES = bench.RES, bench.FRAMES
    cfg = FrescoConfig(
        resolution=RES, batch_size=FRAMES, num_inference_steps=20,
        num_warmup_steps=3, end_opt_step=15, use_controlnet=True,
        controlnet_type="canny", use_saliency=True, use_fresco_opt=True,
        prompt="bench", dtype="bfloat16",
    )
    pipe = FrescoPipeline(cfg, tiny=False)
    pipe.sync_phases = True

    imgs = bench._bench_frames()
    fb_flow = make_flow_fn(imgs)
    from fresco_tpu.models.egnet import EGNet

    egnet = EGNet()
    eg_params = jax.jit(egnet.init)(
        jax.random.key(1), jnp.zeros((1, RES // 2, RES // 2, 3))
    )
    sal_cost = jax.jit(lambda p, x: egnet.apply(p, x)[2][-1])
    gm_cost = jax.jit(lambda p, a, b: pipe.bundle.gmflow.apply(p, a, b))
    import numpy as np

    def saliency_fn(imgs_):
        out = sal_cost(eg_params, jax.image.resize(
            jnp.asarray(imgs_, jnp.float32),
            (imgs_.shape[0], RES // 2, RES // 2, 3), "bilinear"))
        np.asarray(out.ravel()[0])  # sync inside the saliency phase
        return jnp.full((imgs_.shape[0], imgs_.shape[1] // 8,
                         imgs_.shape[2] // 8, 1), 0.5)

    def flow_fn(a, b):
        out = gm_cost(pipe.bundle.params["gmflow"], a, b)
        return fb_flow(a, b)

    pipe.bundle.saliency_fn = saliency_fn
    pipe.bundle.flow_fn = flow_fn
    prompts = ["bench"] * FRAMES
    nprompts = [""] * FRAMES
    key = jax.random.key(0)

    # warm
    prepared = pipe._prepare_batch(imgs, prompts, nprompts, key)
    latents, _ = pipe._run_batch(prepared, None, False, key)
    bench._fetch(latents)
    pipe.phases = type(pipe.phases)()  # reset timers post-warmup

    for r in range(2):
        t0 = time.perf_counter()
        prepared = pipe._prepare_batch(imgs, prompts, nprompts, key)
        t1 = time.perf_counter()
        latents, _ = pipe._run_batch(prepared, None, False, key)
        bench._fetch(latents)
        t2 = time.perf_counter()
        print(f"[probe] batch {r}: prep {t1-t0:.2f}s run {t2-t1:.2f}s "
              f"total {t2-t0:.2f}s", flush=True)
    print("[probe] " + pipe.phases.report(), flush=True)


if __name__ == "__main__":
    main()
