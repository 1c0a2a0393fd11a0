"""Benchmark: FRESCO keyframe translation throughput on one TPU chip.

Reports BOTH of the numbers that matter (VERDICT r1 item 3):

  * headline ``value``: the FULL FRESCO pipeline — VAE encode -> scanned
    20-step denoise with cross-frame + spatial + trajectory attention,
    20-iter feature optimization, background smoothing -> record — via
    the actual ``FrescoPipeline`` batch path at 512px, batch 8
    (config_music.yaml workload, reference src/pipe_FRESCO.py:80-233).
  * ``plain_loop_value``: the 17-step UNet+ControlNet scan without FRESCO
    mechanisms — the per-step building-block number.

Baseline: the reference publishes no numbers (BASELINE.md).  We use an
A100 fp16 proxy for the *attention-only* workload: SD1.5+ControlNet+CFG
at 512px ~11 it/s single image => 8-frame batch, 17 steps ≈ 0.65
keyframes/sec — an upper bound on the reference (whose in-loop eager
Adam optimization makes it far slower).  vs_baseline = full / 0.65.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import sys
import time

A100_PROXY_KEYFRAMES_PER_SEC = 0.65
FRAMES = 8   # config_music.yaml batch_size
RES = 512


def _fetch(x):
    """Force true completion with a ONE-ELEMENT fetch: the element is the
    output of a dependent device program, so fetching it waits for the
    whole computation — without the ~0.2 s full-array pull over the
    tunnel (4 MB latents at ~22 MB/s), which is measurement apparatus,
    not workload (the real runner decodes on device; the reference keeps
    latents on GPU too).  NB block_until_ready resolves without waiting
    on the axon backend (PERF.md round-5), hence a fetch."""
    import numpy as np

    if hasattr(x, "ravel") and not isinstance(x, np.ndarray):
        return np.asarray(x.ravel()[0])
    return np.asarray(x).ravel()[0]


def bench_plain_loop():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fresco_tpu.models.controlnet import ControlNet
    from fresco_tpu.models.unet import UNet2DCondition, UNetConfig

    ucfg = UNetConfig()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    controlnet = ControlNet(ucfg, dtype=jnp.bfloat16)

    f = FRAMES
    h = w = RES // 8
    steps_executed = 17  # 20 inference steps, warmup 3

    rng = jax.random.key(0)
    latents = jax.random.normal(rng, (2 * f, h, w, 4), jnp.bfloat16)
    ctx = jax.random.normal(rng, (2 * f, 77, 768), jnp.bfloat16)
    edges = jax.random.uniform(rng, (2 * f, RES, RES, 3), jnp.bfloat16)

    uparams = jax.jit(unet.init)(rng, latents[:1], jnp.int32(0), ctx[:1])
    cparams = jax.jit(controlnet.init)(
        rng, latents[:1], jnp.int32(0), ctx[:1], edges[:1]
    )
    jax.block_until_ready(uparams)

    ts = jnp.asarray(np.arange(steps_executed, dtype=np.int32)[::-1] * 50 + 1)

    @jax.jit
    def denoise_loop(uparams, cparams, latents, ctx, edges):
        def body(lat, t):
            ctrl = controlnet.apply(cparams, lat, t, ctx, edges, 0.7)
            eps = unet.apply(uparams, lat, t, ctx, controlnet_residuals=ctrl)
            e0, e1 = jnp.split(eps, 2, axis=0)
            guided = e0 + 7.5 * (e1 - e0)
            lat = jnp.concatenate([guided, guided], axis=0) * 0.99 + lat * 0.01
            return lat, ()

        out, _ = jax.lax.scan(body, latents, ts)
        return out

    out = denoise_loop(uparams, cparams, latents, ctx, edges)
    _fetch(out)
    n_iter = 3
    t0 = time.perf_counter()
    x = latents
    for _ in range(n_iter):
        x = denoise_loop(uparams, cparams, x, ctx, edges)
    _fetch(x)
    return f / ((time.perf_counter() - t0) / n_iter)


def _bench_frames():
    """8 keyframes from the bundled music.mp4 (mininterv-5 spacing,
    config_music.yaml workload) at 512px — real content, so the
    cross-frame masks carry realistic occlusion statistics.  Falls back
    to synthetic noise if the clip is unavailable."""
    import numpy as np

    from fresco_tpu.utils.clips import bundled_clip, read_frames

    frames = read_frames(bundled_clip("music.mp4"), FRAMES, stride=5)
    if frames and len(frames) >= FRAMES:
        import cv2

        return [cv2.resize(f, (RES, RES)) for f in frames]
    rng = np.random.default_rng(0)
    return [
        rng.integers(0, 255, (RES, RES, 3)).astype(np.uint8)
        for _ in range(FRAMES)
    ]


def make_cost_parity_flow_fn(gm_cost, gm_params, fb_flow):
    """flow_fn whose VALUES are fb_flow's (realistic Farneback masks)
    but whose device COST includes the GMFlow forward, for workload
    parity with the reference (run_fresco.py:207-215).

    flow_fn is traced inside the jitted _interframe, so a discarded
    ``gm_cost(...)`` call would be dead-code-eliminated at jaxpr DCE and
    the GMFlow forward would never execute (round-5 review finding —
    the r5 "beats the raw proxy" row was first measured with the GMFlow
    cost silently DCE'd; tests/test_bench_workload.py guards this).
    The sub-ulp residual keeps a real data dependency XLA cannot
    remove: gm flows are O(1e2) at most, so gm*1e-30 <= 1e-28 is far
    below the f32 ulp of any nonzero Farneback flow value — the add is
    numerically an exact identity, but the compiler must run the
    forward."""
    import jax.numpy as jnp

    def flow_fn(a, b):
        gm = gm_cost(gm_params, a, b)
        return fb_flow(a, b) + gm.astype(jnp.float32) * 1e-30

    return flow_fn


def bench_pipeline(use_opt: bool, include_aux_cost: bool | None = None):
    """The real FrescoPipeline batch path.  ``use_opt=False`` is the
    attention-guidance-only configuration — the exact workload of the
    A100 proxy baseline (which excludes the in-loop Adam optimization
    AND the GMFlow/EGNet forwards, so that row leaves them out too);
    ``include_aux_cost`` (default: = use_opt) dispatches random-weight
    GMFlow + EGNet forwards inside the timed path for the FULL row —
    the reference pays both every batch.

    Flows come from Farneback on the real frames (no GMFlow checkpoint
    offline; random-weight flows make every cross-frame key valid, which
    is both unrepresentative and forces dense attention — VERDICT r2
    Weak #3).  cf_key_cap='auto' then sizes the compaction to the
    measured valid count: exact reference attention semantics."""
    import jax
    import jax.numpy as jnp

    from fresco_tpu.core.config import FrescoConfig
    from fresco_tpu.pipeline.runner import FrescoPipeline
    from fresco_tpu.utils.classic_flow import make_flow_fn

    cfg = FrescoConfig(
        resolution=RES,
        batch_size=FRAMES,
        num_inference_steps=20,
        num_warmup_steps=3,
        end_opt_step=15,
        use_controlnet=True,
        controlnet_type="canny",
        use_saliency=True,
        use_fresco_opt=use_opt,
        prompt="bench",
        dtype="bfloat16",
    )
    pipe = FrescoPipeline(cfg, tiny=False)
    if include_aux_cost is None:
        include_aux_cost = use_opt

    imgs = _bench_frames()
    fb_flow = make_flow_fn(imgs)
    constant_sal = lambda imgs: jnp.full(
        (imgs.shape[0], imgs.shape[1] // 8, imgs.shape[2] // 8, 1), 0.5
    )
    if include_aux_cost:
        # Reference-workload parity (VERDICT r3 missing #4): the
        # reference pays a GMFlow forward per frame pair and an EGNet
        # forward per frame EVERY batch (run_fresco.py:207-215,
        # diffusion_hacked.py:914-917).  Offline, random-weight flows/
        # saliency are degenerate as INPUTS (they force dense attention
        # / meaningless masks), so the mask VALUES still come from
        # Farneback / constant 0.5 — but the DEVICE COST of both
        # forwards (weight-independent) is dispatched inside the timed
        # path.
        from fresco_tpu.models.egnet import EGNet

        egnet = EGNet()
        eg_params = jax.jit(egnet.init)(
            jax.random.key(1), jnp.zeros((1, RES // 2, RES // 2, 3))
        )
        # params as ARGUMENTS: closure constants get baked into the
        # remote-compile upload and exceed its size limit (HTTP 413).
        # Both forwards run at config.aux_dtype (bf16 default) exactly
        # like the runner's interframe/saliency paths.
        from fresco_tpu.pipeline.runner import _aux_caster

        cast = _aux_caster(cfg.aux_dtype)
        sal_cost = jax.jit(lambda p, x: egnet.apply(cast(p), cast(x))[2][-1])
        gm_cost = jax.jit(
            lambda p, a, b: pipe.bundle.gmflow.apply(cast(p), cast(a), cast(b))
        )

        def saliency_fn(imgs):
            # EGNet runs at half-res like the reference detector input
            sal_cost(eg_params, jax.image.resize(
                jnp.asarray(imgs, jnp.float32),
                (imgs.shape[0], RES // 2, RES // 2, 3), "bilinear",
            ))  # dispatched: cost lands on the device stream before
            # the timed fetch; output unused (random weights)
            return constant_sal(imgs)

        flow_fn = make_cost_parity_flow_fn(
            gm_cost, pipe.bundle.params["gmflow"], fb_flow
        )

        pipe.bundle.saliency_fn = saliency_fn
        pipe.bundle.flow_fn = flow_fn
    else:
        # the A100 proxy workload: no aux models, no in-loop opt
        pipe.bundle.saliency_fn = constant_sal
        pipe.bundle.flow_fn = fb_flow
    prompts = ["bench"] * FRAMES
    nprompts = [""] * FRAMES

    key = jax.random.key(0)
    t0 = time.perf_counter()
    latents, _ = pipe._translate_batch(imgs, prompts, nprompts, None, False, key)
    _fetch(latents)
    print(
        f"[bench] pipeline(opt={use_opt}) compile+run1 "
        f"{time.perf_counter()-t0:.0f}s",
        file=sys.stderr, flush=True,
    )
    # Steady state, pipelined exactly like translate_keyframes: batch
    # i+1's prep (upload/prompts/detector/aux forwards/mapping/attn
    # params) runs on a prep thread while batch i's denoise scan owns
    # the device — the reference pays prep serially between batches
    # (run_fresco.py:199-234).  Methodology (VERDICT r4 #6): N timed
    # batches, report the MEDIAN batch wall and the min-max spread; the
    # tunnel shows ~5-10% run-to-run variance, so single-run or
    # best-of-N numbers are not comparable across rounds.
    from concurrent.futures import ThreadPoolExecutor

    n_runs = 5
    walls = []
    ex = ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(pipe._prepare_batch, imgs, prompts, nprompts, key)
        for i in range(n_runs):
            t0 = time.perf_counter()
            prepared = fut.result()
            if i + 1 < n_runs:
                fut = ex.submit(
                    pipe._prepare_batch, imgs, prompts, nprompts, key
                )
            latents, _ = pipe._run_batch(prepared, None, False, key)
            _fetch(latents)
            walls.append(time.perf_counter() - t0)
    finally:
        ex.shutdown(wait=False, cancel_futures=True)
    med = sorted(walls)[len(walls) // 2]
    stats = {
        "runs": n_runs,
        "batch_walls_s": [round(w, 3) for w in walls],
        "median_batch_s": round(med, 3),
        "spread_pct": round(100.0 * (max(walls) - min(walls)) / med, 1),
    }
    return FRAMES / med, stats


def _wait_for_device(max_wait_s: int = 1800, probe_interval: int = 60) -> bool:
    """The axon tunnel occasionally drops (CLAUDE.md); in-process backend
    init then HANGS or raises UNAVAILABLE, which would lose the whole
    bench run.  Probe in a subprocess (killable on hang, unlike the
    in-process init) until the backend answers, then init in-process."""
    import subprocess

    t0 = time.time()
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices())"],
                capture_output=True, timeout=120, text=True,
            )
            if out.returncode == 0 and out.stdout.strip():
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 > max_wait_s:
            print(f"[bench] device backend unreachable after {max_wait_s}s",
                  file=sys.stderr, flush=True)
            return False
        print("[bench] device backend not answering (tunnel outage?); "
              f"retrying in {probe_interval}s", file=sys.stderr, flush=True)
        time.sleep(probe_interval)


def _retry(label, fn, attempts=3):
    """Run one bench phase, retrying on transient tunnel failures.

    The axon remote-compile/fetch endpoints occasionally drop mid-run
    (observed: "response body closed before all bytes were read" INTERNAL
    errors) — without this, one hiccup loses the whole one-shot bench.
    Compiles hit the persistent cache on retry, so a repeat is cheap;
    `_wait_for_device` re-probes (in a killable subprocess) before it."""
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except Exception as e:  # jax wraps backend errors variously
            if attempt == attempts:
                raise
            print(f"[bench] {label} failed (attempt {attempt}/{attempts}): "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
            time.sleep(30)
            if not _wait_for_device():
                raise


def main():
    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    if not _wait_for_device():
        return 1

    t0 = time.perf_counter()
    plain = _retry("plain loop", bench_plain_loop)
    print(f"[bench] plain loop: {plain:.3f} kf/s ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr, flush=True)
    attn_only, attn_stats = _retry(
        "attention-only pipeline", lambda: bench_pipeline(use_opt=False)
    )
    print(f"[bench] attention-only pipeline: {attn_only:.3f} kf/s "
          f"(spread {attn_stats['spread_pct']}%)",
          file=sys.stderr, flush=True)
    full, full_stats = _retry(
        "full pipeline", lambda: bench_pipeline(use_opt=True)
    )
    # Full-pipeline baseline, derived: the 0.65 proxy EXCLUDES the
    # reference's in-loop optimization, which the full pipeline runs.
    # The reference executes ~500 TFLOP of feature optimization per
    # 8-frame batch (20 Adam iters x 4 decoder stages x 12 opt steps of
    # dense-gram L1 + bidirectional warp losses, upcast to fp32 at
    # diffusion_hacked.py:430; FLOP audit in PERF.md) — even at the
    # A100's full TF32 *peak* (156 TFLOP/s, i.e. assuming the eager
    # torch loop runs with zero overhead) that adds >= 3.2 s to the
    # proxy's 12.3 s batch.  0.516 kf/s is therefore a strict UPPER
    # bound on the reference's full-pipeline A100 throughput.
    full_baseline = FRAMES / (
        FRAMES / A100_PROXY_KEYFRAMES_PER_SEC + 500e12 / 156e12
    )
    print(
        json.dumps(
            {
                "metric": "full-FRESCO keyframes/sec/chip @512px batch 8 "
                          "(EXACT cf+spatial+traj attention via auto key "
                          "cap on real-flow masks, 20-iter feature opt, "
                          "bg smoothing, 20 steps; GMFlow+EGNet forwards "
                          "on device in the timed path at the runner's "
                          "aux_dtype default bf16; music.mp4 frames "
                          "stride 5; median of 5 pipelined batches, "
                          "prep overlapped with the previous batch's "
                          "denoise as in the real runner) — vs_baseline "
                          "is against the workload-matched A100 upper "
                          "bound (attention proxy 0.65 kf/s + the "
                          "reference's ~500 TFLOP/batch in-loop "
                          "optimization charged at A100 TF32 PEAK, i.e. "
                          "the bound OVERSTATES the reference, so the "
                          "ratio understates the speedup; raw ratios in "
                          "the other fields)",
                "value": round(full, 4),
                "unit": "keyframes/sec",
                "vs_baseline": round(full / full_baseline, 3),
                "full_baseline_upper_bound": round(full_baseline, 4),
                "runs": full_stats["runs"],
                "spread": {
                    "full": full_stats,
                    "attention_only": attn_stats,
                },
                # vs the raw attention-only proxy, which EXCLUDES the
                # in-loop Adam optimization this workload runs:
                "vs_attention_proxy": round(
                    full / A100_PROXY_KEYFRAMES_PER_SEC, 3
                ),
                # same workload as the A100 proxy (no in-loop Adam opt —
                # the proxy excludes it too): the apples-to-apples ratio
                "attn_only_value": round(attn_only, 4),
                "attn_only_vs_baseline": round(
                    attn_only / A100_PROXY_KEYFRAMES_PER_SEC, 3
                ),
                "plain_loop_value": round(plain, 4),
                "plain_loop_vs_baseline": round(
                    plain / A100_PROXY_KEYFRAMES_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
