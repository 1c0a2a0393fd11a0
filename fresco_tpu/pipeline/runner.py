"""Pipeline orchestration: models, batching, end-to-end video translation.

Equivalent of reference run_fresco.py (get_models :23-100,
run_keyframe_translation :111-270): build/load the model stack, select
keyframes, and translate keyframe batches with inter-batch latent
propagation.  All device work — parameter prep, the denoise loop, VAE
decode — is jitted per (batch, resolution) shape; the host only decodes
video frames and saves PNGs.

Checkpoints: torch/diffusers files converted on load
(fresco_tpu.models.convert).  Without checkpoints (this offline
environment), models initialize randomly — same graph, same performance,
useful for smoke runs and benchmarking.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from fresco_tpu.core.config import FrescoConfig, default_prompts, keyframe_sublists
from fresco_tpu.diffusion.guidance import GuidanceConfig
from fresco_tpu.diffusion.sampler import FrescoSampler, FrescoState, SamplerConfig
from fresco_tpu.diffusion.scheduler import DDPMScheduler
from fresco_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from fresco_tpu.models.controlnet import ControlNet
from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
from fresco_tpu.models.unet import UNet2DCondition, UNetConfig
from fresco_tpu.models.vae import AutoencoderKL, VAEConfig
from fresco_tpu.ops.image import resize_image, unit_range_to_uint8
from fresco_tpu.pipeline import prepare
from fresco_tpu.pipeline.keyframes import select_keyframes
from fresco_tpu.pipeline.text import encode_prompts, make_tokenizer
from fresco_tpu.utils.profiling import force_fetch, phase_timer

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


@dataclasses.dataclass
class ModelBundle:
    unet: UNet2DCondition
    vae: AutoencoderKL
    controlnet: ControlNet
    text_encoder: CLIPTextEncoder
    gmflow: GMFlow
    scheduler: DDPMScheduler
    params: dict
    tokenizer: Any
    detector: Callable[[np.ndarray], np.ndarray]
    saliency_fn: Callable[[np.ndarray], jnp.ndarray] | None
    # optional override for the bidirectional flow fn (same contract as
    # gmflow.apply: (frames, rolled) -> [2F, H, W, 2]).  Used by the
    # bench/tests to supply realistic flows when GMFlow weights are
    # unavailable (random-weight flows make occlusion masks degenerate)
    flow_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None


def _canny_detector(img: np.ndarray, low: int = 50, high: int = 100) -> np.ndarray:
    """Canny edges (reference annotator/canny, thresholds run_fresco.py:106;
    webUI.py:469-478 exposes them as sliders)."""
    return cv2.Canny(img, low, high)


def build_models(
    config: FrescoConfig,
    *,
    tiny: bool = False,
    seed: int = 0,
    load_weights: bool = True,
) -> ModelBundle:
    """Construct the model stack; load converted checkpoints when present.

    ``tiny=True`` builds reduced-width models (tests/smoke on CPU).
    """
    dtype = {
        "bfloat16": jnp.bfloat16,
        # float64: sharding-validation mode (parallel/smoke.py) — needs
        # jax_enable_x64; reassociation noise at 1e-16 cannot cross the
        # sign()/threshold discontinuities, making sharded == single exact
        "float64": jnp.float64,
    }.get(config.dtype, jnp.float32)
    if tiny:
        ucfg = UNetConfig.tiny()
        vcfg = VAEConfig.tiny()
        ccfg = CLIPTextConfig.tiny()
        gcfg = GMFlowConfig.tiny()
        cond_embed = (4, 4, 8, 8)  # 3 stride-2 convs: video res -> latent res
    else:
        ucfg = UNetConfig(use_freeu=config.use_freeu, freeu_b1=config.freeu_b1,
                          freeu_b2=config.freeu_b2, freeu_s1=config.freeu_s1,
                          freeu_s2=config.freeu_s2)
        vcfg = VAEConfig()
        ccfg = CLIPTextConfig()
        gcfg = GMFlowConfig()
        cond_embed = (16, 32, 96, 256)

    unet = UNet2DCondition(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)
    controlnet = ControlNet(ucfg, dtype=dtype, cond_embed_channels=cond_embed)
    text_encoder = CLIPTextEncoder(ccfg, dtype=jnp.float32)
    gmflow = GMFlow(gcfg)
    scheduler = DDPMScheduler(num_inference_steps=config.num_inference_steps)

    rng = jax.random.key(seed)
    ks = jax.random.split(rng, 5)
    latent = jnp.zeros((1, 8, 8, 4))
    img = jnp.zeros((1, 64, 64, 3))
    ctx = jnp.zeros((1, 77, ccfg.hidden_size))
    # jit the inits: eager init dispatches thousands of ops individually,
    # which is pathologically slow over a remote-tunneled TPU
    params = {
        "unet": jax.jit(unet.init)(ks[0], latent, jnp.int32(0), ctx),
        "vae": jax.jit(vae.init)(ks[1], img),
        "controlnet": jax.jit(controlnet.init)(ks[2], latent, jnp.int32(0), ctx, img),
        "text": jax.jit(text_encoder.init)(ks[3], jnp.zeros((1, 77), jnp.int32)),
        "gmflow": jax.jit(gmflow.init)(ks[4], img, img),
    }

    if load_weights and not tiny:
        params = _maybe_load_pretrained(params, config, ucfg, vcfg, ccfg)
    if load_weights:
        params = _maybe_apply_lora(params, config)

    tokenizer = make_tokenizer(
        _local_ckpt_dir(
            config.sd_path, os.path.dirname(str(config.gmflow_path)) or "."
        ),
        ccfg.vocab_size,
    )

    detector = _build_detector(config, tiny=tiny)
    saliency_fn = _build_saliency(config) if config.use_saliency else None
    return ModelBundle(
        unet, vae, controlnet, text_encoder, gmflow, scheduler,
        params, tokenizer, detector, saliency_fn,
    )


_AUX_DTYPES = {"bfloat16": jnp.bfloat16, "float16": jnp.float16}


def _aux_caster(aux_dtype: str):
    """Pytree/array caster for the aux-model forwards (config.aux_dtype):
    identity for float32, float-leaf downcast otherwise.  GMFlow params
    stay f32 masters in the bundle and are cast in-graph inside
    _interframe (bandwidth noise next to the forward they feed); EGNet
    params are the one exception — _build_saliency casts them ONCE at
    build time because its eager forward would otherwise re-dispatch a
    per-leaf cast of a ResNet-50 tree on every call.  Consequence:
    changing aux_dtype requires a fresh pipeline (see set_config)."""
    dt = _AUX_DTYPES.get(aux_dtype)
    if dt is None:
        return lambda tree: tree
    cast_leaf = lambda t: (
        t.astype(dt)
        if hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jnp.floating)
        else t
    )
    return lambda tree: jax.tree.map(cast_leaf, tree)


def _build_detector(config: FrescoConfig, tiny: bool):
    """Control-signal detector by type, with weight-availability fallback
    (reference falls back to hed, run_fresco.py:60-62; here canny is the
    only weight-free option)."""
    ctype = config.controlnet_type
    ckpt_dir = os.path.dirname(str(config.gmflow_path)) or "."
    if ctype == "hed" and not tiny:
        hed_path = os.path.join(ckpt_dir, "ControlNetHED.pth")
        if os.path.exists(hed_path):
            from fresco_tpu.models import convert as C
            from fresco_tpu.models.hed import HED, convert_hed

            model = HED()
            params = {"params": convert_hed(C.load_torch_state_dict(hed_path))}
            fn = jax.jit(model.apply)
            return lambda img: np.asarray(
                jnp.clip(fn(params, jnp.asarray(img, jnp.float32)[None])[0] * 255, 0, 255)
            ).astype(np.uint8)
        print("[fresco_tpu] HED weights not found; falling back to canny")
    if ctype == "depth" and not tiny:
        dpt_path = os.path.join(ckpt_dir, "dpt_hybrid-midas-501f0c75.pt")
        if os.path.exists(dpt_path):
            from fresco_tpu.models import convert as C
            from fresco_tpu.models.midas import (
                DPTHybridDepth, convert_dpt_hybrid, midas_detector,
            )

            model = DPTHybridDepth()
            params = {"params": convert_dpt_hybrid(C.load_torch_state_dict(dpt_path))}
            return lambda img: midas_detector(model, params, img)[0]
        print("[fresco_tpu] MiDaS weights not found; falling back to canny")
    if ctype == "mlsd" and not tiny:
        mlsd_path = os.path.join(ckpt_dir, "mlsd_large_512_fp32.pth")
        if os.path.exists(mlsd_path):
            from fresco_tpu.models import convert as C
            from fresco_tpu.models.mlsd import MLSDLarge, convert_mlsd, mlsd_detector

            model = MLSDLarge()
            params = {"params": convert_mlsd(C.load_torch_state_dict(mlsd_path))}
            return lambda img: mlsd_detector(model, params, img)
        print("[fresco_tpu] MLSD weights not found; falling back to canny")
    if ctype in ("openpose", "pose") and not tiny:
        pose_path = os.path.join(ckpt_dir, "body_pose_model.pth")
        if os.path.exists(pose_path):
            from fresco_tpu.models import convert as C
            from fresco_tpu.models.openpose import (
                BodyPose, convert_openpose, openpose_detector,
            )

            model = BodyPose()
            params = {"params": convert_openpose(C.load_torch_state_dict(pose_path))}
            return lambda img: openpose_detector(model, params, img)
        print("[fresco_tpu] OpenPose weights not found; falling back to canny")
    return functools.partial(
        _canny_detector, low=config.canny_low, high=config.canny_high
    )


def _build_saliency(config: FrescoConfig):
    """EGNet background-mask fn when weights are present, else None."""
    if not config.sod_path or not os.path.exists(str(config.sod_path)):
        return None
    from fresco_tpu.models import convert as C
    from fresco_tpu.models.egnet import EGNet, convert_egnet, make_saliency_fn

    model = EGNet()
    params = {"params": convert_egnet(C.load_torch_state_dict(config.sod_path))}
    params = _aux_caster(config.aux_dtype)(params)
    return make_saliency_fn(
        model, params, dtype=_AUX_DTYPES.get(config.aux_dtype)
    )


def _local_ckpt_dir(spec, ckpt_dir: str) -> str | None:
    """Resolve a checkpoint 'path' that may be a HuggingFace repo id
    (the config defaults: 'stabilityai/sd-vae-ft-mse',
    'runwayml/stable-diffusion-v1-5', ...) to the local directory
    scripts/fetch_weights.py downloads into: the path itself if it is a
    directory, else <ckpt_dir>/<repo basename>, else ./<repo basename>.
    Returns None when nothing exists locally — the caller keeps random
    weights (offline mode)."""
    if not spec:
        return None
    p = str(spec)
    if os.path.isdir(p):
        return p
    base = os.path.basename(p.rstrip("/"))
    for cand in (os.path.join(ckpt_dir, base), os.path.join(".", base)):
        if os.path.isdir(cand):
            return cand
    return None


def _maybe_load_pretrained(params, config, ucfg, vcfg, ccfg):
    """Convert local torch/diffusers checkpoints if the paths exist
    (repo-id config values resolve to the fetch_weights.py layout via
    _local_ckpt_dir)."""
    from fresco_tpu.models import convert as C

    def find(base, sub, names):
        if not base or not os.path.isdir(str(base)):
            return None
        for n in names:
            p = os.path.join(base, sub, n) if sub else os.path.join(base, n)
            if os.path.exists(p):
                return p
        return None

    ckpt_dir = os.path.dirname(str(config.gmflow_path)) or "."
    sd_dir = _local_ckpt_dir(config.sd_path, ckpt_dir) or str(config.sd_path)
    vae_dir = _local_ckpt_dir(config.vae_path, ckpt_dir)
    cn_dir = _local_ckpt_dir(config.controlnet_path, ckpt_dir) or \
        _local_ckpt_dir(f"sd-controlnet-{config.controlnet_type}", ckpt_dir)
    specs = [
        ("unet", find(sd_dir, "unet", ["diffusion_pytorch_model.safetensors",
                                       "diffusion_pytorch_model.bin"]),
         lambda sd: C.convert_unet(sd, ucfg)),
        ("vae", find(vae_dir or sd_dir, "" if vae_dir else "vae",
                     ["diffusion_pytorch_model.safetensors",
                      "diffusion_pytorch_model.bin"]),
         lambda sd: C.convert_vae(sd, vcfg)),
        ("text", find(sd_dir, "text_encoder", ["model.safetensors",
                                               "pytorch_model.bin"]),
         lambda sd: C.convert_clip_text(sd, ccfg)),
        ("controlnet", find(cn_dir, "",
                            ["diffusion_pytorch_model.safetensors",
                             "diffusion_pytorch_model.bin"]),
         lambda sd: C.convert_controlnet(sd, ucfg)),
    ]
    for name, path, fn in specs:
        if path:
            sd = C.load_torch_state_dict(path)
            params[name] = {"params": fn(sd)}
            print(f"[fresco_tpu] loaded {name} weights from {path}")
    if config.gmflow_path and os.path.exists(config.gmflow_path):
        from fresco_tpu.models.gmflow.convert import convert_gmflow

        sd = C.load_torch_state_dict(config.gmflow_path)
        params["gmflow"] = {"params": convert_gmflow(sd)}
        print(f"[fresco_tpu] loaded gmflow weights from {config.gmflow_path}")

    return params


def _maybe_apply_lora(params, config):
    """LoRA merge (reference WebUI community-base path, webUI.py:429-434):
    deltas folded into the UNet / text-encoder kernels at load time."""
    if not config.lora_path or not os.path.exists(str(config.lora_path)):
        return params
    from fresco_tpu.models import convert as C
    from fresco_tpu.models.lora import merge_lora

    lora_sd = C.load_torch_state_dict(str(config.lora_path))
    params["unet"], n_unet = merge_lora(
        params["unet"], lora_sd, config.lora_scale, target="lora_unet_"
    )
    params["text"], n_text = merge_lora(
        params["text"], lora_sd, config.lora_scale, target="lora_te_"
    )
    print(
        f"[fresco_tpu] merged LoRA {config.lora_path} "
        f"(scale={config.lora_scale}): {n_unet} unet + {n_text} text modules"
    )
    return params


class FrescoPipeline:
    """run_fresco-equivalent orchestration."""

    # block on each phase's outputs so phase times are real device times
    # instead of async-dispatch times, and run batch prep serially (no
    # prep/denoise overlap) so timers can't absorb queued device work —
    # off by default, enabled by the profiling benchmarks.  Class-level
    # default: tests construct partial pipelines via object.__new__.
    sync_phases = False

    @staticmethod
    def _make_sampler_cfg(config: FrescoConfig) -> SamplerConfig:
        gcfg = GuidanceConfig(
            iters=config.opt_iters, lr=config.opt_lr,
            intra_weight=config.intra_weight,
            optimize_temporal=config.optimize_temporal,
            gram_dtype=config.gram_dtype,
        )
        return SamplerConfig(
            num_inference_steps=config.num_inference_steps,
            num_warmup_steps=config.num_warmup_steps,
            guidance_scale=config.guidance_scale,
            use_controlnet=config.use_controlnet,
            repeat_noise=config.repeat_noise,
            num_intraattn_steps=config.num_intraattn_steps,
            step_interattn_end=config.step_interattn_end,
            bg_smoothing_steps=tuple(config.bg_smoothing_steps),
            end_opt_step=config.end_opt_step,
            guidance=gcfg,
            do_opt=config.use_fresco_opt,
        )

    def set_config(self, config: FrescoConfig) -> None:
        """Adopt a new config WITHOUT rebuilding the models.  Everything
        the sampler reads per batch (steps, warmup, guidance scale,
        attention/opt toggles, bg smoothing) is re-derived here; a
        changed step count just retraces on the next batch.  Fields that
        alter the BUILT models or already-traced programs — sd_path,
        lora_*, controlnet_type, use_freeu, use_saliency, dtype, and
        aux_dtype (EGNet params are cast once at build and the aux
        forwards' cast is baked into the cached _interframe trace) —
        still require a fresh FrescoPipeline (the WebUI's GlobalState
        tracks those)."""
        self.config = config
        self._base_sampler_cfg = self._make_sampler_cfg(config)

    def __init__(self, config: FrescoConfig, bundle: ModelBundle | None = None,
                 *, tiny: bool = False):
        self.config = config
        self.bundle = bundle or build_models(config, tiny=tiny, seed=config.seed)
        b = self.bundle
        self.sampler = FrescoSampler(b.unet, b.vae, b.controlnet, b.scheduler)

        # --- mesh execution (SURVEY.md §2.6): frames shard over 'data',
        # params over 'model' (Megatron TP).  GSPMD inserts the
        # cross-frame/trajectory all-gathers from these shardings alone.
        self.mesh = None
        if int(np.prod(config.mesh_shape)) > 1:
            from fresco_tpu.parallel.sharding import make_mesh, shard_model_params

            self.mesh = make_mesh(*config.mesh_shape)
            b.params = jax.device_put(
                b.params, shard_model_params(b.params, self.mesh)
            )

        self._base_sampler_cfg = self._make_sampler_cfg(config)

        self._sample_jit = jax.jit(
            self.sampler.sample, static_argnames=("cfg",)
        )

        self._interframe_jit = jax.jit(self._interframe)
        self._intraframe_jit = jax.jit(self._intraframe)
        self._decode_jit = jax.jit(self.sampler.decode)

        from fresco_tpu.utils.profiling import PhaseTimes

        self.phases = PhaseTimes()

    # --- jittable param-prep wrappers -------------------------------------
    def _interframe(self, params, frames_255):
        flow_fn = self.bundle.flow_fn
        if flow_fn is None:
            gm = self.bundle.gmflow
            cast = _aux_caster(self.config.aux_dtype)

            # f64 sharding-validation mode keeps flows at full precision
            # (parallel/smoke.py: sub-ulp noise must not cross the
            # occlusion/threshold discontinuities); all other modes
            # upcast the aux-dtype forward's output to f32 for the
            # threshold/mapping math downstream
            flow_t = (jnp.float64 if self.config.dtype == "float64"
                      else jnp.float32)

            def flow_fn(a, b):
                return gm.apply(
                    cast(params["gmflow"]), cast(a), cast(b)
                ).astype(flow_t)

        return prepare.interframe_params(
            flow_fn, frames_255, photo_thresh=self.config.photo_occ_thresh
        )

    def _intraframe(self, params, frames, prompt_embeds, rng):
        # reference grams stored in the same dtype the loss computes in,
        # so gram_dtype="float32" is strict parity end-to-end
        corr_dtype = {
            "float64": jnp.float64,  # f64 sharding-validation mode
        }.get(self.config.dtype,
              jnp.bfloat16 if self.config.gram_dtype == "bfloat16"
              else jnp.float32)
        return prepare.intraframe_params(
            self.bundle.unet, self.bundle.vae, params, self.bundle.scheduler,
            frames, prompt_embeds, rng, corr_dtype=corr_dtype,
        )

    # --- host-side orchestration -------------------------------------------
    def read_frames(self):
        cfg = self.config
        cap = cv2.VideoCapture(cfg.file_path)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if cfg.frame_count:  # webUI.py frame_count slider; None/0 = all
            n = min(n, int(cfg.frame_count))
        frames = []
        for _ in range(n):
            ok, f = cap.read()
            if not ok:
                break
            frames.append(resize_image(cv2.cvtColor(f, cv2.COLOR_BGR2RGB),
                                       cfg.resolution))
        cap.release()
        return frames

    def translate_keyframes(self, verbose: bool = True,
                            reuse: bool = False) -> list[int]:
        """Full keyframe translation (run_fresco.py:111-270).

        ``reuse``: resume affordance — when every keyframe PNG already
        exists under save_path/keys (an interrupted earlier run), skip
        the translation entirely and return the key indices."""
        cfg = self.config
        b = self.bundle
        os.makedirs(os.path.join(cfg.save_path, "keys"), exist_ok=True)
        os.makedirs(os.path.join(cfg.save_path, "video"), exist_ok=True)

        frames = self.read_frames()
        keys = select_keyframes(
            cfg.file_path, len(frames), cfg.mininterv, cfg.maxinterv
        )
        keys = [k for k in keys if k < len(frames)]
        from PIL import Image

        for i, f in enumerate(frames):
            Image.fromarray(f).save(
                os.path.join(cfg.save_path, "video", "%04d.png" % i)
            )

        if reuse and all(
            os.path.exists(os.path.join(cfg.save_path, "keys", "%04d.png" % k))
            for k in keys
        ):
            if verbose:
                print("[fresco_tpu] all keyframes present — skipping "
                      "translation (resume)")
            return keys

        sublists = keyframe_sublists(keys, cfg.batch_size)
        if verbose:
            print(f"[fresco_tpu] {len(sublists)} batches: {sublists}")

        a_prompt, n_prompt = default_prompts(cfg.sd_path)
        a_prompt = cfg.a_prompt if cfg.a_prompt is not None else a_prompt
        n_prompt = cfg.n_prompt if cfg.n_prompt is not None else n_prompt

        # Per-batch inputs are fully input-derived: the anchor frames a
        # propagation batch prepends are the first OVERALL keyframe and
        # the previous batch's last keyframe — input frames, not
        # translated outputs (run_fresco.py:262-265) — so batch k+1's
        # prep (upload, prompts, detector, GMFlow/EGNet, mapping build,
        # attention params) has no dependency on batch k's result and
        # can run while batch k's denoise scan owns the device.  Only
        # the latent record crosses batches (pipe_FRESCO.py:175-179),
        # and only _run_batch consumes it.
        extra = dict(cfg.extra_prompts)
        batch_imgs: list[list[np.ndarray]] = []
        batch_prompts: list[list[str]] = []
        for batch_ind, sub in enumerate(sublists):
            cur = [frames[i] for i in sub]
            cur_p = [cfg.prompt + a_prompt + extra.get(i, "") for i in sub]
            if batch_ind == 0:
                batch_imgs.append(cur)
                batch_prompts.append(cur_p)
            else:
                batch_imgs.append(
                    [batch_imgs[0][0], batch_imgs[batch_ind - 1][-1]] + cur
                )
                batch_prompts.append(
                    [batch_prompts[0][0], batch_prompts[batch_ind - 1][-1]]
                    + cur_p
                )

        from concurrent.futures import ThreadPoolExecutor

        from fresco_tpu.utils.guards import check_finite

        record = None
        rng = jax.random.key(cfg.seed)
        prep_ex = ThreadPoolExecutor(max_workers=1)

        def prep(k):
            return self._prepare_batch(
                batch_imgs[k], batch_prompts[k],
                [n_prompt] * len(batch_imgs[k]), rng,
            )

        try:
            # sync_phases mode runs prep serially: overlapped prep-thread
            # timers would block behind whatever device work is already
            # queued (the concurrent denoise scan) and report queue wait,
            # not phase cost — the exact misattribution the flag exists
            # to prevent
            overlap = not self.sync_phases
            fut = (prep_ex.submit(prep, 0)
                   if (sublists and overlap) else None)
            for batch_ind, sub in enumerate(sublists):
                t0 = time.time()
                propagation = batch_ind > 0
                prepared = fut.result() if overlap else prep(batch_ind)
                if overlap and batch_ind + 1 < len(sublists):
                    fut = prep_ex.submit(prep, batch_ind + 1)
                latents = self._run_batch(prepared, record, propagation, rng)
                check_finite(f"batch{batch_ind}_latents", latents[0])
                record = latents[1]
                with phase_timer(self.phases, "vae_decode"):
                    images = unit_range_to_uint8(
                        self._decode_jit(b.params, latents[0])
                    )
                bias = 2 if propagation else 0
                for ind, num in enumerate(sub):
                    Image.fromarray(images[ind + bias]).save(
                        os.path.join(cfg.save_path, "keys", "%04d.png" % num)
                    )
                if verbose:
                    print(
                        f"[fresco_tpu] batch {batch_ind+1}/{len(sublists)}: "
                        f"{len(sub)} keyframes in {time.time()-t0:.1f}s"
                    )
        finally:
            # a denoise/decode failure must not hang on queued prep work
            # draining over the tunnel (same policy as blend_video)
            prep_ex.shutdown(wait=False, cancel_futures=True)
        if verbose:
            print("[fresco_tpu] " + self.phases.report())
        return keys

    def evaluate_consistency(self, frame_dir: str, max_frames: int = 32) -> dict:
        """Temporal-consistency report for a frame directory
        (BASELINE.md acceptance metrics: flow-warp error under GMFlow +
        frame similarity).  Called by the CLI after propagation and by
        the e2e tests as a regression bound.

        Long clips are sampled as a CENTERED contiguous window of
        ``max_frames`` (consecutive frames are required for flow warp to
        mean anything): a head-truncated window would score only the
        first keyframe interval, which blending treats specially (it is
        anchored on both sides by the strongest keys)."""
        from fresco_tpu import metrics

        files = sorted(
            f for f in os.listdir(frame_dir) if f.endswith((".png", ".jpg"))
        )
        if len(files) > max_frames:
            lo = (len(files) - max_frames) // 2
            files = files[lo : lo + max_frames]
        if len(files) < 2:
            return {}
        frames = np.stack(
            [
                cv2.cvtColor(cv2.imread(os.path.join(frame_dir, f)),
                             cv2.COLOR_BGR2RGB)
                for f in files
            ]
        )
        gpath = str(self.config.gmflow_path)
        if gpath and os.path.exists(gpath):
            b = self.bundle
            flow_fn = jax.jit(
                lambda a, bb: b.gmflow.apply(b.params["gmflow"], a, bb)
            )
        else:
            # no GMFlow checkpoint (offline): random-weight flows are
            # meaningless AND force a full-res GMFlow compile — measure
            # under classic Farneback flow instead (same fallback as
            # bench.py; flows enter as constants for these frames)
            from fresco_tpu.utils.classic_flow import make_flow_fn

            flow_fn = make_flow_fn(list(frames))
        # real CLIP frame similarity when a vision checkpoint sits next
        # to the other model files (BASELINE.md metric; proxy otherwise)
        ckpt_dir = os.path.dirname(str(self.config.gmflow_path)) or "."
        clip_enc = None
        for name in ("clip_vision.safetensors", "clip_vision.bin",
                     "clip_model.safetensors"):
            clip_enc = metrics.make_clip_image_encoder(
                os.path.join(ckpt_dir, name)
            )
            if clip_enc:
                break
        return metrics.evaluate_translation(frames, flow_fn, clip_enc)

    def _shard_batch(self, x):
        """Place a frame-major array on the mesh: leading axis over 'data'
        when divisible, replicated otherwise (ragged last batches)."""
        if self.mesh is None or not hasattr(x, "ndim"):
            return x
        from fresco_tpu.parallel.sharding import frame_sharding, replicated

        if x.ndim >= 1 and x.shape[0] % self.mesh.shape["data"] == 0:
            return jax.device_put(x, frame_sharding(self.mesh, x.ndim))
        return jax.device_put(x, replicated(self.mesh))

    def _translate_batch(self, imgs, prompts, n_prompts, record, propagation, rng):
        """Prep + denoise for one batch, serially.  The pipelined path
        (translate_keyframes) calls _prepare_batch on a prep thread and
        _run_batch on the main thread instead, so batch k+1's prep
        overlaps batch k's denoise scan."""
        prepared = self._prepare_batch(imgs, prompts, n_prompts, rng)
        return self._run_batch(prepared, record, propagation, rng)

    def _prepare_batch(self, imgs, prompts, n_prompts, rng):
        """Everything the sampler needs that does NOT depend on earlier
        batches' outputs: frame upload, prompt encoding, control signal,
        inter/intra-frame param prep, attention params.  Safe to run for
        batch k+1 while batch k's denoise scan owns the device — the
        host work (detector, mapping compaction, fetches) overlaps the
        scan, and the small device programs slot in behind it.  The
        reference pays all of this serially between batches
        (run_fresco.py:199-234)."""
        cfg = self.config
        b = self.bundle
        sync = force_fetch if self.sync_phases else (lambda x: x)
        # upload frames ONCE as uint8 (4x less host->device traffic — the
        # tunnel transfer dominated otherwise) and convert on device
        with phase_timer(self.phases, "upload_frames"):
            frames_u8 = sync(self._shard_batch(jnp.asarray(np.stack(imgs))))
        ftype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        frames_255 = frames_u8.astype(ftype)
        frames_unit = frames_255 / 255.0 * 2.0 - 1.0

        with phase_timer(self.phases, "encode_prompts"):
            prompt_embeds = sync(self._shard_batch(encode_prompts(
                b.text_encoder, b.params["text"], b.tokenizer, prompts, n_prompts
            )))

        # control signal (run_fresco.py:199-202)
        with phase_timer(self.phases, "control_detector"):
            edges_np = np.stack([b.detector(im) for im in imgs])
        if edges_np.ndim == 3:
            edges_np = edges_np[..., None]
        # single-channel uint8 upload; broadcast + scale on device
        edges_u8 = self._shard_batch(jnp.asarray(edges_np))
        edges = jnp.broadcast_to(
            edges_u8.astype(ftype) / 255.0, (*edges_u8.shape[:3], 3)
        )

        fresco_state = FrescoState()
        attn = None
        if cfg.use_fresco_attn or cfg.use_fresco_opt or cfg.use_saliency:
            with phase_timer(self.phases, "interframe_prep"):
                flows, occs, cf_masks, trajectories = sync(self._interframe_jit(
                    b.params, frames_255
                ))
            saliency = None
            if cfg.use_saliency and b.saliency_fn is not None:
                with phase_timer(self.phases, "saliency"):
                    saliency = sync(self._shard_batch(b.saliency_fn(np.stack(imgs))))
            with phase_timer(self.phases, "intraframe_prep"):
                ref_feats, correlations = sync(self._intraframe_jit(
                    b.params, frames_unit, prompt_embeds, rng
                ))
            if cfg.use_fresco_attn:
                with phase_timer(self.phases, "attn_params"):
                    attn = prepare.build_attn_params(
                        cf_masks if cfg.use_cfattn else None,
                        ref_feats, trajectories,
                        intra_scale=cfg.intraattn_scale_factor,
                        inter_scale=cfg.interattn_scale_factor,
                        cf_key_cap=cfg.cf_key_cap,
                    )
            fresco_state = FrescoState(
                attn=attn,
                fwd_flow=flows[0], bwd_flow=flows[1],
                fwd_occ=occs[0], bwd_occ=occs[1],
                saliency=saliency,
                correlations=correlations if cfg.use_fresco_opt else None,
            )

        return {
            "frames_unit": frames_unit,
            "prompt_embeds": prompt_embeds,
            "edges": edges,
            "fresco_state": fresco_state,
        }

    def _run_batch(self, prepared, record, propagation, rng):
        """The denoise scan on a _prepare_batch result (latent record
        from the previous batch enters here — the only inter-batch data
        dependency, pipe_FRESCO.py:175-179)."""
        cfg = self.config
        b = self.bundle
        sync = force_fetch if self.sync_phases else (lambda x: x)
        sampler_cfg = dataclasses.replace(
            self._base_sampler_cfg, propagation_mode=propagation
        )
        cond_scale = jnp.full((cfg.num_inference_steps,), cfg.cond_scale)
        with phase_timer(self.phases, "denoise_loop"):
            latents, record_out = sync(self._sample_jit(
                b.params, prepared["frames_unit"], prepared["prompt_embeds"],
                prepared["edges"], cond_scale,
                prepared["fresco_state"], record, rng, sampler_cfg,
            ))
        return latents, record_out
