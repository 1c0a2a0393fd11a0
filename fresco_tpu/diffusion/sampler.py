"""End-to-end FRESCO denoising sampler: one jitted program per batch.

Equivalent of reference src/pipe_FRESCO.py:80-233 (``inference``) +
run_fresco.py:231-245, re-designed for XLA: VAE encode (SDEdit init) ->
``lax.scan`` over denoise steps -> final latents.  Each scanned step runs
ControlNet, the FRESCO UNet (attention variants + inner-Adam feature
optimization + background feature smoothing), CFG, and the custom DDPM
step with optional decoded-image background smoothing — with per-step
gating delivered as scanned arrays and applied via ``lax.cond`` so the
whole 12-17-step loop is a single compiled program.

Inter-batch long-video propagation (pipe_FRESCO.py:175-179): the scan
consumes ``record_in`` (anchor latents per step from the previous batch)
and emits ``record_out`` as its ys.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from fresco_tpu.attention.fresco_attention import FrescoAttnParams
from fresco_tpu.diffusion.guidance import GuidanceConfig, optimize_feature
from fresco_tpu.diffusion.scheduler import DDPMScheduler
from fresco_tpu.ops.blend import warp_and_fuse


@flax.struct.dataclass
class FrescoState:
    """Per-batch precomputed FRESCO inputs (all optional, all pytrees)."""

    attn: FrescoAttnParams | None = None
    fwd_flow: jnp.ndarray | None = None  # [F, H, W, 2]
    bwd_flow: jnp.ndarray | None = None
    fwd_occ: jnp.ndarray | None = None   # [F, H, W]
    bwd_occ: jnp.ndarray | None = None
    saliency: jnp.ndarray | None = None  # [F, h, w, 1] background mask
    # per-decoder-stage reference grams {stage: [2F, hw, hw]} for the
    # spatial feature-optimization loss
    correlations: Any = None


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_inference_steps: int = 20
    num_warmup_steps: int = 6
    guidance_scale: float = 7.5
    use_controlnet: bool = True
    # The reference repeats only the INITIAL SDEdit noise across frames
    # (run_fresco.py:245 passes repeat_noise=True to inference(), which
    # tiles prepare_latents output); the per-step DDPM variance noise is
    # drawn independently per frame (inference() calls step() with the
    # default repeat_noise=False).  The two knobs are therefore split.
    repeat_noise: bool = True        # initial SDEdit noise tiled over frames
    repeat_step_noise: bool = False  # per-step variance noise tiled (non-reference)
    num_intraattn_steps: int = 1
    step_interattn_end: int = 350
    bg_smoothing_steps: tuple[int, ...] = (16, 17)
    end_opt_step: int = 15
    opt_layers: tuple[int, ...] = (0, 1, 2, 3)  # decoder stages to optimize
    guidance: GuidanceConfig = GuidanceConfig()
    propagation_mode: bool = False
    do_opt: bool = True
    bg_smooth_latents: bool = True  # decoded-image smoothing in step()
    bg_vae_chunk: int = 8  # frames per VAE round-trip group (memory/speed)


class FrescoSampler:
    """Binds the model modules; ``sample`` is pure in (params, inputs)."""

    def __init__(self, unet, vae, controlnet, scheduler: DDPMScheduler):
        self.unet = unet
        self.vae = vae
        self.controlnet = controlnet
        self.scheduler = scheduler

    def _step_gates(self, cfg: SamplerConfig):
        """Static per-step gate arrays for the scan (pipe_FRESCO.py:171-174,
        222-228; run_fresco.py:232 end_opt_step)."""
        s = self.scheduler
        # negative warmup = x0_strength > 1: pure-noise init, ALL steps
        # run (pipe_FRESCO.py:155-157)
        warmup = max(cfg.num_warmup_steps, 0)
        ts = s.timesteps_np[warmup:]
        idx = np.arange(len(ts)) + warmup
        return dict(
            t=jnp.asarray(ts),
            use_intra=jnp.asarray(np.arange(len(ts)) < cfg.num_intraattn_steps),
            use_inter=jnp.asarray(ts >= cfg.step_interattn_end),
            do_opt=jnp.asarray((idx < cfg.end_opt_step) & cfg.do_opt),
            do_bg=jnp.asarray(np.isin(idx, np.asarray(cfg.bg_smoothing_steps))),
            step_index=jnp.asarray(idx),
        )

    def sample(
        self,
        params: dict,
        frames: jnp.ndarray,
        prompt_embeds: jnp.ndarray,
        edges: jnp.ndarray | None,
        cond_scale: jnp.ndarray,
        fresco: FrescoState,
        record_in: jnp.ndarray | None,
        rng: jax.Array,
        cfg: SamplerConfig,
    ):
        """Translate one keyframe batch.

        frames: [F, H, W, 3] in [-1,1]; prompt_embeds: [2F, 77, 768]
        (uncond first half — reference CFG layout); edges: [F, H, W, 3]
        in [0,1]; cond_scale: [T] per-step ControlNet scales; record_in:
        [T', 2, h, w, 4] anchor latents from the previous batch (or None).
        Returns (latents [F,h,w,4], record_out [T',2,h,w,4]).
        """
        f = frames.shape[0]
        s = self.scheduler
        rng_init, rng_enc, rng_steps = jax.random.split(rng, 3)
        # latent-path dtype: f32 normally; f64 in the sharding-validation
        # mode (any f64->f32 truncation of computed values amplifies
        # reassociation noise ~1e5x through rounding-boundary straddles)
        lat_t = jnp.promote_types(frames.dtype, jnp.float32)

        # SDEdit init (pipe_FRESCO.py:152-161)
        latent_hw = (frames.shape[1] // 8, frames.shape[2] // 8)
        noise_shape = (f, *latent_hw, 4)
        if cfg.repeat_noise:
            noise = jnp.tile(
                jax.random.normal(rng_init, (1, *noise_shape[1:]), lat_t),
                (f, 1, 1, 1),
            )
        else:
            noise = jax.random.normal(rng_init, noise_shape, lat_t)

        if cfg.num_warmup_steps < 0:
            # x0_strength > 1: ignore the input frames entirely — pure
            # Gaussian init and the full step schedule
            # (pipe_FRESCO.py:155-157; DDPM init_noise_sigma = 1)
            latents = noise
        else:
            latent_x0 = self.vae.apply(
                params["vae"], frames, rng=rng_enc, method=self.vae.encode
            ).astype(lat_t)
            t_init = s.timesteps[cfg.num_warmup_steps]
            latents = s.add_noise(latent_x0, noise, t_init)

        gates = self._step_gates(cfg)
        n_steps = int(gates["t"].shape[0])
        if record_in is None:
            record_in = jnp.zeros((n_steps, 2, *latent_hw, 4), lat_t)

        # hoist the edge-image conditioning embedding out of the step loop
        # (fixed per batch; the reference recomputes it every step)
        cond_emb = None
        if cfg.use_controlnet and edges is not None:
            from fresco_tpu.models.controlnet import embed_cond

            edges2 = jnp.concatenate([edges] * 2, axis=0)
            cond_emb = embed_cond(self.controlnet, params["controlnet"], edges2)

        def unet_step(latents, t, use_intra, use_inter, do_opt, scale_i):
            lmi = jnp.concatenate([latents] * 2, axis=0).astype(lat_t)
            if cond_emb is not None:
                ctrl = self.controlnet.apply(
                    params["controlnet"], lmi, t, prompt_embeds, cond_emb,
                    scale_i, cond_is_embedded=True,
                )
            else:
                ctrl = None

            attn = fresco.attn
            if attn is not None:
                attn = attn.replace(use_intra=use_intra, use_inter=use_inter)

            def guidance_fn(stage, x):
                if (
                    fresco.correlations is None
                    and fresco.fwd_flow is None
                ) or stage not in cfg.opt_layers:
                    return x
                corr = None
                if fresco.correlations is not None:
                    corr = fresco.correlations.get(stage)

                def run(x):
                    y = optimize_feature(
                        x,
                        fresco.fwd_flow,
                        fresco.bwd_flow,
                        fresco.fwd_occ,
                        fresco.bwd_occ,
                        corr,
                        cfg.guidance,
                        # intraframe_params always emits the FACTORED
                        # form; the shape sniff is ambiguous when a
                        # stage's hw equals its channel count
                        corr_is_dense=False,
                    )
                    if fresco.saliency is not None and fresco.fwd_flow is not None:
                        y = warp_and_fuse(
                            y, fresco.fwd_flow, fresco.bwd_flow,
                            fresco.fwd_occ, fresco.bwd_occ, fresco.saliency,
                            chunk=cfg.guidance.chunk,
                        )
                    return y

                return jax.lax.cond(do_opt, run, lambda x: x, x)

            eps = self.unet.apply(
                params["unet"], lmi, t, prompt_embeds,
                controlnet_residuals=ctrl, fresco=attn, guidance_fn=guidance_fn,
            ).astype(lat_t)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return eps_u + cfg.guidance_scale * (eps_c - eps_u)

        def body(latents, xs):
            (t, use_intra, use_inter, do_opt, do_bg, idx, rec_in, scale_i) = xs
            if cfg.propagation_mode:
                latents = latents.at[0:2].set(rec_in)
                rec_out = jnp.stack([latents[0], latents[f - 1]])
            else:
                rec_out = jnp.stack([latents[0], latents[f - 1]])

            eps = unet_step(latents, t, use_intra, use_inter, do_opt, scale_i)

            pred_x0 = s.predict_x0(latents, eps, t)

            if cfg.bg_smooth_latents and fresco.saliency is not None:
                def smooth(x0):
                    # VAE round-trip in frame chunks (lax.map over groups):
                    # batch-F decoder activations at 512px are the scan
                    # body's largest transient — chunking bounds the peak
                    # while keeping the VAE convs batched (per-frame map
                    # measured ~0.33 s/frame; groups of 4 amortize it)
                    g = math.gcd(x0.shape[0], cfg.bg_vae_chunk)
                    img = jax.lax.map(
                        lambda z: self.vae.apply(
                            params["vae"], z, method=self.vae.decode
                        ),
                        x0.reshape(x0.shape[0] // g, g, *x0.shape[1:]),
                    )
                    img = img.reshape(x0.shape[0], *img.shape[2:])
                    img = warp_and_fuse(
                        img.astype(lat_t), fresco.fwd_flow, fresco.bwd_flow,
                        fresco.fwd_occ, fresco.bwd_occ, fresco.saliency, chunk=1,
                    )
                    rng_s = jax.random.fold_in(
                        jax.random.fold_in(rng_steps, 7919), idx
                    )
                    out = jax.lax.map(
                        lambda zi: self.vae.apply(
                            params["vae"], zi[0], rng=zi[1],
                            method=self.vae.encode,
                        ).astype(lat_t),
                        (
                            img.reshape(img.shape[0] // g, g, *img.shape[1:]),
                            jax.random.split(rng_s, img.shape[0] // g),
                        ),
                    )
                    return out.reshape(x0.shape)

                pred_x0 = jax.lax.cond(do_bg, smooth, lambda x: x, pred_x0)

            rng_t = jax.random.fold_in(rng_steps, idx)
            if cfg.repeat_step_noise:
                var_noise = jnp.tile(
                    jax.random.normal(rng_t, (1, *latents.shape[1:]), lat_t),
                    (f, 1, 1, 1),
                )
            else:
                var_noise = jax.random.normal(rng_t, latents.shape, lat_t)
            latents = s.step_from_x0(latents, pred_x0, t, var_noise)
            return latents, rec_out

        xs = (
            gates["t"], gates["use_intra"], gates["use_inter"],
            gates["do_opt"], gates["do_bg"], gates["step_index"],
            record_in, cond_scale[max(cfg.num_warmup_steps, 0) :],
        )
        latents, record_out = jax.lax.scan(body, latents, xs)
        return latents, record_out

    def decode(self, params, latents):
        """Final VAE decode to [-1,1] images (run_fresco.py:250-253)."""
        img = self.vae.apply(params["vae"], latents, method=self.vae.decode)
        return jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
