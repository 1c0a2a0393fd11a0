"""Distributed fine-tuning step for the SD UNet (dp + tp over a mesh).

The reference is inference-only; this extends the framework with the
standard diffusion fine-tuning objective (epsilon prediction MSE) so
custom SD bases / video-specific adaptation can be trained on TPU pods:
data parallel over the frame batch, tensor parallel over attention/MLP
kernels (fresco_tpu.parallel.sharding), gradients reduced by GSPMD.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from fresco_tpu.diffusion.scheduler import DDPMScheduler


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def train_step(
    unet,
    tx: optax.GradientTransformation,
    scheduler: DDPMScheduler,
    state: TrainState,
    latents: jnp.ndarray,
    text_embeds: jnp.ndarray,
    rng: jax.Array,
) -> tuple[TrainState, jnp.ndarray]:
    """One epsilon-prediction step.  latents [B,h,w,4] (clean, scaled),
    text_embeds [B,77,C].  Pure; pjit over (data, model) mesh by sharding
    `latents`/`text_embeds` on data and params per sharding rules."""
    rng_t, rng_n = jax.random.split(jax.random.fold_in(rng, state.step))
    b = latents.shape[0]
    t = jax.random.randint(rng_t, (b,), 0, scheduler.num_train_timesteps)
    noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
    ac = scheduler.alphas_cumprod[t][:, None, None, None]
    noisy = jnp.sqrt(ac) * latents + jnp.sqrt(1.0 - ac) * noise

    def loss_fn(params):
        eps = unet.apply(params, noisy, t, text_embeds)
        return jnp.mean((eps.astype(jnp.float32) - noise) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss
