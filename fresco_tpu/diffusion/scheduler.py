"""DDPM scheduler (SD 1.5 configuration), pure-functional.

Re-derivation of the DDPM posterior step used by the reference
(src/pipe_FRESCO.py:14-77, which itself re-derives diffusers'
DDPMScheduler with the SD1.5 scaled-linear beta schedule).  Everything is
expressed as jnp arrays indexed by a traced timestep so a whole sampling
run scans over steps inside one jit.

SD 1.5 schedule: scaled_linear betas, beta_start=0.00085, beta_end=0.012,
1000 train timesteps, epsilon prediction.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    num_inference_steps: int = 20

    @property
    def betas(self) -> jnp.ndarray:
        return (
            jnp.linspace(
                self.beta_start**0.5,
                self.beta_end**0.5,
                self.num_train_timesteps,
                dtype=jnp.float32,
            )
            ** 2
        )

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.cumprod(1.0 - self.betas)

    @property
    def timesteps_np(self):
        """Descending inference timesteps as host numpy (static metadata
        usable inside jitted code)."""
        import numpy as np

        step = self.num_train_timesteps // self.num_inference_steps
        return (np.arange(self.num_inference_steps) * step)[::-1].astype("int32")

    @property
    def timesteps(self) -> jnp.ndarray:
        """Descending inference timesteps (diffusers DDPMScheduler.set_timesteps)."""
        return jnp.asarray(self.timesteps_np)

    def previous_timestep(self, t: jnp.ndarray) -> jnp.ndarray:
        return t - self.num_train_timesteps // self.num_inference_steps

    def add_noise(
        self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0) sampling (SDEdit init, pipe_FRESCO.py:159-161)."""
        ac = self.alphas_cumprod[t].astype(x0.dtype)
        return jnp.sqrt(ac) * x0 + jnp.sqrt(1.0 - ac) * noise

    def predict_x0(
        self, sample: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """Predicted original sample from epsilon (DDIM eq. 12)."""
        wd = jnp.promote_types(sample.dtype, jnp.float32)
        ac = self.alphas_cumprod[t].astype(wd)
        return (
            sample.astype(wd) - jnp.sqrt(1.0 - ac) * eps.astype(wd)
        ) / jnp.sqrt(ac)

    def step_from_x0(
        self,
        sample: jnp.ndarray,
        pred_x0: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """DDPM posterior mean + variance noise, given (possibly edited) x0.

        Split from ``predict_x0`` so background smoothing can transform the
        predicted x0 between the two halves (pipe_FRESCO.py:35-75).
        ``noise`` must be standard normal of sample's shape (pass the same
        row repeated for the reference's repeat_noise mode).
        """
        wd = jnp.promote_types(sample.dtype, jnp.float32)
        prev_t = self.previous_timestep(t)
        ac_t = self.alphas_cumprod[t].astype(wd)
        ac_prev = jnp.where(
            prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0
        ).astype(wd)
        beta_t = 1.0 - ac_t
        beta_prev = 1.0 - ac_prev
        cur_alpha = ac_t / ac_prev
        cur_beta = 1.0 - cur_alpha

        x0_coeff = jnp.sqrt(ac_prev) * cur_beta / beta_t
        xt_coeff = jnp.sqrt(cur_alpha) * beta_prev / beta_t
        mean = x0_coeff * pred_x0.astype(wd) + xt_coeff * sample.astype(wd)

        var = jnp.clip(beta_prev / beta_t * cur_beta, 1e-20, None)
        # diffusers adds variance noise except at the final step (t==0 ->
        # prev_t<0 -> var -> clip floor); the reference keeps noise at every
        # step with the clamped variance, matched here.
        return (mean + jnp.sqrt(var) * noise.astype(wd)).astype(sample.dtype)

    def step(
        self,
        sample: jnp.ndarray,
        eps: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Plain DDPM step; returns (prev_sample, pred_x0)."""
        pred_x0 = self.predict_x0(sample, eps, t)
        prev = self.step_from_x0(sample, pred_x0, t, noise)
        return prev, pred_x0.astype(sample.dtype)
