"""DDPM scheduler golden tests against the posterior formulas
(reference src/pipe_FRESCO.py:14-77) implemented independently in numpy."""
import numpy as np

import jax
import jax.numpy as jnp

from fresco_tpu.diffusion.scheduler import DDPMScheduler


def _np_schedule(s: DDPMScheduler):
    betas = (
        np.linspace(s.beta_start**0.5, s.beta_end**0.5, s.num_train_timesteps) ** 2
    )
    return np.cumprod(1 - betas)


def test_timesteps_descending():
    s = DDPMScheduler(num_inference_steps=20)
    t = np.asarray(s.timesteps)
    assert t[0] == 950 and t[-1] == 0 and len(t) == 20
    assert np.all(np.diff(t) == -50)


def test_add_noise_formula(rng):
    s = DDPMScheduler()
    ac = _np_schedule(s)
    x0 = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    noise = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    t = 700
    out = np.asarray(s.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.int32(t)))
    expected = np.sqrt(ac[t]) * x0 + np.sqrt(1 - ac[t]) * noise
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_step_posterior_formula(rng):
    s = DDPMScheduler(num_inference_steps=20)
    ac = _np_schedule(s)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    noise = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    t = 950
    prev, x0 = s.step(jnp.asarray(x), jnp.asarray(eps), jnp.int32(t), jnp.asarray(noise))

    # reference pipe_FRESCO.py:22-75 formulas
    tp = t - 50
    a_t, a_p = ac[t], ac[tp]
    b_t, b_p = 1 - a_t, 1 - a_p
    cur_a = a_t / a_p
    cur_b = 1 - cur_a
    pred_x0 = (x - np.sqrt(b_t) * eps) / np.sqrt(a_t)
    mean = (np.sqrt(a_p) * cur_b / b_t) * pred_x0 + (np.sqrt(cur_a) * b_p / b_t) * x
    var = max(b_p / b_t * cur_b, 1e-20)
    expected = mean + np.sqrt(var) * noise

    np.testing.assert_allclose(np.asarray(x0), pred_x0, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prev), expected, rtol=2e-4, atol=1e-5)


def test_final_step_uses_alpha_prev_one(rng):
    s = DDPMScheduler(num_inference_steps=20)
    ac = _np_schedule(s)
    x = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    eps = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    t = 0
    prev, _ = s.step(jnp.asarray(x), jnp.asarray(eps), jnp.int32(t), jnp.zeros_like(jnp.asarray(x)))
    a_t = ac[0]
    pred_x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    # alpha_prod_prev == 1 -> posterior collapses to pred_x0
    np.testing.assert_allclose(np.asarray(prev), pred_x0, rtol=2e-4, atol=1e-5)


def test_step_is_jittable():
    s = DDPMScheduler(num_inference_steps=20)

    @jax.jit
    def f(x, eps, t, noise):
        return s.step(x, eps, t, noise)[0]

    x = jnp.ones((1, 2, 2, 1))
    out = f(x, x * 0.1, jnp.int32(500), x * 0)
    assert out.shape == x.shape
