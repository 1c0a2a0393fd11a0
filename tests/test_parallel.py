"""Mesh-sharding tests on the 8-virtual-device CPU mesh: tensor-parallel
param shardings, data-parallel frame shardings, the distributed train
step, and sharded == unsharded numerics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.models.unet import UNet2DCondition, UNetConfig
from fresco_tpu.parallel.sharding import (
    frame_sharding,
    make_mesh,
    shard_model_params,
)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    rng = jax.random.key(0)
    x = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = unet.init(rng, x, jnp.int32(0), ctx)
    return unet, cfg, params


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_tp_shards_attention_kernels(tiny_unet):
    unet, cfg, params = tiny_unet
    mesh = make_mesh(4, 2)
    sh = shard_model_params(params, mesh)
    q = sh["params"]["down_0_attn_0"]["block"]["attn1"]["to_q"]["kernel"]
    assert q.spec == jax.sharding.PartitionSpec(None, "model")
    out = sh["params"]["down_0_attn_0"]["block"]["attn1"]["to_out"]["kernel"]
    assert out.spec == jax.sharding.PartitionSpec("model", None)


def test_sharded_forward_matches_unsharded(tiny_unet, rng):
    unet, cfg, params = tiny_unet
    f = 8
    x = jnp.asarray(rng.standard_normal((f, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((f, 7, cfg.cross_attention_dim)), jnp.float32)

    ref = unet.apply(params, x, jnp.int32(500), ctx)

    mesh = make_mesh(4, 2)
    params_sh = jax.device_put(params, shard_model_params(params, mesh))
    x_sh = jax.device_put(x, frame_sharding(mesh, x.ndim))
    ctx_sh = jax.device_put(ctx, frame_sharding(mesh, ctx.ndim))

    out = jax.jit(lambda p, a, b: unet.apply(p, a, jnp.int32(500), b))(
        params_sh, x_sh, ctx_sh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_sampler_sharded_matches_single():
    """The REAL program under the mesh: FrescoPipeline._translate_batch
    (all FRESCO mechanisms + record/restore) with mesh_shape=(2,2) equals
    the single-device run (VERDICT r1 item 1).

    Runs in a subprocess with jax_enable_x64: the sampler's sign/
    threshold discontinuities amplify f32 reassociation noise between
    different shardings to O(1e-2) (see parallel/smoke.py docstring);
    in f64 the check is tight and robust."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import os;"
        "os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')"
        " + ' --xla_force_host_platform_device_count=8';"
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64', True);"
        "import numpy as np;"
        "from fresco_tpu.parallel.smoke import run_full_sampler;"
        "single = run_full_sampler((1, 1), frames=4);"
        "sharded = run_full_sampler((2, 2), frames=4);"
        "np.testing.assert_allclose(sharded, single, atol=1e-5, rtol=1e-5);"
        "print('sharded==single OK', np.abs(sharded-single).max())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800, cwd=repo,
    )
    assert out.returncode == 0, (out.stdout + out.stderr)[-2000:]
    assert "sharded==single OK" in out.stdout


def test_distributed_train_step_runs(tiny_unet, rng):
    import optax

    from fresco_tpu.diffusion.scheduler import DDPMScheduler
    from fresco_tpu.parallel.train import make_train_state, train_step

    unet, cfg, params = tiny_unet
    mesh = make_mesh(8, 1)
    params_sh = jax.device_put(params, shard_model_params(params, mesh))
    tx = optax.adamw(1e-4)
    state = make_train_state(params_sh, tx)

    latents = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 8, 8, 4)), jnp.float32),
        frame_sharding(mesh, 4),
    )
    ctx = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 7, cfg.cross_attention_dim)), jnp.float32),
        frame_sharding(mesh, 3),
    )
    sched = DDPMScheduler(num_inference_steps=4)

    step = jax.jit(lambda s, l, c, r: train_step(unet, tx, sched, s, l, c, r))
    state2, loss = step(state, latents, ctx, jax.random.key(0))
    assert np.isfinite(float(loss))
    # params actually changed
    k0 = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    )
    k1 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert not np.allclose(k0, k1)
