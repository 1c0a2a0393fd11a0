"""Real-program sharded smoke: the FULL FRESCO sampler on a device mesh.

Runs the actual ``FrescoPipeline`` batch path (parameter prep + the
scanned sampler with cross-frame + spatial + trajectory attention,
feature optimization, background smoothing, record/restore — reference
src/pipe_FRESCO.py:80-233) on tiny models, optionally over a
(data × model) mesh, so sharded execution can be asserted numerically
equal to the single-device program.  Used by
``__graft_entry__.dryrun_multichip`` and tests/test_parallel.py.

Why float64 (and jax_enable_x64) for the equality check: the sampler
contains sign()/threshold discontinuities (L1 losses in the feature-
optimization Adam loop at lr 0.2, occlusion thresholds) that AMPLIFY
any reduction-reassociation difference between the sharded and single-
device compilations into O(0.1) divergence (measured: f32 DP-only
already hits 2e-2).  In f64 the reassociation noise is ~1e-16 and
essentially never crosses a discontinuity, so sharded == single holds
to tight tolerance while exercising the identical program structure.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def run_full_sampler(
    mesh_shape: tuple[int, int] = (1, 1),
    *,
    frames: int = 4,
    res: int = 64,
    steps: int = 4,
    seed: int = 0,
    dtype: str = "float64",
    opt_iters: int = 2,
    two_batches: bool = True,
    verbose: bool = False,
) -> np.ndarray:
    """Translate one synthetic batch through the real pipeline.

    Returns the final latents as numpy.  All FRESCO mechanisms are
    enabled: saliency is stubbed (no EGNet weights offline) so that the
    background-smoothing VAE round-trip runs inside the scan too.

    ``two_batches=True`` runs a second batch that consumes the first's
    recorded anchor latents (two sampler compiles).  The fast mode
    (``two_batches=False``, used by the time-budgeted driver dryrun)
    compiles the sampler ONCE: a single propagation-mode batch with a
    synthetic ``record_in`` exercises restore (sampler body
    ``latents.at[0:2].set``) and record (``record_out`` ys) in the same
    program — reference pipe_FRESCO.py:175-179 semantics either way.
    """
    import time

    from fresco_tpu.core.config import FrescoConfig
    from fresco_tpu.pipeline.runner import FrescoPipeline

    say = print if verbose else (lambda *a, **k: None)
    config = FrescoConfig(
        mesh_shape=mesh_shape,
        resolution=res,
        batch_size=frames,
        num_inference_steps=steps,
        num_warmup_steps=1,
        end_opt_step=max(steps - 1, 1),
        bg_smoothing_steps=(steps - 2,),
        opt_iters=opt_iters,
        use_saliency=True,
        dtype=dtype,  # float64 default: see module docstring
        # identity aux cast: the default bf16 aux forwards would inject
        # rounding that can flip occlusion-threshold pixels DIFFERENTLY
        # between the sharded and single-device compilations, defeating
        # the f64-exactness premise of the sharded==single check
        aux_dtype="float32",
        prompt="a smoke test",
    )
    t0 = time.time()
    pipe = FrescoPipeline(config, tiny=True)
    # stub saliency so warp_and_fuse background smoothing is exercised
    sal_dtype = jnp.float64 if dtype == "float64" else jnp.float32
    pipe.bundle.saliency_fn = lambda imgs: jnp.full(
        (imgs.shape[0], res // 8, res // 8, 1), 0.5, sal_dtype
    )
    say(f"[smoke {mesh_shape}] models built {time.time()-t0:.1f}s")

    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (frames, res, res, 3)).astype(np.uint8)
    prompts = ["a smoke test"] * frames
    nprompts = ["bad"] * frames

    jrng = jax.random.key(seed)
    if two_batches:
        t0 = time.time()
        latents, record = pipe._translate_batch(
            list(imgs), prompts, nprompts, None, False, jrng
        )
        say(f"[smoke {mesh_shape}] batch 1 (record) {time.time()-t0:.1f}s")
        # second batch in propagation mode: exercises the record/restore
        # path (pipe_FRESCO.py:175-179) under the same mesh
        t0 = time.time()
        latents2, _ = pipe._translate_batch(
            list(imgs), prompts, nprompts, record, True, jrng
        )
        say(f"[smoke {mesh_shape}] batch 2 (restore) {time.time()-t0:.1f}s")
        out = np.concatenate([np.asarray(latents), np.asarray(latents2)])
    else:
        n_rec = steps - 1  # scan length after the 1 warmup step
        lat_t = jnp.float64 if dtype == "float64" else jnp.float32
        record = jax.random.normal(
            jax.random.key(seed + 1), (n_rec, 2, res // 8, res // 8, 4), lat_t
        )
        t0 = time.time()
        latents, record_out = pipe._translate_batch(
            list(imgs), prompts, nprompts, record, True, jrng
        )
        say(f"[smoke {mesh_shape}] batch (record+restore) {time.time()-t0:.1f}s")
        assert record_out.shape == record.shape
        out = np.asarray(latents)
    assert np.all(np.isfinite(out)), "sampler produced non-finite latents"
    return out
