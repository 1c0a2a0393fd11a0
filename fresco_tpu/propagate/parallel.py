"""Interval-parallel patch synthesis over a device mesh.

The reference fans propagation out as up to 8 CPU worker processes over
keyframe intervals (reference video_blend.py:114-139, MAX_PROCESS=8
video_blend.py:25), each shelling out to the ebsynth binary per frame.
TPU-native equivalent: one interval chain per device, all chains
advancing in lockstep as ONE SPMD program per pyramid level.

Design notes
------------
* ``jax.shard_map`` over a 1-axis ``jobs`` mesh with a per-shard batch
  of exactly 1.  The shard body squeezes the job axis and runs the
  SAME single-job ``_synthesize_level`` program as the serial path —
  crucially this keeps the freeze-compaction tiers as real per-device
  ``lax.cond`` branches (a vmap over jobs lowers cond to select and
  executes every tier — measured slower, rejected in round 2/3).
* Zero cross-device communication: chains are independent given
  keyframes + flows, so there are no collectives anywhere; scaling to
  n devices is embarrassing by construction.  On an 8-chip v5e the
  wave wall-clock equals the single-job wall plus host guide prep.
* Bit parity: per-job rng streams reproduce the serial ``synthesize``
  split structure exactly, so sharded == serial output per interval
  (asserted by tests/test_parallel_propagation.py and the driver
  dryrun).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fresco_tpu.ops.resize import resize_bilinear
from fresco_tpu.propagate.patchmatch import (
    PatchMatchConfig,
    _pyramid_sizes,
    _synthesize_level,
)


def jobs_mesh(n_jobs: int, devices=None) -> Mesh:
    """1-axis mesh over the first ``n_jobs`` devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_jobs:
        raise ValueError(f"need {n_jobs} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_jobs]), ("jobs",))


def _level_body(src_all, t_guides, s_style, wg, ws, nnf, key, **kw):
    """Per-shard body: squeeze the (size-1) job axis and run the exact
    single-job level program."""
    nnf1, out1, err1 = _synthesize_level(
        src_all[0], t_guides[0], s_style[0], wg, ws, nnf[0], key[0], **kw
    )
    return nnf1[None], out1[None], err1[None]


@functools.lru_cache(maxsize=None)
def _split3_fn(jsh):
    return jax.jit(
        jax.vmap(lambda k: jax.random.split(k, 3)), out_shardings=jsh
    )


@functools.lru_cache(maxsize=None)
def _init_nnf_fn(jsh, lth, ltw, r, lsh, lsw):
    """Per-job random NNF init — same stream as the serial synthesize."""

    def init_one(k):
        return jnp.stack(
            [
                jax.random.randint(k, (lth, ltw), r, lsh - r),
                jax.random.randint(
                    jax.random.fold_in(k, 1), (lth, ltw), r, lsw - r
                ),
            ],
            axis=-1,
        )

    return jax.jit(jax.vmap(init_one), out_shardings=jsh)


@functools.lru_cache(maxsize=None)
def _sharded_level_fn(
    mesh, patch, pm_iters, sv_iters, uniformity, rand_candidates,
    stop_threshold, seeded, tiers, table_u8=False,
):
    """Memoized jit(shard_map(level)) per (mesh, statics) — a fresh
    wrapper per call would miss jax's jit cache and recompile every
    chain step."""
    body = functools.partial(
        _level_body,
        patch=patch,
        pm_iters=pm_iters,
        sv_iters=sv_iters,
        uniformity=uniformity,
        rand_candidates=rand_candidates,
        stop_threshold=stop_threshold,
        seeded=seeded,
        compact_tiers=tiers,
        table_u8=table_u8,
    )
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P("jobs"), P("jobs"), P("jobs"), P(), P(), P("jobs"),
                P("jobs"),
            ),
            out_specs=(P("jobs"), P("jobs"), P("jobs")),
            check_vma=False,
        )
    )


def synthesize_sharded(
    styles: jnp.ndarray,          # [B,Hs,Ws,Cs]
    source_guides: jnp.ndarray,   # [B,H,W,Cg]
    target_guides: jnp.ndarray,   # [B,H,W,Cg]
    guide_channel_weights: jnp.ndarray,  # [Cg]
    cfg: PatchMatchConfig = PatchMatchConfig(),
    rngs: jax.Array | None = None,  # [B] key array, one stream per job
    mesh: Mesh | None = None,
):
    """Synthesize B independent jobs, one per mesh device.

    Identical semantics (including rng streams) to B serial calls of
    ``patchmatch.synthesize(styles[i], ..., rng=rngs[i])``; returns
    (out [B,Ht,Wt,Cs], err [B,Ht,Wt], nnf [B,Ht,Wt,2]).
    """
    nb = styles.shape[0]
    if rngs is None:
        rngs = jax.random.split(jax.random.key(0), nb)
    if mesh is None:
        mesh = jobs_mesh(nb)
    if mesh.devices.size != nb:
        raise ValueError(f"mesh has {mesh.devices.size} devices for {nb} jobs")
    jsh = NamedSharding(mesh, P("jobs"))
    rep = NamedSharding(mesh, P())

    sh, sw = styles.shape[1:3]
    th, tw = target_guides.shape[1:3]
    cs = styles.shape[-1]
    weights_s = jnp.full((cs,), cfg.style_weight / cs, jnp.float32)
    sizes = _pyramid_sizes(sh, sw, th, tw, cfg.patch_size, cfg.num_pyramid_levels)

    styles = jax.device_put(jnp.asarray(styles), jsh)
    source_guides = jax.device_put(jnp.asarray(source_guides), jsh)
    target_guides = jax.device_put(jnp.asarray(target_guides), jsh)
    gw = jax.device_put(jnp.asarray(guide_channel_weights, jnp.float32), rep)
    keys = jax.device_put(rngs, jsh)

    def level_fn(seeded: int, tiers: tuple, patch: int, uniformity: float):
        return _sharded_level_fn(
            mesh, patch, cfg.pm_iters, cfg.sv_iters, uniformity,
            cfg.rand_candidates, cfg.stop_threshold, seeded, tiers,
            table_u8=cfg.table_dtype == "uint8",
        )

    def tiers_for(lth: int, ltw: int) -> tuple:
        return (
            tuple(cfg.compact_tiers)
            if lth * ltw >= 16384 and cfg.stop_threshold > 0
            else ()
        )

    nnf = None
    out = err = None
    split3 = _split3_fn(jsh)
    for li, ((lsh, lsw), (lth, ltw)) in enumerate(sizes):
        s_style = resize_bilinear(styles, (lsh, lsw))
        s_guides = resize_bilinear(source_guides, (lsh, lsw))
        t_guides = resize_bilinear(target_guides, (lth, ltw))
        src_all = jnp.concatenate([s_style, s_guides], axis=-1)

        ks = split3(keys)
        keys, k_init, k_run = ks[:, 0], ks[:, 1], ks[:, 2]
        if nnf is None:
            r = cfg.patch_size // 2
            nnf = _init_nnf_fn(jsh, lth, ltw, r, lsh, lsw)(k_init)
        else:
            up = resize_bilinear(nnf.astype(jnp.float32), (lth, ltw))
            nnf = (up * 2.0).astype(jnp.int32)

        seeded = int(cfg.trim_seeded_levels) if li > 0 else 0
        nnf, out, err = level_fn(
            seeded, tiers_for(lth, ltw), cfg.patch_size, cfg.uniformity
        )(src_all, t_guides, s_style, gw, weights_s, nnf, k_run)
    if cfg.extra_pass_3x3:
        # finest-level rerun, patch 3, uniformity 0 (ebsynth_cpu.cpp:983-989)
        ks = split3(keys)
        keys, k_extra = ks[:, 0], ks[:, 1]
        nnf, out, err = level_fn(
            int(cfg.trim_seeded_levels), tiers_for(th, tw), 3, 0.0
        )(src_all, t_guides, s_style, gw, weights_s, nnf, k_extra)
    return out, err, nnf
