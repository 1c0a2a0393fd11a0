"""Measured-and-REJECTED propagation alternatives — negative-result
records.

Nothing here is on the maintained path.  Each entry was implemented,
validated, benchmarked on the v5e, and found slower than what ships;
it is kept so the rejection stays reproducible.  The maintained
synthesis paths are ``patchmatch.synthesize`` (single job, freeze-
compaction tiers) and ``parallel.synthesize_sharded`` (one chain per
mesh device).  See PERF.md for the measurements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fresco_tpu.ops.resize import resize_bilinear
from fresco_tpu.propagate.patchmatch import (
    PatchMatchConfig,
    _pyramid_sizes,
    _synthesize_level,
)


def synthesize_batch(
    styles: jnp.ndarray,
    source_guides: jnp.ndarray,
    target_guides: jnp.ndarray,
    guide_channel_weights: jnp.ndarray,
    cfg: PatchMatchConfig = PatchMatchConfig(),
    rng: jax.Array | None = None,
):
    """Batched guided synthesis: vmap of the level kernel over a leading
    job axis (an interval's forward+backward chains, or equal-length
    intervals, as ONE device program — the reference fans these out as
    OS processes + subprocess calls, video_blend.py:114-139).

    REJECTED (PERF.md rounds 2-4): batching does NOT amortize — the
    remaining dynamic gathers scale with table rows, so batch-2 at
    512px measured 15.1 s/frame vs 11.9 single-job (r2), and vmap
    lowers the freeze-compaction ``lax.cond`` tiers to selects that
    execute EVERY tier, so the r3 2.47× compaction win is forfeited.
    Production batching is ``parallel.synthesize_sharded`` (shard_map:
    each device runs the full single-job program, tiers intact).
    """
    if rng is None:
        rng = jax.random.key(0)
    nb, sh, sw, cs = styles.shape
    th, tw = target_guides.shape[1:3]
    weights_s = jnp.full((cs,), cfg.style_weight / cs, jnp.float32)

    def make_level_fn(seeded: int):
        return jax.vmap(
            functools.partial(
                _synthesize_level,
                patch=cfg.patch_size,
                pm_iters=cfg.pm_iters,
                sv_iters=cfg.sv_iters,
                uniformity=cfg.uniformity,
                rand_candidates=cfg.rand_candidates,
                stop_threshold=cfg.stop_threshold,
                seeded=seeded,
                table_u8=cfg.table_dtype == "uint8",
            ),
            in_axes=(0, 0, 0, None, None, 0, 0),
        )

    sizes = _pyramid_sizes(sh, sw, th, tw, cfg.patch_size, cfg.num_pyramid_levels)
    nnf = None
    for li, ((lsh, lsw), (lth, ltw)) in enumerate(sizes):
        s_style = resize_bilinear(styles, (lsh, lsw))
        s_guides = resize_bilinear(source_guides, (lsh, lsw))
        t_guides = resize_bilinear(target_guides, (lth, ltw))
        src_all = jnp.concatenate([s_style, s_guides], axis=-1)

        rng, k_init, k_run = jax.random.split(rng, 3)
        r = cfg.patch_size // 2
        if nnf is None:
            nnf = jnp.stack(
                [
                    jax.random.randint(k_init, (nb, lth, ltw), r, lsh - r),
                    jax.random.randint(
                        jax.random.fold_in(k_init, 1), (nb, lth, ltw), r, lsw - r
                    ),
                ],
                axis=-1,
            )
        else:
            up = resize_bilinear(nnf.astype(jnp.float32), (lth, ltw))
            nnf = (up * 2.0).astype(jnp.int32)

        nnf, out, err = make_level_fn(
            int(cfg.trim_seeded_levels) if li > 0 else 0
        )(
            src_all, t_guides, s_style, guide_channel_weights, weights_s,
            nnf, jax.random.split(k_run, nb),
        )
    if cfg.extra_pass_3x3:
        extra_fn = jax.vmap(
            functools.partial(
                _synthesize_level,
                patch=3,
                pm_iters=cfg.pm_iters,
                sv_iters=cfg.sv_iters,
                uniformity=0.0,
                rand_candidates=cfg.rand_candidates,
                stop_threshold=cfg.stop_threshold,
                seeded=int(cfg.trim_seeded_levels),
                table_u8=cfg.table_dtype == "uint8",
            ),
            in_axes=(0, 0, 0, None, None, 0, 0),
        )
        rng, k_extra = jax.random.split(rng)
        nnf, out, err = extra_fn(
            src_all, t_guides, s_style, guide_channel_weights, weights_s,
            nnf, jax.random.split(k_extra, nb),
        )
    return out, err, nnf
