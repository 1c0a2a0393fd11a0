"""Guided patch-based synthesis (ebsynth/StyLit equivalent) on TPU.

The reference's one true native subsystem: a C++/CUDA coarse-to-fine
PatchMatch search-vote synthesizer (reference
src/ebsynth/deps/ebsynth/src/ebsynth_cpu.cpp:664-993, ebsynth_cuda.cu)
driven per frame-pair through a subprocess (video_blend.py:96-106).

TPU re-design (SURVEY.md §2.5): the serpentine CPU propagation is
inherently sequential, so propagation becomes **jump-flooding**: each
iteration evaluates, for every pixel *in parallel*, a static candidate
set — the current match, neighbor matches at power-of-two offsets
(shift-adjusted), and exponentially-decaying random search samples —
and keeps the argmin.  A few such data-parallel sweeps converge like
serpentine passes but vectorize perfectly over the VPU.  The vote step
is a static 25-offset gather-mean.  The uniformity (omega) term is a
scatter-add usage histogram, recomputed per search-vote iteration
(ebsynth_cpu.cpp:470-528).

Weight semantics match the CLI (ebsynth.cpp:642-670): style channels
sum to ``style_weight`` total; each guide's weight is divided by its
channel count.  Pyramid depth: coarsest level ≥ 2·patch+1
(ebsynth.cpp:676-696).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from fresco_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class PatchMatchConfig:
    patch_size: int = 5           # ebsynth.cpp default
    uniformity: float = 3500.0    # ebsynth.cpp default
    pm_iters: int = 6             # video_blend.py:101 -patchmatchiters
    sv_iters: int = 12            # video_blend.py:101 -searchvoteiters
    style_weight: float = 1.0
    num_pyramid_levels: int = -1  # -1 => auto
    rand_candidates: int = 4
    extra_pass_3x3: bool = False
    # -stopthreshold (ebsynth.cpp:342 default 5): a pixel whose voted
    # style changed < this (max abs channel diff) since the previous
    # search-vote iteration is frozen (mask dilated by patch — CUDA
    # backend krnlEvalMask/krnlDilateMask, ebsynth_cuda.cu:538-583; the
    # CPU backend compiles the same logic out).  On TPU the per-pixel
    # freeze saves no work (data-parallel sweeps), but when EVERY pixel
    # freezes the remaining search-vote iterations are skipped entirely
    # (lax.while_loop early exit).  0 disables.
    stop_threshold: float = 5.0
    # Candidate-set trim at upsample-SEEDED pyramid levels: the coarsest
    # level starts from a random NNF and needs the long jump-flood
    # shifts (up to 8) plus 4 random-search scales; finer levels start
    # from the upsampled converged NNF and only refine locally, so the
    # shift-8 propagation and the widest random radius almost never win
    # a candidate there.  Each dropped candidate removes one wide
    # row-gather per PatchMatch iteration — the measured per-iteration
    # wall (PERF.md).  0/False = full candidate set at every level;
    # 1/True = drop shift-8 + the widest random scale (PERF.md r3:
    # −0.05 dB); 2 = additionally drop shift-4 + one more random scale
    # (quality measured in PERF.md).
    trim_seeded_levels: bool | int = True
    # Gather-table storage dtype.  "uint8" is MEASURED-AND-REJECTED as
    # a default (PERF.md round 4): it halves the row bytes of the
    # per-candidate wide gather (omega as two fixed-point uint8
    # columns, quality −0.02 dB) but runs ~3% SLOWER — XLA's TPU gather
    # on sublane-packed uint8 rows spends more on unpacking than the
    # halved bytes save.  The option stays tested as the negative-
    # result record; "bfloat16" is the maintained path.
    table_dtype: str = "bfloat16"
    # Active-pixel compaction tiers for the stop-threshold freeze mask.
    # The candidate row-gather cost is per-ROW and width-independent
    # (scripts/bench_gather.py: ~26 ns/row), and the measured freeze
    # trajectory collapses to <2% active after 2-3 search-vote
    # iterations (scripts/debug_active_counts.py) — yet the data-
    # parallel sweeps kept gathering every row.  Each tier t compiles a
    # pm scan that evaluates candidates only at the first N//t
    # active-first compacted positions; at runtime lax.cond picks the
    # smallest tier the live active count fits (falling back to the
    # full sweep), so frozen rows stop paying gathers.  Candidate SETS
    # for active pixels are unchanged (shift propagation still reads
    # the full-grid NNF; random search draws per-compacted-pixel), so
    # this is quality-neutral up to RNG stream (PSNR-guarded in
    # tests/PERF.md).  () disables.  Only applied at levels with
    # >= 16384 target pixels and only in non-vmapped synthesis (vmap
    # would lower cond to select and execute every tier).  The N/2 tier
    # matters for noise-like styles (random-weight keyframes) whose
    # freeze fraction plateaus near 40-50% at the finest level;
    # smooth/natural styles collapse to <2% and ride the deeper tiers
    # (both trajectories in PERF.md).
    compact_tiers: tuple = (2, 4, 16)


def _pyramid_sizes(h: int, w: int, t_h: int, t_w: int, patch: int, max_levels: int):
    """Coarse-to-fine level sizes; coarsest min-dim ≥ 2·patch+1."""
    sizes = []
    level = 0
    while True:
        f = 2 ** level
        sh, sw = max(h // f, 1), max(w // f, 1)
        th, tw = max(t_h // f, 1), max(t_w // f, 1)
        if min(sh, sw, th, tw) < 2 * patch + 1 and level > 0:
            break
        sizes.append(((sh, sw), (th, tw)))
        if min(sh, sw, th, tw) == 1:
            break
        level += 1
        if 0 < max_levels <= len(sizes):
            break
    return sizes[::-1]  # coarse -> fine


def _offsets(patch: int):
    r = patch // 2
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def _gather2d(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """img [H,W,C]; ys/xs int [...]; clamped gather -> [..., C]."""
    h, w = img.shape[:2]
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    flat = img.reshape(h * w, -1)
    return flat[ys * w + xs]


def _patch_error(
    nnf_y, nnf_x, src_patches, tgt_patches, weights, patch: int, sw: int
):
    """SSD between the source patch at (nnf_y, nnf_x) and the target patch
    at every pixel.

    src_patches: [sh*sw, n_off*C] PRE-STACKED source neighborhoods
    (bf16) — each candidate costs ONE wide row-gather instead of n_off
    narrow ones.  XLA TPU gathers pay a fixed per-row cost, so the
    per-offset formulation was gather-serialized (measured 34.7 s/frame
    at 256px; this layout is the fix).  tgt_patches: [Ht, Wt, n_off*C];
    weights: [n_off*C] (per-channel weights tiled over offsets).
    Returns [Ht, Wt] float32."""
    flat = nnf_y * sw + nnf_x
    s = jnp.take(src_patches, flat.reshape(-1), axis=0)
    s = s.reshape(*nnf_y.shape, src_patches.shape[-1])
    d = (s - tgt_patches).astype(jnp.float32)
    return jnp.einsum("hwc,c->hw", d * d, weights)


def _shifted(img: jnp.ndarray, dy: int, dx: int, pad: int) -> jnp.ndarray:
    """Clamped static shift as edge-pad + slice — XLA lowers gathers
    (even with static iota indices) to per-row loops on TPU; a slice is
    pure vectorized data movement."""
    h, w = img.shape[:2]
    p = jnp.pad(img, ((pad, pad), (pad, pad)) + ((0, 0),) * (img.ndim - 2),
                mode="edge")
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(p, pad + dy, h, axis=0), pad + dx, w, axis=1
    )


def _target_patches(tgt: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[H,W,C] -> [H,W,n_off,C] clamped neighborhoods (static offsets)."""
    pad = patch  # covers the max |offset|
    padded = jnp.pad(tgt, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    h, w, _ = tgt.shape
    outs = [
        padded[pad + dy : pad + dy + h, pad + dx : pad + dx + w]
        for dy, dx in _offsets(patch)
    ]
    return jnp.stack(outs, axis=2)


def _flat_patches(img: jnp.ndarray, patch: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[H,W,C] -> [H*W, n_off*C] pre-stacked neighborhoods (the row-
    gatherable layout _patch_error consumes).  dtype uint8 quantizes
    with round-to-nearest in the [0, 255] style/guide domain — at that
    range bf16's 8-bit mantissa already spaces values ~1.0 apart, so
    uint8 rounding adds no meaningful error while HALVING the gather
    table's row bytes (the row-gather has a width cost component:
    PERF.md round-3 gather table; VERDICT r3 #7)."""
    h, w, c = img.shape
    p = _target_patches(img, patch).reshape(h * w, -1)
    if dtype == jnp.uint8:
        return jnp.round(jnp.clip(p, 0.0, 255.0)).astype(jnp.uint8)
    return p.astype(dtype)


def _omega(nnf_y, nnf_x, sh, sw, patch):
    """Source usage histogram over patch footprints (scatter-add)."""
    counts = jnp.zeros((sh * sw,), jnp.float32)
    idx = (jnp.clip(nnf_y, 0, sh - 1) * sw + jnp.clip(nnf_x, 0, sw - 1)).reshape(-1)
    counts = counts.at[idx].add(1.0)
    # spread to patch footprint via box filter (separable)
    c2 = counts.reshape(1, sh, sw, 1)
    pad = patch // 2
    c2 = jnp.pad(c2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    c2 = jax.lax.reduce_window(
        c2, 0.0, jax.lax.add, (1, patch, 1, 1), (1, 1, 1, 1), "VALID"
    )
    c2 = jax.lax.reduce_window(
        c2, 0.0, jax.lax.add, (1, 1, patch, 1), (1, 1, 1, 1), "VALID"
    )
    return c2[0, :, :, 0]  # [sh, sw]


@functools.partial(
    jax.jit,
    static_argnames=(
        "patch", "pm_iters", "sv_iters", "uniformity", "rand_candidates",
        "stop_threshold", "seeded", "debug_counts", "compact_tiers",
        "table_u8",
    ),
)
def _synthesize_level(
    src_all,        # [sh, sw, C] style+guides (source)
    tgt_guides,     # [th, tw, Cg] target guides
    style_src,      # [sh, sw, Cs]
    weights_g,      # [Cg]
    weights_s,      # [Cs]
    nnf,            # [th, tw, 2] int32 (y, x) init
    rng,
    *,
    patch: int,
    pm_iters: int,
    sv_iters: int,
    uniformity: float,
    rand_candidates: int,
    stop_threshold: float = 0.0,
    seeded: int = 0,
    debug_counts: bool = False,
    compact_tiers: tuple = (),
    table_u8: bool = False,
):
    sh, sw = src_all.shape[:2]
    th, tw = tgt_guides.shape[:2]
    r = patch // 2
    cs = style_src.shape[-1]

    # pre-stacked patch layouts (see _patch_error): source [style|guides]
    # rows, target guide half fixed per level.  table_u8 stores the
    # gather table in uint8 (see _flat_patches) with the omega term as
    # two fixed-point uint8 columns — same single wide row-gather,
    # half the bytes.
    src_patches = _flat_patches(
        src_all, patch, jnp.uint8 if table_u8 else jnp.bfloat16
    )  # [sh*sw, n_off*(Cs+Cg)]
    tgt_g_patches = _target_patches(tgt_guides, patch).astype(jnp.bfloat16)
    w_all = jnp.tile(
        jnp.concatenate([weights_s, weights_g]).astype(jnp.float32),
        (patch * patch,),
    )
    ys = jnp.arange(th)[:, None] * jnp.ones((1, tw), jnp.int32)
    xs = jnp.arange(tw)[None, :] * jnp.ones((th, 1), jnp.int32)

    omega_best = (th * tw) / (sh * sw) * (patch * patch)

    def build_table(omega_map):
        """Gather table = src_patches + scaled omega column(s): the
        uniformity usage rides the same wide row-gather as the patch
        SSD (a separate narrow usage gather measured 6 s of the 16 s
        level — per-row gather cost again).  Returns (table, om_scale);
        with table_u8 the omega term is 16-bit fixed point across two
        uint8 columns (hi, lo) with a per-iteration max-normalized
        scale (relative quantization error <= 1/65535)."""
        omega_scaled = (uniformity / omega_best) * omega_map.reshape(-1)
        if table_u8:
            om_max = jnp.maximum(jnp.max(omega_scaled), 1e-20)
            q = jnp.round(omega_scaled * (65535.0 / om_max))
            hi = jnp.floor(q * (1.0 / 256.0))
            lo = q - hi * 256.0
            return (
                jnp.concatenate(
                    [src_patches, hi[:, None].astype(jnp.uint8),
                     lo[:, None].astype(jnp.uint8)], axis=1,
                ),
                om_max * (1.0 / 65535.0),
            )
        return (
            jnp.concatenate(
                [src_patches,
                 omega_scaled[:, None].astype(src_patches.dtype)], axis=1,
            ),
            None,
        )

    def eval_cand(ny, nx, tgt_all_patches, table):
        tbl, om_scale = table
        ny = jnp.clip(ny, r, sh - 1 - r)
        nx = jnp.clip(nx, r, sw - 1 - r)
        flat = ny * sw + nx
        s = jnp.take(tbl, flat.reshape(-1), axis=0)
        s = s.reshape(*ny.shape, tbl.shape[-1])
        n_om = 2 if table_u8 else 1
        d = (
            s[..., :-n_om].astype(jnp.bfloat16) - tgt_all_patches
        ).astype(jnp.float32)
        e = jnp.einsum("...c,c->...", d * d, w_all)
        if uniformity > 0:
            if table_u8:
                e = e + (
                    s[..., -2].astype(jnp.float32) * 256.0
                    + s[..., -1].astype(jnp.float32)
                ) * om_scale
            else:
                e = e + s[..., -1].astype(jnp.float32)
        return ny, nx, e

    # style neighborhoods for the vote: out(p) = mean_i style[nnf(p+o_i)-o_i]
    # = mean_i SP[nnf(p+o_i)][mirror(i)] — ONE wide row-gather of SP per
    # vote + 25 static shifted slices, instead of 25 narrow dynamic gathers
    style_patches = _target_patches(style_src, patch).reshape(
        sh * sw, patch * patch, cs
    )
    n_off = patch * patch

    def vote(nnf_):
        flat = (
            jnp.clip(nnf_[..., 0], 0, sh - 1) * sw
            + jnp.clip(nnf_[..., 1], 0, sw - 1)
        )
        g = jnp.take(style_patches, flat.reshape(-1), axis=0)
        g = g.reshape(th, tw, n_off, cs)
        out = jnp.zeros((th, tw, cs), jnp.float32)
        for i, (dy, dx) in enumerate(_offsets(patch)):
            # offsets are centro-symmetric: mirror(-o_i) = n_off-1-i
            out = out + _shifted(g[:, :, n_off - 1 - i, :], dy, dx, patch)
        return out / n_off

    # seeded levels refine an upsampled NNF: drop the longest shift(s)
    # and the widest random radii (PatchMatchConfig.trim_seeded_levels)
    seeded = int(seeded)
    shifts = {0: [1, 2, 4, 8], 1: [1, 2, 4]}.get(seeded, [1, 2])
    n_rand = max(rand_candidates - seeded, 1) if seeded else rand_candidates

    def sv_iter(carry):
        nnf_, rng_, it, prev_style, _, counts = carry
        tgt_style = vote(nnf_)
        # -stopthreshold freeze mask (ebsynth_cuda.cu:538-583): pixels
        # whose voted style moved < threshold since the last vote are
        # frozen for this iteration; the mask is dilated by the patch
        # size.  Iteration 0 (prev seeded at -inf) is fully active.
        if stop_threshold > 0:
            diff = jnp.max(jnp.abs(tgt_style - prev_style), axis=-1)
            changed = (diff >= stop_threshold).astype(jnp.float32)
            pd = patch // 2
            cpad = jnp.pad(
                changed[None, :, :, None], ((0, 0), (pd, pd), (pd, pd), (0, 0))
            )
            dil = jax.lax.reduce_window(
                cpad, 0.0, jax.lax.max, (1, patch, patch, 1), (1, 1, 1, 1),
                "VALID",
            )
            active = dil[0, :, :, 0] > 0  # [th, tw] bool
        else:
            active = jnp.ones((th, tw), bool)
        tgt_s_patches = _target_patches(tgt_style, patch).astype(jnp.bfloat16)
        # interleave per-offset [style|guide] channels to match src_all's
        # channel order inside each offset block
        tgt_all_patches = jnp.concatenate(
            [tgt_s_patches, tgt_g_patches], axis=-1
        ).reshape(th, tw, -1)
        # scaled uniformity term appended to the gather table (eval_cand)
        omega_map = _omega(nnf_[..., 0], nnf_[..., 1], sh, sw, patch)
        table = build_table(omega_map)

        def consider(by, bx, be, cy, cx, tgt_p):
            ny, nx, e = eval_cand(cy, cx, tgt_p, table)
            better = e < be
            return (
                jnp.where(better, ny, by),
                jnp.where(better, nx, bx),
                jnp.where(better, e, be),
            )

        def rand_deltas(rng2, it2, shape):
            # random search radii with exponential decay (seeded levels
            # skip the widest scale: start the decay one octave in)
            max_rad = max(sh, sw)
            base = 2 if seeded else 1
            rngs = jax.random.split(jax.random.fold_in(rng2, it2), n_rand)
            return [
                jax.random.randint(
                    rngs[j], (*shape, 2),
                    -max(max_rad >> (j + base), 1),
                    max(max_rad >> (j + base), 1) + 1,
                )
                for j in range(n_rand)
            ]

        def run_full(_):
            # the current match's error is invariant across the pm scan
            # (table + target patches are fixed within one sv iteration):
            # evaluate it ONCE and carry (by, bx, be) through the scan —
            # saves one of the per-pm-iteration wide row-gathers (the
            # measured per-iteration wall, PERF.md)
            by0, bx0, be0 = eval_cand(
                nnf_[..., 0], nnf_[..., 1], tgt_all_patches, table
            )

            def pm_iter(carry2, it2):
                by, bx, be, rng2 = carry2
                nnf2 = jnp.stack([by, bx], axis=-1)
                nby, nbx, nbe = by, bx, be
                # jump-flood propagation: neighbor matches, shift-adjusted
                # (static shifts as pad+slice, not gathers)
                for d in shifts:
                    for dy, dx in ((d, 0), (-d, 0), (0, d), (0, -d)):
                        n = _shifted(nnf2, dy, dx, max(shifts))
                        nby, nbx, nbe = consider(
                            nby, nbx, nbe, n[..., 0] - dy, n[..., 1] - dx,
                            tgt_all_patches,
                        )
                for delta in rand_deltas(rng2, it2, (th, tw)):
                    nby, nbx, nbe = consider(
                        nby, nbx, nbe, nby + delta[..., 0], nbx + delta[..., 1],
                        tgt_all_patches,
                    )
                # frozen pixels keep their match AND its carried error
                # (reference skips their propagation/search kernels
                # entirely, ebsynth_cuda.cu:207)
                nby = jnp.where(active, nby, by)
                nbx = jnp.where(active, nbx, bx)
                nbe = jnp.where(active, nbe, be)
                return (nby, nbx, nbe, rng2), None

            (by_, bx_, _, _), _ = jax.lax.scan(
                pm_iter, (by0, bx0, be0, jax.random.fold_in(rng_, it)),
                jnp.arange(pm_iters),
            )
            return jnp.stack([by_, bx_], axis=-1)

        def make_run_compact(k_cap: int):
            # Freeze-compacted pm scan (PatchMatchConfig.compact_tiers):
            # candidates are evaluated only at the first k_cap positions
            # of an active-first stable argsort — exact for the live
            # active set whenever it fits the cap (lax.cond guarantees
            # that), up to the RNG stream of the random search.  Shift
            # propagation still reads the FULL-grid NNF (scattered back
            # each pm iteration) so jump-flood connectivity across
            # frozen regions is preserved.
            def run_compact(_):
                flat_active = active.reshape(-1)
                perm = jnp.argsort(~flat_active, stable=True)[:k_cap]
                activec = jnp.take(flat_active, perm)[:, None]  # [K,1]
                tgt_c = jnp.take(
                    tgt_all_patches.reshape(th * tw, -1), perm, axis=0
                )[:, None, :]  # [K,1,C]

                nnf_flat = nnf_.reshape(-1, 2)
                byc0 = jnp.take(nnf_flat[:, 0], perm)[:, None]
                bxc0 = jnp.take(nnf_flat[:, 1], perm)[:, None]
                byc0, bxc0, bec0 = eval_cand(byc0, bxc0, tgt_c, table)

                def pm_iter(carry2, it2):
                    byc, bxc, bec, full, rng2 = carry2
                    # all shift-candidate maps ride ONE compacted gather
                    # (the gather cost is per-dispatch + per-row; width
                    # is nearly free — bench_gather.py)
                    shifted = []
                    for d in shifts:
                        for dy, dx in ((d, 0), (-d, 0), (0, d), (0, -d)):
                            n = _shifted(full, dy, dx, max(shifts))
                            shifted.append(
                                (n - jnp.array([dy, dx])).reshape(-1, 2)
                            )
                    cand_all = jnp.take(
                        jnp.concatenate(shifted, axis=1), perm, axis=0
                    )  # [K, 2*n_shift_cands]
                    nby, nbx, nbe = byc, bxc, bec
                    ns = len(shifted)
                    # every op pays a ~1ms dispatch floor at compacted
                    # sizes (scripts/bench_compact.py), so all shift
                    # candidates are evaluated through ONE table gather
                    # when the stacked rows fit a sane budget
                    if ns * k_cap * 800 <= 300 * 2**20:
                        cys = cand_all[:, 0::2].T[..., None]  # [ns, K, 1]
                        cxs = cand_all[:, 1::2].T[..., None]
                        ny, nx, es = eval_cand(cys, cxs, tgt_c[None], table)
                        for i in range(ns):
                            better = es[i] < nbe
                            nby = jnp.where(better, ny[i], nby)
                            nbx = jnp.where(better, nx[i], nbx)
                            nbe = jnp.where(better, es[i], nbe)
                    else:
                        for i in range(ns):
                            nby, nbx, nbe = consider(
                                nby, nbx, nbe,
                                cand_all[:, 2 * i : 2 * i + 1],
                                cand_all[:, 2 * i + 1 : 2 * i + 2], tgt_c,
                            )
                    for delta in rand_deltas(rng2, it2, (k_cap, 1)):
                        nby, nbx, nbe = consider(
                            nby, nbx, nbe,
                            nby + delta[..., 0], nbx + delta[..., 1], tgt_c,
                        )
                    # padding rows (frozen pixels pulled in by the cap)
                    # keep their match — same freeze rule as the full path
                    nby = jnp.where(activec, nby, byc)
                    nbx = jnp.where(activec, nbx, bxc)
                    nbe = jnp.where(activec, nbe, bec)
                    full = full.reshape(-1, 2).at[perm].set(
                        jnp.concatenate([nby, nbx], axis=1)
                    ).reshape(th, tw, 2)
                    return (nby, nbx, nbe, full, rng2), None

                (_, _, _, full_, _), _ = jax.lax.scan(
                    pm_iter,
                    (byc0, bxc0, bec0, nnf_, jax.random.fold_in(rng_, it)),
                    jnp.arange(pm_iters),
                )
                return full_

            return run_compact

        n_active = jnp.sum(active.astype(jnp.int32))
        nnf_new = run_full
        for t in sorted(compact_tiers):
            # ceil: tier t covers <= N/t active.  Fractional tiers (e.g.
            # 1.5) target the high-churn plateau where noise-like styles
            # hold 41-67% active at the finest level (PERF.md content
            # dependence) — integer tiers never fire there.
            k_cap = int(-(-(th * tw) // t))
            inner, cap = nnf_new, k_cap
            nnf_new = (
                lambda op, inner=inner, cap=cap: jax.lax.cond(
                    n_active <= cap, make_run_compact(cap), inner, op
                )
            )
        nnf_ = nnf_new(None)
        counts = counts.at[it].set(n_active)
        return (nnf_, rng_, it + 1, tgt_style, jnp.any(active), counts)

    state = (
        nnf, rng, jnp.int32(0),
        jnp.full((th, tw, cs), -1e9, jnp.float32),  # prev vote: iter 0 active
        jnp.array(True),
        # per-iteration active-pixel counts (-1 = iteration skipped by the
        # early exit); returned under debug_counts for freeze diagnostics
        jnp.full((sv_iters,), -1, jnp.int32),
    )
    state = jax.lax.while_loop(
        # early exit when every pixel froze: the reference's remaining
        # iterations would be full no-ops at that point
        lambda s: (s[2] < sv_iters) & s[4],
        sv_iter,
        state,
    )
    nnf = state[0]
    out = vote(nnf)
    # final error at the converged NNF (the reference serializes E from
    # the last pm pass — same matches, same error)
    tgt_s_patches = _target_patches(out, patch).astype(jnp.bfloat16)
    tgt_all_patches = jnp.concatenate(
        [tgt_s_patches, tgt_g_patches], axis=-1
    ).reshape(th, tw, -1)
    omega_map = _omega(nnf[..., 0], nnf[..., 1], sh, sw, patch)
    table = build_table(omega_map)
    _, _, err = eval_cand(nnf[..., 0], nnf[..., 1], tgt_all_patches, table)
    if debug_counts:
        return nnf, out, err, state[5]
    return nnf, out, err


def synthesize(
    style: jnp.ndarray,
    source_guides: jnp.ndarray,
    target_guides: jnp.ndarray,
    guide_channel_weights: jnp.ndarray,
    cfg: PatchMatchConfig = PatchMatchConfig(),
    rng: jax.Array | None = None,
    backend: str = "tpu",
    debug_counts: bool = False,
):
    """Synthesize the target-frame style by guided patch matching.

    style: [Hs,Ws,Cs] (the stylized keyframe, float 0..255);
    source_guides/target_guides: [H,W,Cg] aligned channel stacks;
    guide_channel_weights: [Cg] per-channel weights (already divided by
    the guide's channel count — ebsynth.cpp:669).
    ``backend``: 'tpu' (jump-flood, device) or 'native' (C++ serpentine
    exact-parity mode, fresco_tpu/propagate/native).

    Returns (output [Ht,Wt,Cs], error [Ht,Wt], nnf [Ht,Wt,2]);
    with ``debug_counts`` a 4th element: per-level [sv_iters] int32
    active-pixel counts (-1 = iteration skipped by the early exit) for
    stop-threshold freeze diagnostics.
    """
    if backend == "native":
        return _synthesize_native(
            style, source_guides, target_guides, guide_channel_weights, cfg
        )
    if rng is None:
        rng = jax.random.key(0)
    sh, sw = style.shape[:2]
    th, tw = target_guides.shape[:2]
    cs = style.shape[-1]
    weights_s = jnp.full((cs,), cfg.style_weight / cs, jnp.float32)

    sizes = _pyramid_sizes(sh, sw, th, tw, cfg.patch_size, cfg.num_pyramid_levels)
    nnf = None
    all_counts = []
    for li, ((lsh, lsw), (lth, ltw)) in enumerate(sizes):
        s_style = resize_bilinear(style[None], (lsh, lsw))[0]
        s_guides = resize_bilinear(source_guides[None], (lsh, lsw))[0]
        t_guides = resize_bilinear(target_guides[None], (lth, ltw))[0]
        src_all = jnp.concatenate([s_style, s_guides], axis=-1)

        rng, k_init, k_run = jax.random.split(rng, 3)
        if nnf is None:
            r = cfg.patch_size // 2
            nnf = jnp.stack(
                [
                    jax.random.randint(k_init, (lth, ltw), r, lsh - r),
                    jax.random.randint(jax.random.fold_in(k_init, 1), (lth, ltw), r, lsw - r),
                ],
                axis=-1,
            )
        else:
            up = resize_bilinear(nnf.astype(jnp.float32)[None], (lth, ltw))[0]
            nnf = (up * 2.0).astype(jnp.int32)

        nnf, out, err, *dbg = _synthesize_level(
            src_all, t_guides, s_style, guide_channel_weights, weights_s,
            nnf, k_run,
            patch=cfg.patch_size,
            pm_iters=cfg.pm_iters,
            sv_iters=cfg.sv_iters,
            uniformity=cfg.uniformity,
            rand_candidates=cfg.rand_candidates,
            stop_threshold=cfg.stop_threshold,
            seeded=int(cfg.trim_seeded_levels) if li > 0 else 0,
            debug_counts=debug_counts,
            # coarse levels' gathers are sub-ms: tiers only add compile
            compact_tiers=tuple(cfg.compact_tiers)
            if lth * ltw >= 16384 and cfg.stop_threshold > 0 else (),
            table_u8=cfg.table_dtype == "uint8",
        )
        all_counts.extend(dbg)
    if cfg.extra_pass_3x3:
        # finest level rerun with 3x3 patches and uniformity off, seeded
        # from the converged NNF (ebsynth_cpu.cpp:983-989)
        rng, k_extra = jax.random.split(rng)
        nnf, out, err = _synthesize_level(
            src_all, t_guides, s_style, guide_channel_weights, weights_s,
            nnf, k_extra,
            patch=3,
            pm_iters=cfg.pm_iters,
            sv_iters=cfg.sv_iters,
            uniformity=0.0,
            rand_candidates=cfg.rand_candidates,
            stop_threshold=cfg.stop_threshold,
            seeded=int(cfg.trim_seeded_levels),
            compact_tiers=tuple(cfg.compact_tiers)
            if th * tw >= 16384 and cfg.stop_threshold > 0 else (),
            table_u8=cfg.table_dtype == "uint8",
        )
    if debug_counts:
        return out, err, nnf, all_counts
    return out, err, nnf


def _synthesize_native(style, source_guides, target_guides, guide_weights, cfg):
    """Coarse-to-fine driver for the C++ serpentine backend."""
    import numpy as np

    from fresco_tpu.propagate.native import synthesize_level_native

    style = np.asarray(style, np.float32)
    source_guides = np.asarray(source_guides, np.float32)
    target_guides = np.asarray(target_guides, np.float32)
    gw = np.asarray(guide_weights, np.float32)
    sh, sw, cs = style.shape
    th, tw = target_guides.shape[:2]
    sizes = _pyramid_sizes(sh, sw, th, tw, cfg.patch_size, cfg.num_pyramid_levels)
    sw_arr = np.full((cs,), cfg.style_weight / cs, np.float32)

    def np_resize(x, hw):
        return np.asarray(resize_bilinear(jnp.asarray(x)[None], hw)[0])

    rng = np.random.default_rng(0)
    nnf = None
    for li, ((lsh, lsw), (lth, ltw)) in enumerate(sizes):
        s_style = np_resize(style, (lsh, lsw))
        s_guides = np_resize(source_guides, (lsh, lsw))
        t_guides = np_resize(target_guides, (lth, ltw))
        r = cfg.patch_size // 2
        if nnf is None:
            nnf = np.stack(
                [
                    rng.integers(r, lsh - r, (lth, ltw)),
                    rng.integers(r, lsw - r, (lth, ltw)),
                ],
                axis=-1,
            ).astype(np.int32)
        else:
            up = np_resize(nnf.astype(np.float32), (lth, ltw))
            nnf = np.clip(
                (up * 2.0).astype(np.int32),
                [r, r], [lsh - 1 - r, lsw - 1 - r],
            ).astype(np.int32)
        out, err, nnf = synthesize_level_native(
            s_style, s_guides, t_guides, sw_arr, gw, np.ascontiguousarray(nnf),
            patch=cfg.patch_size, pm_iters=cfg.pm_iters, sv_iters=cfg.sv_iters,
            uniformity=cfg.uniformity, seed=li,
        )
    if cfg.extra_pass_3x3:  # ebsynth_cpu.cpp:983-989
        out, err, nnf = synthesize_level_native(
            s_style, s_guides, t_guides, sw_arr, gw, np.ascontiguousarray(nnf),
            patch=3, pm_iters=cfg.pm_iters, sv_iters=cfg.sv_iters,
            uniformity=0.0, seed=len(sizes),
        )
    return jnp.asarray(out), jnp.asarray(err), jnp.asarray(nnf)


# NOTE: the vmapped multi-job `synthesize_batch` was measured SLOWER
# than per-job calls (gathers scale with rows; vmap turns the freeze-
# compaction lax.cond tiers into run-every-tier selects) and rejected —
# it lives in propagate/rejected.py as a negative-result record.
# Production multi-job synthesis is parallel.synthesize_sharded.
