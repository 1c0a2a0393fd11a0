"""FLATTEN pixel-trajectory construction, vectorized for TPU.

The reference builds per-pixel flow trajectories with a *sequential
greedy* Python loop over all HW pixels per frame pair
(reference src/flow_utils.py:56-102 ``get_single_mapping_ind`` — SURVEY.md
ranks this the #3 hard part and the CPU hot spot of parameter prep).

Key observation: the greedy loop's winner for every target pixel q is
exactly the *lexicographic argmin* over candidate source pixels
p ∈ {p : warp(p) == q, valid(p)} of (color_error(p), p) — each greedy
comparison keeps the running min with strict ``>`` so earliest index wins
ties.  That makes the whole construction order-independent and
expressible as one sort + segment-head selection, which XLA compiles to
a single fused kernel (no host loop).

Semantics (matching the reference exactly):
  * frame pair (f0, f1); ``bwd_flow`` is defined on f1's grid and points
    into f0 (f1 = warp(f0, bwd_flow)).
  * Every f1 pixel p maps to q = round(p + bwd_flow[p]) in f0; p is valid
    if q is in bounds and p is non-occluded.
  * Conflicts (many p -> one q) are resolved by keeping the p whose f1
    color best matches f0's color at q.
  * Unlinked f0 pixels are paired with the unused f1 pixels, both in
    ascending index order, so the mapping is a permutation of HW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fresco_tpu.ops.resize import resize_bilinear


def single_mapping(
    bwd_flow: jnp.ndarray,
    bwd_occ: jnp.ndarray,
    frames: jnp.ndarray,
    scale: float = 1.0,
):
    """Pixel correspondence between one frame pair.

    Args:
      bwd_flow: [H, W, 2] backward flow (f1 grid -> f0), full resolution.
      bwd_occ:  [H, W] occlusion mask on f1's grid.
      frames:   [2, H, W, 3] the pair (f0, f1), any value range.
      scale:    downsampling factor (mapping computed at H/scale, W/scale).

    Returns:
      mapping: int32 [hw] permutation; f1[mapping[q]] corresponds to f0[q].
      unlinked: bool [hw]; True where f0[q] has no real correspondence.
    """
    H, W = bwd_occ.shape
    h, w = int(H // scale), int(W // scale)
    hw = h * w

    flow = resize_bilinear(bwd_flow[None], (h, w))[0] / scale  # [h,w,2] (dx,dy)
    occ = resize_bilinear(bwd_occ[None, :, :, None], (h, w))[0, :, :, 0]
    fr = resize_bilinear(frames, (h, w))  # [2,h,w,3]
    f0 = fr[0].reshape(hw, 3)
    f1 = fr[1].reshape(hw, 3)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    tx = jnp.round(xs + flow[..., 0])
    ty = jnp.round(ys + flow[..., 1])
    valid = (
        (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h) & ~(occ > 0.5)
    ).reshape(hw)
    q = (
        jnp.clip(ty, 0, h - 1) * w + jnp.clip(tx, 0, w - 1)
    ).astype(jnp.int32).reshape(hw)

    # color error of candidate p against its target q (mean over RGB)
    err = jnp.mean((f1 - f0[q]) ** 2, axis=-1)

    # lexicographic sort by (effective_q, err, p); invalid p get sentinel q=hw
    p_idx = jnp.arange(hw, dtype=jnp.int32)
    q_eff = jnp.where(valid, q, hw)
    order = jnp.lexsort((p_idx, err, q_eff))
    q_sorted = q_eff[order]
    # head of each q-segment = winner
    is_head = jnp.concatenate(
        [jnp.array([True]), q_sorted[1:] != q_sorted[:-1]]
    )
    winner_mask_sorted = is_head & (q_sorted < hw)
    # scatter winners: mapping[q] = p
    mapping = jnp.full((hw,), -1, dtype=jnp.int32)
    mapping = mapping.at[jnp.where(winner_mask_sorted, q_sorted, hw)].set(
        order.astype(jnp.int32), mode="drop"
    )
    unlinked = mapping == -1

    # used[p]: p won its segment
    used = jnp.zeros((hw,), dtype=bool)
    used = used.at[jnp.where(winner_mask_sorted, order, hw)].set(
        True, mode="drop"
    )

    # pair unused p (ascending) with unlinked q (ascending)
    unused_sorted = jnp.argsort(used.astype(jnp.int32) * hw + p_idx).astype(
        jnp.int32
    )  # first (#unused) entries are unused p ascending
    rank = jnp.cumsum(unlinked.astype(jnp.int32)) - 1  # rank of q among unlinked
    filler = unused_sorted[jnp.clip(rank, 0, hw - 1)]
    mapping = jnp.where(unlinked, filler, mapping)
    return mapping, unlinked


def batch_mappings(
    bwd_flows: jnp.ndarray,
    bwd_occs: jnp.ndarray,
    frames: jnp.ndarray,
    scale: float = 1.0,
):
    """Chain per-pair mappings into batch trajectories.

    Equivalent of reference src/flow_utils.py:105-138 ``get_mapping_ind``.

    Args:
      bwd_flows: [N-1, H, W, 2]; bwd_occs: [N-1, H, W]; frames: [N, H, W, 3].

    Returns:
      fwd_mappings: int32 [N, hw] — frames[i].reshape(hw)[fwd_mappings[i]]
        aligns every frame onto frame-0's trajectory order.
      bwd_mappings: int32 [N, hw] — inverse permutations.
      interattn_mask: bool [hw, N, N] — which frame pairs may attend within
        each trajectory (False across a broken link).
    """
    n = frames.shape[0]
    H, W = bwd_occs.shape[1:]
    h, w = int(H // scale), int(W // scale)
    hw = h * w

    maps = []
    unlinks = []
    for i in range(n - 1):  # static, n <= batch_size (≤8)
        m, u = single_mapping(bwd_flows[i], bwd_occs[i], frames[i : i + 2], scale)
        maps.append(m)
        unlinks.append(u)

    ident = jnp.arange(hw, dtype=jnp.int32)
    fwd = [ident]
    bwd = [ident]
    mask = jnp.ones((hw, n, n), dtype=bool)
    for i in range(n - 1):
        # block attention across the broken link for trajectories whose
        # current pixel is unlinked (flow_utils.py:124-133)
        one = jnp.ones((n, n), dtype=bool)
        one = one.at[: i + 1, i + 1 :].set(False)
        one = one.at[i + 1 :, : i + 1].set(False)
        broken = unlinks[i][fwd[-1]]  # [hw]
        mask = jnp.where(broken[:, None, None], mask & one[None], mask)
        fwd.append(maps[i][fwd[-1]])
        bwd.append(jnp.argsort(fwd[-1]).astype(jnp.int32))
    return jnp.stack(fwd), jnp.stack(bwd), mask
