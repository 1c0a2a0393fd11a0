"""FRESCO-guided self-attention, functional.

The reference hacks diffusers' attention processors on UNet up_blocks
2/3 (src/diffusion_hacked.py:142-403) with a stateful controller.  Here
the whole mechanism is a pure function over a ``FrescoAttnParams``
pytree, so it lives inside one jitted, scanned sampler:

  1. *Efficient cross-frame attention* (diffusion_hacked.py:224-247):
     K/V come from the union of valid (non-occluded) patches of all
     frames — expressed as masked flash attention over all F·hw keys
     with a per-key validity mask (static shapes, no gather).
  2. *Spatial-guided attention* (diffusion_hacked.py:256-288): the
     attention pattern of the *input frame's* features (captured in a
     reference pass) redistributes the current queries:
     q <- SDPA(q_ref, s·k_ref, q).
  3. *Temporal-guided (FLATTEN) attention* (diffusion_hacked.py:308-368):
     gather tokens along flow trajectories, attend across the frame axis
     (tiny F×F scores, batched over hw·heads), scatter back.

Per-step gating (spatial only in early steps, temporal only at high t —
reference pipe_FRESCO.py:171-174) arrives as traced booleans and is
applied with ``lax.cond`` so both paths live in one compiled program.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from fresco_tpu.attention.flash import flash_attention


@flax.struct.dataclass
class FrescoAttnParams:
    """Precomputed FRESCO attention parameters for one keyframe batch.

    Per-scale entries are dicts keyed by hw (=h*w at that feature scale),
    with static key sets.  ``None`` disables a mechanism entirely
    (static); the ``use_*`` booleans gate per-step (traced).
    """

    # cross-frame: key-validity masks per scale {hw: bool [F, hw]}
    cf_masks: Any = None
    # valid-key compaction per scale {hw: (perm [K], mask [K])}: a static
    # permutation that packs valid keys first (+ static cap K), so the
    # flash kernel does O(valid) work instead of O(F*hw).  Exact
    # reference semantics while n_valid <= K (attention is permutation-
    # invariant over keys); beyond K the lowest-priority (latest-frame)
    # valid keys are dropped.
    cf_perms: Any = None
    # spatial-guided: per-fresco-layer reference hidden states, in the
    # order the UNet visits its FRESCO attention layers: tuple of [B, hw, C]
    ref_features: Any = None
    # temporal-guided: {hw: (fwd_map [F,hw], bwd_map [F,hw], mask [hw,F,F])}
    trajectories: Any = None
    # traced per-step gates
    use_intra: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.array(False))
    use_inter: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.array(False))
    # scale factors (static floats)
    intra_scale: float = flax.struct.field(pytree_node=False, default=0.2)
    inter_scale: float = flax.struct.field(pytree_node=False, default=0.2)
    # CFG chunking: batch is [chunk * F]
    chunk: int = flax.struct.field(pytree_node=False, default=2)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, s, c = x.shape
    return x.reshape(b, s, heads, c // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def cross_frame_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None,
    chunk: int,
    heads: int,
    key_perm: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Attend each frame's queries against all frames' keys, masked.

    q/k/v: [chunk*F, hw, C]; key_mask: [F, hw] bool or None (None ==
    attend only frame 0, the reference's maskless mode,
    diffusion_hacked.py:236-237,243-244).  ``key_perm``: optional
    (perm [K], mask [K]) compaction — keys gathered valid-first to a
    static cap K << F*hw (most keys are invalid: frame 0 is fully valid,
    frames i>0 contribute only occluded patches), cutting both the MXU
    and HBM cost of the flash call by ~F/2x.
    """
    b, hw, c = q.shape
    f = b // chunk
    # All frames in a chunk share one key set, so fold the frame axis into
    # the query sequence instead of replicating K/V F times: one flash call
    # with B=chunk, Sq=F*hw, Sk=K (compacted) or F*hw.
    qq = q.reshape(chunk, f * hw, c)
    kk = k.reshape(chunk, f * hw, c)
    vv = v.reshape(chunk, f * hw, c)
    if key_perm is not None and key_mask is not None:
        perm, mask = key_perm
        kk = jnp.take(kk, perm, axis=1)
        vv = jnp.take(vv, perm, axis=1)
    elif key_mask is None:
        # maskless mode = attend only frame 0 (diffusion_hacked.py:
        # 236-237,243-244): the first hw keys, all valid
        kk = kk[:, :hw]
        vv = vv[:, :hw]
        mask = jnp.ones((hw,), dtype=bool)
    else:
        mask = key_mask.reshape(-1)
    mask_b = jnp.broadcast_to(mask[None], (chunk, mask.shape[0]))
    out = flash_attention(
        _split_heads(qq, heads), _split_heads(kk, heads), _split_heads(vv, heads),
        key_mask=mask_b,
    )
    return _merge_heads(out).reshape(b, hw, c)


def spatial_guided_query(
    q: jnp.ndarray,
    ref_q: jnp.ndarray,
    ref_k: jnp.ndarray,
    heads: int,
    scale_factor: float,
) -> jnp.ndarray:
    """Redistribute current queries by the input frame's attention.

    Equivalent of diffusion_hacked.py:278-285: per-frame
    SDPA(query=ref_q, key=ref_k*scale_factor, value=q) with zero identity
    bias (intraattn_bias == 0 in the reference, so no bias term).
    Runs through the flash kernel: the dense hw x hw logits would be
    [2F, heads, 4096, 4096] fp32 ≈ 8.6 GB at 512px/8 frames.
    """
    qh = _split_heads(q, heads)
    rq = _split_heads(ref_q, heads)
    rk = _split_heads(ref_k, heads) * scale_factor
    out = flash_attention(rq, rk, qh)
    return _merge_heads(out)


def trajectory_attention(
    q_raw: jnp.ndarray,
    k_raw: jnp.ndarray,
    hidden: jnp.ndarray,
    fwd_map: jnp.ndarray,
    bwd_map: jnp.ndarray,
    traj_mask: jnp.ndarray,
    chunk: int,
    heads: int,
    scale_factor: float,
) -> jnp.ndarray:
    """Temporal-guided attention along flow trajectories (FLATTEN).

    q_raw/k_raw: [chunk*F, hw, C] pre-attention projections;
    hidden: [chunk*F, hw, C] output of the main attention (its values);
    fwd_map/bwd_map: int32 [F, hw] (per-frame pixel permutations);
    traj_mask: bool [hw, F, F].  Mirrors diffusion_hacked.py:308-368.

    TPU formulation: the per-pixel trajectory gather/scatter are one-hot
    permutation MATMULS (exact — each row selects one value; generic
    take_along_axis gathers with a [chunk,F,hw,C] index tensor measured
    ~0.4 s/layer on v5e, the whole mechanism's former cost), and the
    F x F attention runs as fused einsums batched over (chunk, hw, heads)
    with no explicit transposes.
    """
    b, hw, c = q_raw.shape
    f = b // chunk
    d = c // heads

    iota = jnp.arange(hw, dtype=fwd_map.dtype)
    p_fwd = (fwd_map[:, :, None] == iota[None, None, :])  # [F, hw_dst, hw_src]
    p_bwd = (bwd_map[:, :, None] == iota[None, None, :])

    def permute(x, p):  # [chunk, F, hw, C], one-hot [F, hw, hw]
        return jnp.einsum(
            "fij,cfjk->cfik", p.astype(x.dtype), x,
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        ).astype(x.dtype)

    def traj_heads(x):
        xr = permute(x.reshape(chunk, f, hw, c), p_fwd)
        return xr.reshape(chunk, f, hw, heads, d)

    qh = traj_heads(q_raw)
    kh = traj_heads(k_raw) * scale_factor
    vh = traj_heads(hidden)

    s = jnp.einsum(
        "cfphd,cgphd->cphfg", qh, kh,
        preferred_element_type=jnp.promote_types(qh.dtype, jnp.float32)
    ) * (d**-0.5)
    s = jnp.where(traj_mask[None, :, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    o = jnp.einsum("cphfg,cgphd->cfphd", p, vh)
    out = permute(o.reshape(chunk, f, hw, c), p_bwd)
    return out.reshape(b, hw, c)


def fresco_self_attention(
    x: jnp.ndarray,
    wq, wk, wv, wo,
    heads: int,
    fresco: FrescoAttnParams | None,
    layer_index: int,
):
    """Full FRESCO self-attention for one UNet layer.

    x: [B, hw, C] normalized hidden states; w*: projection callables
    (linen Dense bound modules or plain functions).  ``layer_index``
    selects this layer's stored reference features.
    """
    q = wq(x)
    k = wk(x)
    v = wv(x)

    if fresco is None:
        out = flash_attention(
            _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads)
        )
        return wo(_merge_heads(out))

    hw = x.shape[1]
    q_raw, k_raw = q, k

    # 2. spatial-guided query redistribution (gated per step).  The
    # ref projections live INSIDE the cond: with the reference default
    # num_intraattn_steps=1 the gate is false on 19/20 steps, and
    # hoisted wq(ref)/wk(ref) matmuls would run on every one of them.
    if fresco.ref_features is not None:
        ref = fresco.ref_features[layer_index]
        q = jax.lax.cond(
            fresco.use_intra,
            lambda a: spatial_guided_query(
                a, wq(ref), wk(ref), heads, fresco.intra_scale
            ),
            lambda a: a,
            q,
        )

    # 1. efficient cross-frame attention (static on/off):
    #    cf_masks None       -> cf disabled: plain per-frame self-attention
    #    cf_masks[hw] None/absent -> maskless mode: keys from frame 0 only
    #    cf_masks[hw] = mask -> masked union of all frames' valid keys
    if fresco.cf_masks is not None:
        cf_mask = fresco.cf_masks.get(hw)
        cf_perm = fresco.cf_perms.get(hw) if fresco.cf_perms is not None else None
        hidden = cross_frame_attention(
            q, k, v, cf_mask, fresco.chunk, heads, key_perm=cf_perm
        )
    else:
        out = flash_attention(
            _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads)
        )
        hidden = _merge_heads(out)

    # 3. temporal-guided trajectory attention (gated per step)
    if fresco.trajectories is not None and hw in fresco.trajectories:
        fwd_map, bwd_map, traj_mask = fresco.trajectories[hw]
        hidden = jax.lax.cond(
            fresco.use_inter,
            lambda h: trajectory_attention(
                q_raw, k_raw, h, fwd_map, bwd_map, traj_mask,
                fresco.chunk, heads, fresco.inter_scale,
            ),
            lambda h: h,
            hidden,
        )

    return wo(hidden)
