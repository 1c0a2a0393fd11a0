"""Measured-and-REJECTED alternatives — negative-result records.

Nothing here is on the maintained path.  Each entry was implemented,
golden-tested, benchmarked on the v5e, and found SLOWER than what
ships; it is kept (with its tests) so the rejection stays reproducible
and the next person doesn't re-derive it.  See PERF.md "Round-4
feature-opt GEMM audit" for the measurements.
"""
from __future__ import annotations

import jax.numpy as jnp


def temporal_grad(
    cs: jnp.ndarray,
    fwd_warp: jnp.ndarray,
    bwd_warp: jnp.ndarray,
    fwd_occ: jnp.ndarray,
    bwd_occ: jnp.ndarray,
    chunk: int,
) -> jnp.ndarray:
    """∂ temporal_loss/∂cs, analytic, with the fwd+bwd warp applications
    STACKED into single batched GEMMs (dense warp matrices only).

    REJECTED (PERF.md round-4): exact vs autodiff (max|Δ| ≲ 1e-7,
    tests/test_guidance_golden.py) but SLOWER at every stage shape —
    the per-iteration ``concatenate`` of the two warp matrices/operands
    costs more HBM traffic than the dispatch fold saves (15.60 vs
    12.94 ms/iter at hw=4096 c=640).  ``optimize_feature`` keeps
    ``jax.grad(temporal_loss)``.

    Design notes (why it was plausible): ``jax.grad(temporal_loss)``
    runs 4 warp-shaped GEMM dispatches per iteration (2 forward applies
    + 2 transposed backward applies), and the backward pair contracts a
    bf16 W against the f32 cotangent — a mixed-precision matmul XLA
    runs at the f32 MXU rate.  Here both directions ride ONE
    [2F, hw, hw] batched GEMM each way, and the sign·mask cotangent is
    cast to the warp dtype (exact: signs are ±1/0 and the dilated
    occlusion masks are binary), so all four logical GEMMs run at the
    bf16 rate.  The 2/N loss scale is applied in f32 AFTER the GEMMs.

    cs [chunk*F, h, w, C]; warps [F, hw, hw] (warp_matrix output);
    occs [F, h, w, 1].
    """
    b, h, w, c = cs.shape
    f = b // chunk
    hw = h * w
    wd = fwd_warp.dtype
    c1 = cs.reshape(chunk, f, hw, c)
    c2 = jnp.roll(c1, -1, axis=1)

    def fold(x):  # [chunk, f, hw, c] -> [f, hw, chunk*c]
        return x.transpose(1, 2, 0, 3).reshape(f, hw, chunk * c)

    def unfold(x):  # [f, hw, chunk*c] -> [chunk, f, hw, c]
        return x.reshape(f, hw, chunk, c).transpose(2, 0, 1, 3)

    wmat = jnp.concatenate([bwd_warp, fwd_warp], axis=0)  # [2F, hw, hw]
    x12 = jnp.concatenate([fold(c1), fold(c2)], axis=0).astype(wd)
    warped = jnp.einsum(
        "fij,fjd->fid", wmat, x12, preferred_element_type=jnp.float32
    )
    warped1, warped2 = unfold(warped[:f]), unfold(warped[f:])

    mb = (1.0 - bwd_occ)[None]  # [1, f, h, w, 1] -> broadcasts over chunk
    mf = (1.0 - fwd_occ)[None]
    mb = mb.reshape(1, f, hw, 1)
    mf = mf.reshape(1, f, hw, 1)
    s1 = jnp.sign(c2 - warped1) * mb          # d|r1·mb|/d c2f, unscaled
    s2 = jnp.sign(c1 - warped2) * mf
    s12 = jnp.concatenate([fold(s1), fold(s2)], axis=0).astype(wd)
    # transposed applies, both directions in ONE batched GEMM
    wts = jnp.einsum(
        "fij,fid->fjd", wmat, s12, preferred_element_type=jnp.float32
    )
    wt1, wt2 = unfold(wts[:f]), unfold(wts[f:])

    # dc1 = roll⁻¹(s1) + s2 − Wbwdᵀs1 − roll⁻¹(Wfwdᵀs2); roll⁻¹ maps
    # c2-space cotangents back (c2 = roll(c1, -1))
    g = (
        jnp.roll(s1, 1, axis=1) + s2 - wt1 - jnp.roll(wt2, 1, axis=1)
    )
    return (g * (2.0 / cs.size)).reshape(cs.shape)
