"""FRESCO feature optimization: inner Adam loop on UNet decoder features.

Equivalent of reference src/diffusion_hacked.py:416-488
(``optimize_feature``): at selected timesteps/decoder stages, the decoder
feature is optimized for ``iters`` Adam steps against

  * a temporal loss — L1 between each frame and its flow-warped neighbor
    on non-occluded pixels (both directions, with the roll-by-one frame
    pairing), and
  * a spatial loss — L1 between the cosine-similarity gram matrix of the
    feature and a reference gram (``correlation``) captured from the
    input frames,

then AdaIN-renormalized to the original feature statistics.  JAX-native
design: the loss is a pure function of the feature (no UNet backprop —
the reference detaches everything else too), the Adam loop is a
``lax.scan`` of optax updates, all in fp32 inside a bf16 UNet
(diffusion_hacked.py:430 upcasts the same way).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fresco_tpu.ops.adain import adain
from fresco_tpu.ops.blend import prepare_flow_for_scale
from fresco_tpu.ops.warp import coords_grid


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    iters: int = 20          # diffusion_hacked.py:417
    lr: float = 0.2          # diffusion_hacked.py:433
    intra_weight: float = 1e2
    optimize_temporal: bool = True
    chunk: int = 2
    # temporal-loss warp implementation.  "dense" = [F, hw, hw] warp-
    # matrix matmuls: ~1000x more FLOPs than the 4-tap structure but MXU
    # FLOPs are cheap and measured FASTER on the v5e (15.2s vs 32.4s
    # denoise loop at 512px/8 frames) — XLA TPU lowers the sparse path's
    # row gathers + segment_sum to scalar-ish loops.  "sparse" = exact
    # 4-tap bilinear gather with a sorted-segment-sum backward; O(hw)
    # work and no big matrices — the right mode off-TPU (CPU tests) or
    # if XLA's TPU gather emitter improves.  ("banded" — block-banded
    # warp matrices, 5/8 fewer FLOPs — was MEASURED NOT FASTER on the
    # v5e (scripts/bench_banded_warp.py: fwd 4.4 vs 4.9 ms, grad 7.2 vs
    # 3.4 ms) and is REJECTED here: its exactness guard banded_warp_ok
    # is data-dependent and can't run inside this jitted body.  The
    # building blocks remain exported for host-guarded use.)
    warp_mode: str = "dense"
    # dtype of the gram-matrix matmuls (the FLOPs hot spot: [B, hw, hw]
    # per decoder stage per Adam iter).  bf16 inputs + fp32 accumulation
    # runs ~4-8x faster on the MXU than full fp32 with negligible effect
    # on the optimized feature; set "float32" for strict parity.
    gram_dtype: str = "bfloat16"
    # The reference gram C is iteration-invariant; reconstructing it from
    # the factored storage (prepare.intraframe_params) costs one of the
    # three gram-shaped einsums EVERY Adam iter.  When the dense C fits
    # under this budget it is materialized ONCE per optimize_feature call
    # instead (loop-invariant), cutting per-iter spatial GEMMs 3 -> 2.
    # Stored in gram_dtype: in bf16 mode C is rounded once vs the
    # factored path's f32-accumulated chunks — sign(G-C) can differ on
    # near-ties (quality-neutral; gram_dtype="float32" stays bit-exact).
    # [16, 4096, 4096] bf16 = 537 MB covers stage 3 at 512px/8 frames;
    # set 0 to always reconstruct.
    dense_corr_max_mb: float = 600.0


def warp_matrix(flow: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Bilinear backward-warp as a sparse-in-dense matrix.

    flow [F, h, w, 2] -> W [F, hw, hw] with W[f, p, q] = bilinear weight
    of source pixel q for output pixel p (zeros padding).  ``W @ x``
    equals ``flow_warp(x, flow)`` and its autodiff backward is
    ``Wᵀ @ g`` — a matmul instead of a TPU scatter-add.

    Built from the 4-tap structure by VECTORIZED one-hot comparison:
    TPU scatter-add lowers to a serial loop and measured ~0.45 s per
    [8, 4096, 4096] build (it was the dominant fixed cost of every
    in-scan optimize_feature call); the equality construction is one
    fused VPU pass over the output (~ms)."""
    src, wt = warp_taps(flow)
    f, hw, t = src.shape
    iota = jnp.arange(hw, dtype=jnp.int32)
    wmat = jnp.zeros((f, hw, hw), dtype)
    for i in range(t):
        wmat = wmat + (
            (src[:, :, i, None] == iota).astype(dtype)
            * wt[:, :, i, None].astype(dtype)
        )
    # materialize: without the barrier XLA rematerializes the "cheap"
    # one-hot construction into every Adam iteration's matmul operands
    # (measured: per-iter slope doubled)
    return jax.lax.optimization_barrier(wmat)


def warp_matrix_banded(flow: jnp.ndarray, dtype=jnp.float32, block: int | None = None):
    """Block-banded form of ``warp_matrix``: ("banded", Wb, block) with
    Wb [F, nb, block, 3*block] holding, for output row-block i, the
    columns [i*block - block, i*block + 2*block) of the full matrix.

    Exact equivalence to the dense matrix requires every bilinear tap's
    source index to lie within one block of its output row
    (|src - out_row_aligned| bounded by the window) — guaranteed when
    ``banded_warp_ok(flow, (h, w))`` holds; out-of-window taps (extreme
    flows) would be silently dropped, hence the caller-side guard."""
    f, h, w, _ = flow.shape
    hw = h * w
    if block is None:
        block = hw // 8
    nb = hw // block
    src, wt = warp_taps(flow)  # [F, hw, 4]
    src_b = src.reshape(f, nb, block, 4)
    wt_b = wt.reshape(f, nb, block, 4)
    # global column index of each window position, per block
    cols = (
        (jnp.arange(nb) * block)[None, :, None, None]
        + (jnp.arange(3 * block) - block)[None, None, None, :]
    )  # [1, nb, 1, 3b]
    wmat = jnp.zeros((f, nb, block, 3 * block), dtype)
    for i in range(4):
        wmat = wmat + (
            (src_b[:, :, :, i, None] == cols).astype(dtype)
            * wt_b[:, :, :, i, None].astype(dtype)
        )
    return ("banded", jax.lax.optimization_barrier(wmat), block)


def banded_warp_ok(flow: jnp.ndarray, feat_hw: tuple[int, int]) -> bool:
    """Host-side guard for warp_mode="banded" at the finest stage.

    The window covers |Δ flat source index| <= block = hw/8 for every
    output row.  A bilinear tap's Δ = (y_tap - y)*w + (x_tap - x) with
    y_tap ∈ {floor(y+dy), floor(y+dy)+1} (so |y_tap - y| <= |dy|+1) and
    likewise |x_tap - x| <= min(|dx|+1, w-1); clipping only shrinks
    both.  Returns False (use dense) when any flow could escape."""
    h, w = feat_hw
    hw = h * w
    block = hw // 8
    max_dy = float(jnp.max(jnp.abs(flow[..., 1]))) * (h / flow.shape[1])
    max_dx = float(jnp.max(jnp.abs(flow[..., 0]))) * (w / flow.shape[2])
    delta = (max_dy + 1.0) * w + min(max_dx + 1.0, w - 1.0)
    return delta <= block


def apply_banded_warp(wb: jnp.ndarray, block: int, x: jnp.ndarray) -> jnp.ndarray:
    """y = W @ x for the banded form: x [F, hw, d] -> [F, hw, d]."""
    f, hw, d = x.shape
    nb = hw // block
    xp = jnp.pad(x, ((0, 0), (block, block), (0, 0)))
    win = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(xp, i * block, 3 * block, axis=1)
            for i in range(nb)
        ],
        axis=1,
    )  # [F, nb, 3b, d]
    y = jnp.einsum(
        "fbiw,fbwd->fbid", wb, win.astype(wb.dtype),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(f, hw, d)


def warp_taps(flow: jnp.ndarray):
    """Bilinear backward-warp as explicit 4-tap structure.

    flow [F, h, w, 2] -> (src [F, hw, 4] int32 source-pixel ids,
    wt [F, hw, 4] float32 weights, zeroed out of bounds) — the same
    zeros-padding semantics as ``warp_matrix`` without materializing the
    [F, hw, hw] matrix."""
    f, h, w, _ = flow.shape
    hw = h * w
    grid = coords_grid(h, w, flow.dtype)[None] + flow
    x, y = grid[..., 0].reshape(f, hw), grid[..., 1].reshape(f, hw)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    srcs, wts = [], []
    for yi, xi, wt in (
        (y0, x0, (x0 + 1 - x) * (y0 + 1 - y)),
        (y0, x0 + 1, (x - x0) * (y0 + 1 - y)),
        (y0 + 1, x0, (x0 + 1 - x) * (y - y0)),
        (y0 + 1, x0 + 1, (x - x0) * (y - y0)),
    ):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        srcs.append(
            jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        )
        wts.append((wt * inb.astype(flow.dtype)).astype(jnp.float32))
    return jnp.stack(srcs, axis=-1), jnp.stack(wts, axis=-1)


def make_sparse_warp(flow: jnp.ndarray):
    """Build the (forward taps + source-sorted transpose) structure the
    scatter-free backward needs.  Returns a tuple pytree consumed by
    ``apply_sparse_warp``."""
    src, wt = warp_taps(flow)
    f, hw, t = src.shape
    key = src.reshape(f, hw * t)
    order = jnp.argsort(key, axis=1)
    src_sorted = jnp.take_along_axis(key, order, axis=1)
    out_sorted = (order // t).astype(jnp.int32)  # entry e=(p, tap): p = e // t
    wt_sorted = jnp.take_along_axis(wt.reshape(f, hw * t), order, axis=1)
    return (src, wt, src_sorted, out_sorted, wt_sorted)


@jax.custom_vjp
def apply_sparse_warp(x, src, wt, src_s, out_s, wt_s):
    """y[f, p, :] = Σ_t wt[f, p, t] · x[f, src[f, p, t], :].

    Exactly ``warp_matrix(flow) @ x`` but O(4·hw) work instead of
    O(hw²): the forward is 4 row gathers, the backward a gather +
    sorted ``segment_sum`` over the pre-sorted transpose structure (no
    scatter-add, no [F, hw, hw] matrices resident in the scan)."""
    return _sparse_warp_fwd_impl(x, src, wt)


def _sparse_warp_fwd_impl(x, src, wt):
    f, hw, d = x.shape
    t = src.shape[-1]
    idx = jnp.arange(f, dtype=jnp.int32)[:, None, None] * hw + src  # [F,hw,4]
    g = jnp.take(x.reshape(f * hw, d), idx.reshape(-1), axis=0)
    g = g.reshape(f, hw, t, d)
    return jnp.sum(wt[..., None].astype(x.dtype) * g, axis=2)


def _sparse_warp_fwd(x, src, wt, src_s, out_s, wt_s):
    return _sparse_warp_fwd_impl(x, src, wt), (x, src, wt, src_s, out_s, wt_s)


def _sparse_warp_bwd(res, ct):
    x, src, wt, src_s, out_s, wt_s = res
    f, hw, d = x.shape
    gidx = jnp.arange(f, dtype=jnp.int32)[:, None] * hw + out_s  # [F, hw·t]
    rows = jnp.take(ct.reshape(f * hw, d), gidx.reshape(-1), axis=0)
    rows = rows * wt_s.reshape(-1, 1).astype(ct.dtype)
    seg = (jnp.arange(f, dtype=jnp.int32)[:, None] * hw + src_s).reshape(-1)
    dx = jax.ops.segment_sum(
        rows, seg, num_segments=f * hw, indices_are_sorted=True
    )
    zeros = tuple(jnp.zeros_like(a) for a in (src, wt, src_s, out_s, wt_s))
    return (dx.reshape(f, hw, d).astype(x.dtype), *zeros)


apply_sparse_warp.defvjp(_sparse_warp_fwd, _sparse_warp_bwd)


def temporal_loss(
    cs: jnp.ndarray,
    fwd_warp: jnp.ndarray,
    bwd_warp: jnp.ndarray,
    fwd_occ: jnp.ndarray,
    bwd_occ: jnp.ndarray,
    chunk: int,
) -> jnp.ndarray:
    """Bidirectional warp-consistency L1 (diffusion_hacked.py:461-466).

    cs: [chunk*F, h, w, C]; fwd_warp/bwd_warp: either [F, hw, hw] warp
    matrices (see warp_matrix) or sparse-warp tuples (make_sparse_warp)
    at feature resolution; occs [F, h, w, 1].
    """
    b, h, w, c = cs.shape
    f = b // chunk
    hw = h * w
    c1 = cs.reshape(chunk, f, hw, c)
    c2 = jnp.roll(c1, -1, axis=1)

    def warp(x, wop):
        if isinstance(wop, tuple) and wop[0] == "banded":
            _, wb, block = wop  # block-banded matmul: fold (k, c) -> d
            xd = x.transpose(1, 2, 0, 3).reshape(f, hw, chunk * c)
            y = apply_banded_warp(wb, block, xd)
            return y.reshape(f, hw, chunk, c).transpose(2, 0, 1, 3)
        if isinstance(wop, tuple):  # sparse 4-tap warp: fold (k, c) -> d
            xd = x.transpose(1, 2, 0, 3).reshape(f, hw, chunk * c)
            y = apply_sparse_warp(xd, *wop)
            return y.reshape(f, hw, chunk, c).transpose(2, 0, 1, 3)
        return jnp.einsum(
            "fij,kfjc->kfic", wop, x.astype(wop.dtype),
            preferred_element_type=jnp.float32,
        )

    warped1 = warp(c1, bwd_warp).reshape(cs.shape)
    warped2 = warp(c2, fwd_warp).reshape(cs.shape)
    c1f = c1.reshape(cs.shape)
    c2f = c2.reshape(cs.shape)

    def tile(x):
        return jnp.tile(x, (chunk, 1, 1, 1))

    l = jnp.abs((c2f - warped1) * (1.0 - tile(bwd_occ))) + jnp.abs(
        (c1f - warped2) * (1.0 - tile(fwd_occ))
    )
    return jnp.mean(l) * 2.0


# NOTE: the folded analytic temporal gradient (one [2F,hw,hw] batched
# GEMM per direction) was measured SLOWER than jax.grad(temporal_loss)
# at every stage shape and rejected; it lives in diffusion/rejected.py
# as a negative-result record (PERF.md round-4 GEMM audit).


def _infer_corr_dense(correlation) -> bool:
    """Shape-based fallback for callers that don't say which form they
    hold: square [B, hw, hw] reads as dense.  Ambiguous when a FACTORED
    [B, hw, C] happens to have hw == C — producers must pass the explicit
    ``is_dense`` flag (the sampler does; prepare.intraframe_params always
    emits factored)."""
    return correlation.shape[1] == correlation.shape[2]


def _corr_chunk(correlation, row0, rows, gram_dtype, is_dense):
    """One row-chunk of the reference gram.  ``correlation`` is either the
    dense gram [B, hw, hw] or the FACTORED normalized reference features
    [B, hw, C] — the factored form stores 320 channels instead of a
    4096-wide gram (537 MB -> 40 MB resident at 512px stage 3) and
    reconstructs chunks exactly on the MXU."""
    if is_dense:
        return jax.lax.dynamic_slice_in_dim(
            correlation, row0, rows, axis=1
        ).astype(jnp.promote_types(correlation.dtype, jnp.float32))
    vr = correlation.astype(gram_dtype)
    vc = jax.lax.dynamic_slice_in_dim(vr, row0, rows, axis=1)
    return jnp.einsum("bic,bjc->bij", vc, vr, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gram_l1(v_hat, correlation, gram_dtype, chunk_rows, is_dense):
    """mean |v̂v̂ᵀ − C| with an ANALYTIC backward.

    Autodiff of the chunked gram loss (checkpoint + scan) measured ~10%
    MXU utilization on v5e; the closed-form gradient
    (S + Sᵀ)v̂ / N with S = sign(G − C) runs as 3 gram-shaped matmuls per
    row chunk with no rematerialized scan state."""
    b, hw, _ = v_hat.shape
    vg = v_hat.astype(gram_dtype)
    total = jnp.float32(0.0)
    for i in range(max(hw // chunk_rows, 1)):
        rows = min(chunk_rows, hw)
        g = jnp.einsum(
            "bic,bjc->bij",
            jax.lax.dynamic_slice_in_dim(vg, i * rows, rows, axis=1), vg,
            preferred_element_type=jnp.float32,
        )
        total = total + jnp.sum(
            jnp.abs(
                g - _corr_chunk(correlation, i * rows, rows, gram_dtype,
                                is_dense)
            )
        )
    return total / (b * hw * hw)


def _gram_l1_fwd(v_hat, correlation, gram_dtype, chunk_rows, is_dense):
    return (
        _gram_l1(v_hat, correlation, gram_dtype, chunk_rows, is_dense),
        (v_hat, correlation),
    )


def _gram_l1_grad(v_hat, correlation, gram_dtype, chunk_rows,
                  is_dense=None):
    """∂/∂v̂ of mean |v̂v̂ᵀ − C| = (S + Sᵀ)v̂ / N with S = sign(G − C),
    computed in row chunks.  Shared by the custom-vjp backward and the
    grad-only Adam path (which never materializes the loss value).

    S is symmetric — G = v̂v̂ᵀ and the reference gram C are both
    symmetric (each entry is one commutative dot product, so even the
    bf16 roundings match across the diagonal) — hence (S + Sᵀ)v̂ =
    2·S·v̂: per chunk one gram-build einsum and ONE apply einsum.

    On TPU with a dense C, the whole thing runs as ONE fused Pallas
    kernel (ops/gram_kernel.py): the K=c gram builds measured 12.9 TF/s
    under XLA (small-K MXU inefficiency) and S round-tripped HBM; the
    kernel keeps S in VMEM and runs both dots back-to-back."""
    b, hw, c = v_hat.shape
    if is_dense is None:
        is_dense = _infer_corr_dense(correlation)
    if is_dense:
        from fresco_tpu.ops import gram_kernel

        if gram_kernel.supported(hw, gram_dtype):
            vg = v_hat.astype(gram_dtype)
            sv = gram_kernel.sign_gram_apply(
                vg, correlation.astype(gram_dtype)
            )
            return 2.0 * sv / (b * hw * hw)
    vg = v_hat.astype(gram_dtype)
    grad = jnp.zeros((b, hw, c), jnp.float32)
    for i in range(max(hw // chunk_rows, 1)):
        rows = min(chunk_rows, hw)
        row0 = i * rows
        vc = jax.lax.dynamic_slice_in_dim(vg, row0, rows, axis=1)
        g = jnp.einsum("bic,bjc->bij", vc, vg, preferred_element_type=jnp.float32)
        s = jnp.sign(
            g - _corr_chunk(correlation, row0, rows, gram_dtype, is_dense)
        ).astype(gram_dtype)
        g_rows = jnp.einsum(
            "bij,bjc->bic", s, vg, preferred_element_type=jnp.float32
        )
        grad = jax.lax.dynamic_update_slice_in_dim(
            grad,
            jax.lax.dynamic_slice_in_dim(grad, row0, rows, axis=1) + 2.0 * g_rows,
            row0, axis=1,
        )
    return grad / (b * hw * hw)


def _gram_l1_bwd(gram_dtype, chunk_rows, is_dense, res, ct):
    v_hat, correlation = res
    grad = _gram_l1_grad(
        v_hat, correlation, gram_dtype, chunk_rows, is_dense
    ) * ct
    return grad.astype(v_hat.dtype), jnp.zeros_like(correlation)


_gram_l1.defvjp(_gram_l1_fwd, _gram_l1_bwd)


def _normalize_rows(cs: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = cs.shape
    v = cs.reshape(b, h * w, c)
    return v / jnp.sqrt(jnp.sum(v * v, axis=2, keepdims=True))


def spatial_loss(
    cs: jnp.ndarray,
    correlation: jnp.ndarray,
    gram_dtype=jnp.bfloat16,
    chunk_rows: int = 1024,
    is_dense: bool | None = None,
) -> jnp.ndarray:
    """L1 between normalized-feature gram and the reference gram
    (diffusion_hacked.py:469-476).  correlation: dense [B, hw, hw] or
    factored normalized reference features [B, hw, C] (see _corr_chunk);
    pass ``is_dense`` explicitly when hw could equal C (the shape
    inference is ambiguous there).
    """
    if is_dense is None:
        is_dense = _infer_corr_dense(correlation)
    v = _normalize_rows(cs)
    return _gram_l1(
        v, correlation, gram_dtype, min(chunk_rows, v.shape[1]), is_dense
    )


def spatial_grad(
    cs: jnp.ndarray,
    correlation: jnp.ndarray,
    gram_dtype=jnp.bfloat16,
    chunk_rows: int = 1024,
    is_dense: bool | None = None,
) -> jnp.ndarray:
    """∂ spatial_loss/∂cs WITHOUT evaluating the loss.  The Adam loop
    only consumes gradients, but ``jax.grad(loss)`` still executes the
    custom-vjp forward — a second full pass over the gram chunks whose
    scalar result is discarded.  This grad-only path halves the gram
    matmuls per optimization iter (they dominate feature-opt FLOPs,
    PERF.md)."""
    v, vjp = jax.vjp(_normalize_rows, cs)
    gv = _gram_l1_grad(
        v, correlation, gram_dtype, min(chunk_rows, v.shape[1]), is_dense
    )
    return vjp(gv.astype(v.dtype))[0]


def optimize_feature(
    sample: jnp.ndarray,
    fwd_flow: jnp.ndarray | None,
    bwd_flow: jnp.ndarray | None,
    fwd_occ: jnp.ndarray | None,
    bwd_occ: jnp.ndarray | None,
    correlation: jnp.ndarray | None,
    cfg: GuidanceConfig = GuidanceConfig(),
    corr_is_dense: bool | None = None,
) -> jnp.ndarray:
    """Run the inner Adam loop on one decoder feature map.

    sample: [chunk*F, h, w, C] (any dtype; optimized in fp32);
    flows [F, H, W, 2] at *full* video resolution (rescaled here, matching
    diffusion_hacked.py:436-442); correlation is the dense gram
    [chunk*F, hw, hw], the factored reference features [chunk*F, hw, C]
    (what prepare.intraframe_params emits — pass corr_is_dense=False),
    or None.  Returns the optimized feature AdaIN-matched to ``sample``'s
    stats.
    """
    do_temporal = cfg.optimize_temporal and fwd_flow is not None
    do_spatial = correlation is not None and cfg.intra_weight > 0
    if not do_temporal and not do_spatial:
        return sample

    h, w = sample.shape[1:3]
    # float64 features => f64 optimization throughout (the sharding-
    # validation mode, parallel/smoke.py); else the reference's fp32
    # loop with bf16/fp32 gram matmuls per cfg.gram_dtype
    if sample.dtype == jnp.float64:
        work_dtype = gram_dtype = jnp.float64
    else:
        work_dtype = jnp.float32
        gram_dtype = jnp.bfloat16 if cfg.gram_dtype == "bfloat16" else jnp.float32
    if do_temporal:
        bwd_flow_s, bwd_occ_s = prepare_flow_for_scale(
            bwd_flow, bwd_occ, (h, w), dilate_full_res=False
        )
        fwd_flow_s, fwd_occ_s = prepare_flow_for_scale(
            fwd_flow, fwd_occ, (h, w), dilate_full_res=False
        )
        # warp structure built once per call, reused by all Adam iters
        if cfg.warp_mode == "banded":
            # NOT dispatched here: exactness needs the DATA-dependent
            # banded_warp_ok guard (max |flow| within the window), which
            # cannot run inside this jitted body — out-of-window taps
            # would be dropped silently.  The banded form is also
            # measured slower than dense on the v5e (PERF.md); callers
            # who want it must build warp_matrix_banded themselves after
            # checking banded_warp_ok on the host.
            raise ValueError(
                "warp_mode='banded' is not supported inside "
                "optimize_feature; use warp_matrix_banded + "
                "banded_warp_ok directly (see PERF.md — dense is faster "
                "on TPU anyway)"
            )
        if cfg.warp_mode == "sparse":
            fwd_warp = make_sparse_warp(fwd_flow_s)
            bwd_warp = make_sparse_warp(bwd_flow_s)
        else:
            fwd_warp = warp_matrix(fwd_flow_s, gram_dtype)
            bwd_warp = warp_matrix(bwd_flow_s, gram_dtype)

    if do_spatial and corr_is_dense is None:
        corr_is_dense = _infer_corr_dense(correlation)
    if do_spatial and not corr_is_dense:
        b_c, hw_c = correlation.shape[:2]
        dense_mb = b_c * hw_c * hw_c * jnp.dtype(gram_dtype).itemsize / 2**20
        if dense_mb <= cfg.dense_corr_max_mb:
            vr = correlation.astype(gram_dtype)
            correlation = jax.lax.optimization_barrier(
                jnp.einsum(
                    "bic,bjc->bij", vr, vr, preferred_element_type=jnp.float32
                ).astype(gram_dtype)
            )
            corr_is_dense = True

    x0 = sample.astype(work_dtype)

    def grad_fn(cs):
        # gradient-only: the loop never reads the loss value, so the
        # spatial term uses the analytic grad path (one gram pass, not
        # the fwd+bwd two of jax.grad through the custom vjp)
        g = jnp.zeros_like(cs)
        if do_temporal:
            g = g + jax.grad(
                lambda x: temporal_loss(
                    x, fwd_warp, bwd_warp, fwd_occ_s, bwd_occ_s, cfg.chunk
                )
            )(cs)
        if do_spatial:
            g = g + cfg.intra_weight * spatial_grad(
                cs, correlation, gram_dtype, is_dense=corr_is_dense
            )
        return g

    tx = optax.adam(cfg.lr)  # torch Adam defaults: b1=.9, b2=.999, eps=1e-8

    def step(carry, _):
        cs, opt_state = carry
        g = grad_fn(cs)
        updates, opt_state = tx.update(g, opt_state, cs)
        return (optax.apply_updates(cs, updates), opt_state), None

    (cs, _), _ = jax.lax.scan(
        step, (x0, tx.init(x0)), None, length=cfg.iters
    )
    # style_eps=1.0 reproduces the reference's eps/chunk argument swap at
    # diffusion_hacked.py:488 (see ops/adain.py docstring)
    out = adain(cs, x0, style_eps=1.0)
    return out.astype(sample.dtype)
