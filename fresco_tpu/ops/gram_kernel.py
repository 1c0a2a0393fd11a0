"""Fused Pallas kernel for the spatial feature-opt gradient.

The spatial term of FRESCO's feature optimization (reference
src/diffusion_hacked.py:469-476) needs, per Adam iteration,

    grad = 2 * sign(v X v^T - C) X v / N        (S symmetric)

with v [B, hw, c] the row-normalized features and C the reference gram.
The XLA chunked form runs the gram-shaped K=c(=320) matmuls at a
measured 12.9 TF/s on the v5e (vs 57 TF/s for the K=4096 shapes —
small-K MXU inefficiency) and round-trips the [B, hw, hw] sign matrix
through HBM.  This kernel fuses build -> sign -> apply per (bm x bn)
tile: S never leaves VMEM, both dots run back-to-back on the MXU, and
the C tile streams in from the dense precomputed gram.

Numerics match the XLA path (guidance._gram_l1_grad): G accumulated in
f32, C read as stored (gram dtype), sign cast to the gram dtype for the
apply dot with f32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sign_gram_kernel(vi_ref, vj_ref, c_ref, o_ref, acc, *, nj):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    vi = vi_ref[0]          # [bm, c] gram dtype
    vj = vj_ref[0]          # [bn, c]
    g = jax.lax.dot_general(
        vi, vj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bm, bn] f32
    s = jnp.sign(g - c_ref[0].astype(jnp.float32)).astype(vi.dtype)
    acc[:] += jax.lax.dot(s, vj, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = acc[:]


def _pick_tiles(hw: int, c: int, itemsize: int) -> tuple[int, int]:
    """Largest (bm, bn) whose working set fits scoped VMEM.

    Budget: double-buffered vi/vj/C tiles + the f32 acc scratch + the
    f32 G stack temp (stage 2's c=1280 features overflowed the fixed
    512x512 tiling by 120 KB over the 16 MB scope)."""
    def vmem(bm, bn):
        return (
            2 * (bm * c + bn * c + bm * bn) * itemsize  # double-buffered ins
            + bm * c * 4                                 # acc scratch
            + bm * bn * 4                                # G f32 stack temp
        )

    # Measured-best fast paths first (r4 A/B, scripts/bench_gram_kernel
    # .py): at the dominant stage shape [16, 4096, 640] bf16, (512,
    # 1024) runs 101.2 TF/s vs 91.1 for (512, 512); at c<=320 the
    # (256, 1024) tiling edges out 512x512 (64.3 vs 63.1).  Wider row
    # tiles at c=1280 EXCEED scoped VMEM (remote-compile failure), so
    # only bf16 shapes with c<=768 take these.
    if itemsize == 2 and hw % 1024 == 0:
        bm = 256 if c <= 320 else 512
        if vmem(bm, 1024) <= 10 * 2**20:
            return bm, 1024
    # budget 7 MB: Mosaic's real allocation ran ~1.6x this model's
    # estimate (measured 16.12 MB vs 10 MB estimated at c=1280, 512x512
    # tiles), so the headroom keeps worst case near ~11 MB of the 16.
    # Tiles MUST divide hw — the grid floor-divides, so a non-divisor
    # tile silently drops the remainder rows/columns (non-square videos
    # hit this: 512x640 gives the c=640 stage hw=1280, where 512-wide
    # tiles covered only 1024 of the rows).
    for bm, bn in ((512, 512), (256, 512), (256, 256), (128, 256),
                   (128, 128)):
        bm, bn = min(bm, hw), min(bn, hw)
        if hw % bm or hw % bn:
            continue
        if vmem(bm, bn) <= 7 * 2**20:
            return bm, bn
    return min(128, hw), min(128, hw)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def sign_gram_apply(v: jnp.ndarray, corr: jnp.ndarray,
                    bm: int | None = None, bn: int | None = None,
                    interpret: bool | None = None) -> jnp.ndarray:
    """sign(v·vᵀ − corr)·v with f32 output, fused on TPU.

    v [B, hw, c] (gram dtype: bf16 / f32); corr [B, hw, hw] dense gram
    in the same dtype.  The tile sizes must divide hw (auto-picked ones
    always do; explicit ones are checked).  Returns [B, hw, c] f32 —
    the UNSCALED S·v product (caller applies the 2/N factor)."""
    b, hw, c = v.shape
    auto_bm, auto_bn = _pick_tiles(hw, c, v.dtype.itemsize)
    bm = min(bm or auto_bm, hw)
    bn = min(bn or auto_bn, hw)
    if hw % bm or hw % bn:
        raise ValueError(
            f"tile sizes ({bm}, {bn}) must divide hw={hw} — the grid "
            "floor-divides and would silently drop the remainder"
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    nj = hw // bn
    return pl.pallas_call(
        functools.partial(_sign_gram_kernel, nj=nj),
        grid=(b, hw // bm, nj),
        in_specs=[
            pl.BlockSpec((1, bm, c), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bn, c), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, bm, bn), lambda b_, i, j: (b_, i, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, c), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
        interpret=interpret,
    )(v, v, corr)


def supported(hw: int, dtype) -> bool:
    """Whether the fused kernel handles this scale on this backend.

    Measured vs the XLA chunked path with dense C at the stage-3 shape:
    64.8 vs 63.6 TF/s (scripts/bench_gram_kernel.py) — kept for the
    lower HBM traffic (S never leaves VMEM); FRESCO_NO_GRAM_KERNEL=1
    routes back to XLA."""
    import os

    return (
        jax.devices()[0].platform == "tpu"
        and hw % 256 == 0
        and dtype in (jnp.bfloat16, jnp.float32)
        and not os.environ.get("FRESCO_NO_GRAM_KERNEL")
    )
