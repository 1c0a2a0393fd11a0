"""VERDICT r4 #3: fused Pallas candidate evaluation — from-image patch
SSD (gather the patch from the source image directly, reduce, argmin
in-kernel) instead of the pre-stacked patch-table row-gather the XLA
path is bound on.

What this measures (the decisive constants, at the real finest-level
shape of the 512x640 e2e: N = th*tw ≈ 327k target pixels, C' = 16
padded channels, patch 5):

  A. XLA pre-stacked table row-gather (the shipped path's primitive):
     take([N, n_off*C'] bf16) — the 17 ns/row baseline.
  B. Pallas from-image strip DMA: per candidate pixel, one descriptor
     copying the [16, 256]-aligned strip that covers its 5x(5*C')
     patch (Mosaic constraints: 8-aligned sublane starts — measured in
     round 3, single rows are illegal — and 128-lane granularity), with
     a trivial in-kernel reduce so the copies are not DCE'd.
Why these decide the fused-eval question: the fused kernel's best case
pays (B) once per (pixel, candidate) — identical descriptor count to
the table gather — PLUS the in-kernel dynamic extraction of the 5x80
patch from the aligned strip (two one-hot matmuls per pixel, issue-
bound) that the pre-stacked table exists to avoid.  If (B) per useful
row is already slower than (A), the fused kernel cannot win at any
extraction cost, and the pre-stacked-table + XLA-gather formulation is
confirmed as the TPU optimum for this access pattern.

Timing per CLAUDE.md: >= 64 serial iterations inside ONE jit, fetch a
slice (the tunnel's ~60-70 ms fetch RTT otherwise swamps per-op cost:
at 32 iters x n=40960 rows the RTT alone contributes ~50 ns/row — 3x
the 17 ns/row signal being measured).

    python scripts/bench_fused_eval.py [--n 327680] [--iters 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 5
CP = 16            # padded channel count (style 3 + guides ~9 -> 16 lanes)
ROW_W = PATCH * PATCH * CP  # pre-stacked table row width (=400 -> pad 512)
STRIP_ROWS = 16    # covers any 5-row patch window at 8-aligned starts
STRIP_LANES = 256  # covers any 5*CP=80-lane window at 128-aligned starts


def _timed_fetch(fn, iters, reps=3):
    """Median of `reps` timed runs, each normalized by the scan length."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def bench_xla_row_gather(sh, sw, n, iters, key):
    """(A) the shipped primitive: one wide row-gather of the pre-stacked
    patch table per candidate set."""
    table = jax.random.normal(key, (sh * sw, 512), jnp.bfloat16)
    idx0 = jax.random.randint(key, (n,), 0, sh * sw, jnp.int32)

    @jax.jit
    def run(idx, tab):
        # tab enters as an argument — a closed-over device array would
        # be inlined as a 320 MB HLO constant and overflow the remote
        # compile tunnel's request limit (HTTP 413)
        def body(ix, _):
            g = jnp.take(tab, ix, axis=0)
            # serial dependency defeats CSE: next indices derive from data
            nxt = (ix + g[:, 0].astype(jnp.int32)) % (sh * sw)
            return nxt, g[0, 0]

        ix, outs = jax.lax.scan(body, idx, None, length=iters)
        return outs

    # warm-up MUST fetch: on the axon tunnel block_until_ready returns
    # without waiting, so a block_until_ready warm-up lets the timed
    # fetch absorb the ~20 s compile (the round-5 16,232 ns/row red
    # herring — /tmp/probe_gather_variants.py isolated it)
    np.asarray(run(idx0, table))
    return _timed_fetch(lambda: np.asarray(run(idx0, table)), iters)


def _strip_kernel(iters: int, n_blk: int, sh: int, swc: int):
    """Per grid step: n_blk candidate pixels; for each, DMA its
    [STRIP_ROWS, STRIP_LANES] covering strip from the image in HBM and
    fold it into an accumulator (keeps every byte live).  `iters`
    serial rounds re-derive indices from fetched data (defeats caching
    and CSE, mirrors the XLA harness)."""

    def kernel(ys_ref, xs_ref, img_ref, out_ref, buf, acc, sems):
        depth = buf.shape[0]

        def one_round(it, carry):
            def start(i, slot):
                y0 = jnp.clip(ys_ref[0, i] + it, 0, sh - STRIP_ROWS)
                x0 = jnp.clip(xs_ref[0, i], 0, swc - STRIP_LANES)
                y0 = pl.multiple_of((y0 // 8) * 8, 8)
                x0 = pl.multiple_of((x0 // 128) * 128, 128)
                return pltpu.make_async_copy(
                    img_ref.at[pl.ds(y0, STRIP_ROWS),
                               pl.ds(x0, STRIP_LANES)],
                    buf.at[slot],
                    sems.at[slot],
                )

            for i in range(min(depth, n_blk)):
                start(i, i).start()

            def body(i, c):
                slot = jax.lax.rem(i, depth)
                start(i, slot).wait()

                @pl.when(i + depth < n_blk)
                def _():
                    start(i + depth, jax.lax.rem(i + depth, depth)).start()

                return c + jnp.sum(buf[slot].astype(jnp.float32))

            return jax.lax.fori_loop(0, n_blk, body, carry)

        total = jax.lax.fori_loop(0, iters, one_round, jnp.float32(0.0))
        acc[0, 0] = total
        out_ref[0, 0] = acc[0, 0]

    return kernel


def bench_pallas_strip_dma(sh, sw, n, iters, key, depth=8, interpret=False):
    """(B) from-image covering-strip DMA, one descriptor per candidate
    pixel, double-buffered `depth` deep."""
    swc = sw * CP
    img = jax.random.normal(key, (sh, swc), jnp.bfloat16)
    ys = jax.random.randint(key, (1, n), 0, sh, jnp.int32)
    xs = jax.random.randint(jax.random.fold_in(key, 1), (1, n), 0, swc,
                            jnp.int32)

    kernel = _strip_kernel(iters, n, sh, swc)
    run = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, STRIP_ROWS, STRIP_LANES), jnp.bfloat16),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    fn = jax.jit(lambda y, x, im: run(y, x, im))
    np.asarray(fn(ys, xs, img))  # warm with a real fetch (see arm A)
    return _timed_fetch(lambda: np.asarray(fn(ys, xs, img)), iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960,
                    help="candidate pixels per round (SMEM caps the "
                         "prefetched index vectors; the per-row cost is "
                         "N-independent above the dispatch floor — "
                         "bench_gather.py)")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--sh", type=int, default=640)
    ap.add_argument("--sw", type=int, default=512)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter smoke (no timing value)")
    args = ap.parse_args()

    key = jax.random.key(0)
    print(f"[fused_eval] shape src={args.sh}x{args.sw} C'={CP} "
          f"n={args.n} iters={args.iters}", flush=True)

    dt_a = bench_xla_row_gather(args.sh, args.sw, args.n, args.iters, key)
    rows_ns_a = dt_a / args.n * 1e9
    bytes_a = args.n * 512 * 2
    print(f"  A  XLA table row-gather   : {dt_a*1e3:8.2f} ms "
          f"({rows_ns_a:6.1f} ns/row, {bytes_a/dt_a/2**30:6.1f} GiB/s useful)")

    dt_b = bench_pallas_strip_dma(args.sh, args.sw, args.n, args.iters,
                                  key, interpret=args.interpret)
    rows_ns_b = dt_b / args.n * 1e9
    useful = args.n * ROW_W * 2          # the 5x80 patch actually needed
    moved = args.n * STRIP_ROWS * STRIP_LANES * 2
    print(f"  B  Pallas strip DMA       : {dt_b*1e3:8.2f} ms "
          f"({rows_ns_b:6.1f} ns/row, {useful/dt_b/2**30:6.1f} GiB/s useful, "
          f"{moved/dt_b/2**30:6.1f} GiB/s moved, "
          f"{moved/useful:.1f}x amplification)")

    verdict = "WIN" if rows_ns_b < rows_ns_a else "REJECTED"
    print(f"  => from-image fused eval: {verdict} — per-candidate "
          f"descriptor cost {rows_ns_b:.1f} vs XLA {rows_ns_a:.1f} ns/row "
          f"BEFORE any in-kernel patch extraction (two one-hot matmuls "
          f"per pixel) the pre-stacked table avoids")
    return 0


if __name__ == "__main__":
    sys.exit(main())
