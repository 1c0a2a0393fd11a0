"""Prototype: DMA-based gather kernels vs XLA's gather emitter.

XLA's row-gather runs at ~42 GB/s effective at the patchmatch table
shape (bench_gather.py) — 20x below HBM bandwidth.  Two Pallas designs:

* flat1d: table flattened to [N*W]; each row is a 1-D DMA at idx*W.
  W = 384 = 3*128 keeps every slice lane-aligned, so the sublane
  alignment rule for dim-0 slices never applies.
* group8: table as [N/8, 8, W]; DMA the 8-row group containing each
  index (dim-0 slice of the untiled leading axis), then select the
  wanted sublane in-kernel (one-hot multiply + sublane reduce).
  8x DMA traffic but group slices are always legal.

Either beating 5.6 ms/327k rows decides the round-4 "Pallas gather"
queue item; a loss decides it the other way with data.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W_SEM = 16


def _flat_kernel(idx_ref, table_ref, out_ref, sems, *, block, w):
    g = pl.program_id(0)

    def copy(i, slot):
        src = pl.multiple_of(idx_ref[g * block + i] * w, 128)
        dst = pl.multiple_of(i * w, 128)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(src, w)],
            out_ref.at[pl.ds(dst, w)],
            sems.at[slot],
        )

    def body(i, _):
        @pl.when(i >= W_SEM)
        def _():
            copy(i - W_SEM, (i - W_SEM) % W_SEM).wait()

        copy(i, i % W_SEM).start()
        return ()

    jax.lax.fori_loop(0, block, body, ())

    def drain(j, _):
        i = block - W_SEM + j
        copy(i, i % W_SEM).wait()
        return ()

    jax.lax.fori_loop(0, W_SEM, drain, ())


def flat_gather(table, idx, block=2048):
    n, w = table.shape
    k = idx.shape[0]
    assert k % block == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (block * w,), lambda g, idx_ref: (g,), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W_SEM,))],
    )
    out = pl.pallas_call(
        functools.partial(_flat_kernel, block=block, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k * w,), table.dtype),
    )(idx, table.reshape(-1))
    return out.reshape(k, w)


def _group_kernel(idx_ref, table3_ref, out_ref, scratch, sems, *, block, w):
    g = pl.program_id(0)
    n_groups = block // 8

    def start_group(gi, slot):
        for j in range(8):
            pltpu.make_async_copy(
                table3_ref.at[idx_ref[g * block + gi * 8 + j] // 8],
                scratch.at[slot, j],
                sems.at[slot, j],
            ).start()

    def wait_group(gi, slot):
        for j in range(8):
            pltpu.make_async_copy(
                table3_ref.at[idx_ref[g * block + gi * 8 + j] // 8],
                scratch.at[slot, j],
                sems.at[slot, j],
            ).wait()

    start_group(0, 0)

    def body(gi, _):
        @pl.when(gi + 1 < n_groups)
        def _():
            start_group(gi + 1, (gi + 1) % 2)

        wait_group(gi, gi % 2)
        slot = gi % 2
        rows = []
        for j in range(8):
            r = idx_ref[g * block + gi * 8 + j] % 8
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r
            ).astype(table3_ref.dtype)
            rows.append(
                jnp.sum(scratch[slot, j] * sel, axis=0, keepdims=True)
            )
        out_ref[pl.ds(pl.multiple_of(gi * 8, 8), 8), :] = jnp.concatenate(
            rows, axis=0
        )
        return ()

    jax.lax.fori_loop(0, n_groups, body, ())


MAX_PREFETCH = 160 * 1024  # indices per call: 640 KB of the 1 MB SMEM


def _group_gather_one(table3, idx, block, w):
    k = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block, w), lambda g, idx_ref: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, 8, w), table3.dtype),
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_group_kernel, block=block, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, w), table3.dtype),
    )(idx, table3)


def group_gather(table, idx, block=2048):
    n, w = table.shape
    k = idx.shape[0]
    assert k % block == 0 and n % 8 == 0
    table3 = table.reshape(n // 8, 8, w)
    # the scalar-prefetch operand must fit SMEM (1 MB): chunk the call
    outs = []
    for c0 in range(0, k, MAX_PREFETCH):
        outs.append(
            _group_gather_one(table3, idx[c0 : c0 + MAX_PREFETCH], block, w)
        )
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def main():
    global jax, jnp, pl, pltpu
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    th, tw = 512, 640
    n = th * tw
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((n, 384)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx_small = jnp.asarray(rng.integers(0, 4096, (2048,)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n, (n,)).astype(np.int32))

    variants = {
        "group8": group_gather,
    }
    ok = {}
    for name, fn in variants.items():
        try:
            small = fn(table[:4096], idx_small, block=512)
            np.testing.assert_array_equal(
                np.asarray(small), np.asarray(table[:4096])[np.asarray(idx_small)]
            )
            print(f"[pgather] {name} correctness OK", flush=True)
            ok[name] = fn
        except Exception as e:
            print(f"[pgather] {name} FAILED: {str(e)[:300]}", flush=True)

    iters = 64

    def bench(fn, name):
        @jax.jit
        def run(table, idx):
            def body(c, _):
                i2 = (idx + c) % n
                g = fn(table, i2)
                s = jnp.sum(g.astype(jnp.float32))
                return (c + s.astype(jnp.int32) % 7 + 1), g[0, 0]
            c, outs = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return outs

        out = run(table, idx)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        out = run(table, idx)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        mb = n * 384 * 2 / 2**20
        print(f"[pgather] {name}: {dt*1e3:7.2f} ms ({mb/1024/dt:.1f} GB/s eff)",
              flush=True)

    bench(lambda t, i: jnp.take(t, i, axis=0), "xla take")
    for name, fn in ok.items():
        for blk in (2048,):
            bench(functools.partial(fn, block=blk), f"{name} (block {blk})")


if __name__ == "__main__":
    main()
