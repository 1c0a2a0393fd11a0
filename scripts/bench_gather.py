"""Microbench: the patchmatch row-gather at the finest-level shape.

The propagation wall is eval_cand's wide row-gather (PERF.md): each
candidate evaluation takes [th*tw] arbitrary rows from the pre-stacked
patch table [sh*sw, n_off*C].  This measures what ONE such gather costs
under XLA on the v5e (in-graph scan with serial dependency so CSE can't
collapse it, single-slice fetch — the fetch-timed methodology from
PERF.md), across table widths, dtypes and index locality, vs the
HBM-bandwidth floor.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    th, tw = 512, 640
    n = th * tw
    rng = np.random.default_rng(0)

    def bench(width, dtype, idx_mode, iters=64):
        table = jnp.asarray(
            rng.standard_normal((n, width)).astype(np.float32)
        ).astype(dtype)
        if idx_mode == "random":
            idx = rng.integers(0, n, (n,)).astype(np.int32)
        else:  # coherent: near-identity with small jitter (converged NNF)
            idx = np.clip(
                np.arange(n) + rng.integers(-3, 4, (n,)), 0, n - 1
            ).astype(np.int32)
        idx = jnp.asarray(idx)

        @jax.jit
        def run(table, idx):
            def body(carry, _):
                i2 = (idx + carry) % n
                g = jnp.take(table, i2, axis=0)
                # serial dep: fold the gathered sum back into the index
                s = jnp.sum(g.astype(jnp.float32))
                return (carry + s.astype(jnp.int32) % 7 + 1), g[0, 0]
            c, outs = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return outs

        out = run(table, idx)
        _ = np.asarray(out)  # warm
        t0 = time.perf_counter()
        out = run(table, idx)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        mb = n * width * np.dtype(dtype).itemsize / 2**20
        bw = mb / 1024 / dt
        print(
            f"[gather] width={width:4d} {np.dtype(dtype).name:8s} "
            f"{idx_mode:8s}: {dt*1e3:7.2f} ms/gather  "
            f"({mb:.0f} MB, {bw:.1f} GB/s eff)",
            flush=True,
        )
        return dt

    for idx_mode in ("random", "coherent"):
        for width, dtype in (
            (326, jnp.bfloat16),   # the real finest-level table row
            (384, jnp.bfloat16),   # lane-padded
            (326, jnp.float32),
            (128, jnp.bfloat16),
            (512, jnp.bfloat16),
            # uint8 storage candidate (PERF.md round-4 queue): halves
            # the row bytes; quantization error comparable to bf16's
            # ~1-unit steps at [128, 256)
            (326, jnp.uint8),
            (384, jnp.uint8),
        ):
            bench(width, dtype, idx_mode)


if __name__ == "__main__":
    sys.exit(main())
