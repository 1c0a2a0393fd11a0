"""Microbench: active-pixel compaction primitives at patchmatch scale.

Freeze-compaction (gathering candidate rows only for unfrozen pixels)
needs, per search-vote iteration: one argsort of the [N] freeze mask,
per-pm-iteration narrow gathers of the candidate maps at the compacted
positions, and one scatter of the compacted best-match back to the
grid.  This measures each primitive so the tier design (which caps pay)
is grounded in numbers, alongside the 8.6 ms/N-row table gather from
bench_gather.py.
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

    n = 512 * 640
    rng = np.random.default_rng(0)
    iters = 64

    def timed(name, fn, *args):
        out = jax.jit(fn)(*args)
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)  # warm
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
        dt = (time.perf_counter() - t0) / iters
        print(f"[compact] {name}: {dt*1e3:7.2f} ms", flush=True)
        return dt

    active = jnp.asarray(rng.random(n) < 0.25)

    def argsort_bool(a):
        def body(c, _):
            a2 = jnp.logical_xor(a, c)
            p = jnp.argsort(~a2, stable=True)
            return jnp.any(p == -1), p[:1]
        return jax.lax.scan(body, jnp.bool_(False), None, length=iters)

    timed("argsort [N] bool (stable)", argsort_bool, active)

    # cumsum-based slot assignment (the scatter-free alternative):
    # slot[p] = cumsum(active)[p]-1 for active p; then one scatter builds
    # the permutation
    def cumsum_scatter(a):
        def body(c, _):
            a2 = jnp.logical_xor(a, c)
            slots = jnp.cumsum(a2.astype(jnp.int32)) - 1
            perm = jnp.zeros((n,), jnp.int32)
            perm = perm.at[jnp.where(a2, slots, n - 1)].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop"
            )
            return jnp.any(perm == -1), perm[:1]
        return jax.lax.scan(body, jnp.bool_(False), None, length=iters)

    timed("cumsum+scatter perm build", cumsum_scatter, active)

    cand = jnp.asarray(rng.integers(0, n, (n, 2)).astype(np.int32))
    table = jnp.asarray(
        rng.standard_normal((n, 384)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def narrow_gather(cand, idx):
        def body(c, _):
            g = jnp.take(cand, (idx + c) % n, axis=0)
            return c + g[0, 0] % 3 + 1, g[0, 0]
        return jax.lax.scan(body, jnp.int32(0), None, length=iters)

    def scatter_rows(base, idx, vals):
        def body(c, _):
            b = base.at[(idx + c) % n].set(vals + jnp.float32(c))
            return c + 1, b[0, 0]
        return jax.lax.scan(body, jnp.int32(0), None, length=iters)

    def table_gather(table, idx):
        def body(c, _):
            g = jnp.take(table, (idx + c) % n, axis=0)
            s = jnp.sum(g.astype(jnp.float32))
            return c + s.astype(jnp.int32) % 7 + 1, g[0, 0]
        return jax.lax.scan(body, jnp.int32(0), None, length=iters)

    for div in (4, 16, 64):
        k = n // div
        idx = jnp.asarray(rng.integers(0, n, (k,)).astype(np.int32))
        vals = jnp.asarray(rng.standard_normal((k, 3)).astype(np.float32))
        base = jnp.zeros((n, 3), jnp.float32)
        timed(f"narrow gather [N/{div}, 2]", narrow_gather, cand, idx)
        timed(f"scatter [N/{div}, 3] rows", scatter_rows, base, idx, vals)
        timed(f"table gather [N/{div} rows, 384]", table_gather, table, idx)


if __name__ == "__main__":
    main()
