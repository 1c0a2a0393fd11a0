"""Dense vs banded warp application at the stage-3 feature-opt shape."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from fresco_tpu.core.cache import enable_compilation_cache


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, iters=10):
    @jax.jit
    def loop(a0, *rest):
        def body(a, _):
            out = fn(a, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return a + leaf.ravel()[0].astype(a.dtype) * 1e-30, ()

        a0, _ = jax.lax.scan(body, a0, None, length=iters)
        return a0

    fetch(loop(*args))
    t0 = time.perf_counter()
    fetch(loop(*args))
    return (time.perf_counter() - t0) / iters


def main():
    enable_compilation_cache()
    from fresco_tpu.diffusion.guidance import (
        apply_banded_warp, warp_matrix, warp_matrix_banded,
    )

    rng = np.random.default_rng(0)
    f, h, w, d = 8, 64, 64, 1280
    hw = h * w
    flow = jnp.asarray(rng.uniform(-4, 4, (f, h, w, 2)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((f, hw, d)), jnp.bfloat16)

    dense = warp_matrix(flow, jnp.bfloat16)
    _, wb, block = warp_matrix_banded(flow, jnp.bfloat16)
    flops_d = 2 * f * hw * hw * d
    flops_b = 2 * f * hw * 3 * block * d

    # forward apply (matrices passed as args — closures would ship the
    # 268 MB dense matrix inside the remote-compile request, HTTP 413)
    t = timeit(lambda x_, m: jnp.einsum(
        "fij,fjd->fid", m, x_, preferred_element_type=jnp.float32), x, dense)
    print(f"dense fwd : {t*1e3:6.1f} ms  {flops_d/t/1e12:5.1f} TF/s", flush=True)
    t = timeit(lambda x_, m: apply_banded_warp(m, block, x_), x, wb)
    print(f"banded fwd: {t*1e3:6.1f} ms  {flops_b/t/1e12:5.1f} TF/s (eff "
          f"{flops_d/t/1e12:5.1f})", flush=True)

    # fwd+bwd via grad (the Adam-loop pattern)
    t = timeit(lambda x_, m: jax.grad(
        lambda z: jnp.sum(jnp.abs(jnp.einsum(
            "fij,fjd->fid", m, z, preferred_element_type=jnp.float32)))
    )(x.astype(jnp.float32)), x, dense)
    print(f"dense grad : {t*1e3:6.1f} ms", flush=True)
    t = timeit(lambda x_, m: jax.grad(
        lambda z: jnp.sum(jnp.abs(apply_banded_warp(m, block, z)))
    )(x.astype(jnp.float32)), x, wb)
    print(f"banded grad: {t*1e3:6.1f} ms", flush=True)

    # build cost
    t = timeit(lambda fl: warp_matrix(fl, jnp.bfloat16), flow)
    print(f"dense build : {t*1e3:6.1f} ms", flush=True)
    t = timeit(lambda fl: warp_matrix_banded(fl, jnp.bfloat16)[1], flow)
    print(f"banded build: {t*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
