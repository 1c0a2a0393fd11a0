"""A/B: autodiff temporal gradient vs the folded analytic one.

VERDICT r3 #3a: fold the fwd+bwd warp applications into one batched
GEMM.  ``jax.grad(temporal_loss)`` dispatches 4 warp-shaped GEMMs per
Adam iteration and contracts bf16 W against an f32 cotangent in the
backward pair; ``diffusion.rejected.temporal_grad`` stacks both directions into
one [2F, hw, hw] GEMM each way with a bf16 cotangent.  This script
times both at the two dominant feature-opt stage shapes (512px, batch
8, chunk 2) and checks numerics.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from fresco_tpu.core.cache import enable_compilation_cache
from fresco_tpu.diffusion import guidance as G
from fresco_tpu.diffusion import rejected as GR


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, iters=20):
    @jax.jit
    def loop(a0, *rest):
        def body(a, _):
            out = fn(a, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            a = a + leaf.ravel()[0].astype(a.dtype) * 1e-30
            return a, ()

        a0, _ = jax.lax.scan(body, a0, None, length=iters)
        return a0

    out = loop(*args)
    fetch(out)
    t0 = time.perf_counter()
    out = loop(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def run_shape(h, w, c, f=8, chunk=2):
    hw = h * w
    rng = jax.random.key(0)
    ks = jax.random.split(rng, 4)
    cs = jax.random.normal(ks[0], (chunk * f, h, w, c), jnp.float32)
    flow_f = jax.random.normal(ks[1], (f, h, w, 2)) * 2.0
    flow_b = jax.random.normal(ks[2], (f, h, w, 2)) * 2.0
    occ_f = (jax.random.uniform(ks[3], (f, h, w, 1)) < 0.2).astype(jnp.float32)
    occ_b = (jax.random.uniform(ks[3], (f, h, w, 1)) < 0.2).astype(jnp.float32)
    # build the warp matrices ON DEVICE inside a jit (a host-side
    # constant would be baked into the remote-compile upload: HTTP 413)
    wf, wb = jax.jit(
        lambda a, b: (G.warp_matrix(a, jnp.bfloat16),
                      G.warp_matrix(b, jnp.bfloat16))
    )(flow_f, flow_b)

    # warp matrices/masks as ARGUMENTS, not closure constants
    def old(cs, wf, wb, occ_f, occ_b):
        return jax.grad(
            lambda x: G.temporal_loss(x, wf, wb, occ_f, occ_b, chunk)
        )(cs)

    def new(cs, wf, wb, occ_f, occ_b):
        return GR.temporal_grad(cs, wf, wb, occ_f, occ_b, chunk)

    args = (wf, wb, occ_f, occ_b)
    g_old = jax.jit(old)(cs, *args)
    g_new = jax.jit(new)(cs, *args)
    d = float(jnp.max(jnp.abs(g_old - g_new)))
    r = float(jnp.max(jnp.abs(g_old)))
    t_old = timeit(old, cs, *args)
    t_new = timeit(new, cs, *args)
    # 4 warp GEMMs/iter either way
    flops = 4 * 2 * f * hw * hw * chunk * c
    print(
        f"hw={hw:5d} c={c:4d}: autodiff {t_old*1e3:7.2f} ms "
        f"({flops/t_old/1e12:5.1f} TF/s)  folded {t_new*1e3:7.2f} ms "
        f"({flops/t_new/1e12:5.1f} TF/s)  speedup {t_old/t_new:4.2f}x  "
        f"max|d|={d:.2e} (ref max {r:.2e})",
        flush=True,
    )


def main():
    enable_compilation_cache()
    run_shape(64, 64, 640)    # stage 3 input (up_3 @512px)
    run_shape(32, 32, 1280)   # stage 2 input
    run_shape(16, 16, 1280)   # stage 1 input


if __name__ == "__main__":
    main()
