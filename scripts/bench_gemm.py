"""Microbench: the feature-opt warp/gram GEMM shapes on the v5e.

The r2 in-scan attribution pinned optimize_feature's per-iter slope on a
measured 43 TF/s batched-GEMM rate for the dense warp applications
([8, 4096, 4096] bf16 x [8, 4096, 1280]) — 39% of the 111.6 TF/s
single-matmul calibration.  This script A/Bs XLA lowerings and a Pallas
batched-matmul kernel to find the fastest route (VERDICT r2 item 2).
"""
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
    # slice ON DEVICE first: np.asarray(full) would pull the whole
    # tensor through the tunnel (~1.4 s for 268 MB — it swamped the
    # compute entirely in the first version of this script)
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, iters=10):
    """Per-iteration time with the loop INSIDE one jit dispatch: this
    tunnel's per-dispatch latency (~0.2-2 s) swamps any per-call timing,
    so we scan the op and perturb the operand per step to defeat CSE."""

    @jax.jit
    def loop(a0, *rest):
        def body(a, _):
            out = fn(a, *rest)
            # fold a scalar of the output back into the input: serial
            # dependency, no DCE, negligible extra work
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


# ---- Pallas batched matmul: grid (B, M/bm, N/bn, K/bk) ------------------
def _mm_kernel(a_ref, b_ref, o_ref, acc, *, nk):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot(
        a_ref[0], b_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = acc[:].astype(o_ref.dtype)


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def pallas_bmm(a, b, bm=512, bn=512, bk=2048):
    B, M, K = a.shape
    N = b.shape[2]
    nk = K // bk
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk),
        grid=(B, M // bm, N // bn, nk),
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda b_, i, j, k: (b_, i, k)),
            pl.BlockSpec((1, bk, bn), lambda b_, i, j, k: (b_, k, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda b_, i, j, k: (b_, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )(a, b)


def main():
    enable_compilation_cache()
    rng = jax.random.key(0)
    F, HW, D = 8, 4096, 1280
    a = jax.random.normal(rng, (F, HW, HW), jnp.bfloat16)
    x = jax.random.normal(rng, (F, HW, D), jnp.bfloat16)
    x2 = x.reshape(2, F, HW, D // 2)
    flops = 2 * F * HW * HW * D

    e1 = jax.jit(lambda a, x: jnp.einsum(
        "fij,fjd->fid", a, x, preferred_element_type=jnp.float32))
    t = timeit(e1, a, x)
    print(f"einsum fij,fjd (flat k)     : {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)

    e2 = jax.jit(lambda a, x: jnp.einsum(
        "fij,kfjc->kfic", a, x, preferred_element_type=jnp.float32))
    t = timeit(e2, a, x2)
    print(f"einsum fij,kfjc (guidance)  : {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)

    # single big-batch GEMM comparison point: same total FLOPs, one batch elt
    a1 = a.reshape(1, F * HW, HW)[:, :HW]  # [1, 4096, 4096]
    x1 = x[:1]
    f1 = 2 * HW * HW * D
    e3 = jax.jit(lambda a, x: jnp.einsum(
        "fij,fjd->fid", a, x, preferred_element_type=jnp.float32))
    t = timeit(e3, a1, x1)
    print(f"single [4096,4096]x[.,1280] : {t*1e3:7.1f} ms  {f1/t/1e12:6.1f} TF/s", flush=True)

    for bm, bn, bk in ((512, 640, 2048), (512, 1280, 1024), (256, 640, 2048),
                       (1024, 640, 512), (256, 1280, 1024)):
        if D % bn and bn % D:
            continue
        try:
            t = timeit(functools.partial(pallas_bmm, bm=bm, bn=bn, bk=bk), a, x)
            print(f"pallas bmm bm{bm} bn{bn} bk{bk}: {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"pallas bmm bm{bm} bn{bn} bk{bk}: FAIL {str(e)[:120]}", flush=True)

    # gram shape: [16, 1024, 320] x [16, 4096, 320]^T chunks
    B2 = 16
    v = jax.random.normal(rng, (B2, HW, 320), jnp.bfloat16)
    vc = v[:, :1024]
    fg = 2 * B2 * 1024 * HW * 320
    g1 = jax.jit(lambda p, q: jnp.einsum(
        "bic,bjc->bij", p, q, preferred_element_type=jnp.float32))
    t = timeit(g1, vc, v)
    print(f"gram build [16,1024,320]xT  : {t*1e3:7.1f} ms  {fg/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
