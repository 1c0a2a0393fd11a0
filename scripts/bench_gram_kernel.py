"""Validate + bench the fused sign-gram Pallas kernel on the v5e.

Correctness: sign_gram_apply vs the XLA chunked path in
guidance._gram_l1_grad (dense-C branch disabled to force the einsum
form) on identical bf16 inputs.  Both compute sign in f32 off the same
f32-accumulated G, so results should agree to accumulation-order noise.

Bench: per-iteration time of each at the stage-3 shape
([16, 4096, 320], C [16, 4096, 4096] bf16).
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

    out = loop(*args)
    fetch(out)
    t0 = time.perf_counter()
    fetch(loop(*args))
    return (time.perf_counter() - t0) / iters


def xla_grad(v_hat, corr_dense, gram_dtype=jnp.bfloat16, chunk_rows=1024):
    """The einsum path of guidance._gram_l1_grad with dense C slices."""
    b, hw, c = v_hat.shape
    vg = v_hat.astype(gram_dtype)
    grad = jnp.zeros((b, hw, c), jnp.float32)
    rows = min(chunk_rows, hw)
    for i in range(max(hw // rows, 1)):
        row0 = i * rows
        vc = jax.lax.dynamic_slice_in_dim(vg, row0, rows, axis=1)
        g = jnp.einsum("bic,bjc->bij", vc, vg, preferred_element_type=jnp.float32)
        cc = jax.lax.dynamic_slice_in_dim(
            corr_dense, row0, rows, axis=1
        ).astype(jnp.float32)
        s = jnp.sign(g - cc).astype(gram_dtype)
        gr = jnp.einsum("bij,bjc->bic", s, vg, preferred_element_type=jnp.float32)
        grad = jax.lax.dynamic_update_slice_in_dim(
            grad,
            jax.lax.dynamic_slice_in_dim(grad, row0, rows, axis=1) + 2.0 * gr,
            row0, axis=1,
        )
    return grad / (b * hw * hw)


def main():
    enable_compilation_cache()
    from fresco_tpu.ops.gram_kernel import sign_gram_apply

    rng = np.random.default_rng(0)

    # --- correctness at a small shape ---------------------------------
    b, hw, c = 4, 1024, 320
    v = jnp.asarray(rng.standard_normal((b, hw, c)), jnp.bfloat16)
    vn = v / jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, -1, keepdims=True)).astype(
        jnp.bfloat16
    )
    vr = jnp.asarray(rng.standard_normal((b, hw, c)), jnp.bfloat16)
    corr = jnp.einsum(
        "bic,bjc->bij", vr, vr, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)

    ref = np.asarray(jax.jit(xla_grad)(vn, corr))
    out = np.asarray(
        jax.jit(lambda v_, c_: 2.0 * sign_gram_apply(v_, c_) / (b * hw * hw))(
            vn, corr
        )
    )
    diff = np.abs(out - ref)
    rel = diff.max() / (np.abs(ref).max() + 1e-12)
    print(f"correctness: max|d|={diff.max():.3e} rel={rel:.3e} "
          f"(ref max {np.abs(ref).max():.3e})", flush=True)
    assert rel < 0.05, "kernel deviates from XLA path beyond sign-tie noise"

    # --- bench at the feature-opt stage shapes (VERDICT r3 #3a: A/B
    # block shapes at c=640/1280 too, not just the r2 c=320) -----------
    for b, hw, c in ((16, 4096, 320), (16, 4096, 640), (16, 1024, 1280)):
        v = jnp.asarray(rng.standard_normal((b, hw, c)), jnp.bfloat16)
        corr = jnp.zeros((b, hw, hw), jnp.bfloat16)
        flops = 2 * 2 * b * hw * hw * c

        t = timeit(functools.partial(xla_grad, chunk_rows=1024), v, corr)
        print(f"[{b},{hw},{c}] XLA chunked grad : {t*1e3:7.1f} ms  "
              f"{flops/t/1e12:6.1f} TF/s", flush=True)
        for bm, bn in ((512, 512), (256, 1024), (1024, 512), (512, 1024),
                       (256, 512), (1024, 1024)):
            if hw % bm or hw % bn:
                continue
            try:
                tk = timeit(
                    functools.partial(sign_gram_apply, bm=bm, bn=bn), v, corr
                )
                print(f"[{b},{hw},{c}] pallas fused {bm}x{bn}: "
                      f"{tk*1e3:7.1f} ms  {flops/tk/1e12:6.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"[{b},{hw},{c}] pallas fused {bm}x{bn}: FAIL "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
