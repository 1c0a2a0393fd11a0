"""A/B the flash kernel's matmul dtype on the chip.

The cf workload: B=chunk 2, H=8, Sq=F*hw (queries folded), Sk=cap.
Decides whether the kernel should upcast q/k/v to f32 (one hypothesis:
Mosaic prefers f32 K=128 passes here) or keep bf16 + f32 accumulation.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from fresco_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from fresco_tpu.attention.flash import flash_attention

    f, hw, heads, d = 8, 4096, 8, 40
    rng = jax.random.key(0)
    ks = jax.random.split(rng, 4)

    for name, sk in (("compact", 2 * hw), ("dense", f * hw)):
        q = jax.random.normal(ks[0], (2, heads, f * hw, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (2, heads, sk, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (2, heads, sk, d), jnp.bfloat16)
        mask = jax.random.uniform(ks[3], (2, sk)) < 0.5

        fn = jax.jit(lambda q, k, v, m: flash_attention(q, k, v, key_mask=m))
        out = fn(q, k, v, mask)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = fn(q, k, v, mask)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        flops = 2 * 2 * heads * f * hw * sk * 128 * 2  # padded-d estimate
        print(
            f"[flash] {name}: Sq={f*hw} Sk={sk} -> {dt*1000:.1f} ms "
            f"({flops/dt/1e12:.1f} padded-TFLOP/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
