"""Pin the bench full-row aux device costs (bf16, jitted, DCE-trimmed):
EGNet forward, its backbone/merge sections, and the GMFlow bidir
forward, each amortized over ITERS serial iterations inside ONE jit
(CLAUDE.md: single-dispatch timings over the axon tunnel must amortize
the ~65 ms fetch RTT).  Informs whether the 0.994-vs-1.0 full-row gap
has honest aux headroom."""
import sys, time

sys.path.insert(0, "/root/repo")
from fresco_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 16
RES = 512
F = 8


def timed(name, make_fn, *args):
    fn = jax.jit(make_fn)
    out = np.asarray(fn(*args))  # warm: fetch, not block (axon)
    t0 = time.perf_counter()
    out = np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s}: {dt*1e3:8.1f} ms/fwd", flush=True)
    return dt


def scanned(body):
    """Run body ITERS times serially with a scalar carry dependency."""
    def fn(*args):
        def step(c, _):
            o = body(c, *args)
            return o, ()
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=ITERS)
        return c
    return fn


def main():
    from fresco_tpu.models.egnet import EGNet, ResNet50Backbone
    from fresco_tpu.pipeline.runner import _aux_caster

    cast = _aux_caster("bfloat16")
    rng = np.random.default_rng(0)

    # ---- EGNet at the bench saliency shape (half-res input) ----
    eg = EGNet()
    x_eg = jnp.asarray(
        rng.standard_normal((F, RES // 2, RES // 2, 3)), jnp.bfloat16
    )
    p_eg = cast(jax.jit(eg.init)(jax.random.key(1), x_eg[:1]))

    timed("egnet full (score head only)",
          scanned(lambda c, p, x: c + eg.apply(p, x + c.astype(x.dtype))[2][-1]
                  .astype(jnp.float32).mean()),
          p_eg, x_eg)

    bb = ResNet50Backbone()
    p_bb = cast(jax.jit(bb.init)(jax.random.key(1), x_eg[:1]))
    timed("egnet backbone only",
          scanned(lambda c, p, x: c + bb.apply(p, x + c.astype(x.dtype))[-1]
                  .astype(jnp.float32).mean()),
          p_bb, x_eg)

    # ---- GMFlow at the bench flow shape (full-res pairs) ----
    from fresco_tpu.models.gmflow.model import GMFlow

    gm = GMFlow()
    a = jnp.asarray(rng.standard_normal((F, RES, RES, 3)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((F, RES, RES, 3)), jnp.bfloat16)
    p_gm = cast(jax.jit(gm.init)(jax.random.key(1), a[:1], b[:1]))

    timed("gmflow bidir (8 pairs)",
          scanned(lambda c, p, xa, xb: c + gm.apply(
              p, xa + c.astype(xa.dtype), xb)[0]
              .astype(jnp.float32).mean()),
          p_gm, a, b)


if __name__ == "__main__":
    main()
