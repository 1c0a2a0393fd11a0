import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from fresco_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

n_tab = 640 * 512
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((n_tab, 512)).astype(np.float32)).astype(jnp.bfloat16)

def bench(name, fn, *args, iters=16):
    out = np.asarray(fn(*args))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s}: {dt*1e3:9.2f} ms/iter", flush=True)

ITERS = 16

# V1: bench_gather formulation (scalar carry), n = full table
idx_full = jnp.asarray(rng.integers(0, n_tab, (n_tab,)).astype(np.int32))
@jax.jit
def v1(table, idx):
    def body(c, _):
        i2 = (idx + c) % n_tab
        g = jnp.take(table, i2, axis=0)
        s = jnp.sum(g.astype(jnp.float32))
        return (c + s.astype(jnp.int32) % 7 + 1), g[0, 0]
    c, outs = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
    return outs

# V2: same scalar carry, n = 40960
idx_small = jnp.asarray(rng.integers(0, n_tab, (40960,)).astype(np.int32))
@jax.jit
def v2(table, idx):
    def body(c, _):
        i2 = (idx + c) % n_tab
        g = jnp.take(table, i2, axis=0)
        s = jnp.sum(g.astype(jnp.float32))
        return (c + s.astype(jnp.int32) % 7 + 1), g[0, 0]
    c, outs = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
    return outs

# V3: vector carry (fused_eval arm A), n = 40960
@jax.jit
def v3(table, idx):
    def body(ix, _):
        g = jnp.take(table, ix, axis=0)
        nxt = (ix + g[:, 0].astype(jnp.int32)) % n_tab
        return nxt, g[0, 0]
    ix, outs = jax.lax.scan(body, idx, None, length=ITERS)
    return outs

# V4: vector carry but full-row-sum dependency, n = 40960
@jax.jit
def v4(table, idx):
    def body(ix, _):
        g = jnp.take(table, ix, axis=0)
        s = jnp.sum(g.astype(jnp.float32), axis=1)
        nxt = (ix + s.astype(jnp.int32)) % n_tab
        return nxt, g[0, 0]
    ix, outs = jax.lax.scan(body, idx, None, length=ITERS)
    return outs

bench("V1 scalar-carry n=327k", v1, table, idx_full, iters=ITERS)
bench("V2 scalar-carry n=41k", v2, table, idx_small, iters=ITERS)
bench("V3 vector-carry col0 n=41k", v3, table, idx_small, iters=ITERS)
bench("V4 vector-carry rowsum n=41k", v4, table, idx_small, iters=ITERS)
