import time, numpy as np, jax, jax.numpy as jnp
print(jax.devices(), flush=True)
x = np.random.uniform(0, 255, (512, 640, 12)).astype(np.float32)  # 15.7MB
# upload
for i in range(3):
    t0 = time.perf_counter()
    d = jax.device_put(x); d.block_until_ready()
    t1 = time.perf_counter()
    print(f"upload 15.7MB: {t1-t0:.3f}s ({x.nbytes/1e6/(t1-t0):.1f} MB/s)", flush=True)
# download
y = jnp.ones((512, 640, 3), jnp.uint8) * 3
y.block_until_ready()
for i in range(3):
    t0 = time.perf_counter()
    h = np.asarray(y)
    t1 = time.perf_counter()
    print(f"fetch 1MB uint8: {t1-t0:.3f}s ({y.nbytes/1e6/(t1-t0):.1f} MB/s)", flush=True)
z = jnp.ones((512, 640, 4), jnp.float32)
z.block_until_ready()
for i in range(3):
    t0 = time.perf_counter()
    h = np.asarray(z)
    t1 = time.perf_counter()
    print(f"fetch 5.2MB f32: {t1-t0:.3f}s ({z.nbytes/1e6/(t1-t0):.1f} MB/s)", flush=True)
# small-op RTT
s = jnp.float32(1.0)
f = jax.jit(lambda a: a + 1)
f(s).block_until_ready()
t0 = time.perf_counter()
for i in range(10):
    s = f(s); s.block_until_ready()
print(f"RTT per tiny jit call: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)
