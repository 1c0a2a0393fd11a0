"""Attribute the chain-synthesis per-position cost on real r4 data."""
import time, os, numpy as np, cv2, jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize
from fresco_tpu.propagate.guides import positional_chain, edge_guide, temporal_guide
from fresco_tpu.propagate.video_blend import GUIDE_WEIGHTS
from fresco_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

base = 'output/music_r4'
beg, end = 0, 26
frames = [cv2.imread(f'{base}/video/%04d.png' % i) for i in range(beg, end+1)]
key = cv2.imread(f'{base}/keys/%04d.png' % beg)
h, w = frames[0].shape[:2]
print('shape', h, w, flush=True)
flows = []
for j in range(end - beg - 1):
    z = np.load(f'{base}/tmp/flow_f{beg}_{j}.npz')
    flows.append((z['flow'], z['occ']))
cfg = PatchMatchConfig()
t0 = time.perf_counter()
pg = positional_chain(h, w, [f for f,_ in flows], [o for _,o in flows])
print(f'positional_chain: {time.perf_counter()-t0:.2f}s', flush=True)
es = edge_guide(frames[0])
src = np.concatenate([frames[0], es, key, pg[0]], axis=-1).astype(np.float32)
wpc = [np.full(3, GUIDE_WEIGHTS['color']/3), np.full(3, GUIDE_WEIGHTS['edge']/3),
       np.full(3, GUIDE_WEIGHTS['temporal']/3), np.full(3, GUIDE_WEIGHTS['positional']/3)]
weights = jnp.asarray(np.concatenate(wpc), jnp.float32)
style = jnp.asarray(key.astype(np.float32))
srcg = jnp.asarray(src)
rng = jax.random.key(0)
prev = key
for j in range(1, 5):
    t0 = time.perf_counter()
    bwd_flow, bwd_occ = flows[j-1]
    temporal = temporal_guide(prev, bwd_flow, bwd_occ)
    tgt = np.concatenate([frames[j], edge_guide(frames[j]), temporal, pg[j]], axis=-1).astype(np.float32)
    t1 = time.perf_counter()
    tgt_d = jnp.asarray(tgt); tgt_d.block_until_ready()
    t2 = time.perf_counter()
    out, err, _ = synthesize(style, srcg, tgt_d, weights, cfg,
                             rng=jax.random.fold_in(rng, j))
    out.block_until_ready()
    t3 = time.perf_counter()
    out_np = np.clip(np.asarray(out), 0, 255).astype(np.uint8)
    err_np = np.asarray(err)
    t4 = time.perf_counter()
    prev = out_np
    print(f'pos {j}: guides {t1-t0:.2f}s upload {t2-t1:.2f}s synth {t3-t2:.2f}s fetch {t4-t3:.2f}s', flush=True)
# harness-style comparison at the same shape
noise_style = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (h, w, 3)).astype(np.float32))
gsrc = jnp.asarray(np.random.default_rng(1).uniform(0, 255, (h, w, 12)).astype(np.float32))
gtgt = jnp.asarray(np.random.default_rng(2).uniform(0, 255, (h, w, 12)).astype(np.float32))
for k in range(2):
    t0 = time.perf_counter()
    out, err, _ = synthesize(noise_style, gsrc, gtgt, weights, cfg, rng=jax.random.fold_in(rng, 99+k))
    out.block_until_ready()
    print(f'noise-harness call {k}: {time.perf_counter()-t0:.2f}s', flush=True)
# real style, same-position repeat (dispatch steady-state)
t0 = time.perf_counter()
out, err, _ = synthesize(style, srcg, tgt_d, weights, cfg, rng=jax.random.fold_in(rng, 7))
out.block_until_ready()
print(f'repeat real call: {time.perf_counter()-t0:.2f}s', flush=True)
