"""Interval-parallel propagation: shard_map wave == serial synthesis.

The reference fans propagation out over up to 8 worker processes
(reference video_blend.py:114-139, MAX_PROCESS=8 :25); the TPU rebuild
runs one chain per mesh device (propagate/parallel.py).  These tests
assert the sharded path reproduces the serial path exactly (same rng
streams, zero collectives) on the 8-virtual-device CPU mesh.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fresco_tpu.propagate.parallel import jobs_mesh, synthesize_sharded
from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize


def _jobs(rng, h, w, n):
    jobs = []
    for i in range(n):
        style = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        src_g = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        tgt_g = np.roll(src_g, (3 + i, 1), (0, 1))
        jobs.append((style, src_g, tgt_g))
    return jobs


def test_synthesize_sharded_matches_serial(rng):
    """4 jobs over 4 CPU devices == 4 serial synthesize calls."""
    h = w = 48
    nb = 4
    jobs = _jobs(rng, h, w, nb)
    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=3, sv_iters=3, num_pyramid_levels=2
    )
    gw = jnp.full((3,), 2.0)
    keys = jax.random.split(jax.random.key(7), nb)

    serial = [
        tuple(
            np.asarray(x)
            for x in synthesize(
                jnp.asarray(st), jnp.asarray(sg), jnp.asarray(tg), gw, cfg,
                rng=keys[i],
            )
        )
        for i, (st, sg, tg) in enumerate(jobs)
    ]
    so, se, sn = synthesize_sharded(
        jnp.asarray(np.stack([j[0] for j in jobs])),
        jnp.asarray(np.stack([j[1] for j in jobs])),
        jnp.asarray(np.stack([j[2] for j in jobs])),
        gw, cfg, keys, mesh=jobs_mesh(nb),
    )
    so, se, sn = np.asarray(so), np.asarray(se), np.asarray(sn)
    for i in range(nb):
        np.testing.assert_array_equal(sn[i], serial[i][2])
        np.testing.assert_allclose(so[i], serial[i][0], atol=1e-4)
        np.testing.assert_allclose(se[i], serial[i][1], rtol=1e-5, atol=1e-3)


@pytest.mark.slow
def test_sharded_compaction_tiers_match_serial(rng):
    """At >=16384 target pixels the freeze-compaction lax.cond tiers are
    live; shard_map must keep them as real per-device branches with
    serial-identical results (a vmap would lower them to selects)."""
    h = w = 128
    nb = 2
    jobs = _jobs(rng, h, w, nb)
    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=2, sv_iters=3, num_pyramid_levels=1,
        stop_threshold=5.0, compact_tiers=(2, 4, 16),
    )
    gw = jnp.full((3,), 2.0)
    keys = jax.random.split(jax.random.key(3), nb)

    serial = [
        np.asarray(
            synthesize(
                jnp.asarray(st), jnp.asarray(sg), jnp.asarray(tg), gw, cfg,
                rng=keys[i],
            )[0]
        )
        for i, (st, sg, tg) in enumerate(jobs)
    ]
    so, _, _ = synthesize_sharded(
        jnp.asarray(np.stack([j[0] for j in jobs])),
        jnp.asarray(np.stack([j[1] for j in jobs])),
        jnp.asarray(np.stack([j[2] for j in jobs])),
        gw, cfg, keys, mesh=jobs_mesh(nb),
    )
    for i in range(nb):
        np.testing.assert_allclose(np.asarray(so)[i], serial[i], atol=1e-4)


@pytest.mark.slow
def test_blend_video_wave_matches_serial(tmp_path, rng):
    """Full blend_video with n_devices=8 (wave scheduling) must write
    the same frames as the serial n_devices=1 path."""
    cv2 = pytest.importorskip("cv2")
    from fresco_tpu.models.gmflow import GMFlow, GMFlowConfig
    from fresco_tpu.propagate.video_blend import blend_video

    h = w = 48
    serial_dir = tmp_path / "serial"
    wave_dir = tmp_path / "wave"
    base = rng.integers(30, 120, (h, w, 3)).astype(np.uint8)
    for d in (serial_dir, wave_dir):
        os.makedirs(d / "video")
        os.makedirs(d / "keys")
        for i in range(9):
            f = base.copy()
            f[10 : 14 + 2 * i, 8:24] = (60, 200, 60)
            cv2.imwrite(str(d / "video" / ("%04d.png" % i)), f)
            if i in (0, 3, 8):  # unequal interval lengths (3 and 5)
                cv2.imwrite(str(d / "keys" / ("%04d.png" % i)), 255 - f)

    model = GMFlow(GMFlowConfig.tiny())
    z = jnp.zeros((1, h, w, 3))
    params = model.init(jax.random.key(0), z, z)
    flow_fn = jax.jit(lambda a, b: model.apply(params, a, b))
    cfg = PatchMatchConfig(
        patch_size=5, pm_iters=2, sv_iters=2, num_pyramid_levels=2
    )

    kw = dict(
        key_ind=[0, 3, 8], poisson=True, flow_fn=flow_fn, patch_cfg=cfg,
        keep_tmp=False,
    )
    blend_video(str(serial_dir), n_devices=1, **kw)
    blend_video(str(wave_dir), n_devices=8, **kw)

    for i in range(9):
        a = cv2.imread(str(serial_dir / "blend" / ("%04d.png" % i)))
        b = cv2.imread(str(wave_dir / "blend" / ("%04d.png" % i)))
        assert a is not None and b is not None, i
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
