"""Multi-host helpers (single-process degenerate behavior + mesh layout
on the 8-virtual-device CPU platform)."""
import numpy as np
import pytest

import jax

from fresco_tpu.parallel import distributed as dist


def test_initialize_single_process_fallback():
    # off-TPU with no explicit rendezvous -> stays single-process
    assert dist.initialize() is False
    assert dist.is_main_process()


def test_global_mesh_layout():
    mesh = dist.make_global_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    # host-major order: each model group is a contiguous device pair
    devs = np.asarray(mesh.devices)
    ids = [[d.id for d in row] for row in devs]
    assert ids == [[0, 1], [2, 3], [4, 5], [6, 7]]


def test_global_mesh_rejects_cross_host_tp():
    with pytest.raises(ValueError):
        dist.make_global_mesh(model=2 * len(jax.devices()))


def test_batch_slice_single_process():
    assert dist.shard_batch_per_process(8) == slice(0, 8)
