"""Golden tests of the vectorized trajectory mapping vs the reference's
sequential greedy implementation (src/flow_utils.py:56-138), imported
read-only for comparison."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from conftest import import_reference_flow_utils  # noqa: E402
from fresco_tpu.ops.mapping import batch_mappings, single_mapping  # noqa: E402


def _rand_case(rng, n, h, w, flow_scale=2.0):
    frames = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
    bwd_flows = (rng.standard_normal((n - 1, h, w, 2)) * flow_scale).astype(np.float32)
    bwd_occs = (rng.uniform(0, 1, (n - 1, h, w)) > 0.8).astype(np.float32)
    return frames, bwd_flows, bwd_occs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_single_mapping_matches_reference(seed):
    fu = import_reference_flow_utils()
    rng = np.random.default_rng(seed)
    h, w = 12, 10
    frames, bwd_flows, bwd_occs = _rand_case(rng, 2, h, w)

    ours_map, ours_unlinked = single_mapping(
        jnp.asarray(bwd_flows[0]), jnp.asarray(bwd_occs[0]), jnp.asarray(frames), 1.0
    )

    ref_map, ref_unlinked = fu.get_single_mapping_ind(
        torch.from_numpy(bwd_flows[0]).permute(2, 0, 1)[None],
        torch.from_numpy(bwd_occs[0])[None],
        torch.from_numpy(frames).permute(0, 3, 1, 2),
        scale=1.0,
    )
    np.testing.assert_array_equal(np.asarray(ours_map), ref_map.numpy())
    np.testing.assert_array_equal(np.asarray(ours_unlinked), ref_unlinked.numpy())


def test_single_mapping_is_permutation(rng):
    h, w = 16, 16
    frames, bwd_flows, bwd_occs = _rand_case(rng, 2, h, w, flow_scale=4.0)
    m, _ = single_mapping(
        jnp.asarray(bwd_flows[0]), jnp.asarray(bwd_occs[0]), jnp.asarray(frames), 1.0
    )
    assert sorted(np.asarray(m).tolist()) == list(range(h * w))


@pytest.mark.parametrize("scale", [1.0, 2.0])
def test_batch_mappings_matches_reference(scale):
    fu = import_reference_flow_utils()
    rng = np.random.default_rng(3)
    n, h, w = 4, 16, 12
    frames, bwd_flows, bwd_occs = _rand_case(rng, n, h, w)

    fwd, bwd, mask = batch_mappings(
        jnp.asarray(bwd_flows), jnp.asarray(bwd_occs), jnp.asarray(frames), scale
    )

    rf, rb, rm = fu.get_mapping_ind(
        torch.from_numpy(bwd_flows).permute(0, 3, 1, 2),
        torch.from_numpy(bwd_occs),
        torch.from_numpy(frames).permute(0, 3, 1, 2),
        scale=scale,
    )
    np.testing.assert_array_equal(np.asarray(fwd), rf[:, 0].numpy())
    np.testing.assert_array_equal(np.asarray(bwd), rb[:, 0].numpy())
    np.testing.assert_array_equal(np.asarray(mask), rm[:, 0].numpy())


def test_trajectory_roundtrip(rng):
    """imgs[i][fwd[i]][bwd[i]] must restore imgs[i] (flow_utils.py:120-121)."""
    n, h, w = 3, 8, 8
    frames, bwd_flows, bwd_occs = _rand_case(rng, n, h, w)
    fwd, bwd, _ = batch_mappings(
        jnp.asarray(bwd_flows), jnp.asarray(bwd_occs), jnp.asarray(frames), 1.0
    )
    for i in range(n):
        x = np.arange(h * w)
        np.testing.assert_array_equal(
            x[np.asarray(fwd[i])][np.asarray(bwd[i])], x
        )
