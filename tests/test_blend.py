"""Golden test of background warp-fusion against the reference's
warp_tensor (src/flow_utils.py:18-53), imported read-only."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from conftest import import_reference_flow_utils  # noqa: E402
from fresco_tpu.ops.blend import warp_and_fuse  # noqa: E402


@pytest.mark.parametrize("feat_hw,chunk", [((16, 16), 2), ((32, 32), 1)])
def test_warp_and_fuse_matches_reference(feat_hw, chunk):
    fu = import_reference_flow_utils()
    rng = np.random.default_rng(0)
    n, H, W = 3, 32, 32
    h, w = feat_hw
    c = 4

    sample = rng.standard_normal((chunk * n, h, w, c)).astype(np.float32)
    fwd_flow = (rng.standard_normal((n, H, W, 2)) * 2).astype(np.float32)
    bwd_flow = (rng.standard_normal((n, H, W, 2)) * 2).astype(np.float32)
    fwd_occ = (rng.uniform(0, 1, (n, H, W)) > 0.85).astype(np.float32)
    bwd_occ = (rng.uniform(0, 1, (n, H, W)) > 0.85).astype(np.float32)
    saliency = rng.uniform(0, 1, (n, H // 2, W // 2, 1)).astype(np.float32)

    ours = np.asarray(
        warp_and_fuse(
            jnp.asarray(sample),
            jnp.asarray(fwd_flow),
            jnp.asarray(bwd_flow),
            jnp.asarray(fwd_occ),
            jnp.asarray(bwd_occ),
            jnp.asarray(saliency),
            chunk=chunk,
        )
    )

    theirs = fu.warp_tensor(
        torch.from_numpy(sample).permute(0, 3, 1, 2),
        [
            torch.from_numpy(fwd_flow).permute(0, 3, 1, 2),
            torch.from_numpy(bwd_flow).permute(0, 3, 1, 2),
        ],
        [torch.from_numpy(fwd_occ), torch.from_numpy(bwd_occ)],
        torch.from_numpy(saliency).permute(0, 3, 1, 2),
        chunk,
    )
    np.testing.assert_allclose(
        ours, theirs.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )
