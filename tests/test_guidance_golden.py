"""Golden parity of the feature-optimization loop against the reference's
optimize_feature (src/diffusion_hacked.py:416-488), imported read-only
(diffusers stubbed)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fresco_tpu.diffusion.guidance import GuidanceConfig, optimize_feature  # noqa: E402


def _import_reference_dh():
    from test_fresco_attention_golden import _import_reference_processor

    return _import_reference_processor()


@pytest.mark.slow
def test_optimize_feature_matches_reference():
    dh = _import_reference_dh()
    rng = np.random.default_rng(0)
    chunk, f, c, h, w = 2, 3, 8, 8, 8
    H, W = 16, 16  # "full-res" flows at 2x the feature resolution

    sample = rng.standard_normal((chunk * f, h, w, c)).astype(np.float32)
    fwd_flow = (rng.standard_normal((f, H, W, 2)) * 2).astype(np.float32)
    bwd_flow = (rng.standard_normal((f, H, W, 2)) * 2).astype(np.float32)
    fwd_occ = (rng.uniform(0, 1, (f, H, W)) > 0.8).astype(np.float32)
    bwd_occ = (rng.uniform(0, 1, (f, H, W)) > 0.8).astype(np.float32)
    # a plausible correlation target: gram of a random feature
    vr = rng.standard_normal((chunk * f, h * w, c)).astype(np.float32)
    vr /= np.linalg.norm(vr, axis=2, keepdims=True)
    corr = np.einsum("bic,bjc->bij", vr, vr).astype(np.float32)

    cfg = GuidanceConfig(
        iters=10, lr=0.2, intra_weight=1e2, optimize_temporal=True,
        chunk=chunk, gram_dtype="float32",
    )
    ours = np.asarray(
        optimize_feature(
            jnp.asarray(sample),
            jnp.asarray(fwd_flow), jnp.asarray(bwd_flow),
            jnp.asarray(fwd_occ), jnp.asarray(bwd_occ),
            jnp.asarray(corr), cfg,
        )
    )

    # reference call (NCHW): flows [N,2,H,W], occs [N,H,W], sample [2N,C,h,w]
    t_sample = torch.from_numpy(sample).permute(0, 3, 1, 2)
    flows = [
        torch.from_numpy(fwd_flow).permute(0, 3, 1, 2),
        torch.from_numpy(bwd_flow).permute(0, 3, 1, 2),
    ]
    occs = [torch.from_numpy(fwd_occ), torch.from_numpy(bwd_occ)]
    ref = dh.optimize_feature(
        t_sample, flows, occs, [torch.from_numpy(corr)],
        intra_weight=1e2, iters=10, unet_chunk_size=chunk,
        optimize_temporal=True,
    )
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)
