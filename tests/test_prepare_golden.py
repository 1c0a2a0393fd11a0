"""Golden tests for FRESCO input preparation and Poisson fusion.

* interframe_params vs the reference's get_flow_and_interframe_paras
  (reference src/diffusion_hacked.py:904-957) with a shared synthetic
  flow, so occlusion augmentation and cross-frame attention mask
  construction are compared bit-for-bit.
* poisson_fusion vs the reference's scipy-lsqr solver
  (reference src/ebsynth/blender/poisson_fusion.py:54-93).
"""
import importlib.util
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import REFERENCE, has_reference, import_reference_flow_utils


def _import_ref_poisson():
    if not has_reference():
        pytest.skip("reference repo not mounted")
    pytest.importorskip("scipy")
    path = REFERENCE / "src/ebsynth/blender/poisson_fusion.py"
    spec = importlib.util.spec_from_file_location("ref_poisson", str(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_interframe_params_golden(rng):
    import_reference_flow_utils()  # sets up sys.path for gmflow deps
    import torch
    import torch.nn.functional as TF
    from gmflow.geometry import flow_warp, forward_backward_consistency_check

    f, H, W = 4, 64, 64
    imgs = rng.uniform(0, 255, (f, H, W, 3)).astype(np.float32)
    # synthetic shared flow (the flow model itself is golden-tested
    # separately in test_gmflow.py)
    flows = (rng.uniform(-6, 6, (2 * f, H, W, 2))).astype(np.float32)

    # ---- reference computation (diffusion_hacked.py:915-938) -----------
    images = torch.from_numpy(imgs).permute(0, 3, 1, 2)
    fwd = torch.from_numpy(flows[:f].transpose(0, 3, 1, 2))
    bwd = torch.from_numpy(flows[f:].transpose(0, 3, 1, 2))
    reshuffle = list(range(1, f)) + [0]
    fwd_occs, bwd_occs = forward_backward_consistency_check(fwd, bwd)
    warped1 = flow_warp(images, bwd)
    bwd_occs = torch.clamp(
        bwd_occs
        + ((images[reshuffle] - warped1).abs().mean(1) > 255 * 0.25).float(),
        0, 1,
    )
    warped2 = flow_warp(images[reshuffle], fwd)
    fwd_occs = torch.clamp(
        fwd_occs + ((images - warped2).abs().mean(1) > 255 * 0.25).float(), 0, 1
    )
    ref_masks = []
    for scale in [8.0, 16.0, 32.0]:
        bo = TF.interpolate(
            bwd_occs[:-1].unsqueeze(1), scale_factor=1.0 / scale, mode="bilinear"
        )
        ref_masks.append(
            torch.cat(
                (bo[0:1].reshape(1, -1) > -1, bo.reshape(bo.shape[0], -1) > 0.5),
                dim=0,
            ).numpy()
        )

    # ---- ours ----------------------------------------------------------
    from fresco_tpu.pipeline.prepare import interframe_params

    (g_fwd, g_bwd), (g_fo, g_bo), cf_masks, traj = interframe_params(
        lambda a, b: jnp.asarray(flows), jnp.asarray(imgs)
    )

    np.testing.assert_allclose(
        np.asarray(g_fo), fwd_occs.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_bo), bwd_occs.numpy(), atol=1e-5
    )
    for scale, want in zip([8, 16, 32], ref_masks):
        hw = (H // scale) * (W // scale)
        got = np.asarray(cf_masks[hw])
        assert got.shape == want.shape
        # thresholded bits must agree exactly (drift here silently changes
        # which keys cross-frame attention may attend)
        np.testing.assert_array_equal(got, want)
    # trajectory dict carries both scales with int mappings
    for scale in [8, 16]:
        hw = (H // scale) * (W // scale)
        fwd_m, bwd_m, tmask = traj[hw]
        assert fwd_m.shape == (f, hw) and bwd_m.shape == (f, hw)


def test_poisson_fusion_golden(rng):
    ref = _import_ref_poisson()
    from fresco_tpu.propagate.poisson import poisson_fusion

    h, w = 48, 64
    # smooth-ish candidates so gradients are in a realistic range
    base = rng.uniform(40, 215, (h, w, 3))
    i1 = np.clip(base + rng.normal(0, 12, base.shape), 0, 255).astype(np.uint8)
    i2 = np.clip(base + rng.normal(0, 12, base.shape), 0, 255).astype(np.uint8)
    blend = ((i1.astype(np.float32) + i2.astype(np.float32)) / 2).astype(np.uint8)
    mask = (rng.uniform(size=(h, w)) > 0.5).astype(np.uint8)

    want = ref.poisson_fusion(blend, i1, i2, mask)
    got = poisson_fusion(blend, i1, i2, mask, iters=300)

    diff = np.abs(want.astype(np.int32) - got.astype(np.int32))
    # CG (fp32, matrix-free) vs lsqr (fp64, explicit sparse): allow only
    # quantization-level disagreement
    assert diff.mean() < 0.5, diff.mean()
    assert np.percentile(diff, 99) <= 2, np.percentile(diff, 99)
    assert diff.max() <= 12, diff.max()
